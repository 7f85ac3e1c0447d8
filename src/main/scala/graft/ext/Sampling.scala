package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Reproducible sampling operators for training-data pipelines: dataset
  * splits and corpus mixing must be (a) deterministic across reruns and
  * engines — a re-extracted corpus must land every document in the same
  * split, or evaluation leaks into training — and (b) driver-free: the
  * split decision is a pure per-row expression on a content-stable key,
  * never a random() call (non-deterministic under retries/speculation)
  * and never a collected lookup table.
  *
  * The split hash is the first hex digit of md5(doc_id): both Spark and
  * DuckDB produce identical md5 hex strings, so the assignment is exactly
  * oracle-checkable, and each digit carries 1/16 of the corpus.
  */
object Sampling {

  /** First md5 hex digit of the stable key — a uniform 16-bucket hash
    * shared bit-for-bit by both engines. */
  private def hexBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 1)

  /** Deterministic train/val/test split (12/2/2 hex digits = 75/12.5/12.5)
    * with per-(lang, source) counts + id-range fingerprints, so the
    * oracle pins both the stratification balance and the row-level
    * assignment. Pure projection + one aggregation: scales as a single
    * shuffle on the (small) group key. */
  private val q56StratifiedSplit = QueryDef(
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val h = hexBucket(col("doc_id"))
      val split = when(h < "c", "train").when(h < "e", "val")
        .otherwise("test")
      docs.groupBy(col("lang"), col("source"), split.as("split"))
        .agg(count(lit(1)).as("n"),
          min("doc_id").as("first_id"), max("doc_id").as("last_id"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang", "source", "split")
    },
    """WITH s AS (
      |  SELECT lang, source, doc_id,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
      |           THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
      |           THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT lang, source, split, CAST(count(*) AS BIGINT) AS n,
      |       min(doc_id) AS first_id, max(doc_id) AS last_id,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")

  /** Weighted corpus mixing: per-source admission rates applied with the
    * same engine-shared hash (here: even-numbered sources pass in full,
    * odd-numbered at 50%) — the deterministic form of
    * `df.sample(weight)` used when blending corpora at fixed ratios.
    * Emits the surviving rows themselves: the oracle checks the exact
    * admitted document set, not just the counts. */
  private val q57DatasetMix = QueryDef(
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val srcNum = expr("CAST(substr(source, 4, 10) AS INT)")
      val admit = (srcNum % 2 === 0) ||
        (hexBucket(col("doc_id")) < "8") // odd sources: 8/16 = 50%
      docs.filter(admit)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("doc_id")
    },
    """SELECT doc_id, source, lang FROM documents
      |WHERE CAST(substr(source, 4, 10) AS INT) % 2 = 0
      |   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
      |ORDER BY doc_id""")

  /** Balanced subset — per-group contribution caps (≤20 docs per lang),
    * the curation op that stops one domain/language from dominating a
    * mixture. Selection order inside each group is the md5 hash (an
    * unbiased deterministic shuffle), so the cap takes a reproducible
    * random-looking sample rather than the lowest ids. One window over
    * the group key — partitions by lang, never a global sort. */
  private val q61BalancedSubset = QueryDef(
    (s, dir) => {
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables(s, dir, "documents")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 20)
        .select(col("doc_id"), col("lang"), col("source"), col("rn"))
        .orderBy("lang", "rn")
    },
    """SELECT doc_id, lang, source, rn FROM (
      |  SELECT doc_id, lang, source,
      |         row_number() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20 ORDER BY lang, rn""")

  /** Adaptive quality gate — "keep the best 75% per language" instead of
    * a fixed threshold: corpora differ, so production gates are set
    * RELATIVE to the observed quality distribution. The decision is
    * RANK-based (row_number ≤ ceil(0.75·n_lang)), not value-interpolated
    * (a percentile-value cut would hang the keep/drop decision on the
    * last float bit of an interpolated threshold); 0.75·n is exact binary
    * arithmetic, so the gate is bit-identical in both engines. One window
    * per language partition — q61's discipline, never a global sort.
    * The quality markers are the SHARED top-20 English stopword table
    * (TextAnalytics.stopEn) — the engine has ONE quality definition. */
  private val q76AdaptiveQualityGate = QueryDef(
    (s, dir) => {
      val w = split(col("text"), " ")
      val stop = (x: Column) =>
        x.isin(TextAnalytics.stopEn.map(lit(_)): _*)
      val quality = floor((lit(0.5) *
        (size(array_distinct(w)).cast("double") / size(w)) +
        lit(0.5) * (lit(1.0) -
          size(filter(w, stop)).cast("double") / size(w))) * lit(1e6)) / lit(1e6)
      val wr = Window.partitionBy("lang").orderBy(desc("quality"), asc("doc_id"))
      val wn = Window.partitionBy("lang")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), quality.as("quality"))
        .withColumn("quality_rank", row_number().over(wr).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(wn).cast("long"))
        .filter(col("quality_rank") <= ceil(lit(0.75) * col("n_lang")))
        .orderBy("doc_id")
    },
    s"""WITH q AS (
      |  SELECT doc_id, lang,
      |    floor((0.5e0 * (CAST(len(list_distinct(string_split(text, ' ')))
      |             AS DOUBLE) / len(string_split(text, ' '))) +
      |           0.5e0 * (1.0e0 -
      |             CAST(len(list_filter(string_split(text, ' '),
      |               x -> x IN ${TextAnalytics.sqlIn(TextAnalytics.stopEn)}))
      |               AS DOUBLE)
      |               / len(string_split(text, ' ')))) * 1000000) / 1000000
      |      AS quality
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang, quality,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY quality DESC, doc_id) AS BIGINT) AS quality_rank,
      |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
      |  FROM q)
      |SELECT doc_id, lang, quality, quality_rank, n_lang
      |FROM r WHERE quality_rank <= ceil(0.75e0 * n_lang)
      |ORDER BY doc_id""")

  /** Per-source token-budget sampling — "take ~800 tokens from each
    * source" (the unit a mixture recipe is actually written in, vs q57's
    * row-rate mixing): docs are ordered by their content-stable md5
    * position within the source (q65's reproducible shuffle), token
    * counts accumulate, and each source admits docs while the budget is
    * unfilled (the first doc crossing the line is included, so every
    * source reaches its budget). One window per source partition;
    * deterministic under retries, driver-free. */
  private val q77TokenBudgetMix = QueryDef(
    (s, dir) => {
      val hx = md5(concat(col("doc_id").cast("string"), lit(":"), col("text")))
      val w = Window.partitionBy("source").orderBy("hx", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"), hx.as("hx"))
        .withColumn("cum", sum("tok").over(w))
        .filter(col("cum") - col("tok") < 800) // start offset below budget
        .select(col("doc_id"), col("source"), col("tok"), col("cum"))
        .orderBy("doc_id")
    },
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
      |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS hx
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, tok,
      |    sum(tok) OVER (PARTITION BY source ORDER BY hx, doc_id
      |                   ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t)
      |SELECT doc_id, source, tok, CAST(cum AS BIGINT) AS cum
      |FROM c WHERE cum - tok < 800 ORDER BY doc_id""")

  /** Cluster-balanced coreset sampling — the semdedup-style diversity
    * subset: q81's trained k-means assignment partitions the corpus
    * into semantic cells, each cell gets a budget share PROPORTIONAL to
    * its size (quota = max(1, ⌊B·cell_size/N⌋), B = 100 — the floor
    * keeps tail clusters represented, the proportionality keeps the
    * subset's cluster mix equal to the corpus's), and the quota is
    * filled with the cell's PROTOTYPES — its minimal-distortion (d2)
    * members, the vectors closest to the trained centroid. A uniform
    * sample at the same size over-draws from dense clusters and misses
    * small ones entirely; this subset covers every semantic mode with
    * its most-central exemplars.
    *
    * Scale shape: the assignment is q81's bounded-state trainer (k·d
    * centroid driver state, map-side-combinable shuffles); N collapses
    * to a collected scalar (the sq8 max|x| discipline); the per-cell
    * window shuffles on cell — the natural partitioning, no skew
    * beyond cluster imbalance itself, which the quota formula is
    * measuring in the first place. Everything after training is
    * integer-exact (BIGINT floor division), so the oracle restates the
    * full train→quota→select DAG. */
  private val q119ClusterCoreset = QueryDef(
    (s, dir) => {
      val n = Tables(s, dir, "embeddings").count()
      val wc = Window.partitionBy("cell")
      val w = Window.partitionBy("cell").orderBy(asc("d2"), asc("vec_id"))
      Similarity.trainedAssignment(s, dir)
        .withColumn("cell_size", count(lit(1)).over(wc).cast("long"))
        .withColumn("quota",
          greatest(lit(1L), expr(s"(100 * cell_size) div $n")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= col("quota"))
        .select("vec_id", "cell", "d2", "cell_size", "quota", "rk")
        .orderBy("cell", "rk")
    },
    s"""WITH ${Similarity.trainedAssignmentSql},
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
      |sz AS (SELECT vec_id, cell, d2,
      |         CAST(count(*) OVER (PARTITION BY cell) AS BIGINT)
      |           AS cell_size,
      |         row_number() OVER (PARTITION BY cell
      |           ORDER BY d2, vec_id) AS rk
      |       FROM af),
      |qt AS (SELECT vec_id, cell, d2, cell_size,
      |         greatest(1, (100 * cell_size) // n) AS quota,
      |         CAST(rk AS BIGINT) AS rk
      |       FROM sz, n)
      |SELECT vec_id, cell, d2, cell_size, quota, rk
      |FROM qt WHERE rk <= quota ORDER BY cell, rk""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q119_cluster_coreset" -> q119ClusterCoreset,
    "q56_stratified_split" -> q56StratifiedSplit,
    "q57_dataset_mix" -> q57DatasetMix,
    "q61_balanced_subset" -> q61BalancedSubset,
    "q76_adaptive_quality_gate" -> q76AdaptiveQualityGate,
    "q77_token_budget_mix" -> q77TokenBudgetMix,
  )
}

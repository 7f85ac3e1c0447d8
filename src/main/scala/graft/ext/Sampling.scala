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

  val defs: Map[String, QueryDef] = Map(
    "q56_stratified_split" -> q56StratifiedSplit,
    "q57_dataset_mix" -> q57DatasetMix,
    "q61_balanced_subset" -> q61BalancedSubset,
  )
}

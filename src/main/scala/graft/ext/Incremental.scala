package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Oracle gates for the INCREMENTAL index family — the operators that
  * implement the reference's actual production model (hourly resumable
  * micro-batches, SURVEY §2.3: the cron only ever sees new records and
  * must reject re-crawls against everything admitted before). The index
  * operators themselves live in [[DedupIndex]], [[NearDupIndex]], and
  * [[TextNearDupIndex]] (the fourth, serve-side family — the persisted
  * ANN index — lives in [[IvfPqIndex]] with its own q97–q99/q104
  * gates); these registry entries run a DETERMINISTIC
  * two-batch admission sequence against a fresh throwaway index — batch
  * A bootstraps, batch B is admitted against A's persisted state — so
  * the whole incremental path (bucket/fingerprint persistence, probe
  * join, verification, in-batch collapse, append, re-read) sits inside
  * the driver's hard rows+schema+hash gate, not just ScalaTest.
  *
  * The admission math is batch-expressible, so DuckDB can restate
  * admit(B | A) declaratively:
  *  - admit(A | ∅): v ∈ A survives iff no smaller-id batch member is a
  *    verified near-dup of v;
  *  - admit(B | A): v ∈ B survives iff no ADMITTED-A member verifies
  *    (the index after run 1 holds exactly admitted-A) and no smaller-id
  *    B member verifies.
  * A fresh temp dir per invocation keeps every run (Verify, bench
  * passes, specs) bit-identical — nothing accumulates across calls.
  */
object Incremental {

  /** The NearDupIndex bucket CTEs (np/d): planes from the full corpus
    * (the index's catalog entry, q55's rule), integer hyperplane buckets
    * per vector — shared by the q84 admission oracle and q92's
    * post-compaction contents oracle. Verification parity with DuckDB
    * holds because collision is pure BIGINT signature xor and the
    * cosine is the proven bit-exact form. */
  private val neardupBucketCtes = """np AS (
      |  SELECT 4 + length(bin(greatest(count(*) // 500, 1))) - 1 AS planes
      |  FROM embeddings),
      |d AS (
      |  SELECT vec_id, embedding,
      |    (SELECT sum(CASE WHEN list_sum(list_transform(embedding, (x,i) ->
      |       CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
      |       * (((((i-1) * 31 + p * 17 + (i-1) * p * 13) % 97) % 7) - 3))) > 0
      |     THEN 1 << p ELSE 0 END)
      |     FROM generate_series(0, 62) t(p), np WHERE p < planes) AS bucket
      |  FROM embeddings)""".stripMargin

  /** The full two-batch admission CTEs (np/d/ca/cb): batch A admits
    * against its own smaller ids, batch B against admitted-A (the
    * persisted index) plus its own smaller ids — q84's oracle text. */
  private val neardupAdmitCtes = s"""$neardupBucketCtes,
      |ca AS (
      |  SELECT v.vec_id FROM d v
      |  WHERE v.vec_id % 2 = 0
      |    AND NOT EXISTS (
      |      SELECT 1 FROM d u
      |      WHERE u.vec_id % 2 = 0 AND u.vec_id < v.vec_id
      |        AND bit_count(xor(u.bucket, v.bucket)) <= 1
      |        AND list_sum(list_transform(v.embedding,
      |              (x,i) -> CAST(x AS DOUBLE) * CAST(u.embedding[i] AS DOUBLE))) /
      |            (sqrt(list_sum(list_transform(v.embedding,
      |               x -> CAST(x AS DOUBLE) * x))) *
      |             sqrt(list_sum(list_transform(u.embedding,
      |               x -> CAST(x AS DOUBLE) * x)))) >= 0.4)),
      |cb AS (
      |  SELECT v.vec_id FROM d v
      |  WHERE v.vec_id % 2 = 1
      |    AND NOT EXISTS (
      |      SELECT 1 FROM d u JOIN ca ON u.vec_id = ca.vec_id
      |      WHERE bit_count(xor(u.bucket, v.bucket)) <= 1
      |        AND list_sum(list_transform(v.embedding,
      |              (x,i) -> CAST(x AS DOUBLE) * CAST(u.embedding[i] AS DOUBLE))) /
      |            (sqrt(list_sum(list_transform(v.embedding,
      |               x -> CAST(x AS DOUBLE) * x))) *
      |             sqrt(list_sum(list_transform(u.embedding,
      |               x -> CAST(x AS DOUBLE) * x)))) >= 0.4)
      |    AND NOT EXISTS (
      |      SELECT 1 FROM d u
      |      WHERE u.vec_id % 2 = 1 AND u.vec_id < v.vec_id
      |        AND bit_count(xor(u.bucket, v.bucket)) <= 1
      |        AND list_sum(list_transform(v.embedding,
      |              (x,i) -> CAST(x AS DOUBLE) * CAST(u.embedding[i] AS DOUBLE))) /
      |            (sqrt(list_sum(list_transform(v.embedding,
      |               x -> CAST(x AS DOUBLE) * x))) *
      |             sqrt(list_sum(list_transform(u.embedding,
      |               x -> CAST(x AS DOUBLE) * x)))) >= 0.4))""".stripMargin

  /** Run the deterministic two-batch admission against a fresh
    * throwaway index (batch = vec_id parity split, bar 0.4 — the
    * q51/q79 threshold where the fixtures contain real cross-batch
    * near-dups, so the gate exercises real rejections). */
  private def neardupTwoBatchAdmit(s: SparkSession, dir: String)
      : (String, DataFrame, DataFrame) = {
    val e = Tables(s, dir, "embeddings")
    val planes = Dedup.lshPlanes(e.count())
    val idx = java.nio.file.Files.createTempDirectory("graft-q84-idx")
      .resolve("index").toString
    val batchA = e.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    val batchB = e.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding")
    val admA = NearDupIndex.admit(s, idx, batchA, planes, bar = 0.4)
    val admB = NearDupIndex.admit(s, idx, batchB, planes, bar = 0.4)
    (idx, admA, admB)
  }

  private val q84NeardupIndexAdmit = QueryDef(
    (s, dir) => {
      val (_, admA, admB) = neardupTwoBatchAdmit(s, dir)
      admA.select(col("vec_id"), lit(0).as("batch"))
        .unionByName(admB.select(col("vec_id"), lit(1).as("batch")))
        .orderBy("vec_id")
    },
    s"""WITH $neardupAdmitCtes
      |SELECT vec_id, 0 AS batch FROM ca
      |UNION ALL
      |SELECT vec_id, 1 AS batch FROM cb
      |ORDER BY vec_id""")

  /** Post-COMPACTION index contents: decay an index the way production
    * does — three hourly-style appends (id-sliced thirds of the corpus,
    * each clustered and written PARTITIONED BY bucket) — then
    * `NearDupIndex.compact` it and hold the compacted index's
    * (vec_id, bucket) rows to a DuckDB oracle. Compaction must change
    * layout, never content, and the integer hyperplane bucket VALUES of
    * the ENTIRE corpus go under the hash gate (q84's oracle only ever
    * compares admission ids). Admission logic is deliberately absent:
    * that is q84's subject; this entry isolates the maintenance op. */
  private val q92IndexCompaction = QueryDef(
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val planes = Dedup.lshPlanes(e.count())
      val idx = java.nio.file.Files.createTempDirectory("graft-q92-idx")
        .resolve("index").toString
      val writeTasks = math.min(1 << planes,
        s.sparkContext.defaultParallelism)
      (0 until 3).foreach { k =>
        e.filter(col("vec_id") % 3 === k)
          .select(col("vec_id"), col("embedding"),
            graft.functions.HyperplaneBucket.bucket(col("embedding"), planes)
              .as("bucket"))
          .repartition(writeTasks, col("bucket"))
          .write.mode("append").partitionBy("bucket").parquet(idx)
      }
      NearDupIndex.compact(s, idx)
      NearDupIndex.readIndex(s, idx)
        .select(col("vec_id"), col("bucket"))
        .orderBy("vec_id")
    },
    s"""WITH $neardupBucketCtes
      |SELECT vec_id, CAST(bucket AS INTEGER) AS bucket
      |FROM d ORDER BY vec_id""")

  /** The two-batch exact-fingerprint admission CTEs (a/b/ca/cb):
    * batch A's in-batch dedup collapses same-text docs to the min
    * doc_id via a window; batch B additionally anti-joins A's
    * persisted fingerprints via NOT EXISTS over the same md5 — shared
    * by the q85 admission oracle and q95's post-compaction contents
    * oracle. */
  private val dedupAdmitCtes =
    """a AS (SELECT doc_id, md5(text) AS fp FROM documents
      |      WHERE doc_id % 2 = 0),
      |b AS (SELECT doc_id, md5(text) AS fp FROM documents
      |      WHERE doc_id % 2 = 1),
      |ca AS (SELECT doc_id, fp FROM (
      |         SELECT doc_id, fp,
      |           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |         FROM a) WHERE rn = 1),
      |cb AS (SELECT doc_id, fp FROM (
      |         SELECT doc_id, fp,
      |           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |         FROM b) t
      |       WHERE rn = 1
      |         AND NOT EXISTS (SELECT 1 FROM a WHERE a.fp = t.fp))""".stripMargin

  /** Two-batch DedupIndex admission (exact md5 fingerprints) under the
    * full oracle gate — see [[dedupAdmitCtes]] for the restatement. */
  private val q85DedupIndexAdmit = QueryDef(
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val idx = java.nio.file.Files.createTempDirectory("graft-q85-idx")
        .resolve("index").toString
      val batchA = docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
      val batchB = docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
      val admA = DedupIndex.admit(s, idx, batchA)
        .select(col("doc_id"), col("fp"), lit(0).as("batch"))
      val admB = DedupIndex.admit(s, idx, batchB)
        .select(col("doc_id"), col("fp"), lit(1).as("batch"))
      admA.unionByName(admB).orderBy("doc_id")
    },
    s"""WITH $dedupAdmitCtes
      |SELECT doc_id, fp, 0 AS batch FROM ca
      |UNION ALL
      |SELECT doc_id, fp, 1 AS batch FROM cb
      |ORDER BY doc_id""")

  /** Post-COMPACTION DedupIndex contents — q92's maintenance-op gate
    * applied to the flat fingerprint table: run the REAL two-batch
    * admission sequence (q85's — so the index holds exactly the
    * admitted fingerprints), decay-compact it with
    * `DedupIndex.compact`, and hold the compacted index's
    * (fp, canonical_id) rows to the same DuckDB admission oracle.
    * Compaction must change layout, never content — a lost or
    * duplicated fingerprint here would silently re-admit (or
    * over-reject) every future batch, which is why the contents, not
    * just the row count, sit under the hash gate. */
  private val q95DedupIndexCompaction = QueryDef(
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val idx = java.nio.file.Files.createTempDirectory("graft-q95-idx")
        .resolve("index").toString
      val batchA = docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
      val batchB = docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
      DedupIndex.admit(s, idx, batchA)
      DedupIndex.admit(s, idx, batchB)
      DedupIndex.compact(s, idx)
      DedupIndex.readIndex(s, idx).orderBy("canonical_id")
    },
    s"""WITH $dedupAdmitCtes
      |SELECT fp, canonical_id FROM (
      |  SELECT fp, doc_id AS canonical_id FROM ca
      |  UNION ALL
      |  SELECT fp, doc_id FROM cb)
      |ORDER BY canonical_id""")

  /** Two-batch TextNearDupIndex admission (MinHash band keys + stored-
    * signature verification ≥ 15/16), under the FULL oracle gate: the
    * signature hash is the engine-portable md5-slice BIGINT (see
    * TextNearDupIndex.signatures), so DuckDB recomputes the identical
    * 16-value signatures. The oracle needs NO banding: with 2 bands of
    * 8 rows, agreement ≥ 15/16 leaves at most one mismatched position,
    * so one band always matches fully — band collision is implied by
    * the verification bar, making the band probe purely a performance
    * mechanism (prefiltering candidates) with zero effect on
    * admissions. The pair-match table joins on (i, mh) — an inverted
    * index over hash values, never an all-pairs product. */
  private val q88TextIndexAdmit = QueryDef(
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val idx = java.nio.file.Files.createTempDirectory("graft-q88-idx")
        .resolve("index").toString
      val batchA = docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
      val batchB = docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
      val admA = TextNearDupIndex.admit(s, idx, batchA)
        .select(col("doc_id"), lit(0).as("batch"))
      val admB = TextNearDupIndex.admit(s, idx, batchB)
        .select(col("doc_id"), lit(1).as("batch"))
      admA.unionByName(admB).orderBy("doc_id")
    },
    """WITH w AS (SELECT DISTINCT doc_id, wd FROM (
      |             SELECT doc_id, unnest(string_split(text, ' ')) AS wd
      |             FROM documents)),
      |hv AS (SELECT doc_id, i,
      |         min(CAST(('0x' || substr(md5(i || ':' || wd), 1, 15))
      |           AS BIGINT)) AS mh
      |       FROM w, UNNEST(generate_series(0, 15)) t(i)
      |       GROUP BY doc_id, i),
      |pm AS (SELECT a.doc_id AS da, b.doc_id AS db
      |       FROM hv a JOIN hv b ON a.i = b.i AND a.mh = b.mh
      |       WHERE a.doc_id < b.doc_id
      |       GROUP BY 1, 2 HAVING count(*) >= 15),
      |ca AS (SELECT doc_id FROM documents v
      |       WHERE doc_id % 2 = 0
      |         AND NOT EXISTS (SELECT 1 FROM pm
      |                         WHERE db = v.doc_id AND da % 2 = 0)),
      |cb AS (SELECT doc_id FROM documents v
      |       WHERE doc_id % 2 = 1
      |         AND NOT EXISTS (
      |           SELECT 1 FROM pm JOIN ca
      |             ON (pm.da = ca.doc_id AND pm.db = v.doc_id)
      |             OR (pm.db = ca.doc_id AND pm.da = v.doc_id))
      |         AND NOT EXISTS (SELECT 1 FROM pm
      |                         WHERE db = v.doc_id AND da % 2 = 1))
      |SELECT doc_id, 0 AS batch FROM ca
      |UNION ALL
      |SELECT doc_id, 1 AS batch FROM cb
      |ORDER BY doc_id""")

  /** Two-run BoilerplateIndex lifecycle under the full oracle gate: run A
    * (even docs) commits its df delta and cleans against it; run B (odd
    * docs) commits, the index COMPACTS into the batch=-1 epoch, and B
    * cleans from the compacted state — so one query gates the delta
    * write, the cumulative sum, detection lag (A's verdicts see only A's
    * frequencies; B's see A+B), and compaction's read-invariance. A's
    * result is eagerly materialized before B commits: the verdict a run
    * shipped must not change when later runs move the df state (the
    * same frozen-state discipline as the other index admissions). */
  private val q116BoilerplateIndexAdmit = QueryDef(
    (s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      val idx = java.nio.file.Files.createTempDirectory("graft-q116-idx")
        .resolve("index").toString
      val a = docs.filter(col("doc_id") % 2 === 0)
      val b = docs.filter(col("doc_id") % 2 === 1)
      BoilerplateIndex.add(s, idx, a, 0L)
      val cleanA = BoilerplateIndex.clean(s, idx, a)
        .withColumn("run", lit(0L))
        .localCheckpoint(true)
      BoilerplateIndex.add(s, idx, b, 1L)
      BoilerplateIndex.compact(s, idx)
      val cleanB = BoilerplateIndex.clean(s, idx, b)
        .withColumn("run", lit(1L))
      cleanA.unionByName(cleanB).orderBy("doc_id")
    },
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l
      |           FROM documents),
      |seg AS (SELECT doc_id, i AS idx,
      |          array_to_string(l[(i-1)*3+1:(i-1)*3+3], ' ') AS seg
      |        FROM w, UNNEST(generate_series(1,
      |          CAST(ceil(len(l) / 3.0) AS BIGINT))) t(i)),
      |sf AS (SELECT doc_id, idx, seg, md5(seg) AS fp FROM seg),
      |dfa AS (SELECT fp, count(DISTINCT doc_id) AS df FROM sf
      |        WHERE doc_id % 2 = 0 GROUP BY fp),
      |dfab AS (SELECT fp, count(DISTINCT doc_id) AS df FROM sf
      |         GROUP BY fp),
      |ca AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_segments,
      |         CAST(sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_removed,
      |         md5(coalesce(array_to_string(
      |           list(s.seg ORDER BY s.idx) FILTER (WHERE d.df < 3), ' '),
      |           '')) AS cleaned_fp
      |       FROM sf s JOIN dfa d ON s.fp = d.fp
      |       WHERE s.doc_id % 2 = 0 GROUP BY s.doc_id),
      |cb AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_segments,
      |         CAST(sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_removed,
      |         md5(coalesce(array_to_string(
      |           list(s.seg ORDER BY s.idx) FILTER (WHERE d.df < 3), ' '),
      |           '')) AS cleaned_fp
      |       FROM sf s JOIN dfab d ON s.fp = d.fp
      |       WHERE s.doc_id % 2 = 1 GROUP BY s.doc_id)
      |SELECT doc_id, CAST(0 AS BIGINT) AS run, n_segments, n_removed,
      |       cleaned_fp FROM ca
      |UNION ALL
      |SELECT doc_id, CAST(1 AS BIGINT) AS run, n_segments, n_removed,
      |       cleaned_fp FROM cb
      |ORDER BY doc_id""")

  /** COMPACTION PRICING as a queryable instrument — the measured side of
    * the cost model CompactionCostSpec pins (DedupIndex.scala:29-40):
    * stage the fingerprint index as 8 SINGLE-FILE appends (one per
    * doc_id%8 batch, each `repartition(1)` — the hourly-cron decay
    * shape with a known file count), compact to an explicit
    * `targetFiles = 4` base, and emit what the maintenance op COST:
    *
    *   files_read   — every live file is rewritten; must equal the 8
    *                  staged appends or compaction read the wrong set;
    *   files_written — must equal the requested base (4) or the rewrite
    *                  fan-out is broken;
    *   amplification_micro — the Scaladoc formula at this threshold,
    *                  maxIndexFiles/(maxIndexFiles − w) = 8/(8−4),
    *                  fixed-point ×1e6 (the q109 discipline: floats
    *                  leave the engine as floored integers);
    *   index_rows   — content cardinality carried through the rewrite
    *                  (full content invariance is q95's gate; the
    *                  pricing row carries the count so a row-dropping
    *                  compaction cannot price as cheap).
    *
    * The DuckDB restatement derives files_read from the SAME batching
    * rule (count of non-empty doc_id%8 classes) and index_rows from the
    * staged cardinality, so a fixture change moves both engines
    * together; the driver's hash gate then prices the compaction
    * exactly. One row, all BIGINT. */
  private val q123CompactionCost = QueryDef(
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val idx = java.nio.file.Files.createTempDirectory("graft-q123-idx")
        .resolve("index").toString
      (0 until 8).foreach { k =>
        docs.filter(col("doc_id") % 8 === k)
          .select(md5(col("text")).as("fp"), col("doc_id").as("canonical_id"))
          .repartition(1)
          .write.mode("append").parquet(idx)
      }
      val stats = DedupIndex.compact(s, idx, targetFiles = Some(4))
      require(stats.filesRead > stats.filesWritten,
        s"q123 staging invariant broken: read=${stats.filesRead} " +
          s"written=${stats.filesWritten}")
      val rows = DedupIndex.readIndex(s, idx).count()
      val amplificationMicro = math.floor(stats.filesRead.toDouble /
        (stats.filesRead - stats.filesWritten) * 1e6).toLong
      Seq((stats.filesRead.toLong, stats.filesWritten.toLong,
        amplificationMicro, rows))
        .toDF("files_read", "files_written", "amplification_micro",
          "index_rows")
    },
    """WITH batches AS (SELECT DISTINCT doc_id % 8 AS b FROM documents)
      |SELECT CAST(count(*) AS BIGINT) AS files_read,
      |       CAST(4 AS BIGINT) AS files_written,
      |       CAST(floor(CAST(count(*) AS DOUBLE) / (count(*) - 4)
      |         * 1000000) AS BIGINT) AS amplification_micro,
      |       (SELECT CAST(count(*) AS BIGINT) FROM documents)
      |         AS index_rows
      |FROM batches""".stripMargin)

  /** TOMBSTONE FORGET under the oracle gate — the right-to-be-forgotten
    * lifecycle across a real admission sequence: admit batch A, forget
    * every admitted doc with doc_id%10==0 (all multiples of 10 are even,
    * so the tombstone set is non-empty inside batch A at every scale
    * factor), then admit batch B against the FORGOTTEN index. The final
    * contents prove all three contracts at once: tombstoned fingerprints
    * are gone; surviving fingerprints still reject their B duplicates
    * (cb anti-joins ka, not ca); and B content identical to a FORGOTTEN
    * A document RE-ADMITS under a fresh canonical — the semantic point
    * of forget, and the row the q95 compaction gate could never show
    * because compaction must be content-invariant. */
  private val q126IndexForget = QueryDef(
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val idx = java.nio.file.Files.createTempDirectory("graft-q126-idx")
        .resolve("index").toString
      val batchA = docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
      val batchB = docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
      val admA = DedupIndex.admit(s, idx, batchA)
      DedupIndex.forget(s, idx,
        admA.filter(col("doc_id") % 10 === 0).select("doc_id"))
      DedupIndex.admit(s, idx, batchB)
      DedupIndex.readIndex(s, idx).orderBy("canonical_id")
    },
    """WITH a AS (SELECT doc_id, md5(text) AS fp FROM documents
      |      WHERE doc_id % 2 = 0),
      |b AS (SELECT doc_id, md5(text) AS fp FROM documents
      |      WHERE doc_id % 2 = 1),
      |ca AS (SELECT doc_id, fp FROM (
      |         SELECT doc_id, fp,
      |           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |         FROM a) WHERE rn = 1),
      |ka AS (SELECT doc_id, fp FROM ca WHERE doc_id % 10 <> 0),
      |cb AS (SELECT doc_id, fp FROM (
      |         SELECT doc_id, fp,
      |           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |         FROM b) t
      |       WHERE rn = 1
      |         AND NOT EXISTS (SELECT 1 FROM ka WHERE ka.fp = t.fp))
      |SELECT fp, canonical_id FROM (
      |  SELECT fp, doc_id AS canonical_id FROM ka
      |  UNION ALL
      |  SELECT fp, doc_id FROM cb)
      |ORDER BY canonical_id""")

  val defs: Map[String, QueryDef] = Map(
    "q126_index_forget" -> q126IndexForget,
    "q123_compaction_cost" -> q123CompactionCost,
    "q116_boilerplate_index_admit" -> q116BoilerplateIndexAdmit,
    "q84_neardup_index_admit" -> q84NeardupIndexAdmit,
    "q85_dedup_index_admit" -> q85DedupIndexAdmit,
    "q88_text_index_admit" -> q88TextIndexAdmit,
    "q92_index_compaction" -> q92IndexCompaction,
    "q95_dedup_index_compaction" -> q95DedupIndexCompaction,
  )
}

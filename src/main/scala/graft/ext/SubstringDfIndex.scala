package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Incremental substring-frequency index — the cross-run form of q134's
  * exact repeated-substring excision (Lee et al., ACL 2022), completing
  * the incremental family: [[DedupIndex]] (exact), [[NearDupIndex]]
  * (embedding), [[TextNearDupIndex]] (text MinHash), boilerplate, ANN —
  * and now sub-segment substring state. The hourly-cron model: each
  * arriving batch must excise any ≥k-token run it shares with ANYTHING
  * the corpus has already admitted (or with itself) without
  * re-shingling the admitted corpus text.
  *
  * What persists per admitted document is its DISTINCT shingle
  * fingerprints — (doc_id, fp) pairs, never text. That is the honest
  * price of substring state: the op this re-expresses builds a suffix
  * array over the corpus (8 B/token); this table stores one md5 row
  * per distinct k-shingle (≤ one per token), the same O(corpus tokens)
  * class, and it is what makes document-level FORGET exact (drop the
  * doc's rows and its phrases stop counting toward df — an aggregated
  * (fp, df) summary could not un-count a forgotten doc).
  *
  * Admission semantics are FORWARD-ONLY, the streaming-curation
  * contract: a batch is cleaned against everything seen SO FAR
  * (persisted corpus + the batch itself, batch-internal repeats
  * included), but earlier-admitted documents are not retro-excised when
  * a later duplicate arrives — their cleaned form was already written.
  * The batch form (q134) excises both sides; q135 holds BOTH phases of
  * the split to one oracle that restates exactly this asymmetry.
  *
  * The index remembers what it has SEEN, not what survived: a batch's
  * pairs persist for its RAW text, including spans the same admit
  * excised. Deliberate — a phrase the corpus saw twice must never
  * re-enter via a third carrier just because only the first carrier
  * kept it (and re-shingling CLEANED text would manufacture phantom
  * shingles across excision boundaries — token adjacencies no document
  * ever contained). Consequently forget must drop every SEER of a
  * phrase before the phrase is free again — the spec pins both halves.
  *
  * Scale shape per admit: one fp-keyed exchange (index pairs ∪ batch
  * pairs → df), flags return as (doc, position) pairs via left_semi,
  * then the per-doc window — the q134 shuffles with the index replacing
  * the corpus re-scan. At real scale the pair table is bucketed by fp
  * so the df aggregation co-locates. Run partitions (`run=<id>`,
  * overwritten per run id) make replay idempotent — the IvfPqIndex
  * discipline — and df counts DISTINCT doc_ids, so even a torn retry
  * that left a duplicate pair cannot double-count. */
object SubstringDfIndex {

  private val indexSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fp", StringType),
    StructField("run", LongType)))

  /** Enforce the shingle-width contract: k is part of the index's
    * identity (fps of different widths never match), persisted in
    * `_graft_meta` on first admit; a mismatched later admit THROWS —
    * the NearDupIndex planes discipline. */
  private def checkKMeta(spark: SparkSession, indexDir: String,
      k: Int): Unit = {
    val path = new org.apache.hadoop.fs.Path(indexDir, "_graft_meta")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) {
      val in = fs.open(path)
      val stored =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      if (stored != k)
        throw new IllegalArgumentException(
          s"SubstringDfIndex at $indexDir was created with k=$stored but " +
            s"admit was called with k=$k; shingle fingerprints would not " +
            "match the persisted index")
    } else {
      fs.mkdirs(path.getParent)
      val out = fs.create(path, false)
      try out.write(k.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Admit run `runId`'s batch (doc_id, text): excise every ≥k-token
    * run shared with the persisted corpus or within the batch, COMMIT
    * the batch's distinct (doc_id, fp) pairs to the run partition
    * (overwrite — idempotent per run id), and return the per-doc q134
    * rows of the batch (counts, spans, removed ratio, cleaned md5).
    * runId -1 is reserved for the compacted epoch. */
  def admit(spark: SparkSession, indexDir: String, batch: DataFrame,
      runId: Long, k: Int = 8): DataFrame = {
    require(runId >= 0, "runId -1 is reserved for the compacted epoch")
    checkKMeta(spark, indexDir, k)
    val starts = Dedup.shingleStarts(batch, k).localCheckpoint(true)
    val batchPairs = starts.select("doc_id", "fp").distinct()
      .localCheckpoint(true) // the commit and the df must agree
    val dupFps = readIndex(spark, indexDir).select("doc_id", "fp")
      .unionByName(batchPairs)
      .groupBy("fp").agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select("fp")
    val dupStarts = starts.join(dupFps, Seq("fp"), "left_semi")
      .select("doc_id", "s")
    val out = Dedup.exciseCovered(Dedup.docTokens(batch), dupStarts, k)
      .localCheckpoint(true) // force before the commit mutates the dir
    batchPairs.write.mode("overwrite").parquet(s"$indexDir/run=$runId")
    out
  }

  /** COMPACT: collapse all run partitions into the reserved `run=-1`
    * epoch (distinct pairs — a replayed run's duplicates drop here),
    * rewrite-and-swap so a crash leaves the old index intact. Content-
    * invariant for df: countDistinct(doc_id) per fp is unchanged by
    * the merge, so admissions after a compact are identical
    * (SubstringDfIndexSpec proves it). */
  def compact(spark: SparkSession, indexDir: String)
      : DedupIndex.CompactionStats =
    DedupIndex.rewriteAndSwap(spark, indexDir) { tmp =>
      readIndex(spark, indexDir).select("doc_id", "fp").distinct()
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$tmp/run=-1")
    }

  /** FORGET (right-to-be-forgotten), eager-rewrite discipline: drop
    * every pair row of the tombstoned doc_ids, so their phrasing stops
    * counting toward df — a later document repeating a forgotten
    * document's text (and nothing else admitted) arrives at df 1 and
    * keeps it. Exact BECAUSE the index stores per-doc pairs; an
    * aggregated (fp, df) summary could not un-count one document. */
  def forget(spark: SparkSession, indexDir: String,
      tombstones: DataFrame): DedupIndex.CompactionStats = {
    val ids = tombstones.select(col(tombstones.columns.head)
      .cast("long").as("doc_id"))
    DedupIndex.rewriteAndSwap(spark, indexDir) { tmp =>
      readIndex(spark, indexDir).select("doc_id", "fp")
        .join(broadcast(ids), Seq("doc_id"), "left_anti")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$tmp/run=-1")
    }
  }

  /** The persisted pair table (empty relation before the first admit);
    * partition discovery resolves `run=<id>` against the schema. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    DedupIndex.readOrEmpty(spark, indexDir, indexSchema)
}

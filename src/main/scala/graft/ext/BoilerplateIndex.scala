package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental BOILERPLATE index — the cross-run state behind q105's
  * corpus cleaning for the reference's incremental path (SURVEY §2.3:
  * hourly cron, only new records): boilerplate is a CORPUS-frequency
  * verdict, so an incremental cleaner must carry segment document
  * frequencies across runs — a header that looks unique in today's batch
  * is chrome once three crawls have carried it.
  *
  * State layout: per-run df DELTAS — `batch=<runId>/` partitions of
  * (fp, n_docs), where n_docs is the count of DISTINCT batch documents
  * carrying that segment — written with per-run OVERWRITE (IvfPqIndex's
  * exactly-once discipline). The overwrite matters more here than for
  * the fingerprint indexes: DedupIndex's retry-duplicated rows are
  * harmless probe waste, but a double-counted df delta CHANGES future
  * cleaning verdicts (a df-2 segment would clean as df-4 boilerplate),
  * so replayed runs must land on their own partition, not append.
  * The live df table is the per-fp SUM of deltas.
  *
  * Detection LAGS by design: a run is cleaned against the df state
  * INCLUDING its own contribution, so a segment crosses the threshold on
  * the first run that pushes its cumulative df to [[BoilerDf]] — earlier
  * runs' outputs are not retroactively recleaned (the streaming reality
  * of every frequency-based filter; `BoilerplateIndexSpec` pins the
  * cross-run flip).
  *
  * Scale shape: deltas aggregate map-side per run (batch-sized); the
  * live table is a sum over the 128-bit digest — segment TEXT never
  * enters the index; cleaning is q105's digest-keyed join + per-doc
  * rollup with the df side read from the index instead of recomputed
  * corpus-wide. Compaction collapses the delta partitions into the
  * reserved `batch=-1` epoch holding the pre-summed table — content
  * invariant UNDER THE READ (the per-fp sums), which is the contract
  * q116 gates.
  */
object BoilerplateIndex {

  /** Fixed-width segmentation (q105/q72's 3-word discipline). */
  val SegWidth = 3

  /** A segment is boilerplate once its cumulative df reaches this. */
  val BoilerDf = 3L

  private[ext] def segs(batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(w) / $SegWidth.0) as int)" +
          s" - 1), i -> array_join(slice(w, i * $SegWidth + 1, " +
          s"$SegWidth), ' '))")).as(Seq("idx", "seg")))
      .withColumn("fp", md5(col("seg")))

  private val deltaSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fp",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_docs",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("batch",
      org.apache.spark.sql.types.LongType)))

  /** The live df table (fp, df): per-fp sum of all committed deltas.
    * Empty relation when no run has committed yet. */
  def dfTable(spark: SparkSession, indexDir: String): DataFrame =
    DedupIndex.readOrEmpty(spark, indexDir, deltaSchema)
      .groupBy("fp").agg(sum("n_docs").as("df"))

  /** Commit run `runId`'s df delta: one (fp, n_docs) row per distinct
    * segment of the batch, OVERWRITTEN under `batch=<runId>` so a
    * foreachBatch replay lands on the same partition instead of
    * double-counting. */
  def add(spark: SparkSession, indexDir: String, batch: DataFrame,
      runId: Long): Unit = {
    require(runId >= 0, "runId -1 is reserved for the compacted epoch")
    segs(batch)
      .groupBy("fp").agg(countDistinct(col("doc_id")).as("n_docs"))
      .write.mode("overwrite").parquet(s"$indexDir/batch=$runId")
  }

  /** Clean `batch` (doc_id, text) against the CURRENT df state: q105's
    * verdict and rollup, df read from the index (a segment the index has
    * never seen has df 0 — cleaning before any add is a no-op). Returns
    * (doc_id, n_segments, n_removed, cleaned_fp). */
  def clean(spark: SparkSession, indexDir: String,
      batch: DataFrame): DataFrame =
    segs(batch)
      .join(dfTable(spark, indexDir), Seq("fp"), "left")
      .withColumn("boiler", coalesce(col("df"), lit(0L)) >= BoilerDf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_removed"),
        array_sort(collect_list(
          when(!col("boiler"), struct(col("idx"), col("seg")))))
          .as("kept"))
      .select(col("doc_id"), col("n_segments"), col("n_removed"),
        md5(array_join(expr("transform(kept, x -> x.seg)"), " "))
          .as("cleaned_fp"))

  /** COMPACT: collapse the per-run delta partitions into the reserved
    * `batch=-1` epoch holding the pre-summed (fp, n_docs) table at
    * defaultParallelism files. The READ is invariant — per-fp sums are
    * unchanged — which is exactly what q116's post-compaction cleaning
    * holds to the oracle. Single-writer cron model (DedupIndex's
    * documented swap semantics). */
  def compact(spark: SparkSession, indexDir: String,
      excludeBatch: Option[Long] = None): DedupIndex.CompactionStats = {
    val raw = DedupIndex.readOrEmpty(spark, indexDir, deltaSchema)
    val live = excludeBatch.foldLeft(raw) {
      (df, b) => df.filter(col("batch") =!= b)
    }
    // eager: the sums must be read BEFORE the swap moves the live dir
    val summed = live.groupBy("fp").agg(sum("n_docs").as("n_docs"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    DedupIndex.rewriteAndSwap(spark, indexDir) { tmp =>
      summed.write.mode("overwrite").parquet(s"$tmp/batch=-1")
    }
  }
}

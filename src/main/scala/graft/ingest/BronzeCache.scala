package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-through bronze layer — the engine form of the reference's
  * response cache (S3/S4, reference src/extract_github_data.py:293-344):
  * raw records persist in a Parquet "bronze" dataset keyed by id; a new
  * batch of requested keys is served from bronze where possible
  * (cache hit ≙ scan elision) and only the misses go to the expensive
  * fetch, whose results are appended for the next run.
  *
  * The cache check is an anti-join on the key — a hash shuffle at worst,
  * a broadcast when the requested set is small — never a per-key lookup
  * loop like the reference's one-file-per-id cache.
  */
object BronzeCache {

  private def bronzeExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Serve `requested` (any DataFrame with an `id` column describing the
    * keys wanted this run) through the bronze cache at `bronzeDir`.
    *
    * @param fetchMiss given the missed subset of `requested`, produce the
    *                  fetched raw records (same schema as bronze)
    * @return (batch, hits, misses): the full batch of raw records for the
    *         requested keys, plus hit/miss counts for run metrics
    *         (cache_hits in the reference's envelope, :739)
    */
  def readThrough(spark: SparkSession, bronzeDir: String,
      requested: DataFrame, fetchMiss: DataFrame => DataFrame)
      : (DataFrame, Long, Long) = {
    val keys = requested.select("id")
    if (!bronzeExists(spark, bronzeDir)) {
      val fetched = fetchMiss(requested)
      fetched.write.mode("append").parquet(bronzeDir)
      (spark.read.parquet(bronzeDir).join(keys, Seq("id"), "left_semi"),
        0L, keys.count())
    } else {
      val bronze = spark.read.parquet(bronzeDir)
      val hits = bronze.join(keys, Seq("id"), "left_semi")
      val missKeys = requested.join(bronze.select("id"), Seq("id"), "left_anti")
      val nMiss = missKeys.count()
      if (nMiss > 0) {
        fetchMiss(missKeys).write.mode("append").parquet(bronzeDir)
      }
      val batch = spark.read.parquet(bronzeDir)
        .join(keys, Seq("id"), "left_semi")
      (batch, hits.count(), nMiss)
    }
  }
}

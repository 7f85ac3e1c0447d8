package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's per-record loop (reference src/extract_github_data.py:
  * 677-714) dissolved into a declarative DataFrame chain: flatten (T1) →
  * validate (T2) → metrics (T5) → partitioned sink (S7). Every stage is a
  * pure Catalyst projection/filter/aggregate — column pruning, predicate
  * pushdown and partition pruning come for free (SURVEY.md §4).
  */
object IngestPipeline {

  /** T1 nested-flatten projection (reference src/extract_github_data.py:
    * 494-527): hoist owner.* to owner_*; null-tolerant like dict.get.
    * Preserves the reference quirk that owner_url maps to owner.html_url,
    * NOT owner.url (reference src/extract_github_data.py:523). */
  def flatten(raw: DataFrame): DataFrame =
    raw.select(
      col("id").cast("long").as("id"),
      col("name"),
      col("full_name"),
      col("html_url"),
      col("description"),
      col("stargazers_count").cast("long").as("stargazers_count"),
      col("language"),
      to_timestamp(col("created_at")).as("created_at"),
      to_timestamp(col("updated_at")).as("updated_at"),
      col("owner.login").as("owner_login"),
      col("owner.id").cast("long").as("owner_id"),
      col("owner.type").as("owner_type"),
      col("owner.avatar_url").as("owner_avatar_url"),
      col("owner.html_url").as("owner_url"))

  /** T2 NOT-NULL validation with per-row reject reasons (reference
    * src/extract_github_data.py:530-547): adds `missing_fields`
    * (array of column names that are null) and `is_valid`. */
  def withValidation(flat: DataFrame): DataFrame = {
    val missing: Column = filter(
      array(RepoSchema.requiredFields.map(c =>
        when(col(c).isNull, lit(c))): _*),
      x => x.isNotNull)
    flat
      .withColumn("missing_fields", missing)
      .withColumn("is_valid", size(col("missing_fields")) === 0)
  }

  /** Split into (valid, invalid) streams — valid rows drop the
    * diagnostic columns; invalid rows keep them for the quarantine sink. */
  def split(validated: DataFrame): (DataFrame, DataFrame) = (
    validated.filter(col("is_valid")).drop("missing_fields", "is_valid"),
    validated.filter(!col("is_valid")))

  /** T5 run-summary metrics as a one-row aggregation (reference counters
    * at src/extract_github_data.py:670-742). failedCount arrives from the
    * fetch stage (null detail rows), apiCalls/cacheHits from the source's
    * request counters + the bronze read-through (reference :737-739),
    * testMode/duration from the runner. */
  def metrics(validated: DataFrame, startRepoId: Long, failedCount: Long,
      apiCalls: Long, cacheHits: Long,
      testMode: Boolean, durationSeconds: Double): DataFrame =
    validated.agg(
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")
        .as("extraction_date"),
      lit(startRepoId).as("start_repo_id"),
      coalesce(max("id"), lit(startRepoId)).as("last_repo_id"),
      count("*").as("total_processed"),
      sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_count"),
      sum(when(!col("is_valid"), 1L).otherwise(0L)).as("invalid_count"),
      lit(failedCount).as("failed_count"),
      lit(apiCalls).as("api_calls"),
      lit(cacheHits).as("cache_hits"),
      lit(testMode).as("test_mode"),
      lit(durationSeconds).as("duration_seconds"))

  /** S7 sink-partition derivation: Hive-style year=/month=/day= columns
    * from a timestamp (replaces the reference's bare yyyy/mm/dd S3 keys,
    * reference src/extract_github_data.py:572-578) so Catalyst partition
    * pruning works on the sink output. */
  def withDatePartitions(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))

  /** Partitioned append of the valid stream — the Spark-native form of
    * upload_to_s3 (reference src/extract_github_data.py:554-600). */
  def writePartitioned(valid: DataFrame, path: String, tsCol: String = "updated_at"): Unit =
    withDatePartitions(valid, tsCol)
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .json(path)
}

package graft.ingest

import org.apache.spark.sql.types._

/** The reference's data contract (SURVEY.md §1, FIXTURES.md §A).
  *
  * Raw shape: GitHub detail record subset actually consumed by the
  * reference's flatten (reference src/extract_github_data.py:494-527).
  * Flat shape: the 14-column canonical schema — REQUIRED_FIELDS
  * (reference src/extract_github_data.py:53-71) + Snowflake DDL
  * (reference README.md:267-283).
  */
object RepoSchema {

  val owner: StructType = StructType(Seq(
    StructField("login", StringType),
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("avatar_url", StringType),
    StructField("html_url", StringType)))

  /** Explicit schema for raw ingestion — production paths never infer
    * (SURVEY.md §1.3): unknown fields drop, missing fields become nulls
    * that the validation stage counts, mirroring dict.get + post-hoc
    * validation in the reference. */
  val raw: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("full_name", StringType),
    StructField("html_url", StringType),
    StructField("description", StringType),
    StructField("stargazers_count", LongType),
    StructField("language", StringType),
    StructField("created_at", StringType), // ISO-8601 "…Z"
    StructField("updated_at", StringType),
    StructField("owner", owner)))

  /** All 14 flat columns must be non-null to pass validation
    * (reference src/extract_github_data.py:530-547). */
  val requiredFields: Seq[String] = Seq(
    "id", "name", "full_name", "html_url", "description",
    "stargazers_count", "language", "created_at", "updated_at",
    "owner_login", "owner_id", "owner_type", "owner_avatar_url",
    "owner_url")

  val flat: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("full_name", StringType),
    StructField("html_url", StringType),
    StructField("description", StringType),
    StructField("stargazers_count", LongType),
    StructField("language", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("owner_login", StringType),
    StructField("owner_id", LongType),
    StructField("owner_type", StringType),
    StructField("owner_avatar_url", StringType),
    StructField("owner_url", StringType)))

  /** Run-metrics envelope (reference src/extract_github_data.py:730-742),
    * produced as a one-row aggregation instead of mutable counters.
    * api_calls / cache_hits mirror the reference's request + cache
    * counters (:737-739), fed from the source's page/detail call counts
    * and the bronze read-through hit counts. */
  val metrics: StructType = StructType(Seq(
    StructField("extraction_date", StringType),
    StructField("start_repo_id", LongType),
    StructField("last_repo_id", LongType),
    StructField("total_processed", LongType),
    StructField("valid_count", LongType),
    StructField("invalid_count", LongType),
    StructField("failed_count", LongType),
    StructField("api_calls", LongType),
    StructField("cache_hits", LongType),
    StructField("test_mode", BooleanType),
    StructField("duration_seconds", DoubleType)))
}

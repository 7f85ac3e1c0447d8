package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.ingest.IngestPipeline

/** Driver-checked coverage of the ingestion pipeline (SURVEY.md §2.2
  * T1+T2): synthesizes raw nested repo records (FIXTURES.md §A1 shape)
  * deterministically from the customer table, runs them through the real
  * IngestPipeline.flatten / withValidation, and exposes the per-row
  * validation verdicts. The oracle mirrors the projection + null rules in
  * plain SQL, so the 14-column contract (including the owner_url ↦
  * owner.html_url quirk, reference src/extract_github_data.py:523) is
  * hash-verified every round — not just unit-tested.
  */
object Ingestion {

  private val q40FlattenValidate = QueryDef(
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      // description null for one segment, language null for nationkey%5==0:
      // exercises the validation split on real data-derived nulls
      val raw = c.select(
        col("c_custkey").as("id"),
        concat(lit("repo-"), col("c_custkey")).as("name"),
        concat(col("c_name"), lit("/repo-"), col("c_custkey")).as("full_name"),
        concat(lit("https://gh.example/"), col("c_custkey")).as("html_url"),
        nullif(col("c_mktsegment"), lit("MACHINERY")).as("description"),
        col("c_custkey").cast("long").as("stargazers_count"),
        when(col("c_nationkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(lit("Scala")).as("language"),
        lit("2024-03-05T10:00:00Z").as("created_at"),
        lit("2024-03-06T11:30:00Z").as("updated_at"),
        struct(
          col("c_name").as("login"),
          (col("c_custkey") + 10000).cast("long").as("id"),
          lit("User").as("type"),
          lit("https://avatars.example/x").as("avatar_url"),
          concat(lit("https://gh.example/u/"), col("c_name")).as("html_url"))
          .as("owner"))
      val validated = IngestPipeline.withValidation(IngestPipeline.flatten(raw))
      validated.select(
          col("id"),
          col("owner_login"),
          col("owner_url"), // must be owner.html_url, not owner.url
          unix_timestamp(col("created_at")).as("created_epoch"),
          col("is_valid"),
          concat_ws(",", col("missing_fields")).as("missing"))
        .orderBy("id")
    },
    """SELECT c_custkey AS id,
      |       c_name AS owner_login,
      |       'https://gh.example/u/' || c_name AS owner_url,
      |       CAST(epoch(TIMESTAMP '2024-03-05 10:00:00') AS BIGINT)
      |         AS created_epoch,
      |       (c_mktsegment <> 'MACHINERY' AND c_nationkey % 5 <> 0)
      |         AS is_valid,
      |       concat_ws(',',
      |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 'description' END,
      |         CASE WHEN c_nationkey % 5 = 0 THEN 'language' END) AS missing
      |FROM customer ORDER BY c_custkey""")

  val defs: Map[String, QueryDef] = Map(
    "q40_ingest_flatten_validate" -> q40FlattenValidate,
  )
}

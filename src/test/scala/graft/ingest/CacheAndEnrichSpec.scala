package graft.ingest

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CacheAndEnrichSpec extends SparkSpec {

  private def keyDf(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  // counts how many times the expensive fetch actually ran
  private val fetchCalls = new AtomicInteger(0)

  private def fakeFetch(misses: DataFrame): DataFrame = {
    fetchCalls.incrementAndGet()
    misses.select(col("id"), concat(lit("payload-"), col("id")).as("payload"))
  }

  test("bronze read-through: first run fetches all, second run hits cache") {
    val bronze = Files.createTempDirectory("bronze").toString
    fetchCalls.set(0)

    val (batch1, hits1, miss1) =
      BronzeCache.readThrough(spark, bronze, keyDf(1, 2, 3), fakeFetch)
    assert(batch1.count() == 3 && hits1 == 0 && miss1 == 3)

    // overlapping request: only id 4 should be fetched
    val (batch2, hits2, miss2) =
      BronzeCache.readThrough(spark, bronze, keyDf(2, 3, 4), fakeFetch)
    assert(batch2.count() == 3 && hits2 == 2 && miss2 == 1)
    assert(batch2.filter("id = 2").count() == 1)

    // fully-cached request: the fetch function must not run at all
    val before = fetchCalls.get()
    val (batch3, hits3, miss3) =
      BronzeCache.readThrough(spark, bronze, keyDf(1, 4), fakeFetch)
    assert(batch3.count() == 2 && hits3 == 2 && miss3 == 0)
    assert(fetchCalls.get() == before)
  }

  private def summaries(ids: Long*): DataFrame = {
    val rows = ids.map(i =>
      Row(Long.box(i), s"repo-$i",
        Row(s"u$i", Long.box(i + 1000), "User", "a", "h")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("owner", RepoSchema.owner)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Fake client: id % 3 == 0 simulates a 404'd (deleted) repo. */
  private object FakeClientFactory extends DetailEnricher.DetailClientFactory {
    def apply(): DetailEnricher.DetailClient = new DetailEnricher.DetailClient {
      def fetchDetail(id: Long, owner: String, name: String): Option[String] =
        if (id % 3 == 0) None
        else Some(
          s"""{"id": $id, "name": "$name", "full_name": "$owner/$name",
             | "html_url": "https://x/$id", "description": "d",
             | "stargazers_count": ${id * 2}, "language": "Scala",
             | "created_at": "2024-03-05T10:00:00Z",
             | "updated_at": "2024-03-06T11:30:00Z",
             | "owner": {"login": "$owner", "id": ${id + 1000},
             |  "type": "User", "avatar_url": "a", "html_url": "h"}}"""
            .stripMargin.replaceAll("\n", ""))
    }
  }

  test("detail enrichment fetches per partition, counts failures, never fails the job") {
    val (enriched, failedAcc) =
      DetailEnricher.enrich(summaries(1L to 10L: _*), FakeClientFactory)
    val details = DetailEnricher.details(enriched)
    val got = details.collect()
    // ids 3, 6, 9 failed (404 analog) -> 7 successes
    assert(got.length == 7)
    assert(failedAcc.value == 3L)
    assert(got.map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 4L, 5L, 7L, 8L, 10L))
    // the enriched detail is a full raw record usable by the flatten stage
    val flat = IngestPipeline.flatten(details)
    assert(flat.filter("owner_login = 'u1'").count() == 1)
  }

  test("cached detail source wires api_calls/cache_hits into the envelope") {
    val bronze = Files.createTempDirectory("bronze").toString
    val src = new CachedDetailRepoSource(
      new DataFrameRepoSource(summaries(1L to 10L: _*)), bronze,
      FakeClientFactory)
    val runner = new IncrementalRunner(spark, src,
      Files.createTempDirectory("state").toString)
    val m1 = runner.runOnce(Files.createTempDirectory("sink").toString,
      Files.createTempDirectory("q").toString, budget = 10).collect()(0)
    // run 1: 1 list page + 10 detail fetches (all miss), ids 3/6/9 404
    assert(m1.getAs[Long]("api_calls") == 11L)
    assert(m1.getAs[Long]("cache_hits") == 0L)
    assert(m1.getAs[Long]("failed_count") == 3L)
    assert(m1.getAs[Long]("total_processed") == 7L)

    // fresh cursor, same bronze: the 7 cached details are hits; only the
    // previously-failed ids are re-fetched (and fail again)
    val runner2 = new IncrementalRunner(spark, src,
      Files.createTempDirectory("state2").toString)
    val m2 = runner2.runOnce(Files.createTempDirectory("sink2").toString,
      Files.createTempDirectory("q2").toString, budget = 10).collect()(0)
    assert(m2.getAs[Long]("cache_hits") == 7L)
    assert(m2.getAs[Long]("api_calls") == 1L + 3L)
    assert(m2.getAs[Long]("failed_count") == 3L)
    assert(m2.getAs[Long]("total_processed") == 7L)
  }

  test("runner persists the metadata envelope next to the sink") {
    val state = Files.createTempDirectory("state").toString
    val sink = Files.createTempDirectory("sink").toString
    val raw = summaries(1L, 2L) // reuse summary schema? need raw schema; build via enrich
    val (enriched, _) = DetailEnricher.enrich(raw, FakeClientFactory)
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(DetailEnricher.details(enriched)), state)
    val m = runner.runOnce(sink, Files.createTempDirectory("q").toString,
      budget = 10).collect()(0)
    val meta = spark.read.json(s"${sink}_metadata").collect()(0)
    assert(meta.getAs[Long]("total_processed") == m.getAs[Long]("total_processed"))
    assert(meta.getAs[Long]("last_repo_id") == 2L)
  }
}

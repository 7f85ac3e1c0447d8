package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RepoListSourceSpec extends SparkSpec {

  /** JSON-lines fixture shaped like the list endpoint (ids 1..n). */
  private def fixture(n: Int): String = {
    val f = Files.createTempFile("repos", ".jsonl")
    val lines = (1 to n).map { i =>
      s"""{"id": $i, "name": "repo-$i", "full_name": "o/$i", "html_url": "https://x/$i", """ +
        s""""description": "d$i", "stargazers_count": ${i * 10}, "language": "Scala", """ +
        s""""created_at": "2024-03-05T10:00:00Z", "updated_at": "2024-03-06T11:30:00Z", """ +
        s""""owner": {"login": "u$i", "id": ${i + 1000}, "type": "User", """ +
        s""""avatar_url": "https://a/$i", "html_url": "https://h/$i"}}"""
    }
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  private def read(path: String, opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft-repos").option("path", path)
    opts.foldLeft(r) { case (rr, (k, v)) => rr.option(k, v) }.load()
  }

  test("reads the full fixture through the short-name registration") {
    val df = read(fixture(25))
    assert(df.count() == 25)
    assert(df.schema == graft.ingest.RepoSchema.raw)
    val first = df.orderBy("id").collect()(0)
    assert(first.getStruct(first.fieldIndex("owner")).getAs[String]("login") == "u1")
  }

  test("keyset predicate id > since is pushed into the source") {
    val df = read(fixture(30)).filter(col("id") > 20L)
    assert(df.count() == 10)
    // the filter shows up as a pushed filter in the scan, and the scan
    // description proves the cursor moved
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("since=20"))
  }

  test("the since option sets the initial cursor") {
    val df = read(fixture(30), "since" -> "25")
    assert(df.count() == 5)
    assert(df.agg(min("id")).collect()(0).getLong(0) == 26L)
  }

  test("limit is pushed down and stops pagination early") {
    val df = read(fixture(500), "pageSize" -> "50").limit(7)
    assert(df.count() == 7)
    val scan = read(fixture(500), "pageSize" -> "50").limit(7)
      .queryExecution.executedPlan.toString
    assert(scan.contains("limit=7"))
  }

  test("filter AND limit pushdown compose (IsNotNull must not block limit)") {
    val df = read(fixture(100)).filter(col("id") > 30L).limit(4)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("since=30"))
    assert(scan.contains("limit=4"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(31L, 32L, 33L, 34L))
  }

  test("pagination walks pages in id order across page boundaries") {
    val df = read(fixture(230), "pageSize" -> "100")
    val ids = df.select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == (1L to 230L))
  }

  test("flows into the ingestion pipeline end-to-end") {
    val raw = read(fixture(12), "since" -> "2").limit(5)
    val validated = graft.ingest.IngestPipeline.withValidation(
      graft.ingest.IngestPipeline.flatten(raw))
    val rows = validated.orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    assert(rows.forall(_.getAs[Boolean]("is_valid")))
  }

  /** Transport double for the rate-limit paths: rejects the first
    * `rejectFirst` fetches (403 analog), then serves pages while
    * reporting a draining quota. */
  private final class ThrottledFetcher(rejectFirst: Int, quotaStart: Int)
      extends PageFetcher {
    var calls = 0
    private var limited = false
    private var quota = quotaStart
    override def fetch(since: Long, pageSize: Int): Seq[(Long, String)] = {
      calls += 1
      if (calls <= rejectFirst) { limited = true; Nil }
      else {
        limited = false
        quota -= 1
        (since + 1 to since + pageSize).map(i => (i, s"""{"id": $i}"""))
      }
    }
    override def rateLimited: Boolean = limited
    override def remainingQuota: Option[Int] = Some(quota)
  }

  test("backoff: rejected pages retry exponentially, then succeed") {
    val fetcher = new ThrottledFetcher(rejectFirst = 2, quotaStart = 100)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val adm = new RateLimit.Admission(
      RateLimit.Policy(baseBackoffMs = 100L, maxRetries = 3,
        quotaFloor = 5, floorDelayMs = 60000L), sleeps.append(_))
    val rows = adm.fetchPage(fetcher, since = 0L, pageSize = 3)
    assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    assert(fetcher.calls == 3)          // 2 rejections + 1 success
    assert(sleeps.toSeq == Seq(100L, 200L)) // exponential: base, 2·base
  }

  test("backoff: gives up after maxRetries rejections") {
    val fetcher = new ThrottledFetcher(rejectFirst = 99, quotaStart = 100)
    val ex = intercept[RateLimit.RateLimitedException] {
      new RateLimit.Admission(
        RateLimit.Policy(baseBackoffMs = 1L, maxRetries = 2,
          quotaFloor = 5, floorDelayMs = 1L), _ => ())
        .fetchPage(fetcher, 0L, 3)
    }
    assert(fetcher.calls == 3) // initial try + 2 retries
    assert(ex.getMessage.contains("rate-limited"))
    assert(ex.getMessage.contains("3 attempts")) // reports fetches TRIED
  }

  test("backoff: low reported quota arms a pause deferred to the next fetch") {
    // quota drops to the floor on the first success -> the floor delay
    // fires just BEFORE the next request (reference warns at <5), never
    // as a dead pause after the final fetch of a walk
    val fetcher = new ThrottledFetcher(rejectFirst = 0, quotaStart = 6)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val adm = new RateLimit.Admission(
      RateLimit.Policy(baseBackoffMs = 1L, maxRetries = 1,
        quotaFloor = 5, floorDelayMs = 777L), sleeps.append(_))
    adm.fetchPage(fetcher, 0L, 3)
    assert(sleeps.isEmpty) // quota hit the floor, but no request follows yet
    adm.fetchPage(fetcher, 3L, 3)
    assert(sleeps.toSeq == Seq(777L)) // paid at the start of the next fetch
    adm.fetchPage(fetcher, 6L, 3)
    assert(sleeps.toSeq == Seq(777L, 777L))
  }

  test("auth regime: token raises the page-fetch budget 60 -> 5000") {
    // 200 rows at pageSize=2 needs 100 fetches: the anonymous walk stops
    // at its 60-request budget (120 rows); a token lifts it to 5000
    val path = fixture(200)
    val anon = read(path, "pageSize" -> "2")
    assert(anon.count() == 120)
    assert(anon.queryExecution.executedPlan.toString.contains("budget=60"))
    val authed = read(path, "pageSize" -> "2", "token" -> "t0ken")
    assert(authed.count() == 200)
    assert(authed.queryExecution.executedPlan.toString.contains("budget=5000"))
  }

  test("auth regime: requestBudget option overrides either default") {
    val path = fixture(50)
    assert(read(path, "pageSize" -> "10", "requestBudget" -> "3").count() == 30)
    assert(read(path, "pageSize" -> "10", "token" -> "t",
      "requestBudget" -> "2").count() == 20)
  }
}

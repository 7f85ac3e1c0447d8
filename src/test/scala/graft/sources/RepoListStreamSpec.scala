package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Proves the streaming twin's offset mapping end-to-end: the keyset
  * cursor rides Structured Streaming's checkpointed offset log, so a
  * killed/restarted query resumes from the last COMMITTED repo id —
  * never from 0, never re-emitting processed rows (SURVEY §2.3). */
class RepoListStreamSpec extends SparkSpec {

  private def fixture(n: Int): String = {
    val f = Files.createTempFile("repos-stream", ".jsonl")
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

  /** One bounded run against a shared checkpoint + parquet sink: each
    * invocation is a fresh StreamingQuery (the kill/restart analog); the
    * sink ACCUMULATES, so the cumulative id set proves both resume (new
    * rows appear) and exactly-once delivery (no id ever duplicates). */
  private def runIncarnation(path: String, ckpt: String, out: String,
      trigger: Trigger): Seq[Long] = {
    val q = spark.readStream.format("graft-repos")
      .option("path", path)
      .option("maxIdsPerTrigger", "10")
      .load()
      .select("id")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(trigger)
      .start()
    q.awaitTermination()
    spark.read.parquet(out).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("kill/restart resumes from the committed checkpoint offset") {
    val path = fixture(30)
    val ckpt = Files.createTempDirectory("repo-ckpt").toString
    val out = Files.createTempDirectory("repo-out").toString
    // incarnation 1: one micro-batch of <= 10 ids, then the query ends
    assert(runIncarnation(path, ckpt, out, Trigger.Once()) == (1L to 10L))
    // incarnation 2 (restart): resumes at the committed cursor 10 —
    // rows 1..10 are NOT re-emitted (no duplicates in the cumulative set)
    assert(runIncarnation(path, ckpt, out, Trigger.Once()) == (1L to 20L))
    // incarnation 3: AvailableNow drains the remainder in bounded batches
    assert(runIncarnation(path, ckpt, out, Trigger.AvailableNow()) ==
      (1L to 30L))
    // fully drained: one more restart plans no new batch
    assert(runIncarnation(path, ckpt, out, Trigger.Once()) == (1L to 30L))
  }

  test("since option seeds the initial offset on a fresh checkpoint") {
    val path = fixture(20)
    val ckpt = Files.createTempDirectory("repo-ckpt2").toString
    val out = Files.createTempDirectory("repo-out2").toString
    val q = spark.readStream.format("graft-repos")
      .option("path", path).option("since", "15")
      .option("maxIdsPerTrigger", "100")
      .load()
      .select("id")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).collect()
      .map(_.getLong(0)).toSeq.sorted == (16L to 20L))
  }

  /** Wraps the file fetcher, counting pages — the quota meter a real
    * rate-limited transport bills by. */
  private final class CountingFetcher(path: String) extends PageFetcher {
    val inner = new JsonFileFetcher(path)
    var fetches = 0
    override def fetch(since: Long, pageSize: Int): Seq[(Long, String)] = {
      fetches += 1
      inner.fetch(since, pageSize)
    }
  }

  test("fetch-once: a micro-batch's pages are fetched during planning only") {
    val path = fixture(10)
    val counting = new CountingFetcher(path)
    val s = new RepoListMicroBatchStream(path, 0L, pageSize = 5,
      maxIdsPerTrigger = 10, RateLimit.Policy(),
      fetcherFactory = _ => counting)
    val start = s.initialOffset()
    val end = s.latestOffset(start,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10))
    assert(end.asInstanceOf[RepoStreamOffset].lastId == 10L)
    assert(counting.fetches == 2) // 10 ids / pageSize 5 — planning's walk
    // partition planning and the executor read add ZERO fetches: the
    // planner's rows ride inside the partition
    val parts = s.planInputPartitions(start, end)
    val reader = s.createReaderFactory().createReader(parts(0))
    var n = 0
    while (reader.next()) n += 1
    assert(n == 10)
    assert(counting.fetches == 2) // unchanged — no driver or executor re-fetch
  }

  test("request budget bounds the stream walk and stops planning loudly") {
    val path = fixture(30)
    val counting = new CountingFetcher(path)
    val s = new RepoListMicroBatchStream(path, 0L, pageSize = 5,
      maxIdsPerTrigger = 100, RateLimit.Policy(), requestBudget = 2,
      fetcherFactory = _ => counting)
    val lim = org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(100)
    val end = s.latestOffset(s.initialOffset(), lim)
    // 2 budgeted pages x 5 rows: the cursor stops at 10, not 30
    assert(end.asInstanceOf[RepoStreamOffset].lastId == 10L)
    assert(counting.fetches == 2)
    // further planning makes no progress and issues no further fetches
    val again = s.latestOffset(end, lim)
    assert(again.asInstanceOf[RepoStreamOffset].lastId == 10L)
    assert(counting.fetches == 2)
  }

  test("commit prunes the planner cache up to the committed offset") {
    val path = fixture(20)
    val s = new RepoListMicroBatchStream(path, 0L, pageSize = 10,
      maxIdsPerTrigger = 10, RateLimit.Policy())
    val lim = org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10)
    val o1 = s.latestOffset(s.initialOffset(), lim)
    s.commit(o1) // batch 0 done: its rows may leave driver memory
    val o2 = s.latestOffset(o1, lim)
    // planning continues correctly from the pruned cache
    assert(o2.asInstanceOf[RepoStreamOffset].lastId == 20L)
    val rows = s.planInputPartitions(o1, o2)(0)
      .asInstanceOf[RepoStreamPartition].rows
    assert(rows.length == 10)
  }

  test("offset json round-trips through deserializeOffset") {
    val s = new RepoListMicroBatchStream(fixture(5), 0L, 100, 10,
      RateLimit.Policy())
    val off = RepoStreamOffset(42L)
    assert(s.deserializeOffset(off.json())
      .asInstanceOf[RepoStreamOffset].lastId == 42L)
  }
}

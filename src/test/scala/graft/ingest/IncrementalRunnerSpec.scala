package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.SparkSpec

class IncrementalRunnerSpec extends SparkSpec {

  private def raw(ids: Long*): DataFrame = {
    val rows = ids.map { i =>
      Row(i, s"repo-$i", s"owner/repo-$i", s"https://x/$i", s"desc $i",
        i * 10, "Scala", "2024-03-05T10:00:00Z", "2024-03-06T11:30:00Z",
        Row(s"owner$i", i + 1000L, "User", s"https://a/$i", s"https://h/$i"))
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), RepoSchema.raw)
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("budget limit is applied before processing (keyset + limit pushdown)") {
    val state = tmp("state")
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(raw(1L to 100L: _*)), state)
    val m = runner.runOnce(tmp("sink"), tmp("q"), budget = 10).collect()(0)
    assert(m.getAs[Long]("total_processed") == 10L)
    assert(m.getAs[Long]("last_repo_id") == 10L)
    assert(runner.cursor == 10L)
  }

  test("subsequent runs resume from the committed cursor") {
    val state = tmp("state")
    val sink = tmp("sink")
    val q = tmp("q")
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(raw(1L to 25L: _*)), state)
    runner.runOnce(sink, q, budget = 10)
    runner.runOnce(sink, q, budget = 10)
    val m3 = runner.runOnce(sink, q, budget = 10).collect()(0)
    assert(m3.getAs[Long]("start_repo_id") == 20L)
    assert(m3.getAs[Long]("total_processed") == 5L)
    assert(runner.cursor == 25L)
    // no duplicates across the three micro-batches
    val all = spark.read.json(sink)
    assert(all.count() == 25L)
    assert(all.select("id").distinct().count() == 25L)
  }

  test("sink failure does NOT advance the cursor (fixes reference bug)") {
    // the reference commits the cursor per record (:714) but uploads once
    // at the end (:746) — a failed upload loses records. Our ordering:
    // sink first, cursor after.
    val state = tmp("state")
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(raw(1L to 5L: _*)), state)
    intercept[Exception] {
      // /proc is not writable — the JSON sink throws, cursor must stay 0
      runner.runOnce("/proc/graft-denied/sink", tmp("q"), budget = 5)
    }
    assert(runner.cursor == 0L)
    // retry with a good sink succeeds and commits
    val m = runner.runOnce(tmp("sink"), tmp("q"), budget = 5).collect()(0)
    assert(m.getAs[Long]("total_processed") == 5L)
    assert(runner.cursor == 5L)
  }

  test("empty fetch leaves the cursor untouched") {
    val state = tmp("state")
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(raw(1L, 2L)), state)
    runner.runOnce(tmp("sink"), tmp("q"), budget = 10)
    assert(runner.cursor == 2L)
    val m = runner.runOnce(tmp("sink2"), tmp("q2"), budget = 10).collect()(0)
    assert(m.getAs[Long]("total_processed") == 0L)
    assert(runner.cursor == 2L)
  }

  test("cursor precedence: file beats env, env beats zero") {
    // reference env-var cursor backend (src/extract_github_data.py:190-194)
    val state = tmp("state")
    val env = Map("GRAFT_LAST_REPO_ID" -> "7")
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(raw(1L to 20L: _*)), state, env.get)
    assert(runner.cursor == 7L) // no file yet: env seeds a fresh deployment
    val m = runner.runOnce(tmp("sink"), tmp("q"), budget = 5).collect()(0)
    assert(m.getAs[Long]("start_repo_id") == 7L)
    assert(m.getAs[Long]("last_repo_id") == 12L)
    assert(runner.cursor == 12L) // committed file now beats the env value
    val noEnv = new IncrementalRunner(spark,
      new DataFrameRepoSource(raw(1L to 20L: _*)), tmp("state2"), _ => None)
    assert(noEnv.cursor == 0L)
  }

  test("run envelope reports per-run api_calls and failed_count deltas") {
    val state = tmp("state")
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(raw(1L to 20L: _*), simulatedFailures = 2L),
      state)
    val sink = tmp("sink")
    val q = tmp("q")
    val m1 = runner.runOnce(sink, q, budget = 10).collect()(0)
    assert(m1.getAs[Long]("api_calls") == 1L)
    assert(m1.getAs[Long]("failed_count") == 2L)
    assert(m1.getAs[Long]("cache_hits") == 0L)
    val m2 = runner.runOnce(sink, q, budget = 10).collect()(0)
    // deltas, not cumulative totals: the second run charges its own call
    assert(m2.getAs[Long]("api_calls") == 1L)
    assert(m2.getAs[Long]("failed_count") == 2L)
  }

  test("invalid rows are quarantined with reasons, not dropped") {
    val state = tmp("state")
    val bad = raw(1L, 2L, 3L)
      .withColumn("language",
        org.apache.spark.sql.functions.expr("CASE WHEN id = 2 THEN NULL ELSE language END"))
    val runner = new IncrementalRunner(spark,
      new DataFrameRepoSource(bad), state)
    val sink = tmp("sink")
    val q = tmp("q")
    val m = runner.runOnce(sink, q, budget = 10).collect()(0)
    assert(m.getAs[Long]("valid_count") == 2L)
    assert(m.getAs[Long]("invalid_count") == 1L)
    val quarantined = spark.read.json(q)
    assert(quarantined.count() == 1L)
    assert({
      val qr = quarantined.collect()(0)
      qr.getSeq[String](qr.fieldIndex("missing_fields")) == Seq("language")
    })
    // cursor still advances over invalid rows (they were processed)
    assert(runner.cursor == 3L)
  }
}

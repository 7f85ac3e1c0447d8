package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class RollupEv(ts: java.sql.Timestamp, user_id: Long)

/** RollupStream: the sketch summary maintained by micro-batches — a day
  * split ACROSS batches still serves the exact union, and compaction
  * folds the multi-partial days without moving the estimate. */
class RollupStreamSpec extends SparkSpec {

  private def t(day: Int, h: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")

  test("streamed batches maintain the summary; a day spanning two " +
      "batches serves the union; compaction preserves the estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("rollup-stream").toString + "/mv"
    val ckpt = Files.createTempDirectory("rollup-ckpt").toString
    val input = MemoryStream[RollupEv]

    // batch 0: day 1 users {1,2}, day 2 user {3}
    input.addData(RollupEv(t(1, 9), 1), RollupEv(t(1, 10), 2),
      RollupEv(t(2, 9), 3))
    RollupStream.start(input.toDF(), dir, ckpt, maxFiles = 0)
      .awaitTermination()
    // batch 1: day 2 again — users {3,4} (3 is a cross-batch repeat)
    input.addData(RollupEv(t(2, 11), 3), RollupEv(t(2, 12), 4))
    RollupStream.start(input.toDF(), dir, ckpt, maxFiles = 0)
      .awaitTermination()

    val lo = java.sql.Date.valueOf("2024-03-01")
    val hi = java.sql.Date.valueOf("2024-03-02")
    def served() = graft.ext.Rollup.mergedDistinct(spark, dir, lo, hi)
      .collect().head
    val before = served()
    assert(before.getAs[Long]("estimate") === 4L,
      "cross-batch union must count users {1,2,3,4} once each")
    assert(before.getAs[Long]("n_rows") === 5L)
    // day 2 holds partials from both runs
    assert(spark.read.parquet(dir)
      .filter(col("day") === lit(hi)).count() === 2L)

    val cs = graft.ext.Rollup.compact(spark, dir)
    assert(cs.filesRead > 0 && cs.filesWritten > 0)
    val after = served()
    assert(after.getAs[Long]("estimate") === 4L,
      "compaction must not move the estimate (HLL union associativity)")
    assert(after.getAs[Long]("n_rows") === 5L)
    assert(after.getAs[Long]("partial_rows") === 2L,
      "compaction folds to one partial per day")
    assert(spark.read.parquet(dir).select("run").distinct()
      .collect().map(_.getInt(0)).toSeq === Seq(-1))
  }

  test("exact-partials twin: a day split across batches sums to the " +
      "direct aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("rollup-agg").toString + "/mv"
    val ckpt = Files.createTempDirectory("rollup-agg-ckpt").toString
    val input = MemoryStream[RollupAggEv]

    input.addData(RollupAggEv(t(1, 9), "view", 1.25),
      RollupAggEv(t(1, 10), "view", 2.50))
    RollupStream.startAgg(input.toDF(), dir, ckpt).awaitTermination()
    input.addData(RollupAggEv(t(1, 11), "view", 0.25),
      RollupAggEv(t(1, 12), "click", 10.00))
    RollupStream.startAgg(input.toDF(), dir, ckpt).awaitTermination()

    val served = spark.read.parquet(dir)
      .groupBy("day", "event_type")
      .agg(sum("cnt").as("n"), sum("value_cents").as("cents"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(served === Set(("view", 3L, 400L), ("click", 1L, 1000L)))
  }
}

case class RollupAggEv(ts: java.sql.Timestamp, event_type: String,
  value: Double)

package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ChangeRow(key: Long, os: String, oc: java.lang.Long,
  ns: String, nc: java.lang.Long)

/** IvmStream: change rows drained into the view per micro-batch,
  * exactly-once by run-overwrite — a restart drains only new data, a
  * half-applied batch is healed by its replay, and compaction between
  * drains (excluding the in-flight frontier) never double-counts. */
class IvmStreamSpec extends SparkSpec {

  private def toChanges(df: org.apache.spark.sql.DataFrame) =
    df.select(col("key"),
      when(col("os").isNotNull, struct(col("os").as("status"),
        col("oc").as("cents"))).as("old_row"),
      when(col("ns").isNotNull, struct(col("ns").as("status"),
        col("nc").as("cents"))).as("new_row"))

  private def served(view: String): Set[(String, Long, Long)] =
    graft.ext.Ivm.serve(spark, view).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("two drains with a restart, a mid-stream compact, and a " +
      "planted half-applied run: the view equals the change log's net " +
      "effect exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val view = Files.createTempDirectory("ivm-stream").toString + "/v"
    val ckpt = Files.createTempDirectory("ivm-stream-ck").toString
    graft.ext.Ivm.init(
      Seq(("A", 10L), ("B", 5L)).toDF("status", "cents"), view)
    val input = MemoryStream[ChangeRow]

    // batch 0 (run 1): A's 10 -> 12, insert C
    input.addData(ChangeRow(1, "A", 10L, "A", 12L),
      ChangeRow(2, null, null, "C", 50L))
    IvmStream.start(toChanges(input.toDF()), view, ckpt)
      .awaitTermination()
    assert(served(view) === Set(("A", 1L, 12L), ("B", 1L, 5L),
      ("C", 1L, 50L)))

    // compact between drains, excluding nothing in flight (run 1 is
    // committed by the checkpoint) — serve must not move
    graft.ext.Ivm.compact(spark, view, excludeRunsAbove = Some(1L))
    assert(served(view) === Set(("A", 1L, 12L), ("B", 1L, 5L),
      ("C", 1L, 50L)))

    // plant a half-applied NEXT run (a kill mid-write leaves a partial
    // run=2) — the restarted drain must overwrite it, not add to it
    Seq(("Z", 77L, 77000L)).toDF("status", "n", "v_cents")
      .write.mode("overwrite").parquet(s"$view/run=2")
    // restart: batch 1 (run 2) deletes B, moves C to D
    input.addData(ChangeRow(3, "B", 5L, null, null),
      ChangeRow(2, "C", 50L, "D", 60L))
    IvmStream.start(toChanges(input.toDF()), view, ckpt)
      .awaitTermination()
    assert(served(view) === Set(("A", 1L, 12L), ("D", 1L, 60L)),
      "the replayed run must overwrite the half-applied attempt")
  }

  test("auto-compaction bounds the run partitions over a long drain; " +
      "a kill mid-fold (stranded compacting temp + half-applied next " +
      "run) heals on restart; the committed-run watermark tracks the " +
      "settled frontier and is safe for an external fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val view = Files.createTempDirectory("ivm-stream-b").toString + "/v"
    val ckpt = Files.createTempDirectory("ivm-stream-bck").toString
    graft.ext.Ivm.init(
      Seq(("A", 10L)).toDF("status", "cents"), view)
    assert(IvmStream.committedRun(view).isEmpty,
      "no watermark before the first drained batch")
    val input = MemoryStream[ChangeRow]
    val nBatches = 12
    (0 until nBatches).foreach { i =>
      input.addData(ChangeRow(100L + i, null, null, s"G$i", i * 100L))
      if (i == 6) {
        // kill mid-fold: a compact died after writing its rewrite temp
        // (the swap never happened) and a half-applied NEXT run is on
        // disk — the stranded temp must be discarded by the next fold,
        // the half-applied run overwritten by its replay
        Seq(("JUNK", 9L, 9L)).toDF("status", "n", "v_cents")
          .write.mode("overwrite").parquet(s"${view}__compacting/run=-1")
        Seq(("Z", 7L, 7000L)).toDF("status", "n", "v_cents")
          .write.mode("overwrite").parquet(s"$view/run=${i + 1}")
      }
      IvmStream.start(toChanges(input.toDF()), view, ckpt,
        compactEvery = 4).awaitTermination()
    }
    // the drain processed batches 0..11 (runs 1..12), folding at batch
    // ids 4 and 8: partitions are bounded by ~compactEvery, not by the
    // number of increments absorbed
    val runs = spark.read.parquet(view).select("run").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(runs.size <= 6,
      s"auto-compaction failed to bound the run partitions: $runs")
    assert(runs.contains(-1), "the folded epoch must exist")
    val expected = (0 until nBatches)
      .map(i => (s"G$i", 1L, i * 100L)).toSet + (("A", 1L, 10L))
    assert(served(view) === expected,
      "long drain with mid-stream folds lost or double-counted deltas")
    // watermark: batches 0..11 ran, so the settled frontier is 11
    assert(IvmStream.committedRun(view) === Some(11L))
    // an external fold at exactly the watermark is safe BY CONTRACT
    // even if a run above it were mid-replay: runs ≤ 11 settle into
    // the reserved epoch, run 12 rides on top, serve is unchanged
    graft.ext.Ivm.compact(spark, view,
      excludeRunsAbove = IvmStream.committedRun(view))
    assert(served(view) === expected,
      "external fold at the committed-run watermark changed the view")
  }

  test("an EXTREMA view drains through the stream: retraction dirt " +
      "rides the micro-batch runs, and the external resolution at the " +
      "committed-run watermark hands back a clean base-less serve") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val G = Seq("status"); val V = Seq("cents"); val E = Seq("cents")
    val view = Files.createTempDirectory("ivm-stream-x").toString + "/v"
    val ckpt = Files.createTempDirectory("ivm-stream-xck").toString
    graft.ext.Ivm.init(
      Seq(("A", 10L), ("A", 20L), ("B", 5L)).toDF("status", "cents"),
      view, G, V, E)
    val input = MemoryStream[ChangeRow]
    // batch 0: delete A's max (20) — dirt; insert a lower B value —
    // clean monoid candidate
    input.addData(ChangeRow(1, "A", 20L, null, null),
      ChangeRow(9, null, null, "B", 2L))
    IvmStream.start(toChanges(input.toDF()), view, ckpt, G, V, E, 8)
      .awaitTermination()
    def servedX(b: Option[org.apache.spark.sql.DataFrame]) =
      graft.ext.Ivm.serve(spark, view, G, V, E, b).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val base = Seq(("A", 10L), ("B", 5L), ("B", 2L))
      .toDF("status", "cents")
    val expected = Set(("A", 1L, 10L, 10L, 10L), ("B", 2L, 7L, 2L, 5L))
    assert(intercept[IllegalArgumentException](servedX(None))
      .getMessage.contains("dirty"))
    assert(servedX(Some(base)) === expected)
    // resolution: the watermark (persisted at batch ENTRY) still sits
    // below run 1, so a fold there would preserve the dirty run
    // verbatim — dirt above the frontier is by design unresolvable
    // until settled. After awaitTermination the stream is quiescent,
    // so the caller may assert exactly that with None and resolve
    // everything: clean base-less serves thereafter.
    assert(IvmStream.committedRun(view) === Some(0L))
    graft.ext.Ivm.compact(spark, view, None, G, Some(base)): Unit
    assert(servedX(None) === expected)
  }
}

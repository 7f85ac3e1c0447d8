package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IvmRunner: the changefeed→view drain — chain validation, crash
  * replay by run-overwrite, strand skipping, and the maintain loop's
  * fold keeping the view bounded without changing its contents. */
class IvmRunnerSpec extends SparkSpec {

  /** Build table + sink + both cursors; publish the bootstrap pin and
    * snapshot-init the view at v1. */
  private def rig(): (String, String, String, FileCursorStore,
      FileCursorStore) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivmr")
    val table = root.resolve("t").toString
    val view = root.resolve("v").toString
    val sink = root.resolve("s").toString
    val pub = new FileCursorStore(root.resolve("pc").toString)
    val ivm = new FileCursorStore(root.resolve("ic").toString)
    graft.ext.MergeTable.create(
      (1L to 100L).map(i => (i, if (i % 2 == 0) "E" else "O", i * 10L))
        .toDF("key", "status", "cents"), table, "key")
    assert(ChangefeedRunner.runOnce(spark, table, sink, pub).isEmpty)
    graft.ext.Ivm.init(
      graft.ext.MergeTable.readTable(spark, table, Some(1L))
        .drop("bucket"), view)
    ivm.commit(1L)
    (table, view, sink, pub, ivm)
  }

  private def served(view: String): Set[(String, Long, Long)] =
    graft.ext.Ivm.serve(spark, view).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def direct(table: String): Set[(String, Long, Long)] =
    graft.ext.MergeTable.readTable(spark, table)
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("drain applies published increments in order; view equals the " +
      "direct aggregate; an uninitialized cursor fails loudly") {
    import spark.implicits._
    val (table, view, sink, pub, ivm) = rig()
    graft.ext.MergeTable.upsert(spark, table,
      Seq((2L, "X", 999L), (101L, "O", 5L)).toDF("key", "status", "cents"))
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    graft.ext.MergeTable.deleteKeys(spark, table, Seq(3L).toDF("key"))
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    val applied = IvmRunner.runOnce(spark, sink, view, ivm)
    assert(applied === Seq(2L, 3L))
    assert(served(view) === direct(table))
    assert(ivm.read() === Some(3L))
    // uninitialized consumer: loud failure, no guessing
    val fresh = new FileCursorStore(
      java.nio.file.Files.createTempDirectory("ivmr-fresh").toString)
    val err = intercept[IllegalStateException] {
      IvmRunner.runOnce(spark, sink, view, fresh)
    }
    assert(err.getMessage.contains("bootstrap"))
  }

  test("kill/restart between apply and cursor commit: the replay " +
      "overwrites the same run partition — view contents exactly once") {
    import spark.implicits._
    val (table, view, sink, pub, ivm) = rig()
    graft.ext.MergeTable.upsert(spark, table,
      Seq((4L, "X", 7L)).toDF("key", "status", "cents"))
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    // crash injection: apply the batch WITHOUT committing the cursor —
    // exactly the state a kill between the two leaves behind
    graft.ext.Ivm.applyChanges(
      spark.read.parquet(s"$sink/batch=2"), view, 2L)
    assert(ivm.read() === Some(1L), "the crash left the cursor behind")
    // restart: the runner replays batch 2 (run overwrite), then commits
    val applied = IvmRunner.runOnce(spark, sink, view, ivm)
    assert(applied === Seq(2L))
    assert(ivm.read() === Some(2L))
    assert(served(view) === direct(table),
      "replay after the mid-batch kill must not double-count")
  }

  test("chain validation: an overlapping batch (fromV below the " +
      "cursor) and a gapped feed both fail loudly; a markerless " +
      "strand is skipped unread") {
    import spark.implicits._
    val (table, view, sink, pub, ivm) = rig()
    graft.ext.MergeTable.upsert(spark, table,
      Seq((6L, "X", 1L)).toDF("key", "status", "cents"))
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    IvmRunner.runOnce(spark, sink, view, ivm) // cursor -> 2
    // overlap: rewrite batch=3's marker to claim fromV=1 (< cursor 2)
    graft.ext.MergeTable.upsert(spark, table,
      Seq((7L, "X", 2L)).toDF("key", "status", "cents"))
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    ChangefeedRunner.writeMarker(spark, s"$sink/batch=3", 1L, 3L)
    val overlap = intercept[IllegalStateException] {
      IvmRunner.runOnce(spark, sink, view, ivm)
    }
    assert(overlap.getMessage.contains("double-count"))
    // gap: marker claims fromV ahead of the cursor
    ChangefeedRunner.writeMarker(spark, s"$sink/batch=3", 5L, 6L)
    val gap = intercept[IllegalStateException] {
      IvmRunner.runOnce(spark, sink, view, ivm)
    }
    assert(gap.getMessage.contains("missing"))
    // restore the true marker; also plant a markerless strand ABOVE the
    // real batches — it must be skipped unread, not break the drain
    ChangefeedRunner.writeMarker(spark, s"$sink/batch=3", 2L, 3L)
    Seq((1L, "junk")).toDF("key", "change")
      .write.parquet(s"$sink/batch=99") // parquet only, no feed marker
    val applied = IvmRunner.runOnce(spark, sink, view, ivm)
    assert(applied === Seq(3L))
    assert(served(view) === direct(table))
  }

  test("a writer retrying through a planted commit conflict " +
      "interleaves with the publisher+maintainer pipeline and a " +
      "layout-maintenance commit: the served view still equals the " +
      "direct aggregate and the maintenance publish is empty") {
    import spark.implicits._
    val (table, view, sink, pub, ivm) = rig()
    // writer A's commit window: writer B lands first (same bucket set
    // possible), A loses the manifest race and retries against B's
    // snapshot — the multi-writer protocol on the pipeline's table
    var fired = false
    graft.ext.MergeTable.upsertWithHook(spark, table,
      Seq((10L, "X", 111L)).toDF("key", "status", "cents"),
      () => if (!fired) {
        fired = true
        graft.ext.MergeTable.upsert(spark, table,
          Seq((10L, "Y", 5L), (11L, "X", 222L))
            .toDF("key", "status", "cents")): Unit
      })
    assert(fired)
    // the publisher coalesces B's and A's commits into one batch; the
    // maintainer drains and folds
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    IvmRunner.maintainOnce(spark, sink, view, ivm)
    assert(served(view) === direct(table),
      "conflict-retried writes must flow through the feed exactly once")
    // a COMPACTOR commits between publisher runs: the layout-only
    // version must publish an EMPTY batch (content fingerprints), and
    // the maintainer must absorb it as a no-op increment
    graft.ext.MergeTable.optimize(spark, table, "cents")
    val r = ChangefeedRunner.runOnce(spark, table, sink, pub)
    assert(r.exists(_.rows === 0L),
      s"a layout-only commit must publish an empty batch, got $r")
    IvmRunner.maintainOnce(spark, sink, view, ivm)
    assert(served(view) === direct(table),
      "the maintenance no-op batch must not move the view")
  }

  test("maintainOnce folds settled runs each pass: the view serves " +
      "from O(groups) partials however many increments flowed, with " +
      "identical contents") {
    import spark.implicits._
    val (table, view, sink, pub, ivm) = rig()
    (1 to 5).foreach { i =>
      graft.ext.MergeTable.upsert(spark, table,
        Seq((i.toLong, "M", i * 1000L)).toDF("key", "status", "cents"))
      ChangefeedRunner.runOnce(spark, table, sink, pub)
      IvmRunner.maintainOnce(spark, sink, view, ivm)
    }
    assert(served(view) === direct(table))
    // boundedness: everything folded into the reserved epoch
    val runs = spark.read.parquet(view).select("run").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(runs === Set(-1),
      s"maintain loop left unfolded runs: $runs")
  }

  test("a GENERALIZED view (min/max extrema) rides the wired pipeline: " +
      "the maintain drain carries the dirt through its folds, a serve " +
      "with the frontier snapshot recomputes exactly, and a resolving " +
      "compact hands back a clean base-less view") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivmr-x")
    val table = root.resolve("t").toString
    val view = root.resolve("v").toString
    val sink = root.resolve("s").toString
    val pub = new FileCursorStore(root.resolve("pc").toString)
    val ivm = new FileCursorStore(root.resolve("ic").toString)
    val G = Seq("status"); val V = Seq("cents"); val E = Seq("cents")
    graft.ext.MergeTable.create(
      (1L to 100L).map(i => (i, if (i % 2 == 0) "E" else "O", i * 10L))
        .toDF("key", "status", "cents"), table, "key")
    assert(ChangefeedRunner.runOnce(spark, table, sink, pub).isEmpty)
    graft.ext.Ivm.init(
      graft.ext.MergeTable.readTable(spark, table, Some(1L))
        .drop("bucket"), view, G, V, E)
    ivm.commit(1L)
    // delete E's MAX (key 100, cents 1000) — the retraction whose value
    // WAS the extreme, the exact case merged candidates cannot serve
    graft.ext.MergeTable.deleteKeys(spark, table, Seq(100L).toDF("key"))
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    // and an insert that lowers O's min (clean-path candidate)
    graft.ext.MergeTable.upsert(spark, table,
      Seq((101L, "O", 1L)).toDF("key", "status", "cents"))
    ChangefeedRunner.runOnce(spark, table, sink, pub)
    assert(IvmRunner.maintainOnce(spark, sink, view, ivm, G, V, E)
      === Seq(2L, 3L))
    val base = graft.ext.MergeTable.readTable(spark, table)
      .drop("bucket").localCheckpoint(true)
    def servedX(b: Option[org.apache.spark.sql.DataFrame]) =
      graft.ext.Ivm.serve(spark, view, G, V, E, b).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val expected = Set(
      ("E", 49L, (2L to 98L by 2).map(_ * 10).sum, 20L, 980L),
      ("O", 51L, (1L to 99L by 2).map(_ * 10).sum + 1L, 1L, 990L))
    // dirty E: serve needs the frontier snapshot; base-less throws
    assert(intercept[IllegalArgumentException](servedX(None))
      .getMessage.contains("dirty"))
    assert(servedX(Some(base)) === expected)
    // resolution: one compact with base, then base-less serves are clean
    graft.ext.Ivm.compact(spark, view, Some(3L), G, Some(base)): Unit
    assert(servedX(None) === expected)
  }
}

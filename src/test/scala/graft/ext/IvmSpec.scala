package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ivm delta algebra in isolation: retraction moves weight between
  * groups, a group emptied by deletes cancels out of the serve, and
  * replaying an increment's run partition is idempotent. */
class IvmSpec extends SparkSpec {

  test("retract+assert deltas reproduce the direct aggregate, " +
      "including group migration and emptied-group cancellation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm")
      .resolve("v").toString
    // base: A={10,20}, B={5}
    Ivm.init(Seq(("A", 10L), ("A", 20L), ("B", 5L))
      .toDF("status", "cents"), dir)
    // increment: migrate one A row (10) to C at 12; delete B's only row
    val cf = Seq(
      (1L, "A", java.lang.Long.valueOf(10L), "C",
        java.lang.Long.valueOf(12L)),
      (2L, "B", java.lang.Long.valueOf(5L), null.asInstanceOf[String],
        null.asInstanceOf[java.lang.Long]))
      .toDF("key", "os", "oc", "ns", "nc")
      .select(col("key"),
        when(col("os").isNotNull, struct(col("os").as("status"),
          col("oc").as("cents"))).as("old_row"),
        when(col("ns").isNotNull, struct(col("ns").as("status"),
          col("nc").as("cents"))).as("new_row"))
    Ivm.applyChanges(cf, dir, 1)
    Ivm.applyChanges(cf, dir, 1) // replay: run overwrite, not append
    val got = Ivm.serve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("A", 1L, 20L), ("C", 1L, 12L)),
      s"delta algebra broke: $got")
  }

  private def mkChangefeed(rows: Seq[(Long, String, java.lang.Long,
      String, java.lang.Long)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("key", "os", "oc", "ns", "nc")
      .select(col("key"),
        when(col("os").isNotNull, struct(col("os").as("status"),
          col("oc").as("cents"))).as("old_row"),
        when(col("ns").isNotNull, struct(col("ns").as("status"),
          col("nc").as("cents"))).as("new_row"))
  }

  test("compact folds every settled run into the reserved epoch " +
      "without changing the serve — including a net-zero group whose " +
      "cents delta must survive the fold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-c")
      .resolve("v").toString
    Ivm.init(Seq(("A", 10L), ("A", 20L), ("B", 5L))
      .toDF("status", "cents"), dir)
    // run 1: within-group update (A: 10 -> 13) — n cancels to 0 for A,
    // cents delta +3 must NOT be lost by the fold
    Ivm.applyChanges(mkChangefeed(Seq(
      (1L, "A", 10L, "A", 13L))), dir, 1)
    // run 2: migrate B's row to C
    Ivm.applyChanges(mkChangefeed(Seq(
      (2L, "B", 5L, "C", 7L))), dir, 2)
    val before = Ivm.serve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val st = Ivm.compact(spark, dir)
    val after = Ivm.serve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === before, "compaction changed the served view")
    assert(after === Set(("A", 2L, 33L), ("C", 1L, 7L)))
    assert(st.filesWritten < st.filesRead,
      "the fold should shrink the partial set")
    // the view now serves from the single reserved epoch
    val runs = spark.read.parquet(dir).select("run").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(runs === Set(-1), s"expected only run=-1, got $runs")
    // a fresh increment lands on top of the folded epoch exactly
    Ivm.applyChanges(mkChangefeed(Seq(
      (3L, null, null, "D", 100L))), dir, 3)
    val withNew = Ivm.serve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(withNew === Set(("A", 2L, 33L), ("C", 1L, 7L), ("D", 1L, 100L)))
  }

  test("the view definition is generic: a (lang, bytes) view " +
      "maintains, folds and serves exactly like the default pair, and " +
      "a mis-named serve fails loudly instead of silently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-g")
      .resolve("v").toString
    Ivm.init(Seq(("en", 100L), ("en", 50L), ("fr", 30L))
      .toDF("lang", "bytes"), dir, groupCol = "lang", valCol = "bytes")
    val cf = Seq(
      (1L, "en", java.lang.Long.valueOf(100L), "de",
        java.lang.Long.valueOf(120L)))
      .toDF("key", "ol", "ob", "nl", "nb")
      .select(col("key"),
        when(col("ol").isNotNull, struct(col("ol").as("lang"),
          col("ob").as("bytes"))).as("old_row"),
        when(col("nl").isNotNull, struct(col("nl").as("lang"),
          col("nb").as("bytes"))).as("new_row"))
    Ivm.applyChanges(cf, dir, 1, groupCol = "lang", valCol = "bytes")
    Ivm.compact(spark, dir, groupCol = "lang")
    val got = Ivm.serve(spark, dir, groupCol = "lang", valCol = "bytes")
    assert(got.columns.toSeq === Seq("lang", "n", "sum_bytes"))
    val rows = got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(("en", 1L, 50L), ("fr", 1L, 30L),
      ("de", 1L, 120L)))
    // the definition is fixed at init: serving under the wrong group
    // column cannot silently return garbage
    intercept[Exception] {
      Ivm.serve(spark, dir).collect()
    }
  }

  test("compact excludes runs above the settled frontier from the " +
      "FOLD but preserves their partitions verbatim: a replay still " +
      "overwrites its run (no double count), and an applied-but-" +
      "unsettled run survives a fold that will never see a replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-x")
      .resolve("v").toString
    Ivm.init(Seq(("A", 10L)).toDF("status", "cents"), dir)
    Ivm.applyChanges(mkChangefeed(Seq(
      (1L, "A", 10L, "A", 12L))), dir, 1) // settled (frontier = 1)
    Ivm.applyChanges(mkChangefeed(Seq(
      (2L, null, null, "B", 50L))), dir, 2) // above the frontier
    Ivm.compact(spark, dir, excludeRunsAbove = Some(1L))
    // run 2 stayed OUT of the folded epoch but ON disk: the fold wrote
    // run=-1 from runs ≤ 1 and byte-copied run=2 alongside
    val runs = spark.read.parquet(dir).select("run").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(runs === Set(-1, 2),
      s"excluded run must be preserved verbatim, got partitions $runs")
    val served = Ivm.serve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(served === Set(("A", 1L, 12L), ("B", 1L, 50L)),
      "an applied-but-unsettled run must survive the fold — if its " +
        "batch is checkpoint-committed, no replay will ever restore it")
    // a maintainer REPLAYING run 2 (the half-applied case) overwrites
    // the preserved partition — same deltas, exactly once, never added
    Ivm.applyChanges(mkChangefeed(Seq(
      (2L, null, null, "B", 50L))), dir, 2)
    val after = Ivm.serve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === Set(("A", 1L, 12L), ("B", 1L, 50L)),
      "the replay must overwrite the preserved run, not double-count")
  }

  // ---- min/max extrema channel --------------------------------------

  private val G = Seq("status"); private val V = Seq("cents")
  private val E = Seq("cents")

  private def servedX(base: Option[org.apache.spark.sql.DataFrame])(
      dir: String): Set[(String, Long, Long, Long, Long)] =
    Ivm.serve(spark, dir, G, V, E, base).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("extrema, CLEAN path: insert-only increments merge min/max " +
      "exactly without ever touching the base — including a brand-new " +
      "group born from an insert") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-mn")
      .resolve("v").toString
    Ivm.init(Seq(("A", 10L), ("A", 20L)).toDF("status", "cents"),
      dir, G, V, E)
    Ivm.applyChanges(mkChangefeed(Seq(
      (3L, null, null, "A", 5L),    // new A min
      (4L, null, null, "A", 15L),   // interior
      (5L, null, null, "B", 50L))), // new group
      dir, 1, G, V, E)
    assert(servedX(None)(dir) ===
      Set(("A", 4L, 50L, 5L, 20L), ("B", 1L, 50L, 50L, 50L)))
  }

  test("extrema, DIRTY path: a deletion may have removed the extreme — " +
      "serving without base fails LOUDLY, serving with base recomputes " +
      "only the dirty group") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-md")
      .resolve("v").toString
    Ivm.init(Seq(("A", 10L), ("A", 20L), ("B", 5L), ("B", 7L))
      .toDF("status", "cents"), dir, G, V, E)
    // delete A's MAX (20): merged candidates would still claim 20
    Ivm.applyChanges(mkChangefeed(Seq(
      (1L, "A", 20L, null, null))), dir, 1, G, V, E)
    val e = intercept[IllegalArgumentException](servedX(None)(dir))
    assert(e.getMessage.contains("dirty"))
    val base = Seq(("A", 10L), ("B", 5L), ("B", 7L))
      .toDF("status", "cents")
    assert(servedX(Some(base))(dir) ===
      Set(("A", 1L, 10L, 10L, 10L), ("B", 2L, 12L, 5L, 7L)))
  }

  test("extrema: dirt SURVIVES a fold without base (it never silently " +
      "resolves), and a fold WITH base resolves it so later serves and " +
      "inserts ride the clean monoid again") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-mf")
      .resolve("v").toString
    Ivm.init(Seq(("A", 10L), ("A", 20L)).toDF("status", "cents"),
      dir, G, V, E)
    // update A's max within-group (20 -> 12): retraction dirties A
    Ivm.applyChanges(mkChangefeed(Seq(
      (1L, "A", 20L, "A", 12L))), dir, 1, G, V, E)
    Ivm.compact(spark, dir, None, G, None) // fold, dirt must survive
    val e = intercept[IllegalArgumentException](servedX(None)(dir))
    assert(e.getMessage.contains("dirty"),
      "a base-less fold must not have resolved the dirty group")
    val base1 = Seq(("A", 10L), ("A", 12L)).toDF("status", "cents")
    Ivm.compact(spark, dir, None, G, Some(base1)) // resolution
    assert(servedX(None)(dir) === Set(("A", 2L, 22L, 10L, 12L)),
      "the resolving fold must leave a clean, base-less-servable view")
    // post-resolution insert: clean monoid merge again
    Ivm.applyChanges(mkChangefeed(Seq(
      (9L, null, null, "A", 3L))), dir, 2, G, V, E)
    assert(servedX(None)(dir) === Set(("A", 3L, 25L, 3L, 12L)))
  }

  test("extrema: a group emptied by deletes cancels out of the serve, " +
      "and a later re-insert restarts its extrema from the new values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-me")
      .resolve("v").toString
    Ivm.init(Seq(("A", 10L), ("B", 5L)).toDF("status", "cents"),
      dir, G, V, E)
    Ivm.applyChanges(mkChangefeed(Seq(
      (1L, "A", 10L, null, null))), dir, 1, G, V, E) // empty A out
    val base1 = Seq(("B", 5L)).toDF("status", "cents")
    assert(servedX(Some(base1))(dir) === Set(("B", 1L, 5L, 5L, 5L)))
    Ivm.compact(spark, dir, None, G, Some(base1)) // A resets to null extrema
    Ivm.applyChanges(mkChangefeed(Seq(
      (2L, null, null, "A", 99L))), dir, 2, G, V, E)
    assert(servedX(None)(dir) ===
      Set(("A", 1L, 99L, 99L, 99L), ("B", 1L, 5L, 5L, 5L)),
      "re-inserted group must restart extrema from the new value, " +
        "never resurrect the deleted one")
  }
}

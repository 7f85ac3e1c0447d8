package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ChangefeedRunner: bootstrap pins without publishing, increments
  * coalesce per run, a crash between sink and commit replays into the
  * same bytes, and a quiet table is a no-op. */
class ChangefeedRunnerSpec extends SparkSpec {

  test("bootstrap, incremental publish, crash replay, quiet no-op") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("cfr-table")
      .resolve("t").toString
    val sink = java.nio.file.Files.createTempDirectory("cfr-sink").toString
    val state = java.nio.file.Files.createTempDirectory("cfr-state").toString
    val cursor = new FileCursorStore(state)
    graft.ext.MergeTable.create(
      (1L to 100L).map(i => (i, s"v$i")).toDF("key", "value"), table, "key")

    // bootstrap: cursor pinned to v1, nothing published
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty)
    assert(cursor.read() === Some(1L))

    // two commits, ONE run: the diff coalesces
    graft.ext.MergeTable.upsert(spark, table,
      Seq((5L, "x"), (101L, "ins")).toDF("key", "value"))
    graft.ext.MergeTable.deleteKeys(spark, table, Seq(9L).toDF("key"))
    val r = ChangefeedRunner.runOnce(spark, table, sink, cursor).get
    assert(r.fromV === 1L && r.toV === 3L && r.rows === 3L)
    assert(cursor.read() === Some(3L))
    val feed = spark.read.parquet(s"$sink/batch=3")
      .select("key", "change").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(feed === Map(5L -> "update", 101L -> "insert", 9L -> "delete"))

    // crash between sink and commit: replay overwrites the same batch
    cursor.commit(1L) // rewind = the not-yet-committed state
    val r2 = ChangefeedRunner.runOnce(spark, table, sink, cursor).get
    assert(r2 === r)
    assert(spark.read.parquet(s"$sink/batch=3").count() === 3L)

    // quiet table: no-op, cursor unchanged
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty)
    assert(cursor.read() === Some(3L))
  }

  test("a stranded batch dir from a crashed run (table advanced " +
      "before the retry) is swept by the next successful publish") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("cfr-strand")
      .resolve("t").toString
    val sink = java.nio.file.Files.createTempDirectory("cfr-ssink")
      .toString
    val state = java.nio.file.Files.createTempDirectory("cfr-sstate")
      .toString
    val cursor = new FileCursorStore(state)
    graft.ext.MergeTable.create(
      (1L to 50L).map(i => (i, s"v$i")).toDF("key", "value"), table, "key")
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty)
    // crashed run: half-wrote batch=2 (a run targeting v2 that died
    // before committing its cursor), then the table advanced to v3
    graft.ext.MergeTable.upsert(spark, table,
      Seq((3L, "x")).toDF("key", "value"))
    Seq((3L, "update")).toDF("key", "change")
      .write.parquet(s"$sink/batch=2") // the strand
    graft.ext.MergeTable.upsert(spark, table,
      Seq((4L, "y")).toDF("key", "value"))
    val r = ChangefeedRunner.runOnce(spark, table, sink, cursor).get
    assert(r.fromV === 1L && r.toV === 3L)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sink/batch=2")),
      "the stranded uncommitted batch dir must be swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$sink/batch=3")))
    assert(cursor.read() === Some(3L))
  }

  test("sink retention: batches at or below the slowest consumer's " +
      "cursor prune away; the unconsumed tail survives and still " +
      "chains") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("cfr-prune")
      .resolve("t").toString
    val sink = java.nio.file.Files.createTempDirectory("cfr-psink")
      .toString
    val cursor = new FileCursorStore(
      java.nio.file.Files.createTempDirectory("cfr-pstate").toString)
    graft.ext.MergeTable.create(
      (1L to 30L).map(i => (i, s"v$i")).toDF("key", "value"), table, "key")
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty)
    (1 to 3).foreach { i =>
      graft.ext.MergeTable.upsert(spark, table,
        Seq((i.toLong, s"u$i")).toDF("key", "value"))
      ChangefeedRunner.runOnce(spark, table, sink, cursor)
    }
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def batches(): Set[String] = fs.listStatus(
      new org.apache.hadoop.fs.Path(sink))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(batches() === Set("batch=2", "batch=3", "batch=4"))
    // the slowest consumer has absorbed through version 3
    val pruned = ChangefeedRunner.pruneSink(spark, sink, 3L)
    assert(pruned === 2L)
    assert(batches() === Set("batch=4"))
    // the surviving batch still chains for a consumer at cursor 3
    assert(ChangefeedRunner.readMarker(spark, s"$sink/batch=4")
      === Some((3L, 4L)))
    // idempotent
    assert(ChangefeedRunner.pruneSink(spark, sink, 3L) === 0L)
  }

  test("vacuum past the cursor fails the next run loudly — retention " +
      "must cover publisher lag, and the failure names the gap") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("cfr-vac")
      .resolve("t").toString
    val sink = java.nio.file.Files.createTempDirectory("cfr-vsink")
      .toString
    val state = java.nio.file.Files.createTempDirectory("cfr-vstate")
      .toString
    val cursor = new FileCursorStore(state)
    graft.ext.MergeTable.create(
      (1L to 10L).map(i => (i, s"v$i")).toDF("key", "value"), table, "key")
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty)
    graft.ext.MergeTable.upsert(spark, table,
      Seq((2L, "x")).toDF("key", "value"))
    // retention violates the publisher's lag: v1 (the cursor) drops
    graft.ext.MergeTable.vacuum(spark, table, retainVersions = 1)
    val err = intercept[IllegalArgumentException] {
      ChangefeedRunner.runOnce(spark, table, sink, cursor)
    }
    assert(err.getMessage.contains("no version 1"))
    assert(cursor.read() === Some(1L), "a failed run must not advance")
  }
}

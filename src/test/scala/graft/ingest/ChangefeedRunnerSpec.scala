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

    // crash between MARKER and commit: the batch is consumer-visible
    // (marker complete), so the retry ADOPTS it — cursor rolls
    // forward, nothing re-published, the dir untouched
    cursor.commit(1L) // rewind = the not-yet-committed state
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty,
      "a marker-complete batch is adopted, never re-published")
    assert(cursor.read() === Some(3L))
    assert(spark.read.parquet(s"$sink/batch=3").count() === 3L)

    // crash between DATA and marker (markerless dir): the retry
    // re-publishes — the replay overwrites the same batch bytes
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$sink/batch=3/${ChangefeedRunner.MarkerFile}"), false)
    cursor.commit(1L)
    val r2 = ChangefeedRunner.runOnce(spark, table, sink, cursor).get
    assert(r2 === r)
    assert(spark.read.parquet(s"$sink/batch=3").count() === 3L)
    assert(ChangefeedRunner.readMarker(spark, s"$sink/batch=3")
      === Some((1L, 3L)))

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

  test("a marker-complete batch above a crashed publisher's cursor is " +
      "ADOPTED on retry, never swept or re-covered — a consumer that " +
      "already applied it keeps chaining") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cfr-adopt")
    val table = root.resolve("t").toString
    val sink = root.resolve("s").toString
    val cursor = new FileCursorStore(root.resolve("pc").toString)
    val consumer = new FileCursorStore(root.resolve("cc").toString)
    graft.ext.MergeTable.create(
      (1L to 60L).map(i => (i, if (i % 2 == 0) "E" else "O", i * 10L))
        .toDF("key", "status", "cents"), table, "key")
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty)
    val view = root.resolve("v").toString
    graft.ext.Ivm.init(
      graft.ext.MergeTable.readTable(spark, table, Some(1L))
        .drop("bucket"), view)
    consumer.commit(1L)
    // publish v1->v2, then simulate the publisher dying BETWEEN
    // writeMarker and cursor.commit by rewinding its cursor: the
    // marker-complete batch=2 exists, the publisher believes nothing
    // was published
    graft.ext.MergeTable.upsert(spark, table,
      Seq((2L, "X", 999L)).toDF("key", "status", "cents"))
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isDefined)
    cursor.commit(1L) // the crash state
    // the CONSUMER meanwhile chain-validated on the marker alone and
    // absorbed batch=2 — the exact state the old sweep corrupted
    IvmRunner.runOnce(spark, sink, view, consumer)
    assert(consumer.read() === Some(2L))
    // the table advances; the publisher retries: it must ADOPT batch=2
    // (roll its cursor over the marker) and publish batch=3 FROM 2 —
    // not delete batch=2, and not publish a 1->3 batch whose fromV
    // would sit below the consumer's cursor and brick the chain
    graft.ext.MergeTable.upsert(spark, table,
      Seq((4L, "Y", 5L)).toDF("key", "status", "cents"))
    val r = ChangefeedRunner.runOnce(spark, table, sink, cursor).get
    assert(r.fromV === 2L && r.toV === 3L,
      s"retry must publish from the adopted frontier, got $r")
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$sink/batch=2")),
      "the adopted (consumer-visible) batch must survive the retry")
    assert(ChangefeedRunner.readMarker(spark, s"$sink/batch=2")
      === Some((1L, 2L)))
    // the consumer drains the tail cleanly: no chain break, exact view
    IvmRunner.runOnce(spark, sink, view, consumer)
    assert(consumer.read() === Some(3L))
    val served = graft.ext.Ivm.serve(spark, view).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    val direct = graft.ext.MergeTable.readTable(spark, table)
      .groupBy("status")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("cents").as("s"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      .toSet
    assert(served === direct,
      "adoption must leave the consumer's view equal to the table")
    // a pure-adoption retry (crash replayed with no new table commit)
    // rolls the cursor forward over the already-published batch and
    // publishes nothing
    cursor.commit(2L)
    assert(ChangefeedRunner.runOnce(spark, table, sink, cursor).isEmpty,
      "pure adoption must publish nothing")
    assert(cursor.read() === Some(3L),
      "adoption must advance the publisher cursor over the marker")
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

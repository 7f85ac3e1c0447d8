package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Threshold-driven maintenance: the advisor reads the same health
  * signals `merge_table_detail` exposes (tombstone ratio, per-bucket
  * fragmentation, bloom coverage) and names the exact compactDvs /
  * scoped-optimize plan crossing them; `maintain` executes it on
  * exactly the advised buckets; `graft.maintenance.auto=true` runs it
  * from MergeStream after every micro-batch. */
class MaintenanceSpec extends SparkSpec {

  private def mkTable(n: Int = 200): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint")
      .resolve("t").toString
    val df = (1 to n).map(i => (i.toLong, s"v$i")).toDF("key", "value")
    MergeTable.create(df, dir, "key", hexDigits = 1)
    dir
  }

  private def detailRow(dir: String) =
    MergeTable.detail(spark, dir).collect().head

  test("a healthy table advises nothing; crossing the tombstone " +
      "ratio advises compactDvs on exactly the dirty buckets, " +
      "maintain folds them, and the advice clears") {
    import spark.implicits._
    val dir = mkTable()
    assert(MergeTable.maintenanceAdvice(spark, dir).isEmpty)
    assert(detailRow(dir).getAs[String]("maintenance_advice") === "none")
    // 30/200 tombstones = 15% > the 10% default
    MergeTable.deleteKeysMor(spark, dir,
      (1 to 30).map(_.toLong * 6).toDF("key")): Unit
    val advice = MergeTable.maintenanceAdvice(spark, dir)
    assert(advice.map(_.action) === Seq("compact_dvs"))
    val man = MergeTable.detail(spark, dir).collect().head
    assert(man.getAs[String]("maintenance_advice")
      .startsWith("compact_dvs:"))
    // the advised bucket list is exactly the tombstoned buckets
    val a = advice.head
    assert(a.metric > a.threshold)
    val before = MergeTable.readTable(spark, dir).orderBy("key")
      .collect().toSeq
    val ran = MergeTable.maintain(spark, dir)
    assert(ran.size === 1 && ran.head._2 > 0L)
    assert(MergeTable.maintenanceAdvice(spark, dir).isEmpty,
      "a maintained table must advise nothing")
    assert(detailRow(dir).getAs[Long]("dv_tombstones") === 0L)
    assert(MergeTable.readTable(spark, dir).orderBy("key")
      .collect().toSeq === before, "maintenance changed contents")
    assert(MergeTable.fsckDeep(spark, dir).mismatched.isEmpty)
  }

  test("per-bucket fragmentation past the threshold advises a fold " +
      "of exactly the fragmented buckets; thresholds are per-table " +
      "properties") {
    import spark.implicits._
    val dir = mkTable()
    MergeTable.setProperties(spark, dir,
      Map("graft.maintenance.maxFilesPerBucket" -> "2")): Unit
    // two MOR appends of fresh keys fragment their buckets to 3 files
    MergeTable.upsertMor(spark, dir,
      (201 to 260).map(i => (i.toLong, s"a$i")).toDF("key", "value")): Unit
    MergeTable.upsertMor(spark, dir,
      (261 to 320).map(i => (i.toLong, s"b$i")).toDF("key", "value")): Unit
    val advice = MergeTable.maintenanceAdvice(spark, dir)
    assert(advice.map(_.action) === Seq("compact_dvs"))
    val fragmented = advice.head.buckets.toSet
    assert(fragmented.nonEmpty)
    MergeTable.maintain(spark, dir): Unit
    assert(MergeTable.maintenanceAdvice(spark, dir).isEmpty)
    // every advised bucket folded to one file
    val perBucket = MergeTable.fsck(spark, dir)
    assert(perBucket.orphans === 0L)
    assert(MergeTable.readTable(spark, dir).count() === 320L)
    // raising the threshold back up, fresh fragmentation is tolerated
    MergeTable.setProperties(spark, dir,
      Map("graft.maintenance.maxFilesPerBucket" -> "50")): Unit
    MergeTable.upsertMor(spark, dir,
      Seq((400L, "x")).toDF("key", "value")): Unit
    assert(MergeTable.maintenanceAdvice(spark, dir).isEmpty)
  }

  test("a bloom coverage gap advises a scoped optimize of exactly " +
      "the uncovered buckets, and maintain closes it") {
    import spark.implicits._
    val dir = mkTable()
    // declaring blooms AFTER the create leaves every file uncovered
    MergeTable.setProperties(spark, dir,
      Map("graft.bloom.columns" -> "value")): Unit
    val advice = MergeTable.maintenanceAdvice(spark, dir)
    assert(advice.map(_.action) === Seq("optimize"))
    assert(advice.head.metric === 0.0)
    MergeTable.maintain(spark, dir): Unit
    val det = detailRow(dir)
    assert(det.getAs[Long]("files_with_bloom") ===
      det.getAs[Long]("files"),
      "the maintainer must attach blooms to every uncovered file")
    assert(MergeTable.maintenanceAdvice(spark, dir).isEmpty)
    assert(MergeTable.readTable(spark, dir).count() === 200L)
  }

  test("graft.maintenance.auto=true: a MOR stream that crosses the " +
      "threshold is folded by the post-batch maintainer — exactly " +
      "the dirty buckets, content exact, exactly-once preserved") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = mkTable(40)
    val ckpt = java.nio.file.Files
      .createTempDirectory("maint-ckpt").toString
    MergeTable.setProperties(spark, dir, Map(
      "graft.merges.mode" -> "mor",
      "graft.maintenance.auto" -> "true",
      "graft.maintenance.maxDvRatio" -> "0.01")): Unit
    val m = Seq(MergeTable.MergeWhen(None,
      MergeTable.MergeAction.Delete))
    val nm = Seq(MergeTable.MergeWhen(None,
      MergeTable.MergeAction.UpdateAll))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // one batch: delete key 3 (tombstone ratio 1/40 > 1%), insert 50
    input.addData((3L, "del"), (50L, "ins"))
    graft.streaming.MergeStream.startClauses(
      input.toDF().toDF("key", "value"), dir, ckpt,
      matched = m, notMatched = nm, streamId = Some("auto1"))
      .awaitTermination()
    // the post-batch maintainer folded the tombstones away
    val det = detailRow(dir)
    assert(det.getAs[Long]("dv_tombstones") === 0L,
      "auto-maintenance must fold the tombstones after the batch")
    assert(det.getAs[String]("maintenance_advice") === "none")
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 40L) // 40 - 1 deleted + 1 inserted
    assert(t.filter(col("key") === 3L).count() === 0L)
    assert(t.filter(col("key") === 50L).count() === 1L)
    // exactly-once: the replay gate survived the maintainer's commit
    assert(MergeTable.lastAppliedBatch(spark, dir, "auto1") === Some(0L))
    assert(MergeTable.fsckDeep(spark, dir).mismatched.isEmpty)
  }

  test("scoped compactDvs drops EXHAUSTED tombstone files (every " +
      "annotated data file folded) while retaining those still " +
      "covering out-of-scope dirty buckets; vacuum reclaims them") {
    import spark.implicits._
    val dir = mkTable(200)
    val kb = MergeTable.readTable(spark, dir).select("key", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kA = kb.keys.min
    val kB = kb.keys.filter(k => kb(k) != kb(kA)).min
    // two independent MOR deletes -> two DV files, each annotating
    // exactly one bucket's file
    MergeTable.deleteKeysMor(spark, dir, Seq(kA).toDF("key")): Unit
    MergeTable.deleteKeysMor(spark, dir, Seq(kB).toDF("key")): Unit
    val man0 = MergeTable.detail(spark, dir).collect().head
    assert(man0.getAs[Long]("dv_files") === 2L)
    // fold ONLY kA's bucket: its DV file is exhausted, kB's is not
    MergeTable.compactDvs(spark, dir,
      buckets = Some(Seq(kb(kA)))): Unit
    val det = detailRow(dir)
    assert(det.getAs[Long]("dv_files") === 1L,
      "the exhausted DV file must drop out of the manifest")
    assert(det.getAs[Long]("dv_tombstones") === 1L)
    // reads stay exact on both buckets
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 198L)
    assert(t.filter(col("key").isin(kA, kB)).count() === 0L)
    // the unreferenced DV file is now vacuumable
    val vs = MergeTable.vacuum(spark, dir, retainVersions = 1,
      minFileAgeMs = 0)
    assert(vs.filesDeleted > 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // vacuum sweeps DV part-FILES (the manifest's `#dv=` grain)
    val dvLeft = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/_dvs"))
      .filter(_.isDirectory).flatMap(d =>
        fs.listStatus(d.getPath).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))).length
    assert(dvLeft === 1, s"vacuum left $dvLeft DV part files, expected 1")
    assert(MergeTable.fsckDeep(spark, dir).mismatched.isEmpty)
  }
}

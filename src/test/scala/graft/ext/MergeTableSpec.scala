package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MergeTable (copy-on-write + snapshot isolation): file-granular
  * rewrite — untouched files byte-identical, upsert scan pruned to
  * impacted partitions, replay idempotent by value, time travel reads
  * prior versions exactly, manifest commits conflict loudly, vacuum
  * deletes only unreferenced files (and with them, old snapshots). */
class MergeTableSpec extends SparkSpec {

  private def mkTable(n: Int = 500): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cow")
      .resolve("t").toString
    val df = (1 to n).map(i => (i.toLong, s"v$i")).toDF("key", "value")
    MergeTable.create(df, dir, "key")
    dir
  }

  /** Every data file on disk: relative path -> (size, mtime). */
  private def fileIds(dir: String): Map[String, (Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$dir/data")
    fs.listStatus(root).filter(_.isDirectory).flatMap { epoch =>
      fs.listStatus(epoch.getPath).filter(_.isDirectory).flatMap { d =>
        fs.listStatus(d.getPath).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
          .map(f => s"${epoch.getPath.getName}/${d.getPath.getName}/" +
            f.getPath.getName -> (f.getLen, f.getModificationTime))
      }
    }.toMap
  }

  test("upsert writes only the impacted buckets' new files; every " +
      "pre-existing file is untouched on disk; state is exact") {
    import spark.implicits._
    val dir = mkTable()
    val before = fileIds(dir)
    val updates = Seq((7L, "SEVEN"), (501L, "new")).toDF("key", "value")
    val st = MergeTable.upsert(spark, dir, updates)
    assert(st.version === 2L)
    assert(st.rowsMatched === 1L && st.rowsInserted === 1L)
    assert(st.bucketsRewritten <= 2L)
    assert(st.filesRead <= 2L && st.filesWritten === st.bucketsRewritten)
    val after = fileIds(dir)
    // copy-on-write: no pre-existing file modified or deleted
    assert(before.forall { case (p, sig) => after.get(p) == Some(sig) },
      "a live file was mutated or deleted by an upsert")
    assert((after.keySet -- before.keySet).forall(_.startsWith("v=2/")),
      "new files must land under the new epoch only")
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 501L)
    assert(t.filter(col("key") === 7L).select("value")
      .collect().head.getString(0) === "SEVEN")
  }

  test("the upsert's existing-side scan prunes to the impacted " +
      "bucket partitions") {
    import spark.implicits._
    val dir = mkTable()
    val plan = MergeTable.readTable(spark, dir)
      .filter(col("bucket").isin("0a", "ff"))
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("bucket"),
      s"bucket predicate did not reach PartitionFilters:\n$plan")
  }

  test("replaying the same upsert is idempotent by value") {
    import spark.implicits._
    val dir = mkTable(100)
    val updates = Seq((13L, "x13"), (113L, "ins")).toDF("key", "value")
    MergeTable.upsert(spark, dir, updates)
    val once = MergeTable.readTable(spark, dir)
      .orderBy("key").collect().toSeq
    val st2 = MergeTable.upsert(spark, dir, updates) // replay
    assert(st2.rowsMatched === 2L && st2.rowsInserted === 0L)
    val twice = MergeTable.readTable(spark, dir)
      .orderBy("key").collect().toSeq
    assert(once === twice, "replay changed the table state")
  }

  test("time travel: prior versions read their exact snapshots after " +
      "later commits, and hard delete only affects the new version") {
    import spark.implicits._
    val dir = mkTable(50)
    MergeTable.upsert(spark, dir, Seq((1L, "CHANGED")).toDF("key", "value"))
    MergeTable.deleteKeys(spark, dir, Seq(2L).toDF("key"))
    assert(MergeTable.versions(spark, dir) === Seq(1L, 2L, 3L))
    val v1 = MergeTable.readTable(spark, dir, Some(1L))
    assert(v1.count() === 50L)
    assert(v1.filter(col("key") === 1L).select("value")
      .collect().head.getString(0) === "v1")
    val v2 = MergeTable.readTable(spark, dir, Some(2L))
    assert(v2.filter(col("key") === 1L).select("value")
      .collect().head.getString(0) === "CHANGED")
    assert(v2.filter(col("key") === 2L).count() === 1L)
    val v3 = MergeTable.readTable(spark, dir)
    assert(v3.count() === 49L)
    assert(v3.filter(col("key") === 2L).count() === 0L)
  }

  test("a concurrent commit of the same version conflicts loudly") {
    val dir = mkTable(20)
    // both racers derived version 2 from snapshot 1; the second
    // manifest create must fail, never silently clobber the first
    MergeTable.commitManifest(spark, dir, 2L, Seq("v=2/bucket=aa/w.parquet"))
    val err = intercept[java.io.IOException] {
      MergeTable.commitManifest(spark, dir, 2L,
        Seq("v=2/bucket=bb/l.parquet"))
    }
    assert(err.getMessage.contains("commit conflict"))
  }

  test("vacuum deletes exactly the unreferenced files; the current " +
      "version still reads; the dropped version no longer does") {
    import spark.implicits._
    val dir = mkTable(50)
    MergeTable.upsert(spark, dir,
      Seq((5L, "x"), (6L, "y")).toDF("key", "value"))
    val liveBefore = fileIds(dir).size
    val vs = MergeTable.vacuum(spark, dir, retainVersions = 1)
    assert(vs.versionsDropped === 1L && vs.versionsLive === 1L)
    assert(fileIds(dir).size === liveBefore - vs.filesDeleted.toInt)
    assert(fileIds(dir).size.toLong === vs.filesLive)
    assert(MergeTable.readTable(spark, dir).count() === 50L)
    val err = intercept[IllegalArgumentException] {
      MergeTable.readTable(spark, dir, Some(1L)).count()
    }
    assert(err.getMessage.contains("no version"))
  }

  test("hard delete that empties a bucket leaves it absent from the " +
      "current snapshot, and vacuum removes its file from disk") {
    import spark.implicits._
    val dir = mkTable(50)
    val victim = MergeTable.readTable(spark, dir)
      .groupBy("bucket").count()
      .orderBy("count", "bucket").collect().head.getString(0)
    val doomed = MergeTable.readTable(spark, dir)
      .filter(col("bucket") === victim).select("key")
      .localCheckpoint(true)
    val nDoomed = doomed.count()
    val st = MergeTable.deleteKeys(spark, dir, doomed)
    assert(st.rowsMatched === nDoomed)
    assert(st.filesWritten < st.bucketsRewritten,
      "an emptied bucket must contribute no file to the new version")
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 50L - nDoomed)
    assert(t.filter(col("bucket") === victim).count() === 0L)
    MergeTable.vacuum(spark, dir, retainVersions = 1)
    assert(!fileIds(dir).keys.exists(_.contains(s"bucket=$victim")),
      "the emptied bucket's file survived vacuum")
  }

  test("changefeed: the version diff scans only manifest-changed " +
      "buckets and classifies insert/update/delete exactly") {
    import spark.implicits._
    val dir = mkTable(500)
    // pick an update key whose bucket holds MORE than one row, so the
    // diff must drop the rewritten bucket's untouched neighbors
    val crowded = MergeTable.readTable(spark, dir)
      .filter(col("key") =!= 3L) // key 3 is this test's delete target
      .groupBy("bucket").agg(count(lit(1)).as("c"), min("key").as("k"))
      .filter(col("c") >= 2).orderBy("bucket").collect().head
    val upKey = crowded.getAs[Long]("k")
    MergeTable.upsert(spark, dir, Seq((upKey, "UP"), (9001L, "INS"))
      .toDF("key", "value"))
    MergeTable.deleteKeys(spark, dir, Seq(3L).toDF("key"))
    val changed = MergeTable.changedBuckets(spark, dir, 1L, 3L)
    assert(changed.size <= 3L,
      s"diff should scan at most the 3 touched buckets, got $changed")
    val cf = MergeTable.changes(spark, dir, 1L, 3L)
      .select(col("key"), col("change")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cf === Map(upKey -> "update", 9001L -> "insert",
      3L -> "delete"),
      s"changefeed misclassified: $cf")
  }

  test("optimize: contents-invariant, physically sorted within every " +
      "bucket file, reclaimed by vacuum") {
    import spark.implicits._
    val dir = mkTable(300)
    val before = MergeTable.readTable(spark, dir)
      .orderBy("key").collect().toSeq
    val st = MergeTable.optimize(spark, dir, "value")
    assert(st.version === 2L)
    val after = MergeTable.readTable(spark, dir)
      .orderBy("key").collect().toSeq
    assert(before === after, "optimize changed table contents")
    // physical within-file sortedness on the sort column
    val files = fileIds(dir).keys.filter(_.startsWith("v=2/")).toSeq
    assert(files.nonEmpty)
    files.take(5).foreach { rel =>
      val vals = spark.read.parquet(s"$dir/data/$rel")
        .select("value").collect().map(_.getString(0)).toSeq
      assert(vals === vals.sorted, s"file $rel not sorted by value")
    }
    val vac = MergeTable.vacuum(spark, dir, retainVersions = 1)
    assert(vac.filesDeleted > 0)
    assert(MergeTable.readTable(spark, dir)
      .orderBy("key").collect().toSeq === after)
  }

  test("schema evolution: an extending batch adds a column (old rows " +
      "read null), a dropping batch throws, the changefeed straddles " +
      "the evolution") {
    import spark.implicits._
    val dir = mkTable(50)
    val evolved = Seq((7L, "seven", 1L)).toDF("key", "value", "flag")
    MergeTable.upsert(spark, dir, evolved)
    val t = MergeTable.readTable(spark, dir)
    assert(t.columns.contains("flag"))
    assert(t.filter(col("key") === 7L).select("flag")
      .collect().head.getLong(0) === 1L)
    assert(t.filter(col("key") === 8L).select("flag")
      .collect().head.isNullAt(0),
      "pre-evolution rows must read null for the new column")
    val err = intercept[IllegalArgumentException] {
      MergeTable.upsert(spark, dir, Seq((9L, 2L)).toDF("key", "flag"))
    }
    assert(err.getMessage.contains("extend-only"))
    // a diff straddling the evolution: key 7's change registers
    val cf = MergeTable.changes(spark, dir, 1L, 2L)
      .select("key", "change").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cf === Map(7L -> "update"))
  }

  test("a mismatched key column on an existing table throws") {
    import spark.implicits._
    val dir = mkTable(10)
    val err = intercept[IllegalArgumentException] {
      MergeTable.create((1 to 3).map(i => (i.toLong, "y"))
        .toDF("other", "value"), dir, "other")
    }
    assert(err.getMessage.contains("keyed by"))
  }
}

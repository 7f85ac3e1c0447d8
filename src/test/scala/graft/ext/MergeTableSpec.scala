package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MergeTable (copy-on-write upsert/delete): file-granular rewrite —
  * untouched bucket files stay byte-identical, the upsert scan prunes
  * to impacted partitions, replays are idempotent by value, and hard
  * delete drops fully-emptied buckets. */
class MergeTableSpec extends SparkSpec {

  private def mkTable(n: Int = 500): (String, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cow")
      .resolve("t").toString
    val df = (1 to n).map(i => (i.toLong, s"v$i")).toDF("key", "value")
    MergeTable.create(df, dir, "key")
    (dir, df)
  }

  private def fileIds(dir: String): Map[String, (Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).flatMap { d =>
        fs.listStatus(d.getPath).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
          .map(f => s"${d.getPath.getName}/${f.getPath.getName}" ->
            (f.getLen, f.getModificationTime))
      }.toMap
  }

  test("upsert rewrites only impacted buckets; every other file is " +
      "untouched on disk; state is exact") {
    import spark.implicits._
    val (dir, _) = mkTable()
    val before = fileIds(dir)
    val updates = Seq((7L, "SEVEN"), (501L, "new")).toDF("key", "value")
    val st = MergeTable.upsert(spark, dir, updates)
    assert(st.rowsMatched === 1L && st.rowsInserted === 1L)
    assert(st.bucketsRewritten <= 2L)
    assert(st.filesRead <= 2L && st.filesWritten === st.bucketsRewritten)
    val after = fileIds(dir)
    val changed = after.filter { case (p, sig) => before.get(p) != Some(sig) }
    val impactedDirs = changed.keys.map(_.split("/")(0)).toSet
    assert(impactedDirs.size <= st.bucketsRewritten.toInt,
      s"files outside the impacted buckets changed: $changed")
    assert(before.keys.filterNot(p =>
      impactedDirs.contains(p.split("/")(0)))
      .forall(p => after.get(p) == before.get(p)),
      "an untouched bucket's file was rewritten")
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 501L)
    assert(t.filter(col("key") === 7L).select("value")
      .collect().head.getString(0) === "SEVEN")
  }

  test("the upsert's existing-side scan prunes to the impacted " +
      "bucket partitions") {
    import spark.implicits._
    val (dir, _) = mkTable()
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
    val (dir, _) = mkTable(100)
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

  test("hard delete drops rows copy-on-write and removes " +
      "fully-emptied bucket partitions") {
    import spark.implicits._
    val (dir, _) = mkTable(50)
    // empty one bucket completely: delete every key in it
    val victim = MergeTable.readTable(spark, dir)
      .select("bucket").groupBy("bucket").count()
      .orderBy("count", "bucket").collect().head.getString(0)
    val doomed = MergeTable.readTable(spark, dir)
      .filter(col("bucket") === victim).select("key")
    val nDoomed = doomed.count()
    val st = MergeTable.deleteKeys(spark, dir, doomed)
    assert(st.rowsMatched === nDoomed)
    val t = MergeTable.readTable(spark, dir)
    assert(t.count() === 50L - nDoomed)
    assert(t.filter(col("bucket") === victim).count() === 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir,
      s"bucket=$victim")), "emptied bucket partition dir survived")
  }

  test("a mismatched key column on an existing table throws") {
    import spark.implicits._
    val (dir, _) = mkTable(10)
    val err = intercept[IllegalArgumentException] {
      MergeTable.create((1 to 3).map(i => (i.toLong, "y"))
        .toDF("other", "value"), dir, "other")
    }
    assert(err.getMessage.contains("keyed by"))
  }
}

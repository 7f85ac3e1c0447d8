package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `merge_table(dir[, version])` SQL table-valued surface: plain
  * SQL reads the snapshot table, the version argument time-travels,
  * point lookups prune through the same rule as the DataFrame path,
  * and malformed calls fail loudly at analysis. */
class MergeTableSqlSpec extends SparkSpec {

  MergeTable.registerSql(spark)
  graft.plans.KeyToBucketPruning.enable(spark)

  private def mkTable(n: Int = 300): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mts")
      .resolve("t").toString
    MergeTable.create(
      (1 to n).map(i => (i.toLong, s"v$i")).toDF("key", "value"),
      dir, "key")
    dir
  }

  test("SELECT over merge_table() serves the LIVE snapshot and the " +
      "version argument time-travels") {
    import spark.implicits._
    val dir = mkTable()
    MergeTable.upsert(spark, dir,
      Seq((7L, "SEVEN"), (901L, "new")).toDF("key", "value"))
    assert(spark.sql(s"SELECT count(*) AS c FROM merge_table('$dir')")
      .collect().head.getLong(0) === 301L)
    assert(spark.sql(s"SELECT count(*) AS c FROM merge_table('$dir', 1)")
      .collect().head.getLong(0) === 300L)
    assert(spark.sql(
      s"SELECT value FROM merge_table('$dir') WHERE key = 7")
      .collect().head.getString(0) === "SEVEN")
    assert(spark.sql(
      s"SELECT value FROM merge_table('$dir', 1) WHERE key = 7")
      .collect().head.getString(0) === "v7")
  }

  test("a SQL point lookup prunes to one bucket file — the TVF splices " +
      "the same footer-stamped scan, so the rule composes") {
    val dir = mkTable()
    val q = spark.sql(
      s"SELECT key, value FROM merge_table('$dir') WHERE key = 7")
    val files = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.getOrElse(-1L)
    assert(files === 1L,
      s"SQL lookup scanned $files files\n" +
        q.queryExecution.executedPlan.toString)
    assert(q.collect().map(_.getString(1)).toSeq === Seq("v7"))
  }

  test("two merge_table() calls join in one SQL statement") {
    val dir = mkTable()
    val rows = spark.sql(
      s"""SELECT a.key, a.value, b.value
         |FROM merge_table('$dir') a JOIN merge_table('$dir') b
         |  ON a.key = b.key
         |WHERE a.key = 42""".stripMargin).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(1) === "v42" &&
      rows.head.getString(2) === "v42")
  }

  test("table_changes() serves the CDC batch in SQL: explicit window, " +
      "default-toV latest, and a quiet post-OPTIMIZE window at 0 rows") {
    import spark.implicits._
    val dir = mkTable()
    MergeTable.upsert(spark, dir,
      Seq((7L, "SEVEN"), (901L, "new")).toDF("key", "value"))
    MergeTable.deleteKeys(spark, dir, Seq(13L).toDF("key"))
    val d13 = spark.sql(
      s"""SELECT key, change, old_row.value AS o, new_row.value AS n
         |FROM table_changes('$dir', 1, 3) ORDER BY key""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq
    assert(d13 === Seq(
      (7L, "update", Some("v7"), Some("SEVEN")),
      (13L, "delete", Some("v13"), None),
      (901L, "insert", None, Some("new"))))
    // default toV = newest committed version ("changes since v2")
    val since2 = spark.sql(
      s"SELECT key, change FROM table_changes('$dir', 2) ORDER BY key")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(since2 === Seq((13L, "delete")))
    // layout-only window: the fingerprint short-circuit rides into SQL
    MergeTable.optimize(spark, dir, "key")
    assert(spark.sql(
      s"SELECT count(*) AS c FROM table_changes('$dir', 3, 4)")
      .collect().head.getLong(0) === 0L)
    // endpoints as TAG names: the diff between two pinned snapshots
    MergeTable.tag(spark, dir, "r1", Some(1L))
    MergeTable.tag(spark, dir, "r3", Some(3L))
    val tagged = spark.sql(
      s"""SELECT key, change FROM table_changes('$dir', 'r1', 'r3')
         |ORDER BY key""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(tagged === Seq((7L, "update"), (13L, "delete"),
      (901L, "insert")))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$dir')").collect()
    }
    assert(e.getMessage.contains("2-3 arguments"))
  }

  test("merge_table_history() is the manifest-only version ledger: " +
      "attested row counts track the lifecycle, OPTIMIZE moves files " +
      "but never rows") {
    import spark.implicits._
    val dir = mkTable(100)
    MergeTable.upsert(spark, dir,
      Seq((7L, "SEVEN"), (901L, "new")).toDF("key", "value"))
    MergeTable.deleteKeys(spark, dir, Seq(13L).toDF("key"))
    MergeTable.optimize(spark, dir, "key")
    val hist = spark.sql(
      s"""SELECT v, files, buckets, rows
         |FROM merge_table_history('$dir') ORDER BY v""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(hist === Seq((1L, 100L), (2L, 101L), (3L, 100L), (4L, 100L)))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM merge_table_history('$dir', 1)").collect()
    }
    assert(e.getMessage.contains("takes 1 argument"))
  }

  test("merge_table_detail() is the one-row DESCRIBE DETAIL idiom: " +
      "key, version, width, files, attested rows, tags, constraints — " +
      "all metadata, tracking the lifecycle") {
    import spark.implicits._
    val dir = mkTable(100)
    MergeTable.upsert(spark, dir,
      Seq((901L, "new")).toDF("key", "value"))
    MergeTable.tag(spark, dir, "pin", Some(1L))
    MergeTable.addConstraint(spark, dir, "v_nonempty",
      "length(value) > 0")
    val r = spark.sql(
      s"""SELECT key_col, version, hex_digits, files, buckets, rows,
         |       versions_retained, tags, constraints
         |FROM merge_table_detail('$dir')""".stripMargin).collect()
    assert(r.length === 1)
    val d = r.head
    assert(d.getString(0) === "key" && d.getLong(1) === 2L &&
      d.getLong(2) === 2L && d.getLong(5) === 101L &&
      d.getLong(6) === 2L && d.getLong(7) === 1L && d.getLong(8) === 1L)
    assert(d.getLong(3) === d.getLong(4),
      "one live file per bucket by the epoch writer's construction")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM merge_table_detail()").collect()
    }
    assert(e.getMessage.contains("takes 1 argument"))
  }

  test("malformed calls fail loudly: wrong arity, bad version value, " +
      "vacuumed/never-committed version") {
    val dir = mkTable()
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM merge_table('$dir', 1, 2)").collect()
    }
    assert(e1.getMessage.contains("1-2 arguments"))
    // a STRING version argument resolves as a tag name (the
    // reproducibility-pin idiom); an unknown one fails loudly
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM merge_table('$dir', 'x')").collect()
    }
    assert(e2.getMessage.contains("no tag 'x'"))
    val e2b = intercept[Exception] {
      spark.sql(s"SELECT * FROM merge_table('$dir', 1.5)").collect()
    }
    assert(e2b.getMessage.contains("integer version or a string tag"))
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM merge_table('$dir', 99)").collect()
    }
    assert(e3.getMessage.contains("no version 99"))
  }
}

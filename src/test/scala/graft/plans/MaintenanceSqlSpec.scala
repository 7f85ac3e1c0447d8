package graft.plans

import graft.SparkSpec
import graft.ext.MergeTable
import org.apache.spark.sql.functions._

/** SQL maintenance statements (OPTIMIZE / VACUUM through the
  * delegating parser): the same engine verbs as the API, a stats row
  * back, and every non-matching statement delegated untouched. */
class MaintenanceSqlSpec extends SparkSpec {

  private def mkTable(n: Int = 3200): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-msql")
      .resolve("t").toString
    MergeTable.create(
      (1 to n).map(i => (i.toLong, (i % 499).toLong, (i % 293).toLong))
        .toDF("key", "x", "y"),
      dir, "key", hexDigits = 1)
    dir
  }

  test("OPTIMIZE ... SORT BY col STRIPE n stripes the table (stats " +
      "pruning fires after), contents invariant, stats row returned") {
    val dir = mkTable()
    val before = MergeTable.readTable(spark, dir)
      .agg(sum("x"), count(lit(1))).collect().head
    val st = spark.sql(
      s"OPTIMIZE merge_table.`$dir` SORT BY x STRIPE 100").collect()
    assert(st.length === 1 && st.head.getLong(0) === 2L,
      "optimize must commit version 2 and return its stats row")
    val after = MergeTable.readTable(spark, dir)
      .agg(sum("x"), count(lit(1))).collect().head
    assert(before === after, "OPTIMIZE must move no rows")
    StatsFilePruning.enable(spark)
    val q = MergeTable.readTable(spark, dir)
      .filter(col("x").between(100L, 140L))
    val planned = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.get
    val total = MergeTable.readTable(spark, dir).inputFiles.length
    assert(planned < total, s"striped layout must prune: $planned/$total")
  }

  test("OPTIMIZE ... ZORDER BY (x, y) STRIPE n commits a curve-striped " +
      "layout; VACUUM ... RETAIN 1 VERSIONS expires history and " +
      "reports the sweep") {
    val dir = mkTable()
    val st = spark.sql(
      s"OPTIMIZE merge_table.`$dir` ZORDER BY (x, y) STRIPE 100")
      .collect()
    assert(st.head.getLong(0) === 2L)
    assert(MergeTable.versions(spark, dir) === Seq(1L, 2L))
    // vacuum with the default grace deletes no fresh files but must
    // still expire the version list down to the retained suffix
    val vs = spark.sql(
      s"VACUUM merge_table.`$dir` RETAIN 1 VERSIONS").collect()
    assert(vs.length === 1)
    assert(MergeTable.versions(spark, dir) === Seq(2L),
      "RETAIN 1 VERSIONS must expire version 1")
    assert(MergeTable.readTable(spark, dir).count() === 3200L)
  }

  test("OPTIMIZE ... ZORDER BY (x, y, key) — the N-column list — " +
      "declares the 3-d curve and commits") {
    val dir = mkTable(1600)
    val st = spark.sql(
      s"OPTIMIZE merge_table.`$dir` ZORDER BY (x, y, key) STRIPE 200")
      .collect()
    assert(st.head.getLong(0) === 2L)
    assert(MergeTable.properties(spark, dir)
      .get("graft.layout.zorder").contains("x,y,key"))
    assert(MergeTable.readTable(spark, dir).count() === 1600L)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE merge_table.`$dir` ZORDER BY (x)")
    }
    assert(e.getMessage.contains("at least two columns"))
  }

  test("OPTIMIZE ... WHERE bucket IN (...) COMPACT MAX FILES n " +
      "composes through the parser: the SQL path folds exactly the " +
      "scoped dirty bucket (out-of-scope tombstones stay) and MAX " +
      "FILES rides through to the engine verb — q182's gate, " +
      "parser-pinned") {
    import spark.implicits._
    val dir = mkTable(800)
    val kb = MergeTable.readTable(spark, dir).select("key", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kA = kb.keys.min
    val kB = kb.keys.filter(k => kb(k) != kb(kA)).min
    MergeTable.deleteKeysMor(spark, dir, Seq(kA).toDF("key")): Unit
    MergeTable.deleteKeysMor(spark, dir, Seq(kB).toDF("key")): Unit
    val st = spark.sql(
      s"OPTIMIZE merge_table.`$dir` WHERE bucket IN ('${kb(kA)}') " +
        "COMPACT MAX FILES 3").collect()
    assert(st.length === 1)
    assert(st.head.getAs[Long]("buckets_compacted") === 1L,
      "the scope must fold exactly one bucket")
    assert(st.head.getAs[Long]("tombstones_purged") === 1L)
    // out-of-scope bucket keeps its tombstone until its own fold
    val det = MergeTable.detail(spark, dir).collect().head
    assert(det.getAs[Long]("dv_tombstones") === 1L)
    assert(MergeTable.readTable(spark, dir).count() === 798L)
    // the second scoped statement clears it; MAX FILES parses too
    val st2 = spark.sql(
      s"OPTIMIZE merge_table.`$dir` WHERE bucket IN ('${kb(kB)}') " +
        "COMPACT").collect()
    assert(st2.head.getAs[Long]("tombstones_purged") === 1L)
    assert(MergeTable.detail(spark, dir).collect().head
      .getAs[Long]("dv_tombstones") === 0L)
  }

  test("OPTIMIZE ... WHERE bucket IN (...) rewrites ONLY the scoped " +
      "buckets (out-of-scope files re-listed verbatim), stays " +
      "CDC-free (zero changed buckets), and a malformed scope is " +
      "loud") {
    val dir = mkTable(3200)
    val before = MergeTable.readTable(spark, dir).inputFiles.toSet
    val st = spark.sql(
      s"OPTIMIZE merge_table.`$dir` WHERE bucket IN ('0', '7') " +
        "SORT BY x STRIPE 100").collect()
    assert(st.length === 1 && st.head.getLong(0) === 2L)
    val after = MergeTable.readTable(spark, dir).inputFiles.toSet
    val carried = after.intersect(before)
    assert(carried === before.filterNot(f =>
      f.contains("/bucket=0/") || f.contains("/bucket=7/")),
      "out-of-scope files must survive by reference")
    assert((after -- before).forall(f =>
      f.contains("/bucket=0/") || f.contains("/bucket=7/")))
    // a scoped rewrite moves no rows: the changefeed short-circuit
    // must hold across it exactly as it does for the full rewrite
    assert(MergeTable.changes(spark, dir, 1L, 2L).count() === 0L)
    assert(MergeTable.readTable(spark, dir).count() === 3200L)
    // scope ids are validated against the table's bucket width
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE merge_table.`$dir` WHERE bucket IN ('zz') " +
        "SORT BY x").collect()
    }
    assert(e.getMessage.contains("hex-digit"), e.getMessage)
  }

  test("bare VACUUM (no RETAIN) is rejected with guidance — the " +
      "statement expires whole versions, so no Delta-borrowed default " +
      "is safe; history is untouched by the failed statement") {
    val dir = mkTable()
    spark.sql(s"OPTIMIZE merge_table.`$dir` SORT BY x STRIPE 100")
      .collect()
    val before = MergeTable.versions(spark, dir)
    val e = intercept[Exception] {
      spark.sql(s"VACUUM merge_table.`$dir`").collect()
    }
    assert(e.getMessage.contains("RETAIN"),
      s"error must name the missing clause: ${e.getMessage}")
    assert(MergeTable.versions(spark, dir) === before,
      "a rejected VACUUM must not expire anything")
  }

  test("CREATE MERGE_TABLE ... KEY k BUCKETS n AS SELECT creates the " +
      "table through the engine (bucketed, readable, writable); " +
      "re-creation, bad widths, and reserved columns are loud; a " +
      "table NAMED merge_table delegates to Spark untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-msql-ct")
      .resolve("t").toString
    (1 to 400).map(i => (i.toLong, (i % 7).toLong))
      .toDF("key", "cents").createOrReplaceTempView("ct_src")
    val st = spark.sql(
      s"CREATE MERGE_TABLE `$dir` KEY key BUCKETS 16 AS " +
        "SELECT * FROM ct_src").collect()
    assert(st.length === 1 && st.head.getLong(0) === 1L)
    assert(st.head.getLong(1) === 16L, "one file per non-empty bucket")
    assert(MergeTable.readTable(spark, dir).count() === 400L)
    // the created table takes every other SQL verb
    spark.sql(s"INSERT INTO merge_table.`$dir` VALUES (401, 9)").collect()
    assert(MergeTable.readTable(spark, dir).count() === 401L)
    // re-creation of an existing dir is loud, not an overwrite
    intercept[Exception] {
      spark.sql(s"CREATE MERGE_TABLE `$dir` KEY key AS " +
        "SELECT * FROM ct_src").collect()
    }
    // BUCKETS must be a power of 16 (the md5-hex width model)
    val e = intercept[Exception] {
      spark.sql(s"CREATE MERGE_TABLE `${dir}2` KEY key BUCKETS 100 AS " +
        "SELECT * FROM ct_src").collect()
    }
    assert(e.getMessage.contains("power of 16"), e.getMessage)
    // reserved layout columns are the engine's own loud gate
    spark.sql("SELECT 1 AS key, 2 AS bucket").createOrReplaceTempView("ct_bad")
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE MERGE_TABLE `${dir}3` KEY key AS " +
        "SELECT * FROM ct_bad").collect()
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    // `CREATE TABLE merge_table …` is NOT this statement: it reaches
    // Spark's own parser (and fails there only for catalog reasons,
    // not ours)
    intercept[Exception] {
      spark.sql("CREATE TABLE merge_table (a INT) USING nope").collect()
    }
  }

  test("recognition is conservative: identifiers named optimize/vacuum " +
      "and non-merge_table statements delegate to Spark's parser") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("optimize")
    assert(spark.sql("SELECT a FROM optimize").count() === 1L)
    Seq((1L, 2L)).toDF("vacuum", "b").createOrReplaceTempView("vv")
    assert(spark.sql("SELECT vacuum FROM vv").count() === 1L)
    // a malformed OPTIMIZE (not the merge_table shape) is a plain
    // Spark parse error, not a silent maintenance run
    intercept[Exception] {
      spark.sql("OPTIMIZE some_table SORT BY x").collect()
    }
  }
}

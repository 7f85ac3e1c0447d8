package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scan-efficiency guards — the read-side siblings of PlanGuardSpec's
  * join bans: a predicate on a fixture column must reach the parquet
  * scan as a PushedFilter (row-group statistics can skip data), and a
  * narrow projection must shrink ReadSchema to exactly the referenced
  * columns (a 100 TB scan that deserializes unused columns is wrong
  * even when the answer is right). String-matched against the executed
  * plan, so a future change that silently breaks pushdown — a
  * normalization cast on the filter column, an opaque UDF wrapper —
  * fails here instead of surfacing as a 100× slowdown at scale. */
class ScanPruningSpec extends SparkSpec {

  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.001")

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a column predicate reaches the parquet scan as a PushedFilter") {
    val plan = planOf(
      Tables(spark, dir, "documents").filter(col("lang") === "en"))
    assert(plan.contains("PushedFilters:"), s"no pushdown section:\n$plan")
    assert(plan.contains("EqualTo(lang,en)"),
      s"lang predicate not pushed:\n$plan")
  }

  test("a narrow projection prunes ReadSchema to the referenced columns") {
    val plan = planOf(
      Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity"))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity"), s"projection lost: $readSchema")
    assert(!readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_shipdate"),
      s"unused columns still read: $readSchema")
  }

  test("the ts normalization does not block pushdown on OTHER event " +
      "columns") {
    // normalizeTs rewrites `ts`; predicates on untouched columns must
    // still reach the scan (the cast lives above the scan node)
    val plan = planOf(
      Tables(spark, dir, "events").filter(col("event_type") === "click"))
    assert(plan.contains("EqualTo(event_type,click)"),
      s"event_type predicate not pushed past the ts normalization:\n$plan")
  }

  test("a registry query's scan carries its predicate: q03's l_discount " +
      "filter reaches the lineitem scan") {
    val df = SparkEntry.queries("q03_filter_group_avg")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("GreaterThan(l_discount,0.02)"),
      s"q03's l_discount predicate not at the scan:\n$plan")
  }

  test("the Hive-layout date sink PRUNES PARTITIONS: a year/month " +
      "predicate lands in PartitionFilters and non-matching files are " +
      "never read (the pruning the layout replaced the reference's bare " +
      "yyyy/mm/dd keys to get)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-hive-prune")
      .toString + "/sink"
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2023-05-10 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2023-11-03 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-06-20 00:00:00")),
      (4L, java.sql.Timestamp.valueOf("2024-06-21 00:00:00")))
      .toDF("id", "updated_at")
    graft.ingest.IngestPipeline.writePartitioned(rows, out)
    // AQE off for THIS frame so the scan's metrics live on the same
    // plan instance the assertion reads (restored in finally)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val filtered = spark.read.json(out)
        .filter(col("year") === 2024 && col("month") === 6)
      val plan = planOf(filtered)
      val pf = plan.linesIterator
        .find(_.contains("PartitionFilters:")).getOrElse("")
      assert(pf.contains("year") && pf.contains("month"),
        s"date predicate did not become a partition filter: $pf\n$plan")
      assert(filtered.count() == 2)
      filtered.queryExecution.executedPlan.executeCollect()
      val scan = filtered.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
      def jsonFiles(p: java.io.File): Int =
        if (p.isDirectory) p.listFiles().map(jsonFiles).sum
        else if (p.getName.endsWith(".json")) 1 else 0
      val matching = jsonFiles(new java.io.File(s"$out/year=2024"))
      val total = jsonFiles(new java.io.File(out))
      assert(matching < total, "fixture must span multiple partitions")
      assert(scan.metrics("numFiles").value == matching,
        s"scan read ${scan.metrics("numFiles").value} files, " +
          s"expected only the $matching under year=2024/month=6 " +
          s"(of $total total)")
    } finally spark.conf.set(aqeKey, prevAqe)
  }

  test("the ANN code-table serve PRUNES cell= PARTITIONS: the probed-cell " +
      "IN-set is a static PartitionFilter on the index scan, so unprobed " +
      "cells are never listed or read") {
    import spark.implicits._
    import graft.ext.IvfPqIndex
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    val corpus = (0L until 40L).map(i => i -> vec(i.toInt + 1))
      .toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-prune")
      .toString + "/index"
    IvfPqIndex.create(spark, idx, corpus)
    IvfPqIndex.add(spark, idx, corpus, runId = 0L)
    val served = IvfPqIndex.search(spark, idx,
      Seq(1000L -> vec(6)).toDF("vec_id", "embedding"), k = 3, nprobe = 2)
    val plan = planOf(served)
    val pfLines = plan.linesIterator
      .filter(_.contains("PartitionFilters:")).toSeq
    assert(pfLines.exists(l => l.contains("cell#") &&
        (l.contains("IN ") || l.contains("INSET") || l.contains("in("))),
      s"probed-cell set is not a partition filter on the code scan:\n" +
        s"${pfLines.mkString("\n")}\n$plan")
    // one query at nprobe=2 probes ≤ 2 of the 8 cells — behavioral check
    assert(served.count() == 3)
  }

  test("a MergeTable snapshot read composes with native pruning: a " +
      "bucket predicate is a PartitionFilter and a value predicate a " +
      "PushedFilter — so the z-order optimize's row-group stats are " +
      "actually consulted by the scan") {
    import spark.implicits._
    import graft.ext.MergeTable
    val tbl = java.nio.file.Files.createTempDirectory("graft-cow-prune")
      .toString + "/t"
    MergeTable.create(
      (1L to 400L).map(i => (i, i * 3L)).toDF("key", "cents"),
      tbl, "key", hexDigits = 1)
    MergeTable.optimizeZOrder(spark, tbl, "key", "cents",
      blockBytes = Some(1024))
    val q = MergeTable.readTable(spark, tbl)
      .filter(col("bucket") === "a" && col("cents") > 600L)
    val plan = planOf(q)
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("bucket"),
      s"bucket predicate did not reach PartitionFilters:\n$plan")
    assert(plan.contains("GreaterThan(cents,600)"),
      s"cents predicate not pushed to the parquet reader (row-group " +
        s"stats would go unconsulted):\n$plan")
  }
}

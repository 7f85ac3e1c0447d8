package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-file BLOOM FILTERS (`graft.bloom.columns`): equality-predicate
  * file skipping on non-clustered columns — files whose filter
  * provably misses every probe value drop from the PLAN's file list;
  * a present value always hits (no false negatives), so pruning can
  * never change results, only files scheduled. */
class BloomSkipSpec extends SparkSpec {

  private def planned(q: DataFrame): Long =
    q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.getOrElse(sys.error("no file scan planned"))

  private def mkTable(n: Int = 4000): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom")
      .resolve("t").toString
    // cat has ~40 distinct values spread over every bucket and every
    // cents stripe — the non-clustered equality target; tag is its
    // string twin
    val df = (1 to n).map(i => (i.toLong, (i * 2654435761L) % 40,
      s"t${(i * 40503L) % 37}", i.toLong * 10))
      .toDF("key", "cat", "tag", "cents")
    MergeTable.create(df, dir, "key", hexDigits = 1)
    dir
  }

  test("blooms build at the striped rewrite, skip files on long and " +
      "string equality, and NEVER drop a matching row — full probe " +
      "sweep over every live value equals the unpruned result") {
    val dir = mkTable()
    MergeTable.setProperties(spark, dir, Map(
      "graft.bloom.columns" -> "cat,tag",
      "graft.bloom.bits" -> "4096"))
    MergeTable.optimize(spark, dir, "cents",
      maxRecordsPerFile = Some(256L))
    graft.plans.StatsFilePruning.enable(spark)
    val total = MergeTable.readTable(spark, dir).inputFiles.length.toLong
    // long-typed equality
    var skippedSomething = false
    (0L until 40L).foreach { c =>
      val q = MergeTable.readTable(spark, dir).filter(col("cat") === c)
      val got = q.select("key").collect().map(_.getLong(0)).toSet
      val want = MergeTable.readTable(spark, dir)
        .filter(col("cat") <=> c) // reference, same engine, no pin
        .select("key").collect().map(_.getLong(0)).toSet
      assert(got === want, s"cat=$c")
      if (planned(q) < total) skippedSomething = true
    }
    assert(skippedSomething, "bloom never skipped a single file")
    // string-typed equality
    val qs = MergeTable.readTable(spark, dir).filter(col("tag") === "t5")
    assert(planned(qs) <= total)
    assert(qs.count() ===
      MergeTable.readTable(spark, dir).filter(col("tag") === "t5")
        .count())
    // IN-list: kept iff ANY value might be present
    val qin = MergeTable.readTable(spark, dir)
      .filter(col("cat").isin(3L, 17L))
    assert(qin.select("key").collect().length ===
      MergeTable.readTable(spark, dir)
        .filter(col("cat") === 3L || col("cat") === 17L).count())
  }

  test("a value absent from the whole table plans ZERO files (bloom " +
      "permitting), and carried files keep their blooms across an " +
      "unrelated upsert") {
    import spark.implicits._
    val dir = mkTable(2000)
    MergeTable.setProperties(spark, dir, Map(
      "graft.bloom.columns" -> "cat",
      "graft.bloom.bits" -> "65536")) // large m: FPR ~ 0 at this n
    MergeTable.optimize(spark, dir, "cents",
      maxRecordsPerFile = Some(256L))
    graft.plans.StatsFilePruning.enable(spark)
    val qMiss = MergeTable.readTable(spark, dir)
      .filter(col("cat") === 999L)
    assert(qMiss.count() === 0L)
    // bounds alone cannot prove 999 absent everywhere? they can here
    // (max(cat)=39 < 999) — probe INSIDE the range so only the bloom
    // can skip: a value in [0,39] no row carries does not exist (all
    // 40 residues occur), so probe a fractional-impossible long via
    // an absent tag instead: delete every row of one cat first
    MergeTable.deleteKeys(spark, dir,
      (1 to 2000).map(_.toLong).filter(i => (i * 2654435761L) % 40 == 7)
        .toDF("key"))
    // the delete REWROTE the impacted buckets; their fresh files carry
    // rebuilt blooms (props ride every commit), files of untouched
    // buckets keep the optimize-built ones
    val q7 = MergeTable.readTable(spark, dir).filter(col("cat") === 7L)
    assert(q7.count() === 0L)
    assert(planned(q7) === 0L,
      "a fully-deleted value must plan zero files under a sparse bloom")
  }

  test("bloom-blind soundness: without the property nothing is " +
      "attested and nothing prunes; a bloom-annotated manifest read " +
      "by the stats path alone still answers correctly") {
    val dir = mkTable(1000)
    MergeTable.optimize(spark, dir, "cents",
      maxRecordsPerFile = Some(256L))
    graft.plans.StatsFilePruning.enable(spark)
    val total = MergeTable.readTable(spark, dir).inputFiles.length.toLong
    val q = MergeTable.readTable(spark, dir).filter(col("cat") === 5L)
    assert(planned(q) === total, "no blooms -> no equality skipping")
    assert(q.count() > 0L)
  }
}

package graft.plans

import graft.SparkSpec
import graft.ext.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Value-predicate FILE pruning: manifest `#st=` per-file min/max
  * stats must shrink the planned file list for pushed range
  * predicates — never the result — and the rule must stay silent on
  * every off-pattern shape (no manifests, no stats, foreign scans). */
class StatsFilePruningSpec extends SparkSpec {

  StatsFilePruning.enable(spark)

  /** A 16-bucket table z-striped on (cust, cents): 4 stripe files per
    * bucket at 200 rows/stripe. */
  private def mkStriped(n: Int = 12800): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sfp")
      .resolve("t").toString
    val df = (1 to n).map(i =>
      (i.toLong, (i % 997).toLong, (i % 577).toLong))
      .toDF("key", "cust", "cents")
    MergeTable.create(df, dir, "key", hexDigits = 1)
    MergeTable.optimizeZOrder(spark, dir, "cust", "cents",
      maxRecordsPerFile = Some(200L))
    dir
  }

  private def scanFiles(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.map(_.selectedPartitions.totalNumberOfFiles)
      .getOrElse(fail("no file scan in plan"))

  private val boxCond =
    col("cust").between(400L, 460L) && col("cents").between(250L, 280L)

  test("a box predicate schedules exactly the stripes whose manifest " +
      "stats overlap it — the planned count equals the stats " +
      "arithmetic — and the rows equal the unpruned read") {
    val dir = mkStriped()
    val total = scanFiles(MergeTable.readTable(spark, dir)
      .filter(col("key") >= Long.MinValue)) // constraint the rule skips
    val q = MergeTable.readTable(spark, dir).filter(boxCond)
    val planned = scanFiles(q)
    assert(planned < total,
      s"stats pruning never fired: $planned of $total files")
    // the planned set must equal the same overlap arithmetic applied
    // to the manifest stats index directly
    val stats = MergeTable.fileStatsIndex(spark, dir)
    val live = MergeTable.versions(spark, dir).last
    val entries = sparkManifest(dir, live)
    val expect = entries.count { e =>
      val st = stats(e)
      val (cLo, cHi) = st("cust") match {
        case (Some(a), Some(b)) => (a, b); case _ => (0L, -1L) }
      val (dLo, dHi) = st("cents") match {
        case (Some(a), Some(b)) => (a, b); case _ => (0L, -1L) }
      cLo <= 460L && cHi >= 400L && dLo <= 280L && dHi >= 250L
    }
    assert(planned === expect.toLong,
      s"planned $planned files, stats arithmetic says $expect")
    // result identity: the pruned plan returns exactly the full scan's rows
    val expectRows = (1 to 12800).map(i =>
        (i.toLong, (i % 997).toLong, (i % 577).toLong))
      .filter(r => r._2 >= 400 && r._2 <= 460 && r._3 >= 250 && r._3 <= 280)
      .toSet
    val got = q.select("key", "cust", "cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expectRows)
  }

  /** The live manifest's entries (via the public read path's file
    * list, relativized). */
  private def sparkManifest(dir: String, v: Long): Seq[String] =
    MergeTable.readTable(spark, dir, Some(v)).inputFiles.toSeq
      .map(f => f.substring(f.lastIndexOf("/data/") + "/data/".length))

  test("a predicate outside every stripe's range schedules ZERO files " +
      "and returns zero rows without error") {
    val dir = mkStriped(3200)
    val q = MergeTable.readTable(spark, dir)
      .filter(col("cents") > 1000000L)
    assert(scanFiles(q) === 0L)
    assert(q.count() === 0L)
  }

  test("legacy manifests without #st= lines prune nothing and read " +
      "in full (stats are an annotation, never a requirement)") {
    val dir = mkStriped(3200)
    // strip the stats lines — a pre-stats writer's manifest
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md = new org.apache.hadoop.fs.Path(s"$dir/_manifests")
    fs.listStatus(md).filter(_.isFile).foreach { st =>
      val in = fs.open(st.getPath)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filterNot(_.startsWith("#st=")).mkString("\n")
        finally in.close()
      val out = fs.create(st.getPath, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    val all = scanFiles(MergeTable.readTable(spark, dir))
    val q = MergeTable.readTable(spark, dir).filter(boxCond)
    assert(scanFiles(q) === all,
      "an unattested file list must not be pruned")
    assert(q.count() ===
      (1 to 3200).count(i => (i % 997) >= 400 && (i % 997) <= 460 &&
        (i % 577) >= 250 && (i % 577) <= 280).toLong)
  }

  test("a time-travel read prunes against ITS OWN snapshot's stats: " +
      "pre-striping version reads exact rows (single wide file per " +
      "bucket, nothing skippable), striped head prunes") {
    val dir = mkStriped(3200)
    val q1 = MergeTable.readTable(spark, dir, Some(1L)).filter(boxCond)
    val q2 = MergeTable.readTable(spark, dir, Some(2L)).filter(boxCond)
    assert(q1.count() === q2.count(),
      "both snapshots hold the same rows — content invariance")
    assert(scanFiles(q2) <= scanFiles(q1),
      "the striped layout must never schedule more than the unstriped")
  }

  test("an all-null stats column prunes its file under a " +
      "null-rejecting predicate (no non-null value can match)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sfp-n")
      .resolve("t").toString
    // two keys in DIFFERENT width-1 buckets; val null in one of them
    val ks = (1L to 50L)
      .groupBy(k => KeyToBucketPruning.bucketOf(k.toString, 1))
      .values.take(2).map(_.head).toSeq
    assert(ks.size === 2)
    val df = Seq((ks(0), Option.empty[Long]), (ks(1), Some(5L)))
      .toDF("key", "val")
    MergeTable.create(df, dir, "key", hexDigits = 1)
    val q = MergeTable.readTable(spark, dir).filter(col("val") >= 1L)
    assert(scanFiles(q) === 1L,
      "the all-null file must be pruned by a null-rejecting predicate")
    assert(q.select("key").collect().map(_.getLong(0)).toSeq ===
      Seq(ks(1)))
  }

  test("the rule is silent on a NON-MergeTable parquet layout even " +
      "when the path shape matches (no _manifests => no pruning)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sfp-f")
    val out = root.resolve("t/data/v=1-0x0").toString
    (1 to 100).map(i => (i.toLong, (i % 7).toLong))
      .toDF("key", "cents")
      .withColumn("bucket", lit("aa"))
      .write.partitionBy("bucket").parquet(out)
    val q = spark.read.option("basePath", s"${root.resolve("t/data")}")
      .parquet(out).filter(col("cents") >= 100L)
    assert(q.count() === 0L) // rows, not files: nothing to prune against
    assert(scanFiles(q) >= 1L, "a foreign scan must not be rewritten")
  }
}

package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BoilerplateIndexSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cleaning before any run commits is a no-op (df 0 everywhere)") {
    import spark.implicits._
    val idx = Files.createTempDirectory("boiler-idx").resolve("i").toString
    val out = BoilerplateIndex.clean(spark, idx,
      Seq((1L, "a b c d e f")).toDF("doc_id", "text")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_removed") == 0L)
    assert(out.head.getAs[String]("cleaned_fp") == md5hex("a b c d e f"))
  }

  test("detection lags by design: a segment crosses the df threshold on " +
      "the run that completes it, earlier verdicts stand") {
    import spark.implicits._
    val idx = Files.createTempDirectory("boiler-idx").resolve("i").toString
    // "the same header" as the leading 3-word segment of two run-1 docs
    val r1 = Seq(
      (1L, "the same header unique one body"),
      (2L, "the same header unique two body"),
      (3L, "completely different text here now")).toDF("doc_id", "text")
    BoilerplateIndex.add(spark, idx, r1, 0L)
    val c1 = BoilerplateIndex.clean(spark, idx, r1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    // df("the same header") = 2 < 3: nothing is boilerplate yet
    assert(c1.values.forall(_ == 0L))

    // run 2 carries the header a third time -> cumulative df hits 3
    val r2 = Seq((10L, "the same header unique three body"))
      .toDF("doc_id", "text")
    BoilerplateIndex.add(spark, idx, r2, 1L)
    val c2 = BoilerplateIndex.clean(spark, idx, r2).collect()
    assert(c2.head.getAs[Long]("n_removed") == 1L)
    assert(c2.head.getAs[String]("cleaned_fp") ==
      md5hex("unique three body"))
    // and run 1's docs, if re-cleaned NOW, would flip too — the lag is
    // in when a run is cleaned, not doc identity
    val re1 = BoilerplateIndex.clean(spark, idx, r1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    assert(re1(1L) == 1L && re1(2L) == 1L && re1(3L) == 0L)
  }

  test("replayed runs overwrite their own partition instead of " +
      "double-counting the delta") {
    import spark.implicits._
    val idx = Files.createTempDirectory("boiler-idx").resolve("i").toString
    val r1 = Seq(
      (1L, "shared seg one tail a"),
      (2L, "shared seg one tail b")).toDF("doc_id", "text")
    BoilerplateIndex.add(spark, idx, r1, 0L)
    val once = BoilerplateIndex.dfTable(spark, idx).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("df")).toMap
    // a foreachBatch retry re-commits the same runId
    BoilerplateIndex.add(spark, idx, r1, 0L)
    val twice = BoilerplateIndex.dfTable(spark, idx).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("df")).toMap
    assert(once == twice)
    assert(once(md5hex("shared seg one")) == 2L)
  }

  test("runId -1 is reserved for the compacted epoch") {
    import spark.implicits._
    val idx = Files.createTempDirectory("boiler-idx").resolve("i").toString
    intercept[IllegalArgumentException] {
      BoilerplateIndex.add(spark, idx,
        Seq((1L, "a b c")).toDF("doc_id", "text"), -1L)
    }
  }

  test("compaction is read-invariant, bounds files, and later runs " +
      "keep accumulating on top of the compacted epoch") {
    import spark.implicits._
    val idx = Files.createTempDirectory("boiler-idx").resolve("i").toString
    // three hourly-style runs, each re-carrying the same header
    (0 to 2).foreach { r =>
      BoilerplateIndex.add(spark, idx,
        Seq((10L * r + 1, s"the same header unique $r x"))
          .toDF("doc_id", "text"), r.toLong)
    }
    val before = BoilerplateIndex.dfTable(spark, idx).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("df")).toMap
    assert(before(md5hex("the same header")) == 3L)
    BoilerplateIndex.compact(spark, idx)
    val after = BoilerplateIndex.dfTable(spark, idx).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("df")).toMap
    assert(before == after)
    assert(DedupIndex.dataFileCount(spark, idx) <=
      spark.sparkContext.defaultParallelism)
    // a post-compaction run sums on top of the batch=-1 epoch
    BoilerplateIndex.add(spark, idx,
      Seq((100L, "the same header unique post x")).toDF("doc_id", "text"),
      3L)
    val grown = BoilerplateIndex.dfTable(spark, idx).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("df")).toMap
    assert(grown(md5hex("the same header")) == 4L)
    // and cleaning reflects the post-compaction state
    val c = BoilerplateIndex.clean(spark, idx,
      Seq((200L, "the same header fresh tail words")).toDF("doc_id", "text"))
      .collect().head
    assert(c.getAs[Long]("n_removed") == 1L)
    assert(c.getAs[String]("cleaned_fp") == md5hex("fresh tail words"))
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class BoilerplateStreamSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cross-batch df accumulation survives kill/restart: the header " +
      "strips from the batch that completes its frequency") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("boiler-stream-idx")
      .resolve("i").toString
    val out = Files.createTempDirectory("boiler-stream-out").toString
    val ckpt = Files.createTempDirectory("boiler-stream-ckpt").toString
    val input = MemoryStream[DocRec]

    // batch 0: the shared header appears in two docs — df 2, below bar
    input.addData(
      DocRec(1, "the same header unique one body"),
      DocRec(2, "the same header unique two body"))
    BoilerplateStream.start(input.toDF(), idx, out, ckpt)
      .awaitTermination() // drains batch 0, then "crashes"

    // batch 1 after restart: a third carrier — cumulative df hits 3
    input.addData(DocRec(10, "the same header unique three body"))
    BoilerplateStream.start(input.toDF(), idx, out, ckpt)
      .awaitTermination()

    val rows = spark.read.parquet(out + "/batch=*").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_fp"))).toMap
    // batch 0 verdicts stand (df was 2 when they shipped)...
    assert(rows(1L)._1 == 0L && rows(2L)._1 == 0L)
    // ...batch 1 sees the completed frequency and strips the header
    assert(rows(10L) == (1L, md5hex("unique three body")))
  }

  test("auto-compaction keeps the delta table bounded and the summed " +
      "state identical; later batches accumulate on the epoch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("boiler-compact-idx")
      .resolve("i").toString
    val out = Files.createTempDirectory("boiler-compact-out").toString
    val ckpt = Files.createTempDirectory("boiler-compact-ckpt").toString
    val input = MemoryStream[DocRec]
    // four restarts = four micro-batches; threshold 1 fires the policy
    // at the start of every batch after the first
    (0 to 3).foreach { k =>
      input.addData(DocRec(10L * k + 1, s"the same header unique $k x"))
      BoilerplateStream.start(input.toDF(), idx, out, ckpt,
        maxIndexFiles = 1).awaitTermination()
    }
    assert(graft.ext.DedupIndex.dataFileCount(spark, idx) <=
      2 * spark.sparkContext.defaultParallelism)
    val df = graft.ext.BoilerplateIndex.dfTable(spark, idx).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("df")).toMap
    // all four carriers counted exactly once across epochs + live runs
    assert(df(md5hex("the same header")) == 4L)
    // the verdict stream flipped exactly at the batch that hit the bar
    val rows = spark.read.parquet(out + "/batch=*").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed"))
      .toMap
    assert(rows(1L) == 0L && rows(11L) == 0L) // df 1, 2
    assert(rows(21L) == 1L && rows(31L) == 1L) // df 3, 4
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class SubstringDfStreamSpec extends SparkSpec {

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")
  private val run = words("dup", 10).mkString(" ")
  private def doc(id: Long, pre: String, post: String) =
    DocRec(id, s"$pre $run $post")
  private def unique(id: Long, n: Int) =
    DocRec(id, words(s"u$id", n).mkString(" "))

  test("forward-only excision survives kill/restart: a later batch's " +
      "repeat is cut against the index the restart re-reads") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("ssdf-stream-idx").toString
    val out = Files.createTempDirectory("ssdf-stream-out").toString
    val ckpt = Files.createTempDirectory("ssdf-stream-ckpt").toString
    val input = MemoryStream[DocRec]

    // batch 0: the first carrier of the run + a unique doc
    input.addData(doc(1, "a0 a1", "b0 b1 b2"), unique(2, 15))
    SubstringDfStream.start(input.toDF(), idx, out, ckpt)
      .awaitTermination() // drain, then "crash"

    // batch 1 after restart: a repeat of the run + another unique doc
    input.addData(doc(10, "c0 c1 c2", "d0"), unique(11, 12))
    SubstringDfStream.start(input.toDF(), idx, out, ckpt)
      .awaitTermination()

    val rows = spark.read.parquet(out + "/batch=*")
      .select("doc_id", "dup_tokens", "n_spans")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 10L, 11L))
    assert(rows(1L) == (0L, 0L), "first carrier must keep the run")
    assert(rows(10L) == (10L, 1L),
      "the restart must excise against the persisted pairs")
    assert(rows(2L)._1 == 0L && rows(11L)._1 == 0L)
  }

  test("auto-compaction bounds the pair table and replay-after-compact " +
      "stays correct: the rewritten run folds away at the next compact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("ssdf-compact-idx").toString
    val out = Files.createTempDirectory("ssdf-compact-out").toString
    val ckpt = Files.createTempDirectory("ssdf-compact-ckpt").toString
    val input = MemoryStream[DocRec]
    // three restarts = three micro-batches at threshold 1: the policy
    // fires at the end of every batch
    Seq(doc(1, "a0", "a1"), unique(2, 14), doc(3, "b0 b1", "b2"))
      .zipWithIndex.foreach { case (d, i) =>
        input.addData(d)
        SubstringDfStream.start(input.toDF(), idx, out, ckpt,
          maxIndexFiles = 1).awaitTermination()
      }
    val files = graft.ext.DedupIndex.dataFileCount(spark, idx)
    assert(files <= spark.sparkContext.defaultParallelism,
      s"auto-compaction left $files files")
    // doc 3 was excised against doc 1's pairs THROUGH the compactions
    val rows = spark.read.parquet(out + "/batch=*")
      .select("doc_id", "dup_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(3L) == 10L, "compacted pairs lost the excision")

    // replay-after-compact: re-admit doc 3's batch under its old runId
    // next to the epoch — rows re-derive identically (distinct-doc df),
    // and the next compact folds the duplicate pairs away
    val replay = graft.ext.SubstringDfIndex.admit(spark, idx,
      Seq((3L, doc(3, "b0 b1", "b2").text)).toDF("doc_id", "text"),
      runId = 2L)
    assert(replay.collect().head.getAs[Long]("dup_tokens") == 10L)
    val before = graft.ext.SubstringDfIndex.readIndex(spark, idx)
      .select("doc_id", "fp").distinct().count()
    graft.ext.SubstringDfIndex.compact(spark, idx)
    val after = graft.ext.SubstringDfIndex.readIndex(spark, idx)
    assert(after.count() == before, "compact did not fold replay dupes")
    assert(after.select("run").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(-1L))
  }
}

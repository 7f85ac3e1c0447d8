package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Document record for the streaming curation surface. */
case class CurDoc(doc_id: Long, lang: String, text: String)

class CurationStreamSpec extends SparkSpec {

  // passes every gate: has "the" (lang), 12 distinct tokens (length,
  // quality ~0.96)
  private def good(id: Long): CurDoc = CurDoc(id, "en",
    s"the quick brown fox jumps over lazy dogs near river bank d$id")
  // fails the lang gate: no en marker tokens
  private def noMarker(id: Long): CurDoc = CurDoc(id, "en",
    s"quick brown fox jumps over lazy dogs near river bank stone d$id")
  // fails the length gate: < 10 tokens
  private def short(id: Long): CurDoc = CurDoc(id, "en", "the tiny one")

  test("gates filter micro-batches exactly like the batch chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CurDoc]
    val q = CurationStream.gated(input.toDF())
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      input.addData(good(1), noMarker(2), short(3), good(4))
      q.processAllAvailable()
      val ids = spark.table("curated").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 4L))
      // batch parity: the same rows through the same function, unstreamed
      val batchIds = CurationStream
        .gated(Seq(good(1), noMarker(2), short(3), good(4)).toDF())
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(batchIds.toSeq == ids.toSeq)
    } finally q.stop()
  }

  test("kill/restart resumes from the checkpoint without duplicating output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-cur-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cur-ckpt").toString
    val input = MemoryStream[CurDoc]

    input.addData(good(1), short(2), good(3))
    val q1 = CurationStream.startToParquet(input.toDF(), out, ckpt)
    q1.awaitTermination() // AvailableNow drains batch 0, then "crashes"

    input.addData(good(4), noMarker(5))
    val q2 = CurationStream.startToParquet(input.toDF(), out, ckpt)
    q2.awaitTermination() // restart: resumes AFTER batch 0's offset

    val back = spark.read.parquet(out + "/batch=*")
    val ids = back.select("doc_id").collect().map(_.getLong(0)).sorted
    // 1,3 written once (not re-emitted on restart), 4 from the new batch
    assert(ids.toSeq == Seq(1L, 3L, 4L))
  }

  test("content dedup drops a re-delivered document in a LATER micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CurDoc]
    val q = CurationStream.curated(input.toDF())
      .writeStream.format("memory").queryName("curated_dedup")
      .outputMode("append").start()
    try {
      input.addData(good(1), good(10))
      q.processAllAvailable()
      // batch 2: doc 1's exact text re-crawled under a NEW doc_id, plus a
      // fresh doc — cross-batch state must drop the re-crawl
      input.addData(CurDoc(2L, "en", good(1).text), good(11))
      q.processAllAvailable()
      val ids = spark.table("curated_dedup").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 10L, 11L)) // 2L deduped against batch 1
    } finally q.stop()
  }

  test("crash-replay of a batch overwrites its directory, never duplicates") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-cur-replay").toString
    val gatedBatch = CurationStream.gated(Seq(good(1), good(2)).toDF())
    EventsStream.writeBatchIdempotent(out)(gatedBatch, 3L)
    EventsStream.writeBatchIdempotent(out)(gatedBatch, 3L) // redelivery
    assert(spark.read.parquet(s"$out/batch=3").count() == 2)
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Document record for the streaming text near-dup surface. */
case class DocRec(doc_id: Long, text: String)

class TextNearDupStreamSpec extends SparkSpec {

  // ≥16 distinct words so a trivial edit still agrees on ≥15/16
  // minhash positions with high probability, and unrelated docs don't
  private val docA =
    "the quick brown fox jumps over a lazy dog while seven wizards " +
      "brew strong potions under cold mountain stars tonight"
  private val docB =
    "databases shuffle partitions across executors because wide joins " +
      "demand network exchanges that dominate query latency at scale"
  private val docC =
    "gardens bloom in spring when rain feeds roots and bees carry " +
      "pollen between flowers through warm afternoon air slowly"
  /** A near-dup re-render: word order shuffled and words repeated — the
    * boilerplate-rerender shape. The DISTINCT token set is unchanged, so
    * the minhash signature matches 16/16 deterministically; a
    * one-word-replacement variant sits at J ≈ 0.9 where the 15/16 bar is
    * genuinely probabilistic (the replay test exercises that case). */
  private def reRender(t: String): String = {
    val w = t.split(" ")
    (w.reverse ++ w.take(3)).mkString(" ")
  }

  test("cross-batch text rejection survives kill/restart, and the index " +
      "accumulates only admitted representatives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("textdup-stream-idx").toString
    val out = Files.createTempDirectory("textdup-stream-out").toString
    val ckpt = Files.createTempDirectory("textdup-stream-ckpt").toString
    val input = MemoryStream[DocRec]

    // batch 0: two distinct docs + an in-batch re-render of docA
    input.addData(DocRec(1, docA), DocRec(2, docB), DocRec(3, reRender(docA)))
    val q1 = TextNearDupStream.start(input.toDF(), idx, out, ckpt)
    q1.awaitTermination() // AvailableNow drains batch 0, then "crashes"

    // batch 1 after restart: a re-crawl of docB + one genuinely new doc
    input.addData(DocRec(10, reRender(docB)), DocRec(11, docC))
    val q2 = TextNearDupStream.start(input.toDF(), idx, out, ckpt)
    q2.awaitTermination()

    val admitted = spark.read.parquet(out + "/batch=*")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 3 collapsed onto 1 in-batch; 10 rejected cross-batch (near docB,
    // which batch 0 admitted and the restart re-read from the index)
    assert(admitted.toSeq == Seq(1L, 2L, 11L))
    assert(graft.ext.TextNearDupIndex.readIndex(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 11L))
  }

  test("auto-compaction: a multi-batch stream run ends with a bounded " +
      "file count and the index still rejects re-crawls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("textdup-compact-idx").toString
    val out = Files.createTempDirectory("textdup-compact-out").toString
    val ckpt = Files.createTempDirectory("textdup-compact-ckpt").toString
    val input = MemoryStream[DocRec]
    // three restarts = three micro-batches; threshold 1 forces the
    // policy to fire at the end of every batch
    val texts = Seq(docA, docB, docC)
    texts.zipWithIndex.foreach { case (t, k) =>
      input.addData(DocRec(k + 1, t))
      TextNearDupStream.start(input.toDF(), idx, out, ckpt,
        maxIndexFiles = 1).awaitTermination()
    }
    val files = graft.ext.DedupIndex.dataFileCount(spark, idx)
    assert(files <= spark.sparkContext.defaultParallelism,
      s"auto-compaction left $files files")
    assert(spark.read.parquet(out + "/batch=*").count() == 3)
    // the compacted signature rows still reject a boilerplate re-render
    val rej = graft.ext.TextNearDupIndex.admit(spark, idx,
      Seq((99L, reRender(docA))).toDF("doc_id", "text"))
    assert(rej.isEmpty, "compacted index lost a rejection")
  }

  test("replayed batch re-derives identical admissions: the foreachBatch " +
      "retry path is idempotent for the text index too") {
    import spark.implicits._
    val idx = Files.createTempDirectory("textdup-replay-idx").toString
    // one-word edit: J ≈ 0.9, the bar's design point — with this text
    // the 16-position agreement lands ≥ 15 (deterministic given md5)
    val edited = docA.replace("tonight", "today")
    val batch = Seq((1L, docA), (2L, docB), (3L, edited))
      .toDF("doc_id", "text")
    val first = graft.ext.TextNearDupIndex.admit(spark, idx, batch)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // simulate the crash-after-index-append, replay the SAME batch
    val replay = graft.ext.TextNearDupIndex.admit(spark, idx, batch)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(first.toSeq == Seq(1L, 2L))
    assert(replay.toSeq == first.toSeq,
      "replay flipped admission verdicts")
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Vector record for the streaming near-dup surface. */
case class VecRec(vec_id: Long, embedding: Array[Float])

class NearDupStreamSpec extends SparkSpec {

  private val planes = 4

  private def base(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextGaussian().toFloat)
  }
  private def near(v: Array[Float]): Array[Float] =
    v.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) 0.01f else -0.01f) }

  test("cross-batch semantic rejection survives kill/restart, and the " +
      "index accumulates only admitted representatives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("neardup-stream-idx").toString
    val out = Files.createTempDirectory("neardup-stream-out").toString
    val ckpt = Files.createTempDirectory("neardup-stream-ckpt").toString
    val v1 = base(1); val v2 = base(2)
    val input = MemoryStream[VecRec]

    // batch 0: two distinct vectors + an in-batch near-dup of v1
    input.addData(VecRec(1, v1), VecRec(2, v2), VecRec(3, near(v1)))
    val q1 = NearDupStream.start(input.toDF(), idx, out, ckpt, planes)
    q1.awaitTermination() // AvailableNow drains batch 0, then "crashes"

    // batch 1 after restart: a semantic re-crawl of v2 + one new vector
    input.addData(VecRec(10, near(v2)), VecRec(11, base(3)))
    val q2 = NearDupStream.start(input.toDF(), idx, out, ckpt, planes)
    q2.awaitTermination()

    val admitted = spark.read.parquet(out + "/batch=*")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    // 3 collapsed onto 1 in-batch; 10 rejected cross-batch (near v2,
    // which batch 0 admitted and the restart re-read from the index)
    assert(admitted.toSeq == Seq(1L, 2L, 11L))
    assert(graft.ext.NearDupIndex.readIndex(spark, idx)
      .select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 11L))
  }

  test("auto-compaction: a multi-batch stream run ends with a bounded " +
      "file count and unchanged admissions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("neardup-compact-idx").toString
    val out = Files.createTempDirectory("neardup-compact-out").toString
    val ckpt = Files.createTempDirectory("neardup-compact-ckpt").toString
    val input = MemoryStream[VecRec]
    // three restarts = three micro-batches; threshold 1 forces the
    // policy to fire at the end of every batch
    (0 until 3).foreach { k =>
      input.addData(VecRec(k * 10, base(k + 20)),
        VecRec(k * 10 + 1, base(k + 40)))
      NearDupStream.start(input.toDF(), idx, out, ckpt, planes,
        maxIndexFiles = 1).awaitTermination()
    }
    // compacted layout: at most one file per bucket partition
    val files = graft.ext.DedupIndex.dataFileCount(spark, idx)
    assert(files <= (1 << planes),
      s"auto-compaction left $files files for ${1 << planes} buckets")
    // admissions unaffected: all six distinct vectors admitted, and a
    // later re-crawl of an early vector is still rejected
    assert(spark.read.parquet(out + "/batch=*").count() == 6)
    val rej = graft.ext.NearDupIndex.admit(spark, idx,
      Seq((99L, near(base(20)))).toDF("vec_id", "embedding"), planes)
    assert(rej.isEmpty, "compacted index lost a rejection")
  }

  test("replayed batch re-derives identical admissions (self-matches " +
      "ignored): the foreachBatch retry path is idempotent") {
    import spark.implicits._
    val idx = Files.createTempDirectory("neardup-replay-idx").toString
    val batch = Seq((1L, base(5)), (2L, base(6)), (3L, near(base(5))))
      .toDF("vec_id", "embedding")
    val first = graft.ext.NearDupIndex.admit(spark, idx, batch, planes)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    // simulate the crash-after-index-append, replay the SAME batch
    val replay = graft.ext.NearDupIndex.admit(spark, idx, batch, planes)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(first.toSeq == Seq(1L, 2L))
    assert(replay.toSeq == first.toSeq,
      "replay flipped admission verdicts")
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class IvfPqStreamSpec extends SparkSpec {

  // 64-dim vectors (the PQ codebook geometry)
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)(r.nextGaussian().toFloat)
  }

  private def corpus(ids: Range) = {
    import spark.implicits._
    ids.map(i => VecRec(i.toLong, vec(i + 1))).toDF()
  }

  test("streamed batches are encoded against the frozen codebooks, " +
      "survive restart, and the index serves the full crawl") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("ivfpq-stream-idx").toString + "/i"
    val out = Files.createTempDirectory("ivfpq-stream-out").toString
    val ckpt = Files.createTempDirectory("ivfpq-stream-ckpt").toString
    // codebook training is a batch job, before the stream exists
    graft.ext.IvfPqIndex.create(spark, idx, corpus(0 until 20))
    val input = MemoryStream[VecRec]

    input.addData((0 until 10).map(i => VecRec(i.toLong, vec(i + 1))): _*)
    IvfPqStream.start(input.toDF(), idx, out, ckpt).awaitTermination()

    // restart: a second crawl batch, incl. an exact dup of vec 3
    input.addData(VecRec(10, vec(11)), VecRec(100, vec(4)))
    IvfPqStream.start(input.toDF(), idx, out, ckpt).awaitTermination()

    val indexed = graft.ext.IvfPqIndex.readIndex(spark, idx)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(indexed.toSeq == ((0L to 10L) :+ 100L))
    // the sink mirrors the index, batch-keyed
    assert(spark.read.parquet(out + "/batch=*").count() == 12)
    // the served index finds the cross-batch exact duplicate
    val res = graft.ext.IvfPqIndex.search(spark, idx,
      Seq((3L, vec(4))).toDF("vec_id", "embedding"), k = 5)
      .collect().map(_.getLong(1))
    assert(res.contains(100L))
  }

  test("auto-compaction bounds the file count without changing the " +
      "indexed contents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("ivfpq-ac-idx").toString + "/i"
    val out = Files.createTempDirectory("ivfpq-ac-out").toString
    val ckpt = Files.createTempDirectory("ivfpq-ac-ckpt").toString
    graft.ext.IvfPqIndex.create(spark, idx, corpus(0 until 20))
    val input = MemoryStream[VecRec]
    // three restarts = three runs; threshold 1 forces a compact at the
    // start of every batch after the first
    (0 until 3).foreach { k =>
      input.addData(VecRec(k.toLong, vec(k + 1)))
      IvfPqStream.start(input.toDF(), idx, out, ckpt, maxIndexFiles = 1)
        .awaitTermination()
    }
    val rows = graft.ext.IvfPqIndex.readIndex(spark, idx)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(0L, 1L, 2L))
    // compacted epoch exists; total data files stay bounded (epoch at
    // one file per cell + at most the last run's partition)
    val batchDirs = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).sorted
    assert(batchDirs.contains("batch=-1"))
    assert(batchDirs.length <= 2, s"uncompacted runs piled up: ${
      batchDirs.mkString(",")}")
  }

  test("the deletion stream drains tombstones into the index; the add " +
      "stream's auto-compaction retires them physically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("ivfpq-forget-idx").toString + "/i"
    val out = Files.createTempDirectory("ivfpq-forget-out").toString
    val ckptA = Files.createTempDirectory("ivfpq-forget-ckA").toString
    val ckptD = Files.createTempDirectory("ivfpq-forget-ckD").toString
    graft.ext.IvfPqIndex.create(spark, idx, corpus(0 until 20))
    val adds = MemoryStream[VecRec]
    adds.addData((0 until 20).map(i => VecRec(i.toLong, vec(i + 1))): _*)
    IvfPqStream.start(adds.toDF(), idx, out, ckptA).awaitTermination()

    // deletion feed: tombstone vectors 3 and 7 (delivered twice — the
    // duplicate-tolerance contract: re-appended ids are idempotent)
    val dels = MemoryStream[Long]
    dels.addData(3L, 7L, 3L)
    IvfPqStream.startForgets(dels.toDS().toDF("vec_id"), idx, ckptD)
      .awaitTermination()
    val q = corpus(3 to 3).withColumn("vec_id",
      org.apache.spark.sql.functions.lit(1000L))
    val served = graft.ext.IvfPqIndex.search(spark, idx, q, k = 5)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(!served.contains(3L) && !served.contains(7L),
      s"tombstoned ids served: $served")

    // next add batch fires auto-compaction (threshold 1): tombstoned
    // rows physically gone, side table retired
    adds.addData(VecRec(100L, vec(101)))
    IvfPqStream.start(adds.toDF(), idx, out, ckptA, maxIndexFiles = 1)
      .awaitTermination()
    val ids = graft.ext.IvfPqIndex.readIndex(spark, idx)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(3L) && !ids.contains(7L) && ids.contains(100L),
      s"post-compaction ids wrong: $ids")
    assert(!new java.io.File(s"$idx/_tombstones").exists())
  }
}

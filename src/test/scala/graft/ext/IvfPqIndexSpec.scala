package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfPqIndexSpec extends SparkSpec {

  // 64-dim vectors (PQ_M=32 × PQ_SUBDIM=2 — the codebook geometry)
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)(r.nextGaussian().toFloat)
  }

  private def df(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def corpus(n: Int) = df((0L until n.toLong).map(i =>
    i -> vec(i.toInt + 1)): _*)

  test("lifecycle: create on a training half, add both batches — every " +
      "vector lands with its cell and exactly PQ_M codes") {
    val idx = Files.createTempDirectory("ivfpq-idx1").toString + "/index"
    val all = corpus(40)
    val train = all.filter(col("vec_id") % 2 === 0)
    IvfPqIndex.create(spark, idx, train)
    IvfPqIndex.add(spark, idx, train)
    IvfPqIndex.add(spark, idx, all.filter(col("vec_id") % 2 === 1))
    val rows = IvfPqIndex.readIndex(spark, idx)
      .select(col("vec_id"), size(col("codes")).as("m"), col("cell"))
      .collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getInt(1) == Similarity.PQ_M))
    // cells are the coarse codebook's ids: the 8 smallest TRAIN vec_ids
    val trainIds = (0 until 16 by 2).toSet
    assert(rows.map(_.getInt(2)).toSet.subsetOf(trainIds))
  }

  test("codebooks are frozen: a second create throws, and adds encode " +
      "deterministically against the persisted meta") {
    val base = Files.createTempDirectory("ivfpq-idx2").toString
    val idx1 = base + "/i1"
    val idx2 = base + "/i2"
    val all = corpus(30)
    val train = all.filter(col("vec_id") < 20)
    IvfPqIndex.create(spark, idx1, train)
    val ex = intercept[IllegalStateException] {
      IvfPqIndex.create(spark, idx1, train)
    }
    assert(ex.getMessage.contains("frozen"))
    // same training frame → same codebooks → bit-identical codes for a
    // batch added to either index (the frozen-encoding contract)
    IvfPqIndex.create(spark, idx2, train)
    val batch = all.filter(col("vec_id") >= 20)
    def codesOf(idx: String) = IvfPqIndex.add(spark, idx, batch)
      .select("vec_id", "codes", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(codesOf(idx1) == codesOf(idx2))
  }

  test("add/search before create throw the no-codebooks contract") {
    val idx = Files.createTempDirectory("ivfpq-idx3").toString + "/index"
    val b = corpus(5)
    val exAdd = intercept[IllegalStateException] {
      IvfPqIndex.add(spark, idx, b)
    }
    assert(exAdd.getMessage.contains("no trained codebooks"))
    intercept[IllegalStateException] {
      IvfPqIndex.search(spark, idx, b)
    }
  }

  test("search finds an exact duplicate of an indexed vector in its " +
      "top-k, with k rows per query and ranks 1..k") {
    val idx = Files.createTempDirectory("ivfpq-idx4").toString + "/index"
    val all = corpus(40)
    IvfPqIndex.create(spark, idx, all)
    IvfPqIndex.add(spark, idx, all)
    // vec 100 duplicates vec 3's embedding exactly: identical grid →
    // identical cell and codes → minimal possible ADC distance
    IvfPqIndex.add(spark, idx, df(100L -> vec(4)))
    val q = df(3L -> vec(4))
    val res = IvfPqIndex.search(spark, idx, q, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(res.length == 5)
    assert(res.map(_._3).toSeq == (1L to 5L))
    assert(res.exists(_._2 == 100L), "exact duplicate missing from top-5")
  }

  test("compact: one file per cell partition, contents invariant, and " +
      "the codebook meta survives so search still serves") {
    val idx = Files.createTempDirectory("ivfpq-idx5").toString + "/index"
    val all = corpus(30)
    IvfPqIndex.create(spark, idx, all)
    // three appends decay the layout
    (0 until 3).foreach { k =>
      IvfPqIndex.add(spark, idx, all.filter(col("vec_id") % 3 === k))
    }
    val before = IvfPqIndex.readIndex(spark, idx)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getInt(2)))
      .sortBy(_._1).toSeq
    IvfPqIndex.compact(spark, idx)
    def filesPerCell = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val after = filesPerCell
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction left multi-file cells: $after")
    val afterRows = IvfPqIndex.readIndex(spark, idx)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(afterRows == before)
    // meta carried: search (needs codebooks) still runs post-swap
    assert(IvfPqIndex.search(spark, idx, df(0L -> vec(1)), k = 3)
      .count() == 3)
  }
}

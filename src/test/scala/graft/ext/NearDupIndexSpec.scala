package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NearDupIndexSpec extends SparkSpec {

  private val planes = 4

  // deterministic 8-dim unit-ish vectors: `base` plus a tiny or large
  // perturbation — cosine(base, near(base)) ≈ 1, cosine(base, far) ≈ 0
  private def base(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextGaussian().toFloat)
  }
  private def near(v: Array[Float], eps: Float = 0.01f): Array[Float] =
    v.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) eps else -eps) }

  private def df(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cross-run near-dedup: a later batch's semantic re-crawl is rejected") {
    val idx = Files.createTempDirectory("neardup-idx").toString
    val v1 = base(1); val v2 = base(2)

    // run 1: two distinct vectors, one in-batch near-dup of v1
    val r1 = NearDupIndex.admit(spark, idx,
      df(1L -> v1, 2L -> v2, 3L -> near(v1)), planes)
    assert(r1.select("vec_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L)) // 3 collapsed onto 1 within the batch

    // run 2: v2 re-embedded with a tiny drift + one genuinely new vector
    val r2 = NearDupIndex.admit(spark, idx,
      df(10L -> near(v2), 11L -> base(3)), planes)
    assert(r2.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(11L))

    // index holds exactly the three admitted representatives
    assert(NearDupIndex.readIndex(spark, idx).select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L))
  }

  test("fully-duplicate batch admits nothing and appends nothing") {
    val idx = Files.createTempDirectory("neardup-idx2").toString
    val v1 = base(4); val v2 = base(5)
    NearDupIndex.admit(spark, idx, df(1L -> v1, 2L -> v2), planes)
    val before = NearDupIndex.readIndex(spark, idx).count()
    val r = NearDupIndex.admit(spark, idx,
      df(5L -> near(v1), 6L -> near(v2)), planes)
    assert(r.isEmpty)
    assert(NearDupIndex.readIndex(spark, idx).count() == before)
  }

  test("fresh index dir: everything admits, index bootstraps") {
    val idx = Files.createTempDirectory("neardup-idx3").toString
    assert(NearDupIndex.readIndex(spark, idx).isEmpty)
    val r = NearDupIndex.admit(spark, idx, df(7L -> base(7)), planes)
    assert(r.count() == 1)
    assert(NearDupIndex.readIndex(spark, idx).count() == 1)
  }

  test("multi-probe probing catches a near-dup whose bucket differs by " +
      "one hyperplane (single-bucket probing would re-admit it)") {
    val idx = Files.createTempDirectory("neardup-idx4").toString
    // hunt a (v, near(v)) pair that LANDS in buckets at Hamming distance
    // exactly 1 — the boundary-crossing case q78 measured at ~85% miss
    def bucketOf(v: Array[Float]): Int = {
      import spark.implicits._
      Seq(Tuple1(v)).toDF("embedding")
        .select(graft.functions.HyperplaneBucket.bucket(col("embedding"),
          planes).as("b")).collect()(0).getInt(0)
    }
    val found = (100 to 300).view.map { seed =>
      val v = base(seed); (v, near(v, 0.05f))
    }.find { case (v, n) =>
      java.lang.Integer.bitCount(bucketOf(v) ^ bucketOf(n)) == 1
    }
    assert(found.isDefined, "no Hamming-1 pair in seed range")
    val (v, drifted) = found.get
    NearDupIndex.admit(spark, idx, df(1L -> v), planes)
    val r = NearDupIndex.admit(spark, idx, df(2L -> drifted), planes)
    assert(r.isEmpty, "boundary-crossing near-dup was re-admitted")
  }

  test("planes-stability contract: admit with a different planes than the " +
      "index was created with THROWS (persisted in _graft_meta)") {
    val idx = Files.createTempDirectory("neardup-idx6").toString
    NearDupIndex.admit(spark, idx, df(1L -> base(30)), planes)
    // the meta file exists next to the data and is invisible to readIndex
    assert(new java.io.File(idx, "_graft_meta").isFile)
    assert(NearDupIndex.readIndex(spark, idx).count() == 1)
    val ex = intercept[IllegalArgumentException] {
      NearDupIndex.admit(spark, idx, df(2L -> base(31)), planes + 1)
    }
    assert(ex.getMessage.contains(s"planes=$planes"))
    // the matching planes still admits fine after the failed attempt
    assert(NearDupIndex.admit(spark, idx, df(2L -> base(31)), planes)
      .count() == 1)
  }

  test("readIndex sees a partitioned (subdir-committed) layout — the " +
      "flat *.parquet listing would have read it as an empty index") {
    val idx = Files.createTempDirectory("neardup-idx5").toString
    NearDupIndex.admit(spark, idx, df(1L -> base(20), 2L -> base(21)), planes)
    // the index dir contains ONLY bucket=N subdirs, no flat parquet files
    val top = new java.io.File(idx).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(top.nonEmpty && top.forall(f =>
      f.isDirectory && f.getName.startsWith("bucket=")))
    assert(NearDupIndex.readIndex(spark, idx).count() == 2)
    // and the exact-fp index reader survives the same layout class
    val idx2 = Files.createTempDirectory("fp-idx-partitioned").toString
    import spark.implicits._
    Seq(("abc", 1L)).toDF("fp", "canonical_id")
      .withColumn("part", lit(0))
      .write.mode("append").partitionBy("part").parquet(idx2)
    assert(DedupIndex.readIndex(spark, idx2).count() == 1)
  }

  test("compact: one file per bucket, identical contents, planes meta " +
      "preserved, and the index keeps rejecting re-crawls afterwards") {
    val idx = Files.createTempDirectory("neardup-compact").toString
    // three appends -> each touched bucket dir accumulates files
    NearDupIndex.admit(spark, idx, df(1L -> base(40), 2L -> base(41)), planes)
    NearDupIndex.admit(spark, idx, df(3L -> base(42)), planes)
    NearDupIndex.admit(spark, idx, df(4L -> base(43)), planes)
    val before = NearDupIndex.readIndex(spark, idx)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sorted
    def filesPerBucket: Map[String, Int] =
      new java.io.File(idx).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPerBucket.nonEmpty)
    NearDupIndex.compact(spark, idx)
    // layout: exactly one parquet file per bucket partition
    val after = filesPerBucket
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction left multi-file buckets: $after")
    // content: bit-identical (vec_id, bucket) set
    val afterRows = NearDupIndex.readIndex(spark, idx)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sorted
    assert(afterRows.toSeq == before.toSeq)
    // the planes contract survived the rewrite: wrong planes still throw
    intercept[IllegalArgumentException] {
      NearDupIndex.admit(spark, idx, df(9L -> base(44)), planes + 1)
    }
    // and the compacted index still rejects a re-crawl of indexed content
    assert(NearDupIndex.admit(spark, idx, df(9L -> base(40)), planes)
      .isEmpty, "re-crawl admitted after compaction")
    // while genuinely new content still gets in
    assert(NearDupIndex.admit(spark, idx, df(10L -> base(99)), planes)
      .count() == 1)
  }

  test("forget: a near-dup of a FORGOTTEN vector re-admits; near-dups " +
      "of survivors stay rejected") {
    import spark.implicits._
    val idx = Files.createTempDirectory("neardup-idx-forget").toString
    val v1 = base(1); val v2 = base(2)
    NearDupIndex.admit(spark, idx, df(1L -> v1, 2L -> v2), planes)
    // sanity: both re-crawls rejected pre-forget
    assert(NearDupIndex.admit(spark, idx,
      df(10L -> near(v1), 11L -> near(v2)), planes).isEmpty)

    NearDupIndex.forget(spark, idx, Seq(1L).toDF("vec_id"))
    assert(NearDupIndex.readIndex(spark, idx).select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(2L))

    // v1's near-dup now admits (fresh canonical); v2's stays rejected
    val r = NearDupIndex.admit(spark, idx,
      df(20L -> near(v1), 21L -> near(v2)), planes)
    assert(r.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(20L))
    // the planes meta survived the forget rewrite (admit above would
    // have thrown on mismatch) and the layout is still bucketed
    assert(NearDupIndex.readIndex(spark, idx).columns.contains("bucket"))
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HyperplaneBucketSpec extends SparkSpec {

  /** The HOF reference form the fused expression replaces (same
    * arithmetic as Dedup.intPlaneDot + sign-bit assembly). */
  private def hofBucket(v: org.apache.spark.sql.Column, planes: Int) =
    (0 until planes).map { p =>
      when(aggregate(
        transform(v, (x, i) =>
          round(x.cast("double") * 1000, 0).cast("long") *
            ((i * 31 + p * 17 + i * (p * 13)) % 97 % 7 - 3).cast("long")),
        lit(0L), (acc, x) => acc + x) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  test("fused codegen bucket equals the HOF composition on real embeddings") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    for (planes <- Seq(4, 6, 9)) {
      val diff = e.select(
          HyperplaneBucket.bucket(col("embedding"), planes).as("fused"),
          hofBucket(col("embedding"), planes).as("hof"))
        .filter(col("fused") =!= col("hof")).count()
      assert(diff == 0, s"fused != HOF at planes=$planes")
    }
  }

  test("handles nulls, ties, and negative quantized values") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(0.0015f, -0.0025f, 0.5f))), // ±half-away ties at *1000
      (2L, Some(Array.fill(8)(0.0f))),            // all-zero -> bucket 0
      (3L, None: Option[Array[Float]])            // null -> null
    ).toDF("id", "v")
    val out = df.select(col("id"),
        HyperplaneBucket.bucket(col("v"), 4).as("b"),
        hofBucket(col("v"), 4).as("h"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) == out(0).getInt(2))
    assert(out(1).getInt(1) == 0)
    assert(out(2).isNullAt(1))
  }

  test("SQL registration: hyperplane_bucket(v, planes) with literal planes") {
    HyperplaneBucket.register(spark)
    graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(5).createOrReplaceTempView("hb_in")
    val viaSql = spark.sql(
      "SELECT vec_id, hyperplane_bucket(embedding, 4) AS b FROM hb_in")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCol = spark.table("hb_in")
      .select(col("vec_id"), HyperplaneBucket.bucket(col("embedding"), 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == viaCol)
    // non-literal planes is an analysis-time error, not a mid-job one
    intercept[Exception] {
      spark.sql("SELECT hyperplane_bucket(embedding, CAST(vec_id AS INT)) FROM hb_in")
        .collect()
    }
  }

  test("the plane family has no effective-plane ceiling: every plane " +
      "past 7 still discriminates (the period-7 regression ScaleProbe " +
      "caught: a mod-7-only family duplicates planes 7+, bucket count " +
      "saturates ~126, and the near-dup candidate join turns quadratic)") {
    // pairwise-distinct coefficient vectors over the real 64-dim width,
    // up to twice the plane count a 100 TB corpus needs
    def coefs(p: Int): Seq[Int] =
      (0 until 64).map(i => (i * 31 + p * 17 + i * p * 13) % 97 % 7 - 3)
    val fam = (0 until 24).map(coefs)
    assert(fam.distinct.size == 24,
      "duplicate hyperplanes in the first 24 planes")
    // ...and the duplication is OBSERVABLE as bucket-count saturation,
    // so guard the measured quantity too: deterministic synthetic
    // vectors (the ScaleProbe generator) at planes=12 must spread far
    // past the 2^7=128-bucket ceiling the periodic family capped at
    val n = 5000L
    val buckets = spark.range(n).select(
        expr("transform(sequence(0, 63), " +
          "j -> cast((hash(id, j) % 1000) / 1000.0 as float))").as("v"))
      .select(HyperplaneBucket.bucket(col("v"), 12).as("b"))
      .distinct().count()
    assert(buckets > 1000,
      s"only $buckets distinct buckets at planes=12 over $n vectors — " +
        "planes beyond 7 are not discriminating")
  }

  test("stays inside WholeStageCodegen (the reason it exists)") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = e.select(
      HyperplaneBucket.bucket(col("embedding"), 6).as("b"))
      .queryExecution.executedPlan
    val stages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("hyperplane_bucket")))
  }
}

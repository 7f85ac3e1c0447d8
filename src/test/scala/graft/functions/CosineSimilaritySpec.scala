package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.CosineSimilarity.cosineSim

class CosineSimilaritySpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical -> 1
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> 0
      (3L, Array(1.0f, 0.0f), Array(-1.0f, 0.0f)),  // opposite -> -1
      (4L, Array(1.0f, 2.0f), Array(2.0f, 4.0f)),   // parallel -> 1
      (5L, Array(0.0f, 0.0f), Array(1.0f, 1.0f)))   // zero norm -> null
      .toDF("id", "a", "b")
  }

  test("interpreted eval matches the mathematical definition") {
    // force interpreted path: eval via collect on a non-codegen context
    val rows = df.select(col("id"), cosineSim(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - 0.0) < 1e-12)
    assert(math.abs(rows(2).getDouble(1) + 1.0) < 1e-12)
    assert(math.abs(rows(3).getDouble(1) - 1.0) < 1e-12)
    assert(rows(4).isNullAt(1))
  }

  test("mismatched lengths yield null, not an exception") {
    import spark.implicits._
    val d = Seq((1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "a", "b")
    val r = d.select(cosineSim(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("SQL registration works and agrees with the column API") {
    CosineSimilarity.register(spark)
    df.createOrReplaceTempView("cos_in")
    val viaSql = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c FROM cos_in ORDER BY id").collect()
    val viaCol = df.select(col("id"), cosineSim(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    for ((s, c) <- viaSql.zip(viaCol)) {
      assert(s.isNullAt(1) == c.isNullAt(1))
      if (!s.isNullAt(1)) assert(s.getDouble(1) == c.getDouble(1))
    }
  }

  test("agrees with the higher-order-function formulation on real data") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val hof = e.select(col("vec_id"),
      (aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as("selfdot"))
    val native = e.select(col("vec_id"),
      cosineSim(col("embedding"), col("embedding")).as("c"))
    // self-cosine is exactly 1 for any nonzero vector
    assert(native.filter(abs(col("c") - 1.0) > 1e-12).count() == 0)
    assert(hof.filter(col("selfdot") <= 0).count() == 0)
  }

  test("expression fuses into WholeStageCodegen (HOF equivalent does not)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val native = e.select(col("vec_id"),
      cosineSim(col("embedding"), reverse(col("embedding"))).as("c"))
    val stages = native.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    // the projection with cosine_sim sits INSIDE a codegen stage
    assert(stages.exists(_.toString.contains("cosine_sim")))

    // bitwise agreement with the higher-order formulation (same fold order)
    val hof = e.select(col("vec_id"),
      (aggregate(zip_with(col("embedding"), reverse(col("embedding")),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)) *
         sqrt(aggregate(transform(reverse(col("embedding")),
           x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x))))
        .as("c_hof"))
    val joined = native.join(hof, "vec_id")
    assert(joined.filter(col("c") =!= col("c_hof")).count() == 0)
    assert(joined.count() == 500)
  }
}

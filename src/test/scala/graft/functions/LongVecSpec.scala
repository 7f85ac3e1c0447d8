package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LongVecSpec extends SparkSpec {

  // deterministic signed vectors, including zeros and an id-varying
  // length mix is NOT included here (mismatch is its own test)
  private def vecs = {
    import spark.implicits._
    (0L until 50L).map { id =>
      (id,
        (0 until 16).map(j => ((id * 37 + j * 13) % 29) - 14L),
        (0 until 16).map(j => ((id * 19 + j * 23) % 31) - 15L))
    }.toDF("id", "a", "b")
  }

  private def declarative = vecs.select(col("id"),
    expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, " +
      "(acc, v) -> acc + v)").as("dot"),
    expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as bigint), (acc, v) -> acc + v)").as("l2"))

  private def native = vecs.select(col("id"),
    LongVec.dot(col("a"), col("b")).as("dot"),
    LongVec.l2(col("a"), col("b")).as("l2"))

  test("long_vec_dot / long_vec_l2 are bit-identical to the declarative " +
      "aggregate(zip_with(...)) forms") {
    val a = native.orderBy("id").collect()
    val b = declarative.orderBy("id").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("kernels survive both codegen and interpreted evaluation") {
    val whole = native.collect().map(_.toString).sorted
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = native.collect().map(_.toString).sorted
      assert(whole.toSeq == interp.toSeq)
    }
  }

  test("length mismatch and null arrays return null (the declarative " +
      "forms' behavior)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L), Seq(3L)),            // length mismatch
      (2L, null.asInstanceOf[Seq[Long]], Seq(3L)) // null array
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      LongVec.dot(col("a"), col("b")).as("dot"),
      LongVec.l2(col("a"), col("b")).as("l2")).collect()
    out.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2))
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

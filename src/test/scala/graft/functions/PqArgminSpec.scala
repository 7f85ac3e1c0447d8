package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqArgminSpec extends SparkSpec {

  // small deterministic grid vectors: 3 subspaces × 2 dims
  private val M = 3
  private val SD = 2

  private def vecs = {
    import spark.implicits._
    (0L until 40L).map { id =>
      id -> (0 until M * SD).map(j => ((id * 31 + j * 17) % 23) - 11L)
    }.toDF("vec_id", "qa")
  }

  // a codebook with unequal per-sub cell counts and a non-contiguous id
  // (cell 7) — the post-update shape where empty cells dropped out
  private val codebook: Seq[(Int, Int, Seq[Long])] = Seq(
    (0, 0, Seq(-5L, 3L)), (0, 1, Seq(4L, -2L)), (0, 7, Seq(0L, 0L)),
    (1, 0, Seq(1L, 1L)), (1, 2, Seq(-9L, 8L)),
    (2, 0, Seq(2L, -7L)), (2, 1, Seq(2L, -7L)), (2, 3, Seq(10L, 10L)))

  /** The declarative HOF form pq_argmin replaced — the differential
    * oracle: identical integer algebra, (d2, cell) tie-break via
    * array_min over the struct. */
  private def declarative = {
    val bySub: Seq[Seq[(Int, Seq[Long])]] = (0 until M).map(m =>
      codebook.collect { case (`m`, cell, cs) => (cell, cs) })
    vecs.withColumn("__cents", typedLit(bySub))
      .withColumn("ba", expr(
        s"""transform(sequence(0, ${M - 1}), m ->
          |  array_min(transform(element_at(__cents, m + 1), c ->
          |    named_struct(
          |      'd2', aggregate(zip_with(slice(qa, m * $SD + 1, $SD),
          |              c._2, (a, b) -> (a - b) * (a - b)),
          |            cast(0 as bigint), (acc, x) -> acc + x),
          |      'cell', c._1))))""".stripMargin))
      .select(col("vec_id"), col("ba"))
  }

  private def native = vecs
    .select(col("vec_id"), PqArgmin.argmin(col("qa"), codebook, M, SD).as("ba"))

  test("pq_argmin is bit-identical to the declarative HOF form, " +
      "including the (d2, cell) tie-break and dropped-cell gaps") {
    val a = native.orderBy("vec_id").collect()
    val b = declarative.orderBy("vec_id").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
    // sub 2 has two identical centroids (cells 0 and 1): the tie must
    // always resolve to cell 0
    a.foreach { r =>
      val sub2 = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ba")(2)
      assert(sub2.getAs[Int]("cell") != 1,
        "tie between identical centroids must resolve to the smaller cell id")
    }
  }

  test("pq_argmin survives both codegen and interpreted evaluation") {
    val whole = native.collect().map(_.toString).sorted
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = native.collect().map(_.toString).sorted
      assert(whole.toSeq == interp.toSeq)
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

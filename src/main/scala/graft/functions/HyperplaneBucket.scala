package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the integer-hyperplane LSH bucket of an
  * ArrayType(FloatType) embedding — the bucketing hot path of the
  * embedding near-dup operator (graft.ext.Dedup q55).
  *
  * Semantics are EXACTLY the composed form it replaces (and the DuckDB
  * oracle mirrors): per plane p < planes,
  *
  *   dot_p = Σ_i round(x_i · 1000) · ((((i·31 + p·17 + i·p·13) % 97) % 7) − 3)
  *
  * The i·p·13 cross-term and the two-modulus reduction matter: a family
  * that is any polynomial of (i, p) reduced straight mod 7 has period 7
  * in p (adding 7 to p shifts every term by a multiple of 7), so planes
  * 7+ would DUPLICATE planes 0+ — lshPlanes' one-plane-per-corpus-
  * doubling stops cutting bucket occupancy exactly when the corpus gets
  * large, and the near-dup candidate join turns quadratic (measured by
  * tools.ScaleProbe before this family replaced the original mod-7-only
  * one: candidate pairs grew at exponent 1.7, matching a ceiling of 7
  * effective planes). Routing through mod 97 first gives the family
  * period 97·7 in p — far past the 30-plane cap — at ≤7% residue bias.
  *
  * with `round` half-away-from-zero to a long (Spark's round(_, 0) —
  * BigDecimal HALF_UP — and DuckDB's round agree there), and
  * bucket = Σ_p (dot_p > 0 ? 2^p : 0).
  *
  * The composed HOF version runs `planes` CodegenFallback
  * transform+aggregate passes per row, each allocating an intermediate
  * array and lambda frames, and breaks WholeStageCodegen around the join
  * input. This is one fused allocation-free loop with real codegen —
  * the same argument as [[CosineSimilarity]], measured on the same scan
  * throughput path. */
case class HyperplaneBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= planes <= 30, got $planes")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  /** Spark round(d, 0): BigDecimal HALF_UP = half away from zero. */
  @inline private def q(d: Double): Long =
    (if (d >= 0) math.floor(d + 0.5d) else math.ceil(d - 0.5d)).toLong

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0L
      var i = 0
      while (i < n) {
        dot += q(x.getFloat(i).toDouble * 1000d) *
          ((i * 31 + p * 17 + i * p * 13) % 97 % 7 - 3).toLong
        i += 1
      }
      if (dot > 0L) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = $x.numElements();
         |int $bucket = 0;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = ((double) $x.getFloat($i)) * 1000d;
         |    $dot += (long) ($d >= 0 ? Math.floor($d + 0.5d)
         |                            : Math.ceil($d - 0.5d))
         |            * (long) (($i * 31 + $p * 17 + $i * $p * 13) % 97 % 7 - 3);
         |  }
         |  if ($dot > 0L) $bucket |= 1 << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Column-API entry point: hyperplane_bucket(v, planes). */
  def bucket(v: Column, planes: Int): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(v), planes))

  /** SQL registration: SELECT hyperplane_bucket(v, 6) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_bucket",
      { exprs => HyperplaneBucket(exprs.head,
          graft.GraftExtensions.intLiteral(exprs(1))) },
      "built-in")
}

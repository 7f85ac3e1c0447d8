package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StructField, StructType}

/** Native Catalyst expression for the product-quantization assignment —
  * the hot loop of the PQ trainer (graft.ext.Similarity q89/q90/q93/q94):
  * for each of M subspaces, the argmin over that subspace's K centroids
  * of the BIGINT squared-L2 distance to the row's grid vector, ties
  * broken by the smaller cell id (the oracle's ORDER BY d2, cell).
  *
  * The declarative form — transform(sequence(0,M-1), m ->
  * array_min(transform(cells, c -> struct(aggregate(zip_with(...)))))) —
  * is semantically identical but runs on Spark's interpreted
  * higher-order-function path: M·K lambda frames and M·K zip_with
  * allocations PER ROW, which at production PQ sizing (M=32, K=256 →
  * 8192 lambda evals/row) measured ~15–20 s/query at sf0.1 — pure
  * interpretation overhead on ~30M multiplies that a JVM loop does in
  * milliseconds. This expression is that loop: the codebook is plain
  * primitive arrays on the expression object, eval walks them with zero
  * per-cell allocation, and doGenCode stays inside WholeStageCodegen by
  * delegating to [[compute]] via a reference object.
  *
  * Output: array<struct<d2: bigint, cell: int>> indexed by subspace —
  * bit-identical to the declarative form (same integer algebra, same
  * tie-break), which is what keeps the PQ operators under the DuckDB
  * oracle gate with either implementation.
  *
  * PRECONDITIONS (bit-identity holds only inside them): the child array
  * must be non-null-ELEMENT (a null element NPEs `toLongArray`, where
  * the declarative form would propagate null through the arithmetic),
  * and every subspace must retain at least one live cell (an empty
  * `cells(s)` emits a (Long.MaxValue, Int.MaxValue) sentinel where
  * `array_min` over an empty array yields NULL). Both are guaranteed by
  * the trainer that owns this expression: `qa` is built from round()
  * over non-null embeddings, and a Lloyd update only ever DROPS empty
  * cells from a seed of K live ones, never all K. A new caller must
  * establish the same or accept undefined edges.
  *
  * @param child   array<bigint> grid vector (round(x·1000) longs)
  * @param cells   per-sub live cell ids (empty cells dropped by a Lloyd
  *                update round simply don't appear)
  * @param coords  per-sub flat centroid grid coords, K_m × subdim longs
  * @param subdim  dims per subspace (child length must be M · subdim)
  */
case class PqArgmin(child: Expression, cells: Seq[Seq[Int]],
    coords: Seq[Seq[Long]], subdim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("cell", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_argmin"

  // primitive mirrors of the codebook, built once per (de)serialized
  // instance — eval touches only these, never the Seq wrappers
  @transient private lazy val cellArr: Array[Array[Int]] =
    cells.map(_.toArray).toArray
  @transient private lazy val coordArr: Array[Array[Long]] =
    coords.map(_.toArray).toArray

  /** The fused assignment loop; shared by eval and generated code. */
  def compute(qaData: ArrayData): ArrayData = {
    val qa = qaData.toLongArray()
    val m = cellArr.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val ids = cellArr(s)
      val cs = coordArr(s)
      val base = s * subdim
      var bestD2 = Long.MaxValue
      var bestCell = Int.MaxValue
      var k = 0
      while (k < ids.length) {
        var d2 = 0L
        var j = 0
        val off = k * subdim
        while (j < subdim) {
          val d = qa(base + j) - cs(off + j)
          d2 += d * d
          j += 1
        }
        if (d2 < bestD2 || (d2 == bestD2 && ids(k) < bestCell)) {
          bestD2 = d2
          bestCell = ids(k)
        }
        k += 1
      }
      out(s) = InternalRow(bestD2, bestCell)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqArgmin", this, classOf[PqArgmin].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqArgmin {
  /** Column-API entry point over the trainer's flat codebook shape. */
  def argmin(qa: Column, codebook: Seq[(Int, Int, Seq[Long])], m: Int,
      subdim: Int): Column = {
    val bySub = (0 until m).map(s =>
      codebook.collect { case (`s`, cell, _) => cell })
    val coords = (0 until m).map(s =>
      codebook.collect { case (`s`, _, cs) => cs }.flatten)
    Bridge.column(PqArgmin(Bridge.expression(qa), bySub, coords, subdim))
  }
}

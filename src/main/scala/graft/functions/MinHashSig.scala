package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the MinHash signature — the hot loop
  * of the incremental text near-dup family (TextNearDupIndex / q88 and
  * its streaming twin): the `numHashes` deterministic minhashes of a
  * document's DISTINCT space-split tokens, hash i of token w being the
  * leading 60 bits of md5("i:w") — the engine-portable md5-slice BIGINT
  * that DuckDB recomputes with a 0x cast (the discipline that put the
  * whole admission sequence under the driver's hash-exact oracle gate).
  *
  * The declarative form this replaces —
  * transform(sequence(0,15), i -> array_min(transform(
  *   array_distinct(split(text,' ')), w -> conv(substr(md5(...)...)))))
  * — runs on Spark's interpreted higher-order-function path AND
  * re-tokenizes the document inside every outer lambda frame: 16 ×
  * (split + array_distinct + |tokens| lambda eval + md5-hex +
  * string-conv) per row. This expression tokenizes ONCE, dedupes with a
  * hash set, reuses one MessageDigest across all hashes, and reads the
  * 60-bit value straight off the digest bytes — no hex round-trip. The
  * output is bit-identical (MinHashSigSpec pins it differentially under
  * codegen AND interpreted eval, fixture corpus included).
  *
  * Semantics pinned to the declarative form:
  *  - tokenization is `split(text, ' ')` with Spark's limit=-1 regex
  *    semantics (trailing empty strings KEPT; "" yields the single
  *    token "") — java's String.split(" ", -1) is the same function;
  *  - the token SET is hashed (first occurrence wins, order
  *    irrelevant under min);
  *  - hash value = conv(substring(md5hex, 1, 15), 16, 10): the first
  *    15 hex digits = the first 8 digest bytes read big-endian,
  *    shifted right 4 — always non-negative (< 2^60);
  *  - a null document is null (nullSafeEval), and the token set is
  *    never empty (splitting "" gives [""]), so every slot holds a
  *    real minimum.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  /** The fused signature loop; shared by eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[String](toks.length * 2)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      if (seen.add(w)) {
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(Integer.toString(i).getBytes(StandardCharsets.US_ASCII))
          md.update(':'.toByte)
          md.update(w.getBytes(StandardCharsets.UTF_8))
          val d = md.digest()
          var v = 0L
          var j = 0
          while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
          v = v >>> 4 // first 15 hex digits = top 60 bits, non-negative
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point: the `numHashes`-value minhash signature of
    * a text column's distinct space-split tokens. */
  def sig(text: Column, numHashes: Int = 16): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), numHashes))
}

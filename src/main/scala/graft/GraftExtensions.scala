package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** Session-extension entry point: registers the engine's native
  * expressions into every session built with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * so `SELECT cosine_sim(a, b)` works in plain SQL on a cluster without
  * any driver-side registration call. (The per-session alternative is
  * CosineSimilarity.register(spark).)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))))
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md "optimize for scale"): two-stage
  * salted aggregation — when one group key dominates (a hot returnflag, a
  * celebrity user), a plain groupBy funnels the hot key into a single
  * reducer. Salting splits each key into `salts` sub-keys for the partial
  * stage, then combines partials in a second (tiny) aggregation. AQE's
  * skew-join handling covers joins; this covers aggregations whose
  * partial/final split Spark can't rebalance by itself when the combiner
  * state per key is large.
  */
object Skew {

  /** Two-stage salted sum/count aggregation:
    * stage 1 groups by (key, hash(saltCol) % salts) — hot keys fan out
    * across `salts` reducers; stage 2 groups the ≤ |keys|·salts partials
    * by key alone. Result is exactly groupBy(key).agg(sum, count). */
  def saltedSumCount(df: DataFrame, key: Column, saltSource: Column,
      value: Column, salts: Int): DataFrame =
    df.groupBy(key.as("k"), (abs(hash(saltSource)) % salts).as("salt"))
      .agg(sum(value).as("psum"), count("*").as("pcnt"))
      .groupBy("k")
      .agg(sum("psum").as("total"), sum("pcnt").as("cnt"))
}

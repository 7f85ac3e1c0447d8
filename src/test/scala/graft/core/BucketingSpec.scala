package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Co-located joins via bucketing (SURVEY.md "partitioning & shuffle"):
  * pre-bucketing both fact tables on the join key removes the per-query
  * shuffle entirely — at 100 TB this converts every orders⋈lineitem from
  * two full-data shuffles into a zero-movement zip of bucket files.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // disable broadcast so the join strategy is the co-located SMJ,
    // which is what a 100 TB fact-fact join would use
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing makes both sides already-partitioned on the join key:
      // the only exchange left is the one for the final small groupBy
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(exchanges == 1, s"expected only the agg exchange, plan:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 5)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scan-efficiency guards — the read-side siblings of PlanGuardSpec's
  * join bans: a predicate on a fixture column must reach the parquet
  * scan as a PushedFilter (row-group statistics can skip data), and a
  * narrow projection must shrink ReadSchema to exactly the referenced
  * columns (a 100 TB scan that deserializes unused columns is wrong
  * even when the answer is right). String-matched against the executed
  * plan, so a future change that silently breaks pushdown — a
  * normalization cast on the filter column, an opaque UDF wrapper —
  * fails here instead of surfacing as a 100× slowdown at scale. */
class ScanPruningSpec extends SparkSpec {

  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.001")

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a column predicate reaches the parquet scan as a PushedFilter") {
    val plan = planOf(
      Tables(spark, dir, "documents").filter(col("lang") === "en"))
    assert(plan.contains("PushedFilters:"), s"no pushdown section:\n$plan")
    assert(plan.contains("EqualTo(lang,en)"),
      s"lang predicate not pushed:\n$plan")
  }

  test("a narrow projection prunes ReadSchema to the referenced columns") {
    val plan = planOf(
      Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity"))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity"), s"projection lost: $readSchema")
    assert(!readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_shipdate"),
      s"unused columns still read: $readSchema")
  }

  test("the ts normalization does not block pushdown on OTHER event " +
      "columns") {
    // normalizeTs rewrites `ts`; predicates on untouched columns must
    // still reach the scan (the cast lives above the scan node)
    val plan = planOf(
      Tables(spark, dir, "events").filter(col("event_type") === "click"))
    assert(plan.contains("EqualTo(event_type,click)"),
      s"event_type predicate not pushed past the ts normalization:\n$plan")
  }

  test("a registry query's scan carries its predicate: q03's l_discount " +
      "filter reaches the lineitem scan") {
    val df = SparkEntry.queries("q03_filter_group_avg")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("GreaterThan(l_discount,0.02)"),
      s"q03's l_discount predicate not at the scan:\n$plan")
  }
}

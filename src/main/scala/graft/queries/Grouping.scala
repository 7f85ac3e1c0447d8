package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Multi-dimensional aggregation surface (SURVEY.md §2.5): rollup, cube,
  * grouping sets, exact + approximate distinct. Spark expands these into a
  * single Expand + HashAggregate — one shuffle regardless of the number of
  * grouping sets. NULL group labels sort NULLS FIRST explicitly in both
  * engines (Spark's default, not DuckDB's).
  */
object Grouping {

  private val q16Rollup = QueryDef(
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count("*").as("n_customers"),
          round(sum("c_acctbal"), 2).as("sum_acctbal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },
    """SELECT r_name, n_name, count(*) AS n_customers,
      |       round(sum(c_acctbal), 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")

  private val q17Cube = QueryDef(
    (s, dir) =>
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count("*").as("n_orders"),
          round(sum("o_totalprice"), 4).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority")),
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |       round(sum(o_totalprice), 4) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")

  /** GROUPING SETS with grouping_id to disambiguate the sets. */
  private val q18GroupingSets = QueryDef(
    (s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          |       count(*) AS n_orders
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
          |""".stripMargin)
    },
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")

  /** Exact multi-distinct per group — Spark plans one Expand + two-phase
    * aggregate; at scale the count-distinct shuffle keys on
    * (group, distinct value) so hot groups don't bottleneck one task. */
  private val q19Distinct = QueryDef(
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count("*").as("n_rows"))
        .orderBy("l_returnflag"),
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** HLL++ approximate distinct — constant memory per group at any scale.
    * Sketch REGISTER CONTENTS are engine-private (DuckDB's HLL differs
    * from Spark's), so the raw estimate can't be hash-matched — but the
    * CLAIM can: emit the exact distinct count (both engines agree) plus a
    * BIGINT acceptance bit asserting the HLL estimate landed within 5% of
    * it (rsd=0.02, so 5% is 2.5 sigma; Spark's HLL is a deterministic
    * function of the fixture, making the bit stable across runs). The
    * oracle recomputes the exact side and asserts the bit literally —
    * if sketch accuracy ever drifts past the bound, the hash fails.
    * Same discipline as q94/q109's recall acceptance rows; converts the
    * build's last rows-only query into a full oracle. */
  private val q20ApproxDistinct = QueryDef(
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_exact"),
          approx_count_distinct("l_partkey", 0.02).as("approx"),
          count(lit(1)).as("n_rows"))
        .withColumn("within_5pct",
          when(abs(col("approx") - col("n_exact")).cast("double")
            <= col("n_exact").cast("double") * lit(0.05e0), 1L)
            .otherwise(0L))
        .select("l_returnflag", "n_exact", "n_rows", "within_5pct")
        .orderBy("l_returnflag"),
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_exact,
      |       count(*) AS n_rows,
      |       CAST(1 AS BIGINT) AS within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  val defs: Map[String, QueryDef] = Map(
    "q16_rollup" -> q16Rollup,
    "q17_cube" -> q17Cube,
    "q18_grouping_sets" -> q18GroupingSets,
    "q19_multi_distinct" -> q19Distinct,
    "q20_approx_distinct" -> q20ApproxDistinct,
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Core relational surface.
  *
  * q01–q03 generalize the reference's declared downstream analytics
  * (reference README.md:295-311 — global top-k, group-by count, filtered
  * group-by avg) onto the star schema; the rest is the join inventory of
  * SURVEY.md §2.5 (broadcast/shuffle equi-joins, semi/anti, theta/range,
  * as-of), each expressed so Catalyst picks the scalable physical plan.
  *
  * Float discipline (SURVEY.md §7.4): raw column values pass through
  * un-rounded (bit-identical parquet doubles in both engines); any
  * aggregate of doubles is rounded to 2 decimals — source values carry 2
  * decimals, so the true aggregate sits far from the rounding boundary and
  * both engines agree regardless of summation order.
  */
object Relational {

  /** Global top-k → Catalyst TakeOrderedAndProject: each partition keeps a
    * local k-heap, only k rows per partition reach the driver — no global
    * sort at 100 TB. (Reference README.md:295-300.) */
  private val q01Topk = QueryDef(
    (s, dir) =>
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10),
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")

  /** Group-by count → partial+final HashAggregate, map-side combine keeps
    * shuffle traffic at |distinct keys|. (Reference README.md:302-305.) */
  private val q02GroupCount = QueryDef(
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(count("*").as("cnt"))
        .orderBy("event_type"),
    """SELECT event_type, count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""")

  /** Filtered group-avg; the filter is pushed to the parquet scan.
    * (Reference README.md:307-311.) */
  private val q03FilterGroupAvg = QueryDef(
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_discount") > 0.02)
        .groupBy("l_returnflag")
        .agg(
          round(avg("l_extendedprice"), 2).as("avg_price"),
          count("*").as("cnt"))
        .orderBy("l_returnflag"),
    """SELECT l_returnflag, round(avg(l_extendedprice), 2) AS avg_price,
      |       count(*) AS cnt
      |FROM lineitem WHERE l_discount > 0.02
      |GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** TPC-H Q1-style wide aggregation — one shuffle on the tiny group key,
    * everything else map-side partial agg inside WholeStageCodegen. */
  private val q04AggLineitem = QueryDef(
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count("*").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2)      AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 2)      AS avg_qty,
      |       round(avg(l_discount), 4)      AS avg_disc,
      |       count(*)                       AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""")

  /** Star join through two broadcast dims: customer ⋈ nation ⋈ region.
    * nation/region are O(10) rows at any SF — broadcast hints keep this a
    * single scan of the fact side with zero shuffle for the joins. */
  private val q05JoinBroadcast = QueryDef(
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count("*").as("n_customers"),
          round(sum("c_acctbal"), 2).as("sum_acctbal"))
        .orderBy("r_name")
    },
    """SELECT r_name, count(*) AS n_customers,
      |       round(sum(c_acctbal), 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""")

  /** Fact-to-fact equi-join (orders ⋈ lineitem) — shuffle join on the key;
    * at scale both sides hash-partition on orderkey, AQE handles skew. */
  private val q06JoinLarge = QueryDef(
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count("*").as("n_items"))
        .orderBy("o_orderpriority")
    },
    """SELECT o_orderpriority,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       count(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** Left-semi join (EXISTS): customers with at least one big order.
    * Semi-join only ships the join key of the right side — no row
    * multiplication, dedup happens inside the join operator. */
  private val q07SemiJoin = QueryDef(
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""")

  /** Left-anti join (NOT EXISTS): customers with no big order. */
  private val q08AntiJoin = QueryDef(
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    },
    """SELECT c_custkey, c_nationkey FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""")

  /** Range (theta) join: purchases within 1 hour after each signup, per
    * user. The equi part (user_id) still hash-partitions — the range
    * predicate is evaluated inside the join, so this stays a shuffled
    * hash/sort-merge join, not a cartesian product. */
  private val q09RangeJoin = QueryDef(
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val sgn = e.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts").as("signup_ts"))
      val pur = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      sgn.join(pur,
          col("user_id") === col("p_user_id") &&
            col("p_ts") > col("signup_ts") &&
            col("p_ts") <= col("signup_ts") + expr("INTERVAL 1 HOUR"),
          "left")
        .groupBy("signup_id")
        .agg(
          count("p_event_id").as("n_purchases"),
          round(sum("p_value"), 2).as("purchase_total"))
        .orderBy("signup_id")
    },
    """SELECT s.event_id AS signup_id,
      |       count(p.event_id) AS n_purchases,
      |       round(sum(p.value), 2) AS purchase_total
      |FROM (SELECT * FROM events WHERE event_type = 'signup') s
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = s.user_id
      | AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
      |GROUP BY s.event_id ORDER BY s.event_id""")

  /** As-of join, Spark-first: instead of a per-row correlated lookup
    * (O(n·m)), tag both sides, union, and take the last preceding right-side
    * row per key with one window pass — one shuffle on user_id, sorted once.
    * For each purchase: the value of the latest view at-or-before it. */
  private val q10AsofJoin = QueryDef(
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val pur = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(null).cast("double").as("view_value"), lit(1).as("is_left"))
      val vw = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("view_value"), lit(0).as("is_left"))
      // At equal ts a view (is_left=0) sorts before the purchase, so it is
      // visible to it; ties among views resolve to the highest event_id.
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_left"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pur.unionByName(vw)
        .withColumn("last_view_value",
          last("view_value", ignoreNulls = true).over(w))
        .filter(col("is_left") === 1)
        .select(col("event_id"), col("last_view_value"))
        .orderBy("event_id")
    },
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |     v AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'view'),
      |     j AS (SELECT p.event_id, v.value,
      |                  row_number() OVER (PARTITION BY p.event_id
      |                    ORDER BY v.ts DESC, v.event_id DESC) AS rn
      |           FROM p LEFT JOIN v
      |             ON v.user_id = p.user_id AND v.ts <= p.ts)
      |SELECT event_id, value AS last_view_value
      |FROM j WHERE rn = 1 ORDER BY event_id""")

  /** Set operators over two customer segments. */
  private val q11SetOps = QueryDef(
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val a = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      val b = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      a.intersect(b).withColumn("op", lit("intersect"))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .unionByName(a.union(b).distinct().withColumn("op", lit("union")))
        .select("op", "c_custkey")
        .orderBy("op", "c_custkey")
    },
    """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
      |     b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT 'intersect' AS op, c_custkey FROM (FROM a INTERSECT FROM b)
      |UNION ALL
      |SELECT 'except' AS op, c_custkey FROM (FROM a EXCEPT FROM b)
      |UNION ALL
      |SELECT 'union' AS op, c_custkey FROM (FROM a UNION FROM b)
      |ORDER BY op, c_custkey""")

  val defs: Map[String, QueryDef] = Map(
    "q01_topk" -> q01Topk,
    "q02_group_count" -> q02GroupCount,
    "q03_filter_group_avg" -> q03FilterGroupAvg,
    "q04_agg_lineitem" -> q04AggLineitem,
    "q05_join_broadcast" -> q05JoinBroadcast,
    "q06_join_large" -> q06JoinLarge,
    "q07_semi_join" -> q07SemiJoin,
    "q08_anti_join" -> q08AntiJoin,
    "q09_range_join" -> q09RangeJoin,
    "q10_asof_join" -> q10AsofJoin,
    "q11_set_ops" -> q11SetOps,
  )
}

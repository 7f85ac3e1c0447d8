package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Window-function surface (SURVEY.md §2.5): ranking, analytic lag/lead,
  * running/sliding frames. Each window is partitioned on a real key so the
  * sort happens per-partition after one hash shuffle — never a single
  * global sort. Orderings always carry a unique tiebreaker so both engines
  * see the same frame contents.
  */
object Windows {

  /** Top-3 orders per customer: row_number over (custkey | price desc).
    * The generalized form of the reference's global top-k (README.md:295). */
  private val q12Rank = QueryDef(
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rk").cast("long").as("rk"))
        .orderBy("o_custkey", "rk")
    },
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3
      |ORDER BY o_custkey, rk""")

  /** lag/lead analytics per user over the event stream. Raw values pass
    * through unrounded; the delta of two 2-decimal doubles is rounded. */
  private val q13LagLead = QueryDef(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"))
        .withColumn("delta", round(col("value") - col("prev_value"), 2))
        .orderBy("event_id")
    },
    """SELECT event_id, user_id, value,
      |       lag(value)  OVER w AS prev_value,
      |       lead(value) OVER w AS next_value,
      |       round(value - lag(value) OVER w, 2) AS delta
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""")

  /** Running total + 3-row moving average per customer — explicit ROWS
    * frames. */
  private val q14Frames = QueryDef(
    (s, dir) => {
      val base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = base.rowsBetween(-2, Window.currentRow)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(run), 4).as("running_total"),
          round(avg("o_totalprice").over(mov), 4).as("moving_avg3"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
      |       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
      |FROM orders ORDER BY o_custkey, o_orderkey""")

  /** rank/dense_rank/percent_rank + ntile over a global ordering of a
    * small aggregated set (5 regions) — exercises the rank family where a
    * driver-side sort is fine because the input is already tiny. */
  private val q15RankFamily = QueryDef(
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val agg = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum("c_acctbal"), 2).as("bal"))
      val w = Window.orderBy(desc("bal"), asc("n_name"))
      agg.select(col("n_name"), col("bal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("rnk", "n_name")
    },
    """WITH agg AS (
      |  SELECT n_name, round(sum(c_acctbal), 2) AS bal
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, bal,
      |       rank()         OVER w AS rnk,
      |       dense_rank()   OVER w AS drnk,
      |       round(percent_rank() OVER w, 6) AS prnk,
      |       ntile(4)       OVER w AS quartile
      |FROM agg WINDOW w AS (ORDER BY bal DESC, n_name)
      |ORDER BY rnk, n_name""")

  val defs: Map[String, QueryDef] = Map(
    "q12_window_rank" -> q12Rank,
    "q13_window_lag_lead" -> q13LagLead,
    "q14_window_frames" -> q14Frames,
    "q15_rank_family" -> q15RankFamily,
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Event-time windowing in batch form (SURVEY.md §2.5 streaming rows):
  * tumbling / sliding / session windows over events.ts. The same
  * `window()` / sessionization expressions run unchanged under Structured
  * Streaming (graft.streaming wires them with watermarks); running them in
  * batch is what makes them oracle-checkable.
  *
  * Window starts are emitted as epoch seconds (BIGINT) — DuckDB's
  * date_trunc returns DATE for month-level and its naive timestamps would
  * otherwise make type parity fragile.
  */
object TimeWindows {

  /** 1-hour tumbling window: Spark `window(ts, "1 hour")` aligns to the
    * epoch, identical to floor(epoch/3600). One hash shuffle on the
    * bucket — the streaming twin aggregates incrementally with state. */
  private val q27Tumbling = QueryDef(
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count("*").as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select(unix_timestamp(col("window.start")).as("bucket_start"),
          col("n_events"), col("total_value"))
        .orderBy("bucket_start"),
    """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
      |       count(*) AS n_events,
      |       round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1 ORDER BY 1""")

  /** 1-hour window sliding every 30 min: each event lands in exactly two
    * buckets. The oracle expands the two bucket starts explicitly. */
  private val q28Sliding = QueryDef(
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count("*").as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select(unix_timestamp(col("window.start")).as("bucket_start"),
          col("n_events"), col("total_value"))
        .orderBy("bucket_start"),
    """WITH expanded AS (
      |  SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS bucket_start,
      |         value
      |  FROM events
      |  UNION ALL
      |  SELECT CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT), value
      |  FROM events)
      |SELECT bucket_start, count(*) AS n_events,
      |       round(sum(value), 2) AS total_value
      |FROM expanded GROUP BY bucket_start ORDER BY bucket_start""")

  /** Session windows with a 30-minute gap, per user — the scalable batch
    * sessionization: flag gap-starts with lag(), running-sum the flags into
    * session ids, aggregate. One shuffle on user_id; no driver loops. The
    * streaming twin is session_window()/flatMapGroupsWithState. */
  private val q29Session = QueryDef(
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("new_session",
          when(col("ts").cast("long") -
            lag(col("ts"), 1).over(byUser).cast("long") > 1800, 1)
            .when(lag(col("ts"), 1).over(byUser).isNull, 1)
            .otherwise(0))
        .withColumn("session_id", sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(count("*").as("n_events"),
          unix_timestamp(min("ts")).as("session_start"),
          unix_timestamp(max("ts")).as("session_end"),
          round(sum("value"), 2).as("session_value"))
        .orderBy("user_id", "session_id")
    },
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
      |              WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
      |       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
      |       round(sum(value), 2) AS session_value
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""")

  val defs: Map[String, QueryDef] = Map(
    "q27_tumbling_window" -> q27Tumbling,
    "q28_sliding_window" -> q28Sliding,
    "q29_session_window" -> q29Session,
  )
}

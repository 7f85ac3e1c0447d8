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
    (s, dir) =>
      graft.core.Skew.sessionize(Tables(s, dir, "events"), gapSec = 1800L)
        .orderBy("user_id", "session_id"),
    sessionOracleSql)

  /** The plain-sessionization DuckDB restatement — shared by q29 and
    * q124: the chunked rewrite's whole contract is that it equals the
    * PLAIN sessionization (the q49/q83 salting discipline — the
    * mitigation must be result-invisible, so the oracle IS the
    * unrewritten form). */
  private def sessionOracleSql =
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
      |ORDER BY user_id, session_id""".stripMargin

  /** CHUNKED sessionization (graft.core.Skew.chunkedSessionize) — the
    * hot-user mitigation q29's single per-user window cannot offer: a
    * 100 TB event log's heaviest user runs their whole timeline through
    * ONE window task in q29; the chunked form sessionizes per
    * (user, 1-hour chunk) in parallel and merges boundary-crossing
    * sessions with a second, summary-sized pass. The oracle is the
    * PLAIN q29 SQL — the rewrite must be result-identical (same
    * discipline as q49/q83/q86: the oracle is the unrewritten form);
    * with a 30-min gap and 1-hour chunks the fixture forces real
    * boundary merges, and SkewSpec proves row-level equality against
    * q29's own output plus the multi-chunk-span cascade on synthetic
    * hot-user data. */
  private val q124ChunkedSession = QueryDef(
    (s, dir) =>
      graft.core.Skew.chunkedSessionize(
          Tables(s, dir, "events"), gapSec = 1800L, chunkSec = 3600L)
        .orderBy("user_id", "session_id"),
    sessionOracleSql)

  /** HYBRID chunked sessionization (Skew.hybridChunkedSessionize) —
    * q124's production refinement, the q86 discipline applied to
    * sessionization: a per-user histogram picks the actually-hot users
    * (above the MEAN events-per-user, data-derived so both paths carry
    * real rows at every scale factor); only they pay the two-pass
    * chunked route, the cold majority takes q29's single window, and
    * the union must be RESULT-IDENTICAL — the oracle is again the plain
    * q29 SQL. The threshold scan is one map-side-combinable count
    * aggregation collected as a single driver row.
    *
    * A mean-derived threshold is NOT a broadcast bound (up to every
    * distinct user can sit above the mean), so the broadcast hot list
    * is bounded by the explicit top-N cap instead: at most maxHotKeys
    * of the HOTTEST users take the chunked path, everyone else falls to
    * the cold path — result-identical for any split, and the 100 TB
    * bot-account scenario this query exists for is precisely the one
    * where the heaviest handful of users is what matters. */
  private val q125HybridSession = QueryDef(
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val r = ev.agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("u")).first()
      val meanPerUser = r.getLong(0) / math.max(r.getLong(1), 1L)
      graft.core.Skew.hybridChunkedSessionize(ev, gapSec = 1800L,
          chunkSec = 3600L, hotThreshold = meanPerUser,
          maxHotKeys = 4096)
        .orderBy("user_id", "session_id")
    },
    sessionOracleSql)

  /** Click→purchase ATTRIBUTION — the event-correlation op behind every
    * conversion metric: each purchase attributes to the user's MOST
    * RECENT click no older than 3 days. Implemented as the house as-of
    * shape (union + window over one user-keyed shuffle, README's rule)
    * rather than an interval join: `last(click, ignoreNulls)` over the
    * rows-preceding frame picks the nearest click strictly earlier in
    * (ts, event_id) composite order — deterministic even on equal
    * microsecond timestamps — and the 3-day bound filters after the
    * pick (any older click is further away, so the most-recent is the
    * only candidate). An interval join fans out per (purchase × click-
    * in-window) pair before deduplicating; the window form touches each
    * event once. The streaming twin (`EventsStream.attributionPairs`)
    * is the real watermarked stream-stream interval join — bounded
    * state is the thing batch cannot show, candidate pairs are the
    * thing streaming append mode cannot prune. */
  private val q117Attribution = QueryDef(
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select("event_id", "ts", "user_id", "event_type")
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val isClick = col("event_type") === "click"
      ev
        .withColumn("click_id",
          last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(isClick, col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" &&
          col("click_ts").isNotNull)
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(col("click_ts")))
        .filter(col("gap_us") <= 259200000000L) // 3 days in microseconds
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("click_id"), col("click_ts"),
          col("gap_us"))
        .orderBy("purchase_id")
    },
    """WITH e AS (SELECT event_id, ts, user_id, event_type FROM events
      |           WHERE event_type IN ('click', 'purchase')),
      |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      |      FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
      |      FROM e WHERE event_type = 'click'),
      |j AS (SELECT p.purchase_id, p.user_id, p.purchase_ts,
      |        c.click_id, c.click_ts,
      |        row_number() OVER (PARTITION BY p.purchase_id
      |          ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
      |      FROM p JOIN c ON p.user_id = c.user_id
      |        AND (c.click_ts < p.purchase_ts OR
      |             (c.click_ts = p.purchase_ts AND
      |              c.click_id < p.purchase_id))
      |        AND epoch_us(p.purchase_ts) - epoch_us(c.click_ts)
      |              <= 259200000000)
      |SELECT purchase_id, user_id, purchase_ts, click_id, click_ts,
      |       CAST(epoch_us(purchase_ts) - epoch_us(click_ts) AS BIGINT)
      |         AS gap_us
      |FROM j WHERE rn = 1 ORDER BY purchase_id""")

  val defs: Map[String, QueryDef] = Map(
    "q117_attribution" -> q117Attribution,
    "q27_tumbling_window" -> q27Tumbling,
    "q28_sliding_window" -> q28Sliding,
    "q29_session_window" -> q29Session,
    "q124_chunked_session" -> q124ChunkedSession,
    "q125_hybrid_session" -> q125HybridSession,
  )
}

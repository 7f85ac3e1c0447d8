package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class EventsStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(minute * 60L))

  private def ev(id: Long, minute: Int, user: Long = 1L,
      typ: String = "click", value: Double = 1.0): Event =
    Event(id, ts(minute), user, typ, value)

  test("tumbling windows aggregate per window and drop late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.tumblingCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 0), ev(2, 3), ev(3, 11))
      q.processAllAvailable()
      // advance watermark far past the first window
      input.addData(ev(4, 40))
      q.processAllAvailable()
      // late row for the long-closed first window: beyond watermark, dropped
      input.addData(ev(5, 1))
      q.processAllAvailable()
      input.addData(ev(6, 60)) // push watermark so window [40,50) finalizes
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("window_start", "n_events").collect()
        .map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1))).toMap
      assert(rows("2024-01-01T00:00:00Z") == 2) // late ev(5) NOT counted
      assert(rows("2024-01-01T00:10:00Z") == 1)
      assert(rows("2024-01-01T00:40:00Z") == 1)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per event_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.dedup(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 0), ev(2, 1))
      q.processAllAvailable()
      input.addData(ev(1, 0), ev(3, 2)) // redelivery of event 1
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("session windows split on the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.sessions(input.toDF(), gap = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 0,5 (one session), then 30 (new session)
      input.addData(ev(1, 0), ev(2, 5), ev(3, 30))
      q.processAllAvailable()
      input.addData(ev(4, 120)) // advance watermark, finalize sessions
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .select("session_start", "n_events").collect()
        .map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1))).toMap
      assert(sessions("2024-01-01T00:00:00Z") == 2)
      assert(sessions("2024-01-01T00:30:00Z") == 1)
    } finally q.stop()
  }

  test("mapGroupsWithState maintains running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(ev(1, 0, user = 1, value = 2.5), ev(2, 1, user = 2, value = 1.0))
      q.processAllAvailable()
      input.addData(ev(3, 2, user = 1, value = 4.0))
      q.processAllAvailable()
      // memory sink in Update mode appends updates; take the last per user
      val last = spark.table("totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(last(1L) == (2L, 6.5))
      assert(last(2L) == (1L, 1.0))
    } finally q.stop()
  }

  test("transformWithState maintains the same totals on the successor API") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // the transformWithState operator requires the RocksDB provider (the
    // HDFS-backed default has no column-family support); queries capture
    // the conf at start, restore it after for the sibling specs
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = EventsStream.runningUserTotalsTws(input.toDS())
      .writeStream.format("memory").queryName("totals_tws")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(ev(1, 0, user = 1, value = 2.5), ev(2, 1, user = 2, value = 1.0))
      q.processAllAvailable()
      input.addData(ev(3, 2, user = 1, value = 4.0))
      q.processAllAvailable()
      val last = spark.table("totals_tws").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(last(1L) == (2L, 6.5)) // state carried across micro-batches
      assert(last(2L) == (1L, 1.0))
    } finally {
      q.stop()
      prevProvider.fold(spark.conf.unset(providerKey))(
        spark.conf.set(providerKey, _))
    }
  }

  test("foreachBatch sink is idempotent under batch redelivery") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-eos").toString
    val batch = Seq(ev(1, 0), ev(2, 1)).toDF()
    EventsStream.writeBatchIdempotent(out)(batch, 7L)
    EventsStream.writeBatchIdempotent(out)(batch, 7L) // crash-replay of batch 7
    val back = spark.read.parquet(s"$out/batch=7")
    assert(back.count() == 2) // not 4: replay overwrote, no duplicates
  }

  test("end-to-end AvailableNow run: source -> window agg -> parquet sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val input = MemoryStream[Event]
    input.addData(ev(1, 0), ev(2, 3), ev(3, 11), ev(4, 40))
    val q = EventsStream.startToParquet(
      EventsStream.tumblingCounts(input.toDF()), out, ckpt)
    q.awaitTermination()
    val dirs = new java.io.File(out).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("batch=")))
  }

  test("stream-stream interval join: clicks buffered in state match " +
      "purchases from LATER micro-batches, within the 3-day window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.attributionPairs(input.toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 0: user 1 clicks twice; user 2 clicks once
      input.addData(
        ev(1, 0, user = 1, typ = "click"),
        ev(2, 5, user = 1, typ = "click"),
        ev(3, 0, user = 2, typ = "click"))
      q.processAllAvailable()
      // batch 1: purchases arrive later — the join must reach BACK into
      // buffered click state across the micro-batch boundary
      input.addData(
        ev(10, 30, user = 1, typ = "purchase"),
        ev(11, 30, user = 3, typ = "purchase"), // no clicks: no pair
        ev(12, 4330, user = 2, typ = "purchase")) // 4330 min > 3 days
      q.processAllAvailable()
      val pairs = spark.table("attribution")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // user 1's purchase pairs with BOTH its clicks (append mode emits
      // the candidate pair stream; most-recent is q117's batch window);
      // user 2's purchase is outside the 3-day interval; user 3 has none
      assert(pairs == Set((10L, 1L), (10L, 2L)))
    } finally q.stop()
  }

  test("stream-stream join pairs match q117's batch join semantics on " +
      "identical data (the differential-twin check)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(1, 0, user = 1, typ = "click"),
      ev(2, 5, user = 1, typ = "click"),
      ev(3, 10, user = 1, typ = "purchase"),
      ev(4, 10, user = 2, typ = "click"),
      ev(5, 10, user = 2, typ = "purchase"), // same-ts: id 4 < 5 pairs
      ev(6, 20, user = 2, typ = "purchase"),
      ev(7, 9999, user = 1, typ = "purchase")) // > 3 days from clicks
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventsStream.attributionPairs(input.toDF())
      .writeStream.format("memory").queryName("attribution_diff")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attribution_diff")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch restatement of the same join predicate
      val df = events.toDF()
      val c = df.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"ts".as("click_ts"),
          $"user_id".as("cu"))
      val want = df.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
          $"user_id")
        .join(c, $"cu" === $"user_id" &&
          ($"click_ts" < $"purchase_ts" ||
            ($"click_ts" === $"purchase_ts" &&
              $"click_id" < $"purchase_id")) &&
          $"click_ts" >= $"purchase_ts" - org.apache.spark.sql.functions
            .expr("INTERVAL 3 DAYS"))
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == want && want.nonEmpty)
      assert(want.contains((5L, 4L))) // same-ts tie resolves by event_id
      assert(want.contains((6L, 4L))) // ordinary trailing-window pair
    } finally q.stop()
  }

  test("stream-stream join evicts BOTH sides' state once the watermark " +
      "passes their bounds (purchase side needs the top-level conjunct)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.attributionPairs(input.toDF())
      .writeStream.format("memory").queryName("attribution_evict")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 0: one click + one matching purchase buffered (2 state rows)
      input.addData(
        ev(1, 0, user = 1, typ = "click"),
        ev(2, 10, user = 1, typ = "purchase"))
      q.processAllAvailable()
      // batch 1: jump event time far ahead (~7 days); watermark is
      // computed from this batch's max AFTER it runs
      input.addData(
        ev(3, 10000, user = 9, typ = "click"),
        ev(4, 10005, user = 9, typ = "purchase"))
      q.processAllAvailable()
      // batch 2 runs WITH the advanced watermark (~9995 min): the click
      // at t=0 is past click_ts + 3 days, the purchase at t=10 is past
      // the click watermark — both must be evicted. Without an
      // extractable purchase-side bound (the top-level
      // click_ts <= purchase_ts conjunct) the purchase would sit in
      // state forever and the final count below would read 4, not 3.
      input.addData(ev(5, 10010, user = 7, typ = "click"))
      q.processAllAvailable()
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      val lastTotal = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      assert(removed >= 2L, s"expected both stale rows evicted, removed=$removed")
      // survivors: click t=10000, purchase t=10005, click t=10010
      assert(lastTotal == 3L, s"state rows after eviction: $lastTotal")
    } finally q.stop()
  }

  test("attributionLatest emits ONE FINAL attribution per purchase — the " +
      "argmax the append-mode pair join cannot produce — equal to q117's " +
      "batch semantics on event-time-ordered batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventsStream.attributionLatest(input.toDS())
      .writeStream.format("memory").queryName("attr_latest")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 0: user 1 clicks twice (t=0, t=5), then purchases at t=10
      // within the same batch -> attribution must pick the LATER click
      // (t=5), proving same-batch composite-order visibility
      input.addData(
        ev(1, 0, user = 1, typ = "click"),
        ev(2, 5, user = 1, typ = "click"),
        ev(3, 10, user = 1, typ = "purchase"))
      q.processAllAvailable()
      // batch 1: a purchase in a LATER batch attributes to state carried
      // from batch 0 (click t=5 still the latest); user 2's purchase
      // with no click ever emits nothing
      input.addData(
        ev(4, 20, user = 1, typ = "purchase"),
        ev(5, 21, user = 2, typ = "purchase"))
      q.processAllAvailable()
      // batch 2: click then purchase at the SAME timestamp — q117's
      // tie-break admits the click only because click_id < purchase_id
      input.addData(
        ev(6, 30, user = 3, typ = "click"),
        ev(7, 30, user = 3, typ = "purchase"))
      q.processAllAvailable()
      // batch 3: a click older than 3 days cannot attribute
      input.addData(
        ev(8, 50, user = 4, typ = "click"),
        ev(9, 50 + 3 * 24 * 60 + 1, user = 4, typ = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("attr_latest")
        .select("purchase_id", "click_id", "gap_us").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(rows.keySet == Set(3L, 4L, 7L),
        s"purchases attributed: ${rows.keySet}")
      assert(rows(3L) == (2L, 5L * 60 * 1000000L)) // later click wins
      assert(rows(4L) == (2L, 15L * 60 * 1000000L)) // state across batches
      assert(rows(7L) == (6L, 0L)) // equal-ts tie-break by event_id
    } finally {
      q.stop()
      prevProvider.fold(spark.conf.unset(providerKey))(
        spark.conf.set(providerKey, _))
    }
  }

  test("attributionLatest resolves SUB-MILLISECOND event order, gap_us " +
      "low digits, and the 3-day boundary exactly as q117's unix_micros " +
      "batch argmax (Timestamp.getTime alone would truncate all three)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, last, lit, unix_micros, when}
    implicit val sqlCtx = spark.sqlContext
    def tsU(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plus(us, java.time.temporal.ChronoUnit.MICROS))
    def evU(id: Long, us: Long, user: Long, typ: String): Event =
      Event(id, tsU(us), user, typ, 1.0)
    val threeDaysUs = 259200000000L
    val events = Seq(
      // user 1: two clicks INSIDE the same millisecond — true µs order
      // (id 10 @1000µs, then id 5 @1500µs) must win over the event_id
      // tie-break a ms-truncated ts_us would fall back to (id 10)
      evU(10, 1000L, user = 1, typ = "click"),
      evU(5, 1500L, user = 1, typ = "click"),
      evU(20, 5000L, user = 1, typ = "purchase"),
      // user 2: true gap = 3 days + 800µs (REJECT); truncated to millis
      // the gap reads exactly 3 days and is wrongly accepted
      evU(30, 100L, user = 2, typ = "click"),
      evU(40, threeDaysUs + 900L, user = 2, typ = "purchase"),
      // user 3: true gap = 3 days - 800µs (ACCEPT) — and the emitted
      // gap_us must carry the real low digits, not a ×1000 multiple
      evU(50, 900L, user = 3, typ = "click"),
      evU(60, threeDaysUs + 100L, user = 3, typ = "purchase"))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventsStream.attributionLatest(input.toDS())
      .writeStream.format("memory").queryName("attr_latest_us")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_latest_us")
        .select("purchase_id", "click_id", "gap_us", "click_ts").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getTimestamp(3))).toMap
      // batch restatement = q117's exact shape (TimeWindows.scala): window
      // argmax in (ts, event_id) composite order, gap via unix_micros
      val df = events.toDF()
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val isClick = col("event_type") === "click"
      val batch = df
        .withColumn("click_id",
          last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(isClick, col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("click_ts").isNotNull)
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(col("click_ts")))
        .filter(col("gap_us") <= lit(threeDaysUs))
        .select("event_id", "click_id", "gap_us", "click_ts").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getTimestamp(3))).toMap
      assert(streamed == batch,
        s"stream/batch argmax diverge: streamed=$streamed batch=$batch")
      assert(streamed.keySet == Set(20L, 60L)) // purchase 40 over-boundary
      assert(streamed(20L)._1 == 5L) // µs order beats the id tie-break
      assert(streamed(20L)._2 == 3500L) // true sub-ms gap
      assert(streamed(20L)._3 == tsU(1500L)) // click_ts rebuilt at full µs
      assert(streamed(60L)._2 == threeDaysUs - 800L) // exact low digits
    } finally {
      q.stop()
      prevProvider.fold(spark.conf.unset(providerKey))(
        spark.conf.set(providerKey, _))
    }
  }

  test("a TIMESTAMP_NTZ-typed stream normalizes through the shared helper " +
      "and aggregates identically to the TIMESTAMP-typed stream") {
    // The round-9 fixture regeneration regressed `ts` to naive
    // timestamp[us]; a parquet-fed twin would receive TIMESTAMP_NTZ.
    // The twins route through Tables.normalizeTs, so an NTZ input must
    // produce the same windows as the Timestamp input above.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NtzEvent]
    def nev(id: Long, minute: Int): NtzEvent =
      NtzEvent(id, java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusMinutes(minute.toLong), 1L, "click", 1.0)
    val stream = EventsStream.tumblingCounts(input.toDF(), "10 minutes",
      "5 minutes")
    assert(stream.schema("window_start").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val q = stream.writeStream.format("memory").queryName("ntz_tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(nev(1, 0), nev(2, 3), nev(3, 11))
      q.processAllAvailable()
      input.addData(nev(4, 40)) // advance watermark; finalize early windows
      q.processAllAvailable()
      val rows = spark.table("ntz_tumbling")
        .select("window_start", "n_events").collect()
        .map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1))).toMap
      assert(rows("2024-01-01T00:00:00Z") == 2)
      assert(rows("2024-01-01T00:10:00Z") == 1)
    } finally q.stop()
  }
}

/** events-table shape with a NAIVE timestamp — encodes as TIMESTAMP_NTZ,
  * the type the round-9+ parquet fixture hands Spark. */
case class NtzEvent(event_id: Long, ts: java.time.LocalDateTime,
    user_id: Long, event_type: String, value: Double)

package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain equi-join on a hot-key dataset, " +
      "and spreads the hot key across salts") {
    import spark.implicits._
    // key 7 is hot: 500 probe rows; build side has one row per key
    val probe = ((1 to 500).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, 1000L + i)))
      .toDF("k", "row_id")
    val build = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "label")

    val plain = probe.join(build, Seq("k"))
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(probe, build, "k",
        saltSource = col("row_id"), salts = 8)
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    assert(salted == plain, "salted join changed the result")

    // the mitigation itself: the hot key's probe rows occupy >1 salt,
    // so its matches no longer co-locate in a single shuffle partition
    val saltsUsed = probe.filter(col("k") === 7L)
      .select((abs(hash(col("row_id"))) % 8).as("salt"))
      .distinct().count()
    assert(saltsUsed > 1, "hot key stayed on one salt")
  }

  test("hybridSaltedJoin equals the plain equi-join, salts ONLY the hot " +
      "keys, and replicates only the hot build slice") {
    import spark.implicits._
    // key 7 is hot (500 rows), keys 0-4 are cold (10 rows each)
    val probe = ((1 to 500).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, 1000L + i)))
      .toDF("k", "row_id")
    val build = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "label")

    val plain = probe.join(build, Seq("k"))
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    val hybrid = Skew.hybridSaltedJoin(probe, build, "k",
        saltSource = col("row_id"), salts = 8, hotThreshold = 100L)
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    assert(hybrid == plain, "hybrid salted join changed the result")

    // the point of the hybrid: exactly one key qualifies as hot at the
    // 100-row threshold, so the salted path replicates ONE build row
    // 8x (vs saltedJoin's 11 x 8) and the cold path carries the rest
    val hot = probe.groupBy("k").count().filter(col("count") > 100L)
    assert(hot.collect().map(_.getLong(0)).toSeq == Seq(7L))

    // degenerate thresholds still equal the plain join: everything hot
    val allHot = Skew.hybridSaltedJoin(probe, build, "k",
        saltSource = col("row_id"), salts = 8, hotThreshold = 0L)
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    assert(allHot == plain)
    // ...and everything cold
    val allCold = Skew.hybridSaltedJoin(probe, build, "k",
        saltSource = col("row_id"), salts = 8, hotThreshold = 10000L)
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    assert(allCold == plain)

    // the top-N cap demotes past-cap keys to the plain path without
    // moving the result: threshold 0 qualifies all 6 keys, cap 2 keeps
    // only the heaviest two salted
    val cappedHot = Skew.hybridSaltedJoin(probe, build, "k",
        saltSource = col("row_id"), salts = 8, hotThreshold = 0L,
        maxHotKeys = 2)
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    assert(cappedHot == plain, "hot-list cap changed the join result")
  }

  test("q86 exercises BOTH hybrid paths on the fixture: some orderkeys " +
      "are hot (>5 lineitems), most are cold") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val byKey = li.groupBy("l_orderkey").count()
    val nHot = byKey.filter(col("count") > 5).count()
    val nCold = byKey.filter(col("count") <= 5).count()
    assert(nHot > 0, "no hot keys at threshold 5: the salted path is dead")
    assert(nCold > 0, "no cold keys: the plain path is dead")
  }

  test("saltedSumCount equals the plain aggregation") {
    import spark.implicits._
    val df = ((1 to 300).map(i => ("hot", i.toLong)) ++
      (1 to 30).map(i => (s"cold${i % 3}", i.toLong)))
      .toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, col("k"), col("v"), col("v"), 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("chunkedSessionize equals plain sessionization on a hot-user " +
      "timeline, including sessions cascading across MANY chunks") {
    import spark.implicits._
    // Hot user 1: 600 events at a steady 10-min cadence — ONE session
    // spanning ~100 one-hour chunks (the cascade case: every level-2
    // merge step must fire). Hot user 2: bursts of 5 events (1 min
    // apart) every 2 hours — many sessions, some straddling a chunk
    // boundary. Cold users 3-12: one event each. Epochs chosen so
    // chunk boundaries (multiples of 3600) fall inside sessions.
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows =
      (0 until 600).map(i => (1L, t(1000L + i * 600L), i.toLong, 1.0)) ++
      (0 until 40).flatMap(b => (0 until 5).map(i =>
        (2L, t(3500L + b * 7200L + i * 60L), 10000L + b * 10 + i, 0.5))) ++
      (3L to 12L).map(u => (u, t(u * 5000L), 20000L + u, 2.0))
    val events = rows.toDF("user_id", "ts", "event_id", "value")

    // the plain q29 shape, inlined as the ground truth
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val plain = events
      .withColumn("new_session",
        when(col("ts").cast("long") -
          lag(col("ts"), 1).over(byUser).cast("long") > 1800, 1)
          .when(lag(col("ts"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts").cast("long")).as("session_start"),
        max(col("ts").cast("long")).as("session_end"),
        round(sum("value"), 2).as("session_value"))
      .collect().map(_.toSeq).toSet

    val chunked = Skew.chunkedSessionize(events, 1800L, 3600L)
      .collect().map(_.toSeq).toSet
    assert(chunked == plain, "chunked sessionization changed the result")

    // the mitigation itself: the hot user's 600 events spread across
    // >1 level-1 partition key (user, chunk) — and the 100-hour session
    // really did cascade through level 2 as one merged run
    val hotChunks = events.filter(col("user_id") === 1L)
      .select(expr("CAST(ts AS LONG) div 3600")).distinct().count()
    assert(hotChunks > 50, s"hot user only touched $hotChunks chunks")
    val hotSessions = chunked.count(_.head == 1L)
    assert(hotSessions == 1, s"hot user should merge to 1 session, " +
      s"got $hotSessions")

    // the hybrid form must ALSO equal the plain result, with both paths
    // carrying real rows at a threshold between the cold singletons and
    // the two hot users (600 and 200 events)
    val hybrid = Skew.hybridChunkedSessionize(events, 1800L, 3600L,
        hotThreshold = 100L)
      .collect().map(_.toSeq).toSet
    assert(hybrid == plain, "hybrid chunked sessionization changed the result")
    val nHot = events.groupBy("user_id").count()
      .filter(col("count") > 100L).count()
    assert(nHot == 2 && nHot < 12,
      s"threshold must split the users into live hot AND cold paths ($nHot hot)")

    // the top-N cap is the STRUCTURAL broadcast bound (a threshold near
    // the mean admits arbitrarily many users): capping below the
    // qualifying count demotes the excess to the cold path and the
    // result must not move — here cap=1 keeps only the 600-event user
    // chunked while the 200-event user re-joins the single-window path
    val capped = Skew.hybridChunkedSessionize(events, 1800L, 3600L,
        hotThreshold = 100L, maxHotKeys = 1)
      .collect().map(_.toSeq).toSet
    assert(capped == plain, "hot-list cap changed the result")
    // cap=0 degenerates to the all-cold plain path
    val capZero = Skew.hybridChunkedSessionize(events, 1800L, 3600L,
        hotThreshold = 100L, maxHotKeys = 0)
      .collect().map(_.toSeq).toSet
    assert(capZero == plain)

    // and Skew.sessionize (the factored plain form q29 runs) is itself
    // the ground truth used above
    val viaHelper = Skew.sessionize(events, 1800L)
      .collect().map(_.toSeq).toSet
    assert(viaHelper == plain)

    // QUANTIFY the mitigation (deterministically — no wall-clock): the
    // plain form's window partitions on user_id alone, so its most
    // loaded key carries the hot user's ENTIRE timeline; the chunked
    // form partitions level 1 on (user_id, chunk), bounding every key's
    // load by the chunk occupancy. The straggler shrinks by the chunk
    // factor — 600 rows on one key vs ≤ 7 (one 1-hour chunk holds at
    // most ceil(3600/600s cadence)+1 = 7 of the hot user's events).
    val plainMaxKey = events.groupBy("user_id").count()
      .agg(max("count")).collect().head.getLong(0)
    val chunkedMaxKey = events
      .withColumn("chunk", expr("CAST(ts AS LONG) div 3600"))
      .groupBy("user_id", "chunk").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(plainMaxKey == 600L)
    assert(chunkedMaxKey <= 7L,
      s"chunked max key load $chunkedMaxKey — mitigation not effective")
  }
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rollup (mergeable partial aggregates): sketch-union accuracy against
  * the base-table exact count, replay idempotency of the run-partition
  * writes, and the +-monoid merge contract under overlapping runs. */
class RollupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sketch rollup: merged day-sketches track the exact distinct " +
      "count within 5% and never rescan the base") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-mv")
      .resolve("summary").toString
    Rollup.buildDistinctSketches(
      ev.filter(dayofmonth(col("ts")) <= 15), dir, 0)
    Rollup.buildDistinctSketches(
      ev.filter(dayofmonth(col("ts")) > 15), dir, 1)
    val Array(lo, hi) = ev
      .agg(min(to_date(col("ts"))), max(to_date(col("ts"))))
      .collect().head.toSeq.map(_.asInstanceOf[java.sql.Date]).toArray
    val m = Rollup.mergedDistinct(spark, dir, lo, hi).collect().head
    val est = m.getAs[Long]("estimate")
    val exact = ev.filter(to_date(col("ts")).between(lo, hi))
      .agg(countDistinct("user_id")).collect().head.getLong(0)
    assert(exact > 0)
    assert(math.abs(est - exact) <= math.max(1L, exact / 20),
      s"sketch estimate $est strayed >5% from exact $exact")
    assert(m.getAs[Long]("days_merged") === m.getAs[Long]("partial_rows"),
      "disjoint-day runs must contribute one partial per day")
  }

  test("the summary serve's day-range predicate reaches the parquet " +
      "scan — a range serve reads O(range days), not the summary") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-push")
      .resolve("summary").toString
    Rollup.buildDistinctSketches(ev, dir, 0)
    val lo = java.sql.Date.valueOf("2024-01-05")
    val hi = java.sql.Date.valueOf("2024-01-10")
    val plan = Rollup.mergedDistinct(spark, dir, lo, hi)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("PushedFilters:")).getOrElse("")
    assert(scanLine.contains("day"),
      s"day range not pushed to the summary scan:\n$plan")
  }

  test("sketch rollup: rebuilding a run overwrites its partition — " +
      "replays are idempotent") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-replay")
      .resolve("summary").toString
    Rollup.buildDistinctSketches(ev, dir, 0)
    val before = spark.read.parquet(dir).count()
    Rollup.buildDistinctSketches(ev, dir, 0) // replay the same run
    val after = spark.read.parquet(dir).count()
    assert(before === after, "replay duplicated partials")
  }

  test("histogram rollup: partials merge by + (any slicing gives the " +
      "same bins) and the rank bin brackets the exact percentile") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val Array(lo, hi) = ev
      .select(round(col("value") * 100, 0).cast("long").as("c"))
      .agg(min("c"), max("c")).collect().head.toSeq
      .map(_.asInstanceOf[Long]).toArray
    def build(slices: Seq[org.apache.spark.sql.DataFrame]): Map[Long, Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-hist")
        .resolve("s").toString
      slices.zipWithIndex.foreach { case (s, i) =>
        Rollup.buildHistogram(s, dir, i, lo, hi) }
      spark.read.parquet(dir).groupBy("bin").agg(sum("cnt").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val whole = build(Seq(ev))
    val sliced = build(Seq(ev.filter(col("user_id") % 3 === 0),
      ev.filter(col("user_id") % 3 === 1),
      ev.filter(col("user_id") % 3 === 2)))
    assert(whole === sliced, "bin counts depend on the batch slicing")
    assert(whole.values.sum === ev.count())
    // the served p90 bin must contain the exact rank element
    val q = graft.SparkEntry.queries("q145_histogram_rollup")(spark, sf)
      .collect().head
    val binW = (q.getAs[Long]("hi_cents") - q.getAs[Long]("lo_cents") + 1)
    val p90lo = q.getAs[Long]("lo_cents") +
      q.getAs[Long]("p90_bin") * binW / Rollup.BINS
    val p90hi = q.getAs[Long]("lo_cents") +
      (q.getAs[Long]("p90_bin") + 1) * binW / Rollup.BINS
    val exact = q.getAs[Long]("p90_exact")
    if (exact >= q.getAs[Long]("lo_cents") &&
        exact <= q.getAs[Long]("hi_cents"))
      assert(exact >= p90lo - 1 && exact <= p90hi + 1,
        s"exact p90 $exact outside its bin [$p90lo, $p90hi]")
    else // out-of-domain element: must have clamped to an edge bin
      assert(q.getAs[Long]("p90_bin") == 0L ||
        q.getAs[Long]("p90_bin") == (Rollup.BINS - 1).toLong)
  }

  test("exact rollup: overlapping parity runs merge by + into the " +
      "direct aggregate, group for group") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val merged = graft.SparkEntry
      .queries("q139_incremental_rollup")(spark, sf)
      .localCheckpoint(true)
    val direct = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
    val joined = merged.join(direct, Seq("day", "event_type"), "full_outer")
    assert(joined.filter(
      merged("n").isNull || direct("n").isNull ||
        merged("n") =!= direct("n") ||
        merged("value_cents") =!= direct("value_cents")).count() === 0,
      "merged partials diverge from the direct aggregate")
    // overlap really exercised: some group must carry both runs
    assert(merged.filter(col("n_runs") === 2).count() > 0,
      "no group saw partials from both runs — overlap not exercised")
  }
}

package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-contract spec for Tables.normalizeTs: every timestamp regime the
  * driver has ever shipped (TIMESTAMP(NANOS) read as raw longs, naive
  * timestamp[us] read as TIMESTAMP_NTZ, tz'd timestamp[us] read as
  * TIMESTAMP) must normalize to the SAME TimestampType column with the
  * SAME instant values. Round 9 was lost to a silent regeneration from
  * nanos to naive-µs; this spec makes the next format change a named,
  * local failure instead of two red driver artifacts. */
class TablesSpec extends SparkSpec {

  // Three instants, expressed as micros since epoch (UTC).
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1650000000500000L)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/events.parquet"

  private def readNormalized(path: String) =
    Tables.normalizeTs(spark.read.parquet(path))

  private def instants(path: String): Seq[Long] = {
    val df = readNormalized(path)
    assert(df.schema("ts").dataType == TimestampType,
      s"normalizeTs must yield TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("nanos-as-long, NTZ, and tz'd regimes normalize to identical instants") {
    // Regime 1: nanos-since-epoch longs (what nanosAsLong hands us for
    // parquet TIMESTAMP(NANOS)). Write longs, then rename on read — the
    // normalizer keys on (name=ts, LongType).
    val nanosPath = tmp("graft-ts-nanos")
    spark.createDataFrame(
      spark.sparkContext.parallelize(micros.map(m => Row(m * 1000L))),
      StructType(Seq(StructField("ts", LongType))))
      .write.parquet(nanosPath)

    // Regime 2: TIMESTAMP_NTZ (naive timestamp[us], the round-9+ fixture).
    val ntzPath = tmp("graft-ts-ntz")
    spark.createDataFrame(
      spark.sparkContext.parallelize(micros.map(m =>
        Row(java.time.LocalDateTime.ofEpochSecond(
          m / 1000000L, ((m % 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
      .write.parquet(ntzPath)

    // Regime 3: tz'd TIMESTAMP (instant semantics) — the pass-through case.
    val tzPath = tmp("graft-ts-tz")
    spark.createDataFrame(
      spark.sparkContext.parallelize(micros.map(m =>
        Row(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          m / 1000000L, (m % 1000000L) * 1000L))))),
      StructType(Seq(StructField("ts", TimestampType))))
      .write.parquet(tzPath)

    val expected = micros.sorted
    assert(instants(nanosPath) == expected)
    assert(instants(ntzPath) == expected)
    assert(instants(tzPath) == expected)
  }

  test("frames without a ts column pass through untouched") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    assert(Tables.normalizeTs(df).schema == df.schema)
  }

  test("an unnormalizable ts regime fails with a named contract error") {
    import spark.implicits._
    val df = Seq("2024-01-01").toDF("ts") // StringType: no regime handles it
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("fixture contract violation"))
  }

  test("the live fixture loads with ts as TimestampType") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1L)
  }

  test("every fixture table satisfies its column-name contract") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Tables.all.foreach { t => Tables(spark, dir, t) } // require() inside
  }

  test("a renamed column fails with a named contract error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badcol")
    import spark.implicits._
    Seq((1L, "x")).toDF("r_regionkey", "r_label") // r_name renamed
      .write.parquet(dir.toString + "/region.parquet")
    val e = intercept[IllegalArgumentException](
      Tables(spark, dir.toString, "region"))
    assert(e.getMessage.contains("fixture contract violation"))
    assert(e.getMessage.contains("region"))
  }
}

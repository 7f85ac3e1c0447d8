package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated star schema (see /root/repo/TESTDATA.md,
  * FIXTURES.md §B). One parquet file per table under the sf dir.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 refuses
  * to read natively. We flip `spark.sql.legacy.parquet.nanosAsLong` (a
  * dynamic SQL conf) so the column arrives as raw nanos-since-epoch, then
  * rebuild a proper TimestampType by flooring to microseconds — the same
  * truncation DuckDB applies when it reads TIMESTAMP_NS, so oracle
  * comparisons stay exact.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == LongType =>
        d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (d, _) => d
    }
  }

  /** Spread a frame across the cluster before CPU-dense per-row work
    * (shingle/token hashing, fingerprinting, vector math). The fixture
    * tables are single-row-group parquet, so Spark's size-based file
    * splitting (`maxPartitionBytes`) cannot parallelize them and the
    * heavy map stage — including its partial aggregation — would run on
    * ONE core. A cheap exchange of the raw rows first buys full map-side
    * parallelism; frames that already arrive wide (a real 100 TB scan)
    * pass through untouched. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val np = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < np) df.repartition(np) else df
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star schema (see /root/repo/TESTDATA.md,
  * FIXTURES.md §B). One parquet file per table under the sf dir.
  *
  * The fixture's `events.ts` physical type has changed between driver
  * regenerations, so the loader normalizes EVERY timestamp regime it has
  * ever been handed to one canonical type — `TimestampType` (UTC instant;
  * the session timezone is pinned to UTC in Verify/Bench and the specs):
  *
  *   - parquet TIMESTAMP(NANOS) (rounds 1-8): Spark 4 refuses to read it
  *     natively, so we flip `spark.sql.legacy.parquet.nanosAsLong` (a
  *     dynamic SQL conf) and the column arrives as raw nanos-since-epoch
  *     LongType; we rebuild a TimestampType by flooring to microseconds —
  *     the same truncation DuckDB applies reading TIMESTAMP_NS, so oracle
  *     comparisons stay exact.
  *   - parquet timestamp[us] with no timezone (round 9+): Spark 4 reads it
  *     as TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.enabled`
  *     defaults true). Under a UTC session, `cast(TimestampType)` is
  *     value-identical (the wall-clock field values ARE the UTC instant),
  *     and DuckDB's naive timestamps already compare as UTC instants.
  *   - parquet timestamp[us/ms] WITH timezone: already TimestampType;
  *     passes through untouched.
  *
  * After normalization the contract is ASSERTED: a future fixture
  * regeneration that introduces a regime this loader cannot normalize
  * fails at the first `Tables` call with a named error, instead of
  * surfacing as red driver artifacts three steps downstream.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The column-name contract per fixture table (FIXTURES.md §B). Checked
    * on every load: a driver regeneration that renames/drops/reorders a
    * column fails at the first `Tables` call with a named diff, not as
    * red driver artifacts downstream. Names only — physical types are
    * allowed to drift (that's what [[normalizeTs]] absorbs); a type
    * drift a query can't tolerate still fails loudly in analysis. */
  private val expectedColumns: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Normalize a `ts` column (any fixture regime — nanos-as-long, NTZ,
    * or tz'd timestamp) to canonical TimestampType. Shared by the batch
    * loader and the streaming twins so a parquet-fed stream survives the
    * same fixture-format changes the batch path does. Frames without a
    * `ts` column pass through untouched. */
  def normalizeTs(df: DataFrame): DataFrame = {
    val out = df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == LongType =>
        // raw nanos-since-epoch (legacy nanosAsLong read of TIMESTAMP(NANOS))
        d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (d, f) if f.name == "ts" && f.dataType == TimestampNTZType =>
        // naive timestamp[us]; session tz is UTC so this is value-identical
        d.withColumn("ts", col("ts").cast(TimestampType))
      case (d, _) => d
    }
    out.schema.fields.find(_.name == "ts").foreach { f =>
      require(f.dataType == TimestampType,
        s"fixture contract violation: `ts` normalized to ${f.dataType} " +
          s"(expected TimestampType). The driver has regenerated the fixture " +
          s"with a parquet timestamp regime Tables.normalizeTs does not " +
          s"handle — original type in this frame's scan: check " +
          s"`spark.read.parquet(...).schema`.")
    }
    out
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    expectedColumns.get(name).foreach { want =>
      val got = df.schema.fieldNames.toSeq
      require(got == want,
        s"fixture contract violation: table `$name` columns $got != " +
          s"expected $want (FIXTURES.md §B). The driver regenerated the " +
          s"fixture with a different schema — update Tables.expectedColumns " +
          s"and audit the queries touching the changed columns.")
    }
    df
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

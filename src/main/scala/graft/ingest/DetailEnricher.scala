package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

/** Per-key detail enrichment — the engine form of the reference's
  * fetch_repository_details loop (S2, reference
  * src/extract_github_data.py:438-491): for each list-summary row, an
  * external lookup produces the full detail record.
  *
  * Spark shape: mapPartitions with ONE client per partition (pooled
  * connection, amortized handshake — never a client per row), fetch
  * failures (404 deleted / 403 rate-limited analogs) become null rows
  * counted in an accumulator and never fail the job (reference
  * :480-491 + failed_count :687-690).
  */
object DetailEnricher {

  /** External lookup contract. Implementations must be Serializable;
    * `apply()` is invoked once per partition to open the transport. */
  trait DetailClientFactory extends Serializable {
    def apply(): DetailClient
  }
  trait DetailClient {
    /** Raw detail JSON for one key, or None on 404/403-style failure. */
    def fetchDetail(id: Long, ownerLogin: String, name: String): Option[String]
    def close(): Unit = ()
  }

  private val enrichedSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("detail_json", StringType))) // null on fetch failure

  /** Enrich summary rows (id, name, owner.login — A2 shape) with raw
    * detail JSON. Returns the enriched frame plus the accumulator that
    * counts fetch failures (flows into the run-metrics failed_count). */
  def enrich(summaries: DataFrame, clientFactory: DetailClientFactory)
      : (DataFrame, LongAccumulator) = {
    val spark = summaries.sparkSession
    val failed = spark.sparkContext.longAccumulator("detail_fetch_failures")
    val rdd = summaries
      .select(col("id"), col("name"), col("owner.login").as("login"))
      .rdd
      .mapPartitions { rows =>
        val client = clientFactory() // one client per partition
        val out = rows.map { r =>
          val id = r.getLong(0)
          client.fetchDetail(id, r.getString(2), r.getString(1)) match {
            case Some(json) => Row(id, json)
            case None => failed.add(1L); Row(id, null)
          }
        }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = out.hasNext; if (!h) client.close(); h }
          def next(): Row = out.next()
        }
      }
    val enriched = spark.createDataFrame(rdd, enrichedSchema)
      .withColumn("detail", from_json(col("detail_json"), RepoSchema.raw))
    (enriched, failed)
  }

  /** The successfully-fetched details as raw records ready for the
    * flatten stage; failures are already excluded (and counted). */
  def details(enriched: DataFrame): DataFrame =
    enriched.filter(col("detail").isNotNull).select("detail.*")
}

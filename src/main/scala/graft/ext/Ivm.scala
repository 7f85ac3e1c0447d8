package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** INCREMENTAL VIEW MAINTENANCE over the changefeed — the composition
  * the snapshot table and the rollup family exist for: an aggregate
  * materialized view kept exact by applying CDC DELTAS, never by
  * re-scanning the base.
  *
  * The hard part of IVM is RETRACTION: an update must subtract the old
  * row's contribution from its old group and add the new row's to its
  * new group (which may be a DIFFERENT group — the q147 lifecycle
  * migrates rows between statuses on purpose), and a delete is pure
  * subtraction. That is only sound when the view's aggregates form a
  * commutative GROUP (not just a monoid — counts and sums have
  * inverses; min/max do NOT, and neither do HLL distinct sketches —
  * register-max cannot unsee an element — so those aggregates stay on
  * the rollup family's rebuild-from-partials path under deletion). Deltas land as run partitions
  * (the Rollup discipline — replay-idempotent by run overwrite) and
  * the serve is one O(groups x runs) aggregation of the summary.
  *
  * Per-increment cost is O(changefeed rows) = O(changed buckets), so a
  * view over a 100 TB table follows a trickle of changes for the price
  * of the trickle. q147 proves EXACTNESS through two composed
  * increments (v1→v3, then v3→v4): the maintained view must equal the
  * direct aggregate of the final snapshot, group for group — the
  * delta algebra is hash-gated against an oracle that never saw the
  * deltas. */
object Ivm {

  /** Initialize the view's base partial (run 0) from a table snapshot:
    * per-status count + cents sum. */
  def init(table: DataFrame, dir: String): Unit =
    table.groupBy("status")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/run=0")

  /** Apply one changefeed increment as a delta partial: every old_row
    * contributes (-1, -cents) to its OLD group, every new_row (+1,
    * +cents) to its NEW group; an update whose status migrated thus
    * moves its weight between groups, and a net-zero group simply
    * cancels at serve time. `runId` keys the partition (replay
    * overwrites it — idempotent). */
  def applyChanges(changefeed: DataFrame, dir: String, runId: Long): Unit = {
    val retract = changefeed.filter(col("old_row").isNotNull)
      .select(col("old_row.status").as("status"), lit(-1L).as("w"),
        (-col("old_row.cents")).as("c"))
    val assert_ = changefeed.filter(col("new_row").isNotNull)
      .select(col("new_row.status").as("status"), lit(1L).as("w"),
        col("new_row.cents").as("c"))
    retract.unionByName(assert_)
      .groupBy("status")
      .agg(sum("w").as("n"), sum("c").as("cents"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/run=$runId")
  }

  /** Serve the view: + -merge all partials, drop groups whose count
    * cancelled to zero (a status that emptied out). */
  def serve(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy("status")
      .agg(sum("n").as("n"), sum("cents").as("sum_cents"))
      .filter(col("n") =!= 0)

  // ---- q147: the lifecycle with status MIGRATION -------------------

  private def baseRows(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))

  /** q147 — IVM-over-changefeed acceptance: a per-status (count, cents)
    * view initialized at v1, then maintained ONLY from changefeed
    * deltas through two composed increments — batch 1 (cents+100 on
    * key % 101, 'N' inserts at -(key+1) on key % 103) and batch 2
    * (keys % 202 MIGRATE to status 'X' at cents+300) applied as
    * increment v1→v3, then a hard delete (key % 307) as increment
    * v3→v4. The served view must equal the direct per-status aggregate
    * of the final snapshot, which the oracle computes from orders
    * arithmetic alone — retraction, group migration, insert placement
    * and delete subtraction all hash-gated in one row set. */
  private val q147IvmChangefeed = QueryDef(
    (s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft-q147-t")
        .resolve("table").toString
      val view = java.nio.file.Files.createTempDirectory("graft-q147-v")
        .resolve("view").toString
      val base = baseRows(s, dir).localCheckpoint(true)
      MergeTable.create(base, table, "key")
      Ivm.init(MergeTable.readTable(s, table).drop("bucket"), view)
      MergeTable.upsert(s, table,
        base.filter(col("key") % 101 === 0)
          .withColumn("cents", col("cents") + 100)
          .unionByName(base.filter(col("key") % 103 === 0)
            .select((-col("key") - 1).as("key"), lit("N").as("status"),
              col("cents"))))
      MergeTable.upsert(s, table,
        base.filter(col("key") % 202 === 0)
          .select(col("key"), lit("X").as("status"),
            (col("cents") + 300).as("cents")))
      Ivm.applyChanges(MergeTable.changes(s, table, 1L, 3L), view, 1)
      MergeTable.deleteKeys(s, table,
        base.filter(col("key") % 307 === 0).select("key"))
      Ivm.applyChanges(MergeTable.changes(s, table, 3L, 4L), view, 2)
      Ivm.serve(s, view).orderBy("status")
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |fin AS (
      |  SELECT key,
      |         CASE WHEN key % 202 = 0 THEN 'X' ELSE status END AS status,
      |         CASE WHEN key % 202 = 0 THEN cents + 300
      |              WHEN key % 101 = 0 THEN cents + 100
      |              ELSE cents END AS cents
      |  FROM base WHERE key % 307 <> 0
      |  UNION ALL
      |  SELECT -key - 1, 'N', cents FROM base WHERE key % 103 = 0)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM fin GROUP BY status ORDER BY status""")

  val defs: Map[String, QueryDef] = Map(
    "q147_ivm_changefeed" -> q147IvmChangefeed,
  )
}

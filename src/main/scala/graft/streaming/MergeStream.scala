package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming CDC apply — the change stream drained into a
  * [[graft.ext.MergeTable]] copy-on-write table, one upsert per
  * micro-batch. Each batch carries ABSOLUTE rows (state, not deltas),
  * so a replay after a mid-write kill re-applies to the same bytes —
  * the MergeTable idempotence contract is exactly what foreachBatch's
  * at-least-once delivery needs; no batch-id keying is required
  * because the operation itself is idempotent by value. Per-batch cost
  * is O(batch + impacted buckets), so a trickle of changes against a
  * 100 TB table rewrites a trickle of files.
  *
  * A real CDC stream can carry SEVERAL changes to one key inside one
  * micro-batch — which upsert now REJECTS loudly (its
  * at-most-one-row-per-key contract; both rows surviving the union
  * would be silent duplicate keys). `seqCol` names the ordering column
  * (a sequence number / source timestamp) by which [[latestBy]]
  * collapses each key to its final word BEFORE applying — one window
  * pass over the micro-batch, the standard CDC compaction step. Omit
  * it only when the producer already guarantees unique keys per batch
  * (the collapse is then skipped, and a violation fails the batch
  * instead of corrupting the table). */
object MergeStream {

  /** Post-batch AUTO-MAINTENANCE for the plain upsert drain: one
    * head-properties read decides (the upsert path has no
    * streamBatchGate read to piggyback on), and only a table that
    * declared `graft.maintenance.auto=true` pays the advisor walk —
    * which then folds/rewrites exactly the threshold-crossing buckets
    * ([[graft.ext.MergeTable.maintain]]). */
  private def maintainIfAuto(
      sp: org.apache.spark.sql.SparkSession, dir: String): Unit =
    if (graft.ext.MergeTable.properties(sp, dir)
        .get("graft.maintenance.auto").contains("true"))
      graft.ext.MergeTable.maintain(sp, dir): Unit

  /** Collapse a batch to the latest row per key by `seqCol` (ties
    * break deterministically on the remaining columns, so a replayed
    * batch collapses identically). */
  private[streaming] def latestBy(batch: DataFrame, key: String,
      seqCol: String): DataFrame = {
    val others = batch.columns.filter(c => c != key && c != seqCol)
    val w = Window.partitionBy(col(key))
      .orderBy((col(seqCol).desc +: others.map(col(_).desc)): _*)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** AvailableNow drain: apply each micro-batch of keyed rows (table
    * schema, no bucket column) as an upsert to the table at `dir`
    * (created beforehand — the key contract lives in its meta),
    * collapsing to latest-per-key by `seqCol` when given. */
  def start(updates: DataFrame, dir: String, checkpoint: String,
      seqCol: Option[String] = None): StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val toApply = seqCol.fold(batch) { sc =>
          latestBy(batch,
            graft.ext.MergeTable.keyOf(batch.sparkSession, dir), sc)
        }
        graft.ext.MergeTable.upsert(batch.sparkSession, dir, toApply): Unit
        maintainIfAuto(batch.sparkSession, dir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** AvailableNow CLAUSE drain — [[graft.ext.MergeTable.merge]] per
    * micro-batch, made EXACTLY-ONCE by an idempotency token committed
    * ATOMICALLY INSIDE the table's own manifest (`#tok=<stream>:<id>`).
    * The plain [[start]] path needs no such gate because upsert is
    * idempotent by value; a clause merge is NOT — a matched Delete
    * turns a replayed row into a not-matched insert candidate, and a
    * relative Update (`tgt.cents + 1`) accumulates — so at-least-once
    * replay must be de-duplicated, and the only sound place for the
    * marker is the same atomic commit that carries the data (a
    * separate marker file would re-open the crash window between the
    * two writes). Each batch checks
    * [[graft.ext.MergeTable.lastAppliedBatch]] and skips ids at or
    * below it; the streamId derives from the checkpoint path (stable
    * across restarts) unless given explicitly — give it explicitly
    * when several streams share one checkpoint ROOT.
    *
    * `notMatchedBySource` is deliberately absent: a by-source clause
    * prices a FULL-TABLE pass, which per micro-batch is a footgun —
    * run it as a batch maintenance [[graft.ext.MergeTable.merge]]
    * instead.
    *
    * WRITE MODE follows the table's own `graft.merges.mode` property
    * (the same routing SQL `MERGE INTO` consults): `mor` dispatches
    * each batch through [[graft.ext.MergeTable.mergeMor]] — tombstones
    * + one small append epoch per batch instead of bucket rewrites,
    * the natural shape for a trickle stream against a 100 TB table —
    * with the SAME `#tok=` exactly-once gate riding the DV commit
    * atomically (the token line and the tombstone annotations are one
    * manifest promotion, so a replay after any crash point sees
    * either both or neither). The property is re-read per batch, so
    * flipping the mode on a live table takes effect at the next
    * micro-batch without a stream restart. */
  def startClauses(source: DataFrame, dir: String, checkpoint: String,
      matched: Seq[graft.ext.MergeTable.MergeWhen] = Nil,
      notMatched: Seq[graft.ext.MergeTable.MergeWhen] = Nil,
      seqCol: Option[String] = None,
      streamId: Option[String] = None): StreamingQuery = {
    val sid = streamId.getOrElse("mrg-" +
      java.util.UUID.nameUUIDFromBytes(checkpoint.getBytes("UTF-8"))
        .toString.take(8))
    source.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val sp = batch.sparkSession
        // replay gate + mode routing off ONE head-manifest read
        val (last, props) =
          graft.ext.MergeTable.streamBatchGate(sp, dir, sid)
        if (!last.exists(_ >= id)) {
          val toApply = seqCol.fold(batch)(sc =>
            latestBy(batch, graft.ext.MergeTable.keyOf(sp, dir), sc))
          val mor = props.get("graft.merges.mode").contains("mor")
          (if (mor)
            graft.ext.MergeTable.mergeMor(sp, dir, toApply,
              matched = matched, notMatched = notMatched,
              idempotencyToken = Some(s"$sid:$id"))
          else
            graft.ext.MergeTable.merge(sp, dir, toApply,
              matched = matched, notMatched = notMatched,
              idempotencyToken = Some(s"$sid:$id"))): Unit
          // the pre-batch props read already told us whether this
          // table wants the post-batch maintainer — zero extra
          // manifest reads when it doesn't (the streamBatchGate
          // discipline)
          if (props.get("graft.maintenance.auto").contains("true"))
            graft.ext.MergeTable.maintain(sp, dir): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

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
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

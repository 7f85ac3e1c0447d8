package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming CDC apply — the change stream drained into a
  * [[graft.ext.MergeTable]] copy-on-write table, one upsert per
  * micro-batch. Each batch carries ABSOLUTE rows (state, not deltas),
  * so a replay after a mid-write kill re-applies to the same bytes —
  * the MergeTable idempotence contract is exactly what foreachBatch's
  * at-least-once delivery needs; no batch-id keying is required
  * because the operation itself is idempotent by value. Per-batch cost
  * is O(batch + impacted buckets), so a trickle of changes against a
  * 100 TB table rewrites a trickle of files. */
object MergeStream {

  /** AvailableNow drain: apply each micro-batch of keyed rows (table
    * schema, no bucket column) as an upsert to the table at `dir`
    * (created beforehand — the key contract lives in its meta). */
  def start(updates: DataFrame, dir: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ext.MergeTable.upsert(batch.sparkSession, dir, batch): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

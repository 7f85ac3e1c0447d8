package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the IVM maintainer — a stream of CHANGE rows
  * (the changefeed shape: key, old_row, new_row) drained into a
  * [[graft.ext.Ivm]] view one micro-batch at a time. Exactly-once by
  * RUN OVERWRITE: each batch lands as the view's `run=<batchId+1>`
  * partition, so foreachBatch's at-least-once replay after a mid-write
  * kill overwrites the same partition with the same deltas — the
  * MergeStream/RollupStream discipline (+1 keeps batch 0 clear of the
  * view's reserved `run=0` snapshot partial).
  *
  * One maintainer per view: the stream's batch-id run keys and
  * [[graft.ingest.IvmRunner]]'s version run keys must not interleave
  * on one view dir. Compaction between drains uses
  * `Ivm.compact(excludeRunsAbove = lastCommittedRun)` exactly as the
  * runner does; IvmSpec proves serve-identity across a kill/restart
  * with a half-applied batch in place. */
object IvmStream {

  /** AvailableNow drain: apply each micro-batch of change rows as one
    * view increment; `groupCol`/`valCol` name the view definition
    * fixed at [[graft.ext.Ivm.init]]. */
  def start(changes: DataFrame, viewDir: String, checkpoint: String,
      groupCol: String = "status",
      valCol: String = "cents"): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.ext.Ivm.applyChanges(batch, viewDir, id + 1, groupCol,
          valCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

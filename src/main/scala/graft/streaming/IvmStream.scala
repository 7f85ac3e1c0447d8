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
  * AUTO-COMPACTION, the IvfPqStream contract reapplied: every
  * `compactEvery` batches the settled runs fold into the reserved
  * epoch with `excludeRunsAbove = <the previous batch's run>` — at the
  * moment foreachBatch(id) runs, every batch BELOW id is durably
  * committed in the checkpoint and can never replay, so runs ≤ id are
  * settled by construction; the CURRENT run (id+1) may still replay
  * after a kill and is excluded (its possibly-half-applied attempt is
  * preserved verbatim outside the fold and overwritten by the
  * replay). The run
  * partition count is thus BOUNDED by ~compactEvery however long the
  * stream lives — the unbounded-runs growth [[graft.ext.Ivm.compact]]
  * closes for the runner path, closed for the stream path too.
  *
  * COMMITTED-RUN WATERMARK: the same settled frontier is persisted via
  * the [[graft.ingest.CursorStore]] file discipline in a SIBLING dir
  * (`<viewDir>__runmark` — outside the view, so compact's
  * rewrite-and-swap never carries or deletes it), readable through
  * [[committedRun]]. An EXTERNAL compactor scheduling its own folds
  * passes exactly that value as `excludeRunsAbove` — the watermark the
  * siblings' Scaladoc used to tell users to track by hand.
  *
  * One maintainer per view: the stream's batch-id run keys and
  * [[graft.ingest.IvmRunner]]'s version run keys must not interleave
  * on one view dir. IvmStreamSpec proves serve-identity across a
  * kill/restart with a half-applied batch AND a stranded mid-fold
  * temp in place, plus the bounded-runs claim over a long drain. */
object IvmStream {

  private def watermarkDir(viewDir: String): String =
    new org.apache.hadoop.fs.Path(viewDir).suffix("__runmark").toString

  /** The settled-run frontier: every run AT OR BELOW this value is
    * durably applied and can never be replayed — safe to pass as
    * `Ivm.compact(excludeRunsAbove = ...)` while the stream runs.
    * None before the first drained batch. */
  def committedRun(viewDir: String): Option[Long] =
    new graft.ingest.FileCursorStore(watermarkDir(viewDir)).read()

  /** AvailableNow drain: apply each micro-batch of change rows as one
    * view increment; the group/measure vectors name the view
    * definition fixed at [[graft.ext.Ivm.init]] — composite keys,
    * several sum measures, and min/max extrema all drain through the
    * same run discipline (extrema dirt rides the folds; resolution is
    * an external compact with the base snapshot at [[committedRun]]).
    * `compactEvery` ≤ 0 disables the auto-compaction policy. */
  def start(changes: DataFrame, viewDir: String, checkpoint: String,
      groupCols: Seq[String], valCols: Seq[String],
      extremaCols: Seq[String], compactEvery: Int): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // runs ≤ id are settled the moment this body runs (their
        // batches are checkpoint-committed); persist the frontier
        // BEFORE any work so an external compactor never reads a
        // watermark ahead of what is actually durable
        new graft.ingest.FileCursorStore(watermarkDir(viewDir))
          .commit(id)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          val cs = graft.ext.Ivm.compact(batch.sparkSession, viewDir,
            Some(id), groupCols, None)
          System.err.println(s"[graft] ivm auto-compact batch=$id " +
            s"read=${cs.filesRead} wrote=${cs.filesWritten}")
        }
        graft.ext.Ivm.applyChanges(batch, viewDir, id + 1, groupCols,
          valCols, extremaCols)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Single-measure convenience form of [[start]]. */
  def start(changes: DataFrame, viewDir: String, checkpoint: String,
      groupCol: String = "status",
      valCol: String = "cents",
      compactEvery: Int = 8): StreamingQuery =
    start(changes, viewDir, checkpoint, Seq(groupCol), Seq(valCol),
      Nil, compactEvery)
}

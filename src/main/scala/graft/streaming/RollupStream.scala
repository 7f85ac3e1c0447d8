package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the sketch rollup ([[graft.ext.Rollup]] — SURVEY
  * §2.3 meets the materialized-summary family): each micro-batch of
  * events lands as ONE run partition of per-day HLL partials, so the
  * distinct-count summary is maintained by the stream at O(batch) cost
  * and a serve ([[graft.ext.Rollup.mergedDistinct]]) sees users up to
  * the last committed batch without ever touching the base table.
  *
  * Exactly-once on the summary itself: the run partition is keyed by
  * the micro-batch id (`run=<batchId>` overwrite), so a kill mid-batch
  * replays into a byte-identical rewrite — which matters here because a
  * duplicated PARTIAL row would not corrupt the estimate (HLL union is
  * idempotent) but WOULD double-count the exact `n_rows` monoid riding
  * the same summary. Multi-partial days across batches are the normal
  * state (a day closes only when the crawl moves past it); the serve
  * unions them, and [[graft.ext.Rollup.compact]] folds them into the
  * reserved epoch on the index family's auto-compaction policy. */
object RollupStream {

  /** AvailableNow drain: maintain the per-day user-distinct sketch
    * summary at `dir` from a stream of events rows (`ts`, `user_id`).
    * `maxFiles <= 0` disables auto-compaction. */
  def start(events: DataFrame, dir: String, checkpoint: String,
      maxFiles: Int = 64): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        if (maxFiles > 0 &&
            graft.ext.DedupIndex.dataFileCount(s, dir) > maxFiles) {
          val cs = graft.ext.Rollup.compact(s, dir,
            excludeRun = Some(batchId))
          System.err.println(s"[graft] rollup auto-compact run=$batchId " +
            s"read=${cs.filesRead} wrote=${cs.filesWritten}")
        }
        graft.ext.Rollup.buildDistinctSketches(batch, dir, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The EXACT-partials twin ([[graft.ext.Rollup.buildAggPartials]]):
    * per-(day, event_type) count + fixed-point cents partials, one run
    * partition per micro-batch — q139's +-monoid merge contract is
    * precisely what makes per-batch slicing safe, so the serve just
    * sums across however many batches a day arrived in. Exactly-once
    * by the same run-overwrite argument (here the exactness of `cnt`
    * and `value_cents` is the whole point, so the idempotent replay is
    * load-bearing, not belt-and-braces). */
  def startAgg(events: DataFrame, dir: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.Rollup.buildAggPartials(batch, dir, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

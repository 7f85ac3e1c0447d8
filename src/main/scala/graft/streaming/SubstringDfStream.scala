package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the substring-df index — the incremental family's
  * sixth streaming surface: each micro-batch of crawled documents is
  * excised against the persistent [[graft.ext.SubstringDfIndex]]
  * (every ≥k-token run shared with the seen corpus or the batch itself
  * is cut), so the forward-only curation contract q135 gates in batch
  * form runs as a stream. Cross-batch state IS the index directory —
  * per-doc shingle-fp pairs, never text — shared infrastructure outside
  * the Spark state store, like every sibling twin.
  *
  * Delivery: the batchId doubles as the index runId, so the index
  * commit is an idempotent per-run OVERWRITE (IvfPqStream's discipline)
  * and the cleaned per-doc rows land via the batch-keyed idempotent
  * sink; offsets commit last. A kill between index commit and offset
  * commit replays the batch: the run partition rewrites identically,
  * and the excision re-derives the SAME rows because df counts DISTINCT
  * doc_ids — a replayed doc's own stored pairs cannot make it its own
  * duplicate. Unlike IvfPqStream, auto-compaction needs NO in-flight
  * exclusion: a replay after an early compact re-writes its run
  * partition alongside the epoch, df stays correct under the distinct
  * count, and the next compact folds the duplicates away —
  * SubstringDfStreamSpec drives exactly that interleaving. */
object SubstringDfStream {

  /** AvailableNow drain: excise each micro-batch of (doc_id, text)
    * rows against the index at `indexDir`, writing the per-doc q134
    * rows to `out` in batch-keyed parquet. When the index's data-file
    * count exceeds `maxIndexFiles`, the micro-batch ends with a
    * compaction into the reserved epoch (`maxIndexFiles <= 0`
    * disables). */
  def start(docs: DataFrame, indexDir: String, out: String,
      checkpoint: String, k: Int = 8,
      maxIndexFiles: Int = 256): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cleaned = graft.ext.SubstringDfIndex.admit(
          batch.sparkSession, indexDir, batch, runId = batchId, k = k)
        EventsStream.writeBatchIdempotent(out)(cleaned, batchId)
        if (maxIndexFiles > 0 && graft.ext.DedupIndex.dataFileCount(
            batch.sparkSession, indexDir) > maxIndexFiles) {
          val cs = graft.ext.SubstringDfIndex.compact(
            batch.sparkSession, indexDir)
          System.err.println(s"[graft] auto-compact batch=$batchId " +
            s"read=${cs.filesRead} wrote=${cs.filesWritten}")
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of SEMANTIC dedup (SURVEY §2.3 meets the q79/q80
  * family): the hourly-cron incremental model applied to embedding
  * near-dup — each micro-batch of new vectors is admitted against the
  * persistent [[graft.ext.NearDupIndex]] (multi-probe LSH-bucket
  * probing + exact-cosine verification), so a semantic re-crawl is
  * rejected in any later micro-batch without ever re-scanning the
  * admitted corpus. The cross-batch state IS the index directory —
  * deliberately outside the Spark state store, because a dedup index is
  * shared infrastructure (other jobs probe it, batch backfills append
  * to it) rather than per-query state; the pattern mirrors the bronze
  * cache (S3/S4) and `CurationStream`'s fingerprint stage.
  *
  * Delivery: admitted vectors land in an idempotent per-batchId
  * overwrite layout (EventsStream.writeBatchIdempotent) and offsets
  * commit only after both the index append and the sink write — so a
  * kill mid-batch replays the batch, `NearDupIndex.admit`'s self-match
  * exclusion re-derives the SAME admissions against the
  * already-appended index rows, and the overwrite makes the output
  * byte-identical. NearDupStreamSpec proves cross-batch rejection and
  * the kill/restart path. */
object NearDupStream {

  /** AvailableNow drain: admit each micro-batch of (vec_id, embedding)
    * rows against the index at `indexDir`, writing admitted vectors to
    * `out` in batch-keyed parquet. `planes` is the index's fixed bucket
    * width (see NearDupIndex — part of the index identity).
    *
    * AUTO-COMPACTION: each admit appends one file per touched bucket,
    * so an unbounded stream decays the index at files ∝ batches ×
    * buckets. When the index's data-file count exceeds
    * `maxIndexFiles`, the micro-batch ends with a
    * `NearDupIndex.compact` (one file per bucket partition) —
    * single-writer safe by construction, because foreachBatch bodies
    * of one query never overlap and the index's only writer IS this
    * query. Replay safe: compaction is content-invariant, so a batch
    * replayed after a kill mid-compact re-derives the same admissions
    * against the compacted rows and the idempotent sink overwrites
    * byte-identically. `maxIndexFiles <= 0` disables the policy. */
  def start(vecs: DataFrame, indexDir: String, out: String,
      checkpoint: String, planes: Int, bar: Double = 0.9,
      maxIndexFiles: Int = 256): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val admitted = graft.ext.NearDupIndex.admit(
          batch.sparkSession, indexDir, batch, planes, bar)
        EventsStream.writeBatchIdempotent(out)(
          admitted.select("vec_id", "embedding"), batchId)
        if (maxIndexFiles > 0 && graft.ext.DedupIndex.dataFileCount(
            batch.sparkSession, indexDir) > maxIndexFiles) {
          val cs = graft.ext.NearDupIndex.compact(batch.sparkSession, indexDir)
          System.err.println(s"[graft] auto-compact batch=$batchId " +
            s"read=${cs.filesRead} wrote=${cs.filesWritten}")
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

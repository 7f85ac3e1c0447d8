package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the TEXT near-dup index — the third member of the
  * incremental-admission family ([[NearDupStream]] covers embeddings,
  * `CurationStream` exact fingerprints): each micro-batch of crawled
  * documents is admitted against the persistent
  * [[graft.ext.TextNearDupIndex]] (MinHash band-key probe +
  * stored-signature agreement ≥ 15/16), so a boilerplate re-render or
  * trivially-edited re-crawl is rejected in any later micro-batch
  * without re-shingling the admitted corpus. The cross-batch state IS
  * the index directory — persisted signatures and band keys, never
  * text — shared infrastructure outside the Spark state store, exactly
  * like NearDupStream's bucket index.
  *
  * Delivery: admitted (doc_id, sig) rows land in an idempotent
  * per-batchId overwrite layout and offsets commit only after both the
  * index append and the sink write — a kill mid-batch replays the
  * batch, and `TextNearDupIndex.admit`'s self-match exclusion
  * re-derives the SAME admissions against the already-appended
  * signature rows. TextNearDupStreamSpec proves cross-batch rejection
  * and the kill/restart path. */
object TextNearDupStream {

  /** AvailableNow drain: admit each micro-batch of (doc_id, text) rows
    * against the signature index at `indexDir`, writing admitted
    * (doc_id, sig) rows to `out` in batch-keyed parquet.
    *
    * AUTO-COMPACTION: each admit appends up to one file per task, so
    * an unbounded stream decays the flat signature table at files ∝
    * batches × tasks. When the index's data-file count exceeds
    * `maxIndexFiles`, the micro-batch ends with a
    * `TextNearDupIndex.compact` (defaultParallelism files total) —
    * single-writer and replay safe for the same reasons as
    * [[NearDupStream]]'s policy (foreachBatch bodies never overlap;
    * compaction is content-invariant). `maxIndexFiles <= 0` disables
    * the policy. */
  def start(docs: DataFrame, indexDir: String, out: String,
      checkpoint: String, minMatches: Int = 15,
      maxIndexFiles: Int = 256): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val admitted = graft.ext.TextNearDupIndex.admit(
          batch.sparkSession, indexDir, batch, minMatches)
        EventsStream.writeBatchIdempotent(out)(admitted, batchId)
        if (maxIndexFiles > 0 && graft.ext.DedupIndex.dataFileCount(
            batch.sparkSession, indexDir) > maxIndexFiles) {
          val cs = graft.ext.TextNearDupIndex.compact(
            batch.sparkSession, indexDir)
          System.err.println(s"[graft] auto-compact batch=$batchId " +
            s"read=${cs.filesRead} wrote=${cs.filesWritten}")
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

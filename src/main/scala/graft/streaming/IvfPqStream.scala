package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the persisted ANN index (SURVEY §2.3 meets
  * [[graft.ext.IvfPqIndex]]): each micro-batch of new vectors is
  * ENCODED against the index's frozen codebooks and lands in the
  * persistent code table, so the serve side always sees the crawl up
  * to the last committed batch without any retraining in the hot path.
  * Codebook training stays a batch job ([[graft.ext.IvfPqIndex.create]]
  * must have run before the stream starts — the stream throws
  * otherwise, by the index's own no-codebooks contract); this is
  * FAISS's train-once/add-forever split laid onto foreachBatch.
  *
  * Delivery is EXACTLY-ONCE on the index itself, stronger than the
  * other index streams' documented duplicate-tolerance: the index add
  * is keyed by the micro-batch id (`batch=<batchId>` partition
  * overwrite), so a kill mid-batch replays into a byte-identical
  * rewrite, never duplicate code rows — which matters here because a
  * duplicated code row would double-count ADC sub-terms in every later
  * search. The admitted sink uses the same idempotent per-batchId
  * layout (EventsStream.writeBatchIdempotent).
  *
  * AUTO-COMPACTION runs at the START of a micro-batch, with the
  * in-flight batchId EXCLUDED from the rewrite: only committed runs
  * collapse into the `batch=-1` epoch, and a half-written attempt from
  * a previous failed run of THIS batch is dropped, not merged — its
  * replay rewrites the whole partition right after. Single-writer safe
  * because foreachBatch bodies of one query never overlap and the
  * index's only writer IS this query. `maxIndexFiles <= 0` disables
  * the policy. */
object IvfPqStream {

  /** AvailableNow drain: encode each micro-batch of (vec_id, embedding)
    * rows into the IvfPq index at `indexDir` (codebooks already
    * trained), writing the encoded rows to `out` in batch-keyed
    * parquet. */
  def start(vecs: DataFrame, indexDir: String, out: String,
      checkpoint: String, maxIndexFiles: Int = 256): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        if (maxIndexFiles > 0 &&
            graft.ext.DedupIndex.dataFileCount(s, indexDir) > maxIndexFiles) {
          val cs = graft.ext.IvfPqIndex.compact(s, indexDir,
            excludeBatch = Some(batchId))
          System.err.println(s"[graft] auto-compact batch=$batchId " +
            s"read=${cs.filesRead} wrote=${cs.filesWritten}")
        }
        val added = graft.ext.IvfPqIndex.add(s, indexDir, batch, batchId)
        EventsStream.writeBatchIdempotent(out)(
          added.select("vec_id", "cell"), batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** DELETION twin: drain a stream of tombstoned vec_ids into the
    * index's lazy `_tombstones` side table
    * ([[graft.ext.IvfPqIndex.forget]]) — the deletion-request feed a
    * production vector store consumes next to its ingest feed.
    * Duplicate-TOLERANT rather than exactly-once: a replayed batch
    * re-appends the same ids, and a duplicate tombstone is semantically
    * idempotent (the serve anti-join and the compaction drop key by id)
    * — the fingerprint indexes' harmless-retry-row contract, which is
    * why this sink needs no batch-keyed layout. The add stream's
    * auto-compaction physically retires whatever tombstones have
    * accumulated, so the side table stays bounded by the deletion rate
    * between compactions. */
  def startForgets(tombstones: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    tombstones.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ext.IvfPqIndex.forget(batch.sparkSession, indexDir, batch)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

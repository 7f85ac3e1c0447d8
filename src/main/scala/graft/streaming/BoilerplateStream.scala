package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the boilerplate-cleaning index (SURVEY §2.3 meets
  * [[graft.ext.BoilerplateIndex]]): each micro-batch of crawled
  * documents commits its segment-df DELTA to the persistent index and
  * is cleaned against the cumulative frequencies — so chrome that three
  * crawls have carried strips from every later batch without ever
  * re-scanning the admitted corpus. Detection lags by construction
  * (the index's documented semantics): a batch is cleaned against the
  * state up to and including itself, and earlier batches' outputs are
  * not retroactively recleaned.
  *
  * Delivery is EXACTLY-ONCE on the index (IvfPqStream's discipline,
  * required here because a double-counted df delta CHANGES cleaning
  * verdicts, unlike the fingerprint indexes' harmless duplicates): the
  * delta write is keyed by batchId (`batch=<batchId>` overwrite), and
  * the cleaned sink uses the idempotent per-batchId layout. A replay
  * therefore re-commits the same delta AND re-derives the same
  * verdicts — the df state it cleans against is byte-identical.
  *
  * AUTO-COMPACTION runs at the START of a micro-batch with the
  * in-flight batchId EXCLUDED (IvfPqStream's policy, same reasoning:
  * only committed runs fold into the batch=-1 epoch; a half-written
  * attempt of THIS batch is dropped and rewritten by the replay that
  * follows). */
object BoilerplateStream {

  /** AvailableNow drain: commit each micro-batch's df delta, clean the
    * batch against the cumulative index, and write the cleaned verdicts
    * (doc_id, n_segments, n_removed, cleaned_fp) to `out` in
    * batch-keyed parquet. `maxIndexFiles <= 0` disables compaction. */
  def start(docs: DataFrame, indexDir: String, out: String,
      checkpoint: String, maxIndexFiles: Int = 256): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        if (maxIndexFiles > 0 &&
            graft.ext.DedupIndex.dataFileCount(s, indexDir) > maxIndexFiles) {
          val cs = graft.ext.BoilerplateIndex.compact(s, indexDir,
            excludeBatch = Some(batchId))
          System.err.println(s"[graft] auto-compact batch=$batchId " +
            s"read=${cs.filesRead} wrote=${cs.filesWritten}")
        }
        graft.ext.BoilerplateIndex.add(s, indexDir, batch, batchId)
        val cleaned = graft.ext.BoilerplateIndex.clean(s, indexDir, batch)
        EventsStream.writeBatchIdempotent(out)(cleaned, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the q68 curation gate chain (SURVEY §2.3 meets the
  * north star): the reference's incremental path is an hourly cron that
  * processes only new records — a production curation DAG runs its
  * per-document gates (lang-ID → quality → length → split) the same way,
  * on each micro-batch as it arrives, rather than re-scanning the corpus.
  *
  * The gates are the EXACT SAME function q68 runs in batch
  * (graft.ext.Assembly.curationGates): pure per-row expressions, so the
  * streaming plan is entirely STATELESS — no watermark, no state store,
  * unbounded-source safe at any rate. Cross-batch exact dedup is the one
  * stage that needs state and stays a separate composable operator
  * (EventsStream.dedup, watermark-bounded).
  *
  * Delivery: the foreachBatch sink is the idempotent per-batchId
  * overwrite (EventsStream.writeBatchIdempotent), and offsets commit only
  * after the write returns — sink-then-commit, so a kill/restart replays
  * the in-flight batch into the same directory instead of duplicating or
  * dropping it (CurationStreamSpec proves both). */
object CurationStream {

  /** Gate a streaming (or batch) (doc_id, lang, text) relation — the q68
    * chain minus its dedup window. */
  def gated(docs: DataFrame): DataFrame =
    graft.ext.Assembly.curationGates(docs)

  /** AvailableNow drain of the gated stream into an idempotent
    * batch-keyed parquet layout. */
  def startToParquet(docs: DataFrame, out: String,
      checkpoint: String): StreamingQuery =
    gated(docs).writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch(EventsStream.writeBatchIdempotent(out) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

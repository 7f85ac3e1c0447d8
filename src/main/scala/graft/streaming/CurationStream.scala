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

  /** Cross-batch exact dedup on the CONTENT fingerprint — the stateful
    * stage of the curation chain (q30/q68's dedup in incremental form):
    * the state store keeps one md5 digest per distinct document ever
    * seen, so a re-crawled or re-delivered document is dropped in any
    * later micro-batch, exactly like the batch window keeps only the
    * first (min doc_id) copy. State is keyed on the 128-bit digest, never
    * the text — the q30 shuffle discipline carried into the state store.
    * Retention is unbounded by design here (a corpus's identity set IS
    * its state); a horizon-bounded deployment swaps in
    * dropDuplicatesWithinWatermark on an event-time column. */
  def dedupByFingerprint(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, md5}
    docs.withColumn("fp", md5(col("text")))
      .dropDuplicates("fp")
      .drop("fp")
  }

  /** The full incremental curation chain: stateful content dedup, then
    * the stateless gates. */
  def curated(docs: DataFrame): DataFrame = gated(dedupByFingerprint(docs))

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

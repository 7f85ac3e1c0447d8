package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.ext.MergeTable

/** STREAMING CDC SOURCE over the snapshot table's changefeed: offsets
  * ARE table versions, each micro-batch is `changes(from, to]` — the
  * Delta `readChangeFeed` stream shape, and the streaming-native form
  * of [[graft.ingest.ChangefeedRunner]]'s cursor discipline (itself
  * the reference's resume-cursor idiom,
  * src/extract_github_data.py:164-235). Downstream maintainers
  * ([[graft.streaming.IvmStream]], [[graft.streaming.RollupStream]])
  * subscribe directly instead of being runner-polled, and exactly-once
  * falls out of Structured Streaming's offset log: a version range,
  * once committed to the checkpoint, is never re-delivered, and a
  * replayed uncommitted range re-reads the SAME immutable snapshots —
  * the manifests are the version history, so redelivery is
  * deterministic by construction.
  *
  * Everything the batch changefeed earned rides along per micro-batch:
  * fingerprint-pruned bucket diffs, the layout-only short-circuit (a
  * window straddling OPTIMIZE or rebucket yields a ZERO-ROW batch for
  * two manifest reads), and schema-evolution alignment.
  *
  * `initialVersion` pins the bootstrap snapshot: the first batch reads
  * `(initialVersion, latest]`, so a consumer initialized from version
  * V's snapshot passes V and never double-counts the bootstrap
  * (default: the newest committed version when the source is created —
  * "changes from now on"). RETENTION contract, loud: vacuum must
  * retain any version still unconsumed by the stream's checkpoint —
  * [[MergeTable.changes]] on a vacuumed endpoint names the missing
  * version rather than silently skipping rows. `pinFrontier=true`
  * automates the knob: the source maintains a TAG at its committed
  * frontier (advanced in the engine's batch-commit callback), and
  * since vacuum retains tag-pinned versions, an aggressive retention
  * setting can never outrun a lagging stream. Without it,
  * retainVersions (or a manual tag) remains the operator's contract.
  *
  * Usage:
  * {{{
  * spark.readStream.format("merge-table-changes")
  *   .option("dir", "/path/to/table")
  *   .option("initialVersion", 1L)
  *   .load()
  * }}} */
final class ChangefeedSource(sqlContext: SQLContext, dir: String,
    startVersion: Long, pinName: Option[String] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark = sqlContext.sparkSession

  // FRONTIER AUTO-PIN (`pinFrontier` option): the source maintains
  // TWO tags bracketing its in-flight window so
  // [[MergeTable.vacuum]] — which retains tag-pinned versions past
  // retainVersions — can never sweep a manifest the stream might
  // still need, however aggressive the retention knob and however
  // far the stream lags. `<pin>` holds the current batch's diff BASE
  // (the last committed offset: a crash before the checkpoint commit
  // replays from it) and `<pin>.head` the batch's END (the engine
  // stops an AvailableNow run WITHOUT calling [[commit]] on the final
  // batch, so on restart the committed frontier is the previous
  // END — one pin at the base alone would let vacuum sweep it
  // between runs). Both advance monotonically in [[getBatch]]; the
  // base additionally advances in [[commit]] when the engine does
  // call it. Tags are immutable by design; advancing = dropTag +
  // re-tag, and the retention re-check inside tag() covers the
  // hand-over window against a RACING vacuum; a crash BETWEEN the
  // drop and the re-tag loses that pin until the query restarts
  // (first act: re-pin), so the worst case of a crash + immediate
  // hot vacuum in that gap is the LOUD missing-version error — never
  // silent row loss. Without the option the retention contract stays
  // the documented manual knob.
  pinName.foreach { n =>
    advancePin(n, startVersion); advancePin(s"$n.head", startVersion)
  }

  private def advancePin(name: String, v: Long): Unit = {
    val cur = scala.util.Try(
      MergeTable.tagVersion(spark, dir, name)).toOption
    if (cur.exists(_ >= v)) return // a restarted query replaying an
    // older offset must not drag the pin (and retention) backwards
    cur.foreach(_ => MergeTable.dropTag(spark, dir, name))
    MergeTable.tag(spark, dir, name, Some(v)): Unit
  }

  override def commit(end: Offset): Unit =
    pinName.foreach(advancePin(_, versionOf(end)))

  /** Version ceiling captured when an AvailableNow run starts: the
    * run drains everything committed AT THAT MOMENT and stops —
    * versions landing mid-run wait for the next trigger (the
    * FileStreamSource admission-control discipline, which also
    * retires the engine's single-batch fallback warning). */
  @volatile private var availableNowCap: Option[Long] = None

  private def latestVersion: Long =
    MergeTable.versions(spark, dir).lastOption.getOrElse(startVersion)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(math.max(latestVersion, startVersion))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val cur = math.max(latestVersion, startVersion)
    VersionOffset(availableNowCap.fold(cur)(math.min(cur, _)))
  }

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    VersionOffset(math.max(latestVersion, startVersion))

  /** The changefeed schema is stable per table (key + old_row/new_row
    * payload structs + change class); probed once via a self-diff of
    * the start version — two manifest reads and one footer. */
  override val schema: StructType =
    MergeTable.changes(spark, dir, startVersion, startVersion).schema

  private case class VersionOffset(v: Long) extends Offset {
    override def json: String = v.toString
  }

  private def versionOf(o: Offset): Long = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset from the log
  }

  override def getOffset: Option[Offset] = {
    val cur = MergeTable.versions(spark, dir).lastOption
      .getOrElse(startVersion)
    Some(VersionOffset(math.max(cur, startVersion)))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startVersion)
    val toV = versionOf(end)
    pinName.foreach { n =>
      advancePin(n, fromV); advancePin(s"$n.head", toV)
    }
    val batch =
      if (toV <= fromV) // engine replay of an empty range
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else MergeTable.changes(spark, dir, fromV, toV)
    // changes() speaks the DESTINATION version's logical names, but
    // this source declared `schema` once, at startVersion: a schema
    // evolution commit mid-stream (rename/drop/extend — it lands in
    // the old_row/new_row payload STRUCTS, so sameType, not top-level
    // field names, is the test) would otherwise surface downstream as
    // an engine plan-schema assertion or a silently misaligned sink.
    // Name the condition and the remedy instead — the stream must be
    // restarted (fresh source = fresh pinned schema; the checkpoint's
    // version offsets stay valid, so no change is lost or
    // re-delivered).
    if (batch.schema.catalogString != schema.catalogString)
      throw new IllegalStateException(
        s"merge-table-changes at $dir: the table's schema evolved " +
          s"mid-stream (batch ($fromV,$toV] speaks " +
          s"${batch.schema.catalogString}; this stream was started " +
          s"under ${schema.catalogString}). Restart the streaming " +
          "query to adopt the new schema — its checkpointed version " +
          "offsets remain valid.")
    // the engine asserts a streaming-flagged plan from a V1 source
    org.apache.spark.sql.graft.Bridge.asStreaming(batch)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"ChangefeedSource[$dir, start=$startVersion]"
}

/** Provider: `format("merge-table-changes")` (service-registered) or
  * the full class name. Options: `dir` (required), `initialVersion`
  * (optional — defaults to the newest committed version at source
  * creation; only consulted before the first checkpointed batch). */
final class ChangefeedSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "merge-table-changes"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("dir", throw new IllegalArgumentException(
      "merge-table-changes requires .option(\"dir\", <table path>)"))

  private def startOf(sqlContext: SQLContext,
      parameters: Map[String, String]): Long = {
    val dir = dirOf(parameters)
    parameters.get("initialVersion").map(_.trim.toLong).getOrElse(
      MergeTable.versions(sqlContext.sparkSession, dir).lastOption
        .getOrElse(throw new IllegalArgumentException(
          s"no MergeTable at $dir")))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "merge-table-changes derives its schema from the table — do not " +
        "pass one")
    val dir = dirOf(parameters)
    val v = startOf(sqlContext, parameters)
    (shortName(),
      MergeTable.changes(sqlContext.sparkSession, dir, v, v).schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    // `pinFrontier=true` derives a stable per-query tag name from the
    // checkpoint's metadata path (unique per streaming query by
    // construction), so restarts of the SAME query adopt the same pin
    // and distinct queries never fight over one
    val pin = parameters.get("pinFrontier").filter(_.trim.toBoolean)
      .map { _ =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(metadataPath.getBytes("UTF-8"))
          .take(6).map(b => f"$b%02x").mkString
        s"stream-$h"
      }
    new ChangefeedSource(sqlContext, dirOf(parameters),
      startOf(sqlContext, parameters), pin)
  }
}

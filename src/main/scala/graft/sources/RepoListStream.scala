package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptions}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Streaming twin of the paginated keyset list scan (SURVEY §2.3 offset
  * mapping): the micro-batch OFFSET IS THE KEYSET CURSOR — the last repo
  * id planned — so Structured Streaming's checkpointed offset log plays
  * the role the reference's last_repo_id state file plays (reference
  * src/extract_github_data.py:164-235), with exactly-once batch planning
  * for free: after a kill, the engine replays/resumes from the last
  * committed cursor, never from 0.
  *
  * FETCH-ONCE DISCIPLINE (quota is the scarce resource against a real
  * rate-limited API): every page is fetched exactly once, on the DRIVER,
  * through ONE shared RateLimit.Admission, and the rows are cached and
  * HANDED to the partition — the executor reader never re-fetches what
  * offset planning already paid for. The cache is pruned at commit(), so
  * driver memory holds only in-flight batches. The auth-regime
  * `requestBudget` (60 anonymous / 5000 token, same switch as the batch
  * scan) bounds total page fetches across the walk; exhaustion stops
  * planning with a logged warning instead of silently re-issuing.
  *
  * `maxIdsPerTrigger` bounds each micro-batch (the streaming analog of
  * the batch source's pushed limit); Trigger.AvailableNow drains to the
  * fixture's end across several bounded batches. */
final case class RepoStreamOffset(lastId: Long) extends Offset {
  override def json(): String = s"""{"lastId":$lastId}"""
}

final class RepoListMicroBatchStream(path: String, since: Long,
    pageSize: Int, maxIdsPerTrigger: Int, policy: RateLimit.Policy,
    requestBudget: Int = Int.MaxValue,
    fetcherFactory: String => PageFetcher = new JsonFileFetcher(_))
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val fetcher = fetcherFactory(path)
  // ONE admission controller for the whole walk: backoff / floor-pause
  // state is never split between planner and reader
  private val admission = new RateLimit.Admission(policy)

  // planner-side row cache, ids strictly ascending; walkedTo = cursor
  // through which the upstream has been fetched in this incarnation
  private val cache = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
  private var walkedTo: Long = since
  private var fetched = 0
  private var warnedBudget = false
  // AvailableNow target: fixed at prepare time so the drain terminates
  // even if the upstream keeps growing mid-run
  @volatile private var availableNowTarget: Option[Long] = None

  private def budgetLeft: Boolean = fetched < requestBudget

  private def warnBudget(): Unit = if (!warnedBudget) {
    warnedBudget = true
    log.warn(s"graft-repos stream: request budget of $requestBudget page " +
      "fetches exhausted; planning stops at the current cursor (results " +
      "are truncated, not complete)")
  }

  /** Advance the keyset walk, appending to the cache, until `need` rows
    * beyond `from` are cached, the upstream has no more rows right now,
    * or the request budget is exhausted. The only fetch path in the
    * class. */
  private def extendCache(from: Long, need: Long): Unit = {
    var after = cache.iterator.count(_._1 > from)
    var drained = false
    while (after < need && !drained && budgetLeft) {
      val rows = admission.fetchPage(fetcher, walkedTo, pageSize)
      fetched += 1
      if (rows.isEmpty) drained = true
      else {
        cache ++= rows
        walkedTo = rows.last._1
        after += rows.count(_._1 > from)
      }
    }
    if (after < need && !drained && !budgetLeft) warnBudget()
  }

  override def initialOffset(): Offset = RepoStreamOffset(since)

  override def deserializeOffset(json: String): Offset = {
    val id = """\d+""".r.findFirstIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))
      .toLong
    RepoStreamOffset(id)
  }

  override def prepareForTriggerAvailableNow(): Unit = {
    // drain target = the last id currently visible upstream; the walk
    // fills the cache, so the drain's batches re-fetch NOTHING
    extendCache(Long.MaxValue, 1) // walks until drained (or budget out)
    availableNowTarget = Some(if (cache.nonEmpty) cache.last._1 else walkedTo)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxIdsPerTrigger)

  /** Admission-controlled batch planning: advance the cursor by at most
    * the read limit's rows, clamped to the AvailableNow drain target.
    * Rows discovered here are cached for planInputPartitions — planning
    * IS the fetch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[RepoStreamOffset].lastId
    val cap = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _ => maxIdsPerTrigger.toLong
    }
    extendCache(from, cap)
    val planned = cache.iterator.filter(_._1 > from).take(
      math.min(cap, Int.MaxValue.toLong).toInt).toSeq
    val next = if (planned.isEmpty) from else planned.last._1
    RepoStreamOffset(availableNowTarget.fold(next)(math.min(next, _)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  /** Hand the cached rows for (start, end] to the executor. The normal
    * path is a pure cache slice; a WAL replay after a restart (offsets
    * re-planned from the checkpoint before any latestOffset call in this
    * incarnation) re-walks the range through the same budget-counted
    * admission path. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[RepoStreamOffset].lastId
    val to = end.asInstanceOf[RepoStreamOffset].lastId
    while (walkedTo < to && budgetLeft) {
      val rows = admission.fetchPage(fetcher, walkedTo, pageSize)
      fetched += 1
      if (rows.isEmpty) walkedTo = to // upstream shrank below the offset
      else { cache ++= rows; walkedTo = rows.last._1 }
    }
    if (walkedTo < to)
      throw new IllegalStateException(
        s"graft-repos stream: request budget of $requestBudget exhausted " +
          s"while replaying committed range ($from, $to] — refusing to " +
          "plan a partial batch")
    val slice = cache.iterator
      .filter(r => r._1 > from && r._1 <= to).map(_._2).toArray
    Array(RepoStreamPartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RepoStreamReaderFactory(graft.ingest.RepoSchema.raw)

  /** The offset log is the state; a committed batch's rows can leave the
    * planner cache (bounded driver memory over a long-running stream). */
  override def commit(end: Offset): Unit = {
    val upTo = end.asInstanceOf[RepoStreamOffset].lastId
    val keep = cache.dropWhile(_._1 <= upTo)
    cache.clear()
    cache ++= keep
  }

  override def stop(): Unit = ()
}

/** Micro-batch slice with its rows INLINE: the planner already fetched
  * and paid admission for them — shipping them with the partition is
  * what makes the source fetch-once. Bounded by maxIdsPerTrigger. */
case class RepoStreamPartition(rows: Array[String]) extends InputPartition

final class RepoStreamReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RepoStreamReader(schema, p.asInstanceOf[RepoStreamPartition])
}

/** Parses the planner-fetched JSON rows — no transport, no admission
  * state on the executor. */
final class RepoStreamReader(schema: StructType, part: RepoStreamPartition)
    extends PartitionReader[InternalRow] {

  private val parser = {
    val opts = new JSONOptions(Map.empty[String, String], "UTC")
    new JacksonParser(schema, opts, allowArrayAsStructs = false)
  }

  private val it = part.rows.iterator
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (it.hasNext) {
      parser.parse(UTF8String.fromString(it.next()),
        CreateJacksonParser.utf8String, identity[UTF8String]).headOption match {
        case Some(r) => current = r; return true
        case None => () // skip malformed line
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

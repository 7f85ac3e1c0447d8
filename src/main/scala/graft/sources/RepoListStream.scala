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
  * `maxIdsPerTrigger` bounds each micro-batch (the streaming analog of
  * the batch source's pushed limit / request budget); Trigger.AvailableNow
  * drains to the fixture's end across several bounded batches. */
final case class RepoStreamOffset(lastId: Long) extends Offset {
  override def json(): String = s"""{"lastId":$lastId}"""
}

final class RepoListMicroBatchStream(path: String, since: Long,
    pageSize: Int, maxIdsPerTrigger: Int, policy: RateLimit.Policy)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val fetcher = new JsonFileFetcher(path)
  private val admission = new RateLimit.Admission(policy)
  // AvailableNow target: fixed at prepare time so the drain terminates
  // even if the upstream keeps growing mid-run
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = RepoStreamOffset(since)

  override def deserializeOffset(json: String): Offset = {
    val id = """\d+""".r.findFirstIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))
      .toLong
    RepoStreamOffset(id)
  }

  override def prepareForTriggerAvailableNow(): Unit = {
    // drain target = the last id currently visible in the fixture
    var cur = since
    var rows = fetcher.fetch(cur, pageSize)
    while (rows.nonEmpty) { cur = rows.last._1; rows = fetcher.fetch(cur, pageSize) }
    availableNowTarget = Some(cur)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxIdsPerTrigger)

  /** Admission-controlled batch planning: advance the cursor by at most
    * the read limit's rows, clamped to the AvailableNow drain target. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[RepoStreamOffset].lastId
    val cap = limit match {
      case mr: ReadMaxRows => math.min(mr.maxRows(), Int.MaxValue.toLong).toInt
      case _ => maxIdsPerTrigger
    }
    val rows = admission.fetchPage(fetcher, from, cap)
    val next = if (rows.isEmpty) from else rows.last._1
    RepoStreamOffset(availableNowTarget.fold(next)(math.min(next, _)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(RepoStreamPartition(path,
      start.asInstanceOf[RepoStreamOffset].lastId,
      end.asInstanceOf[RepoStreamOffset].lastId, pageSize, policy))

  override def createReaderFactory(): PartitionReaderFactory =
    new RepoStreamReaderFactory(graft.ingest.RepoSchema.raw)

  override def commit(end: Offset): Unit = () // the offset log is the state

  override def stop(): Unit = ()
}

case class RepoStreamPartition(path: String, fromId: Long, toId: Long,
    pageSize: Int, policy: RateLimit.Policy) extends InputPartition

final class RepoStreamReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RepoStreamReader(schema, p.asInstanceOf[RepoStreamPartition])
}

/** Serial keyset walk over the half-open id range (fromId, toId] — the
  * micro-batch slice the offsets delimit. Same page mechanics as the
  * batch reader. */
final class RepoStreamReader(schema: StructType, part: RepoStreamPartition)
    extends PartitionReader[InternalRow] {

  private val fetcher = new JsonFileFetcher(part.path)
  private val admission = new RateLimit.Admission(part.policy)
  private val parser = {
    val opts = new JSONOptions(Map.empty[String, String], "UTC")
    new JacksonParser(schema, opts, allowArrayAsStructs = false)
  }

  private var cursor = part.fromId
  private var page: Iterator[(Long, String)] = Iterator.empty
  private var current: InternalRow = _
  private var exhausted = cursor >= part.toId

  override def next(): Boolean = {
    while (!page.hasNext && !exhausted) {
      val rows = admission.fetchPage(fetcher, cursor, part.pageSize)
        .filter(_._1 <= part.toId) // offsets delimit the batch exactly
      if (rows.isEmpty) exhausted = true
      else {
        cursor = rows.last._1
        if (cursor >= part.toId) exhausted = true
        page = rows.iterator
      }
    }
    if (!page.hasNext) return false
    parser.parse(UTF8String.fromString(page.next()._2),
      CreateJacksonParser.utf8String, identity[UTF8String]).headOption match {
      case Some(r) => current = r; true
      case None => next() // skip malformed line
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

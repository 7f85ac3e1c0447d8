package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptions}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference's paginated keyset list scan
  * (S1, reference src/extract_github_data.py:394-435): `GET
  * /repositories?since={id}&per_page={n}` becomes a Spark table with
  *
  *   - **keyset filter pushdown**: `WHERE id > since` is absorbed into
  *     the source (SupportsPushDownFilters) instead of scanning from 0 —
  *     the incremental-resume predicate never materializes dropped rows;
  *   - **limit pushdown** (SupportsPushDownLimit): the run budget
  *     (reference :630, MAX_REQUESTS_PER_RUN-1) stops pagination at the
  *     source, the moral of the reference slicing the list BEFORE the
  *     per-repo detail fetch;
  *   - **rate-limit admission control**: a token-bucket pause between
  *     pages inside the partition reader (reference :372-391,:465 — 1 s
  *     inter-request delay), configurable via `pageDelayMs`.
  *
  * The transport is pluggable: this environment has no network, so pages
  * are served from a JSON-lines fixture (`path` option) shaped exactly
  * like the API (FIXTURES.md §A2). A real REST transport implements the
  * same PageFetcher contract: fetch(sinceId, pageSize) -> rows whose ids
  * strictly ascend. Pagination is inherently serial (each page's cursor
  * comes from the previous page), hence a single InputPartition — the
  * parallelism story at scale is many *source instances* (id ranges /
  * shards), not parallel pages of one cursor walk.
  */
class RepoListSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-repos"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.ingest.RepoSchema.raw

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RepoListTable(schema)
}

final class RepoListTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "graft_repo_list"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RepoListScanBuilder(schema, options)
}

final class RepoListScanBuilder(schema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownFilters {

  private var limit: Int = Int.MaxValue
  private var since: Long = options.getLong("since", 0L)
  private var pushed: Array[Filter] = Array.empty

  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // absorb the keyset predicate AND IsNotNull(id): ids are never null in
    // a keyset walk, and leaving IsNotNull as a post-scan Filter would
    // block limit pushdown (Limit can't cross a residual Filter node)
    val (absorbed, rest) = filters.partition {
      case GreaterThan("id", _: Long) => true
      case org.apache.spark.sql.sources.IsNotNull("id") => true
      case _ => false
    }
    absorbed.foreach {
      case GreaterThan(_, v: Long) => since = math.max(since, v)
      case _ => ()
    }
    pushed = absorbed
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // Auth regime switch (reference src/extract_github_data.py:25-28,:365):
    // a token moves the hourly request budget 60 -> 5000 and scales the
    // proactive low-quota floor with it. Both remain option-overridable.
    val authenticated = options.containsKey("token")
    new RepoListScan(schema,
      options.get("path"), since, limit,
      options.getInt("pageSize", 100), options.getLong("pageDelayMs", 0L),
      authenticated,
      options.getInt("requestBudget", if (authenticated) 5000 else 60),
      options.getInt("maxIdsPerTrigger", 1000),
      RateLimit.Policy(
        baseBackoffMs = options.getLong("backoffMs", 1000L),
        maxRetries = options.getInt("maxRetries", 3),
        quotaFloor = options.getInt("quotaFloor", if (authenticated) 50 else 5),
        floorDelayMs = options.getLong("floorDelayMs", 60000L)))
  }
}

/** `authenticated` mirrors the reference's token regime switch (T7,
  * reference src/extract_github_data.py:351-369): a real REST transport
  * decorates requests with the token and gets the 5000 req/h budget.
  * The regime is BEHAVIORAL, not just plan-visible: `requestBudget`
  * bounds the number of page fetches the walk may issue (60 anonymous,
  * 5000 with token), the moral of the reference slicing its work to
  * MAX_REQUESTS_PER_RUN before fetching. */
final class RepoListScan(schema: StructType, path: String, since: Long,
    limit: Int, pageSize: Int, pageDelayMs: Long,
    authenticated: Boolean = false,
    requestBudget: Int = 60,
    maxIdsPerTrigger: Int = 1000,
    policy: RateLimit.Policy = RateLimit.Policy()) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  /** Streaming twin (SURVEY §2.3): the checkpointed offset is the keyset
    * cursor — see RepoListMicroBatchStream. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RepoListMicroBatchStream(path, since, pageSize, maxIdsPerTrigger,
      policy, requestBudget)
  override def planInputPartitions(): Array[InputPartition] =
    Array(RepoListPartition(path, since, limit, pageSize, pageDelayMs,
      requestBudget, policy))
  override def createReaderFactory(): PartitionReaderFactory =
    new RepoListReaderFactory(schema)
  override def description(): String =
    s"graft-repos since=$since limit=$limit pageSize=$pageSize " +
      s"auth=${if (authenticated) "token" else "anonymous"} " +
      s"budget=$requestBudget"
}

case class RepoListPartition(path: String, since: Long, limit: Int,
    pageSize: Int, pageDelayMs: Long,
    requestBudget: Int = 60,
    policy: RateLimit.Policy = RateLimit.Policy()) extends InputPartition

final class RepoListReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RepoListPartition]
    new RepoListReader(schema, part)
  }
}

/** Serial keyset walk: page i+1's `since` is the last id of page i.
  * The pushed limit bounds total rows; the token-bucket delay spaces
  * page fetches like the reference's REQUEST_DELAY. */
final class RepoListReader(schema: StructType, part: RepoListPartition)
    extends PartitionReader[InternalRow] {

  private val fetcher = new JsonFileFetcher(part.path)
  private val parser = {
    val opts = new JSONOptions(Map.empty[String, String], "UTC")
    new JacksonParser(schema, opts, allowArrayAsStructs = false)
  }
  private val toRow = (json: String) =>
    parser.parse(UTF8String.fromString(json),
      CreateJacksonParser.utf8String, identity[UTF8String]).headOption

  private val admission = new RateLimit.Admission(part.policy)
  private var cursor = part.since
  private var emitted = 0
  private var fetched = 0
  private var page: Iterator[String] = Iterator.empty
  private var current: InternalRow = _
  private var exhausted = false

  override def next(): Boolean = {
    if (emitted >= part.limit) return false
    while (!page.hasNext && !exhausted) {
      // auth-regime budget: the walk never issues more page fetches than
      // the current regime's hourly allowance (60 anon / 5000 token).
      // Stopping on budget TRUNCATES the scan — warn so a budget-bound
      // result is distinguishable from a complete one in the logs.
      if (fetched >= part.requestBudget) {
        exhausted = true
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"graft-repos: request budget of ${part.requestBudget} page " +
            s"fetches exhausted at cursor $cursor; scan result is " +
            "truncated, not end-of-data")
      }
      else {
        if (emitted > 0 && part.pageDelayMs > 0)
          Thread.sleep(part.pageDelayMs) // fixed-delay floor between pages
        // adaptive admission on top of the floor: exponential backoff on a
        // rate-limit rejection, proactive pause on low reported quota
        val rows = admission.fetchPage(fetcher, cursor, part.pageSize)
        fetched += 1
        if (rows.isEmpty) exhausted = true
        else {
          cursor = rows.last._1 // keyset invariant: ids strictly ascend
          page = rows.iterator.map(_._2)
        }
      }
    }
    if (!page.hasNext) return false
    toRow(page.next()) match {
      case Some(r) => current = r; emitted += 1; true
      case None => next() // skip malformed line (counted upstream)
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Transport contract: one "API page" per call — rows with id > since,
  * ascending, at most pageSize. Transports that see rate-limit headers
  * (X-RateLimit-Remaining / 403 analogs, reference
  * src/extract_github_data.py:372-391) surface them through the two
  * inspection methods so the reader can adapt its admission rate. */
trait PageFetcher extends Serializable {
  def fetch(since: Long, pageSize: Int): Seq[(Long, String)]

  /** Remaining request quota reported by the last fetch
    * (X-RateLimit-Remaining analog); None when the transport has no
    * quota signal (e.g. file fixtures). */
  def remainingQuota: Option[Int] = None

  /** True when the last fetch was REJECTED by rate limiting (the 403 +
    * "rate limit exceeded" analog, reference :484-487) and returned no
    * usable page. */
  def rateLimited: Boolean = false
}

/** Adaptive admission control for the page walk (reference
  * check_rate_limit :372-391 + the 60 s backoff :107): a rejected page is
  * retried under exponential backoff, and a reported quota at or below
  * `quotaFloor` inserts a proactive pause BEFORE the budget is exhausted
  * (the reference warns at <5 remaining). The injectable `sleep` keeps
  * specs wall-clock-free. */
object RateLimit {
  final case class Policy(baseBackoffMs: Long = 1000L, maxRetries: Int = 3,
      quotaFloor: Int = 5, floorDelayMs: Long = 60000L)

  final class RateLimitedException(attempts: Int)
    extends RuntimeException(
      s"page fetch still rate-limited after $attempts attempts")

  /** Stateful admission controller — one instance per cursor walk.
    * Exponential backoff on rejection (base, 2·base, 4·base, …); a
    * low-quota success arms a `floorDelayMs` pause that is DEFERRED to
    * the start of the NEXT fetch, so the final/exhausting fetch of a
    * walk never pays a dead pause with no request behind it. The
    * injectable `sleep` keeps specs wall-clock-free. */
  final class Admission(policy: Policy, sleep: Long => Unit = Thread.sleep) {
    private var pendingPause = false

    def fetchPage(fetcher: PageFetcher, since: Long, pageSize: Int)
        : Seq[(Long, String)] = {
      if (pendingPause) { sleep(policy.floorDelayMs); pendingPause = false }
      var attempt = 0
      while (true) {
        val rows = fetcher.fetch(since, pageSize)
        if (!fetcher.rateLimited) {
          if (fetcher.remainingQuota.exists(_ <= policy.quotaFloor))
            pendingPause = true // pay it just before the next request
          return rows
        }
        if (attempt >= policy.maxRetries)
          throw new RateLimitedException(attempt + 1) // total fetches tried
        sleep(policy.baseBackoffMs << attempt)
        attempt += 1
      }
      Nil // unreachable
    }
  }
}

/** Offline transport: JSON-lines fixture ordered/filterable by the `id`
  * field — each fetch answers exactly like the REST endpoint would. */
final class JsonFileFetcher(path: String) extends PageFetcher {
  private lazy val all: Vector[(Long, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val idRe = """"id"\s*:\s*(\d+)""".r
      src.getLines().flatMap { line =>
        idRe.findFirstMatchIn(line).map(m => (m.group(1).toLong, line))
      }.toVector.sortBy(_._1)
    } finally src.close()
  }
  override def fetch(since: Long, pageSize: Int): Seq[(Long, String)] =
    all.iterator.filter(_._1 > since).take(pageSize).toSeq
}

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
    util.EnumSet.of(TableCapability.BATCH_READ)
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

  override def build(): Scan = new RepoListScan(schema,
    options.get("path"), since, limit,
    options.getInt("pageSize", 100), options.getLong("pageDelayMs", 0L),
    options.containsKey("token"))
}

/** `authenticated` mirrors the reference's token regime switch (T7,
  * reference src/extract_github_data.py:351-369): a real REST transport
  * decorates requests with the token and gets the 5000 req/h budget; the
  * flag is surfaced in the scan description for plan-level visibility. */
final class RepoListScan(schema: StructType, path: String, since: Long,
    limit: Int, pageSize: Int, pageDelayMs: Long,
    authenticated: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(RepoListPartition(path, since, limit, pageSize, pageDelayMs))
  override def createReaderFactory(): PartitionReaderFactory =
    new RepoListReaderFactory(schema)
  override def description(): String =
    s"graft-repos since=$since limit=$limit pageSize=$pageSize " +
      s"auth=${if (authenticated) "token" else "anonymous"}"
}

case class RepoListPartition(path: String, since: Long, limit: Int,
    pageSize: Int, pageDelayMs: Long) extends InputPartition

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

  private var cursor = part.since
  private var emitted = 0
  private var page: Iterator[String] = Iterator.empty
  private var current: InternalRow = _
  private var exhausted = false

  override def next(): Boolean = {
    if (emitted >= part.limit) return false
    while (!page.hasNext && !exhausted) {
      if (emitted > 0 && part.pageDelayMs > 0)
        Thread.sleep(part.pageDelayMs) // admission control between pages
      val rows = fetcher.fetch(cursor, part.pageSize)
      if (rows.isEmpty) exhausted = true
      else {
        cursor = rows.last._1 // keyset invariant: ids strictly ascend
        page = rows.iterator.map(_._2)
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
  * ascending, at most pageSize. */
trait PageFetcher extends Serializable {
  def fetch(since: Long, pageSize: Int): Seq[(Long, String)]
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

package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source abstraction for the paginated keyset scan (S1) + per-key detail
  * fetch (S2). The live GitHub REST implementation is unreachable in this
  * environment (and in tests) — implementations are file/DataFrame-backed
  * fakes shaped exactly like the API (FIXTURES.md §A). A DataSourceV2
  * REST connector with SupportsPushDownLimit is the production drop-in
  * (SURVEY.md §7.3); the contract here is the same: ids strictly greater
  * than `since`, ascending, at most `limit` rows.
  */
trait RepoSource {
  /** Keyset page: raw detail records with id > since, ascending, ≤ limit
    * rows. The limit is pushed into the source — the moral equivalent of
    * the reference slicing the list BEFORE the expensive detail fetch
    * (reference src/extract_github_data.py:630,662). */
  def fetch(spark: SparkSession, since: Long, limit: Int): DataFrame

  /** Records the source failed to fetch this run (404/403 analogs,
    * reference src/extract_github_data.py:480-491) — counted, never fatal. */
  def failedCount: Long = 0L
}

/** A RepoSource over a fixed raw DataFrame (tests) or JSON path. */
final class DataFrameRepoSource(data: DataFrame,
    override val failedCount: Long = 0L) extends RepoSource {
  def fetch(spark: SparkSession, since: Long, limit: Int): DataFrame =
    data.filter(col("id") > since).orderBy("id").limit(limit)
}

/** Incremental micro-batch runner — the engine form of
  * extract_repositories (reference src/extract_github_data.py:607-762)
  * with one deliberate semantic fix: the cursor commits AFTER the sink
  * succeeds (the reference commits per-record at :714 but uploads once at
  * :746, so a mid-run crash silently loses records; SURVEY.md §2.3
  * "delivery semantics"). Batch+cursor here is the same shape Structured
  * Streaming gives via checkpointed offsets; graft.streaming holds the
  * streaming twin.
  */
final class IncrementalRunner(spark: SparkSession, source: RepoSource,
    stateDir: String) {

  private val cursorFile = Paths.get(stateDir, "last_repo_id.txt")

  /** S5 state read (reference src/extract_github_data.py:164-235). */
  def cursor: Long =
    if (Files.exists(cursorFile))
      new String(Files.readAllBytes(cursorFile), StandardCharsets.UTF_8)
        .trim.toLong
    else 0L

  /** S6 state commit — atomic (write temp + move) so a crash never leaves
    * a torn cursor. */
  private def commitCursor(id: Long): Unit = {
    Files.createDirectories(cursorFile.getParent)
    val tmp = cursorFile.resolveSibling("last_repo_id.tmp")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, cursorFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** One micro-batch: fetch (limit pushed down) → flatten → validate →
    * sink valid + quarantine invalid → metrics → commit cursor last.
    * Returns the one-row metrics DataFrame (collected to keep ordering
    * guarantees: sink IO has completed before the cursor moves). */
  def runOnce(sinkDir: String, quarantineDir: String, budget: Int,
      testMode: Boolean = false): DataFrame = {
    val t0 = System.nanoTime()
    val since = cursor
    val raw = source.fetch(spark, since, budget)
    val validated = IngestPipeline.withValidation(IngestPipeline.flatten(raw))
      .persist() // consumed by two sinks + metrics; one source scan
    try {
      val (valid, invalid) = IngestPipeline.split(validated)
      // ---- sink first (both streams), commit cursor only afterwards ----
      IngestPipeline.writePartitioned(valid, sinkDir)
      invalid.write.mode("append").json(quarantineDir)
      val m = IngestPipeline.metrics(validated, since, source.failedCount,
        testMode, (System.nanoTime() - t0) / 1e9)
      val rows = m.collect()
      // persist the run envelope at a SIBLING path (inside the sink it
      // would collide with Hive partition discovery) — still BEFORE the
      // cursor commit, so metadata can never claim a batch the cursor
      // doesn't cover (reference metadata block,
      // src/extract_github_data.py:730-742)
      m.coalesce(1).write.mode("append")
        .json(s"${sinkDir.stripSuffix("/")}_metadata")
      val lastId = rows(0).getAs[Long]("last_repo_id")
      if (lastId > since) commitCursor(lastId)
      // return the materialized row, not the live plan — the runner's
      // guarantee is "sink done, cursor committed" at return time
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), m.schema)
    } finally validated.unpersist()
  }
}

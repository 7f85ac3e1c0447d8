package graft.ingest

import org.apache.spark.sql.SparkSession

/** Incremental VIEW MAINTAINER — the consumer half of the changefeed
  * pipeline [[ChangefeedRunner]] publishes: drain committed
  * `batch=<toV>` dirs into a [[graft.ext.Ivm]] view, one cursor-tracked
  * increment at a time, with the same S5/S6 durability discipline as
  * every runner here ([[CursorStore]] atomic commit; APPLY-THEN-COMMIT
  * ordering, so a crash between the two replays the batch into its own
  * `run=<toV>` partition — an overwrite, not an append: at-least-once
  * execution, exactly-once view contents).
  *
  * Bootstrap contract (the mirror of the publisher's): the caller
  * initializes the view from a snapshot pinned at version V
  * ([[graft.ext.Ivm.init]] over `readTable(_, Some(V))`) and commits V
  * to this runner's cursor — the feed then carries increments from
  * there. An uninitialized cursor FAILS rather than guessing: applying
  * "everything in the sink" to an arbitrary view double-counts or
  * gaps, the classic CDC bootstrap bug, on the consumer side.
  *
  * CHAIN VALIDATION: each batch's `_graft_feed` marker records the
  * (fromV, toV) snapshot pair it was diffed over; a batch is applied
  * only when fromV equals this runner's cursor. That turns both silent
  * corruptions loud — an overlapping batch (fromV below the cursor:
  * its deltas were already absorbed; applying again double-counts) and
  * a gapped one (fromV above: increments are missing, e.g. the
  * publisher re-bootstrapped past us; the view needs a fresh snapshot
  * init). A dir with NO marker is a half-written strand and is skipped
  * unread — the publisher sweeps it.
  *
  * COMPACTION coupling: [[maintainOnce]] folds settled runs via
  * [[graft.ext.Ivm.compact]] with `excludeRunsAbove = cursor` — a run
  * above the committed cursor is a possibly-half-applied in-flight
  * attempt the restart will replay; folding it would double-count the
  * replay, so the fold preserves it verbatim outside the reserved
  * epoch and the replay overwrites it (the IvfPqStream
  * auto-compaction contract, reapplied). */
object IvmRunner {

  private def batchVersions(spark: SparkSession,
      sinkDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .flatMap(n => scala.util.Try(n.drop(6).toLong).toOption)
      .toSeq.sorted
  }

  /** One maintenance run: apply every committed batch beyond the
    * cursor, in version order, chain-validated; returns the versions
    * applied (empty = up to date). The group/measure vectors name the
    * view definition fixed at [[graft.ext.Ivm.init]] — including
    * composite keys, several sum measures, and min/max extrema
    * (whose dirt the drain carries; resolution happens at serve or at
    * an explicit [[graft.ext.Ivm.compact]] with the base snapshot). */
  def runOnce(spark: SparkSession, sinkDir: String, viewDir: String,
      cursor: CursorStore, groupCols: Seq[String], valCols: Seq[String],
      extremaCols: Seq[String]): Seq[Long] = {
    val start = cursor.read().getOrElse(throw new IllegalStateException(
      s"IVM cursor is uninitialized — bootstrap the view from a pinned " +
        s"snapshot (Ivm.init at version V) and commit V before draining " +
        s"the feed at $sinkDir"))
    var at = start
    val applied = scala.collection.mutable.ArrayBuffer.empty[Long]
    batchVersions(spark, sinkDir).filter(_ > start).foreach { v =>
      ChangefeedRunner.readMarker(spark, s"$sinkDir/batch=$v") match {
        case None => // half-written strand: skip unread, publisher sweeps
        case Some((fromV, toV)) =>
          if (fromV != at)
            throw new IllegalStateException(
              s"changefeed chain break at $sinkDir/batch=$v: batch " +
                s"covers $fromV->$toV but the view's cursor is $at — " +
                (if (fromV < at) "applying would double-count deltas "
                else "increments are missing ") +
                "(re-bootstrap the view from a pinned snapshot)")
          val batch = spark.read.parquet(s"$sinkDir/batch=$v")
          graft.ext.Ivm.applyChanges(batch, viewDir, v, groupCols,
            valCols, extremaCols)
          cursor.commit(toV) // only after the run partition is written
          at = toV
          applied += toV
      }
    }
    applied.toSeq
  }

  /** Single-measure convenience form of [[runOnce]]. */
  def runOnce(spark: SparkSession, sinkDir: String, viewDir: String,
      cursor: CursorStore, groupCol: String = "status",
      valCol: String = "cents"): Seq[Long] =
    runOnce(spark, sinkDir, viewDir, cursor, Seq(groupCol), Seq(valCol),
      Nil)

  /** [[runOnce]] + a post-drain fold of the settled runs — the steady
    * maintenance loop a long-lived view schedules (serve cost stays
    * O(groups) however many increments flow through). */
  def maintainOnce(spark: SparkSession, sinkDir: String, viewDir: String,
      cursor: CursorStore, groupCols: Seq[String], valCols: Seq[String],
      extremaCols: Seq[String]): Seq[Long] = {
    val applied = runOnce(spark, sinkDir, viewDir, cursor, groupCols,
      valCols, extremaCols)
    cursor.read().foreach(c =>
      graft.ext.Ivm.compact(spark, viewDir, Some(c), groupCols, None))
    applied
  }

  /** Single-measure convenience form of [[maintainOnce]]. */
  def maintainOnce(spark: SparkSession, sinkDir: String, viewDir: String,
      cursor: CursorStore, groupCol: String = "status",
      valCol: String = "cents"): Seq[Long] =
    maintainOnce(spark, sinkDir, viewDir, cursor, Seq(groupCol),
      Seq(valCol), Nil)
}

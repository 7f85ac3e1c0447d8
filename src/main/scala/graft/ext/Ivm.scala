package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** INCREMENTAL VIEW MAINTENANCE over the changefeed — the composition
  * the snapshot table and the rollup family exist for: an aggregate
  * materialized view kept exact by applying CDC DELTAS, never by
  * re-scanning the base.
  *
  * The hard part of IVM is RETRACTION: an update must subtract the old
  * row's contribution from its old group and add the new row's to its
  * new group (which may be a DIFFERENT group — the q147 lifecycle
  * migrates rows between statuses on purpose), and a delete is pure
  * subtraction. That is only sound when the view's aggregates form a
  * commutative GROUP (not just a monoid — counts and sums have
  * inverses; min/max do NOT, and neither do HLL distinct sketches —
  * register-max cannot unsee an element). MIN/MAX measures are still
  * maintainable under the weaker two-regime contract `extremaCols`
  * implements: inserts MERGE (min/max are a commutative monoid over
  * additions), retractions DIRTY their group (a per-group `d` counter
  * that sums through folds), and dirty groups are re-aggregated from
  * the base snapshot at serve or fold time, pruned to exactly the
  * dirty groups — deletions are the rare path, and only their groups
  * pay the recompute. HLL sketches stay on the rollup family's
  * rebuild-from-partials path. Deltas land as run partitions
  * (the Rollup discipline — replay-idempotent by run overwrite), the
  * serve is one O(groups x runs) aggregation of the summary, and
  * [[compact]] BOUNDS the runs term: counts and sums form a group, so
  * folding every settled run partial into the reserved `run=-1` epoch
  * is exact (a served view is identical before and after — q147 runs
  * the gate across a mid-stream compaction; IvmSpec pins the
  * invariance directly), and a long-lived view serves from O(groups)
  * rows however many increments it has absorbed.
  *
  * Per-increment cost is O(changefeed rows) = O(changed buckets), so a
  * view over a 100 TB table follows a trickle of changes for the price
  * of the trickle. Two maintainers drive a view end-to-end (exactly
  * one per view — run-id spaces must not interleave):
  * [[graft.ingest.IvmRunner]] drains the published changefeed with a
  * cursor (runs keyed by table version; q149 gates the whole
  * publisher→runner→compact→serve pipeline), and
  * [[graft.streaming.IvmStream]] drains a change stream per
  * micro-batch (runs keyed by foreachBatch id — a replayed batch
  * overwrites its own run, the exactly-once-by-overwrite discipline
  * every streaming twin here uses). q147 proves EXACTNESS through two
  * composed increments (v1→v3, then v3→v4): the maintained view must
  * equal the direct aggregate of the final snapshot, group for group —
  * the delta algebra is hash-gated against an oracle that never saw
  * the deltas. */
object Ivm {

  /** Initialize the view's base partial (run 0) from a table snapshot:
    * per-group count + one sum per measure column, plus (optionally)
    * min/max per `extremaCols` column under the two-regime contract
    * documented on [[serve]]. The view definition —
    * (groupCols, valCols, extremaCols) — is fixed at init and every
    * later call must name the same vectors; the partials' physical
    * schema carries the group columns by name, each sum measure as
    * `v_<valCol>`, each extrema pair as `mn_<c>`/`mx_<c>` with the
    * shared dirty counter `d`, so a mismatch fails on read, not
    * silently. Composite group keys and several measures cost nothing
    * extra: the retraction algebra is a VECTOR of group elements (one
    * count + N sums), applied component-wise. */
  def init(table: DataFrame, dir: String, groupCols: Seq[String],
      valCols: Seq[String], extremaCols: Seq[String]): Unit = {
    require(groupCols.nonEmpty && valCols.nonEmpty,
      "an IVM view needs at least one group column and one measure")
    val aggs = (count(lit(1)).as("n") +:
      valCols.map(c => sum(col(c)).as(s"v_$c"))) ++
      extremaCols.flatMap(e => Seq(min(col(e)).as(s"mn_$e"),
        max(col(e)).as(s"mx_$e"))) ++
      (if (extremaCols.isEmpty) Nil else Seq(sum(lit(0L)).as("d")))
    table.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/run=0")
  }

  /** Single-measure convenience form of [[init]]. */
  def init(table: DataFrame, dir: String, groupCol: String = "status",
      valCol: String = "cents"): Unit =
    init(table, dir, Seq(groupCol), Seq(valCol), Nil)

  /** Apply one changefeed increment as a delta partial: every old_row
    * contributes (-1, -values) to its OLD group, every new_row (+1,
    * +values) to its NEW group; an update whose group migrated thus
    * moves its weight between groups, and a net-zero group simply
    * cancels at serve time. `runId` keys the partition (replay
    * overwrites it — idempotent). */
  def applyChanges(changefeed: DataFrame, dir: String, runId: Long,
      groupCols: Seq[String], valCols: Seq[String],
      extremaCols: Seq[String]): Unit = {
    def side(row: String, sign: Long): DataFrame =
      changefeed.filter(col(row).isNotNull)
        .select((groupCols.map(g => col(s"$row.$g").as(g)) ++
          (lit(sign).as("w") +:
            valCols.map(c => (col(s"$row.$c") * sign).as(s"c_$c"))) ++
          extremaCols.map { e =>
            // a NEW row is a live extrema candidate; an OLD row is a
            // retraction — its value contributes nothing mergeable
            // (min/max have no inverse), it DIRTIES the group instead
            val v = col(s"$row.$e")
            (if (sign > 0) v else when(lit(false), v)).as(s"e_$e")
          } ++
          (if (extremaCols.isEmpty) Nil
           else Seq(lit(if (sign > 0) 0L else 1L).as("dd")))): _*)
    val aggs = (sum("w").as("n") +:
      valCols.map(c => sum(s"c_$c").as(s"v_$c"))) ++
      extremaCols.flatMap(e => Seq(min(s"e_$e").as(s"mn_$e"),
        max(s"e_$e").as(s"mx_$e"))) ++
      (if (extremaCols.isEmpty) Nil else Seq(sum("dd").as("d")))
    side("old_row", -1L).unionByName(side("new_row", 1L))
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/run=$runId")
  }

  /** Single-measure convenience form of [[applyChanges]]. */
  def applyChanges(changefeed: DataFrame, dir: String, runId: Long,
      groupCol: String = "status", valCol: String = "cents"): Unit =
    applyChanges(changefeed, dir, runId, Seq(groupCol), Seq(valCol), Nil)

  /** Serve the view: + -merge all partials, drop groups whose count
    * cancelled to zero (a group that emptied out). Output columns:
    * (groupCols..., n, sum_<valCol>..., min_<e>/max_<e>...).
    *
    * MIN/MAX measures (`extremaCols`) are served by the two-regime
    * contract their non-invertibility forces: a group no retraction
    * has touched since its last resolution (`d = 0`) serves the merged
    * candidates exactly (base extrema merged with every inserted
    * value — min/max are a commutative monoid over inserts); a group
    * with retractions (`d > 0`) is DIRTY — a deleted value may have
    * BEEN the extreme, which cannot be unseen — and is re-aggregated
    * from `base`, pruned to exactly the dirty groups (one semi-joined
    * aggregate, O(dirty groups' base rows): deletions are the rare
    * path, and only their groups pay). `base` must be the table
    * snapshot at the view's applied frontier; serving a dirty view
    * without it fails loudly rather than return a stale extreme.
    *
    * `avgOf` derives `avg_<c> = sum_<c> / n` (double) for the named
    * measures — AVG and any sum/count rational need no partial of
    * their own: the group algebra already maintains both terms
    * exactly, so the derivation is a projection at serve time, free
    * at any scale (the classic IVM treatment of non-self-maintainable
    * aggregates reduced to self-maintainable parts). */
  def serve(spark: SparkSession, dir: String, groupCols: Seq[String],
      valCols: Seq[String], extremaCols: Seq[String],
      base: Option[DataFrame], avgOf: Seq[String]): DataFrame = {
    require(avgOf.forall(valCols.contains),
      s"avgOf must name maintained measures (${valCols.mkString(",")})")
    val aggs = (sum("n").as("n") +:
      valCols.map(c => sum(s"v_$c").as(s"sum_$c"))) ++
      extremaCols.flatMap(e => Seq(min(s"mn_$e").as(s"min_$e"),
        max(s"mx_$e").as(s"max_$e"))) ++
      (if (extremaCols.isEmpty) Nil else Seq(sum("d").as("d")))
    val summary = spark.read.parquet(dir)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n") =!= 0)
    def withAvgs(d: DataFrame): DataFrame =
      avgOf.foldLeft(d)((acc, c) =>
        acc.withColumn(s"avg_$c",
          col(s"sum_$c").cast("double") / col("n")))
    if (extremaCols.isEmpty) withAvgs(summary)
    else withAvgs {
      val pinned = summary.localCheckpoint(true)
      val anyDirty = pinned.filter(col("d") > 0).limit(1).count() > 0
      val resolved =
        if (!anyDirty) pinned
        else {
          val b = base.getOrElse(throw new IllegalArgumentException(
            "the view has dirty min/max groups (a retraction touched " +
              "them since the last resolution) — pass base = the table " +
              "snapshot at the view's applied frontier to re-aggregate " +
              "them"))
          val dirtyKeys = pinned.filter(col("d") > 0)
            .select(groupCols.map(col): _*)
          val recAggs = extremaCols.flatMap(e =>
            Seq(min(col(e)).as(s"r_mn_$e"), max(col(e)).as(s"r_mx_$e")))
          val recompute = b
            .join(dirtyKeys, groupCols, "left_semi")
            .groupBy(groupCols.map(col): _*)
            .agg(recAggs.head, recAggs.tail: _*)
          pinned.join(recompute, groupCols, "left")
            .select((groupCols.map(col) ++
              (col("n") +: valCols.map(c => col(s"sum_$c"))) ++
              extremaCols.flatMap(e => Seq(
                when(col("d") > 0, col(s"r_mn_$e"))
                  .otherwise(col(s"min_$e")).as(s"min_$e"),
                when(col("d") > 0, col(s"r_mx_$e"))
                  .otherwise(col(s"max_$e")).as(s"max_$e"))) :+
              col("d")): _*)
        }
      resolved.drop("d")
    }
  }

  /** No-avg form of [[serve]] (the pre-round-14 signature). */
  def serve(spark: SparkSession, dir: String, groupCols: Seq[String],
      valCols: Seq[String], extremaCols: Seq[String],
      base: Option[DataFrame]): DataFrame =
    serve(spark, dir, groupCols, valCols, extremaCols, base, Nil)

  /** Single-measure convenience form of [[serve]]. */
  def serve(spark: SparkSession, dir: String,
      groupCol: String = "status",
      valCol: String = "cents"): DataFrame =
    serve(spark, dir, Seq(groupCol), Seq(valCol), Nil, None)

  /** Builder for the `ivm_view('/dir')` SQL table-valued function: the
    * maintained view SERVED in plain SQL, the view definition inferred
    * from the partials' own physical schema (the init-time prefix
    * contract — `v_<c>` sums, `mn_`/`mx_<c>` extrema, `d` dirty
    * counter, everything else a group column), so any maintained view
    * is SQL-readable without re-declaring its shape, exactly as
    * `merge_table` reads the snapshot table. `avg_<c>` rides along
    * for every measure (derived at serve time from the exact
    * partials). A view with dirty extrema fails loudly — resolve with
    * a compact-with-base first, then the SQL serve is clean. */
  private[graft] val viewFunctionBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    exprs =>
      require(exprs.length == 1,
        s"ivm_view(dir) takes 1 argument, got ${exprs.length}")
      val e = exprs.head
      require(e.foldable, "ivm_view: dir must be a literal")
      val dir = e.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"ivm_view: dir must be a string literal, got $other")
      }
      val spark = org.apache.spark.sql.SparkSession.active
      val names = spark.read.parquet(dir).schema.fieldNames.toSeq
      val valCols = names.filter(_.startsWith("v_")).map(_.drop(2))
      val extrema = names.filter(_.startsWith("mn_")).map(_.drop(3))
      val groupCols = names.filterNot(n => n == "n" || n == "d" ||
        n == "run" || n.startsWith("v_") || n.startsWith("mn_") ||
        n.startsWith("mx_"))
      serve(spark, dir, groupCols, valCols, extrema, None,
        avgOf = valCols).queryExecution.logical
  }

  /** Register `ivm_view` on a session built without
    * `spark.sql.extensions=graft.GraftExtensions` — idempotent. */
  def registerSql(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("ivm_view"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        Ivm.getClass.getName, "ivm_view"),
      viewFunctionBuilder)

  /** Fold SETTLED run partials into the reserved `run=-1` epoch — the
    * boundedness mechanism the rest of the incremental family has
    * ([[Rollup.compact]]'s swap discipline): counts and sums are a
    * commutative group, so the fold is EXACT and a serve reads O(groups)
    * rows instead of O(groups x runs). Net-zero groups are KEPT in the
    * folded epoch (an update within a group leaves n = 0 with a nonzero
    * cents delta — dropping the row would lose the money; [[serve]]
    * filters cancelled groups, the fold must not).
    *
    * `excludeRunsAbove` names the maintainer's settled frontier: any
    * run ABOVE it is either a possibly-half-applied in-flight attempt
    * the maintainer will REPLAY (run-overwrite) after restart, or a
    * fully-applied increment the frontier simply has not advanced over
    * yet. Folding either would be wrong (the first double-counts its
    * replay; the second is fine to fold but indistinguishable from the
    * first) — so excluded runs are PRESERVED VERBATIM in the rewrite,
    * byte-copied outside the fold: a replay still overwrites its
    * partition exactly as before, and an applied-but-unsettled run is
    * never lost to a fold it wasn't part of. (Dropping instead of
    * preserving would lose exactly that second class when an EXTERNAL
    * compactor folds at [[graft.streaming.IvmStream.committedRun]]'s
    * watermark while the stream is past it — the run's batch is
    * checkpoint-committed and will never replay to restore it.)
    * None = the caller asserts no maintainer is mid-batch; everything
    * folds. The measure vector is read off the partials' own schema by
    * the physical prefix contract (count and v_ columns sum, mn_ and
    * mx_ columns merge as min/max, d sums), so one fold path serves
    * any view definition. `base` (optional) resolves dirty extrema
    * groups during the fold — see the body comment. */
  def compact(spark: SparkSession, dir: String,
      excludeRunsAbove: Option[Long],
      groupCols: Seq[String],
      base: Option[DataFrame]): DedupIndex.CompactionStats =
    DedupIndex.rewriteAndSwap(spark, dir) { tmp =>
      val all = spark.read.parquet(dir)
      val measures = all.columns
        .filterNot(groupCols.toSet).filter(_ != "run")
      // fold by the physical prefix contract: v_* and the count sum
      // (group algebra), mn_*/mx_* merge as min/max (monoid over
      // inserts; soundness under retraction rides the d counter, which
      // SUMS — dirtiness propagates through any number of folds until
      // a resolution pays the recompute)
      val aggs = measures.toSeq.map { c =>
        if (c.startsWith("mn_")) min(col(c)).as(c)
        else if (c.startsWith("mx_")) max(col(c)).as(c)
        else sum(col(c)).as(c)
      }
      val foldedRaw = excludeRunsAbove
        .map(b => all.filter(col("run") <= b)).getOrElse(all)
        .groupBy(groupCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
      // RESOLUTION (optional): with `base` = the table snapshot at the
      // settled frontier, dirty extrema groups are re-aggregated from
      // it and their d reset — after this fold a serve of the settled
      // state is clean, paying O(dirty groups' base rows) once here
      // instead of on every serve. A group that emptied out (n = 0,
      // absent from base) resets to null extrema: if it is ever
      // re-inserted, the monoid restarts from the new values exactly.
      val extrema = measures.filter(_.startsWith("mn_")).map(_.drop(3))
      val folded = base match {
        case Some(b) if extrema.nonEmpty && measures.contains("d") =>
          val pinned = foldedRaw.localCheckpoint(true)
          val dirtyKeys = pinned.filter(col("d") > 0)
            .select(groupCols.map(col): _*)
          val recAggs = extrema.toSeq.flatMap(e =>
            Seq(min(col(e)).as(s"r_mn_$e"), max(col(e)).as(s"r_mx_$e")))
          val recompute = b.join(dirtyKeys, groupCols, "left_semi")
            .groupBy(groupCols.map(col): _*)
            .agg(recAggs.head, recAggs.tail: _*)
          pinned.join(recompute, groupCols, "left")
            .select((groupCols.map(col) ++ measures.toSeq.map {
              case "d" => lit(0L).as("d")
              case c if c.startsWith("mn_") =>
                when(col("d") > 0, col(s"r_${c}")).otherwise(col(c)).as(c)
              case c if c.startsWith("mx_") =>
                when(col("d") > 0, col(s"r_${c}")).otherwise(col(c)).as(c)
              case c => col(c)
            }): _*)
        case _ => foldedRaw
      }
      folded
        .repartition(1)
        .write.mode("overwrite").parquet(s"$tmp/run=-1")
      // carry every excluded run partition verbatim (file copy, no
      // Spark read: a torn in-flight attempt may not even parse)
      excludeRunsAbove.foreach { b =>
        val dirPath = new org.apache.hadoop.fs.Path(dir)
        val fs = dirPath.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        fs.listStatus(dirPath).filter(_.isDirectory)
          .filter { st =>
            val n = st.getPath.getName
            n.startsWith("run=") && scala.util.Try(n.drop(4).toLong)
              .toOption.exists(_ > b)
          }
          .foreach { st =>
            org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
              new org.apache.hadoop.fs.Path(tmp, st.getPath.getName),
              false, spark.sparkContext.hadoopConfiguration): Unit
          }
      }
    }

  /** Single-group convenience form of [[compact]]. */
  def compact(spark: SparkSession, dir: String,
      excludeRunsAbove: Option[Long] = None,
      groupCol: String = "status")
      : DedupIndex.CompactionStats =
    compact(spark, dir, excludeRunsAbove, Seq(groupCol), None)

  // ---- q147: the lifecycle with status MIGRATION -------------------

  private def baseRows(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))

  /** q147 — IVM-over-changefeed acceptance: a per-status (count, cents)
    * view initialized at v1, then maintained ONLY from changefeed
    * deltas through two composed increments — batch 1 (cents+100 on
    * key % 101, 'N' inserts at -(key+1) on key % 103) and batch 2
    * (keys % 202 MIGRATE to status 'X' at cents+300) applied as
    * increment v1→v3, then a [[compact]] folding the settled partials
    * MID-STREAM, then a hard delete (key % 307) as increment v3→v4
    * applied ON TOP of the folded epoch. The served view must equal
    * the direct per-status aggregate of the final snapshot, which the
    * oracle computes from orders arithmetic alone — retraction, group
    * migration, insert placement, delete subtraction AND the fold's
    * exactness all hash-gated in one row set (a compact that lost or
    * double-counted anything fails the same gate that passed without
    * it). */
  private val q147IvmChangefeed = QueryDef(
    (s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft-q147-t")
        .resolve("table").toString
      val view = java.nio.file.Files.createTempDirectory("graft-q147-v")
        .resolve("view").toString
      val base = graft.core.Timing.build {
        val b = baseRows(s, dir).localCheckpoint(true)
        MergeTable.create(b, table, "key")
        Ivm.init(MergeTable.readTable(s, table).drop("bucket"), view)
        b
      }
      MergeTable.upsert(s, table,
        base.filter(col("key") % 101 === 0)
          .withColumn("cents", col("cents") + 100)
          .unionByName(base.filter(col("key") % 103 === 0)
            .select((-col("key") - 1).as("key"), lit("N").as("status"),
              col("cents"))))
      MergeTable.upsert(s, table,
        base.filter(col("key") % 202 === 0)
          .select(col("key"), lit("X").as("status"),
            (col("cents") + 300).as("cents")))
      Ivm.applyChanges(MergeTable.changes(s, table, 1L, 3L), view, 1)
      Ivm.compact(s, view) // fold mid-stream: the gate must not notice
      MergeTable.deleteKeys(s, table,
        base.filter(col("key") % 307 === 0).select("key"))
      Ivm.applyChanges(MergeTable.changes(s, table, 3L, 4L), view, 2)
      Ivm.serve(s, view).orderBy("status")
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |fin AS (
      |  SELECT key,
      |         CASE WHEN key % 202 = 0 THEN 'X' ELSE status END AS status,
      |         CASE WHEN key % 202 = 0 THEN cents + 300
      |              WHEN key % 101 = 0 THEN cents + 100
      |              ELSE cents END AS cents
      |  FROM base WHERE key % 307 <> 0
      |  UNION ALL
      |  SELECT -key - 1, 'N', cents FROM base WHERE key % 103 = 0)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM fin GROUP BY status ORDER BY status""")

  /** q149 — the WIRED pipeline end-to-end, same final oracle as q147:
    * table → [[graft.ingest.ChangefeedRunner]] (cursor-tracked publish
    * of each version diff to a batch sink, bootstrap pinning v1) →
    * [[graft.ingest.IvmRunner.maintainOnce]] (chain-validated drain of
    * the published batches into the view, apply-then-commit, settled
    * runs folded into the reserved epoch each pass) → [[serve]]. What
    * q147 proves about the delta ALGEBRA, this row proves about the
    * PLUMBING: two publisher runs (v1→v3 coalesced, then v3→v4), two
    * maintainer drains with their compactions, and the served view
    * must still equal the direct aggregate the oracle computes from
    * orders arithmetic alone. Every moving part — marker chain, cursor
    * discipline on both sides, fold exclusion — sits on the hash
    * gate's critical path. */
  private val q149IvmRunner = QueryDef(
    (s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-q149")
      val table = root.resolve("table").toString
      val view = root.resolve("view").toString
      val sink = root.resolve("sink").toString
      val pubCursor =
        new graft.ingest.FileCursorStore(root.resolve("pub").toString)
      val ivmCursor =
        new graft.ingest.FileCursorStore(root.resolve("ivm").toString)
      val base = graft.core.Timing.build {
        val b = baseRows(s, dir).localCheckpoint(true)
        MergeTable.create(b, table, "key")
        // publisher bootstrap pins v1; the consumer snapshots it
        graft.ingest.ChangefeedRunner.runOnce(s, table, sink, pubCursor)
        Ivm.init(MergeTable.readTable(s, table, Some(1L)).drop("bucket"),
          view)
        ivmCursor.commit(1L)
        b
      }
      MergeTable.upsert(s, table,
        base.filter(col("key") % 101 === 0)
          .withColumn("cents", col("cents") + 100)
          .unionByName(base.filter(col("key") % 103 === 0)
            .select((-col("key") - 1).as("key"), lit("N").as("status"),
              col("cents"))))
      MergeTable.upsert(s, table,
        base.filter(col("key") % 202 === 0)
          .select(col("key"), lit("X").as("status"),
            (col("cents") + 300).as("cents")))
      graft.ingest.ChangefeedRunner.runOnce(s, table, sink, pubCursor)
      graft.ingest.IvmRunner.maintainOnce(s, sink, view, ivmCursor)
      MergeTable.deleteKeys(s, table,
        base.filter(col("key") % 307 === 0).select("key"))
      graft.ingest.ChangefeedRunner.runOnce(s, table, sink, pubCursor)
      graft.ingest.IvmRunner.maintainOnce(s, sink, view, ivmCursor)
      Ivm.serve(s, view).orderBy("status")
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |fin AS (
      |  SELECT key,
      |         CASE WHEN key % 202 = 0 THEN 'X' ELSE status END AS status,
      |         CASE WHEN key % 202 = 0 THEN cents + 300
      |              WHEN key % 101 = 0 THEN cents + 100
      |              ELSE cents END AS cents
      |  FROM base WHERE key % 307 <> 0
      |  UNION ALL
      |  SELECT -key - 1, 'N', cents FROM base WHERE key % 103 = 0)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM fin GROUP BY status ORDER BY status""")

  /** q152 — BOUNDEDNESS acceptance row: the claim [[compact]] exists
    * for, priced. Six disjoint increments (keys with key % 1009 = i
    * migrate to a NEW status 'M' at cents + i*10 — disjoint residues,
    * so each increment's old_row is the base state) land as six run
    * partials on top of the init partial; the serve then reads
    * runs_before = 7 partitions. One fold later it reads
    * runs_after = 1 — and the served per-status aggregate must equal
    * the oracle's direct CASE restatement over orders, so the fold's
    * EXACTNESS and its O(groups×runs) → O(groups) collapse are gated
    * in the same row set (the numbers ride every row as constants the
    * oracle pins). A long-lived view absorbing a trickle of thousands
    * of increments serves at the folded cost; this row is the
    * mechanical witness. */
  private val q152IvmBoundedness = QueryDef(
    (s, dir) => {
      val view = java.nio.file.Files.createTempDirectory("graft-q152")
        .resolve("view").toString
      val base = graft.core.Timing.build {
        val b = baseRows(s, dir).localCheckpoint(true)
        Ivm.init(b, view)
        b
      }
      (1 to 6).foreach { i =>
        val moved = base.filter(col("key") % 1009 === i)
        val cf = moved.select(col("key"),
          struct(col("status"), col("cents")).as("old_row"),
          struct(lit("M").as("status"),
            (col("cents") + i * 10).as("cents")).as("new_row"))
        Ivm.applyChanges(cf, view, i.toLong)
      }
      val runsBefore = s.read.parquet(view).select("run")
        .distinct().count()
      Ivm.compact(s, view)
      val runsAfter = s.read.parquet(view).select("run")
        .distinct().count()
      Ivm.serve(s, view).orderBy("status")
        .withColumn("runs_before", lit(runsBefore))
        .withColumn("runs_after", lit(runsAfter))
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |fin AS (
      |  SELECT key,
      |         CASE WHEN key % 1009 BETWEEN 1 AND 6 THEN 'M'
      |              ELSE status END AS status,
      |         cents + CASE WHEN key % 1009 BETWEEN 1 AND 6
      |                      THEN (key % 1009) * 10 ELSE 0 END AS cents
      |  FROM base)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       CAST(7 AS BIGINT) AS runs_before,
      |       CAST(1 AS BIGINT) AS runs_after
      |FROM fin GROUP BY status ORDER BY status""")

  /** q154 — the GENERALIZED view definition acceptance row: a view
    * grouped by the COMPOSITE key (status, seg) carrying TWO measures
    * (sum of cents, sum of units) plus the count, maintained through
    * every delta class the algebra owns — status migration (class 1:
    * both measures move between groups), deletion (class 2: pure
    * vector retraction), WITHIN-composite-key migration (class 3: the
    * seg component changes while status holds), and insertion (class
    * 4) — with a [[compact]] folded MID-STREAM between the increments
    * (the fold path reads the measure vector off the partials' own
    * schema, so the same rewrite serves any definition). The served
    * view must equal the direct composite-key aggregate the oracle
    * computes from orders arithmetic alone: the q147 gate, restated
    * over the N-measure vector algebra the single-measure rows cannot
    * distinguish from scalar bookkeeping. */
  private val q154IvmMulti = QueryDef(
    (s, dir) => {
      val view = java.nio.file.Files.createTempDirectory("graft-q154")
        .resolve("view").toString
      val groupCols = Seq("status", "seg")
      val valCols = Seq("cents", "units")
      val base = graft.core.Timing.build {
        val b = Tables(s, dir, "orders").select(
          col("o_orderkey").as("key"),
          col("o_orderstatus").as("status"),
          (col("o_custkey") % 4).as("seg"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          (col("o_orderkey") % 7).as("units")).localCheckpoint(true)
        Ivm.init(b, view, groupCols, valCols, Nil)
        b
      }
      val cls = col("key") % 1009
      val oldS = struct(col("status"), col("seg"), col("cents"),
        col("units"))
      val newS = struct(
        when(cls === 1, lit("M")).otherwise(col("status")).as("status"),
        when(cls === 3, (col("seg") + 1) % 4).otherwise(col("seg"))
          .as("seg"),
        (col("cents") + when(cls === 1, 10L).when(cls === 3, 30L)
          .otherwise(0L)).as("cents"),
        (col("units") + when(cls === 1, 1L).otherwise(0L)).as("units"))
      // run 1: the status migrations (group AND both measures move)
      Ivm.applyChanges(base.filter(cls === 1)
        .select(col("key"), oldS.as("old_row"), newS.as("new_row")),
        view, 1L, groupCols, valCols, Nil)
      // fold mid-stream: the gate must not notice
      Ivm.compact(s, view, None, groupCols, None)
      // run 2: deletes + seg migrations + inserts, on top of the fold
      val insS = struct(lit("N").as("status"), col("seg").as("seg"),
        col("cents").as("cents"), col("units").as("units"))
      Ivm.applyChanges(base.filter(cls.isin(2L, 3L, 4L))
        .select(col("key"),
          when(cls === 4, lit(null)).otherwise(oldS).as("old_row"),
          when(cls === 2, lit(null))
            .otherwise(when(cls === 4, insS).otherwise(newS))
            .as("new_row")),
        view, 2L, groupCols, valCols, Nil)
      Ivm.serve(s, view, groupCols, valCols, Nil, None).orderBy("status", "seg")
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         o_custkey % 4 AS seg,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |         o_orderkey % 7 AS units
      |  FROM orders),
      |fin AS (
      |  SELECT key,
      |         CASE WHEN key % 1009 = 1 THEN 'M' ELSE status END AS status,
      |         CASE WHEN key % 1009 = 3 THEN (seg + 1) % 4
      |              ELSE seg END AS seg,
      |         cents + CASE WHEN key % 1009 = 1 THEN 10
      |                      WHEN key % 1009 = 3 THEN 30
      |                      ELSE 0 END AS cents,
      |         units + CASE WHEN key % 1009 = 1 THEN 1
      |                      ELSE 0 END AS units
      |  FROM base WHERE key % 1009 <> 2
      |  UNION ALL
      |  SELECT key, 'N', seg, cents, units FROM base
      |  WHERE key % 1009 = 4)
      |SELECT status, seg, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       CAST(sum(units) AS BIGINT) AS sum_units
      |FROM fin GROUP BY status, seg ORDER BY status, seg""")

  /** q158 — MIN/MAX measures acceptance row: the aggregates the group
    * algebra CANNOT carry (no inverse), maintained under the two-regime
    * extrema contract and gated on BOTH resolution paths. A per-status
    * (count, sum, min, max) view over cents: increment 1 DELETES keys
    * `key % 1009 = 2` in status 'F' only (dirtying exactly that group —
    * a deleted value may have been the extreme), then a [[compact]]
    * WITHOUT base folds mid-stream (the d counter must survive the
    * fold: dirtiness propagates, it never silently resolves), then
    * increment 2 INSERTS rows into every status (clean-path candidates:
    * min/max merge as a monoid over inserts — 'O'/'P' stay clean and
    * serve from merged candidates alone). The output unions two serves
    * of the SAME final state: `serve_recompute` (base passed at serve
    * time; the dirty 'F' group re-aggregates, pruned to just it) and
    * `fold_resolved` (a [[compact]] WITH base resolves the dirt into
    * the folded epoch, then a base-less serve must succeed — it throws
    * if any dirt survived). Both row sets must equal the direct
    * aggregate the oracle computes from orders arithmetic alone. */
  private val q158IvmExtrema = QueryDef(
    (s, dir) => {
      val view = java.nio.file.Files.createTempDirectory("graft-q158")
        .resolve("view").toString
      val g = Seq("status"); val v = Seq("cents"); val e = Seq("cents")
      val base = graft.core.Timing.build {
        val b = baseRows(s, dir).localCheckpoint(true)
        Ivm.init(b, view, g, v, e)
        b
      }
      val cls = col("key") % 1009
      val st = struct(col("status"), col("cents"))
      // increment 1: hard deletes in 'F' only — old_row retractions
      Ivm.applyChanges(
        base.filter(cls === 2 && col("status") === "F")
          .select(col("key"), st.as("old_row"),
            when(lit(false), st).as("new_row")),
        view, 1L, g, v, e)
      // fold mid-stream WITHOUT base: the dirt must ride through
      Ivm.compact(s, view, None, g, None)
      // increment 2: inserts into every status (clean-path candidates)
      Ivm.applyChanges(
        base.filter(cls === 4)
          .select((-col("key") - 1).as("key"),
            when(lit(false), st).as("old_row"),
            struct(col("status"), (col("cents") + 5).as("cents"))
              .as("new_row")),
        view, 2L, g, v, e)
      val fin = base.filter(!(cls === 2 && col("status") === "F"))
        .unionByName(base.filter(cls === 4)
          .select((-col("key") - 1).as("key"), col("status"),
            (col("cents") + 5).as("cents")))
        .localCheckpoint(true)
      val s1 = Ivm.serve(s, view, g, v, e, Some(fin))
        .withColumn("path", lit("serve_recompute"))
      Ivm.compact(s, view, None, g, Some(fin))
      val s2 = Ivm.serve(s, view, g, v, e, None)
        .withColumn("path", lit("fold_resolved"))
      s1.unionByName(s2).orderBy("path", "status")
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |fin AS (
      |  SELECT key, status, cents FROM base
      |  WHERE NOT (key % 1009 = 2 AND status = 'F')
      |  UNION ALL
      |  SELECT -key - 1, status, cents + 5 FROM base
      |  WHERE key % 1009 = 4),
      |agg AS (
      |  SELECT status, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(cents) AS BIGINT) AS sum_cents,
      |         CAST(min(cents) AS BIGINT) AS min_cents,
      |         CAST(max(cents) AS BIGINT) AS max_cents
      |  FROM fin GROUP BY status)
      |SELECT status, n, sum_cents, min_cents, max_cents,
      |       'fold_resolved' AS path FROM agg
      |UNION ALL
      |SELECT status, n, sum_cents, min_cents, max_cents,
      |       'serve_recompute' AS path FROM agg
      |ORDER BY path, status""")

  /** q165 — SQL SERVE + DERIVED MEASURES acceptance: a composite-key
    * (status, seg) view carrying two measures, maintained through a
    * group-migrating increment and a mid-stream [[compact]], then read
    * entirely through `ivm_view('/dir')` in PLAIN SQL — the view
    * definition inferred from the partials' own schema, with the
    * derived `avg_cents` (sum/count rational, computed from the exact
    * partials at serve time — AVG needs no partial of its own) rounded
    * and gated against the delta-blind direct aggregate the oracle
    * computes from orders arithmetic alone. A SQL consumer reads a
    * maintained view exactly like a table — the q159 discipline
    * applied to the IVM layer. */
  private val q165IvmSqlServe = QueryDef(
    (s, dir) => {
      val view = java.nio.file.Files.createTempDirectory("graft-q165")
        .resolve("view").toString
      val groupCols = Seq("status", "seg")
      val valCols = Seq("cents", "units")
      val base = graft.core.Timing.build {
        val b = Tables(s, dir, "orders").select(
          col("o_orderkey").as("key"),
          col("o_orderstatus").as("status"),
          (col("o_custkey") % 4).as("seg"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          (col("o_orderkey") % 7).as("units")).localCheckpoint(true)
        Ivm.init(b, view, groupCols, valCols, Nil)
        b
      }
      val cls = col("key") % 1009
      val oldS = struct(col("status"), col("seg"), col("cents"),
        col("units"))
      val newS = struct(lit("M").as("status"), col("seg"),
        (col("cents") + 10L).as("cents"),
        (col("units") + 1L).as("units"))
      Ivm.applyChanges(base.filter(cls === 1)
        .select(col("key"), oldS.as("old_row"), newS.as("new_row")),
        view, 1L, groupCols, valCols, Nil)
      Ivm.compact(s, view, None, groupCols, None)
      Ivm.registerSql(s)
      s.sql(
        s"""SELECT status, seg, n, sum_cents, sum_units,
           |       round(avg_cents, 2) AS avg_cents_r
           |FROM ivm_view('$view')
           |ORDER BY status, seg""".stripMargin)
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         o_custkey % 4 AS seg,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |         o_orderkey % 7 AS units
      |  FROM orders),
      |fin AS (
      |  SELECT key,
      |         CASE WHEN key % 1009 = 1 THEN 'M' ELSE status END AS status,
      |         seg,
      |         cents + CASE WHEN key % 1009 = 1 THEN 10 ELSE 0 END AS cents,
      |         units + CASE WHEN key % 1009 = 1 THEN 1 ELSE 0 END AS units
      |  FROM base)
      |SELECT status, seg, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       CAST(sum(units) AS BIGINT) AS sum_units,
      |       round(CAST(sum(cents) AS DOUBLE) / count(*), 2)
      |         AS avg_cents_r
      |FROM fin GROUP BY status, seg ORDER BY status, seg""")

  /** q167 — STREAMING CDC SUBSCRIPTION acceptance: the q149 pipeline
    * with the runner/cursor plumbing replaced by the
    * [[graft.sources.ChangefeedSource]] — the view SUBSCRIBES to the
    * table (`readStream.format("merge-table-changes")`, offsets =
    * table versions) and [[graft.streaming.IvmStream]] drains each
    * version-range micro-batch through the same run discipline. Three
    * AvailableNow drains (bootstrap no-op, the two-upsert window, the
    * delete window) and the served view must equal the direct
    * aggregate the oracle computes from orders arithmetic alone —
    * exactly-once now riding the checkpoint offset log instead of the
    * runner's cursor file, with the fingerprint short-circuit and
    * changed-bucket pruning inside every getBatch. */
  private val q167ChangefeedStream = QueryDef(
    (s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-q167")
      val table = root.resolve("table").toString
      val view = root.resolve("view").toString
      val ckpt = root.resolve("ckpt").toString
      def drain(): Unit = {
        val q = graft.streaming.IvmStream.start(
          s.readStream.format("merge-table-changes")
            .option("dir", table).option("initialVersion", 1L).load(),
          view, ckpt, Seq("status"), Seq("cents"), Nil,
          compactEvery = 2)
        q.awaitTermination()
      }
      val base = graft.core.Timing.build {
        val b = baseRows(s, dir).localCheckpoint(true)
        MergeTable.create(b, table, "key")
        Ivm.init(MergeTable.readTable(s, table, Some(1L)).drop("bucket"),
          view)
        drain() // bootstrap: nothing past v1, zero rows applied
        b
      }
      MergeTable.upsert(s, table,
        base.filter(col("key") % 101 === 0)
          .withColumn("cents", col("cents") + 100)
          .unionByName(base.filter(col("key") % 103 === 0)
            .select((-col("key") - 1).as("key"), lit("N").as("status"),
              col("cents"))))
      MergeTable.upsert(s, table,
        base.filter(col("key") % 202 === 0)
          .select(col("key"), lit("X").as("status"),
            (col("cents") + 300).as("cents")))
      drain() // one micro-batch: the composed v1→v3 diff
      MergeTable.deleteKeys(s, table,
        base.filter(col("key") % 307 === 0).select("key"))
      drain() // one micro-batch: the v3→v4 diff
      Ivm.serve(s, view).orderBy("status")
    },
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |fin AS (
      |  SELECT key,
      |         CASE WHEN key % 202 = 0 THEN 'X' ELSE status END AS status,
      |         CASE WHEN key % 202 = 0 THEN cents + 300
      |              WHEN key % 101 = 0 THEN cents + 100
      |              ELSE cents END AS cents
      |  FROM base WHERE key % 307 <> 0
      |  UNION ALL
      |  SELECT -key - 1, 'N', cents FROM base WHERE key % 103 = 0)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM fin GROUP BY status ORDER BY status""")

  val defs: Map[String, QueryDef] = Map(
    "q147_ivm_changefeed" -> q147IvmChangefeed,
    "q149_ivm_runner" -> q149IvmRunner,
    "q152_ivm_boundedness" -> q152IvmBoundedness,
    "q154_ivm_multi" -> q154IvmMulti,
    "q158_ivm_extrema" -> q158IvmExtrema,
    "q165_ivm_sql_serve" -> q165IvmSqlServe,
    "q167_changefeed_stream" -> q167ChangefeedStream,
  )
}

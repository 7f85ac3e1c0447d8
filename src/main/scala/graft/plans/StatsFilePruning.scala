package graft.plans

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet,
  LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
  ShortType}

/** VALUE-PREDICATE FILE PRUNING for the snapshot table
  * ([[graft.ext.MergeTable]]): every manifest entry carries per-file
  * min/max stats for the table's integral columns (`#st=` lines,
  * computed by the same epoch read-back scan that fingerprints the
  * commit), and this rule filters a scan's FILE LIST against the
  * pushed-down range predicates at PLAN time — the Iceberg/Delta
  * manifest-stats read path. Without it, `WHERE cents BETWEEN …` on a
  * z-striped 100 TB snapshot still SCHEDULES every file and leans on
  * parquet row-group skipping alone; with it, the plan itself opens
  * only the stripes whose stats overlap the predicate box — the
  * difference between reading one z-order stripe set and touching
  * every bucket's files.
  *
  * Soundness: a file is dropped only when the manifest attests that NO
  * non-null value of a constrained column falls in the predicate's
  * range; every extracted predicate shape (comparisons against
  * literals, IN lists) is null-rejecting, so rows reading null for the
  * column cannot match either. Everything off-pattern keeps the file
  * or silences the rule entirely: a file without stats (legacy
  * manifest, post-evolution column), an unsupported literal type, a
  * non-MergeTable scan (the `<dir>/data/v=…/bucket=…` path shape plus
  * `_manifests` and `_graft_meta` must all be present), a relation
  * whose files span two table dirs. The rewrite swaps ONLY the file
  * index — same schema, same output attribute ids, condition kept for
  * row-level evaluation — so the rule can never change results, only
  * the files scheduled.
  *
  * Registration: injected by [[graft.GraftExtensions]], or per-session
  * via [[StatsFilePruning.enable]]. */
object StatsFilePruning extends Rule[LogicalPlan] with PredicateHelper {

  private val EntryPath = "^(.*)/data/(v=[^/]+/bucket=[^/]+/[^/]+)$".r

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation] =>
      try pruneFilter(f, cond, lr,
        lr.relation.asInstanceOf[HadoopFsRelation])
      catch { case scala.util.control.NonFatal(_) => f }
  }

  /** Conjunctive [lo, hi] bounds per column name, from the
    * null-rejecting literal comparisons in `cond` that reference the
    * relation's own integral attributes. Inclusive and conservative
    * (strict bounds widen to inclusive — pruning may keep an extra
    * file, never drop a matching one). */
  private def ranges(cond: Expression,
      lr: LogicalRelation): Map[String, (Option[Long], Option[Long])] = {
    def longOf(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue)
      case v: java.lang.Long => Some(v.longValue)
      case s: java.lang.Short => Some(s.longValue)
      case b: java.lang.Byte => Some(b.longValue)
      case _ => None
    }
    def ownIntegral(a: AttributeReference): Boolean =
      lr.outputSet.contains(a) &&
        Seq(ByteType, ShortType, IntegerType, LongType).contains(a.dataType)
    val bounds = scala.collection.mutable.Map
      .empty[String, (Option[Long], Option[Long])]
    def add(a: AttributeReference, lo: Option[Long],
        hi: Option[Long]): Unit = if (ownIntegral(a)) {
      val (clo, chi) = bounds.getOrElse(a.name, (None, None))
      bounds(a.name) = (
        Seq(clo, lo).flatten.maxOption, Seq(chi, hi).flatten.minOption)
    }
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        add(a, longOf(l), None)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        add(a, longOf(l), None)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        add(a, None, longOf(l))
      case LessThan(a: AttributeReference, l: Literal) =>
        add(a, None, longOf(l))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        add(a, None, longOf(l))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        add(a, None, longOf(l))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        add(a, longOf(l), None)
      case LessThan(l: Literal, a: AttributeReference) =>
        add(a, longOf(l), None)
      case EqualTo(a: AttributeReference, l: Literal) =>
        add(a, longOf(l), longOf(l))
      case EqualTo(l: Literal, a: AttributeReference) =>
        add(a, longOf(l), longOf(l))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val ls = vs.map(v => longOf(v.asInstanceOf[Literal]))
        if (ls.forall(_.isDefined)) {
          val s = ls.flatten
          add(a, Some(s.min), Some(s.max))
        }
      case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
        val ls = vs.toSeq.map {
          case i: java.lang.Integer => Some(i.longValue)
          case v: java.lang.Long => Some(v.longValue)
          case s: java.lang.Short => Some(s.longValue)
          case b: java.lang.Byte => Some(b.longValue)
          case _ => None
        }
        if (ls.forall(_.isDefined)) {
          val s = ls.flatten
          add(a, Some(s.min), Some(s.max))
        }
      case _ =>
    }
    bounds.toMap
  }

  private def pruneFilter(f: Filter, cond: Expression,
      lr: LogicalRelation, hfs: HadoopFsRelation): LogicalPlan = {
    val rs = ranges(cond, lr)
    if (rs.isEmpty) return f
    val files = hfs.location.inputFiles
    if (files.isEmpty) return f
    // every file must sit under ONE table's data dir, in the table's
    // own epoch/bucket layout — anything else is not a MergeTable scan
    val parsed = files.map {
      case EntryPath(d, rel) => Some((d, rel))
      case _ => None
    }
    if (parsed.exists(_.isEmpty)) return f
    val dirs = parsed.flatten.map(_._1).distinct
    if (dirs.length != 1) return f
    val dir = dirs.head
    val spark = hfs.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_manifests")) ||
        !fs.exists(new Path(dir, "_graft_meta"))) return f
    val stats = graft.ext.MergeTable.fileStatsIndex(spark, dir)
    val keep = files.zip(parsed.flatten.map(_._2)).filter {
      case (_, rel) =>
        stats.get(rel) match {
          case None => true // unattested file: never prune
          case Some(colStats) =>
            rs.forall { case (cname, (lo, hi)) =>
              colStats.get(cname) match {
                case None => true // column unattested in this file
                case Some((None, None)) =>
                  // the file stores ONLY nulls for the column, and the
                  // extracted predicates are null-rejecting: no match
                  false
                case Some((Some(mn), Some(mx))) =>
                  lo.forall(_ <= mx) && hi.forall(_ >= mn)
                case _ => true
              }
            }
        }
    }.map(_._1)
    if (keep.length >= files.length) return f
    // swap ONLY the file index: same options (incl. basePath, so the
    // bucket/v partition columns still parse), same schema for
    // partition-type resolution, same output attribute ids — parents
    // and the kept row-level Filter are untouched
    val idx = new InMemoryFileIndex(spark, keep.map(new Path(_)).toSeq,
      hfs.options, Some(hfs.schema))
    val newRel = hfs.copy(location = idx)(spark)
    Filter(cond, lr.copy(relation = newRel))
  }

  /** Per-session registration for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions` — idempotent. */
  def enable(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }
}

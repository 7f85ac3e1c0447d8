package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, InsertStarAction, LogicalPlan,
  MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

import graft.ext.MergeTable

/** SQL DML for the snapshot table: a real `MERGE INTO` statement
  * against `merge_table`.`/dir`, parsed by Spark's own grammar and
  * routed to [[graft.ext.MergeTable.merge]]'s clause engine — the
  * write-side twin of the `merge_table(...)` read TVF, so a
  * SQL-literate user reaches the conditional three-way merge the way
  * the reference's README promises its downstream is driven
  * (README.md:265-312 declares a SQL-first surface):
  *
  * {{{
  * MERGE INTO merge_table.`/path/to/table` AS t
  * USING src_view AS s
  * ON t.key = s.key
  * WHEN MATCHED AND s.cents > t.cents THEN UPDATE SET cents = s.cents
  * WHEN MATCHED THEN DELETE
  * WHEN NOT MATCHED AND s.cents % 3 != 0 THEN INSERT *
  * WHEN NOT MATCHED BY SOURCE THEN UPDATE SET cents = t.cents + 1
  * }}}
  *
  * The resolution rule [[MergeIntoMergeTable]] intercepts the parsed
  * [[MergeIntoTable]] while its target is still the unresolved
  * `merge_table.<dir>` identifier (the Delta `delta.`/path``
  * idiom) and replaces it with a runnable command; everything else —
  * clause-order dispatch, O(source buckets) without a by-source
  * clause, constraints, conflict retry, stats/fingerprint manifest
  * annotations — is the SAME engine the API path runs, so q166 can
  * hold the SQL statement to q161's oracle verbatim. The command
  * returns one row of clause stats (the Delta MERGE metrics shape).
  *
  * Scope is the engine's own contract, loudly enforced: the ON
  * condition must be key-equality on the table's key column (the
  * bucket discipline — a non-key merge would be a different
  * operator), an INSERT must assign the key from the source's, and
  * WITH SCHEMA EVOLUTION is rejected (extend via SET of a new column
  * is supported, silent evolution is not).
  *
  * The same rule also routes `INSERT INTO merge_table.`/dir`` (the
  * load verb — [[GraftInsertCommand]]) and the sourceless
  * UPDATE/DELETE sugar, so the full DML surface lives behind one
  * interception point. */
object MergeIntoMergeTable extends Rule[LogicalPlan] {

  private def targetOf(p: LogicalPlan): Option[(String, Option[String])] =
    p match {
      case SubqueryAlias(id, UnresolvedRelation(parts, _, _))
          if isMergeTableRef(parts) => Some((parts(1), Some(id.name)))
      case UnresolvedRelation(parts, _, _) if isMergeTableRef(parts) =>
        Some((parts(1), None))
      case _ => None
    }

  private def isMergeTableRef(parts: Seq[String]): Boolean =
    parts.length == 2 && parts.head.equalsIgnoreCase("merge_table")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case m: MergeIntoTable =>
        targetOf(m.targetTable) match {
          case Some((dir, tgtAlias)) =>
            if (m.withSchemaEvolution)
              throw new IllegalArgumentException(
                "MERGE INTO merge_table: WITH SCHEMA EVOLUTION is not " +
                  "supported — extend-only evolution happens through " +
                  "SET of a new column name, explicitly")
            val srcAlias = m.sourceTable match {
              case SubqueryAlias(id, _) => Some(id.name)
              case _ => None
            }
            GraftMergeCommand(dir, new CapturedMerge(m.sourceTable,
              tgtAlias, srcAlias, m.mergeCondition, m.matchedActions,
              m.notMatchedActions, m.notMatchedBySourceActions))
          case None => m
        }
      // UPDATE/DELETE sugar: a sourceless statement is a merge whose
      // every target row is not-matched-by-source — the honest
      // full-table pass SQL UPDATE/DELETE semantics demand (callers
      // with keys in hand use DELETE via MERGE or the deleteKeys API
      // for the O(impacted buckets) path)
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        targetOf(u.table) match {
          case Some((dir, tgtAlias)) =>
            GraftUpdateDeleteCommand(dir, new CapturedDml(tgtAlias,
              u.assignments, u.condition, isDelete = false))
          case None => u
        }
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
        targetOf(d.table) match {
          case Some((dir, tgtAlias)) =>
            GraftUpdateDeleteCommand(dir, new CapturedDml(tgtAlias,
              Nil, Some(d.condition), isDelete = true))
          case None => d
        }
      // INSERT INTO — the load verb (the reference's own COPY INTO
      // surface, README.md:286-291): routed through the engine's
      // upsert, so on a KEYED table a re-inserted key REPLACES its row
      // (stated loudly in the Scaladoc; the alternative — silent
      // duplicate keys — would corrupt every keyed read path).
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        targetOf(i.table) match {
          case Some((dir, _)) =>
            if (i.overwrite) throw new IllegalArgumentException(
              "INSERT OVERWRITE merge_table is not supported — the " +
                "snapshot table replaces state by KEY, not by " +
                "partition; use MERGE INTO / DELETE for conditional " +
                "rewrites or recreate the table for a full reload")
            if (i.partitionSpec.nonEmpty || i.ifPartitionNotExists)
              throw new IllegalArgumentException(
                "INSERT INTO merge_table takes no PARTITION clause — " +
                  "bucket layout is derived from the table key")
            GraftInsertCommand(dir,
              new CapturedInsert(i.query, i.userSpecifiedCols, i.byName))
          case None => i
        }
    }
}

/** Opaque carrier for the captured MERGE pieces: a plain class (not a
  * case class, not an Expression), so the command's product-derived
  * `expressions` stays empty — the analyzer neither re-resolves nor
  * rejects the deliberately-unresolved clause trees (they resolve at
  * run time against the engine's tgt/src struct frame, the only frame
  * they are meaningful in). */
final class CapturedMerge(
    val source: LogicalPlan,
    val tgtAlias: Option[String], val srcAlias: Option[String],
    val mergeCondition: Expression,
    val matchedActions: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
    val notMatchedActions: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
    val notMatchedBySourceActions: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction])
  extends Serializable

/** The runnable half: resolves the source, converts Spark's parsed
  * clause trees to [[MergeTable.MergeWhen]] Columns over the engine's
  * `tgt`/`src` struct frame, and runs ONE [[MergeTable.merge]] —
  * executed when the DataFrame returned by `spark.sql(...)` runs, like
  * every Spark DML command. */
final case class GraftMergeCommand(dir: String, captured: CapturedMerge)
  extends LeafRunnableCommand {
  import captured._

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("rows_updated", LongType)(),
    AttributeReference("rows_deleted", LongType)(),
    AttributeReference("rows_inserted", LongType)(),
    AttributeReference("rows_carried", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val key = MergeTable.keyOf(spark, dir)
    val srcDf = Bridge.ofRows(spark, source)
    val srcCols = srcDf.columns.toSeq
    val tgtSchema = MergeTable.readTable(spark, dir).schema
    val tgtCols = tgtSchema.fieldNames.filterNot(_ == "bucket").toSeq

    // requalify a parsed reference onto the engine's tgt/src structs;
    // anything that cannot be owned unambiguously fails loudly —
    // silent misattribution would rewrite the wrong side's values
    def remapParts(parts: Seq[String], what: String): Seq[String] =
      parts match {
        case Seq(q, c) if tgtAlias.contains(q) => Seq("tgt", c)
        case Seq(q, c) if srcAlias.contains(q) => Seq("src", c)
        case Seq(c) =>
          val inT = tgtCols.contains(c); val inS = srcCols.contains(c)
          if (inT && inS) throw new IllegalArgumentException(
            s"MERGE INTO merge_table: $what reference '$c' is ambiguous " +
              "(both sides carry it) — qualify with the table or source " +
              "alias")
          else if (inT) Seq("tgt", c)
          else if (inS) Seq("src", c)
          else throw new IllegalArgumentException(
            s"MERGE INTO merge_table: $what reference '$c' matches " +
              "neither the table nor the source")
        case other => throw new IllegalArgumentException(
          s"MERGE INTO merge_table: $what reference '${other.mkString(".")}' " +
            "must be <alias>.<column> or a bare column name")
      }
    def remapExpr(e: Expression, what: String): Expression =
      e.transformUp {
        case ua: UnresolvedAttribute =>
          UnresolvedAttribute(remapParts(ua.nameParts, what))
        case ar: AttributeReference => // pre-resolved: only the source
          // side can have resolved (the target was an unresolved
          // identifier when the rule fired)
          UnresolvedAttribute(Seq("src", ar.name))
      }
    def toCol(e: Expression, what: String): Column =
      Bridge.column(remapExpr(e, what))

    // the ON condition must be key-equality on the table's key — the
    // bucket discipline the engine's merge is defined over
    val onOk = remapExpr(mergeCondition, "ON") match {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        Set(a.nameParts, b.nameParts) ==
          Set(Seq("tgt", key), Seq("src", key))
      case _ => false
    }
    if (!onOk) throw new IllegalArgumentException(
      s"MERGE INTO merge_table: the ON condition must be key equality " +
        s"on the table's key column — ON <tgt>.$key = <src>.$key " +
        s"(got: ${mergeCondition.sql})")

    def assignName(a: Assignment): String = a.key match {
      case ua: UnresolvedAttribute => ua.nameParts.last
      case ar: AttributeReference => ar.name
      case other => throw new IllegalArgumentException(
        s"MERGE INTO merge_table: cannot assign to ${other.sql}")
    }
    def setMap(assigns: Seq[Assignment], what: String): Map[String, Column] =
      assigns.map(a => assignName(a) -> toCol(a.value, what)).toMap

    def updateWhen(cond: Option[Expression], assigns: Seq[Assignment],
        what: String): MergeTable.MergeWhen =
      MergeTable.MergeWhen(cond.map(toCol(_, what)),
        MergeTable.MergeAction.Update(setMap(assigns, what)))

    val matched = matchedActions.map {
      case UpdateAction(c, assigns, false) =>
        updateWhen(c, assigns, "WHEN MATCHED UPDATE")
      case UpdateStarAction(c) =>
        MergeTable.MergeWhen(c.map(toCol(_, "WHEN MATCHED UPDATE *")),
          MergeTable.MergeAction.UpdateAll)
      case UpdateAction(c, _, true) => // UPDATE SET * parses to fromStar
        MergeTable.MergeWhen(c.map(toCol(_, "WHEN MATCHED UPDATE *")),
          MergeTable.MergeAction.UpdateAll)
      case DeleteAction(c) =>
        MergeTable.MergeWhen(c.map(toCol(_, "WHEN MATCHED DELETE")),
          MergeTable.MergeAction.Delete)
      case other => throw new IllegalArgumentException(
        s"MERGE INTO merge_table: unsupported WHEN MATCHED action $other")
    }
    val notMatched = notMatchedActions.map {
      case InsertStarAction(c) =>
        MergeTable.MergeWhen(c.map(toCol(_, "WHEN NOT MATCHED INSERT *")),
          MergeTable.MergeAction.UpdateAll)
      case InsertAction(c, assigns) =>
        val what = "WHEN NOT MATCHED INSERT"
        val m = setMap(assigns, what)
        // the key must come from the source's key: an inserted row is
        // keyed (and bucketed) by the source key the full-outer join
        // coalesced — any other key expression would silently re-key
        val keyOk = assigns.find(a => assignName(a) == key)
          .map(a => remapExpr(a.value, what))
          .collect { case ua: UnresolvedAttribute => ua.nameParts }
          .contains(Seq("src", key))
        if (!keyOk) throw new IllegalArgumentException(
          s"MERGE INTO merge_table: INSERT must assign $key from the " +
            s"source's $key column (rows are keyed by it)")
        // SQL semantics: unassigned TABLE columns insert as NULL (the
        // engine's Update defaults an absent name to the source value,
        // which is the INSERT * shape — pin NULL explicitly instead)
        val full = tgtCols.filterNot(_ == key).map { c0 =>
          // typed null: a bare NULL literal would land a VOID column
          // in the written parquet and break the snapshot's schema
          c0 -> m.getOrElse(c0,
            Bridge.column(Literal.create(null, tgtSchema(c0).dataType)))
        }.toMap ++ (m - key)
        MergeTable.MergeWhen(c.map(toCol(_, what)),
          MergeTable.MergeAction.Update(full))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO merge_table: unsupported WHEN NOT MATCHED action $other")
    }
    val bySource = notMatchedBySourceActions.map {
      case UpdateAction(c, assigns, false) =>
        updateWhen(c, assigns, "WHEN NOT MATCHED BY SOURCE UPDATE")
      case DeleteAction(c) =>
        MergeTable.MergeWhen(
          c.map(toCol(_, "WHEN NOT MATCHED BY SOURCE DELETE")),
          MergeTable.MergeAction.Delete)
      case other => throw new IllegalArgumentException(
        "MERGE INTO merge_table: unsupported WHEN NOT MATCHED BY " +
          s"SOURCE action $other")
    }

    // 'graft.merges.mode' = 'mor' routes the whole clause merge
    // through deletion vectors + an append epoch (MergeTable.mergeMor)
    val st =
      if (MergeTable.properties(spark, dir)
          .get("graft.merges.mode").contains("mor"))
        MergeTable.mergeMor(spark, dir, srcDf,
          matched = matched, notMatched = notMatched,
          notMatchedBySource = bySource)
      else MergeTable.merge(spark, dir, srcDf,
        matched = matched, notMatched = notMatched,
        notMatchedBySource = bySource)
    Seq(Row(st.version, st.rowsUpdated, st.rowsDeleted, st.rowsInserted,
      st.rowsCarried))
  }
}

/** Opaque carrier for UPDATE/DELETE pieces (the [[CapturedMerge]]
  * rationale: keep the deliberately-unresolved trees out of the
  * analyzer's reach). */
final class CapturedDml(
    val tgtAlias: Option[String],
    val assignments: Seq[Assignment],
    val condition: Option[Expression],
    val isDelete: Boolean) extends Serializable

/** `UPDATE merge_table.`/dir`` SET ... [WHERE ...]` and
  * `DELETE FROM merge_table.`/dir`` [WHERE ...]`.
  *
  * Dispatch is COST-SHAPED (round-15): a WHERE whose conjuncts pin the
  * KEY to literals — `key = <lit>`, `key IN (<lits>)`, optionally
  * ANDed with residual predicates — runs as a KEYED merge (source =
  * the key literals, one matched clause carrying the residual), which
  * is the engine's O(impacted buckets) path: untouched buckets are
  * carried by manifest reference, byte-identical. Any other WHERE
  * (or none) runs as ONE [[MergeTable.merge]] whose source is EMPTY
  * and whose single not-matched-by-source clause carries the
  * statement's condition and action: every target row is by definition
  * not matched by an empty source — exactly the full-table pass SQL's
  * sourceless DML prices. Semantics are identical either way (a keyed
  * row failing the residual is carried unchanged; a key absent from
  * the table matches nothing); only the files rewritten differ.
  * Returns (version, rows_updated, rows_deleted). */
final case class GraftUpdateDeleteCommand(dir: String,
    captured: CapturedDml) extends LeafRunnableCommand
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import captured._

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("rows_updated", LongType)(),
    AttributeReference("rows_deleted", LongType)())

  /** Is `e` a reference to the table's key column (bare or via the
    * target alias)? */
  private def isKeyRef(e: Expression, key: String): Boolean = e match {
    case ua: UnresolvedAttribute => ua.nameParts match {
      case Seq(c) => c == key
      case Seq(q, c) => tgtAlias.contains(q) && c == key
      case _ => false
    }
    case _ => false
  }

  /** The WHERE's key-literal pin, if its conjuncts contain exactly one
    * `key = lit` / `key IN (lits...)`: (literals, residual conjuncts).
    * None = not keyed; run the full pass. */
  private def keyPin(cond: Expression, key: String)
      : Option[(Seq[Literal], Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (pins, rest) = conjuncts.partition {
      case EqualTo(a, _: Literal) if isKeyRef(a, key) => true
      case EqualTo(_: Literal, a) if isKeyRef(a, key) => true
      case org.apache.spark.sql.catalyst.expressions.In(a, vs)
          if isKeyRef(a, key) && vs.nonEmpty &&
            vs.forall(_.isInstanceOf[Literal]) => true
      case _ => false
    }
    if (pins.size != 1) return None // 0 = not keyed; 2+ = let the
    // full pass evaluate the conjunction (intersecting pins is legal
    // but never what a user meant — don't guess)
    val lits = pins.head match {
      case EqualTo(_, l: Literal) => Seq(l)
      case EqualTo(l: Literal, _) => Seq(l)
      case org.apache.spark.sql.catalyst.expressions.In(_, vs) =>
        vs.map(_.asInstanceOf[Literal])
    }
    if (lits.exists(_.value == null)) return None // NULL key matches
    // nothing under = / IN; the full pass preserves that for free
    Some((lits, rest))
  }

  /** Literal key values as a one-column DataFrame at the table key's
    * exact type — None when any literal's type cannot UP-cast to it
    * (a lossy cast could silently hit the wrong rows; the full pass
    * evaluates such predicates with Spark's own comparison rules). */
  private def keysDf(spark: SparkSession, key: String,
      keyType: org.apache.spark.sql.types.DataType,
      lits: Seq[Literal]): Option[org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.types._
    val rank = Map[DataType, Int](ByteType -> 1, ShortType -> 2,
      IntegerType -> 3, LongType -> 4)
    def upcastable(from: DataType): Boolean =
      from == keyType ||
        (rank.contains(from) && rank.contains(keyType) &&
          rank(from) <= rank(keyType))
    if (!lits.forall(l => upcastable(l.dataType))) return None
    // the analyzer coerces an IN list to one common type, so a single
    // local relation covers every literal; a mixed-type list (possible
    // only across separate conjuncts, which keyPin rejects) falls back
    val litTypes = lits.map(_.dataType).distinct
    if (litTypes.size != 1) return None
    val rows = lits.map { l =>
      Row(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType))
    }
    import scala.jdk.CollectionConverters._
    Some(spark.createDataFrame(rows.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(key, litTypes.head))))
      .select(org.apache.spark.sql.functions.col(key).cast(keyType)
        .as(key))
      .distinct())
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val key = MergeTable.keyOf(spark, dir)
    val t = MergeTable.readTable(spark, dir)
    val tgtCols = t.columns.filterNot(_ == "bucket").toSeq
    def remap(e: Expression, what: String): Expression = e.transformUp {
      case ua: UnresolvedAttribute => ua.nameParts match {
        case Seq(q, c) if tgtAlias.contains(q) =>
          UnresolvedAttribute(Seq("tgt", c))
        case Seq(c) if tgtCols.contains(c) =>
          UnresolvedAttribute(Seq("tgt", c))
        case other => throw new IllegalArgumentException(
          s"${if (isDelete) "DELETE FROM" else "UPDATE"} merge_table: " +
            s"$what reference '${other.mkString(".")}' does not name a " +
            "table column")
      }
    }
    def toCol(e: Expression, what: String): Column =
      Bridge.column(remap(e, what))
    val action =
      if (isDelete) MergeTable.MergeAction.Delete
      else {
        require(assignments.nonEmpty, "UPDATE needs a SET clause")
        val m = assignments.map { a =>
          val n = a.key match {
            case ua: UnresolvedAttribute => ua.nameParts.last
            case ar: AttributeReference => ar.name
            case other => throw new IllegalArgumentException(
              s"UPDATE merge_table: cannot assign to ${other.sql}")
          }
          require(n != key,
            s"UPDATE merge_table: the key column $key cannot be SET — " +
              "a re-keyed row belongs to a different bucket")
          n -> toCol(a.value, "SET")
        }.toMap
        MergeTable.MergeAction.Update(m)
      }
    // MERGE-ON-READ routing: with 'graft.deletes.mode' /
    // 'graft.updates.mode' = 'mor' set (SET TBLPROPERTIES), the verb
    // writes deletion vectors (+ an append epoch for UPDATE) instead
    // of rewriting buckets — same SQL, tombstone write path. The
    // predicate re-resolves against the table's plain logical names
    // (no tgt struct — the MOR verbs read the logical view).
    def toPlainCol(e: Expression): Column =
      Bridge.column(e.transformUp {
        case ua: UnresolvedAttribute => ua.nameParts match {
          case Seq(q, c) if tgtAlias.contains(q) =>
            UnresolvedAttribute(Seq(c))
          case Seq(c) if tgtCols.contains(c) => ua
          case other => throw new IllegalArgumentException(
            s"${if (isDelete) "DELETE FROM" else "UPDATE"} " +
              "merge_table: reference " +
              s"'${other.mkString(".")}' does not name a table column")
        }
      })
    if (!isDelete && MergeTable.properties(spark, dir)
        .get("graft.updates.mode").contains("mor")) {
      require(assignments.nonEmpty, "UPDATE needs a SET clause")
      val base = t.drop("bucket")
      val affected = condition.map(c => base.filter(toPlainCol(c)))
        .getOrElse(base)
      val setMap = assignments.map { a =>
        val n = a.key match {
          case ua: UnresolvedAttribute => ua.nameParts.last
          case ar: AttributeReference => ar.name
          case other => throw new IllegalArgumentException(
            s"UPDATE merge_table: cannot assign to ${other.sql}")
        }
        require(n != key,
          s"UPDATE merge_table: the key column $key cannot be SET — " +
            "a re-keyed row belongs to a different bucket")
        n -> toPlainCol(a.value)
      }.toMap
      // every SET sees OLD values (one projection, SQL UPDATE
      // semantics); a fresh name EXTENDS the schema (upsert contract)
      val existing = affected.columns.toSeq
      val updated = affected.select(
        existing.map(c => setMap.getOrElse(c,
          org.apache.spark.sql.functions.col(c)).as(c)) ++
        setMap.view.filterKeys(!existing.contains(_)).toSeq
          .sortBy(_._1).map { case (n, c) => c.as(n) }: _*)
      val st = MergeTable.upsertMor(spark, dir, updated)
      return Seq(Row(st.version, st.rowsMatched + st.rowsInserted, 0L))
    }
    if (isDelete && MergeTable.properties(spark, dir)
        .get("graft.deletes.mode").contains("mor")) {
      val st = condition.flatMap(keyPin(_, key)) match {
        // pure key pin: O(impacted buckets) candidate scan by key
        case Some((lits, Nil)) =>
          keysDf(spark, key, t.schema(key).dataType, lits) match {
            case Some(ks) => MergeTable.deleteKeysMor(spark, dir, ks)
            case None => MergeTable.deleteWhereMor(spark, dir,
              toPlainCol(condition.get))
          }
        case _ => MergeTable.deleteWhereMor(spark, dir,
          condition.map(toPlainCol).getOrElse(
            org.apache.spark.sql.functions.lit(true)))
      }
      return Seq(Row(st.version, 0L, st.rowsDeleted))
    }
    // keyed fast path: WHERE pins the key to literals
    condition.flatMap(keyPin(_, key)).foreach { case (lits, rest) =>
      keysDf(spark, key, t.schema(key).dataType, lits).foreach { ks =>
        val residual = rest.reduceOption(
          org.apache.spark.sql.catalyst.expressions.And.apply)
        val st = MergeTable.merge(spark, dir, ks, matched = Seq(
          MergeTable.MergeWhen(residual.map(toCol(_, "WHERE")), action)))
        return Seq(Row(st.version, st.rowsUpdated, st.rowsDeleted))
      }
    }
    // an EMPTY source puts every target row in the by-source class
    val cond = condition.map(toCol(_, "WHERE"))
    val emptySrc = t.select(t.col(key)).limit(0)
    val st = MergeTable.merge(spark, dir, emptySrc,
      notMatchedBySource = Seq(MergeTable.MergeWhen(cond, action)))
    Seq(Row(st.version, st.rowsUpdated, st.rowsDeleted))
  }
}

/** Opaque carrier for a captured INSERT: the unresolved source query
  * plus the optional column list — same plain-class discipline as
  * [[CapturedMerge]] (the analyzer must not walk into it). */
final class CapturedInsert(
    val query: LogicalPlan,
    val userCols: Seq[String],
    val byName: Boolean) extends Serializable

/** `INSERT INTO merge_table.`/dir`` [(cols...)] SELECT ... | VALUES ...`
  * — the SQL load verb, the statement-level twin of the reference's
  * `COPY INTO` (its own declared load path). Routes through
  * [[MergeTable.upsert]], which is what "insert" MEANS on a keyed
  * snapshot table: a batch row whose key already exists REPLACES that
  * row (latest-wins, the upsert contract), a new key appends; CHECK
  * constraints, extend-only schema discipline, conflict retry, and
  * manifest stats/fingerprint annotations are the same engine path
  * every API write takes. Alignment is Spark's own INSERT model:
  * positional against the table's LOGICAL column order, or the
  * explicit column list / BY NAME — but always TOTAL (every table
  * column assigned; a keyed snapshot row has no default values), and
  * values are cast to the column types under the session's cast
  * semantics. Returns one stats row (the Delta write-metrics shape).
  */
final case class GraftInsertCommand(dir: String, captured: CapturedInsert)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("buckets_rewritten", LongType)(),
    AttributeReference("files_written", LongType)(),
    AttributeReference("rows_replaced", LongType)(),
    AttributeReference("rows_inserted", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"INSERT INTO merge_table: $msg")
    val src = Bridge.ofRows(spark, captured.query)
    val tgtFields = MergeTable.readTable(spark, dir).schema.fields
      .filterNot(_.name == "bucket").toSeq
    val tgtCols = tgtFields.map(_.name)
    // label the source columns: explicit list > BY NAME > positional
    val labeled =
      if (captured.userCols.nonEmpty) {
        if (src.columns.length != captured.userCols.length)
          fail(s"the query produces ${src.columns.length} columns for " +
            s"a ${captured.userCols.length}-column list")
        src.toDF(captured.userCols: _*)
      } else if (captured.byName) src
      else {
        if (src.columns.length != tgtCols.length)
          fail(s"positional INSERT needs exactly the table's columns " +
            s"(${tgtCols.mkString(", ")}); the query produces " +
            s"${src.columns.length}")
        src.toDF(tgtCols: _*)
      }
    // TOTAL assignment, names matched case-insensitively (the session
    // resolver discipline), reordered to the table's logical order and
    // cast to its types
    val byLower = labeled.columns.map(c => c.toLowerCase -> c).toMap
    if (labeled.columns.length != tgtCols.length ||
        byLower.size != labeled.columns.length)
      fail(s"every table column must be assigned exactly once " +
        s"(expected: ${tgtCols.mkString(", ")}; " +
        s"got: ${labeled.columns.mkString(", ")})")
    val aligned = labeled.select(tgtFields.map { f =>
      val srcName = byLower.getOrElse(f.name.toLowerCase,
        fail(s"column ${f.name} is not assigned " +
          s"(got: ${labeled.columns.mkString(", ")})"))
      labeled.col(s"`$srcName`").cast(f.dataType).as(f.name)
    }: _*)
    val st = MergeTable.upsert(spark, dir, aligned)
    Seq(Row(st.version, st.bucketsRewritten, st.filesWritten,
      st.rowsMatched, st.rowsInserted))
  }
}

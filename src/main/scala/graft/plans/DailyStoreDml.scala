package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, If, In, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DateType

import graft.sources.{DailyStoreMerge, DailyStoreTable}

/** SQL DML on the dailystore — `MERGE INTO` / `UPDATE` / `DELETE`
  * rewritten at ANALYSIS time into the connector's copy-on-write
  * commits, the extension-tier path the survey sanctions (custom
  * `Rule` via `SparkSessionExtensions`) instead of the full
  * `SupportsRowLevelOperations` machinery: Spark's own group-based
  * rewrite (`RewriteMergeIntoTable` → `ReplaceData`) replans the WHOLE
  * table unless the connector also implements runtime group filtering
  * over a hand-rolled DSv2 batch scan — exactly the parquet machinery
  * the r14 read-by-delegation judgment avoids duplicating. This rule
  * reuses [[DailyStoreMerge.mergeByKey]]'s property-tested semantics
  * and the `overwriteDays` ValuesMode commit instead, so every SQL DML
  * statement inherits the manifest + writer lease, crash replay, and
  * time-travel versioning, and rewrites ONLY the touched day
  * partitions.
  *
  * Injected by `graft.functions.GraftExtensions`
  * (`spark.sql.extensions`); the analyzer's Resolution batch runs it to
  * fixpoint BEFORE the built-in row-level rewrite batch would reject
  * the table ("does not support row-level operations"). Shapes:
  *
  *  - `DELETE FROM dstore.t WHERE <cond>` — any deterministic
  *    condition. Affected days = days holding matched rows (one
  *    column-pruned pass); each is rewritten without the matched rows;
  *    a day losing every row is REMOVED (the explicit condemned set).
  *  - `UPDATE dstore.t SET c = e, ... [WHERE <cond>]` — affected days
  *    rewrite with per-column `IF(cond, e, c)`. Assigning the
  *    partition column is allowed: the moved rows land in their new
  *    day's directory (the commit renames staged files into any day),
  *    while the old day's rewrite drops them.
  *  - `MERGE INTO dstore.t USING src ON t.k = src.k WHEN MATCHED THEN
  *    UPDATE SET * WHEN NOT MATCHED THEN INSERT *` — the keyed-replace
  *    shape, routed through [[DailyStoreMerge.mergeByKey]] (which also
  *    enforces the SQL cardinality rule: duplicate source keys are
  *    rejected). The UPDATE and INSERT assignments must agree per
  *    column (SET * does), and the key assignment must be the ON
  *    equality's source side — both are what `SET * / INSERT *`
  *    produce; anything else (extra WHEN clauses, clause conditions,
  *    NOT MATCHED BY SOURCE, diverging assignments) fails loudly with
  *    the supported shape in the message rather than silently
  *    degrading.
  *
  * Nothing here touches non-dailystore tables: the rule matches only
  * relations whose `Table` is a [[DailyStoreTable]].
  */
object DailyStoreDml extends Rule[LogicalPlan] {

  private def dailystoreOf(plan: LogicalPlan): Option[(DailyStoreTable, LogicalPlan)] =
    EliminateSubqueryAliases(plan) match {
      case r @ DataSourceV2Relation(t: DailyStoreTable, _, _, _, _, _) =>
        Some((t, r))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(tbl, cond) if d.resolved =>
      dailystoreOf(tbl) match {
        case Some((t, rel)) =>
          requireDeterministic(cond, "DELETE")
          DailyStoreDeleteCommand(t.storePath, t.partitionCol, rel, cond)
        case None => d
      }
    case u @ UpdateTable(tbl, assignments, cond) if u.resolved =>
      dailystoreOf(tbl) match {
        case Some((t, rel)) =>
          val assigns = assignments.map {
            case Assignment(k: AttributeReference, v) => (k, v)
            case Assignment(other, _) => fail(
              s"UPDATE on a dailystore supports plain column assignments; " +
                s"got ${other.sql}")
          }
          cond.foreach(requireDeterministic(_, "UPDATE"))
          DailyStoreUpdateCommand(t.storePath, t.partitionCol, rel,
            assigns, cond.getOrElse(Literal.TrueLiteral))
        case None => u
      }
    case m: MergeIntoTable if m.resolved =>
      dailystoreOf(m.targetTable) match {
        case Some((t, rel)) => rewriteMerge(m, t, rel)
        case None => m
      }
  }

  /** DELETE/UPDATE evaluate the condition TWICE (affected-day discovery,
    * then the rewrite) — a nondeterministic predicate could condemn one
    * row set and rewrite another, silently losing or keeping rows. Fail
    * at analysis, like Spark's own row-level rewrites do. */
  private def requireDeterministic(cond: Expression, stmt: String): Unit =
    if (!cond.deterministic)
      fail(s"$stmt condition ${cond.sql} is nondeterministic — the " +
        "condition is evaluated once to find affected days and again " +
        "in the rewrite, so it must be deterministic")

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_3100",
      Map("message" -> s"dailystore SQL DML: $msg"),
      None)

  private val MergeShape =
    "the supported MERGE shapes are: (keyed replace) MERGE INTO " +
      "<dailystore> USING <src> ON <target>.<key> = <src>.<col> " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *; " +
      "(keyed delete) the same ON with only WHEN MATCHED THEN DELETE " +
      "(see graft.sources.DailyStoreMerge for the general Scala API)"

  /** The ON equality's (target attr, source side) — shared by both
    * supported merge shapes. */
  private def mergeKeyOf(m: MergeIntoTable,
                         rel: LogicalPlan): (AttributeReference, AttributeReference) =
    m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if rel.outputSet.contains(a) &&
            m.sourceTable.outputSet.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if rel.outputSet.contains(a) &&
            m.sourceTable.outputSet.contains(b) => (a, b)
      case other => fail(s"merge condition ${other.sql} — $MergeShape")
    }

  private def rewriteMerge(m: MergeIntoTable, t: DailyStoreTable,
                           rel: LogicalPlan): LogicalPlan = {
    if (m.notMatchedBySourceActions.nonEmpty)
      fail(s"WHEN NOT MATCHED BY SOURCE is not supported — $MergeShape")
    if (m.withSchemaEvolution)
      fail(s"WITH SCHEMA EVOLUTION is not supported — $MergeShape")
    // the KEYED-DELETE shape (the second supported form): WHEN MATCHED
    // THEN DELETE with no other clauses — delete-by-key-list (the
    // GDPR/tombstone pattern). Discovery finds the days holding the
    // keys; each rewrites without them; source rows matching nothing
    // are ignored, exactly MERGE's semantics.
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(None)), Seq()) =>
        val (kAttr, sKey) = mergeKeyOf(m, rel)
        return DailyStoreKeyedDeleteCommand(t.storePath, t.partitionCol,
          rel, kAttr, Project(Seq(Alias(sKey, kAttr.name)()), m.sourceTable))
      case _ => ()
    }
    val uAssigns = m.matchedActions match {
      case Seq(UpdateAction(None, as, _)) => as
      case other => fail(
        s"matched actions ${other.mkString(", ")} — $MergeShape")
    }
    val iAssigns = m.notMatchedActions match {
      case Seq(InsertAction(None, as)) => as
      case other => fail(
        s"not-matched actions ${other.mkString(", ")} — $MergeShape")
    }
    val (keyAttr, srcKey) = mergeKeyOf(m, rel)
    def byTarget(as: Seq[Assignment]): Map[String, Expression] =
      as.map {
        case Assignment(k: AttributeReference, v) => k.name -> v
        case Assignment(other, _) => fail(
          s"assignment to ${other.sql} — $MergeShape")
      }.toMap
    val uMap = byTarget(uAssigns)
    val iMap = byTarget(iAssigns)
    rel.output.foreach { attr =>
      (uMap.get(attr.name), iMap.get(attr.name)) match {
        case (Some(u), Some(i)) if u.semanticEquals(i) => ()
        case _ => fail(
          s"UPDATE and INSERT must assign every target column " +
            s"identically ('${attr.name}' differs or is missing) — " +
            MergeShape)
      }
    }
    iMap(keyAttr.name) match {
      case a: AttributeReference if a.semanticEquals(srcKey) => ()
      case other => fail(
        s"the key column '${keyAttr.name}' must be assigned the ON " +
          s"equality's source side, got ${other.sql} — $MergeShape")
    }
    val updates = Project(
      rel.output.map(attr =>
        Alias(iMap(attr.name), attr.name)()),
      m.sourceTable)
    DailyStoreMergeCommand(t.storePath, t.partitionCol,
      keyAttr.name, updates)
  }

  /** The DELETE metadata-only fast path's day set: `Some(days)` when
    * `cond` is a deterministic, subquery-free predicate over the
    * partition column ALONE — then it selects whole days, decidable by
    * evaluating the predicate against each listed `pcol=` directory
    * value without reading a single data row. `None` = not a whole-day
    * condition, take the scan path.
    */
  private[plans] def wholeDayMatches(spark: SparkSession, path: String,
      pcol: String, pcolAttr: Attribute,
      cond: Expression): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{AttributeSet, BoundReference, PlanExpression}
    if (!cond.deterministic) return None
    if (!cond.references.subsetOf(AttributeSet(pcolAttr))) return None
    if (cond.exists(_.isInstanceOf[PlanExpression[_]])) return None
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(live)) return Some(Nil)
    val dayStrings = fs.listStatus(live)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pcol="))
      .map(_.getPath.getName.stripPrefix(s"$pcol="))
    val bound = cond.transform {
      case a: Attribute if a.semanticEquals(pcolAttr) =>
        BoundReference(0, pcolAttr.dataType, nullable = false)
    }
    val matched = dayStrings.filter { ds =>
      val v: Any = pcolAttr.dataType match {
        case DateType => org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaDate(java.sql.Date.valueOf(ds))
        case _ => org.apache.spark.unsafe.types.UTF8String.fromString(ds)
      }
      bound.eval(InternalRow(v)) == true
    }
    Some(matched.toSeq.sorted)
  }

  /** Typed day literals so the affected-day predicate partition-prunes
    * (a string literal against a date column would cast the COLUMN). */
  private[plans] def dayLiterals(pcolAttr: Attribute,
                                 days: Seq[String]): Seq[Expression] =
    pcolAttr.dataType match {
      case DateType => days.map(d => Literal(java.sql.Date.valueOf(d)))
      case _ => days.map(Literal(_))
    }

  private[plans] def pcolAttrOf(rel: LogicalPlan, pcol: String): Attribute =
    rel.output.find(_.name.equalsIgnoreCase(pcol)).getOrElse(
      fail(s"relation lacks the partition column '$pcol'"))

  /** Heal any torn prior commit BEFORE a DML command reads the store:
    * discovery and the replacement scan against a store with a pending
    * manifest would compute from torn state, and the WRITE's own
    * recovery preamble replays that manifest only AFTER the replacement
    * rows were computed — the command would report success while the
    * replay resurrects rows it never saw. Same ordering as
    * [[graft.sources.DailyStoreMerge.mergeByKey]]'s preamble. */
  private[plans] def heal(spark: SparkSession, path: String): Unit =
    graft.sources.DailyStoreRecovery.recoverPendingCommits(
      path, spark.sessionState.newHadoopConf())

  /** Days (as directory strings) holding rows matching `cond` — one
    * column-pruned, filter-pushed pass; bounded by the day domain. */
  private[plans] def affectedDays(spark: SparkSession, rel: LogicalPlan,
                                  pcolAttr: Attribute,
                                  cond: Expression): Seq[String] =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(
        spark, Project(Seq(pcolAttr), Filter(cond, rel)))
      .distinct().collect().map(r => String.valueOf(r.get(0))).toSeq.sorted

  private[plans] def writeReplacement(
      df: org.apache.spark.sql.DataFrame, path: String, pcol: String,
      days: Seq[String]): Unit =
    df.write.format("dailystore")
      .option("path", path).option("partitionCol", pcol)
      .option("overwriteDays", days.mkString(","))
      .mode("overwrite").save()
}

/** `DELETE FROM <dailystore> WHERE cond` (class doc of
  * [[DailyStoreDml]]): rewrite each affected day without its matched
  * rows; a fully-deleted day's directory is removed.
  */
case class DailyStoreDeleteCommand(path: String, pcol: String,
                                   rel: LogicalPlan, cond: Expression)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(rel)

  override def run(spark: SparkSession): Seq[Row] = {
    DailyStoreDml.heal(spark, path)
    val pcolAttr = DailyStoreDml.pcolAttrOf(rel, pcol)
    // METADATA-ONLY fast path: a condition over the partition column
    // alone selects WHOLE days, so the condemned set is computable from
    // the directory listing (evaluate the predicate against each day's
    // value) and no data row needs to be read or rewritten — at 100 TB,
    // dropping an old day is directory surgery, not a scan. The commit
    // still flows through the connector (empty replacement frame +
    // explicit condemned set), so the manifest, lease, and retention
    // archive cover it exactly like a data delete.
    val metadataDays = DailyStoreDml.wholeDayMatches(
      spark, path, pcol, pcolAttr, cond)
    val days = metadataDays.getOrElse(
      DailyStoreDml.affectedDays(spark, rel, pcolAttr, cond))
    if (days.isEmpty) return Seq.empty
    val replacement =
      if (metadataDays.isDefined)
        org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(
          spark, LocalRelation(rel.output))
      else
        // survivors are rows where cond is NOT TRUE — null-safe, like
        // Spark's own RewriteDeleteFromTable: a plain Not(cond) would
        // silently DELETE every row where the condition evaluates to
        // NULL (e.g. `WHERE v = 'x'` against a null v)
        org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(
          spark,
          Filter(And(In(pcolAttr, DailyStoreDml.dayLiterals(pcolAttr, days)),
            Not(org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
              cond, Literal.TrueLiteral))), rel))
    DailyStoreDml.writeReplacement(replacement, path, pcol, days)
    Seq.empty
  }
}

/** `UPDATE <dailystore> SET ... [WHERE cond]` (class doc of
  * [[DailyStoreDml]]): affected days rewrite with per-column
  * `IF(cond, value, col)`; partition-column assignments move rows into
  * their new day's directory.
  */
case class DailyStoreUpdateCommand(path: String, pcol: String,
    rel: LogicalPlan, assigns: Seq[(AttributeReference, Expression)],
    cond: Expression)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(rel)

  override def run(spark: SparkSession): Seq[Row] = {
    DailyStoreDml.heal(spark, path)
    val pcolAttr = DailyStoreDml.pcolAttrOf(rel, pcol)
    val days = DailyStoreDml.affectedDays(spark, rel, pcolAttr, cond)
    if (days.isEmpty) return Seq.empty
    val byId = assigns.map { case (k, v) => k.exprId -> v }.toMap
    val cols = rel.output.map { attr =>
      byId.get(attr.exprId) match {
        case Some(v) => Alias(If(cond, v, attr), attr.name)()
        case None => attr
      }
    }
    val replacement = org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(
      spark,
      Project(cols,
        Filter(In(pcolAttr, DailyStoreDml.dayLiterals(pcolAttr, days)), rel)))
    DailyStoreDml.writeReplacement(replacement, path, pcol, days)
    Seq.empty
  }
}

/** `MERGE ... WHEN MATCHED THEN DELETE` — delete-by-key-list (class
  * doc of [[DailyStoreDml]]): discovery semi-join finds the days
  * holding the source keys; each rewrites anti-joined against them
  * (broadcast — the key list is the small side); a day losing every
  * row is removed. Source keys matching nothing are ignored, per
  * MERGE semantics.
  */
case class DailyStoreKeyedDeleteCommand(path: String, pcol: String,
    rel: LogicalPlan, keyAttr: AttributeReference, keys: LogicalPlan)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(rel, keys)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{broadcast, col}
    DailyStoreDml.heal(spark, path)
    val bridge = org.apache.spark.sql.graftbridge.GraftSqlBridge
    val pcolAttr = DailyStoreDml.pcolAttrOf(rel, pcol)
    val target = bridge.ofRows(spark, rel)
    val keyDf = bridge.ofRows(spark, keys).distinct()
    // key == partition column (ON t.d = s.d) degenerates to a day-list
    // delete; the general select would duplicate the column
    val discoveryCols =
      if (keyAttr.name == pcol) Seq(col(pcol)) else
        Seq(col(pcol), col(keyAttr.name))
    val days = target
      .select(discoveryCols: _*)
      .join(broadcast(keyDf), Seq(keyAttr.name), "left_semi")
      .select(col(pcol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (days.isEmpty) return Seq.empty
    val replacement = bridge.ofRows(spark,
        Filter(In(pcolAttr, DailyStoreDml.dayLiterals(pcolAttr, days)), rel))
      .join(broadcast(keyDf), Seq(keyAttr.name), "left_anti")
      .select(rel.output.map(a => col(a.name)): _*)
    DailyStoreDml.writeReplacement(replacement, path, pcol, days)
    Seq.empty
  }
}

/** The keyed-replace `MERGE INTO` (class doc of [[DailyStoreDml]]),
  * routed through [[DailyStoreMerge.mergeByKey]] — discovery scan,
  * touched-day copy-on-write, manifest + lease, duplicate-source-key
  * rejection (SQL's cardinality rule).
  */
case class DailyStoreMergeCommand(path: String, pcol: String,
                                  key: String, updates: LogicalPlan)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(updates)

  override def run(spark: SparkSession): Seq[Row] = {
    val updatesDf = org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(
      spark, updates)
    DailyStoreMerge.mergeByKey(spark, path, updatesDf, key, pcol)
    Seq.empty
  }
}

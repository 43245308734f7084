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
    "the supported MERGE shape is: MERGE INTO <dailystore> USING <src> " +
      "ON <target>.<key> = <src>.<col>, with at most ONE WHEN MATCHED " +
      "clause ([AND <cond>] THEN UPDATE SET <col> = <expr>, ... | SET * " +
      "| DELETE) and at most ONE WHEN NOT MATCHED clause ([AND <cond>] " +
      "THEN INSERT assigning every target column, e.g. INSERT *), at " +
      "least one clause total; WHEN NOT MATCHED BY SOURCE, WITH SCHEMA " +
      "EVOLUTION, subqueries and nondeterministic expressions in " +
      "clauses are not supported " +
      "(see graft.sources.DailyStoreMerge for the Scala API)"

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
    val (keyAttr, srcKey) = mergeKeyOf(m, rel)
    // the KEYED-DELETE fast path: WHEN MATCHED THEN DELETE alone —
    // delete-by-key-list (the GDPR/tombstone pattern). Discovery finds
    // the days holding the keys; each rewrites without them; source
    // rows matching nothing are ignored, exactly MERGE's semantics.
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(None)), Seq()) =>
        return DailyStoreKeyedDeleteCommand(t.storePath, t.partitionCol,
          rel, keyAttr,
          Project(Seq(Alias(srcKey, keyAttr.name)()), m.sourceTable))
      case _ => ()
    }
    def byTarget(as: Seq[Assignment]): Map[String, Expression] =
      as.map {
        case Assignment(k: AttributeReference, v) => k.name -> v
        case Assignment(other, _) => fail(
          s"assignment to ${other.sql} — $MergeShape")
      }.toMap
    // guards shared by both remaining paths: every clause condition and
    // assignment value must be deterministic and subquery-free — the
    // source/conditions are evaluated more than once (discovery, then
    // the rewrite), the double-evaluation hazard class
    def guard(e: Expression, what: String): Unit = {
      if (!e.deterministic)
        fail(s"$what ${e.sql} is nondeterministic — $MergeShape")
      if (e.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
        fail(s"$what ${e.sql} carries a subquery — $MergeShape")
    }
    // the KEYED-REPLACE fast path: unconditional UPDATE + INSERT whose
    // assignments agree on EVERY column with the key assigned the ON
    // equality's source side — exactly what SET * / INSERT * produce.
    // Routed through mergeByKey (one discovery scan, no outer join).
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(UpdateAction(None, uAs, _)), Seq(InsertAction(None, iAs))) =>
        val uMap = byTarget(uAs)
        val iMap = byTarget(iAs)
        val replaceShaped =
          rel.output.forall { attr =>
            (uMap.get(attr.name), iMap.get(attr.name)) match {
              case (Some(u), Some(i)) => u.semanticEquals(i)
              case _ => false
            }
          } && (iMap(keyAttr.name) match {
            case a: AttributeReference => a.semanticEquals(srcKey)
            case _ => false
          })
        if (replaceShaped) {
          iMap.values.foreach(guard(_, "assignment"))
          val updates = Project(
            rel.output.map(attr => Alias(iMap(attr.name), attr.name)()),
            m.sourceTable)
          return DailyStoreMergeCommand(t.storePath, t.partitionCol,
            keyAttr.name, updates)
        }
      case _ => ()
    }
    // the GENERAL read-modify path (r20): at most one conditional
    // matched clause (partial-column UPDATE or DELETE), at most one
    // conditional NOT MATCHED INSERT covering every target column —
    // insert-if-absent, conditional corrections, keyed tombstones with
    // a guard, in any combination. Semantics are SQL MERGE's: each
    // matched target COPY updates/deletes (no keyed-replace collapse),
    // unmatched source rows insert into their day.
    val (update, delete) = m.matchedActions match {
      case Seq() => (None, None)
      case Seq(UpdateAction(cond, as, _)) =>
        cond.foreach(guard(_, "WHEN MATCHED condition"))
        val ua = as.map {
          case Assignment(k: AttributeReference, v)
              if rel.outputSet.contains(k) =>
            guard(v, "UPDATE assignment"); (k, v)
          case Assignment(other, _) => fail(
            s"assignment to ${other.sql} — $MergeShape")
        }
        (Some((cond, ua)), None)
      case Seq(DeleteAction(cond)) =>
        cond.foreach(guard(_, "WHEN MATCHED condition"))
        (None, Some(cond))
      case other => fail(
        s"at most one WHEN MATCHED clause is supported, got " +
          s"${other.size} — $MergeShape")
    }
    val insert = m.notMatchedActions match {
      case Seq() => None
      case Seq(InsertAction(cond, as)) =>
        cond.foreach(guard(_, "WHEN NOT MATCHED condition"))
        val iMap = byTarget(as)
        iMap.values.foreach(guard(_, "INSERT assignment"))
        val missing = rel.output.filterNot(a => iMap.contains(a.name))
        if (missing.nonEmpty) fail(
          s"INSERT must assign every target column (missing " +
            s"${missing.map(_.name).mkString(", ")}) — $MergeShape")
        Some((cond, rel.output.map(a => iMap(a.name))))
      case other => fail(
        s"at most one WHEN NOT MATCHED clause is supported, got " +
          s"${other.size} — $MergeShape")
    }
    if (update.isEmpty && delete.isEmpty && insert.isEmpty)
      fail(s"MERGE needs at least one clause — $MergeShape")
    DailyStoreGeneralMergeCommand(t.storePath, t.partitionCol, rel,
      keyAttr, srcKey, m.sourceTable, update, delete, insert)
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
    // only types whose directory-name string this method can bind
    // faithfully: a digit-like string day (d=20240101) makes partition
    // inference type the column INTEGER, and binding a UTF8String into
    // an integer-typed predicate would CCE or mis-compare — let the
    // scan path (whose analysis coerces types) handle anything else
    pcolAttr.dataType match {
      case DateType | org.apache.spark.sql.types.StringType => ()
      case _ => return None
    }
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
    * (a string literal against a date column would cast the COLUMN).
    * For any other inferred type (a digit-like string day directory
    * infers INTEGER), fold the directory string through a literal cast
    * — foldable, so constant folding leaves a typed literal and the
    * predicate stays a partition filter. */
  private[plans] def dayLiterals(pcolAttr: Attribute,
                                 days: Seq[String]): Seq[Expression] =
    pcolAttr.dataType match {
      case DateType => days.map(d => Literal(java.sql.Date.valueOf(d)))
      case org.apache.spark.sql.types.StringType => days.map(Literal(_))
      case dt => days.map(d =>
        org.apache.spark.sql.catalyst.expressions.Cast(Literal(d), dt))
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
    import org.apache.spark.sql.functions.col
    DailyStoreDml.heal(spark, path)
    val bridge = org.apache.spark.sql.graftbridge.GraftSqlBridge
    val pcolAttr = DailyStoreDml.pcolAttrOf(rel, pcol)
    val target = bridge.ofRows(spark, rel)
    // MATERIALIZE the key list: discovery and the rewrite would
    // otherwise evaluate the merge source twice, and a nondeterministic
    // source (a sampled batch) could discover days for one key set and
    // anti-join a different one — success reported on an incomplete
    // delete. Same hazard and same fix as mergeByKey's source
    // materialization; released after the commit.
    val keyCp = graft.util.Checkpoints.tracked(
      bridge.ofRows(spark, keys).distinct())
    try {
      // the checkpoint already ran the distinct — its count is a cheap
      // local aggregate, and it sizes the joins (broadcast vs
      // shuffle_hash) exactly like mergeByKey's contract count does
      val keyDf = graft.sources.DailyStoreMerge.sizedKeySide(
        spark, keyCp.df, keyCp.df.count())
      // key == partition column (ON t.d = s.d) degenerates to a day-list
      // delete; the general select would duplicate the column
      val discoveryCols =
        if (keyAttr.name == pcol) Seq(col(pcol)) else
          Seq(col(pcol), col(keyAttr.name))
      val days = target
        .select(discoveryCols: _*)
        .join(keyDf, Seq(keyAttr.name), "left_semi")
        .select(col(pcol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      if (days.isEmpty) return Seq.empty
      val replacement = bridge.ofRows(spark,
          Filter(In(pcolAttr, DailyStoreDml.dayLiterals(pcolAttr, days)), rel))
        .join(keyDf, Seq(keyAttr.name), "left_anti")
        .select(rel.output.map(a => col(a.name)): _*)
      DailyStoreDml.writeReplacement(replacement, path, pcol, days)
      Seq.empty
    } finally keyCp.release()
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
    // requireUniqueMatchedKeys: SQL MERGE updates EACH matched copy,
    // so a duplicate-key target must fail loudly rather than let the
    // keyed replace collapse the copies (DailyStoreMerge class doc)
    DailyStoreMerge.mergeByKey(spark, path, updatesDf, key, pcol,
      requireUniqueMatchedKeys = true)
    Seq.empty
  }
}

/** The GENERAL `MERGE INTO` (class doc of [[DailyStoreDml]]):
  * conditional/partial matched UPDATE or DELETE plus conditional
  * NOT-MATCHED INSERT, in any combination, with SQL MERGE's
  * update-each-copy semantics. Copy-on-write of only the touched days,
  * via one left-outer join of the touched-day rows against the
  * (materialized, size-guarded) source:
  *
  *  1. the source is `localCheckpoint`ed ONCE — discovery, the insert
  *     anti-join, and the rewrite all read the same materialized rows
  *     (the nondeterministic-source double-evaluation hazard);
  *     duplicate source keys are rejected (SQL's a-target-row-matches-
  *     at-most-one-source-row cardinality rule), as are null source
  *     keys (they can only feed null-keyed inserts);
  *  2. DISCOVERY: the store's (pcol, key) columns semi-joined against
  *     the source keys → the days holding matched rows. INSERT rows'
  *     days join the touched set, since an insert day's existing rows
  *     must survive the day's rewrite;
  *  3. REWRITE: touched-day rows LEFT OUTER JOIN source on the key.
  *     `matched` = the source key is non-null post-join. UPDATE
  *     projects `IF(matched AND cond, value, col)` per assigned
  *     column; DELETE filters `NOT (matched AND cond)` null-safely;
  *     INSERT appends source rows whose key matched NOTHING (anti-join
  *     against the matched keys — computed from the touched days only,
  *     which is sound because every matched key's day IS touched),
  *     filtered by the insert condition. One `overwriteDays` commit.
  *
  * An INSERT-ONLY merge (insert-if-absent — the reference's
  * incremental append, cv.py:110) skips the rewrite entirely: the
  * unmatched source rows are APPENDED, one ordinary dailystore commit,
  * no day rewritten. Join sides follow the same measured-cardinality
  * broadcast/shuffle_hash guard as [[DailyStoreMerge.mergeByKey]].
  */
case class DailyStoreGeneralMergeCommand(path: String, pcol: String,
    rel: LogicalPlan, keyAttr: AttributeReference,
    srcKey: AttributeReference, src: LogicalPlan,
    update: Option[(Option[Expression],
      Seq[(AttributeReference, Expression)])],
    delete: Option[Option[Expression]],
    insert: Option[(Option[Expression], Seq[Expression])])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(rel, src)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, IsNotNull}
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Join, JoinHint}
    import org.apache.spark.sql.functions.col
    val bridge = org.apache.spark.sql.graftbridge.GraftSqlBridge
    DailyStoreDml.heal(spark, path)
    val pcolAttr = DailyStoreDml.pcolAttrOf(rel, pcol)
    val srcCp = graft.util.Checkpoints.tracked(bridge.ofRows(spark, src))
    try {
      // REMAP the materialized source to fresh exprIds: a self-merge
      // (source reading the target table) would otherwise put the same
      // exprId on both join sides. Every stored expression referencing
      // the source is rewritten through the map.
      val srcOut = srcCp.df.queryExecution.logical.output
      val fresh = srcOut.map(a => a.exprId -> a.newInstance()).toMap
      val srcPlan = Project(
        srcOut.map(a => Alias(a, a.name)(exprId = fresh(a.exprId).exprId)),
        srcCp.df.queryExecution.logical)
      def remap(e: Expression): Expression = e.transform {
        case a: AttributeReference if fresh.contains(a.exprId) =>
          fresh(a.exprId)
      }
      val srcKeyF = remap(srcKey).asInstanceOf[AttributeReference]
      // source contract: non-null, unique keys (class doc)
      val srcKeysAll = bridge.ofRows(spark,
        Project(Seq(Alias(srcKeyF, "k")()), srcPlan))
      val chk = srcKeysAll.agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.count(col("k")).as("nk"),
        org.apache.spark.sql.functions.countDistinct(col("k")).as("nd"))
        .head()
      val n = chk.getLong(0)
      if (n == 0) return Seq.empty
      require(chk.getLong(1) == n,
        "dailystore MERGE: the source carries null merge keys — a null " +
          "key matches nothing and could only feed a null-keyed insert")
      require(chk.getLong(2) == n,
        "dailystore MERGE: the source carries duplicate merge keys — a " +
          "target row must match at most one source row (SQL's MERGE " +
          "cardinality rule)")
      val srcKeysPlan = Distinct(Project(Seq(srcKeyF), srcPlan))
      val sizedKeys = DailyStoreMerge.sizedKeySide(spark,
        bridge.ofRows(spark, srcKeysPlan), n).queryExecution.logical
      // DISCOVERY — days holding matched keys (skipped when no matched
      // clause exists: an insert-only merge never rewrites a day)
      val hasRewrite = update.isDefined || delete.isDefined
      val matchedDays: Seq[String] =
        if (!hasRewrite) Nil
        else bridge.ofRows(spark,
            Join(Project(Seq(pcolAttr, keyAttr).distinct, rel), sizedKeys,
              org.apache.spark.sql.catalyst.plans.LeftSemi,
              Some(EqualTo(keyAttr, srcKeyF)), JoinHint.NONE))
          .select(col(pcolAttr.name).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
      // matched KEYS, for the insert anti-join — from the touched days
      // only (sound: a matched key's day is by definition in
      // matchedDays). For insert-only merges there are no matchedDays,
      // so the semi-join runs against the full store's key column —
      // the same column-pruned scan class as discovery.
      def touchedBase(days: Seq[String]): LogicalPlan =
        if (days.isEmpty) LocalRelation(rel.output)
        else Filter(In(pcolAttr,
          DailyStoreDml.dayLiterals(pcolAttr, days)), rel)
      val insertRowsCp: Option[graft.util.Checkpoints.Tracked] =
        insert.map { case (cond, values) =>
          val matchedKeysBase =
            if (hasRewrite) touchedBase(matchedDays)
            else rel
          val matchedKeys = Distinct(Project(Seq(keyAttr),
            Join(Project(Seq(keyAttr), matchedKeysBase), sizedKeys,
              org.apache.spark.sql.catalyst.plans.LeftSemi,
              Some(EqualTo(keyAttr, srcKeyF)), JoinHint.NONE)))
          val condT = cond.map(c =>
            EqualNullSafe(remap(c), Literal.TrueLiteral))
            .getOrElse(Literal.TrueLiteral)
          val sizedMatched = DailyStoreMerge.sizedKeySide(spark,
            bridge.ofRows(spark, matchedKeys), n).queryExecution.logical
          // NOT MATCHED is decided by the ON equality on the SOURCE row
          // (SQL's rule), so the anti-join runs on the source's merge
          // key BEFORE the INSERT values project — joining on the
          // projected key value instead would re-classify whenever the
          // INSERT assigns the key anything other than the ON column
          // (e.g. INSERT (k, ...) VALUES (s.id + 1000, ...)): a matched
          // source row would silently insert, and an unmatched row
          // whose assigned key collides with a matched key would
          // silently drop (r20 review)
          val notMatchedSrc = Join(srcPlan, sizedMatched,
            org.apache.spark.sql.catalyst.plans.LeftAnti,
            Some(EqualTo(srcKeyF, keyAttr)), JoinHint.NONE)
          val insRows = Project(
            rel.output.zip(values).map { case (a, v) =>
              Alias(remap(v), a.name)()
            },
            Filter(condT, notMatchedSrc))
          // materialize ONCE: the frame feeds both the insert-day
          // collect and the write job below — without this the
          // full-store matched-key semi-join and the anti-join would
          // run two complete passes (r20 review)
          graft.util.Checkpoints.tracked(bridge.ofRows(spark, insRows))
        }
      try {
        val insertRowsFinal = insertRowsCp.map(_.df)
        val insertDays: Seq[String] = insertRowsFinal match {
          case None => Nil
          case Some(df) => df.select(col(pcol).cast("string")).distinct()
            .collect().map(r => Option(r.getString(0)).getOrElse(
              throw new IllegalArgumentException(
                "dailystore MERGE: an INSERT row carries a null " +
                  s"'$pcol' value"))).toSeq
        }
        if (!hasRewrite) {
          // insert-if-absent: plain append commit, no day rewritten
          if (insertDays.nonEmpty)
            insertRowsFinal.get.write.format("dailystore")
              .option("path", path).option("partitionCol", pcol)
              .mode("append").save()
          return Seq.empty
        }
        val touched = (matchedDays ++ insertDays).distinct.sorted
        if (touched.isEmpty) return Seq.empty
        // REWRITE of the touched days (class doc step 3)
        val joined = Join(touchedBase(touched), srcPlan, LeftOuter,
          Some(EqualTo(keyAttr, srcKeyF)), JoinHint.NONE)
        val matchedExpr = IsNotNull(srcKeyF)
        val rewritten: LogicalPlan = (update, delete) match {
          case (Some((cond, assigns)), None) =>
            val condT = cond.map(c =>
              EqualNullSafe(remap(c), Literal.TrueLiteral))
              .getOrElse(Literal.TrueLiteral)
            val applies = And(matchedExpr, condT)
            val byId = assigns.map { case (k, v) => k.exprId -> remap(v) }.toMap
            Project(rel.output.map { a =>
              byId.get(a.exprId) match {
                case Some(v) => Alias(If(applies, v, a), a.name)()
                case None => a
              }
            }, joined)
          case (None, Some(cond)) =>
            val condT = cond.map(c =>
              EqualNullSafe(remap(c), Literal.TrueLiteral))
              .getOrElse(Literal.TrueLiteral)
            Project(rel.output,
              Filter(Not(And(matchedExpr, condT)), joined))
          case _ => throw new IllegalStateException(
            "unreachable: exactly one matched clause on the rewrite path")
        }
        val rewrittenDf = bridge.ofRows(spark, rewritten)
        val finalDf = insertRowsFinal match {
          case Some(ins) => rewrittenDf.unionByName(ins)
          case None => rewrittenDf
        }
        DailyStoreDml.writeReplacement(finalDf, path, pcol, touched)
        Seq.empty
      } finally insertRowsCp.foreach(_.release())
    } finally srcCp.release()
  }
}

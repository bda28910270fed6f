package graft.plans

import graft.catalog.GraftTable
import graft.tables.VersionedTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.PlanBridge

/** Planner strategy making `DELETE FROM graft.t WHERE ...`, `UPDATE
  * graft.t SET ... WHERE ...` and `MERGE INTO graft.t USING src ON ...
  * WHEN ...` NATIVE Spark SQL on versioned tables — row-level verbs
  * Spark's own grammar parses but only plans for connectors that claim
  * them (its BasicOperators otherwise refuses with "does not support
  * UPDATE TABLE"). All three land on the same commit protocol as the
  * Scala API — [[VersionedTable.commitDelete]]/[[VersionedTable.commitUpdate]]
  * (file-grain copy-on-write, arbitrary predicates — DELETE here is what
  * lets untranslatable conditions run where `SupportsDelete`'s v1-Filter
  * pushdown would refuse) and [[VersionedTable.commitMergeConditional]]
  * (clause-ordered Delta semantics, probe-pruned) — so the SQL verb and the
  * API call produce byte-identical table states.
  *
  * Translation altitude: the analyzer has already resolved every
  * expression against the DSv2 relation, but the commit protocol plans its
  * OWN scan (fresh attribute ids), so attribute references are rewritten
  * back to name form (`t.`/`s.`-qualified for MERGE, bare for UPDATE) and
  * re-resolve against the protocol's frames. Refused loudly, with the
  * Scala-API escape hatch named: nested-field SET targets, non-equi or
  * differently-named merge keys, and subqueries in conditions/assignments
  * — each a semantics this engine's merge contract does not (yet)
  * express, never a silent drop. WHEN NOT MATCHED BY SOURCE arms plan
  * natively, and `WITH SCHEMA EVOLUTION` widenings — staged (not
  * committed) by the catalog during analysis — fold into the merge's own
  * commit entry, atomic with the merge.
  */
case class GraftRowLevelStrategy(spark: SparkSession)
    extends org.apache.spark.sql.execution.SparkStrategy {

  /** The GraftTable behind a (possibly aliased) relation — by planning
    * time V2ScanRelationPushDown has usually rewritten the relation into a
    * DataSourceV2ScanRelation, so both shapes resolve. */
  private def graftOf(plan: LogicalPlan): Option[GraftTable] = plan match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      Some(r.table.asInstanceOf[GraftTable])
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if r.relation.table.isInstanceOf[GraftTable] =>
      Some(r.relation.table.asInstanceOf[GraftTable])
    case SubqueryAlias(_, child) => graftOf(child)
    case _ => None
  }

  /** Rewrite resolved attribute references back to bare names so they
    * re-resolve against the commit protocol's own scan. */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  /** Conditions and assignment values round-trip through Expression.sql
    * text and re-parse against the commit protocol's frames — a subquery
    * does not survive that trip (its plan is not text), so it must refuse
    * HERE with the escape hatch named, not as a confusing re-parse error
    * downstream. */
  private def requireNoSubquery(e: Expression, what: String): Expression = {
    require(!e.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
      s"graft $what: subqueries are not supported in conditions or assignment " +
        s"values (got `${e.sql}`) — materialize the subquery into the source " +
        "frame and use the Scala API (VersionedTable.commitMergeConditional / " +
        "commitUpdate)")
    e
  }

  /** NOT MATCHED BY SOURCE arms have no source row: every reference must
    * be a target attribute (Delta's rule), checked on the RESOLVED
    * expression where it is exact — downstream the text would re-resolve
    * against a frame whose source columns are all null. */
  private def requireTargetOnly(e: Expression, tIds: Set[ExprId]): Unit =
    require(e.references.forall(a => tIds(a.exprId)),
      "graft MERGE: a WHEN NOT MATCHED BY SOURCE condition/assignment may " +
        s"reference only the target table (got `${e.sql}`) — there is no " +
        "source row for these target rows")

  /** Qualify target/source attributes as `t.x` / `s.x` and render SQL —
    * the form [[VersionedTable.commitMergeConditional]] evaluates clause
    * conditions and assignment values in. */
  private def mergeSql(e: Expression, tIds: Set[ExprId], sIds: Set[ExprId]): String =
    e.transform {
      case a: AttributeReference if tIds(a.exprId) => UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if sIds(a.exprId) => UnresolvedAttribute(Seq("s", a.name))
    }.sql

  /** The ON condition as same-named equi-join keys — the merge contract.
    * Anything else (range conditions, t.a = s.b) refuses loudly. The
    * analyzer wraps a differing-type key pair in implicit casts, so casts
    * are stripped before the attribute check (the engine's null-safe key
    * join re-derives its own comparison types). */
  private def mergeKeys(cond: Expression, tIds: Set[ExprId], sIds: Set[ExprId]): Seq[String] = {
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def bare(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => bare(c.child)
      case other => other
    }
    def keyPair(l: Expression, r: Expression): Option[String] = (bare(l), bare(r)) match {
      case (a: AttributeReference, b: AttributeReference)
          if lc(a.name) == lc(b.name) &&
            ((tIds(a.exprId) && sIds(b.exprId)) || (sIds(a.exprId) && tIds(b.exprId))) =>
        Some(a.name)
      case _ => None
    }
    cond match {
      case And(l, r) => mergeKeys(l, tIds, sIds) ++ mergeKeys(r, tIds, sIds)
      case EqualTo(l, r) if keyPair(l, r).isDefined =>
        Seq(keyPair(l, r).get)
      case other => sys.error(
        s"graft MERGE: the ON condition must be a conjunction of same-named " +
          s"target/source key equalities (got `${other.sql}`) — for other join " +
          "shapes use the Scala API (VersionedTable.commitMergeConditional) " +
          "with a pre-keyed source")
    }
  }

  private def setTarget(a: Assignment, what: String): String = a.key match {
    case k: AttributeReference => k.name
    case other => sys.error(
      s"graft $what: only whole-column assignment targets are supported, " +
        s"got `${other.sql}` — update the full struct column instead")
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // DELETE plans here for EVERY predicate shape, not just the v1-Filter-
    // translatable subset SupportsDelete.canDeleteWhere accepts: an
    // untranslatable condition (arithmetic, function calls, computed
    // expressions) routes onto the same commitDelete file-grain
    // copy-on-write, which takes arbitrary Column conditions — Delta's
    // scan-based DELETE fallback. canDeleteWhere stays honest for the
    // extension-less pushdown path.
    case org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable(rel, condition) =>
      graftOf(rel).map { table =>
        require(table.pinnedVersion.isEmpty,
          s"cannot DELETE from ${table.name()} at a pinned version (time travel is read-only)")
        val dir = table.dir
        val cond = PlanBridge.column(unresolve(requireNoSubquery(condition, "DELETE")))
        GraftRowLevelExec(s"DELETE FROM ${table.name()}",
          () => VersionedTable.commitDelete(spark, dir, cond)) :: Nil
      }.getOrElse(Nil)

    case UpdateTable(rel, assignments, condition) =>
      graftOf(rel).map { table =>
        require(table.pinnedVersion.isEmpty,
          s"cannot UPDATE ${table.name()} at a pinned version (time travel is read-only)")
        val dir = table.dir
        val set = assignments.map(a =>
          setTarget(a, "UPDATE") ->
            PlanBridge.column(unresolve(requireNoSubquery(a.value, "UPDATE")))).toMap
        val cond = condition.map(c =>
            PlanBridge.column(unresolve(requireNoSubquery(c, "UPDATE"))))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        GraftRowLevelExec(s"UPDATE ${table.name()}",
          () => VersionedTable.commitUpdate(spark, dir, cond, set)) :: Nil
      }.getOrElse(Nil)

    case m: MergeIntoTable =>
      graftOf(m.targetTable).map { table =>
        require(table.pinnedVersion.isEmpty,
          s"cannot MERGE into ${table.name()} at a pinned version (time travel is read-only)")
        // WITH SCHEMA EVOLUTION: the analyzer (ResolveMergeIntoSchema-
        // Evolution, gated on the table's AUTOMATIC_SCHEMA_EVOLUTION
        // capability) asked the catalog to add the source-only columns and
        // reloaded the relation — but GraftCatalog STAGED the alters
        // instead of committing (carried here as table.pendingEvolution),
        // so the arms below resolve against the widened schema while
        // nothing has committed yet. commitMergeConditional folds the
        // widening into the merge's OWN commit entry: a merge that fails
        // anywhere (ambiguous keys, OCC exhaustion, a crash) leaves the
        // schema byte-identical — Delta's one-transaction semantics.
        val dir  = table.dir
        val tIds = m.targetTable.output.map(_.exprId).toSet
        val sIds = m.sourceTable.output.map(_.exprId).toSet
        val keys = mergeKeys(m.mergeCondition, tIds, sIds).distinct
        def sql(e: Expression) = mergeSql(requireNoSubquery(e, "MERGE"), tIds, sIds)
        val clauses: Seq[VersionedTable.MergeClause] =
          (m.matchedActions ++ m.notMatchedActions).map {
            case UpdateStarAction(cond) =>
              VersionedTable.WhenMatchedUpdate(cond.map(sql), Map.empty)
            case UpdateAction(cond, _, fromStar) if fromStar =>
              // the analyzer may pre-align UPDATE SET * into per-column
              // assignments; the engine's own star form is equivalent
              VersionedTable.WhenMatchedUpdate(cond.map(sql), Map.empty)
            case UpdateAction(cond, assigns, _) =>
              VersionedTable.WhenMatchedUpdate(cond.map(sql),
                assigns.map(a => setTarget(a, "MERGE UPDATE") -> sql(a.value)).toMap)
            case DeleteAction(cond) =>
              VersionedTable.WhenMatchedDelete(cond.map(sql))
            case InsertStarAction(cond) =>
              VersionedTable.WhenNotMatchedInsert(cond.map(sql), None)
            case InsertAction(cond, assigns) =>
              VersionedTable.WhenNotMatchedInsert(cond.map(sql),
                Some(assigns.map(a => setTarget(a, "MERGE INSERT") -> sql(a.value)).toMap))
            case other => sys.error(s"graft MERGE: unsupported action $other")
          } ++
          m.notMatchedBySourceActions.map {
            case UpdateAction(cond, assigns, _) =>
              // no SET * here: the analyzer can't star-expand an arm with no
              // source side, so assignments are always explicit
              (cond.toSeq ++ assigns.map(_.value)).foreach(requireTargetOnly(_, tIds))
              VersionedTable.WhenNotMatchedBySourceUpdate(cond.map(sql),
                assigns.map(a =>
                  setTarget(a, "MERGE NOT MATCHED BY SOURCE UPDATE") -> sql(a.value)).toMap)
            case DeleteAction(cond) =>
              cond.foreach(requireTargetOnly(_, tIds))
              VersionedTable.WhenNotMatchedBySourceDelete(cond.map(sql))
            case other => sys.error(
              s"graft MERGE: unsupported NOT MATCHED BY SOURCE action $other")
          }
        val source = PlanBridge.ofRows(spark, m.sourceTable)
        GraftRowLevelExec(s"MERGE INTO ${table.name()}",
          () => VersionedTable.commitMergeConditional(spark, dir, source, keys, clauses,
            pendingAlters = table.pendingEvolution)) :: Nil
      }.getOrElse(Nil)

    case c: GraftVerbCommand =>
      GraftVerbExec(spark, c) :: Nil

    case _ => Nil
  }
}

/** Executes a parsed maintenance verb ([[GraftVerbCommand]]) through
  * TableSql's grammar and surfaces its result rows (the one-row verb
  * receipt, or VACUUM DRY RUN's deletion plan). */
case class GraftVerbExec(spark: SparkSession, cmd: GraftVerbCommand)
    extends LeafExecNode {
  override def output: Seq[Attribute] = cmd.output
  @transient private lazy val rows: Array[InternalRow] = {
    val df = graft.tables.TableSql.execute(spark, Map(cmd.name -> cmd.dir), cmd.text)
    require(df.schema.length == cmd.output.length &&
        df.schema.fields.zip(cmd.output).forall { case (f, a) => f.dataType == a.dataType },
      s"graft ${cmd.verb}: result shape ${df.schema.simpleString} does not match " +
        s"the declared output ${cmd.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(",")}")
    df.queryExecution.executedPlan.executeCollect()
  }
  override def executeCollect(): Array[InternalRow] = rows
  override protected def doExecute(): RDD[InternalRow] = {
    val r = rows
    sparkContext.parallelize(r.toIndexedSeq, 1)
  }
  override def simpleString(maxFields: Int): String =
    s"GraftVerbExec(${cmd.verb} ${cmd.name})"
}

/** Side-effecting leaf: runs the commit exactly once (whichever of
  * executeCollect / doExecute the command-execution path drives first)
  * and returns no rows — the v2-command exec shape for a protocol whose
  * write is a driver-coordinated commit, not a per-partition writer. */
case class GraftRowLevelExec(label: String, run: () => Long) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  @transient private lazy val done: Long = run()
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
  override def simpleString(maxFields: Int): String = s"GraftRowLevelExec($label)"
}

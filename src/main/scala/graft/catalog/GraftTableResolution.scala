package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analysis rule substituting every READ of a [[GraftTable]] with the
  * table's full V1 plan ([[graft.tables.VersionedTable.read]]) — the Delta
  * architecture: DSv2 owns NAME RESOLUTION (catalog lookup, `VERSION AS
  * OF`, the format("graft") provider), while execution runs the same
  * parquet scan a hand-built read would, keeping predicate pushdown, column
  * pruning, partition coalescing, and whole-stage codegen intact. Without
  * this rule the scan would fall back to [[GraftTable]]'s row-at-a-time
  * V1Scan (correct, unoptimized).
  *
  * The substituted plan's attributes get fresh exprIds, so a Project of
  * aliases PINNED to the relation's original exprIds bridges them — parent
  * operators keep resolving against the ids they bound at analysis.
  *
  * WRITE positions are untouched by construction: `V2WriteCommand.table`
  * is not a child of the command node, so `resolveOperatorsUp` never visits
  * the target relation of an INSERT — only genuine read positions rewrite.
  */
case class GraftTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // ROW-LEVEL command targets stay v2: DeleteFromTable's (and Update/
    // Merge's) table IS a traversed child, and substituting it would hand
    // the physical planner a parquet relation where it expects the v2
    // table (DELETE routes through SupportsDelete on GraftTable instead).
    // Identity-keyed: plan equality is structural and two references to
    // the same table must not shadow each other.
    val keep = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
        d.table.foreach(keep.add)
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        u.table.foreach(keep.add)
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        m.targetTable.foreach(keep.add)
      // ADD CONSTRAINT validates existing rows through a Filter over the
      // relation; the whole subtree must stay v2 — substituting it would
      // plant a catalogTable-bearing LogicalRelation that ResolveSession-
      // Catalog mistakes for a V1 session table and refuses the statement
      case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
        a.foreach(keep.add)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      // hidden-day-partitioned tables: substitute the partitioned-parquet
      // scan (p_day visible to Catalyst so DayPartitionPruning + directory
      // pruning apply) projected back to the declared schema
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftDayTable] && !keep.contains(r) =>
        val table = r.table.asInstanceOf[GraftDayTable]
        val v1 = table.readDataFrame(spark).queryExecution.analyzed
        val byName = v1.output
          .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
        val aligned: Seq[NamedExpression] = r.output.map { o =>
          val src = byName.getOrElse(o.name.toLowerCase(java.util.Locale.ROOT),
            sys.error(s"graft: column `${o.name}` of ${table.name()} is missing " +
              "from the table's current read schema"))
          Alias(src, o.name)(exprId = o.exprId)
        }
        Project(aligned, v1)

      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !keep.contains(r) =>
        val table = r.table.asInstanceOf[GraftTable]
        // `.option("readChangeFeed", true).table("graft.t")` cannot work at
        // this altitude: the relation's output was pinned to the TABLE
        // schema when the catalog loaded it (loadTable never sees reader
        // options), so substituting the feed here would silently DROP the
        // _change_type/_commit_* columns. Refuse with the working spelling
        // instead of mis-serving a narrower feed.
        require(!Option(r.options.get("readChangeFeed")).exists(_.toBoolean) ||
            table.isInstanceOf[GraftCdfTable],
          "graft: batch readChangeFeed is not available through .table() — " +
            s"use spark.read.format(\"graft\").option(\"readChangeFeed\", true)" +
            s".load(\"${table.dir}\") (the catalog pins the table schema " +
            "before reader options are visible)")
        val v1raw = table.readDataFrame(spark).queryExecution.analyzed
        // Carry the table's identity onto the substituted parquet leaves:
        // `Catalog.refreshTable` (which the streaming sink calls on its
        // target after EVERY batch) walks the resolved plan and reads
        // `LogicalRelation.catalogTable.get` unconditionally — a bare None
        // crashes any refresh of a catalog-resolved graft table. The
        // attached CatalogTable is metadata only (stats None, so plan
        // sizing still comes from the files); live tables only — a pinned
        // time-travel read is never a refresh target.
        val v1 =
          if (table.pinnedVersion.isDefined) v1raw
          else {
            // ONE construction site for the table's CatalogTable identity
            // (V1FallbackShim.fallbackCatalogTable — also the streaming
            // fallback's), so batch and streaming metadata cannot drift
            val meta = table.fallbackCatalogTable
            v1raw.transform {
              case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
                  if lr.catalogTable.isEmpty => lr.copy(catalogTable = Some(meta))
            }
          }
        val byName = v1.output
          .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
        val aligned: Seq[NamedExpression] = r.output.map { o =>
          val src = byName.getOrElse(o.name.toLowerCase(java.util.Locale.ROOT),
            sys.error(s"graft: column `${o.name}` of ${table.name()} is missing " +
              "from the table's current read schema (concurrent schema change?)"))
          Alias(src, o.name)(exprId = o.exprId)
        }
        Project(aligned, v1)
    }
  }
}

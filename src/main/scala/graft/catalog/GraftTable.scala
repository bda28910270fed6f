package graft.catalog

import java.util

import graft.tables.VersionedTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 [[Table]] over a [[VersionedTable]] directory — the unit the
  * catalog ([[GraftCatalog]]) and the `format("graft")` provider
  * ([[GraftDataSource]]) hand to Spark's analyzer. `version = Some(v)` pins
  * a time-travel read (`VERSION AS OF` / `TIMESTAMP AS OF`, resolved to a
  * version number before construction).
  *
  * READ path: the table itself only DESCRIBES the data (name, schema,
  * capabilities). The actual scan is substituted at analysis time by
  * [[graft.plans.GraftExtensions]]' resolution rule, which replaces the
  * `DataSourceV2Relation` with [[VersionedTable.read]]'s full V1 plan — a
  * plain parquet scan (plus DV mask / column-mapping aliases when present),
  * so predicate pushdown, column pruning, and whole-stage codegen apply
  * exactly as for a hand-built read. This is Delta Lake's own architecture
  * (DSv2 for resolution, V1 plan for execution) re-expressed here. The
  * [[newScanBuilder]] below is the EXTENSION-LESS fallback — a [[V1Scan]]
  * row scan that is correct but unoptimized (no pushdown), used only when
  * the session lacks the graft extensions.
  *
  * WRITE path: a [[V1Write]] onto the commit protocol — `INSERT INTO`
  * appends ([[VersionedTable.commitAppend]], lock-free O(batch) staging),
  * `INSERT OVERWRITE` snapshots ([[VersionedTable.commit]]).
  *
  * Ref: `00. Explore.py:66,75` reads metastore tables via `spark.table` —
  * this class is what makes that ergonomics native here.
  */
class GraftTable(val tableName: String, val dir: String,
    val pinnedVersion: Option[Long], declaredSchema: Option[StructType] = None)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName

  // one resolution per Table instance (instances are per-loadTable), via
  // VersionedTable.schemaOf — declared schema or one driver footer, WITHOUT
  // building a scan plan (the resolution rule builds the real plan exactly
  // once). A directory with no committed version yet (a streaming sink's
  // first batch, a CREATE before the first INSERT) has no schema to resolve
  // — empty here, so capability checks can fall through to the V1 write
  // path; a batch READ of such a table still fails loudly at analysis
  // (readDataFrame refuses).
  private lazy val resolvedSchema: StructType =
    declaredSchema
      .orElse(if (VersionedTable.latestVersion(dir).isEmpty) Some(new StructType()) else None)
      .getOrElse(VersionedTable.schemaOf(SparkSession.active, dir, pinnedVersion))

  override def schema(): StructType = resolvedSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** The full-fidelity V1 read plan the resolution rule substitutes. */
  def readDataFrame(spark: SparkSession): DataFrame =
    VersionedTable.read(spark, dir, pinnedVersion)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = resolvedSchema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = resolvedSchema
            override def buildScan(): RDD[Row] =
              readDataFrame(context.sparkSession).rdd
          }.asInstanceOf[T]
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // INSERT OVERWRITE arrives as OverwriteByExpression(true-literal);
      // V2Writes reduces it to truncate() on the builder
      private var overwriteAll = false
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              require(pinnedVersion.isEmpty,
                s"cannot write to $tableName at a pinned version (time travel is read-only)")
              val spark = data.sparkSession
              if (overwrite || overwriteAll) VersionedTable.commit(spark, data, dir)
              else VersionedTable.commitAppend(spark, data, dir)
            }
          }
      }
    }

  override def toString: String =
    s"GraftTable($tableName, $dir${pinnedVersion.fold("")(v => s", v$v")})"
}

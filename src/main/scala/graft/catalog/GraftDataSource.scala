package graft.catalog

import java.util

import graft.tables.VersionedTable
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft")` — the batch DataFrame entry to versioned
  * tables (Delta's `format("delta")` ergonomics):
  *
  * {{{
  *   spark.read.format("graft").load(dir)                              // latest
  *   spark.read.format("graft").option("versionAsOf", 3).load(dir)     // time travel
  *   spark.read.format("graft").option("timestampAsOf",
  *     "2026-01-01 00:00:00").load(dir)
  *   df.write.format("graft").mode("append"|"overwrite").save(dir)
  * }}}
  *
  * Produces a [[GraftTable]]; the read plan is substituted by the
  * resolution rule (see [[GraftTable]]'s Scaladoc for the architecture).
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider {

  override def shortName(): String = "graft"

  /** V1 write fallback for `df.write.format("graft").save(dir)` — the
    * DataFrameWriter routes TableProvider-only sources through the V1
    * command for some modes; both paths land on the same commit protocol. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val dir = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("path") => v }.getOrElse(
      sys.error("graft source: a path is required — .save(<table dir>)"))
    val spark = data.sparkSession
    val exists = VersionedTable.latestVersion(dir).isDefined
    mode match {
      case SaveMode.Append                   => VersionedTable.commitAppend(spark, data, dir)
      case SaveMode.Overwrite                => VersionedTable.commit(spark, data, dir)
      case SaveMode.ErrorIfExists if exists  =>
        sys.error(s"graft source: table $dir already exists (mode=ErrorIfExists)")
      case SaveMode.Ignore if exists         => ()
      case _                                 => VersionedTable.commit(spark, data, dir)
    }
    val ctx = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }

  private def makeTable(options: CaseInsensitiveStringMap): GraftTable = {
    val dir = Option(options.get("path")).getOrElse(
      sys.error("graft source: a path is required — .load(<table dir>)"))
    val version = Option(options.get("versionAsOf")).map(_.toLong)
      .orElse(Option(options.get("timestampAsOf")).map(ts =>
        VersionedTable.versionAsOf(dir,
          java.sql.Timestamp.valueOf(ts).getTime)))
    new GraftTable(new org.apache.hadoop.fs.Path(dir).getName, dir, version)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    makeTable(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    makeTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

package graft.catalog

import java.util

import graft.tables.VersionedTable
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `format("graft")` — the single format string for versioned tables,
  * batch AND streaming (Delta's `format("delta")` ergonomics):
  *
  * {{{
  *   spark.read.format("graft").load(dir)                              // latest
  *   spark.read.format("graft").option("versionAsOf", 3).load(dir)     // time travel
  *   spark.read.format("graft").option("timestampAsOf",
  *     "2026-01-01 00:00:00").load(dir)
  *   df.write.format("graft").mode("append"|"overwrite").save(dir)
  *   spark.readStream.format("graft").load(dir)                        // tail commits
  *   spark.readStream.format("graft").option("readChangeFeed", "true").load(dir)
  *   df.writeStream.format("graft").option("checkpointLocation", cp).start(dir)
  * }}}
  *
  * Batch reads produce a [[GraftTable]] whose plan is substituted by the
  * resolution rule (see [[GraftTable]]'s Scaladoc for the architecture);
  * streaming delegates to [[graft.sources.VersionedStream]]'s source/sink
  * (the DataStreamReader falls back to the DSv1 provider when the table
  * lacks streaming capabilities — exactly the path Delta's own dual
  * provider rides).
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider {

  private val stream = new graft.sources.VersionedStream

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    stream.sourceSchema(sqlContext, schema, providerName, parameters)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    stream.createSource(sqlContext, metadataPath, schema, providerName, parameters)

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink =
    stream.createSink(sqlContext, parameters, partitionColumns, outputMode)

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
    val name = new org.apache.hadoop.fs.Path(dir).getName
    if (Option(options.get("readChangeFeed")).exists(_.toBoolean)) {
      // BATCH change-data-feed (Delta's batch readChangeFeed option)
      require(options.get("versionAsOf") == null && options.get("timestampAsOf") == null,
        "graft source: readChangeFeed and versionAsOf/timestampAsOf are " +
          "mutually exclusive (the feed IS a version span)")
      // span bounds by version OR timestamp (Delta option parity):
      // startingTimestamp resolves to the first commit AT or AFTER it,
      // endingTimestamp to the last commit AT or BEFORE it — then the
      // span machinery is identical to the version-numbered options'
      val startV  = Option(options.get("startingVersion")).map(_.toLong)
      val startTs = Option(options.get("startingTimestamp"))
      require(startV.isEmpty || startTs.isEmpty,
        "graft source: startingVersion and startingTimestamp are mutually exclusive")
      val endV  = Option(options.get("endingVersion")).map(_.toLong)
      val endTs = Option(options.get("endingTimestamp"))
      require(endV.isEmpty || endTs.isEmpty,
        "graft source: endingVersion and endingTimestamp are mutually exclusive")
      val starting = startV.orElse(startTs.map { ts =>
        VersionedTable.versionAtOrAfter(dir, java.sql.Timestamp.valueOf(ts).getTime)
          .getOrElse(sys.error(
            s"graft source: startingTimestamp '$ts' is after the latest " +
              s"commit of $dir — the feed span is empty"))
      }).getOrElse(0L)
      val ending = endV.orElse(endTs.map(ts =>
        VersionedTable.versionAsOf(dir, java.sql.Timestamp.valueOf(ts).getTime)))
      new GraftCdfTable(name, dir,
        Option(options.get("keyColumns"))
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .filter(_.nonEmpty), // blank option = undeclared, not "no keys"
        starting, ending)
    } else {
      val version = Option(options.get("versionAsOf")).map(_.toLong)
        .orElse(Option(options.get("timestampAsOf")).map(ts =>
          VersionedTable.versionAsOf(dir,
            java.sql.Timestamp.valueOf(ts).getTime)))
      new GraftTable(name, dir, version)
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    makeTable(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    makeTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
import org.apache.spark.sql.types.StructType

/** The `private[sql]` bridge for STREAMING through a DSv2 catalog table:
  * `V2TableWithV1Fallback` is how a v2 table whose streaming engine is a
  * DSv1 `Source`/`Sink` pair plugs into `spark.readStream.table(...)` and
  * `df.writeStream.toTable(...)` — relation resolution consults it only on
  * streaming paths (gated on `isStreaming`), and `DataStreamWriter` checks
  * it right after `STREAMING_WRITE`. Delta Lake's `DeltaTableV2` implements
  * the same trait from inside the `org.apache.spark.sql` namespace; this
  * shim is the minimal equivalent — it materializes the `CatalogTable` the
  * fallback contract wants from three plain values, and everything else in
  * the engine stays in the `graft` namespace against public APIs.
  */
trait V1FallbackShim extends V2TableWithV1Fallback {

  /** Display name of the table. */
  protected def fallbackName: String
  /** Table directory (becomes the location + `path` option). */
  protected def fallbackDir: String
  /** Resolved table schema (rides to the source as the declared schema). */
  protected def fallbackSchema: StructType
  /** Provider short name whose DSv1 source/sink serve the stream. */
  protected def fallbackProvider: String
  /** Catalog the table was loaded from, if any. The identifier must be
    * catalog-qualified when one exists: after each sink batch the engine
    * refreshes the target through `spark.catalog.refreshTable(identifier)`,
    * and an unqualified name would (fail to) resolve in the SESSION
    * catalog instead of the one that owns the table. */
  protected def fallbackCatalog: Option[String] = None
  /** Hook for refusing the fallback (e.g. a pinned time-travel version). */
  protected def fallbackCheck(): Unit = ()

  /** The table's CatalogTable identity WITHOUT the refusal hook — the ONE
    * construction site, shared by the streaming fallback below and by the
    * resolution rule's refresh metadata (Catalog.refreshTable reads
    * LogicalRelation.catalogTable.get unconditionally). */
  def fallbackCatalogTable: CatalogTable =
    CatalogTable(
      // UnresolvedCatalogRelation asserts a fully qualified identifier; the
      // READ side then resolves on provider + path, while the SINK side's
      // post-batch refreshTable resolves this name — hence the catalog part
      identifier = TableIdentifier(fallbackName, Some("default"), fallbackCatalog),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(fallbackDir).toUri),
        properties = Map("path" -> fallbackDir)),
      schema = fallbackSchema,
      provider = Some(fallbackProvider))

  override def v1Table: CatalogTable = {
    fallbackCheck()
    fallbackCatalogTable
  }
}

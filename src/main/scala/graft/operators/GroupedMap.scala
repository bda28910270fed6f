package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** A5 grouped-map transform: run an arbitrary function over each group's
  * rows, emitting zero or more output rows per group — the Scala-native
  * equivalent of the reference's
  * `groupBy('label').applyInPandas(fn, schema)` (`01. Ingest.py:102-126`),
  * with the Python-worker Arrow round-trip removed: the function is a JVM
  * lambda inside the task thread.
  *
  * Contract (identical to the reference's pandas grouped-map): one group
  * must fit in executor memory. For group functions that are expressible
  * relationally (rank, normalize, min-rebase, …) prefer window functions —
  * they stream and never materialize the group. This operator is for the
  * genuinely imperative per-group cases (e.g. the grayscale batch kernel).
  */
object GroupedMap {

  /** Group `df` by a string key column and flat-map each group through `fn`.
    * `fn` receives (key, iterator of rows) and returns an iterator of rows
    * matching `outSchema`. */
  def flatMapGroupsRows(df: DataFrame, keyCol: String, outSchema: StructType)(
      fn: (String, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.groupByKey(r => r.getString(keyIdx))(Encoders.STRING)
      .flatMapGroups(fn)(Encoders.row(outSchema))
  }
}

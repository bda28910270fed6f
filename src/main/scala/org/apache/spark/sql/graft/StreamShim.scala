package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` bridge a DSv1 streaming `Source` needs.
  *
  * `MicroBatchExecution` asserts that the DataFrame a V1
  * `Source.getBatch` returns carries `isStreaming = true` on its leaf
  * relation — but every public way to read parquet produces a BATCH
  * `LogicalRelation`. Connectors that implement the V1 source contract
  * (Delta Lake's `DeltaSource` is the canonical example) solve this by
  * living inside the `org.apache.spark.sql` namespace so they can build
  * the streaming-flagged plan directly; this object is the minimal such
  * shim — two constructors, nothing else, everything else in the engine
  * stays in the `graft` namespace against public APIs.
  */
object StreamShim {

  /** Local-property key under which the micro-batch thread carries the
    * running query's STABLE id (persisted in the checkpoint metadata, so
    * it survives restarts) — the sink's replay-marker identity when no
    * explicit checkpointLocation option reached it. */
  val QueryIdKey: String =
    org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY

  /** Re-flag a batch relation plan as streaming (the FileStreamSource
    * recipe: same files, same schema, streaming leaf). */
  def asStreaming(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
    }
    Dataset.ofRows(df.sparkSession.asInstanceOf[ClassicSession], plan)
  }

  /** Like [[asStreaming]] but for a COMPOSITE batch plan (e.g. a
    * deletion-vector-masked scan — data scan anti-joined to its DV
    * sidecars): re-flagging every leaf would turn the mask join into a
    * stream-stream join, so instead the whole planned RDD is pinned under
    * one streaming-flagged `LogicalRDD`. Nothing executes here — the RDD
    * DAG is built lazily, the sink drives it. */
  def asStreamingPinned(df: DataFrame): DataFrame = {
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      df.queryExecution.toRdd, df.asInstanceOf[Dataset[_]], isStreaming = true)
    Dataset.ofRows(df.sparkSession.asInstanceOf[ClassicSession], node)
  }

  /** Pin a sink-side micro-batch DataFrame to its already-planned rows and
    * strip the streaming flag, so batch writers (`df.write`, a versioned
    * commit) accept it — exactly `ForeachBatchSink`'s device: the batch's
    * physical RDD wrapped in a fresh `LogicalRDD`. Without this, the
    * DataFrame handed to `Sink.addBatch` re-analyzes as a streaming plan
    * and every batch-only operation on it throws. */
  def asBatch(df: DataFrame): DataFrame = {
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      df.queryExecution.toRdd, df.asInstanceOf[Dataset[_]], isStreaming = false)
    Dataset.ofRows(df.sparkSession.asInstanceOf[ClassicSession], node)
  }

  /** An empty streaming-flagged relation of `schema` — the "no files in
    * this batch" result. */
  def emptyStreaming(spark: org.apache.spark.sql.SparkSession, schema: StructType): DataFrame = {
    val attrs = schema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())
    Dataset.ofRows(spark.asInstanceOf[ClassicSession],
      LocalRelation(attrs, Nil, isStreaming = true))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming re-expression of the reference's streaming inference
  * (`03. Inference.py:73-115`): a rate-limited file stream over a Parquet
  * table, a stateless scoring transform, and an append sink with a
  * checkpoint for exactly-once.
  *
  * The reference streams from a Delta table with `maxFilesPerTrigger=1`
  * (`03. Inference.py:73-77`) and appends to a Delta sink with a checkpoint
  * (`:102-108`); with no Delta jar here the equivalents are the Parquet file
  * source/sink — same micro-batch planner, same offset-log/commit-log
  * exactly-once contract.
  *
  * At scale the stateless transform shards per file-split; rate limiting via
  * `maxFilesPerTrigger` is the back-pressure dial, and the checkpoint dir is
  * the restart token — identical semantics on a 1000-executor cluster.
  */
object StreamingInference {

  /** S6: rate-limited streaming source over a Parquet directory. */
  def readFileStream(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)

  /** S9: append sink + checkpoint, run to completion over the currently
    * available input (Trigger.AvailableNow honors the per-trigger rate
    * limit, so the input is consumed in `maxFilesPerTrigger`-sized
    * micro-batches exactly as the reference's always-on stream would).
    * Returns the sink as a batch DataFrame. */
  def runToCompletion(
      transformed: DataFrame,
      sinkDir: String,
      checkpointDir: String): DataFrame = {
    val q = transformed.writeStream
      .format("parquet")
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .option("path", sinkDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    transformed.sparkSession.read.parquet(sinkDir)
  }

  /** Full stream pipeline: source → stateless transform → sink; returns the
    * final sink contents. `transform` must be stateless (the reference's
    * scoring UDF + projections, `03. Inference.py:86-91`). */
  def streamTransform(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      sinkDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    runToCompletion(
      transform(readFileStream(spark, srcDir, schema, maxFilesPerTrigger)),
      sinkDir, checkpointDir)
}

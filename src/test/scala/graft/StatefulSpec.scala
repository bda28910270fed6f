package graft

import graft.streaming.Stateful
import graft.streaming.Stateful.SessionEvent
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StatefulSpec extends SparkSpec {

  test("windowedCounts matches a manual epoch-bucket aggregation (batch)") {
    val ev  = Tables.load(spark, sfDir, "events")
    val out = Stateful.windowedCounts(ev, windowDur = "1 hour")
      .select(unix_timestamp(col("window_start")).as("s"), col("event_type"), col("n"))
      .orderBy("s", "event_type").collect()
    val manual = ev
      .groupBy(expr("(ts div 3600000000000) * 3600").as("s"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("s", "event_type").collect()
    assert(out.length == manual.length)
    out.zip(manual).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getString(1) == b.getString(1) && a.getLong(2) == b.getLong(2))
    }
  }

  test("streamIntervalJoin: stream-stream join equals the batch join") {
    val work = Files.createTempDirectory("graft_ssjoin").toString
    val src  = s"$work/src"
    Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "event_type")
      .repartition(2).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    def clicks(df: org.apache.spark.sql.DataFrame) = df.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        timestamp_seconds(expr("ts div 1000000000")).as("c_time"))
    def buys(df: org.apache.spark.sql.DataFrame) = df.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        timestamp_seconds(expr("ts div 1000000000")).as("p_time"))

    val batchDf = spark.read.parquet(src)
    val batch = Stateful.streamIntervalJoin(clicks(batchDf), buys(batchDf),
        "c_user", "p_user", "c_time", "p_time", gap = "30 minutes")
      .select("c_id", "p_id").orderBy("c_id", "p_id").collect()
    assert(batch.nonEmpty, "fixture should produce at least one click⋈purchase match")

    val q = Stateful.streamIntervalJoin(
        clicks(spark.readStream.schema(schema).parquet(src)),
        buys(spark.readStream.schema(schema).parquet(src)),
        "c_user", "p_user", "c_time", "p_time", gap = "30 minutes")
      .select("c_id", "p_id")
      .writeStream.format("parquet").outputMode("append")
      .option("checkpointLocation", s"$work/ckpt").option("path", s"$work/sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$work/sink").orderBy("c_id", "p_id").collect()
    assert(streamed.length == batch.length)
    assert(batch.sameElements(streamed))
  }

  test("windowedCounts works without a value column and rejects a missing one") {
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "ts", "event_type")
    val out = Stateful.windowedCounts(ev, valueCol = None)
    assert(out.columns.toSeq == Seq("window_start", "event_type", "n"))
    assert(out.count() > 0)
    val err = intercept[IllegalArgumentException] {
      Stateful.windowedCounts(ev) // default valueCol "value" absent
    }
    assert(err.getMessage.contains("value"))
  }

  test("windowedCounts on a file stream equals the batch result (watermarked)") {
    val work   = Files.createTempDirectory("graft_stateful").toString
    val srcDir = s"$work/src"
    Tables.load(spark, sfDir, "events").select("event_id", "ts", "event_type", "value")
      .repartition(3).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    val batch = Stateful.windowedCounts(spark.read.parquet(srcDir))
      .orderBy("window_start", "event_type").collect()

    // All files in one micro-batch: with per-file batches the watermark
    // would close windows after batch 1 and correctly DROP later files'
    // events as late data (files are round-robin partitioned, so every
    // window spans all files). Single-batch ingestion has no late data.
    val stream = Stateful.windowedCounts(
      spark.readStream.schema(schema).parquet(srcDir))
    val q = stream.writeStream.format("parquet")
      .outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$work/sink")
      .orderBy("window_start", "event_type").collect()

    // Append mode only emits windows the watermark has closed; every emitted
    // window must match batch, and all but the trailing open window(s) emit.
    assert(streamed.nonEmpty)
    val batchMap = batch.map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    streamed.foreach { r =>
      val k = (r.get(0), r.getString(1))
      assert(batchMap.contains(k))
      assert(batchMap(k) == ((r.getLong(2), r.getDouble(3))))
    }
    assert(streamed.length >= batch.length - 10, "only trailing open windows may be withheld")
  }

  test("streaming dedup drops cross-batch duplicate keys within the watermark") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_dedup_stream").toString
    // same event_id appears in both files (duplicate delivery across batches)
    Seq((1L, "2024-01-01 00:00:01"), (2L, "2024-01-01 00:00:02"))
      .toDF("event_id", "t").withColumn("event_time", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(s"$work/src/f1")
    Seq((2L, "2024-01-01 00:00:03"), (3L, "2024-01-01 00:00:04"))
      .toDF("event_id", "t").withColumn("event_time", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(s"$work/src/f2")

    val schema = spark.read.parquet(s"$work/src/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/src/*")
    val q = Stateful.dedupWithinWatermark(stream, Seq("event_id"), "event_time", "1 hour")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ids = spark.read.parquet(s"$work/sink").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    // batch mode path
    val batchIds = Stateful.dedupWithinWatermark(
      spark.read.parquet(s"$work/src/*"), Seq("event_id"), "event_time")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(batchIds.toSeq == Seq(1L, 2L, 3L))
  }

  test("sessionize splits on gaps and preserves event counts") {
    import spark.implicits._
    val h = 3600L * 1000000000L // one hour in nanos
    val events = Seq(
      SessionEvent(1L, 0L, "a"), SessionEvent(1L, h / 2, "b"),      // session 1
      SessionEvent(1L, 3 * h, "c"),                                 // session 2 (gap 2.5h)
      SessionEvent(2L, h, "x")).toDS()                              // session for user 2
    val out = Stateful.sessionize(events, gapNanos = h).collect().sortBy(s => (s.user_id, s.start_ns))
    assert(out.length == 3)
    assert(out(0) == Stateful.Session(1L, 0L, h / 2, 2L))
    assert(out(1) == Stateful.Session(1L, 3 * h, 3 * h, 1L))
    assert(out(2) == Stateful.Session(2L, h, h, 1L))
  }

  test("streaming sessionize carries the open session across micro-batches") {
    import spark.implicits._
    val h    = 3600L * 1000000000L
    val work = Files.createTempDirectory("graft_sess_stream").toString
    // one file per micro-batch: session spans files 1+2; file 3's event
    // (far in the future) closes it; its own session stays open (unemitted)
    Seq(Stateful.SessionEvent(1L, 0L, "a"), Stateful.SessionEvent(1L, h / 4, "b"))
      .toDS().coalesce(1).write.parquet(s"$work/src/f1")
    Seq(Stateful.SessionEvent(1L, h / 2, "c"))
      .toDS().coalesce(1).write.parquet(s"$work/src/f2")
    Seq(Stateful.SessionEvent(1L, 100L * h, "d"))
      .toDS().coalesce(1).write.parquet(s"$work/src/f3")

    val schema = spark.read.parquet(s"$work/src/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$work/src/*")
      .as[Stateful.SessionEvent]
    val q = Stateful.sessionize(stream, gapNanos = h)
      .writeStream.format("parquet")
      .outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val emitted = spark.read.parquet(s"$work/sink").as[Stateful.Session].collect()
    // exactly one complete session, not split/double-emitted per batch
    assert(emitted.toSeq == Seq(Stateful.Session(1L, 0L, h / 2, 3L)))
  }

  test("sessionizeStream flushes an idle user's session via event-time timeout") {
    import spark.implicits._
    val h    = 3600L * 1000000000L
    val base = 1704067200L * 1000000000L // 2024-01-01 in epoch nanos
    val work = Files.createTempDirectory("graft_sess_timeout").toString
    // file 1: user 1's whole activity; file 2: user 2 ten hours later —
    // its event advances the watermark far past user 1's gap horizon, so
    // user 1's session must flush WITHOUT any further user-1 event.
    Seq((1L, base, "a"), (1L, base + h / 2, "b"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.parquet(s"$work/src/f1")
    Seq((2L, base + 10L * h, "x"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.parquet(s"$work/src/f2")

    val schema = spark.read.parquet(s"$work/src/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/src/*")
    val q = Stateful.sessionizeStream(stream, gapNanos = h, watermarkDur = "1 minute")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val emitted = spark.read.parquet(s"$work/sink").as[Stateful.Session]
      .collect().sortBy(_.user_id)
    assert(emitted.map(_.user_id).toSeq == Seq(1L),
      s"only user 1's idle session should flush, got ${emitted.toSeq}")
    assert(emitted.head == Stateful.Session(1L, base, base + h / 2, 2L))
  }

  test("sessionize on fixture events: totals preserved, sessions ordered") {
    val ev  = Tables.load(spark, sfDir, "events")
    val out = Stateful.sessionizeEvents(spark, ev, gapNanos = 3600L * 1000000000L).collect()
    assert(out.map(_.n_events).sum == ev.count())
    assert(out.forall(s => s.end_ns >= s.start_ns))
  }
}

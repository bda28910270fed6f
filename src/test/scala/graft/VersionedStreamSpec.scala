package graft

import java.nio.file.Files

import graft.sources.VersionedStream
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class VersionedStreamSpec extends SparkSpec {

  private def run(table: String, out: String, ckpt: String,
      opts: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format(VersionedStream.format).option("path", table)
    val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("initial snapshot + per-commit tail, exactly-once across restarts") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream").toString
    val table = root + "/t"
    val (out, ckpt) = (root + "/out", root + "/ckpt")
    VersionedTable.commitAppend(spark, (1L to 10L).map(i => (i, s"a$i")).toDF("id", "s"), table)
    VersionedTable.commitAppend(spark, (11L to 15L).map(i => (i, s"b$i")).toDF("id", "s"), table)

    run(table, out, ckpt) // initial snapshot: both appends' files at once
    assert(spark.read.parquet(out).count() == 15L)

    // two more commits; SAME checkpoint resumes and emits ONLY their files
    VersionedTable.commitAppend(spark, (16L to 18L).map(i => (i, s"c$i")).toDF("id", "s"), table)
    VersionedTable.commitAppend(spark, Seq((19L, "d")).toDF("id", "s"), table)
    run(table, out, ckpt)
    val got = spark.read.parquet(out)
    assert(got.count() == 19L, "tail batches must append exactly the new rows")
    assert(got.select("id").as[Long].collect().toSet == (1L to 19L).toSet)

    // re-running with nothing new emits nothing (offset replay, no dup)
    run(table, out, ckpt)
    assert(spark.read.parquet(out).count() == 19L)
  }

  test("OPTIMIZE (dataChange=false) commits are skipped wholesale") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_opt").toString
    val table = root + "/t"
    val (out, ckpt) = (root + "/out", root + "/ckpt")
    VersionedTable.commitAppend(spark,
      (1L to 12L).map(i => (i, i * 2.0)).toDF("id", "v").repartition(6), table)
    run(table, out, ckpt)
    assert(spark.read.parquet(out).count() == 12L)
    VersionedTable.commitCompact(spark, table, targetFiles = 2)
    run(table, out, ckpt)
    assert(spark.read.parquet(out).count() == 12L,
      "a pure re-layout must not re-emit rows")
    // and a real append AFTER the compaction still streams
    VersionedTable.commitAppend(spark, Seq((13L, 26.0)).toDF("id", "v"), table)
    run(table, out, ckpt)
    assert(spark.read.parquet(out).count() == 13L)
  }

  test("UPDATE fails the tail by default; ignoreChanges re-emits rewritten files") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_upd").toString
    val table = root + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 8L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(2), table)
    val (out1, ckpt1) = (root + "/out1", root + "/ckpt1")
    run(table, out1, ckpt1) // snapshot drains fine
    VersionedTable.commitUpdate(spark, table, col("id") === 1L, Map("v" -> lit(99.0)))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(table, out1, ckpt1)
    }
    assert(err.getMessage.contains("ignoreChanges") ||
      Option(err.getCause).exists(_.getMessage.contains("ignoreChanges")))

    // ignoreChanges: the rewritten file's rows re-emit (documented dup)
    val (out2, ckpt2) = (root + "/out2", root + "/ckpt2")
    run(table, out2, ckpt2, Map("ignoreChanges" -> "true")) // fresh snapshot of v1
    val n0 = spark.read.parquet(out2).count()
    assert(n0 == 8L)
    VersionedTable.commitUpdate(spark, table, col("id") === 2L, Map("v" -> lit(77.0)))
    run(table, out2, ckpt2, Map("ignoreChanges" -> "true"))
    val rows = spark.read.parquet(out2)
    assert(rows.count() > 8L, "rewritten files re-emit under ignoreChanges")
    assert(rows.where(col("id") === 2L && col("v") === 77.0).count() == 1L)
  }

  test("streamed plan is a pruned parquet scan (pushdown reaches the batch)") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_plan").toString
    val table = root + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 100L).map(i => (i, s"x$i", i * 1.0)).toDF("id", "s", "v"), table)
    var scanned: Option[org.apache.spark.sql.DataFrame] = None
    val q = spark.readStream.format(VersionedStream.format).option("path", table)
      .load()
      .select("id", "v").where(col("id") <= 10L)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        scanned = Some(df); ()
      }
      .option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(scanned.get.count() == 10L)
  }

  test("maxVersionsPerTrigger paces a backlog into bounded batches") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_pace").toString
    val table = root + "/t"
    val (out, ckpt) = (root + "/out", root + "/ckpt")
    VersionedTable.commitAppend(spark, Seq((0L, "v0")).toDF("id", "s"), table)
    run(table, out, ckpt) // checkpoint the initial snapshot at v0
    // a 6-version backlog lands while the stream is down
    (1L to 6L).foreach { i =>
      VersionedTable.commitAppend(spark, Seq((i, s"v$i")).toDF("id", "s"), table)
    }
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = spark.readStream.format(VersionedStream.format).option("path", table)
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count(); if (n > 0) batches.add(n); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop()
    val sizes = batches.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
    assert(sizes.sum == 6L, s"backlog fully drained: $sizes")
    assert(sizes.forall(_ <= 2L), s"each batch spans at most 2 versions: $sizes")
    assert(sizes.size >= 3, s"the drain must take multiple bounded batches: $sizes")
  }

  test("Trigger.AvailableNow natively drains a paced backlog in ONE run") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_now").toString
    val table = root + "/t"
    (0L to 5L).foreach { i =>
      VersionedTable.commitAppend(spark, Seq((i, s"v$i")).toDF("id", "s"), table)
    }
    def drainNow(): Unit = {
      val q = spark.readStream.format(VersionedStream.format).option("path", table)
        .option("startingVersion", "0").option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", root + "/out").option("checkpointLocation", root + "/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainNow()
    def offsetEnds(): Seq[Long] =
      new java.io.File(root + "/ckpt/offsets").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt).toSeq
        .map { f =>
          val src = scala.io.Source.fromFile(f)
          try src.getLines().toSeq.last.trim.toLong finally src.close()
        }
    // one run, three PACED batches (2 versions each), whole backlog drained
    assert(offsetEnds() == Seq(1L, 3L, 5L), offsetEnds().toString)
    assert(spark.read.parquet(root + "/out").count() == 6L)
    // a later commit is the NEXT run's work; the restarted run paces from
    // the DURABLE offset (admission control hands latestOffset the start)
    VersionedTable.commitAppend(spark, Seq((6L, "v6")).toDF("id", "s"), table)
    drainNow()
    assert(offsetEnds() == Seq(1L, 3L, 5L, 6L), offsetEnds().toString)
    assert(spark.read.parquet(root + "/out").count() == 7L)
  }

  test("startingVersion tails from that commit (inclusive), no initial snapshot") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_sv").toString
    val table = root + "/t"
    VersionedTable.commitAppend(spark, (1L to 10L).map(i => (i, "v0")).toDF("id", "s"), table)
    VersionedTable.commitAppend(spark, (11L to 15L).map(i => (i, "v1")).toDF("id", "s"), table)
    VersionedTable.commitAppend(spark, (16L to 18L).map(i => (i, "v2")).toDF("id", "s"), table)
    val q = spark.readStream.format(VersionedStream.format).option("path", table)
      .option("startingVersion", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", root + "/out").option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(root + "/out")
    assert(got.count() == 8L, "only v1 and v2 rows — v0's snapshot is skipped")
    assert(got.agg(min("id")).head.getLong(0) == 11L)
  }

  test("a startingVersion ahead of the head anchors there — earlier versions never leak") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_fut").toString
    val table = root + "/t"
    val (out, ckpt) = (root + "/out", root + "/ckpt")
    VersionedTable.commitAppend(spark, Seq((1L, "v0")).toDF("id", "s"), table) // head = 0
    // startingVersion 3 is in the FUTURE: the first run must emit nothing
    // AND must not checkpoint the current head as its anchor
    run(table, out, ckpt, Map("startingVersion" -> "3"))
    assert(!new java.io.File(out).exists() || spark.read.parquet(out).count() == 0L)
    VersionedTable.commitAppend(spark, Seq((2L, "v1")).toDF("id", "s"), table)
    VersionedTable.commitAppend(spark, Seq((3L, "v2")).toDF("id", "s"), table)
    VersionedTable.commitAppend(spark, Seq((4L, "v3")).toDF("id", "s"), table)
    VersionedTable.commitAppend(spark, Seq((5L, "v4")).toDF("id", "s"), table)
    run(table, out, ckpt, Map("startingVersion" -> "3"))
    val got = spark.read.parquet(out).collect().map(_.getString(1)).toSet
    assert(got == Set("v3", "v4"),
      s"only versions >= 3 may stream (got ${got.mkString(",")}) — v1/v2 " +
        "leaking means the future startingVersion was forgotten")
  }

  test("DROP + same-name re-ADD inside one batch span refuses instead of nulling") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_readd").toString
    val table = root + "/t"
    val (out, ckpt) = (root + "/out", root + "/ckpt")
    VersionedTable.commitAppend(spark, Seq((1L, "a")).toDF("k", "c"), table) // v0
    run(table, out, ckpt) // pin the stream's (k, c) schema; consume v0
    VersionedTable.commitAppend(spark, Seq((2L, "b")).toDF("k", "c"), table) // v1: c live
    VersionedTable.commitDropColumn(spark, table, "c")                       // v2
    VersionedTable.commitAddColumn(spark, table, "c",
      org.apache.spark.sql.types.StringType)                                 // v3: fresh physical
    VersionedTable.commitAppend(spark, Seq((3L, null.asInstanceOf[String]))
      .toDF("k", "c"), table)                                                // v4
    // one batch now spans v1..v4: v1's files carry the RETIRED physical
    // column — reading them through the head mapping would stream v1's
    // live `c` values as NULL. Must refuse, not corrupt.
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(table, out, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("RETIRED")), msgs(e).mkString(" | "))
  }

  test("a blank keyColumns option falls back to the table's declared keys") {
    import spark.implicits._
    val root  = Files.createTempDirectory("graft_vstream_bk").toString
    val table = root + "/t"
    VersionedTable.commitAppend(spark, Seq((1L, 1.0)).toDF("k", "bal"), table)
    VersionedTable.setKeyColumns(table, Seq("k"))
    VersionedTable.commitUpdate(spark, table, col("k") === 1L, Map("bal" -> lit(2.0)))
    val q = spark.readStream.format(VersionedStream.format)
      .option("path", table)
      .option("readChangeFeed", "true")
      .option("keyColumns", " ")           // blank = undeclared, NOT "no keys"
      .option("startingVersion", "0")
      .load()
      .writeStream.format("parquet")
      .option("path", root + "/out").option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val types = spark.read.parquet(root + "/out")
      .select("_change_type").collect().map(_.getString(0)).toSet
    assert(types == Set("insert", "update_preimage", "update_postimage"), types.toString)
    // with NO declaration either, the refusal is loud and up front
    val bare = root + "/bare"
    VersionedTable.commitAppend(spark, Seq((1L, 1.0)).toDF("k", "bal"), bare)
    val e = intercept[Exception] {
      new VersionedStream().createSource(spark.sqlContext, root + "/meta", None,
        "graft", Map("path" -> bare, "readChangeFeed" -> "true", "keyColumns" -> ","))
    }
    assert(e.getMessage.contains("needs key columns"), e.getMessage)
  }
}

package graft

import java.nio.file.Files

import graft.sources.VersionedStream
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Change-data-feed STREAMING source (round 11 — Delta's `readChangeFeed`
  * stream): row-level changes with _change_type / _commit_version instead
  * of appended files, UPDATE/DELETE first-class, OPTIMIZE silent, pacing
  * and default-tail semantics.
  */
class CdfStreamSpec extends SparkSpec {

  private def root() = Files.createTempDirectory("graft_cdfspec").toString

  private def drain(table: String, out: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val r = spark.readStream.format(VersionedStream.format)
      .option("path", table)
      .option("readChangeFeed", "true")
      .option("keyColumns", "k")
      .options(extra)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    r.awaitTermination()
  }

  test("default start tails from latest: pre-existing versions emit nothing") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table) // v0
    VersionedTable.commitAppend(spark, Seq((2L, 20.0)).toDF("k", "bal"), table) // v1
    drain(table, s"$r/out", s"$r/ckpt")
    // no startingVersion: the feed is changes AFTER stream start — v0/v1
    // are history, not changes (files may exist but hold zero rows)
    val outFiles = new java.io.File(s"$r/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val n = if (outFiles.isEmpty) 0L else spark.read.parquet(s"$r/out").count()
    assert(n == 0L, s"default start must not replay history ($n rows)")
    // a post-start update IS the feed
    VersionedTable.commitUpdate(spark, table, col("k") === 1L,
      Map("bal" -> lit(99.0)))
    drain(table, s"$r/out", s"$r/ckpt")
    val rows = spark.read.parquet(s"$r/out")
      .select("k", "bal", "_change_type", "_commit_version").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getString(2), x.getLong(3))).toSet
    assert(rows == Set(
      (1L, 10.0, "update_preimage", 2L),
      (1L, 99.0, "update_postimage", 2L)), rows.toString)
  }

  test("maxVersionsPerTrigger paces the CDF bootstrap; commit timestamps ride along") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    (0 until 4).foreach(i =>
      VersionedTable.commitAppend(spark, Seq((i.toLong, i * 1.0)).toDF("k", "bal"), table))
    // the source supports Trigger.AvailableNow natively (PacedAdmission):
    // ONE run drains the whole backlog, but in PACED micro-batches — the
    // checkpoint must show one batch per version, each advancing by
    // exactly maxVersionsPerTrigger (the engine's old fallback planned the
    // entire backlog as a single unbounded batch)
    drain(table, s"$r/out", s"$r/ckpt",
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "1"))
    val offFiles = new java.io.File(s"$r/ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val ends = offFiles.toSeq.map { f =>
      val src = scala.io.Source.fromFile(f)
      try src.getLines().toSeq.last.trim.toLong finally src.close()
    }
    assert(ends == Seq(0L, 1L, 2L, 3L),
      s"each AvailableNow batch must advance one version, got offsets $ends")
    val out = spark.read.parquet(s"$r/out")
    assert(out.count() == 4L)
    assert(out.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    assert(out.select("_commit_version").distinct().count() == 4L)
    assert(out.where(col("_commit_timestamp").isNull).count() == 0L)
  }

  test("BATCH readChangeFeed reads the same feed as the stream (shared builder)") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "bal"), table) // v0
    VersionedTable.setKeyColumns(table, Seq("k"))
    VersionedTable.commitUpdate(spark, table, col("k") === 1L, Map("bal" -> lit(9.0)))    // v1
    VersionedTable.commitDelete(spark, table, col("k") === 2L)                            // v2
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(table)
    assert(!feed.isStreaming)
    val rows = feed.select("k", "_change_type", "_commit_version").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    assert(rows == Set(
      (1L, "insert", 0L), (2L, "insert", 0L),
      (1L, "update_preimage", 1L), (1L, "update_postimage", 1L),
      (2L, "delete", 2L)), rows.toString)
    // an explicit ending version bounds the span
    val bounded = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1")
      .load(table)
    assert(bounded.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // out-of-history spans and writes refuse loudly
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      spark.read.format("graft")
        .option("readChangeFeed", "true").option("startingVersion", "9")
        .load(table).collect()
    }
    assert(msgs(e).exists(_.contains("committed history")), msgs(e).mkString(" | "))
  }

  test("BATCH readChangeFeed accepts timestamp span bounds (Delta parity)") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "bal"), table) // v0
    VersionedTable.setKeyColumns(table, Seq("k"))
    Thread.sleep(15)
    val mid = new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(15)
    VersionedTable.commitUpdate(spark, table, col("k") === 1L, Map("bal" -> lit(9.0)))    // v1
    Thread.sleep(15)
    val end = new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(15)
    VersionedTable.commitDelete(spark, table, col("k") === 2L)                            // v2
    // startingTimestamp → first commit AT or AFTER it (v1);
    // endingTimestamp → last commit AT or BEFORE it (v1)
    val span = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", mid).option("endingTimestamp", end)
      .load(table)
    assert(span.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // mixing version and timestamp bounds on the same end refuses
    val e1 = intercept[Exception] {
      spark.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0").option("startingTimestamp", mid)
        .load(table)
    }
    assert(e1.getMessage.contains("mutually exclusive"), e1.getMessage)
    // a start past the last commit is an empty span — loud, like the stream
    val e2 = intercept[Exception] {
      spark.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingTimestamp",
          new java.sql.Timestamp(System.currentTimeMillis() + 3600000L).toString)
        .load(table)
    }
    assert(e2.getMessage.contains("feed span is empty"), e2.getMessage)
  }

  test("a key-only table (keys cover every column) feeds inserts/deletes") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    // membership-set shape: the single column IS the key — updates cannot
    // exist, the feed is inserts and deletes only (the diff used to refuse
    // outright with "need at least one value column")
    VersionedTable.commitAppend(spark, Seq(1L, 2L, 3L).toDF("k"), table)     // v0
    VersionedTable.setKeyColumns(table, Seq("k"))
    VersionedTable.commitAppend(spark, Seq(4L).toDF("k"), table)             // v1
    VersionedTable.commitDelete(spark, table, col("k") === 2L)               // v2
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(table)
    val rows = feed.select("k", "_change_type", "_commit_version").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    assert(rows == Set(
      (1L, "insert", 0L), (2L, "insert", 0L), (3L, "insert", 0L),
      (4L, "insert", 1L), (2L, "delete", 2L)), rows.toString)
  }

  test("readChangeFeed without keyColumns is refused loudly") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 1.0)).toDF("k", "bal"), table)
    val ex = intercept[Exception] {
      spark.readStream.format(VersionedStream.format)
        .option("path", table).option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$r/out").option("checkpointLocation", s"$r/ckpt")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("keyColumns") ||
      Option(ex.getCause).exists(_.getMessage.contains("keyColumns")),
      s"${ex.getMessage} / ${Option(ex.getCause).map(_.getMessage)}")
  }
}

package graft

import java.nio.file.Files

import graft.sources.VersionedStream
import graft.tables.{TableManager, TableSql, VersionedTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-12 guards: streaming + change-feed behavior across schema changes
  * (column mapping, additive evolution), merge assignment validation, and
  * the commit-entry cache's delete/recreate invalidation.
  */
class SchemaStreamGuardSpec extends SparkSpec {

  private def root() = Files.createTempDirectory("graft_guard").toString

  private def drainPlain(table: String, out: String, ckpt: String): Unit = {
    val q = spark.readStream.format(VersionedStream.format)
      .option("path", table)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("plain stream over a RENAMED table emits real values, not nulls") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    VersionedTable.commitRenameColumn(spark, table, "bal", "amount")
    VersionedTable.commitAppend(spark, Seq((2L, 20.0)).toDF("k", "amount"), table)
    // stream starts AFTER the rename: schema is (k, amount); the emitted
    // files carry the PHYSICAL name `bal` — before the fix these values
    // silently streamed as NULL
    drainPlain(table, s"$r/out", s"$r/ckpt")
    val rows = spark.read.parquet(s"$r/out").select("k", "amount").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSet
    assert(rows == Set((1L, 10.0), (2L, 20.0)), rows.toString)
  }

  test("plain stream refuses loudly when a rename lands MID-stream") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    // a LIVE stream pins its schema at start; drive the Source directly to
    // model one (a restarted AvailableNow query re-resolves the schema and
    // legitimately proceeds)
    val pinned = VersionedTable.read(spark, table).schema // (k, bal)
    val source = new VersionedStream().createSource(spark.sqlContext,
      s"$r/meta", Some(pinned), "graft", Map("path" -> table))
    VersionedTable.commitRenameColumn(spark, table, "bal", "amount")
    VersionedTable.commitAppend(spark, Seq((2L, 20.0)).toDF("k", "amount"), table)
    val end = source.getOffset.get
    val e = intercept[Exception] { source.getBatch(None, end) }
    assert(e.getMessage.contains("renamed or dropped"), e.getMessage)
  }

  test("plain stream refuses loudly when a DROP lands MID-stream (tombstone-only, no mapping)") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    val pinned = VersionedTable.read(spark, table).schema // (k, bal)
    val source = new VersionedStream().createSource(spark.sqlContext,
      s"$r/meta", Some(pinned), "graft", Map("path" -> table))
    // a pure DROP leaves NO rename mapping (physical == logical for every
    // surviving field) — before the fix the guard keyed only on mappings,
    // so the post-drop file streamed `bal` as silent NULLs
    VersionedTable.commitDropColumn(spark, table, "bal")
    VersionedTable.commitAppend(spark, Seq(Tuple1(2L)).toDF("k"), table)
    val end = source.getOffset.get
    val e = intercept[Exception] { source.getBatch(None, end) }
    assert(e.getMessage.contains("renamed or dropped"), e.getMessage)
  }

  test("plain stream pinned AFTER a drop keeps streaming (subset check passes)") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    VersionedTable.commitDropColumn(spark, table, "bal")
    VersionedTable.commitAppend(spark, Seq(Tuple1(2L)).toDF("k"), table)
    // the table has retirement history, but this stream's schema (k) is a
    // subset of the declared schema — the broadened guard must not refuse
    drainPlain(table, s"$r/out", s"$r/ckpt")
    val ks = spark.read.parquet(s"$r/out").select("k").collect().map(_.getLong(0)).toSet
    assert(ks == Set(1L, 2L), ks.toString)
  }

  private def drainCdf(table: String, out: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val q = spark.readStream.format(VersionedStream.format)
      .option("path", table)
      .option("readChangeFeed", "true")
      .option("keyColumns", "k")
      .options(extra)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("CDF replay across an ADDITIVE evolution null-fills the later column") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)          // v0
    VersionedTable.commitAppend(spark, Seq((2L, 20.0)).toDF("k", "bal"), table)          // v1
    VersionedTable.commitAppendEvolve(spark,
      Seq((3L, 30.0, "c")).toDF("k", "bal", "note"), table)                              // v2 adds note
    VersionedTable.commitUpdate(spark, table, col("k") === 3L,
      Map("note" -> lit("z")))                                                           // v3
    drainCdf(table, s"$r/out", s"$r/ckpt", Map("startingVersion" -> "0"))
    val out = spark.read.parquet(s"$r/out")
    // steps below the evolve exist with note = null (the column did not
    // exist yet); the evolve step's insert and the update carry real values
    val v0 = out.where(col("_commit_version") === 0L).select("k", "note").collect()
    assert(v0.length == 1 && v0.head.isNullAt(1), v0.mkString(","))
    val ins = out.where(col("_commit_version") === 2L && col("_change_type") === "insert")
      .select("note").collect()
    assert(ins.map(_.getString(0)).toSeq == Seq("c"), ins.mkString(","))
    val upd = out.where(col("_commit_version") === 3L && col("_change_type") === "update_postimage")
      .select("note").collect()
    assert(upd.map(_.getString(0)).toSeq == Seq("z"), upd.mkString(","))
  }

  test("PACED CDF replay across an additive evolution: early batches below the schema commit null-fill") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)   // v0
    VersionedTable.commitAppend(spark, Seq((2L, 20.0)).toDF("k", "bal"), table)   // v1
    VersionedTable.commitAppendEvolve(spark,
      Seq((3L, 30.0, "c")).toDF("k", "bal", "note"), table)                       // v2 adds note
    // maxVersionsPerTrigger=1: the FIRST batch's endV=0 sits below the
    // schema commit — the evolved-table detection must key on the table
    // HEAD, or schemaAt(0) resolves the stream's wide schema and the batch
    // crashes (and replays forever)
    (0 until 3).foreach { _ =>
      drainCdf(table, s"$r/out", s"$r/ckpt",
        Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "1"))
    }
    val out = spark.read.parquet(s"$r/out")
    assert(out.count() == 3L)
    assert(out.where(col("_commit_version") < 2L && col("note").isNotNull).count() == 0L)
    assert(out.where(col("_commit_version") === 2L).select("note").head.getString(0) == "c")
  }

  test("CDF refuses loudly when a RENAME lands mid-stream (pinned schema)") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    val pinned = VersionedTable.read(spark, table).schema // (k, bal)
    val source = new VersionedStream().createSource(spark.sqlContext,
      s"$r/meta", Some(pinned), "graft",
      Map("path" -> table, "readChangeFeed" -> "true", "keyColumns" -> "k",
        "startingVersion" -> "0"))
    VersionedTable.commitRenameColumn(spark, table, "bal", "amount")
    VersionedTable.commitUpdate(spark, table, col("k") === 1L,
      Map("amount" -> lit(99.0)))
    val end = source.getOffset.get
    val e = intercept[Exception] { source.getBatch(None, end).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("RENAME/DROP")), msgs(e).mkString(" | "))
  }

  test("CDF replay BELOW a pre-stream rename refuses — never null-fills the old column") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)   // v0
    VersionedTable.commitRenameColumn(spark, table, "bal", "amount")              // v1
    VersionedTable.commitUpdate(spark, table, col("k") === 1L,
      Map("amount" -> lit(99.0)))                                                 // v2
    // stream starts AFTER the rename (schema = k, amount); replaying v0
    // would need `amount` where only `bal` existed — the retirement check
    // must key on the HEAD's history, not the step's (v0 predates the
    // rename's schema file)
    val e = intercept[Exception] {
      drainCdf(table, s"$r/out", s"$r/ckpt", Map("startingVersion" -> "0"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("RENAME/DROP COLUMN history")), msgs(e).mkString(" | "))
    // starting AFTER the schema change, the feed works
    drainCdf(table, s"$r/out2", s"$r/ckpt2", Map("startingVersion" -> "2"))
    val rows = spark.read.parquet(s"$r/out2").select("k", "amount", "_change_type")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getString(2))).toSet
    assert(rows == Set((1L, 10.0, "update_preimage"), (1L, 99.0, "update_postimage")),
      rows.toString)
  }

  test("CDF refuses a missing column on a table with RENAME/DROP history") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0, "x")).toDF("k", "bal", "tag"), table) // v0
    VersionedTable.commitDropColumn(spark, table, "tag")                                     // v1 (no dataChange)
    VersionedTable.commitAppendEvolve(spark,
      Seq((2L, 20.0, "y")).toDF("k", "bal", "tag"), table)                                   // v2 re-adds tag
    // replay from v0: `tag` at v0 is the RETIRED column — null-fill would
    // conflate two different physical columns under one logical name
    val e = intercept[Exception] {
      drainCdf(table, s"$r/out", s"$r/ckpt", Map("startingVersion" -> "0"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("RETIRED columns")), msgs(e).mkString(" | "))
  }

  test("changes() across an additive evolution reports old=null for the new column") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)   // v0
    VersionedTable.commitAppendEvolve(spark,
      Seq((2L, 20.0, "c")).toDF("k", "bal", "note"), table)                       // v1
    val ch = VersionedTable.changes(spark, table, 0L, 1L, Seq("k"), Seq("bal", "note"))
      .where(col("change_type") === "added").select("k", "note_old", "note_new").collect()
    assert(ch.map(x => (x.getLong(0), x.isNullAt(1), x.getString(2))).toSet ==
      Set((2L, true, "c")), ch.mkString(","))
  }

  test("diff() across a RENAME refuses loudly; changes() skips the rename step") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)   // v0
    VersionedTable.commitRenameColumn(spark, table, "bal", "amount")              // v1
    VersionedTable.commitAppend(spark, Seq((2L, 20.0)).toDF("k", "amount"), table) // v2
    // a direct version-PAIR diff crossing the rename cannot compare the two
    // sides under one schema
    val e = intercept[Exception] {
      VersionedTable.diff(spark, table, 0L, 2L, Seq("k")).collect()
    }
    assert(e.getMessage.contains("NON-additive"), e.getMessage)
    // the step-wise feed is fine: the rename step is dataChange=false
    // (skipped) and every remaining step pair shares one declared schema
    val ch = VersionedTable.changes(spark, table, 0L, 2L, Seq("k"), Seq("amount"))
      .select("k", "change_type", "amount_new").collect()
    assert(ch.map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSet ==
      Set((2L, "added", 20.0)), ch.mkString(","))
  }

  test("conditional MERGE rejects unknown SET / INSERT assignment targets") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    val src = Seq((1L, 99.0)).toDF("k", "bal")
    val e1 = intercept[Exception] {
      VersionedTable.commitMergeConditional(spark, table, src, Seq("k"),
        Seq(VersionedTable.WhenMatchedUpdate(None, Map("balance" -> "s.bal"))))
    }
    assert(e1.getMessage.contains("unknown column"), e1.getMessage)
    val e2 = intercept[Exception] {
      VersionedTable.commitMergeConditional(spark, table, src, Seq("k"),
        Seq(VersionedTable.WhenNotMatchedInsert(None, Some(Map("k" -> "s.k", "ballance" -> "s.bal")))))
    }
    assert(e2.getMessage.contains("unknown column"), e2.getMessage)
    // the table is untouched by the rejected merges
    assert(VersionedTable.latestVersion(table).contains(0L))
  }

  test("TableSql MERGE: CASE-in-condition parses; a malformed arm refuses loudly") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark,
      Seq((1L, 10.0), (2L, 80.0)).toDF("k", "bal"), table)
    Seq((1L, 99.0), (2L, 99.0)).toDF("k", "bal").createOrReplaceTempView("guard_src")
    // an inline CASE inside the AND-condition: the arm regex backtracks
    // past the CASE's own THEN tokens and the condition reaches Catalyst
    // whole — only target rows whose source bal clears the CASE delete
    TableSql.execute(spark, Map("t" -> table),
      "MERGE INTO t USING (SELECT * FROM guard_src WHERE k = 2) ON (k) " +
        "WHEN MATCHED AND CASE WHEN t.bal > 50 THEN true ELSE false END THEN DELETE")
    val left = VersionedTable.read(spark, table).select("k").collect().map(_.getLong(0)).toSet
    assert(left == Set(1L), left.toString)
    // a malformed arm among valid ones must be a loud error, not a silent drop
    val e = intercept[Exception] {
      TableSql.execute(spark, Map("t" -> table),
        "MERGE INTO t USING guard_src ON (k) " +
          "WHEN MATCHED THEN UPDATE SET bal = s.bal " +
          "WHEN MATCHED THEN TRUNCATE")
    }
    assert(e.getMessage.contains("unparseable") || e.getMessage.contains("malformed"),
      e.getMessage)
  }

  test("delete + recreate at the same path serves fresh commit entries") {
    import spark.implicits._
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 1.0)).toDF("k", "bal"), table)
    assert(VersionedTable.read(spark, table).select("bal").head.getDouble(0) == 1.0)
    TableManager.deleteDir(spark, table)
    VersionedTable.commitAppend(spark, Seq((1L, 2.0)).toDF("k", "bal"), table)
    assert(VersionedTable.read(spark, table).select("bal").head.getDouble(0) == 2.0)
  }
}

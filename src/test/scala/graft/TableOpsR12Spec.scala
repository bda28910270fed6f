package graft

import java.nio.file.Files

import graft.sources.VersionedStream
import graft.tables.{TableSql, VersionedTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-12 table operations: table-level key declaration feeding the CDF
  * stream, startingTimestamp bootstrap, predicate-scoped OPTIMIZE, and
  * VACUUM DRY RUN.
  */
class TableOpsR12Spec extends SparkSpec {
  import spark.implicits._

  private def root() = Files.createTempDirectory("graft_r12").toString

  test("MERGE records keyColumns; CDF streams without the per-query option") {
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal"), table)
    assert(VersionedTable.keyColumns(table).isEmpty)
    VersionedTable.commitMerge(spark, table, Seq((2L, 99.0)).toDF("k", "bal"), Seq("k"))
    assert(VersionedTable.keyColumns(table).contains(Seq("k")))
    // CDF with NO keyColumns option resolves the declaration
    val q = spark.readStream.format(VersionedStream.format)
      .option("path", table)
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$r/out").option("checkpointLocation", s"$r/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(s"$r/out")
      .select("k", "bal", "_change_type").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getString(2))).toSet
    assert(rows == Set((2L, 20.0, "update_preimage"), (2L, 99.0, "update_postimage")),
      rows.toString)
  }

  test("CDF on an undeclared table refuses with an actionable message") {
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    val e = intercept[Exception] {
      spark.readStream.format(VersionedStream.format)
        .option("path", table).option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$r/out").option("checkpointLocation", s"$r/ckpt")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("setKeyColumns")), msgs(e).mkString(" | "))
  }

  test("startingTimestamp bootstraps from the first commit at or after it") {
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 1L)).toDF("k", "x"), table) // v0
    Thread.sleep(20)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(20)
    VersionedTable.commitAppend(spark, Seq((2L, 2L)).toDF("k", "x"), table) // v1
    VersionedTable.commitAppend(spark, Seq((3L, 3L)).toDF("k", "x"), table) // v2
    val ts = new java.sql.Timestamp(betweenMs).toString
    val q = spark.readStream.format(VersionedStream.format)
      .option("path", table)
      .option("startingTimestamp", ts)
      .option("maxVersionsPerTrigger", "1") // pacing must bound batch 1 too
      .load()
      .writeStream.format("parquet")
      .option("path", s"$r/out").option("checkpointLocation", s"$r/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // v0 predates the timestamp: the run drains v1 and v2 only — and with
    // native AvailableNow support it does so in TWO paced batches (ends at
    // versions 1 then 2), not one unbounded batch
    assert(spark.read.parquet(s"$r/out").select("k").collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    val offEnds = new java.io.File(s"$r/ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt).toSeq
      .map { f =>
        val src = scala.io.Source.fromFile(f)
        try src.getLines().toSeq.last.trim.toLong finally src.close()
      }
    assert(offEnds == Seq(1L, 2L), offEnds.toString)
    // both options together refuse (createSource runs at stream start)
    val e = intercept[Exception] {
      spark.readStream.format(VersionedStream.format)
        .option("path", table).option("startingTimestamp", ts)
        .option("startingVersion", "0").load()
        .writeStream.format("parquet")
        .option("path", s"$r/out2").option("checkpointLocation", s"$r/ckpt2")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mutually exclusive")), msgs(e).mkString(" | "))
  }

  test("OPTIMIZE ... WHERE rewrites only matching files; others stay byte-identical") {
    val r = root(); val table = s"$r/t"
    // two clearly separated key ranges in separate files
    VersionedTable.commitAppend(spark,
      spark.range(0L, 1000L).select(col("id").as("k"), (col("id") * 3).as("x"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"), table)
    val before = VersionedTable.filesOf(table, 0L)
    val v = TableSql.execute(spark, Map("t" -> table),
      "OPTIMIZE t WHERE k < 250 TARGET 1 FILES").head.getLong(2)
    val after = VersionedTable.filesOf(table, v)
    // the non-matching files carry over AS THE SAME entries (shared, not
    // rewritten); only the matching file(s) were replaced
    val shared = before.toSet.intersect(after.toSet)
    assert(shared.nonEmpty, "scoped OPTIMIZE must share non-matching files")
    assert(before.toSet -- shared != before.toSet, "some file must rewrite")
    // rows identical, dataChange=false (the feed skips the step)
    assert(VersionedTable.read(spark, table).count() == 1000L)
    assert(!VersionedTable.dataChanged(table, v))
    assert(VersionedTable.changes(spark, table, 0L, v, Seq("k"), Seq("x")).count() == 0L)
    // a predicate hitting nothing is a no-op (no new version)
    val v2 = VersionedTable.commitCompact(spark, table, 1,
      where = Some(col("k") > 100000L))
    assert(v2 == v && VersionedTable.latestVersion(table).contains(v))
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; re-add after drop gets a fresh physical") {
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)   // v0
    val cat = Map("t" -> table)
    val v1 = TableSql.execute(spark, cat, "ALTER TABLE t ADD COLUMN note STRING").head.getLong(2)
    // metadata-only: same files, dataChange=false, old rows read null
    assert(VersionedTable.filesOf(table, v1) == VersionedTable.filesOf(table, 0L))
    assert(!VersionedTable.dataChanged(table, v1))
    val row = VersionedTable.read(spark, table).select("k", "bal", "note").head
    assert(row.getLong(0) == 1L && row.isNullAt(2))
    // time travel below sees the narrow schema
    assert(!VersionedTable.read(spark, table, Some(0L)).columns.contains("note"))
    // appends must now carry the column; values round-trip
    VersionedTable.commitAppend(spark, Seq((2L, 20.0, "x")).toDF("k", "bal", "note"), table)
    assert(VersionedTable.read(spark, table).where(col("k") === 2L)
      .select("note").head.getString(0) == "x")
    // drop + re-add under the same name: fresh physical, no resurrection
    TableSql.execute(spark, cat, "ALTER TABLE t DROP COLUMN note")
    TableSql.execute(spark, cat, "ALTER TABLE t ADD COLUMN note STRING")
    val vals = VersionedTable.read(spark, table).select("k", "note").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(vals == Map(1L -> null, 2L -> null), vals.toString) // old 'x' never resurrects
  }

  test("constraint / TBLPROPERTIES / clone SQL verbs") {
    val r = root(); val table = s"$r/t"; val cloneDir = s"$r/c"
    VersionedTable.commitAppend(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal"), table)
    val cat = Map("t" -> table, "t2" -> cloneDir)
    TableSql.execute(spark, cat, "ALTER TABLE t ADD CONSTRAINT pos CHECK (bal >= 0)")
    val e = intercept[Exception] {
      VersionedTable.commitAppend(spark, Seq((3L, -5.0)).toDF("k", "bal"), table)
    }
    assert(e.getMessage.contains("pos"), e.getMessage)
    TableSql.execute(spark, cat, "ALTER TABLE t DROP CONSTRAINT pos")
    VersionedTable.commitAppend(spark, Seq((3L, -5.0)).toDF("k", "bal"), table)
    TableSql.execute(spark, cat,
      "ALTER TABLE t SET TBLPROPERTIES ('team' = 'data', 'keyColumns' = 'k')")
    val props = TableSql.execute(spark, cat, "SHOW TBLPROPERTIES t")
      .collect().map(x => (x.getString(0), x.getString(1))).toMap
    assert(props == Map("team" -> "data", "keyColumns" -> "k"), props.toString)
    assert(VersionedTable.keyColumns(table).contains(Seq("k")))
    TableSql.execute(spark, cat, "CREATE TABLE t2 SHALLOW CLONE t VERSION AS OF 0")
    assert(VersionedTable.read(spark, cloneDir).count() == 2L)
  }

  test("OPTIMIZE ZORDER BY with 3 columns; DESCRIBE DETAIL summarizes the head") {
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 2000L).select(col("id").as("a"),
        pmod(col("id") * 37L, lit(101L)).as("b"),
        pmod(col("id") * 17L, lit(53L)).as("c")), table)
    val cat = Map("t" -> table)
    // 8 files = the top 3 z-bits = each dimension's top bucket bit: every
    // file must cover at most ~half of EVERY dimension's domain (a plain
    // repartition spans all of each)
    val v = TableSql.execute(spark, cat,
      "OPTIMIZE t ZORDER BY (a, b, c) TARGET 8 FILES").head.getLong(2)
    assert(VersionedTable.filesOf(table, v).size == 8)
    assert(!VersionedTable.dataChanged(table, v))
    assert(VersionedTable.read(spark, table).count() == 2000L)
    def spansAt(ver: Long)(c: String): Seq[Long] = VersionedTable.filesOf(table, ver).map { rel =>
      val f = spark.read.parquet(s"$table/$rel").agg(min(c), max(c)).head
      f.getLong(1) - f.getLong(0)
    }
    def spans(c: String): Seq[Long] = spansAt(v)(c)
    // the MOST significant dimension (highest interleave position) clusters
    // in EVERY file; lower dimensions cluster in the files that don't
    // straddle a range-sampler cut (min span ≈ half the domain) — the
    // z-order guarantee, net of repartitionByRange's sampled boundaries
    assert(spans("c").max < 42L, s"c spans ${spans("c")}")   // domain 53
    assert(spans("b").min < 55L, s"b spans ${spans("b")}")   // domain 101
    assert(spans("a").min < 1100L, s"a spans ${spans("a")}") // domain 2000
    VersionedTable.setKeyColumns(table, Seq("a"))
    val d = TableSql.execute(spark, cat, "DESCRIBE DETAIL t").head
    assert(d.getAs[String]("location") == table)
    assert(d.getAs[Long]("version") == v)
    assert(d.getAs[Long]("num_files") == 8L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("key_columns") == "a")
    assert(!d.getAs[Boolean]("column_mapping"))
    assert(!d.getAs[Boolean]("schema_retirements"))
    // single-column ZORDER degenerates to a range sort (Delta allows it)
    val v1 = TableSql.execute(spark, cat,
      "OPTIMIZE t ZORDER BY (b) TARGET 4 FILES").head.getLong(2)
    assert(VersionedTable.filesOf(table, v1).size == 4)
    assert(spansAt(v1)("b").max < 40L, s"1-col zorder b spans ${spansAt(v1)("b")}")
    // a drop-only table reports schema_retirements (tombstones, no mapping)
    TableSql.execute(spark, cat, "ALTER TABLE t DROP COLUMN c")
    val d2 = TableSql.execute(spark, cat, "DESCRIBE DETAIL t").head
    assert(!d2.getAs[Boolean]("column_mapping"))
    assert(d2.getAs[Boolean]("schema_retirements"))
  }

  test("ADD COLUMN with a STRUCT type; TBLPROPERTIES with quoted quotes") {
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), table)
    val cat = Map("t" -> table)
    TableSql.execute(spark, cat, "ALTER TABLE t ADD COLUMN meta STRUCT<a: INT, b: STRING>")
    val f = VersionedTable.read(spark, table).schema("meta").dataType
    assert(f.isInstanceOf[org.apache.spark.sql.types.StructType], f.toString)
    TableSql.execute(spark, cat,
      "ALTER TABLE t SET TBLPROPERTIES ('comment' = 'it''s big')")
    assert(VersionedTable.property(table, "comment").contains("it's big"))
  }

  test("VACUUM DRY RUN lists the plan and deletes nothing; real vacuum matches") {
    val r = root(); val table = s"$r/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 100L).select(col("id").as("k"), col("id").as("x")), table) // v0
    VersionedTable.commitDelete(spark, table, col("k") < 50L)                    // v1 rewrites
    VersionedTable.commitAppend(spark, Seq((900L, 1L)).toDF("k", "x"), table)    // v2
    val plan = TableSql.execute(spark, Map("t" -> table),
      "VACUUM t RETAIN 1 VERSIONS DRY RUN")
    val planned = plan.collect().map(_.getString(0)).toSet
    assert(planned.nonEmpty, "v0/v1-exclusive files must be planned")
    // nothing deleted: every version still reads
    assert(VersionedTable.read(spark, table, Some(0L)).count() == 100L)
    assert(VersionedTable.read(spark, table, Some(1L)).count() == 50L)
    // the real vacuum deletes exactly the dry-run plan (same grace rules)
    val (dropped, paths) = VersionedTable.vacuumDryRun(spark, table, retainLast = 1)
    assert(paths.toSet == planned)
    VersionedTable.vacuum(spark, table, retainLast = 1)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    planned.foreach(p => assert(!fs.exists(new org.apache.hadoop.fs.Path(table, p)),
      s"planned path $p must be gone after the real vacuum"))
    assert(dropped.nonEmpty)
    intercept[Exception] { VersionedTable.read(spark, table, Some(0L)).count() }
    assert(VersionedTable.read(spark, table).count() == 51L)
  }
}

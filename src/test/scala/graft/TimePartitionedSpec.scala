package graft

import graft.tables.TimePartitioned
import org.apache.spark.sql.functions._

class TimePartitionedSpec extends SparkSpec {

  private val Day = 86400L * 1000000000L

  test("day boundaries are exact and inclusive; reader prunes to the window's days") {
    import spark.implicits._
    val d0 = 19724L * Day // some UTC midnight
    val rows = Seq(
      (1L, d0 - 1L),       // last nano of the previous day
      (2L, d0),            // exactly midnight
      (3L, d0 + Day - 1L), // last nano of day 0
      (4L, d0 + Day),      // midnight day 1
      (5L, d0 + 2 * Day + 5L))
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_spec").toString + "/t"
    TimePartitioned.write(rows.toDF("id", "ts"), dir, "ts")
    // 4 distinct days → 4 partition dirs
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("p_day=")) == 4)
    def ids(from: Long, to: Long): Set[Long] =
      TimePartitioned.readRange(spark, dir, "ts", from, to)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(d0, d0 + Day) == Set(2L, 3L, 4L), "inclusive midnight-to-midnight window")
    assert(ids(d0 - 1L, d0 - 1L) == Set(1L), "single-nano window on a day edge")
    // the partition column never escapes
    val cols = TimePartitioned.readRange(spark, dir, "ts", d0, d0 + Day).columns.toSeq
    assert(cols == Seq("id", "ts"))
    // plan prunes: a one-day window reads one partition of four
    val scanned = TimePartitioned.readRange(spark, dir, "ts", d0, d0 + Day - 1L)
      .queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.selectedPartitions.partitionCount).sum
    assert(scanned == 1, s"one-day window planned $scanned partitions")
  }

  test("ad-hoc parquet read (p_day inferred as DATE) still prunes, never miscasts") {
    import spark.implicits._
    val d0 = 19724L * Day
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_date").toString + "/t"
    TimePartitioned.write(
      (0 until 4).flatMap(d => Seq((d.toLong, d0 + d * Day + 7L))).toDF("id", "ts"),
      dir, "ts")
    TimePartitioned.assertMarker(dir, "ts")
    // a DIRECT spark.read.parquet of the marker'd dir lets partition type
    // inference type p_day as DATE ('yyyy-MM-dd' values), not the string
    // GraftDayTable pins — the injected p_day bound must be built at that
    // resolved type or execution dies on a cast; pruning must still fire
    val adhoc = spark.read.parquet(dir).where(col("ts") >= d0 + Day && col("ts") < d0 + 2 * Day)
    assert(adhoc.schema("p_day").dataType == org.apache.spark.sql.types.DateType)
    assert(adhoc.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    val scanned = adhoc.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.selectedPartitions.partitionCount).sum
    assert(scanned == 1, s"one-day window planned $scanned partitions")
  }

  test("pre-epoch timestamps map to the correct (negative-day) partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_neg").toString + "/t"
    val t = -3L * Day + 7L // 1969-12-29 00:00:00.000000007
    TimePartitioned.write(Seq((1L, t)).toDF("id", "ts"), dir, "ts")
    assert(new java.io.File(dir).listFiles().exists(_.getName == "p_day=1969-12-29"))
    assert(TimePartitioned.readRange(spark, dir, "ts", t, t).count() == 1)
  }

  test("pre-epoch ts in the last second of a UTC day floors (not truncates) to that day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_floor").toString + "/t"
    // 1969-12-31 23:59:59.5 — trunc-div would store it under p_day=1970-01-01
    // and readRange's floorDiv pruning would silently drop it.
    val t = -500000000L
    TimePartitioned.write(Seq((1L, t)).toDF("id", "ts"), dir, "ts")
    assert(new java.io.File(dir).listFiles().exists(_.getName == "p_day=1969-12-31"),
      "write path must floor the day key like the reader does")
    assert(TimePartitioned.readRange(spark, dir, "ts", t, t).count() == 1)
  }

  test("dropDaysBefore reclaims whole day directories, keeps the cutoff's own day") {
    import spark.implicits._
    val d0 = 19724L * Day
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_ret").toString + "/t"
    TimePartitioned.write(
      (0L until 100L).map(i => (i, d0 + (i / 10L) * Day + i)).toDF("id", "ts"),
      dir, "ts") // 10 days
    // cutoff MID-day 3: days 0-2 drop, day 3 (the cutoff's day) stays
    val dropped = TimePartitioned.dropDaysBefore(spark, dir, d0 + 3 * Day + 12345L)
    assert(dropped.size == 3, dropped.toString)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("p_day=")) == 7)
    val got = spark.read.parquet(dir).drop("p_day").as[(Long, Long)]
      .collect().map(_._1).toSet
    assert(got == (30L until 100L).toSet, "days 3..9 intact, 0..2 reclaimed")
    // idempotent; and a later cutoff advances
    assert(TimePartitioned.dropDaysBefore(spark, dir, d0 + 3 * Day).isEmpty)
    assert(TimePartitioned.dropDaysBefore(spark, dir, d0 + 5 * Day) == Seq(
      TimePartitioned.dayOfNanos(d0 + 3 * Day), TimePartitioned.dayOfNanos(d0 + 4 * Day)))
  }

  test("compactDaysBefore: closed days compact atomically; crash states recover") {
    import spark.implicits._
    val d0 = 19724L * Day
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_cmp").toString + "/t"
    def rows(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, d0 + (i / 100L) * Day + i)).toDF("id", "ts")
    def filesIn(day: String) =
      new java.io.File(dir, s"p_day=$day").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    val day0 = TimePartitioned.dayOfNanos(d0)
    // appended waves over 4 days → the day fragments past the target
    TimePartitioned.write(rows(0, 400), dir, "ts", filesPerDay = 4)
    val wave1 = filesIn(day0)
    TimePartitioned.append(rows(0, 400)
      .select((col("id") + 1000).as("id"), col("ts")), dir, "ts", filesPerDay = 4)
    TimePartitioned.append(rows(0, 400)
      .select((col("id") + 2000).as("id"), col("ts")), dir, "ts", filesPerDay = 4)
    assert(filesIn(day0) == 3 * wave1 && filesIn(day0) > 2,
      s"appends fragment the day: wave=$wave1, now=${filesIn(day0)}")
    val before = spark.read.parquet(dir).drop("p_day").as[(Long, Long)].collect().toSet
    // compact days 0-2 (cutoff mid-day 3 keeps day 3 untouched)
    val day3Files = filesIn(TimePartitioned.dayOfNanos(d0 + 3 * Day))
    val compacted = TimePartitioned.compactDaysBefore(spark, dir, d0 + 3 * Day + 5L,
      filesPerDay = 2)
    assert(compacted.size == 3, compacted.toString)
    assert(filesIn(day0) == 2, s"day 0 compacted to 2, got ${filesIn(day0)}")
    assert(filesIn(TimePartitioned.dayOfNanos(d0 + 3 * Day)) == day3Files,
      "the open day is never touched")
    assert(spark.read.parquet(dir).drop("p_day").as[(Long, Long)].collect().toSet
      == before, "compaction is row-identical")
    // idempotent: already-compact days skip
    assert(TimePartitioned.compactDaysBefore(spark, dir, d0 + 3 * Day, 2).isEmpty)
    // CRASH RECOVERY — shelved day with a complete stage rolls FORWARD
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dayP  = new org.apache.hadoop.fs.Path(dir, s"p_day=$day0")
    val stage = new org.apache.hadoop.fs.Path(dir, s".compact_p_day=$day0.__tmp")
    val shelf = new org.apache.hadoop.fs.Path(dir, s".shelf_p_day=$day0.__old")
    spark.read.parquet(dayP.toString).repartition(1).write.parquet(stage.toString)
    assert(fs.rename(dayP, shelf)) // simulate crash between shelve and publish
    // a racing reader between shelve and recovery must NOT double-read
    assert(!spark.read.parquet(dir).columns.isEmpty)
    TimePartitioned.compactDaysBefore(spark, dir, d0 + 3 * Day, 2) // recovers first
    assert(filesIn(day0) == 1, "rolled forward to the staged layout")
    assert(!fs.exists(shelf) && !fs.exists(stage))
    // shelved day with NO stage rolls BACK
    assert(fs.rename(dayP, shelf))
    TimePartitioned.compactDaysBefore(spark, dir, d0 + 3 * Day, 2)
    assert(fs.exists(dayP) && !fs.exists(shelf), "rolled back to the original day")
    assert(spark.read.parquet(dir).drop("p_day").as[(Long, Long)].collect().toSet
      == before, "recovery preserves every row")
  }

  test("day-table INSERT OVERWRITE is staged: _props never deleted, crash leftovers recover") {
    import spark.implicits._
    val d0 = 19724L * Day
    (0L until 100L).map(i => (i, d0 + (i / 25L) * Day + i)).toDF("id", "ts")
      .createOrReplaceTempView("day_ow_src")
    val dir = java.nio.file.Files.createTempDirectory("graft_day_ow").toString + "/t"
    graft.catalog.GraftCatalog.register("day_ow", dir)
    spark.sql("CREATE TABLE graft.day_ow PARTITIONED BY (days(ts)) " +
      "AS SELECT id, ts FROM day_ow_src")
    // simulate a previous overwrite's crash-before-swap leftover: a
    // populated stage subdir. Reads must ignore it (hidden-path filter)…
    val stage = new java.io.File(dir, "_overwrite_stage/p_day=2024-01-01")
    (900L to 909L).map(i => (i, d0)).toDF("id", "ts").coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    assert(spark.sql("SELECT count(*) AS n FROM graft.day_ow").head.getLong(0) == 100L,
      "a crash leftover stage dir must not leak into reads")
    // …and the table still resolves as day-partitioned with its managed
    // flag intact at every point of the staged protocol (the _props file
    // is never deleted, unlike the old wipe-then-re-assert)
    assert(TimePartitioned.dayColumnOf(dir).contains("ts"))
    // the next overwrite clears the leftover and publishes atomically per
    // day directory
    spark.sql("INSERT OVERWRITE graft.day_ow SELECT id + 10, ts FROM day_ow_src")
    assert(!new java.io.File(dir, "_overwrite_stage").exists(),
      "overwrite must clean a previous crash's stage leftover")
    assert(spark.sql("SELECT count(*) AS n FROM graft.day_ow").head.getLong(0) == 100L)
    assert(spark.sql("SELECT min(id) AS m FROM graft.day_ow").head.getLong(0) == 10L)
    assert(TimePartitioned.dayColumnOf(dir).contains("ts"))
    // managed-ness survived the overwrite: DROP still owns and deletes
    spark.sql("DROP TABLE graft.day_ow")
    assert(!new java.io.File(dir).exists(),
      "managed flag must survive INSERT OVERWRITE so DROP deletes data")
  }

  test("day-table overwrite crashed MID-SWAP: reads stay sane, next overwrite converges") {
    import spark.implicits._
    val d0 = 19724L * Day
    (0L until 60L).map(i => (i, d0 + (i / 20L) * Day + i)).toDF("id", "ts")
      .createOrReplaceTempView("day_ms_src")
    val dir = java.nio.file.Files.createTempDirectory("graft_day_mid").toString + "/t"
    graft.catalog.GraftCatalog.register("day_ms", dir)
    spark.sql("CREATE TABLE graft.day_ms PARTITIONED BY (days(ts)) " +
      "AS SELECT id, ts FROM day_ms_src")
    // build the exact mid-swap crash state by hand, INTENT included: the
    // crashed overwrite meant {d0,d1,d2} -> {d0,d1}; day 0 fully swapped
    // (old in trash, new published), day 1 retired-not-reached (old in
    // root, new in stage), day 2 (old-only, to be removed) untouched
    val root = new java.io.File(dir)
    val days = root.listFiles().filter(_.getName.startsWith("p_day="))
      .map(_.getName).sorted
    assert(days.length == 3)
    val stage = new java.io.File(root, "_overwrite_stage")
    val trash = new java.io.File(root, "_overwrite_trash")
    assert(stage.mkdirs() && trash.mkdirs())
    assert(new java.io.File(root, days(0)).renameTo(new java.io.File(trash, days(0))))
    (900L to 902L).map(i => (i, d0 + 5L)).toDF("id", "ts")
      .coalesce(1).write.parquet(new java.io.File(root, days(0)).toString)
    (903L to 904L).map(i => (i, d0 + Day + 5L)).toDF("id", "ts")
      .coalesce(1).write.parquet(new java.io.File(stage, days(1)).toString)
    java.nio.file.Files.writeString(new java.io.File(stage, "_intent").toPath,
      days.mkString(",") + "\n" + Seq(days(0), days(1)).mkString(","))
    // the very FIRST catalog touch heals: loadTable rolls the swap
    // FORWARD from the intent — day 1's staged copy publishes, old-only
    // day 2 is removed, the crashed overwrite completes exactly, and the
    // read serves the intended snapshot (never a hole, never old day 2)
    assert(TimePartitioned.dayColumnOf(dir).contains("ts"))
    val healed = spark.sql("SELECT id FROM graft.day_ms").collect().map(_.getLong(0)).toSet
    assert(healed == Set(900L, 901L, 902L, 903L, 904L),
      s"load-time roll-forward must complete the crashed overwrite, got $healed")
    assert(!stage.exists() && !trash.exists(), "crash leftovers must be cleaned")
    // and appends land on the healed snapshot
    spark.sql(s"INSERT INTO graft.day_ms SELECT CAST(999 AS BIGINT), CAST($d0 AS BIGINT)")
    val after999 = spark.sql("SELECT id FROM graft.day_ms").collect().map(_.getLong(0)).toSet
    assert(after999 == Set(900L, 901L, 902L, 903L, 904L, 999L), s"append after heal: $after999")
    // and a later overwrite still converges to exactly its own snapshot
    spark.sql("INSERT OVERWRITE graft.day_ms SELECT id + 500, ts FROM day_ms_src")
    val after = spark.sql("SELECT id FROM graft.day_ms").collect().map(_.getLong(0)).toSet
    assert(after == (500L until 560L).toSet, s"convergence failed: ${after.size} ids")
    spark.sql("DROP TABLE graft.day_ms")
    assert(!root.exists(), "managed flag must survive the crashed swap")
  }

  test("overwrite clears crashed-compaction shelf: recovery can't resurrect pre-overwrite days") {
    import spark.implicits._
    val d0 = 19724L * Day
    (0L until 60L).map(i => (i, d0 + (i / 20L) * Day + i)).toDF("id", "ts")
      .createOrReplaceTempView("day_sh_src")
    val dir = java.nio.file.Files.createTempDirectory("graft_day_shelf").toString + "/t"
    graft.catalog.GraftCatalog.register("day_sh", dir)
    spark.sql("CREATE TABLE graft.day_sh PARTITIONED BY (days(ts)) " +
      "AS SELECT id, ts FROM day_sh_src")
    // crashed compactDaysBefore, post-shelve no-stage state: day 0 sits
    // shelved (recovery's roll-BACK case — it would restore the day)
    val day0 = TimePartitioned.dayColumnOf(dir); assert(day0.contains("ts"))
    val shelvedDay = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("p_day=")).map(_.getName).min
    assert(new java.io.File(dir, shelvedDay).renameTo(
      new java.io.File(dir, s".shelf_$shelvedDay.__old")))
    // a real crashed compaction always leaves the pending marker (written
    // before the first swap) — it is what the load-time heal probes
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_maint_pending"), "")
    // the overwrite replaces the table wholesale — it must clear the
    // shelf, or the next compaction's recovery resurrects deleted rows
    spark.sql("INSERT OVERWRITE graft.day_sh " +
      s"SELECT id + 100, ts + ${3 * Day} FROM day_sh_src")
    assert(spark.sql("SELECT count(*) AS n FROM graft.day_sh").head.getLong(0) == 60L)
    TimePartitioned.compactDaysBefore(spark, dir, d0 + 100 * Day, filesPerDay = 1)
    val ids = spark.sql("SELECT id FROM graft.day_sh").collect().map(_.getLong(0)).toSet
    assert(ids == (100L until 160L).toSet,
      s"pre-overwrite rows resurrected: ${ids.filter(_ < 100L)}")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".shelf_")))
    // SELF-REFERENTIAL overwrite over a shelved day: `INSERT OVERWRITE t
    // SELECT ... FROM t` must read the shelved day's rows — loadTable
    // ROLLS the crashed compaction swap (restoring the day) before the
    // statement's self-read plans, rather than deleting the shelf
    val shDay2 = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("p_day=")).map(_.getName).min
    assert(new java.io.File(dir, shDay2).renameTo(
      new java.io.File(dir, s".shelf_$shDay2.__old")))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_maint_pending"), "")
    spark.sql("INSERT OVERWRITE graft.day_sh SELECT id, ts FROM graft.day_sh WHERE id % 2 = 0")
    val evens = spark.sql("SELECT id FROM graft.day_sh").collect().map(_.getLong(0)).toSet
    assert(evens == (100L until 160L).filter(_ % 2 == 0).toSet,
      s"shelved day's rows must survive a self-referential overwrite, got ${evens.size} ids")
    spark.sql("DROP TABLE graft.day_sh")
  }

  test("catalog CTAS PARTITIONED BY (days(ts)): hidden layout, pruned reads, INSERT append") {
    import spark.implicits._
    val d0 = 19724L * Day
    (0L until 400L).map(i => (i, d0 + (i / 40L) * Day + i)).toDF("id", "ts")
      .createOrReplaceTempView("day_src")
    val dir = java.nio.file.Files.createTempDirectory("graft_day_cat").toString + "/t"
    graft.catalog.GraftCatalog.register("day_ev", dir)
    spark.sql("CREATE TABLE graft.day_ev PARTITIONED BY (days(ts)) " +
      "AS SELECT id, ts FROM day_src")
    // hidden: the partition column never appears in the table schema
    assert(spark.table("graft.day_ev").columns.toSeq == Seq("id", "ts"))
    // 10 day directories on disk
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("p_day=")) == 10)
    // PRUNED-READ PLAN: a raw-ts range query plans a partition filter the
    // user never wrote, scanning only the window's directories
    val q = spark.sql(s"SELECT id FROM graft.day_ev " +
      s"WHERE ts >= ${d0 + 2 * Day} AND ts < ${d0 + 4 * Day}")
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "p_day")),
      s"no derived p_day partition filter in ${scans.head.partitionFilters}")
    assert(scans.map(_.selectedPartitions.partitionCount).sum == 2,
      "a 2-day window must scan exactly 2 day directories")
    assert(q.collect().map(_.getLong(0)).toSet == (80L until 160L).toSet)
    // INSERT INTO appends into day dirs; the full read sees both writes
    spark.sql(s"INSERT INTO graft.day_ev SELECT id + 1000, ts + ${20 * Day} FROM day_src")
    assert(spark.sql("SELECT count(*) AS n FROM graft.day_ev").head.getLong(0) == 800L)
    // the marker survives INSERT OVERWRITE (which clears the directory)
    spark.sql("INSERT OVERWRITE graft.day_ev SELECT id, ts FROM day_src")
    assert(spark.sql("SELECT count(*) AS n FROM graft.day_ev").head.getLong(0) == 400L)
    assert(TimePartitioned.dayColumnOf(dir).contains("ts"),
      "day marker must be re-asserted after overwrite")
    // restart shape: a cold process resolves the table from the persisted
    // marker alone (cache + pending schema dropped)
    TimePartitioned.invalidateDayColumn(dir)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.day_ev " +
      s"WHERE ts BETWEEN ${d0 + Day} AND ${d0 + 2 * Day}").head.getLong(0) > 0)
    // non-CTAS create: declared schema serves the CREATE → first-INSERT
    // window, the persisted marker takes over after
    graft.catalog.GraftCatalog.register("day_ev2",
      java.nio.file.Files.createTempDirectory("graft_day_cat2").toString + "/t")
    spark.sql("CREATE TABLE graft.day_ev2 (id BIGINT, ts BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO graft.day_ev2 SELECT id, ts FROM day_src")
    assert(spark.sql("SELECT count(*) AS n FROM graft.day_ev2").head.getLong(0) == 400L)
    spark.sql("DROP TABLE graft.day_ev2")

    // non-days transforms still refuse loudly
    graft.catalog.GraftCatalog.register("day_bad",
      java.nio.file.Files.createTempDirectory("graft_day_bad").toString + "/t")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.day_bad (k BIGINT, ts BIGINT) PARTITIONED BY (k)")
    }
    assert(e.getMessage.contains("days"), e.getMessage)
    spark.sql("DROP TABLE graft.day_ev")
    assert(!new java.io.File(dir).exists(), "managed day table drops its data")
  }
}

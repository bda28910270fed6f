package graft

import java.nio.file.Files

import graft.tables.{VersionedStats, VersionedTable}
import org.apache.spark.sql.functions._

class VersionedStatsSpec extends SparkSpec {

  private def corruptPages(dir: String, rels: Iterable[String]): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    rels.foreach { rel =>
      val p = new org.apache.hadoop.fs.Path(dir, rel)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
      val blocks = try reader.getFooter.getBlocks finally reader.close()
      val raf = new java.io.RandomAccessFile(new java.io.File(dir, rel), "rw")
      try blocks.forEach { b =>
        raf.seek(b.getStartingPos)
        raf.write(Array.fill[Byte](b.getCompressedSize.toInt)(0x5a))
      } finally raf.close()
    }
  }

  test("pruned read: only intersecting files scanned (others corrupted); result = full filter") {
    val dir = Files.createTempDirectory("graft_vs").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 800L).select(col("id").as("k"), (col("id") * 3).as("x"))
        .repartitionByRange(8, col("k")).sortWithinPartitions("k"), dir)
    VersionedStats.refresh(spark, dir, Seq("k"))
    val (kept, total) = VersionedStats.prunedFiles(spark, dir,
      Seq(("k", lit(100L), lit(199L))))
    assert(total == 8L && kept.size == 1, s"kept ${kept.size}/$total")
    // corrupt every file OUTSIDE the kept set: the pruned read never plans
    // a scan over them (file-LIST pruning, stronger than row-group stats —
    // their footers are never even opened by the pruned plan)
    corruptPages(dir, VersionedTable.filesOf(dir, 0L).filterNot(kept.contains))
    val got = VersionedStats.readPruned(spark, dir, Seq(("k", lit(100L), lit(199L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (100L until 200L).map(k => (k, k * 3)).toSet)
    // negative control: an unfiltered read must hit the corrupted pages
    intercept[Throwable] { VersionedTable.read(spark, dir).count() }
  }

  test("refreshIncremental is O(new files): base files corrupted, stats still advance") {
    val dir = Files.createTempDirectory("graft_vs2").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 400L).select(col("id").as("k"), col("id").as("x"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"), dir)
    VersionedStats.refresh(spark, dir, Seq("k"))
    VersionedTable.commitAppend(spark,
      spark.range(400L, 500L).select(col("id").as("k"), col("id").as("x"))
        .repartitionByRange(1, col("k")).sortWithinPartitions("k"), dir)
    // base files become unreadable at the PAGE level AFTER the append (the
    // append's schema gate legitimately reads one footer); the incremental
    // stats refresh may read back ONLY the appended batch's fresh files
    corruptPages(dir, VersionedTable.filesOf(dir, 0L))
    val v = VersionedStats.refreshIncremental(spark, dir, Seq("k"))
    assert(v == 1L)
    // stats for v1 cover all 5 files; the pruned read over the FRESH range
    // touches only the new file
    val (kept, total) = VersionedStats.prunedFiles(spark, dir,
      Seq(("k", lit(420L), lit(480L))), Some(1L))
    assert(total == 5L && kept.size == 1)
    assert(VersionedStats.readPruned(spark, dir,
      Seq(("k", lit(420L), lit(480L))), Some(1L)).count() == 61L)
    // time travel: v0's stats manifest is untouched and still 1:1
    assert(VersionedStats.prunedFiles(spark, dir,
      Seq(("k", lit(0L), lit(1000L))), Some(0L))._2 == 4L)
  }

  test("vacuum sweeps dropped versions' stats manifests; retained stats keep working") {
    val dir = Files.createTempDirectory("graft_vs4").toString + "/t"
    (0 until 3).foreach { i =>
      VersionedTable.commitAppend(spark,
        spark.range(i * 100L, (i + 1) * 100L).select(col("id").as("k"), col("id").as("x"))
          .repartitionByRange(1, col("k")), dir)
      VersionedStats.refreshIncremental(spark, dir, Seq("k"))
    }
    assert(VersionedStats.stattedVersions(dir) == Seq(0L, 1L, 2L))
    VersionedTable.vacuum(spark, dir, retainLast = 1, graceMs = 0L)
    assert(VersionedStats.stattedVersions(dir) == Seq(2L))
    assert(VersionedStats.prunedFiles(spark, dir,
      Seq(("k", lit(0L), lit(1000L))), Some(2L))._2 == 3L)
  }

  test("stats/manifest drift fails loudly; unstatted column refused") {
    val dir = Files.createTempDirectory("graft_vs3").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 10L).select(col("id").as("k"), col("id").as("x")), dir)
    VersionedStats.refresh(spark, dir, Seq("k"))
    intercept[IllegalArgumentException] {
      VersionedStats.prunedFiles(spark, dir, Seq(("x", lit(0L), lit(5L))))
    }
    // a new commit without a stats refresh: reading ITS stats must fail
    VersionedTable.commitAppend(spark,
      spark.range(10L, 20L).select(col("id").as("k"), col("id").as("x")), dir)
    intercept[IllegalArgumentException] {
      VersionedStats.prunedFiles(spark, dir, Seq(("k", lit(0L), lit(5L))), Some(1L))
    }
  }

  test("statsOnlyAggregate answers with EVERY data page corrupted; refuses under deletion vectors") {
    val dir = Files.createTempDirectory("graft_vs4").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 100L).select(col("id").as("k"), (col("id") * 3).as("x"))
        .repartition(4), dir)
    VersionedStats.refresh(spark, dir, Seq("k", "x"))
    // zero data I/O, proven physically: trash every data file's pages
    corruptPages(dir, VersionedTable.filesOf(dir, 0L))
    val rows = VersionedStats.statsOnlyAggregate(spark, dir, Seq("k", "x"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("k", 100L, 100L, 0.0, 99.0), ("x", 100L, 100L, 0.0, 297.0)), rows.mkString(","))
    // a real read DOES fail — the aggregate really never touched data
    intercept[Throwable] { VersionedTable.read(spark, dir).count() }
    // masked version: stored physical stats would count deleted rows — refuse
    val dir2 = Files.createTempDirectory("graft_vs5").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 50L).select(col("id").as("k"), col("id").as("x")), dir2)
    VersionedTable.commitDeleteDV(spark, dir2, col("k") < 10L)
    VersionedStats.refresh(spark, dir2, Seq("k"))
    val e = intercept[IllegalArgumentException] {
      VersionedStats.statsOnlyAggregate(spark, dir2, Seq("k"))
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
  }

  test("stats survive RENAME COLUMN: physical-keyed manifest, logical-name reads") {
    val dir = Files.createTempDirectory("graft_vs6").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 800L).select(col("id").as("k"), (col("id") * 3).as("x"))
        .repartitionByRange(8, col("k")).sortWithinPartitions("k"), dir)
    VersionedStats.refresh(spark, dir, Seq("k", "x"))          // statted pre-rename
    VersionedTable.commitRenameColumn(spark, dir, "k", "key")  // v1: metadata only
    // the OLD manifest (v0, physical-keyed) is not v1's — refreshIncremental
    // carries it forward at O(new files): zero new files here, zero read-back
    VersionedStats.refreshIncremental(spark, dir, Seq("key", "x"))
    // metadata-only aggregate answers under the NEW logical name
    val rows = VersionedStats.statsOnlyAggregate(spark, dir, Seq("key", "x"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("key", 800L, 0.0, 799.0), ("x", 800L, 0.0, 2397.0)), rows.mkString(","))
    // skipping-prune under the new name: only the intersecting file scans
    // (every other file's pages corrupted — their footers never open)
    val (kept, total) = VersionedStats.prunedFiles(spark, dir,
      Seq(("key", lit(100L), lit(199L))))
    assert(total == 8L && kept.size == 1, s"kept ${kept.size}/$total")
    corruptPages(dir, VersionedTable.filesOf(dir, 1L).filterNot(kept.contains))
    val got = VersionedStats.readPruned(spark, dir, Seq(("key", lit(100L), lit(199L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (100L until 200L).map(k => (k, k * 3)).toSet)
    // the OLD name no longer resolves — loud, with the live names listed
    val e = intercept[RuntimeException] {
      VersionedStats.statsOnlyAggregate(spark, dir, Seq("k"))
    }
    assert(e.getMessage.contains("not in version"), e.getMessage)
  }

  test("stats after DROP + re-ADD: fresh physical name forces re-key, never stale answers") {
    val dir = Files.createTempDirectory("graft_vs7").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 100L).select(col("id").as("k"), (col("id") * 3).as("x")), dir)
    VersionedStats.refresh(spark, dir, Seq("k", "x"))
    VersionedTable.commitDropColumn(spark, dir, "x")            // v1: x tombstoned
    VersionedTable.commitAddColumn(spark, dir, "x",
      org.apache.spark.sql.types.LongType)                      // v2: fresh physical name
    // the re-added x is all-null; its stats must NOT come from the dropped
    // column's old values — the fresh physical key misses the old manifest,
    // so refreshIncremental re-keys and the aggregate answers 0 non-nulls
    VersionedStats.refreshIncremental(spark, dir, Seq("k", "x"))
    val row = VersionedStats.statsOnlyAggregate(spark, dir, Seq("x")).head
    assert(row.getLong(1) == 100L && row.getLong(2) == 0L,
      s"re-added column must read 0 non-nulls, got $row")
  }

  test("refresh over mixed pre/post-ADD-COLUMN files reads the new column's values") {
    val dir = Files.createTempDirectory("graft_vs8").toString + "/t"
    // many pre-evolution files: a schema-less parquet read samples ONE
    // (lexicographically-first, i.e. random-UUID-order) footer, so with 8
    // old files vs 1 new the sample would almost surely predate the ADD
    // COLUMN and project x away for every file — the stats read must
    // instead pin the declared physical schema so x is read wherever it
    // exists and null-fills per file where it doesn't
    VersionedTable.commitAppend(spark,
      spark.range(0L, 400L).select(col("id").as("k")).repartition(8), dir)
    VersionedTable.commitAddColumn(spark, dir, "x",
      org.apache.spark.sql.types.LongType)
    VersionedTable.commitAppend(spark,
      spark.range(400L, 500L).select(col("id").as("k"), (col("id") * 2L).as("x"))
        .repartition(1), dir)
    VersionedStats.refresh(spark, dir, Seq("k", "x"))
    val byCol = VersionedStats.statsOnlyAggregate(spark, dir, Seq("k", "x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(byCol("k") == ((500L, 500L, Some(0.0), Some(499.0))), byCol("k"))
    // x holds real values in exactly the 100 post-evolution rows; the old
    // code nondeterministically recorded (500, 0, None, None) here
    assert(byCol("x") == ((500L, 100L, Some(800.0), Some(998.0))), byCol("x"))
    // and file-list pruning on x keeps only the post-evolution file
    val (kept, total) = VersionedStats.prunedFiles(spark, dir,
      Seq(("x", lit(800L), lit(998L))))
    assert(total == 9L && kept.size == 1, s"kept ${kept.size}/$total")
  }
}

package graft

import java.nio.file.Files

import graft.tables.{MaterializedAgg, VersionedTable}
import org.apache.spark.sql.functions._

class MaterializedAggSpec extends SparkSpec {

  private def dirs() = {
    val root = Files.createTempDirectory("graft_mv").toString
    (root + "/src", root + "/view")
  }

  private def stateOf(view: String, v: Option[Long] = None) =
    MaterializedAgg.read(spark, view, v).collect()
      .map(r => (Option(r.get(0)), r.getLong(1), Option(r.get(2)))).toSet

  test("refresh after mixed commits equals full recompute; group-moves handled") {
    import spark.implicits._
    val (src, view) = dirs()
    val base = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L), (4L, "g2", 40L))
      .toDF("k", "g", "x")
    VersionedTable.commit(spark, base, src)
    MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"))
    assert(stateOf(view) == Set(
      (Some("g1"), 2L, Some(30L)), (Some("g2"), 2L, Some(70L))))
    // append a new group, move k=1 from g1 to g2, delete k=4, no-op update k=2
    VersionedTable.commitAppend(spark, Seq((5L, "g3", 50L)).toDF("k", "g", "x"), src)
    VersionedTable.commitUpdate(spark, src, col("k") === 1L, Map("g" -> lit("g2")))
    VersionedTable.commitDelete(spark, src, col("k") === 4L)
    VersionedTable.commitUpdate(spark, src, col("k") === 2L, Map("x" -> col("x")))
    MaterializedAgg.refresh(spark, view)
    val expected = VersionedTable.read(spark, src)
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1), Option(r.get(2)))).toSet
    assert(stateOf(view) == expected, s"${stateOf(view)} vs $expected")
    assert(stateOf(view) == Set(
      (Some("g1"), 1L, Some(20L)), (Some("g2"), 2L, Some(40L)), (Some("g3"), 1L, Some(50L))))
  }

  test("refresh is O(changed files): corrupted shared source files never read") {
    import spark.implicits._
    val (src, view) = dirs()
    val base = spark.range(0L, 400L).select(col("id").as("k"),
      pmod(col("id"), lit(10L)).as("g"), (col("id") * 2).as("x"))
      .repartitionByRange(4, col("k"))
    VersionedTable.commitAppend(spark, base, src)
    MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"))
    VersionedTable.commitUpdate(spark, src, col("k") === 7L, Map("x" -> lit(1000000L)))
    // corrupt the files shared between v0 and v1 (the 3 untouched files)
    val logLines = graft.tables.VersionedTable.log(src)
      .map { case (v, _) => graft.tables.VersionedTable.filesOf(src, v).toSet }
    val shared = logLines(0).intersect(logLines(1))
    assert(shared.size == 3, s"expected 3 shared files, got ${shared.size}")
    shared.foreach { rel =>
      java.nio.file.Files.write(java.nio.file.Paths.get(src, rel), Array.fill[Byte](64)(0x5a))
    }
    MaterializedAgg.refresh(spark, view)
    val g7 = stateOf(view).find(_._1.contains(7L)).get
    assert(g7 == (Some(7L), 40L, Some(1000000L + (7L until 400L by 10L).map(_ * 2).sum - 14L)),
      g7.toString)
    // a full recompute over the source WOULD have to read the corrupted files
    intercept[Throwable] { VersionedTable.read(spark, src).count() }
  }

  test("no-op refresh returns the current version without a new commit") {
    import spark.implicits._
    val (src, view) = dirs()
    VersionedTable.commit(spark, Seq((1L, "g", 1L)).toDF("k", "g", "x"), src)
    val v0 = MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"))
    assert(MaterializedAgg.refresh(spark, view) == v0)
    assert(VersionedTable.latestVersion(view).contains(v0))
  }

  test("view time travel: each refresh is a readable version") {
    import spark.implicits._
    val (src, view) = dirs()
    VersionedTable.commit(spark, Seq((1L, "g", 1L)).toDF("k", "g", "x"), src)
    val v0 = MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"))
    VersionedTable.commitAppend(spark, Seq((2L, "g", 9L)).toDF("k", "g", "x"), src)
    val v1 = MaterializedAgg.refresh(spark, view)
    assert(v1 != v0)
    assert(stateOf(view, Some(v0)) == Set((Some("g"), 1L, Some(1L))))
    assert(stateOf(view, Some(v1)) == Set((Some("g"), 2L, Some(10L))))
  }

  test("SQL NULL semantics: all-null group sums NULL; null group key is a group") {
    import spark.implicits._
    val (src, view) = dirs()
    val df = Seq[(Long, Option[String], Option[Long])](
      (1L, Some("g1"), None), (2L, Some("g1"), None), (3L, None, Some(5L)))
      .toDF("k", "g", "x")
    VersionedTable.commit(spark, df, src)
    MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"))
    assert(stateOf(view) == Set((Some("g1"), 2L, None), (None, 1L, Some(5L))))
    // deleting the only non-null row of a group flips its sum to NULL
    VersionedTable.commitAppend(spark, Seq((4L, "g1", 7L)).toDF("k", "g", "x")
      .select(col("k"), col("g"), col("x").cast("long")), src)
    MaterializedAgg.refresh(spark, view)
    assert(stateOf(view).contains((Some("g1"), 3L, Some(7L))))
    VersionedTable.commitDelete(spark, src, col("k") === 4L)
    MaterializedAgg.refresh(spark, view)
    assert(stateOf(view) == Set((Some("g1"), 2L, None), (None, 1L, Some(5L))))
  }

  private def mmState(view: String) =
    MaterializedAgg.read(spark, view).collect()
      .map(r => (Option(r.get(0)), r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).toSet

  private def mmRecompute(src: String) =
    VersionedTable.read(spark, src)
      .groupBy("g").agg(count(lit(1)), sum("x"), min("x"), max("x"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).toSet

  test("hybrid MIN/MAX: clean inserts, dirty rescans, group moves, null keys/values ≡ recompute") {
    import spark.implicits._
    val (src, view) = dirs()
    val base = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L), (4L, "g2", 40L))
      .toDF("k", "g", "x")
    VersionedTable.commit(spark, base, src)
    MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"), Seq("x"))
    assert(mmState(view) == Set(
      (Some("g1"), 2L, Some(30L), Some(10L), Some(20L)),
      (Some("g2"), 2L, Some(70L), Some(30L), Some(40L))))
    // CLEAN path: inserts only — g3 new group, g1 gains a new minimum
    VersionedTable.commitAppend(spark,
      Seq((5L, "g3", 50L), (6L, "g1", 5L)).toDF("k", "g", "x"), src)
    MaterializedAgg.refresh(spark, view)
    assert(mmState(view) == mmRecompute(src))
    assert(mmState(view).contains((Some("g1"), 3L, Some(35L), Some(5L), Some(20L))))
    // DIRTY path: delete g1's minimum; update retracts g2's maximum (40→15,
    // which also becomes g2's new minimum through the same rescan)
    VersionedTable.commitDelete(spark, src, col("k") === 6L)
    VersionedTable.commitUpdate(spark, src, col("k") === 4L, Map("x" -> lit(15L)))
    MaterializedAgg.refresh(spark, view)
    assert(mmState(view) == mmRecompute(src))
    assert(mmState(view).contains((Some("g1"), 2L, Some(30L), Some(10L), Some(20L))))
    assert(mmState(view).contains((Some("g2"), 2L, Some(45L), Some(15L), Some(30L))))
    // group vanish + group move + NULL value (never dirties, never counts)
    VersionedTable.commitDelete(spark, src, col("g") === "g3")
    VersionedTable.commitUpdate(spark, src, col("k") === 3L, Map("g" -> lit("g1")))
    VersionedTable.commitAppend(spark, Seq((7L, Some("g1"), Option.empty[Long]))
      .toDF("k", "g", "x"), src)
    MaterializedAgg.refresh(spark, view)
    assert(mmState(view) == mmRecompute(src))
    assert(!mmState(view).exists(_._1.contains("g3")))
    // NULL group key: its min retracted → dirty rescan through an IS NULL leg
    VersionedTable.commitAppend(spark,
      Seq((8L, Option.empty[String], Some(3L)), (9L, Option.empty[String], Some(9L)))
        .toDF("k", "g", "x"), src)
    MaterializedAgg.refresh(spark, view)
    VersionedTable.commitDelete(spark, src, col("k") === 8L)
    MaterializedAgg.refresh(spark, view)
    assert(mmState(view) == mmRecompute(src))
    assert(mmState(view).contains((None, 1L, Some(9L), Some(9L), Some(9L))))
    // all-NULL group stores NULL extrema
    VersionedTable.commitAppend(spark, Seq((10L, Some("gn"), Option.empty[Long]))
      .toDF("k", "g", "x"), src)
    MaterializedAgg.refresh(spark, view)
    assert(mmState(view).contains((Some("gn"), 1L, None, None, None)))
  }

  test("dirty rescan reads ONLY the dirty groups' files: others corrupted, refresh still answers") {
    val (src, view) = dirs()
    // 4 whole-group files (range-clustered on g) so parquet row-group stats
    // discriminate: the rescan's pushed-down IN(g) must skip groups 1-3
    val base = spark.range(0L, 400L).select(col("id").as("k"),
      pmod(col("id"), lit(4L)).as("g"), (col("id") * 2).as("x"))
      .repartitionByRange(4, col("g"))
    VersionedTable.commitAppend(spark, base, src)
    MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"), Seq("x"))
    // delete group 0's minimum (k=0, x=0) → rewrites only group 0's file,
    // dirties only group 0
    VersionedTable.commitDelete(spark, src, col("k") === 0L)
    // corrupt the DATA PAGES (row-group byte ranges, from the footer's block
    // metadata) of every file shared between v0 and v1 — the three files
    // holding groups 1-3. Footers stay valid, so stats-based skipping still
    // plans; any actual page read now throws.
    val logLines = graft.tables.VersionedTable.log(src)
      .map { case (v, _) => graft.tables.VersionedTable.filesOf(src, v).toSet }
    val shared = logLines(0).intersect(logLines(1))
    assert(shared.size == 3, s"expected 3 shared files, got ${shared.size}")
    val hconf = spark.sparkContext.hadoopConfiguration
    shared.foreach { rel =>
      val p = new org.apache.hadoop.fs.Path(src, rel)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
      val blocks = try reader.getFooter.getBlocks finally reader.close()
      val raf = new java.io.RandomAccessFile(new java.io.File(src, rel), "rw")
      try blocks.forEach { b =>
        raf.seek(b.getStartingPos)
        raf.write(Array.fill[Byte](b.getCompressedSize.toInt)(0x5a))
      } finally raf.close()
    }
    MaterializedAgg.refresh(spark, view)
    val g0 = mmState(view).find(_._1.contains(0L)).get
    assert(g0 == (Some(0L), 99L, Some((4L until 400L by 4L).map(_ * 2).sum),
      Some(8L), Some(792L)), g0.toString)
    // untouched groups' extrema survive untouched (their files were never read)
    assert(mmState(view).find(_._1.contains(1L)).get ==
      (Some(1L), 100L, Some((1L until 400L by 4L).map(_ * 2).sum), Some(2L), Some(794L)))
    // a full recompute WOULD have to read the corrupted pages
    intercept[Throwable] { VersionedTable.read(spark, src).agg(min("x")).collect() }
  }

  test("refresh across a compaction: dataChange=false step skipped, state ≡ recompute") {
    import spark.implicits._
    val (src, view) = dirs()
    val base = spark.range(0L, 300L).select(col("id").as("k"),
      pmod(col("id"), lit(3L)).as("g"), col("id").as("x")).repartition(6)
    VersionedTable.commitAppend(spark, base, src)
    MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"), Seq("x"))
    // the table compacts (pure re-layout) and then takes a real update;
    // the refresh must fold ONLY the update — a feed that compared the
    // old layout against the new would retract and re-assert all 300 rows
    VersionedTable.commitCompact(spark, src, targetFiles = 2, clusterBy = Seq("k"))
    VersionedTable.commitUpdate(spark, src, col("k") === 5L, Map("x" -> lit(1000L)))
    MaterializedAgg.refresh(spark, view)
    assert(mmState(view) == mmRecompute(src))
    assert(mmState(view).find(_._1.contains(2L)).get._4 == Some(2L)) // g2 min untouched
  }

  test("float sum columns are refused loudly; decimal is the suggested path") {
    import spark.implicits._
    val (src, view) = dirs()
    VersionedTable.commit(spark, Seq((1L, "g", 1.5)).toDF("k", "g", "x"), src)
    val e = intercept[RuntimeException] {
      MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"))
    }
    assert(e.getMessage.contains("non-exact"), e.getMessage)
  }

  test("decimal sums: exact across refreshes, group emptied by deletes vanishes") {
    import spark.implicits._
    val (src, view) = dirs()
    val dec = Seq((1L, "a", "10.25"), (2L, "a", "0.75"), (3L, "b", "99.99"))
      .toDF("k", "g", "x").select(col("k"), col("g"), col("x").cast("decimal(18,2)").as("x"))
    VersionedTable.commit(spark, dec, src)
    MaterializedAgg.create(spark, src, view, Seq("k"), Seq("g"), Seq("x"))
    VersionedTable.commitDelete(spark, src, col("g") === "b")
    VersionedTable.commitUpdate(spark, src, col("k") === 1L,
      Map("x" -> (col("x") + 1).cast("decimal(18,2)")))
    MaterializedAgg.refresh(spark, view)
    val st = MaterializedAgg.read(spark, view).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSet
    assert(st == Set(("a", 2L, "12.00")), st.toString)
  }
}

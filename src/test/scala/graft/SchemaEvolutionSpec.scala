package graft

import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** Additive schema evolution on append (commitAppendEvolve): O(change) —
  * only the new rows' files are written, old files stay narrow on disk and
  * read through the DECLARED schema with nulls for the added columns.
  * Evolution is versioned like data: time travel below the evolving commit
  * reads the narrow schema; restore pins the target's schema; clones carry
  * it; DML over the mixed-width manifest stays correct. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def dirOf() =
    java.nio.file.Files.createTempDirectory("graft_evo").toString + "/t"

  private def mkEvolved(): String = {
    val dir = dirOf()
    VersionedTable.commitAppend(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "x"), dir)               // v0 narrow
    VersionedTable.commitAppendEvolve(spark,
      Seq((3L, 30L, "gold"), (4L, 40L, "tin")).toDF("k", "x", "tier"), dir) // v1 wide
    dir
  }

  test("evolve-append widens the schema; old rows read null in the new column; old files untouched") {
    val dir = mkEvolved()
    val got = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set((1L, 10L, None), (2L, 20L, None),
      (3L, 30L, Some("gold")), (4L, 40L, Some("tin"))), got.toString)
    // O(change): v0's file is SHARED into v1 (not rewritten)
    assert(VersionedTable.filesOf(dir, 0L).toSet.subsetOf(VersionedTable.filesOf(dir, 1L).toSet))
    // time travel below the evolution reads the NARROW schema
    assert(VersionedTable.read(spark, dir, Some(0L)).columns.toSeq == Seq("k", "x"))
  }

  test("plain append after evolution gates on the declared schema, not a narrow footer") {
    val dir = mkEvolved()
    // full-width append passes (even though v0's footer is narrow)
    VersionedTable.commitAppend(spark, Seq((5L, 50L, "iron")).toDF("k", "x", "tier"), dir)
    assert(VersionedTable.read(spark, dir).count() == 5)
    // narrow append is refused: evolution is explicit, not inferred
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, Seq((6L, 60L)).toDF("k", "x"), dir)
    }
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
  }

  test("non-additive evolution (type change, drop) is refused") {
    val dir = mkEvolved()
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.commitAppendEvolve(spark,
        Seq((7L, "not-a-long", "x")).toDF("k", "x", "tier"), dir)
    }
    assert(e1.getMessage.contains("not additive"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.commitAppendEvolve(spark, Seq((7L, "solo")).toDF("k", "tier"), dir)
    }
    assert(e2.getMessage.contains("missing"), e2.getMessage)
  }

  test("DML over the mixed-width manifest: update, DV delete, merge, compact all see the declared schema") {
    val dir = mkEvolved()
    // CoW update touching a NARROW file: the rewrite materializes the wide
    // schema for that file (null tier), other files shared
    VersionedTable.commitUpdate(spark, dir, col("k") === 1L,
      Map("tier" -> lit("retro")))
    // DV delete against the wide scan
    VersionedTable.commitDeleteDV(spark, dir, col("k") === 4L)
    // merge: update an existing wide row + insert
    VersionedTable.commitMerge(spark, dir,
      Seq((3L, 300L, "gold2"), (9L, 90L, "new")).toDF("k", "x", "tier"), Seq("k"))
    val got = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set((1L, 10L, Some("retro")), (2L, 20L, None),
      (3L, 300L, Some("gold2")), (9L, 90L, Some("new"))), got.toString)
    // compaction materializes everything wide; reads unchanged
    VersionedTable.commitCompact(spark, dir, targetFiles = 1)
    val after = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(after == got)
  }

  test("restore below the evolution pins the narrow schema; clone carries the wide one") {
    val dir = mkEvolved()
    val vr = VersionedTable.commitRestore(spark, dir, 0L)
    val restored = VersionedTable.read(spark, dir, Some(vr))
    assert(restored.columns.toSeq == Seq("k", "x"),
      s"restored schema must be the target's: ${restored.columns.toSeq}")
    assert(restored.count() == 2)
    // restore FORWARD to the wide version again: wide schema pinned back
    val vf = VersionedTable.commitRestore(spark, dir, 1L)
    assert(VersionedTable.read(spark, dir, Some(vf)).columns.toSeq == Seq("k", "x", "tier"))
    // clone of the wide version reads wide, including the narrow file's nulls
    val cdir = dirOf()
    VersionedTable.cloneShallow(spark, dir, cdir, version = Some(1L))
    val cl = VersionedTable.read(spark, cdir)
    assert(cl.columns.toSeq == Seq("k", "x", "tier"))
    assert(cl.where(col("tier").isNull).count() == 2)
  }

  test("change feed across the evolution: requested common columns stay correct") {
    val dir = mkEvolved()
    val feed = VersionedTable.changes(spark, dir, 0L, 1L, Seq("k"), Seq("x"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(feed == Set((3L, "added"), (4L, "added")), feed.toString)
  }
}

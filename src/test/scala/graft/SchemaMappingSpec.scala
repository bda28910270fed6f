package graft

import java.nio.file.Files

import graft.tables.{Constraints, TableSql, VersionedTable}
import org.apache.spark.sql.functions._

/** Column RENAME/DROP via column mapping (round 11): metadata-only commits
  * — zero data files rewritten, logical names resolved per version (time
  * travel below a rename sees the old name), physical names immutable, and
  * dropped columns tombstoned so a re-added name never resurrects old
  * values. Mirrors Delta's column-mapping mode at name grain (the
  * reference's ecosystem feature; `VersionedTable.scala` PhysicalNameKey).
  */
class SchemaMappingSpec extends SparkSpec {

  private def dirOf() = Files.createTempDirectory("graft_map").toString + "/t"

  private def dataFiles(dir: String): Set[String] = {
    val dd = new java.io.File(s"$dir/data")
    if (!dd.exists) Set.empty
    else dd.listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  test("rename is metadata-only; reads map; time travel below sees the old name") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commitAppend(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal"), dir)          // v0
    val before = dataFiles(dir)
    val v1 = VersionedTable.commitRenameColumn(spark, dir, "bal", "balance")
    assert(v1 == 1L)
    assert(dataFiles(dir) == before, "rename must not touch a single data file")
    assert(VersionedTable.read(spark, dir).columns.toSeq == Seq("k", "balance"))
    assert(VersionedTable.read(spark, dir).where(col("k") === 1L)
      .select("balance").head().getDouble(0) == 10.0)
    // time travel below the rename: the OLD name (mapping is versioned)
    assert(VersionedTable.read(spark, dir, Some(0L)).columns.toSeq == Seq("k", "bal"))
    // appends under the NEW logical name; old name refused
    VersionedTable.commitAppend(spark, Seq((3L, 30.0)).toDF("k", "balance"), dir)
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, Seq((4L, 40.0)).toDF("k", "bal"), dir)
    }
    // copy-on-write UPDATE through the mapping; chained rename keeps working
    VersionedTable.commitUpdate(spark, dir, col("k") === 2L,
      Map("balance" -> (col("balance") + 1.0)))
    VersionedTable.commitRenameColumn(spark, dir, "balance", "bal2")
    val out = VersionedTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 10.0), (2L, 21.0), (3L, 30.0)), out.toString)
    assert(VersionedTable.read(spark, dir).columns.toSeq == Seq("k", "bal2"))
  }

  test("rename + deletion-vector delete keyed on the renamed column") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commitAppend(spark,
      (1L to 10L).map(i => (i, i * 1.0)).toDF("k", "bal"), dir)
    VersionedTable.commitRenameColumn(spark, dir, "bal", "balance")
    VersionedTable.commitDeleteDV(spark, dir, col("balance") > 8.0)
    val ks = VersionedTable.read(spark, dir).select("k").collect().map(_.getLong(0)).toSet
    assert(ks == (1L to 8L).toSet, ks.toString)
  }

  test("drop is metadata-only; tombstone prevents resurrection on re-add") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commitAppend(spark,
      Seq((1L, 10.0, "m1"), (2L, 20.0, "m2")).toDF("k", "bal", "seg"), dir) // v0
    val before = dataFiles(dir)
    VersionedTable.commitDropColumn(spark, dir, "seg")                      // v1
    assert(dataFiles(dir) == before, "drop must not touch a single data file")
    assert(VersionedTable.read(spark, dir).columns.toSeq == Seq("k", "bal"))
    // time travel below the drop still reads the column
    assert(VersionedTable.read(spark, dir, Some(0L)).columns.toSeq == Seq("k", "bal", "seg"))
    // append in the narrowed schema
    VersionedTable.commitAppend(spark, Seq((3L, 30.0)).toDF("k", "bal"), dir) // v2
    // evolve RE-ADDS `seg`: v0's physical seg values (m1, m2) must NOT
    // resurrect — old rows read NULL, only the new batch carries values
    VersionedTable.commitAppendEvolve(spark,
      Seq((4L, 40.0, "fresh")).toDF("k", "bal", "seg"), dir)                 // v3
    val out = VersionedTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.toString))).toSeq
    assert(out == Seq((1L, None), (2L, None), (3L, None), (4L, Some("fresh"))),
      s"dropped values must not resurrect: $out")
  }

  test("re-adding a renamed-AWAY name gets a fresh physical column too") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commitAppend(spark, Seq((1L, 5.0)).toDF("k", "bal"), dir)
    VersionedTable.commitRenameColumn(spark, dir, "bal", "balance")
    // new logical `bal` collides with the LIVE physical name behind
    // `balance` — it must get a fresh physical name, and v0's 5.0 must
    // surface only under `balance`, never under the new `bal`
    VersionedTable.commitAppendEvolve(spark,
      Seq((2L, 6.0, 99.0)).toDF("k", "balance", "bal"), dir)
    val rows = VersionedTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows == Seq((1L, 5.0, None), (2L, 6.0, Some(99.0))), rows.toString)
  }

  test("SQL verbs: ALTER TABLE RENAME/DROP COLUMN; SELECT resolves the mapping") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commitAppend(spark,
      Seq((1L, 10.0, "x"), (2L, 20.0, "y")).toDF("k", "bal", "tag"), dir)
    val cat = Map("tt" -> dir)
    val r1 = TableSql.execute(spark, cat, "ALTER TABLE tt RENAME COLUMN bal TO balance")
    assert(r1.head().getString(0) == "RENAME COLUMN")
    TableSql.execute(spark, cat, "ALTER TABLE tt DROP COLUMN tag")
    val out = TableSql.execute(spark, cat,
      "SELECT k, balance FROM tt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 10.0), (2L, 20.0)))
    // pre-rename time travel through SQL sees the old name
    val old = TableSql.execute(spark, cat,
      "SELECT k, bal, tag FROM tt VERSION AS OF 0 ORDER BY k")
    assert(old.columns.toSeq == Seq("k", "bal", "tag"))
    assert(old.count() == 2L)
    // history records the metadata-only operations
    val hist = VersionedTable.history(spark, dir).orderBy("version").collect()
      .map(_.getString(2)).toSeq
    assert(hist == Seq("APPEND", "RENAME COLUMN bal TO balance", "DROP COLUMN tag"))
  }

  test("rename/drop refused while a CHECK constraint references the column") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commitAppend(spark, Seq((1L, 10.0)).toDF("k", "bal"), dir)
    Constraints.add(spark, dir, "bal_pos", "bal >= 0")
    val ex = intercept[IllegalArgumentException] {
      VersionedTable.commitRenameColumn(spark, dir, "bal", "balance")
    }
    assert(ex.getMessage.contains("bal_pos"), ex.getMessage)
    intercept[IllegalArgumentException] {
      VersionedTable.commitDropColumn(spark, dir, "bal")
    }
    // a column the constraint does NOT mention renames fine (word-boundary
    // match: `k` must not trip on constraints mentioning... nothing here)
    VersionedTable.commitRenameColumn(spark, dir, "k", "key")
    // and constraints still enforce through the mapping on appends
    intercept[graft.tables.Constraints.ConstraintViolation] {
      VersionedTable.commitAppend(spark, Seq((2L, -5.0)).toDF("key", "bal"), dir)
    }
    VersionedTable.commitAppend(spark, Seq((3L, 5.0)).toDF("key", "bal"), dir)
    assert(VersionedTable.read(spark, dir).count() == 2L)
  }

  test("merge and compact through the mapping; clone carries mapping and tombstones") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commitAppend(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal"), dir)
    VersionedTable.commitRenameColumn(spark, dir, "bal", "balance")
    VersionedTable.commitMerge(spark, dir,
      Seq((2L, 99.0), (5L, 50.0)).toDF("k", "balance"), Seq("k"))
    VersionedTable.commitCompact(spark, dir, targetFiles = 1)
    val out = VersionedTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 10.0), (2L, 99.0), (5L, 50.0)), out.toString)
    // shallow clone: mapping rides along
    val dst = Files.createTempDirectory("graft_map_cl").toString + "/c"
    VersionedTable.cloneShallow(spark, dir, dst)
    assert(VersionedTable.read(spark, dst).columns.toSeq == Seq("k", "balance"))
    assert(VersionedTable.read(spark, dst).count() == 3L)
  }
}

package graft

import java.nio.file.Files

import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpec {

  private def dirOf() = Files.createTempDirectory("graft_vt").toString + "/t"

  test("commit/read/time-travel: every retained version readable, latest by default") {
    import spark.implicits._
    val dir = dirOf()
    val v0 = VersionedTable.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val v1 = VersionedTable.commit(spark, Seq((1L, "a2"), (3L, "c")).toDF("id", "s"), dir)
    val v2 = VersionedTable.commit(spark, Seq((9L, "z")).toDF("id", "s"), dir)
    assert(Seq(v0, v1, v2) == Seq(0L, 1L, 2L))
    assert(VersionedTable.latestVersion(dir).contains(2L))
    assert(VersionedTable.read(spark, dir).collect().map(_.getLong(0)).toSet == Set(9L))
    assert(VersionedTable.read(spark, dir, Some(0L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a"), (2L, "b")))
    assert(VersionedTable.read(spark, dir, Some(1L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a2"), (3L, "c")))
    val vs = VersionedTable.versions(spark, dir)
    assert(vs.map(_._1) == Seq(0L, 1L, 2L))
    assert(vs.map(_._2).forall(_ > 0L), "commit timestamps recorded")
    // a version past the pointer does not exist for readers
    intercept[IllegalArgumentException] { VersionedTable.read(spark, dir, Some(5L)) }
  }

  test("reader isolation: a pinned version's files are untouched by later commits") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commit(spark, Seq((1L, 10.0)).toDF("id", "v"), dir)
    def files(v: Long) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(f"$dir/v=$v%05d")).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val pinned = VersionedTable.read(spark, dir, Some(0L)) // lazy plan over v0
    val before = files(0L)
    VersionedTable.commit(spark, Seq((2L, 20.0)).toDF("id", "v"), dir)
    VersionedTable.commit(spark, Seq((3L, 30.0)).toDF("id", "v"), dir)
    assert(files(0L) == before, "v0 files must never move under a reader")
    // the pre-commit plan still evaluates against v0
    assert(pinned.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("vacuum keeps the last N, sweeps orphans, and vacuumed reads fail loudly") {
    import spark.implicits._
    val dir = dirOf()
    (0 until 4).foreach(i => VersionedTable.commit(spark, Seq((i.toLong, i)).toDF("id", "v"), dir))
    // forge an INVISIBLE orphan (crashed commit: data + _commit, no pointer flip)
    val orphan = new java.io.File(s"$dir/v=00009")
    Seq((99L, 99)).toDF("id", "v").write.parquet(orphan.getPath)
    graft.tables.FsIO.writeText(s"${orphan.getPath}/_commit", "commitMs=1\n")
    intercept[IllegalArgumentException] { VersionedTable.read(spark, dir, Some(9L)) }
    // next commit never re-enters an attempted number
    val next = VersionedTable.commit(spark, Seq((5L, 5)).toDF("id", "v"), dir)
    assert(next == 10L)
    val dropped = VersionedTable.vacuum(spark, dir, retainLast = 2)
    assert(dropped == Seq(0L, 1L, 2L, 9L), s"dropped $dropped") // 9 = the orphan
    assert(VersionedTable.versions(spark, dir).map(_._1) == Seq(3L, 10L))
    val e = intercept[IllegalArgumentException] { VersionedTable.read(spark, dir, Some(1L)) }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    assert(VersionedTable.read(spark, dir, Some(3L)).count() == 1L)
  }

  test("a foreign _log layout fails loudly instead of reading as an empty history") {
    import spark.implicits._
    val dir = dirOf()
    VersionedTable.commit(spark, Seq((1L, 1)).toDF("id", "v"), dir)
    // replace the log DIRECTORY with a plain file of the same name — a
    // foreign/incompatible layout; silently-empty here would let vacuum
    // classify every live version as an orphan and delete committed data
    val ld = new java.io.File(s"$dir/_log")
    ld.listFiles.foreach(_.delete()); ld.delete()
    graft.tables.FsIO.writeText(ld.getPath, "not a log dir\n")
    val e = intercept[IllegalArgumentException] { VersionedTable.log(dir) }
    assert(e.getMessage.contains("not a log directory"), e.getMessage)
    intercept[IllegalArgumentException] { VersionedTable.vacuum(spark, dir, 1) }
    assert(new java.io.File(f"$dir/v=${0L}%05d").exists, "data must survive the refusal")
  }

  test("commit serializes through the write lease: live contender fails loudly") {
    import spark.implicits._
    val dir  = dirOf()
    VersionedTable.commit(spark, Seq((1L, 1)).toDF("id", "v"), dir)
    val lock = graft.tables.FsIO.acquireWriteLock(dir, "other-committer", staleMs = 600000)
    val e = intercept[RuntimeException] {
      VersionedTable.commit(spark, Seq((2L, 2)).toDF("id", "v"), dir)
    }
    assert(e.getMessage.contains("another writer"), e.getMessage)
    assert(VersionedTable.latestVersion(dir).contains(0L), "failed commit must not publish")
    graft.tables.FsIO.releaseWriteLock(lock)
    assert(VersionedTable.commit(spark, Seq((2L, 2)).toDF("id", "v"), dir) == 1L)
  }
}

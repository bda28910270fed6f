package graft

import java.nio.file.Files

import graft.sources.VersionedStream
import graft.tables.{VersionedStats, VersionedTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Deletion vectors (merge-on-read DELETE) for [[VersionedTable]]:
  * delete cost O(deleted rows), zero data-file rewrites; readers mask,
  * compaction/copy-on-write materialize, vacuum refcounts sidecars,
  * diff/changes/streaming see the row-level truth. */
class DeletionVectorSpec extends SparkSpec {

  private def root() = Files.createTempDirectory("graft_dv").toString
  private def dataEntries(dir: String, v: Long) = VersionedTable.entriesOf(dir, v)

  test("DV delete removes rows without rewriting any data file") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(4), dir)
    VersionedTable.commitAppend(spark,
      (21L to 30L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(2), dir)
    val before = dataEntries(dir, 1L)
    val v2 = VersionedTable.commitDeleteDV(spark, dir, col("id") % 3 === 0)
    assert(v2 == 2L)
    val after = dataEntries(dir, 2L)
    // the DATA file list is IDENTICAL — no copy-on-write happened
    assert(after.map(_._1) == before.map(_._1),
      "DV delete must not add, drop, or rewrite data files")
    assert(after.exists(_._2.nonEmpty), "touched entries carry a DV sidecar")
    assert(VersionedTable.read(spark, dir).select("id").as[Long].collect().toSet
      == (1L to 30L).filterNot(_ % 3 == 0).toSet)
    // time travel: the pre-delete version still shows every row
    assert(VersionedTable.read(spark, dir, Some(1L)).count() == 30L)
  }

  test("stacked DV deletes compose by union; cond sees live rows only") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 12L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1), dir)
    VersionedTable.commitDeleteDV(spark, dir, col("id") <= 4)
    VersionedTable.commitDeleteDV(spark, dir, col("id") >= 10)
    val entries = dataEntries(dir, 2L)
    assert(entries.head._2.size == 2, "two sidecars stacked on the same file")
    assert(VersionedTable.read(spark, dir).select("id").as[Long].collect().toSet
      == (5L to 9L).toSet)
    // a delete matching only already-masked rows is a data-identical commit:
    // same entries, no new sidecar
    val v3 = VersionedTable.commitDeleteDV(spark, dir, col("id") === 2L)
    assert(dataEntries(dir, v3) == entries, "re-deleting masked rows is a no-op")
    // and the change feed across it is empty
    assert(VersionedTable.changes(spark, dir, 2L, 3L, Seq("id"), Seq("s")).count() == 0L)
  }

  test("copy-on-write UPDATE over a masked file applies the mask and sheds the DV") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1), dir)
    VersionedTable.commitDeleteDV(spark, dir, col("id") === 5L)
    VersionedTable.commitUpdate(spark, dir, col("id") === 7L, Map("v" -> lit(700.0)))
    val got = VersionedTable.read(spark, dir)
      .as[(Long, Double)].collect().toMap
    assert(!got.contains(5L), "the masked row must not resurrect through the rewrite")
    assert(got(7L) == 700.0)
    assert(dataEntries(dir, 2L).forall(_._2.isEmpty),
      "the rewritten file materialized its deletion vector away")
  }

  test("MERGE treats a DV-deleted key as absent: clean insert, no resurrection") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 6L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1), dir)
    VersionedTable.commitDeleteDV(spark, dir, col("id") === 3L)
    VersionedTable.commitMerge(spark, dir,
      Seq((3L, 333.0), (6L, 666.0)).toDF("id", "v"), Seq("id"))
    val got = VersionedTable.read(spark, dir).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0, 3L -> 333.0, 4L -> 4.0, 5L -> 5.0, 6L -> 666.0),
      s"merge over a masked table must see live rows only, got $got")
  }

  test("MoR UPDATE masks old rows and appends new ones — no data file rewritten") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(4), dir)
    val before = dataEntries(dir, 0L).map(_._1)
    val v1 = VersionedTable.commitUpdateDV(spark, dir, col("id") % 5 === 0,
      Map("v" -> (col("v") * 100)))
    val after = dataEntries(dir, v1)
    // every pre-existing file survives untouched (now masked); the only new
    // files hold the rewritten rows
    assert(before.forall(rel => after.exists(_._1 == rel)),
      "MoR update must not rewrite or drop existing data files")
    assert(after.exists(e => before.contains(e._1) && e._2.nonEmpty),
      "matched files carry a DV sidecar")
    assert(after.exists(e => !before.contains(e._1) && e._2.isEmpty),
      "rewritten rows land in fresh DV-free files")
    val got = VersionedTable.read(spark, dir).as[(Long, Double)].collect().toMap
    assert(got == (1L to 20L).map(i =>
      i -> (if (i % 5 == 0) i * 100.0 else i * 1.0)).toMap)
    // time travel still shows the pre-update values
    assert(VersionedTable.read(spark, dir, Some(0L)).where(col("id") === 5L)
      .select("v").as[Double].head() == 5.0)
  }

  test("MoR UPDATE: SET sees the old row; cond sees live rows only; no-op matches nothing") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 8L).map(i => (i, i * 1.0, i * 10.0)).toDF("id", "a", "b").coalesce(1), dir)
    VersionedTable.commitDeleteDV(spark, dir, col("id") === 4L)
    // swap a and b on even ids: each SET expression must read the OLD row
    VersionedTable.commitUpdateDV(spark, dir, col("id") % 2 === 0,
      Map("a" -> col("b"), "b" -> col("a")))
    val got = VersionedTable.read(spark, dir).as[(Long, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!got.contains(4L), "a DV-deleted row must not resurrect as updated")
    assert(got(2L) == (20.0, 2.0) && got(6L) == (60.0, 6.0), s"swap must use old values: $got")
    assert(got(3L) == (3.0, 30.0))
    // update matching nothing: data-identical commit, same entries
    val e3 = dataEntries(dir, 2L)
    val v4 = VersionedTable.commitUpdateDV(spark, dir, col("id") > 99L,
      Map("a" -> lit(0.0)))
    assert(dataEntries(dir, v4) == e3, "no-match update is a no-op version")
    // a SET that changes a column's type is refused before any commit
    val err = intercept[IllegalArgumentException] {
      VersionedTable.commitUpdateDV(spark, dir, col("id") === 1L,
        Map("a" -> lit("oops")))
    }
    assert(err.getMessage.contains("schema mismatch"))
  }

  test("changes() reports an MoR update as updated rows with old and new values") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(2), dir)
    VersionedTable.commitUpdateDV(spark, dir, col("id").isin(3L, 8L),
      Map("v" -> (col("v") + 0.5)))
    val ch = VersionedTable.changes(spark, dir, 0L, 1L, Seq("id"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(ch == Set((3L, "updated", 3.0, 3.5), (8L, "updated", 8.0, 8.5)),
      s"got $ch")
  }

  test("compaction materializes DVs; changes() across it stays empty") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 40L).map(i => (i, i % 7)).toDF("id", "g").repartition(5), dir)
    VersionedTable.commitDeleteDV(spark, dir, col("g") === 0)
    val expected = VersionedTable.read(spark, dir).as[(Long, Long)].collect().toSet
    val vc = VersionedTable.commitCompact(spark, dir, targetFiles = 2)
    assert(dataEntries(dir, vc).forall(_._2.isEmpty), "compaction sheds every DV")
    assert(VersionedTable.read(spark, dir).as[(Long, Long)].collect().toSet == expected)
    assert(VersionedTable.changes(spark, dir, 1L, vc, Seq("id"), Seq("g")).count() == 0L,
      "dataChange=false re-layout is invisible to the change feed")
  }

  test("compactDeletionVectors merges stacked sidecars to one; no data file touched") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 60L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(3), dir)
    VersionedTable.commitDeleteDV(spark, dir, col("id") % 4 === 0)
    VersionedTable.commitDeleteDV(spark, dir, col("id") % 9 === 0)
    VersionedTable.commitDeleteDV(spark, dir, col("id") === 1L)
    val before = dataEntries(dir, 3L)
    assert(before.map(_._2.size).max >= 2, "sidecars stacked before compaction")
    val expected = VersionedTable.read(spark, dir).as[(Long, Double)].collect().toSet
    val vc = VersionedTable.compactDeletionVectors(spark, dir)
    val after = dataEntries(dir, vc)
    assert(after.map(_._1) == before.map(_._1), "data files untouched")
    assert(after.filter(_._2.nonEmpty).forall(_._2.size == 1) &&
      after.flatMap(_._2).distinct.size == 1, "one merged sidecar for the table")
    assert(VersionedTable.read(spark, dir).as[(Long, Double)].collect().toSet == expected)
    // dataChange=false: invisible to the change feed
    assert(VersionedTable.changes(spark, dir, 3L, vc, Seq("id"), Seq("v")).count() == 0L)
    // idempotent: a second call is a no-op returning the current version
    assert(VersionedTable.compactDeletionVectors(spark, dir) == vc)
  }

  test("diff and changes report DV-deleted rows as removed, O(changed entries)") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 30L).map(i => (i, i * 10.0)).toDF("id", "v").repartition(3), dir)
    VersionedTable.commitDeleteDV(spark, dir, col("id").isin(2L, 17L, 29L))
    val d = VersionedTable.diff(spark, dir, 0L, 1L, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((2L, "removed"), (17L, "removed"), (29L, "removed")))
    val ch = VersionedTable.changes(spark, dir, 0L, 1L, Seq("id"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(2), r.isNullAt(4))).toSet
    assert(ch == Set((2L, "removed", true), (17L, "removed", true), (29L, "removed", true)))
  }

  test("restore before/onto a DV version; vacuum refcounts sidecars") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 10L).map(i => (i, s"x$i")).toDF("id", "s").coalesce(1), dir) // v0
    VersionedTable.commitDeleteDV(spark, dir, col("id") > 7L)             // v1
    VersionedTable.commitRestore(spark, dir, 0L)                          // v2: all rows back
    assert(VersionedTable.read(spark, dir).count() == 10L)
    VersionedTable.commitRestore(spark, dir, 1L)                          // v3: mask again
    assert(VersionedTable.read(spark, dir).select("id").as[Long].collect().toSet
      == (1L to 7L).toSet)
    // vacuum keeping v1..v3 (all reference the sidecar): sidecar survives
    VersionedTable.vacuum(spark, dir, retainLast = 3, graceMs = 0L)
    assert(VersionedTable.read(spark, dir, Some(3L)).count() == 7L)
    // compact (v4: no DVs), then retain only v4: the sidecar is swept
    VersionedTable.commitCompact(spark, dir, targetFiles = 1)
    val dvFiles = new java.io.File(dir, "data").listFiles.toSeq
      .filter(_.getName.endsWith(".parquet"))
    VersionedTable.vacuum(spark, dir, retainLast = 1, graceMs = 0L)
    val left = new java.io.File(dir, "data").listFiles.toSeq
      .filter(_.getName.endsWith(".parquet"))
    assert(left.size < dvFiles.size, "unreferenced DV sidecars are vacuumed")
    assert(VersionedTable.read(spark, dir).count() == 7L)
  }

  test("shallow and deep clones carry deletion vectors") {
    import spark.implicits._
    val src = root() + "/src"
    VersionedTable.commitAppend(spark,
      (1L to 9L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1), src)
    VersionedTable.commitDeleteDV(spark, src, col("id") % 2 === 0)
    val expect = (1L to 9L).filter(_ % 2 == 1).toSet
    val shallow = root() + "/shallow"
    VersionedTable.cloneShallow(spark, src, shallow)
    assert(VersionedTable.read(spark, shallow).select("id").as[Long].collect().toSet == expect)
    val deep = root() + "/deep"
    VersionedTable.cloneDeep(spark, src, deep)
    assert(VersionedTable.read(spark, deep).select("id").as[Long].collect().toSet == expect)
    // deep clone is self-contained: dropping the source must not break it
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    assert(VersionedTable.read(spark, deep).select("id").as[Long].collect().toSet == expect)
  }

  test("stats-pruned reads stay mask-correct (conservative min/max, masked scan)") {
    import spark.implicits._
    val dir = root() + "/t"
    VersionedTable.commitAppend(spark,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(4), dir)
    VersionedTable.commitCompact(spark, dir, targetFiles = 4, clusterBy = Seq("id"))
    VersionedTable.commitDeleteDV(spark, dir, col("id").between(20L, 40L))
    VersionedStats.refresh(spark, dir, Seq("id"))
    val got = VersionedStats.readPruned(spark, dir, Seq(("id", lit(10L), lit(50L))))
      .select("id").as[Long].collect().toSet
    assert(got == ((10L to 19L) ++ (41L to 50L)).toSet,
      "pruned read must apply the deletion vectors of the kept files")
  }

  test("streaming: DV delete fails the tail by default; ignoreChanges re-emits live rows") {
    import spark.implicits._
    val base  = root()
    val table = base + "/t"
    def run(out: String, ckpt: String, opts: Map[String, String] = Map.empty): Unit = {
      val reader = spark.readStream.format(VersionedStream.format).option("path", table)
      val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
        .load().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    VersionedTable.commitAppend(spark,
      (1L to 8L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(2), table)
    val (out1, ckpt1) = (base + "/out1", base + "/ckpt1")
    run(out1, ckpt1)
    assert(spark.read.parquet(out1).count() == 8L)
    VersionedTable.commitDeleteDV(spark, table, col("id") <= 2L)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(out1, ckpt1)
    }
    assert(err.getMessage.contains("ignoreChanges") ||
      Option(err.getCause).exists(_.getMessage.contains("ignoreChanges")))
    // fresh checkpoint WITH ignoreChanges: snapshot is masked, and a further
    // DV delete re-emits the touched file's LIVE rows only
    val (out2, ckpt2) = (base + "/out2", base + "/ckpt2")
    run(out2, ckpt2, Map("ignoreChanges" -> "true"))
    assert(spark.read.parquet(out2).select("id").as[Long].collect().toSet
      == (3L to 8L).toSet, "initial snapshot must be DV-masked")
    val beforeReemit = spark.read.parquet(out2).count()
    VersionedTable.commitDeleteDV(spark, table, col("id") === 5L)
    run(out2, ckpt2, Map("ignoreChanges" -> "true"))
    // the parquet sink APPENDS (downstream must be idempotent): judge only
    // the delta — the re-emitted file's LIVE rows, which exclude both the
    // old mask (1, 2) and the new one (5)
    val after = spark.read.parquet(out2).select("id").as[Long].collect().toSeq
    val delta = after.diff((3L to 8L).toSeq) // snapshot rows consumed once each
    assert(after.size > beforeReemit, "the DV-changed file was re-emitted")
    assert(!delta.contains(5L) && !delta.contains(1L) && !delta.contains(2L),
      s"re-emission carries only live rows, got delta $delta")
  }
}

package graft

import java.nio.file.Files

import graft.streaming.StreamingMatview
import graft.tables.{MaterializedAgg, VersionedTable}
import org.apache.spark.sql.functions._

class StreamingMatviewSpec extends SparkSpec {

  private def writeSrcFile(df: org.apache.spark.sql.DataFrame, srcDir: String, name: String): Unit = {
    val tmp = srcDir + "__stage_" + name
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(srcDir).mkdirs()
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(srcDir, s"$name.parquet"))
  }

  private def viewState(view: String) =
    MaterializedAgg.read(spark, view).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  test("mid-stream restart resumes from the checkpoint; final view = full recompute") {
    val root = Files.createTempDirectory("graft_smv").toString
    val (src, table, view, ckpt) = (s"$root/src", s"$root/table", s"$root/view", s"$root/ckpt")
    def batchDf(lo: Long, hi: Long) = spark.range(lo, hi).select(col("id").as("k"),
      pmod(col("id"), lit(5L)).as("g"), (col("id") * 3).as("x"))
    val schema = batchDf(0, 1).schema
    // phase 1: two files available, stream runs to completion and stops
    writeSrcFile(batchDf(0, 100), src, "b0")
    writeSrcFile(batchDf(100, 200), src, "b1")
    StreamingMatview.streamMatview(spark, src, schema, table, view,
      Seq("k"), Seq("g"), Seq("x"), Seq("x"), ckpt)
    assert(VersionedTable.read(spark, table).count() == 200L)
    // phase 2: two more files arrive; SAME checkpoint — the restarted
    // stream must consume only b2/b3 (no re-append of b0/b1)
    writeSrcFile(batchDf(200, 300), src, "b2")
    writeSrcFile(batchDf(300, 400), src, "b3")
    StreamingMatview.streamMatview(spark, src, schema, table, view,
      Seq("k"), Seq("g"), Seq("x"), Seq("x"), ckpt)
    assert(VersionedTable.read(spark, table).count() == 400L)
    val expect = spark.range(0, 400).select(pmod(col("id"), lit(5L)).as("g"), (col("id") * 3).as("x"))
      .groupBy("g").agg(count(lit(1)), sum("x"), min("x"), max("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(viewState(view) == expect)
  }

  test("crash-window replay: committed append with same (appId, batchId) is skipped; refresh no-ops") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_smv2").toString
    val (table, view) = (s"$root/table", s"$root/view")
    val app = "graft.matview:test"
    val b0 = Seq((1L, 0L, 10L), (2L, 1L, 20L)).toDF("k", "g", "x")
    val b1 = Seq((3L, 0L, 30L)).toDF("k", "g", "x")
    VersionedTable.commitAppend(spark, b0, table, txn = Some((app, 0L)))
    MaterializedAgg.create(spark, table, view, Seq("k"), Seq("g"), Seq("x"), Seq("x"))
    // batch 1 lands and the view refreshes, but "the checkpoint never
    // committed": the driver replays batch 1 verbatim
    VersionedTable.commitAppend(spark, b1, table, txn = Some((app, 1L)))
    val vAfter = MaterializedAgg.refresh(spark, view)
    val replayV = VersionedTable.commitAppend(spark, b1, table, txn = Some((app, 1L)))
    assert(replayV == VersionedTable.latestVersion(table).get)
    assert(VersionedTable.read(spark, table).count() == 3L) // not 4: no double rows
    assert(MaterializedAgg.refresh(spark, view) == vAfter)  // idempotent no-op
    assert(viewState(view) == Set((0L, 2L, 40L, 10L, 30L), (1L, 1L, 20L, 20L, 20L)))
    // the OTHER crash window: append landed (txn recorded) but the refresh
    // never ran; the replay skips the append and the refresh folds the
    // outstanding change feed
    VersionedTable.commitAppend(spark, Seq((4L, 1L, 5L)).toDF("k", "g", "x"),
      table, txn = Some((app, 2L)))
    VersionedTable.commitAppend(spark, Seq((4L, 1L, 5L)).toDF("k", "g", "x"),
      table, txn = Some((app, 2L))) // replay before any refresh
    MaterializedAgg.refresh(spark, view)
    assert(viewState(view) == Set((0L, 2L, 40L, 10L, 30L), (1L, 2L, 25L, 5L, 20L)))
  }
}

package graft

import graft.tables.SkippingIndex
import org.apache.spark.sql.functions._

class SkippingIndexSpec extends SparkSpec {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_skiptest").toString + "/t"

  test("skipping read ≡ full-scan filter; manifest actually prunes files") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val path = freshDir()
    SkippingIndex.writeClustered(li, path, "l_orderkey", Seq("l_orderkey"), nFiles = 8)
    val (kept, total) = SkippingIndex.prunedFiles(
      spark, path, "l_orderkey", lit(100L), lit(900L))
    assert(total == 8, s"expected 8 data files, manifest saw $total")
    assert(kept.nonEmpty && kept.size < total, s"kept ${kept.size} of $total")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)))).sorted.toSeq
    val pruned = rows(SkippingIndex.readPruned(spark, path, "l_orderkey", lit(100L), lit(900L)))
    val full   = rows(spark.read.parquet(path)
      .where(col("l_orderkey") >= 100L && col("l_orderkey") <= 900L))
    assert(pruned == full && pruned.nonEmpty)
  }

  test("manifest dir is invisible to plain reads; empty-range read returns schema-stable empty") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val path = freshDir()
    SkippingIndex.writeClustered(li, path, "l_orderkey", Seq("l_orderkey"), nFiles = 4)
    // underscore-prefixed sidecar must not leak into a normal table read
    assert(spark.read.parquet(path).count() == li.count())
    val none = SkippingIndex.readPruned(
      spark, path, "l_orderkey", lit(-500L), lit(-100L))
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("l_orderkey", "l_quantity"))
  }

  test("z-order + refreshStats: both dimensions prune; AND-read ≡ plain two-range filter") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val path = freshDir()
    li.write.parquet(path)
    graft.tables.TableManager.compactZOrder(spark, path, "l_orderkey", "l_partkey", targetFiles = 8)
    SkippingIndex.refreshStats(spark, path, Seq("l_orderkey", "l_partkey"))
    val (kA, tot) = SkippingIndex.prunedFiles(spark, path, "l_orderkey", lit(1L), lit(600L))
    val (kB, _)   = SkippingIndex.prunedFiles(spark, path, "l_partkey", lit(1L), lit(50L))
    assert(kA.size < tot, s"orderkey kept ${kA.size}/$tot")
    assert(kB.size < tot, s"partkey kept ${kB.size}/$tot")
    val preds = Seq(("l_orderkey", lit(1L), lit(600L)), ("l_partkey", lit(1L), lit(50L)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2))))
        .sorted.toSeq
    val pruned = rows(SkippingIndex.readPrunedMulti(spark, path, preds))
    val full = rows(spark.read.parquet(path).where(
      col("l_orderkey").between(1L, 600L) && col("l_partkey").between(1L, 50L)))
    assert(pruned == full && pruned.nonEmpty)
    // the AND keeps at most what either dimension keeps alone
    val (kAB, _) = SkippingIndex.prunedFilesMulti(spark, path, preds)
    assert(kAB.size <= math.min(kA.size, kB.size))
  }

  test("stale manifest (file appended after stats) fails loudly naming refreshStats") {
    import spark.implicits._
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val path = freshDir()
    SkippingIndex.writeClustered(li, path, "l_orderkey", Seq("l_orderkey"), nFiles = 4)
    // sneak a file in behind the manifest's back
    li.limit(10).coalesce(1).write.mode("append").parquet(path)
    val e = intercept[IllegalArgumentException] {
      SkippingIndex.prunedFiles(spark, path, "l_orderkey", lit(0L), lit(10L))
    }
    assert(e.getMessage.contains("STALE") && e.getMessage.contains("refreshStats"), e.getMessage)
    // refreshStats heals it
    SkippingIndex.refreshStats(spark, path, Seq("l_orderkey"))
    val (_, total) = SkippingIndex.prunedFiles(spark, path, "l_orderkey", lit(0L), lit(10L))
    assert(total == 5)
  }

  test("appendClustered extends the manifest incrementally; history files untouched") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val path = freshDir()
    SkippingIndex.writeClustered(li.where(col("l_orderkey") <= 700L),
      path, "l_orderkey", Seq("l_orderkey"), nFiles = 4)
    def dataFiles() = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val before = dataFiles()
    SkippingIndex.appendClustered(li.where(col("l_orderkey") > 700L),
      path, "l_orderkey", Seq("l_orderkey"), nFiles = 4)
    // history generation byte-identical; 4 new files; manifest covers all 8
    val after = dataFiles()
    assert(before.forall { case (n, st) => after.get(n).contains(st) },
      "append rewrote history files")
    val (_, total) = SkippingIndex.prunedFiles(spark, path, "l_orderkey", lit(0L), lit(1L))
    assert(total == 8, s"manifest rows: $total")
    // pruned read across generations ≡ plain filter
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), String.valueOf(r.get(1)))).sorted.toSeq
    val pruned = rows(SkippingIndex.readPruned(spark, path, "l_orderkey", lit(600L), lit(900L)))
    val full   = rows(spark.read.parquet(path)
      .where(col("l_orderkey") >= 600L && col("l_orderkey") <= 900L))
    assert(pruned == full && pruned.nonEmpty)
    // metadata-only aggregate also sees both generations
    val stats = SkippingIndex.statsOnlyAggregate(spark, path, Seq("l_orderkey"))
      .head()
    assert(stats.getLong(1) == li.count(), s"stats rows ${stats.getLong(1)} vs ${li.count()}")
  }

  test("statsOnlyAggregate ≡ full-scan aggregate, handles nulls, and never opens data files") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.5), (2L, null), (3L, -2.0), (4L, 7.25), (5L, null), (6L, 0.0))
      .toDF("k", "v")
    val path = freshDir()
    SkippingIndex.writeClustered(df, path, "k", Seq("k", "v"), nFiles = 3)
    def asMap(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    val stats = asMap(SkippingIndex.statsOnlyAggregate(spark, path, Seq("k", "v")))
    assert(stats("k") == ((6L, 6L, Some(1.0), Some(6.0))))
    assert(stats("v") == ((6L, 4L, Some(-2.0), Some(10.5))))
    // metadata-only proof: corrupt every data file (names survive, so the
    // staleness guard still matches) — a scan would now crash, the
    // manifest answer must not change
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.write(f.toPath, "not parquet".getBytes)
    }
    intercept[Exception] { spark.read.parquet(path).count() }
    assert(asMap(SkippingIndex.statsOnlyAggregate(spark, path, Seq("k", "v"))) == stats)
    // asking for a column the manifest doesn't carry fails actionably
    val e = intercept[IllegalArgumentException] {
      SkippingIndex.statsOnlyAggregate(spark, path, Seq("missing"))
    }
    assert(e.getMessage.contains("refreshStats"), e.getMessage)
  }

  test("reading an unindexed table through the manifest fails loudly") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey")
    val path = freshDir()
    li.write.parquet(path) // plain write — no manifest
    val e = intercept[IllegalStateException] {
      SkippingIndex.prunedFiles(spark, path, "l_orderkey", lit(0L), lit(10L))
    }
    assert(e.getMessage.contains("writeClustered"), e.getMessage)
  }
}

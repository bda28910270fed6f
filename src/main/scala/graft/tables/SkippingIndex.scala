package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the lakehouse stat-pruning feature
  * (Delta/Iceberg manifests) the emulated table layer was missing: writes
  * range-cluster the data so each file covers a narrow key interval, a
  * sidecar manifest records per-file min/max per stat column, and range
  * reads prune the file LIST before the scan plans — I/O proportional to
  * the selected key range, not the table.
  *
  * The manifest lives under `<path>/_graft_stats`: Spark's file index
  * ignores underscore-prefixed dirs (the `_delta_log` convention), so
  * plain `spark.read.parquet(path)` sees only the data files and the
  * manifest rides along through copies/renames of the table dir.
  *
  * 100 TB shape: the manifest is ONE row per file (a few thousand rows per
  * PB at healthy file sizes) — reading it is a driver-trivial scan, and
  * pruning is a filter over it, not a listing of the data dir. The kept
  * file list is collected to the driver exactly like every FileIndex
  * does; [[MaxPrunedFiles]] guards the degenerate no-pruning-possible
  * case with an actionable error instead of a silent giant plan.
  */
object SkippingIndex {

  val StatsDir = "_graft_stats"

  /** Refuse to materialize absurd kept-file lists (no-stat overlap on every
    * file = the clustering is wrong for this predicate, not a read problem). */
  val MaxPrunedFiles = 1000000

  /** Write `df` range-clustered on `sortCol` into `nFiles` files and
    * record per-file min/max for `statCols` in the sidecar manifest.
    * Range clustering is what makes the stats SELECTIVE: random placement
    * gives every file the full value range and no read can skip anything
    * (same reason Delta pairs skipping with Z-order). Stats are computed
    * from a read-back of the written files, so they describe exactly what
    * a reader will see. */
  def writeClustered(
      df: DataFrame,
      path: String,
      sortCol: String,
      statCols: Seq[String],
      nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    require(statCols.nonEmpty, "need at least one stat column")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
    refreshStats(df.sparkSession, path, statCols)
  }

  /** Per-file stat aggregates: min/max (pruning) + row/non-null counts
    * (metadata-only aggregation) per stat column. All four are exactly
    * mergeable across files — the property [[statsOnlyAggregate]] relies
    * on. Sums are deliberately absent: a per-file double sum depends on
    * intra-file ordering and would make the manifest non-reproducible. */
  private def statAggs(statCols: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        count(col(c)).as(s"cnt_$c")))

  /** Incremental ingest for a skipping table: append `df` range-clustered
    * as `nFiles` NEW files and extend the manifest with exactly their
    * stats — history files are neither re-read nor rewritten, so append
    * cost is O(batch), not O(table). This is what makes skipping usable
    * under continuous ingest (the staleness guard otherwise forces a full
    * `refreshStats` table scan after every arrival). Batch files cluster
    * within themselves; cross-batch ranges may overlap (pruning stays
    * CORRECT — each file's own min/max bounds it — just less selective
    * until a `writeClustered`/compaction re-sorts). Lease-locked: two
    * appends interleaving the manifest read-modify-write would lose one
    * batch's stats rows and trip the guard. */
  def appendClustered(
      df: DataFrame,
      path: String,
      sortCol: String,
      statCols: Seq[String],
      nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    require(statCols.nonEmpty, "need at least one stat column")
    val spark = df.sparkSession
    // heartbeat lease (r17): the append inside the lock is
    // batch-proportional; a fixed lease would let a rival classify a slow
    // live appender as crashed and race the manifest read-modify-write
    graft.tables.FsIO.withWriteLockHeartbeat(path, "appendClustered",
      TableManager.DefaultLockLeaseMs) { hb =>
      // eager checkpoint: the manifest rewrite below overwrites the very
      // files a lazy `old` would still be reading from
      val (old0, _) = loadManifest(spark, path)
      val old = old0.localCheckpoint(true)
      statCols.foreach(c => require(old.columns.contains(s"min_$c"),
        s"manifest at $path lacks stats for $c — refreshStats with the full column set first"))
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def listing(): Set[String] = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.toUri.getPath).toSet
      val before = listing()
      df.repartitionByRange(nFiles, col(sortCol))
        .sortWithinPartitions(sortCol)
        .write.mode("append").parquet(path)
      val fresh = (listing() -- before).toSeq.sorted
      // an EMPTY batch writes no files — a routine continuous-ingest tick,
      // not an error: the manifest and data are both unchanged, no-op
      if (fresh.nonEmpty) {
        val aggs = statAggs(statCols)
        val freshStats = spark.read.parquet(fresh: _*)
          .groupBy(input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*)
          .localCheckpoint(true) // consumed twice: empty-file sweep + manifest
        // ZERO-ROW appended files (an empty batch, or empty range partitions)
        // yield no stats row, which would break the file↔manifest parity
        // the staleness guard enforces — delete them; they carry no
        // data a reader could miss
        val statedFiles = freshStats.select("file").collect().map(_.getString(0))
          .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
        fresh.filterNot(statedFiles.contains)
          .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
        // ownership gate before the manifest rewrite — the irreversible
        // step: publishing over a rival's manifest loses its stats rows
        hb.verifyOwned("rewriting the stats manifest")
        // rewrite the (tiny) manifest with old ∪ fresh rows
        old.unionByName(freshStats).coalesce(1)
          .write.mode("overwrite").parquet(s"$path/$StatsDir")
      }
    }
  }

  /** (Re)compute the manifest over the files ALREADY at `path` — the
    * post-layout-change hook: after [[TableManager.compactZOrder]] (or any
    * rewrite that didn't go through [[writeClustered]]) the old per-file
    * stats describe files that no longer exist; this rebuilds them from a
    * read-back without touching the data. Z-order + a multi-column
    * manifest is the 2-D skipping story: the space-filling curve makes
    * BOTH columns' per-file ranges narrow, so range predicates on EITHER
    * (or both) prune. */
  def refreshStats(spark: SparkSession, path: String, statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "need at least one stat column")
    val aggs = statAggs(statCols)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** Metadata-only aggregation: MIN/MAX/COUNT per stat column answered
    * entirely from the manifest — the data files are never opened (the
    * Delta/Iceberg "SELECT min(x), max(x), count(*)" log-only fast path).
    * Per-file min/max/count merge exactly (min-of-mins, max-of-maxes,
    * sum-of-counts), so the result is row-identical to the full scan; at
    * 100 TB this turns a table-wide scan into a manifest read of one row
    * per file. min/max are reported as DOUBLE via try_cast (null for
    * non-numeric stat columns). Same staleness guard as pruning reads —
    * a manifest that drifted from the data dir must fail, not answer. */
  def statsOnlyAggregate(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val (stats, _) = loadManifest(spark, path)
    cols.foreach(c => require(stats.columns.contains(s"min_$c"),
      s"column $c is not in the skipping manifest at $path/$StatsDir — " +
        "rebuild with refreshStats including it"))
    val aggs = sum(col("n_rows")).cast("long").as("__n") +: cols.flatMap(c => Seq(
      sum(col(s"cnt_$c")).cast("long").as(s"__${c}__cnt"),
      min(expr(s"try_cast(`min_$c` AS DOUBLE)")).as(s"__${c}__min"),
      max(expr(s"try_cast(`max_$c` AS DOUBLE)")).as(s"__${c}__max")))
    val one = stats.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map(c => struct(
      lit(c).as("column"), col("__n").as("n_rows"),
      col(s"__${c}__cnt").as("n_notnull"),
      col(s"__${c}__min").as("min_d"), col(s"__${c}__max").as("max_d")))
    one.select(explode(array(perCol: _*)).as("s")).select(col("s.*"))
  }

  /** Manifest read shared by pruning and metadata-only aggregation:
    * loud on absence, loud on staleness. The guard compares the manifest's
    * FILE-NAME SET against the data dir's listing (same one listing a
    * count-only guard paid) — a same-count rewrite (N files overwritten
    * by N different files) used to pass the count check and silently
    * answer pruning reads and metadata-only aggregates from stale stats.
    * Also returns the manifest row count so hot read paths don't run a
    * second count job over the same frame. */
  private def loadManifest(spark: SparkSession, path: String): (DataFrame, Long) = {
    val stats =
      try spark.read.parquet(s"$path/$StatsDir")
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalStateException(
            s"no skipping manifest at $path/$StatsDir — write this table " +
              s"with SkippingIndex.writeClustered (or read it plainly)", e)
      }
    val described = stats.select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    val actual = {
      val p  = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName).toSet
    }
    require(described == actual,
      s"skipping manifest at $path/$StatsDir is STALE: " +
        s"${(actual -- described).take(3).mkString(", ")} on disk but not " +
        s"described / ${(described -- actual).take(3).mkString(", ")} described " +
        "but gone — run SkippingIndex.refreshStats after any append/rewrite " +
        "that bypassed writeClustered")
    (stats, described.size.toLong)
  }

  /** Multi-predicate pruning: a file survives only if EVERY (col, lo, hi)
    * interval intersects that file's [min, max] — predicates AND together,
    * so each extra clause can only shrink the kept set. */
  def prunedFilesMulti(
      spark: SparkSession,
      path: String,
      preds: Seq[(String, Column, Column)]): (Seq[String], Long) = {
    require(preds.nonEmpty, "need at least one predicate")
    val (stats, total) = loadManifest(spark, path)
    val cond = preds.map { case (c, lo, hi) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)
    val kept = stats.where(cond).select("file").collect().map(_.getString(0)).toSeq
    require(kept.size <= MaxPrunedFiles,
      s"pruning kept ${kept.size} files (> $MaxPrunedFiles) — the table's " +
        s"clustering does not discriminate for this predicate; " +
        s"re-cluster on the filtered columns or read plainly")
    (kept, total)
  }

  /** Multi-predicate skipping read — [[readPruned]]'s AND-of-ranges form. */
  def readPrunedMulti(
      spark: SparkSession,
      path: String,
      preds: Seq[(String, Column, Column)]): DataFrame = {
    val (kept, _) = prunedFilesMulti(spark, path, preds)
    val base =
      if (kept.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(kept: _*)
    base.where(preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _))
  }

  /** (kept file list, total file count) for a closed range [lo, hi] on
    * `statCol`: a file survives iff its [min, max] interval intersects the
    * predicate interval. An all-null-stat file drops — a column of nulls
    * cannot satisfy a range predicate. Fails loudly when the manifest is
    * absent (a skipping read against an unindexed table is a deployment
    * bug, not a fallback case). */
  def prunedFiles(
      spark: SparkSession,
      path: String,
      statCol: String,
      lo: Column,
      hi: Column): (Seq[String], Long) =
    prunedFilesMulti(spark, path, Seq((statCol, lo, hi)))

  /** Range read through the manifest: scan ONLY the surviving files, then
    * apply the exact residual predicate (file stats admit false positives
    * at interval edges, never false negatives). Result is row-identical to
    * a full-scan filter — the skipping is purely an I/O plan change. */
  def readPruned(
      spark: SparkSession,
      path: String,
      statCol: String,
      lo: Column,
      hi: Column): DataFrame =
    readPrunedMulti(spark, path, Seq((statCol, lo, hi)))
}

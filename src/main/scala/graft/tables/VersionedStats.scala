package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-version file statistics for a [[VersionedTable]] — the Delta
  * per-file-stats-in-the-log design (stats ride the commit, not a mutable
  * sidecar), emulated as an immutable stats manifest per version under
  * `<dir>/_stats/v=<n>`: one row per data file of that version's manifest
  * with `n_rows` and min/max/non-null-count per stat column. What
  * [[SkippingIndex]] does for flat dirs, keyed instead by the version's
  * RELATIVE file list, which buys three things the flat layout can't give:
  * time travel (each version's stats are its own immutable row set),
  * vacuum-safety (no staleness window — the stats row set and the manifest
  * are checked 1:1 at read), and O(new files) maintenance
  * ([[refreshIncremental]] carries forward the stats of every file shared
  * with the previous statted version and reads back only the files the new
  * version added — the exact file-sharing structure commitAppend/
  * copy-on-write produce).
  *
  * 100 TB shape: the stats manifest is one row per file; a range read
  * prunes the FILE LIST driver-side before any scan plans (I/O ∝ selected
  * key range, not table), and daily stats maintenance costs one read-back
  * of the day's new files. */
object VersionedStats {

  private def statsRoot(dir: String)          = new Path(dir, "_stats")
  private def statsDir(dir: String, v: Long)  = new Path(statsRoot(dir), f"v=$v%05d")

  /** Resolve logical stat columns to the PHYSICAL footer names of version
    * `v` — the key every stats artifact stores under. Physical names are
    * immutable once a file exists, so a RENAME COLUMN costs stats nothing:
    * the manifest stays valid and reads re-resolve through the current
    * mapping. A column DROPPED from the declared schema stops resolving
    * (its stats rows become unreachable dead weight, swept by the next
    * refresh), and a re-added same-named column gets a FRESH physical name
    * (tombstone guard), so stale stats can never answer for it. On tables
    * with no declared schema the mapping is the identity. */
  private def physicalStatCols(dir: String, v: Long,
      statCols: Seq[String]): Seq[(String, String)] = {
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val m = VersionedTable.columnMappingAt(dir, v)
    statCols.map { c =>
      if (m.nonEmpty) c -> m.getOrElse(lc(c), sys.error(
        s"VersionedStats: column `$c` is not in version $v's declared schema " +
          s"(have: ${m.keys.toSeq.sorted.mkString(", ")}) — dropped columns " +
          "have no stats; re-added columns need a fresh refresh"))
      else c -> c
    }
  }

  /** Physical stat columns plus their declared types, for null-filling:
    * files written BEFORE an ADD COLUMN don't carry the new physical
    * column at all, yet their stats rows must still have its
    * (all-null → cnt 0) slots so the manifest keeps one uniform schema. */
  private def physicalStatColsTyped(dir: String, v: Long, statCols: Seq[String])
      : Seq[(String, org.apache.spark.sql.types.DataType)] = {
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val declared = VersionedTable.declaredSchemaAt(dir, v)
    physicalStatCols(dir, v, statCols).map { case (c, p) =>
      p -> declared.flatMap(_.fields.find(_.name.equalsIgnoreCase(lc(c))))
        .map(_.dataType).getOrElse(org.apache.spark.sql.types.NullType)
    }
  }

  private def statAggs(statCols: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(s"`$c`")).as(s"min_$c"), max(col(s"`$c`")).as(s"max_$c"),
        count(col(s"`$c`")).as(s"cnt_$c")))

  /** Versions (ascending) that currently have a published stats manifest. */
  def stattedVersions(dir: String): Seq[Long] = {
    val root = statsRoot(dir)
    val fs   = root.getFileSystem(FsIO.hadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(s => "^v=(\\d+)$".r.findFirstMatchIn(s.getPath.getName).map(_.group(1).toLong))
      .sorted
  }

  private def writeStats(spark: SparkSession, dir: String, v: Long, stats: DataFrame): Unit = {
    val fs  = statsRoot(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(statsRoot(dir), f"v=$v%05d.__tmp")
    stats.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(statsDir(dir, v), true)
    if (!fs.rename(tmp, statsDir(dir, v)))
      sys.error(s"VersionedStats: could not publish stats for version $v in $dir")
  }

  private def readBack(spark: SparkSession, dir: String, rels: Seq[String],
      statCols: Seq[(String, org.apache.spark.sql.types.DataType)]): DataFrame = {
    val aggs = statAggs(statCols.map(_._1))
    val byAbs = rels.map(rel =>
      new Path(new Path(dir), rel).toUri.getPath -> rel).toMap
    val relOf = udf((f: String) =>
      byAbs.getOrElse(new Path(new java.net.URI(f)).toUri.getPath, null: String))
    val paths = rels.map(rel => new Path(new Path(dir), rel).toString)
    // A schema-less parquet read infers its schema from ONE footer (the
    // lexicographically-first file — an arbitrary UUID draw here), so on a
    // file set mixing pre/post-ADD-COLUMN files the sampled footer can
    // predate the evolution and project the new column away for EVERY
    // file, recording cnt=0 even for files holding real values. Pin the
    // read to the declared physical schema instead: the parquet reader
    // then null-fills the column per file that lacks it and reads it
    // wherever it exists.
    import org.apache.spark.sql.types.{NullType, StructField, StructType}
    val pinnable = statCols.forall(_._2 != NullType)
    val raw =
      if (pinnable)
        spark.read
          .schema(StructType(statCols.map { case (p, dt) => StructField(p, dt) }))
          .parquet(paths: _*)
      else
        // no declared schema pins a type (legacy table, so no evolution
        // path exists either) — merge every footer so a column present in
        // ANY file survives and per-file absences null-fill
        spark.read.option("mergeSchema", "true").parquet(paths: _*)
    val have = raw.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    // a stat column present in NO file at all (mergeSchema branch only):
    // null-fill so the stats row still carries its slots (cnt 0, min/max null)
    val filled = statCols.foldLeft(raw) { case (df, (p, dt)) =>
      if (have(p.toLowerCase(java.util.Locale.ROOT))) df
      else df.withColumn(p, lit(null).cast(dt))
    }
    filled
      .groupBy(relOf(input_file_name()).as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** (Re)build the stats manifest for `version` (default latest) from a
    * full read-back of its files. The bootstrap / re-key path; steady-state
    * maintenance is [[refreshIncremental]]. */
  def refresh(spark: SparkSession, dir: String, statCols: Seq[String],
      version: Option[Long] = None): Long = {
    require(statCols.nonEmpty, "VersionedStats: need at least one stat column")
    val v = version.getOrElse(VersionedTable.latestVersion(dir)
      .getOrElse(sys.error(s"VersionedStats: $dir has no committed version")))
    // stats read raw footers, so they aggregate — and the manifest keys —
    // on PHYSICAL names, resolved from the logical statCols through the
    // version's column mapping; renames never invalidate a manifest
    val phys = physicalStatColsTyped(dir, v, statCols)
    writeStats(spark, dir, v, readBack(spark, dir, VersionedTable.filesOf(dir, v), phys))
    v
  }

  /** Stats for the LATEST version at O(new files) cost: rows for files
    * shared with the newest already-statted version carry forward verbatim
    * (their files are immutable), only the latest version's fresh files are
    * read back. Falls back to a full [[refresh]] when nothing is statted
    * yet or the stat column set changed. */
  def refreshIncremental(spark: SparkSession, dir: String,
      statCols: Seq[String]): Long = {
    require(statCols.nonEmpty, "VersionedStats: need at least one stat column")
    val v = VersionedTable.latestVersion(dir)
      .getOrElse(sys.error(s"VersionedStats: $dir has no committed version"))
    val phys = physicalStatColsTyped(dir, v, statCols)
    val base = stattedVersions(dir).filter(_ < v).lastOption
    base match {
      case None => refresh(spark, dir, statCols)
      case Some(w) =>
        val prev = spark.read.parquet(statsDir(dir, w).toString)
        // physical-keyed carry-forward: the previous manifest must cover
        // the SAME physical columns (a rename alone changes nothing here;
        // a re-added column's fresh physical name forces the full re-key)
        if (!phys.forall { case (c, _) => prev.columns.contains(s"min_$c") })
          refresh(spark, dir, statCols) // column set changed: re-key
        else {
          val rels    = VersionedTable.filesOf(dir, v)
          val prevSet = VersionedTable.filesOf(dir, w).toSet
          val (carried, fresh) = rels.partition(prevSet.contains)
          val carriedDf = prev.where(col("file").isin(carried: _*))
          val stats =
            if (fresh.isEmpty) carriedDf
            else carriedDf.unionByName(readBack(spark, dir, fresh, phys))
          writeStats(spark, dir, v, stats)
          v
        }
    }
  }

  /** METADATA-ONLY AGGREGATE (Delta's "answer count(*)/min/max from the
    * log"): total rows, per-column non-null count / min / max for version
    * `v` (latest by default), resolved entirely from the stats manifest —
    * ZERO data-file I/O, the query a 100 TB dashboard asks hourly.
    * Soundness guards: [[loadStats]] proves the manifest covers EXACTLY
    * the version's file set (a stale manifest fails, never silently
    * misses rows), and any DELETION VECTOR on the version refuses loudly —
    * stored stats describe physical files, and masked rows would falsify
    * counts (compact the masks away first). Same output shape as
    * [[SkippingIndex.statsOnlyAggregate]]: one row per column. */
  def statsOnlyAggregate(spark: SparkSession, dir: String,
      statCols: Seq[String], version: Option[Long] = None): DataFrame = {
    require(statCols.nonEmpty, "statsOnlyAggregate: need at least one column")
    val v = version.getOrElse(VersionedTable.latestVersion(dir)
      .getOrElse(sys.error(s"statsOnlyAggregate: $dir has no committed version")))
    val masked = VersionedTable.entriesOf(dir, v).filter(_._2.nonEmpty)
    require(masked.isEmpty,
      s"statsOnlyAggregate: version $v of $dir has deletion vectors on " +
        s"${masked.size} file(s) — physical stats would count masked rows; " +
        "run commitCompact (or compactDeletionVectors + refresh) first, or " +
        "aggregate through a real read")
    val stats = loadStats(spark, dir, v)
    // aggregate under the PHYSICAL key, surface the LOGICAL name — a
    // renamed table answers for its current names from the same manifest
    val byPhys = physicalStatCols(dir, v, statCols)
    byPhys.foreach { case (c, p) => require(stats.columns.contains(s"min_$p"),
      s"statsOnlyAggregate: column $c is not in version $v's stats manifest — " +
        "refresh with it included") }
    val aggs = sum(col("n_rows")).cast("long").as("__n") +: byPhys.flatMap { case (_, p) => Seq(
      sum(col(s"cnt_$p")).cast("long").as(s"__${p}__cnt"),
      min(expr(s"try_cast(`min_$p` AS DOUBLE)")).as(s"__${p}__min"),
      max(expr(s"try_cast(`max_$p` AS DOUBLE)")).as(s"__${p}__max")) }
    val one = stats.agg(aggs.head, aggs.tail: _*)
    val perCol = byPhys.map { case (c, p) => struct(
      lit(c).as("column"), col("__n").as("n_rows"),
      col(s"__${p}__cnt").as("n_notnull"),
      col(s"__${p}__min").as("min_d"), col(s"__${p}__max").as("max_d")) }
    one.select(explode(array(perCol: _*)).as("s")).select(col("s.*"))
  }

  private def loadStats(spark: SparkSession, dir: String, v: Long): DataFrame = {
    // the manifest keys on PHYSICAL names (immutable), so a column mapping
    // needs no refusal here — callers resolve through physicalStatCols
    val sd = statsDir(dir, v)
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sd),
      s"VersionedStats: no stats manifest for version $v of $dir — run refresh/refreshIncremental")
    val stats = spark.read.parquet(sd.toString)
    // 1:1 integrity check against the version's manifest — a stats set that
    // drifted (partial write, foreign tool) must fail, not silently miss rows
    val rels = VersionedTable.filesOf(dir, v).toSet
    val statted = stats.select("file").collect().map(_.getString(0)).toSet
    require(statted == rels,
      s"VersionedStats: stats manifest for version $v of $dir does not match its " +
        s"file manifest (${(rels -- statted).size} missing, ${(statted -- rels).size} extra) " +
        "— re-run refresh")
    stats
  }

  /** Relative files of `version` whose [min, max] intersects EVERY
    * (col, lo, hi) predicate, plus the version's total file count. */
  def prunedFiles(spark: SparkSession, dir: String,
      preds: Seq[(String, Column, Column)],
      version: Option[Long] = None): (Seq[String], Long) = {
    require(preds.nonEmpty, "VersionedStats: need at least one predicate")
    val v = version.getOrElse(VersionedTable.latestVersion(dir)
      .getOrElse(sys.error(s"VersionedStats: $dir has no committed version")))
    val stats = loadStats(spark, dir, v)
    val physOf = physicalStatCols(dir, v, preds.map(_._1)).toMap
    preds.foreach { case (c, _, _) => require(stats.columns.contains(s"min_${physOf(c)}"),
      s"VersionedStats: column $c is not statted for version $v — refresh including it") }
    val cond = preds.map { case (c, lo, hi) =>
      col(s"max_${physOf(c)}") >= lo && col(s"min_${physOf(c)}") <= hi
    }.reduce(_ && _)
    val kept = stats.where(cond).select("file").collect().map(_.getString(0)).toSeq
    require(kept.size <= SkippingIndex.MaxPrunedFiles,
      s"VersionedStats: pruning kept ${kept.size} files — the clustering does not " +
        "discriminate for this predicate; re-cluster (commitCompact clusterBy) or read plainly")
    (kept, stats.count())
  }

  /** Range read through the stats manifest: scan ONLY surviving files, then
    * the exact residual predicate. Row-identical to a full-scan filter.
    * Stats describe PHYSICAL files, so under deletion vectors min/max stay
    * conservative (a masked row can only widen, never narrow, the range) —
    * pruning is sound; the kept files then read through the version's DV
    * masks so deleted rows never surface. */
  def readPruned(spark: SparkSession, dir: String,
      preds: Seq[(String, Column, Column)],
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(VersionedTable.latestVersion(dir).get)
    val (kept, _) = prunedFiles(spark, dir, preds, Some(v))
    val base =
      if (kept.isEmpty) VersionedTable.read(spark, dir, Some(v)).limit(0)
      else {
        val keptSet = kept.toSet
        // pass the declared schema so a mapped table's kept files read
        // back under LOGICAL names (the residual predicate's names)
        VersionedTable.readEntries(spark, dir,
          VersionedTable.entriesOf(dir, v).filter(e => keptSet(e._1)),
          VersionedTable.declaredSchemaAt(dir, v))
      }
    base.where(preds.map { case (c, lo, hi) => col(s"`$c`") >= lo && col(s"`$c`") <= hi }
      .reduce(_ && _))
  }
}

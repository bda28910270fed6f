package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-management layer (SURVEY.md §2a S7–S13): managed Parquet tables
  * standing in for the reference's Delta tables. This environment ships no
  * Delta jar (SURVEY.md §1), so the specific Delta behaviors the reference
  * exercises are emulated — with file-commit-protocol (not transaction-log)
  * guarantees, scoped to exactly what the reference uses.
  */
object TableManager {

  /** S7: overwrite + create managed table
    * (`write.format("delta").mode("overwrite").saveAsTable`,
    * `00. Explore.py:66`). */
  def overwriteTable(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(table)

  /** S8: `.option("mergeSchema", true)` overwrite emulation
    * (`01. Ingest.py:180`, `03. Inference.py:46-51`): the new table schema is
    * the union of the existing table's schema and the incoming one; columns
    * the incoming data lacks are null-filled with the existing type. */
  def overwriteTableMergeSchema(spark: SparkSession, df: DataFrame, table: String): Unit = {
    if (!spark.catalog.tableExists(table)) { overwriteTable(df, table); return }
    val existing = spark.table(table).schema
    val incoming = df.schema
    // Name matching must follow the analyzer's case sensitivity (default:
    // INsensitive): a case-sensitive contains() would classify 'Score' as
    // missing next to incoming 'score', null it out via withColumn (which
    // resolves case-insensitively and REPLACES the real column), then emit
    // duplicate columns. Delta's mergeSchema matches case-insensitively.
    val caseSensitive = spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String)  = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val incomingN = incoming.fieldNames.map(norm).toSet
    val existingN = existing.fieldNames.map(norm).toSet
    val missing  = existing.filterNot(f => incomingN.contains(norm(f.name)))
    val widened  = missing.foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    // Stable column order: existing columns first, then genuinely new ones.
    // Existing columns are aliased BACK to their existing-schema casing:
    // under the case-insensitive analyzer, col("Score") happily resolves to
    // an incoming 'score' attribute and the evolved table would silently
    // adopt the incoming casing — Delta's mergeSchema keeps the existing one.
    val aligned = widened.select(
      (existing.fieldNames.map(n => col(s"`$n`").as(n)) ++
        incoming.fieldNames.filterNot(n => existingN.contains(norm(n))).map(n => col(s"`$n`")))
        .toIndexedSeq: _*)
    // Overwriting the table being read requires materializing the plan first
    // (Delta does this via the transaction log; we stage through a temp view
    // of collected files by writing to a staging dir and swapping).
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val staging   = s"$warehouse/__staging_$table"
    aligned.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").format("parquet").saveAsTable(table)
    deleteDir(spark, staging)
  }

  /** Atomic rename-swap shared by the compaction procedures: stage the
    * current dir to `.bak`, move the rewritten `tmp` into place, roll back
    * on failure. One copy of the crash-safety-critical protocol. */
  private def swapDir(spark: SparkSession, dir: String, tmp: Path, bak: Path, label: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // CRASH RECOVERY for the two-rename window: a kill between
    // rename(dir→bak) and rename(tmp→dir) leaves the table directory
    // MISSING with the data stranded in bak — the next swap attempt (or
    // any caller reaching this) restores the previous state first, so the
    // window is self-healing instead of a manual repair
    if (!fs.exists(new Path(dir)) && fs.exists(bak)) {
      require(fs.rename(bak, new Path(dir)),
        s"$label: could not recover $dir from its interrupted-swap backup $bak")
    }
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(new Path(dir), bak)) sys.error(s"$label: could not stage $dir")
    if (!fs.rename(tmp, new Path(dir))) { fs.rename(bak, new Path(dir)); sys.error(s"$label: swap failed for $dir") }
    fs.delete(bak, true)
  }

  /** Default write-lease length for the swap-protocol writers. Since r17
    * the data-proportional holders (the compact* family, upsert/delete
    * Partitioned, SkippingIndex.appendClustered) renew it every
    * `leaseMs/3` ([[FsIO.withWriteLockHeartbeat]]) — 15 min bounds the
    * longest tolerated heartbeat STALL, not the stage-write length, so a
    * multi-hour 100 TB rewrite never looks crashed while a genuinely
    * crashed holder is healable within one lease. */
  val DefaultLockLeaseMs: Long = 15L * 60 * 1000

  /** S10: OPTIMIZE-style small-file compaction (`00. Explore.py:89-90`,
    * `01. Ingest.py:188-189`) for a path table: rewrite the directory into
    * `targetFiles` files via an atomic rename swap. A maintenance procedure,
    * not a Catalyst rule (SURVEY.md §4). Single-writer by lease lock — a
    * second writer entering the swap mid-flight would interleave renames. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit =
    // HEARTBEAT lease (r17): the rewrite inside the lock is
    // data-proportional — on a 100 TB table it outlives any fixed lease,
    // and a rival takeover would share the .__compact_tmp path with the
    // still-running writer (clobbered stage, partial table published by
    // the interleaved swap). Renewal keeps a live writer unstealable;
    // verifyOwned aborts a genuinely lost writer BEFORE its swap.
    FsIO.withWriteLockHeartbeat(dir, "compact", lockLeaseMs) { hb =>
      val tmp = new Path(dir + ".__compact_tmp")
      spark.read.parquet(dir).repartition(targetFiles).write.mode("overwrite").parquet(tmp.toString)
      hb.verifyOwned("the compact swap")
      swapDir(spark, dir, tmp, new Path(dir + ".__compact_bak"), "compact")
    }

  /** [[compact]] for a PARTITIONED path table (e.g. the IVF index's
    * `ivf_cell=` layout, whose per-cell file count grows with every
    * incremental append): rewrites each partition's rows into contiguous
    * few files while PRESERVING the partition directory structure —
    * `compact` would flatten it and destroy partition pruning. One shuffle
    * on the partition column (each partition value lands wholly in one
    * task → one file per partition dir), then the same lease-locked atomic
    * rename swap. */
  def compactPartitioned(spark: SparkSession, dir: String, partitionCol: String,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit =
    FsIO.withWriteLockHeartbeat(dir, "compactPartitioned", lockLeaseMs) { hb =>
      val tmp = new Path(dir + ".__compact_tmp")
      spark.read.parquet(dir)
        .repartition(col(partitionCol))
        .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp.toString)
      hb.verifyOwned("the compactPartitioned swap") // see compact: shared-tmp hazard
      swapDir(spark, dir, tmp, new Path(dir + ".__compact_bak"), "compactPartitioned")
    }

  /** Small-file maintenance for the STREAMING dedup indexes
    * (`StreamingInference.streamNearDedup` / `streamImageDedup`), whose
    * `batch_id=` partitions accrete one per micro-batch forever: fold every
    * partition EXCEPT the newest into the sentinel partition
    * `batch_id=-1`, each as few contiguous files.
    *
    * Why the newest partition survives untouched: the streams' replay
    * contract excludes only the CURRENT batch id when probing
    * (`batch_id =!= batchId`), and the only partition that can belong to
    * an un-checkpointed (hence replayable) batch is the newest one —
    * earlier batches committed before later ones ran. Folding the newest
    * into the sentinel would let its crash-replay probe its own partial
    * signatures (self-match → mass drop); leaving it keeps the exclusion
    * rule airtight. The sentinel can never collide with a real batch id
    * (ids are ≥ 0) and re-folds idempotently on the next compaction.
    * Same lease-locked atomic rename swap as [[compactPartitioned]]. */
  def compactBatchIndex(spark: SparkSession, dir: String, targetFiles: Int = 1,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit =
    FsIO.withWriteLockHeartbeat(dir, "compactBatchIndex", lockLeaseMs) { hb =>
      val raw = spark.read.parquet(dir)
      require(raw.columns.contains("batch_id"),
        s"$dir is not a batch-partitioned dedup index (no batch_id)")
      // partition discovery may infer batch_id as INT — normalize to the
      // writers' LONG so the sentinel partition name stays consistent
      val all = raw.withColumn("batch_id", col("batch_id").cast("long"))
      val maxRow = all.agg(max("batch_id")).head()
      require(!maxRow.isNullAt(0), s"$dir holds no index rows — nothing to compact")
      val maxId = maxRow.getLong(0)
      val tmp   = new Path(dir + ".__compact_tmp")
      all.where(col("batch_id") =!= maxId).drop("batch_id")
        .withColumn("batch_id", lit(-1L))
        .repartition(targetFiles)
        .unionByName(all.where(col("batch_id") === maxId))
        .write.mode("overwrite").partitionBy("batch_id").parquet(tmp.toString)
      hb.verifyOwned("the compactBatchIndex swap") // see compact: shared-tmp hazard
      swapDir(spark, dir, tmp, new Path(dir + ".__compact_bak"), "compactBatchIndex")
    }

  /** OPTIMIZE ZORDER BY emulation: rewrite a path table into `targetFiles`
    * files range-partitioned and sorted by the z-order of two columns, so
    * each parquet file's min/max column statistics cover a narrow range of
    * BOTH columns — filters on either column skip most files/row-groups at
    * scan time. This is the Delta-style data-layout optimization that turns
    * a 100 TB full scan into a handful of file reads for selective
    * predicates; here it is the same atomic rename-swap procedure as
    * [[compact]]. */
  def compactZOrder(spark: SparkSession, dir: String, colA: String, colB: String, targetFiles: Int,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit =
    FsIO.withWriteLockHeartbeat(dir, "compactZOrder", lockLeaseMs) { hb =>
    val df  = spark.read.parquet(dir)
    val tmp = new Path(dir + ".__zorder_tmp")
    zLayout(df, colA, colB, targetFiles, "compactZOrder")
      .write.mode("overwrite").parquet(tmp.toString)
    hb.verifyOwned("the compactZOrder swap") // see compact: shared-tmp hazard
    swapDir(spark, dir, tmp, new Path(dir + ".__zorder_bak"), "compactZOrder")
  }

  /** Re-layout `df` range-partitioned and sorted by the z-order of two
    * numeric columns — kept as the 2-column entry; delegates to
    * [[zLayoutN]] with an IDENTICAL bit layout (dimension d of bit i lands
    * at z-bit i·N+d, which for N=2 reproduces the original even/odd
    * interleave exactly). */
  private[tables] def zLayout(df: org.apache.spark.sql.DataFrame,
      colA: String, colB: String, targetFiles: Int, op: String): org.apache.spark.sql.DataFrame =
    zLayoutN(df, Seq(colA, colB), targetFiles, op)

  /** N-COLUMN z-order (Delta's `ZORDER BY (c1, ..., cN)`): interleave each
    * column's range-normalized bucket rank bit-by-bit — dimension d's bit i
    * lands at z-bit i·N+d — so rows close in EVERY listed dimension are
    * close in the one-dimensional sort, and each written file's min/max
    * stats cover a narrow range of ALL the columns. Bits per dimension =
    * min(16, 62/N) (the z stays in a long; more dimensions trade per-axis
    * resolution, the standard z-order cost). Codegen'd bit arithmetic, no
    * UDF; one stats aggregate broadcast as literals. */
  private[tables] def zLayoutN(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String], targetFiles: Int, op: String): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty && cols.size <= 7,
      s"$op: ZORDER BY takes 1-7 columns, got ${cols.size}")
    require(cols.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.size == cols.size,
      s"$op: duplicate ZORDER BY column in ${cols.mkString(", ")}")
    // z-ordering is defined for numeric range-bucketable columns only —
    // reject anything else up front with a clear message (an ANSI cast
    // failure deep in the stats job would be opaque)
    cols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"$op: column '$c' is ${df.schema(c).dataType.catalogString}; z-order requires numeric columns")
    }
    // non-finite discipline: NaN would poison min/max and then fail the
    // ANSI cast to long, and an INFINITY makes the bucket expression
    // Inf/Inf = NaN (same crash) or — with an infinite lo — NaNs EVERY
    // row; null both out so degenerate rows cluster into one range
    def clean(c: String) = {
      val d = nanvl(col(c).cast("double"), lit(null).cast("double"))
      when(abs(d) === Double.PositiveInfinity, lit(null).cast("double")).otherwise(d)
    }
    val aggs  = cols.flatMap(c => Seq(min(clean(c)), max(clean(c))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    require(!stats.anyNull,
      s"$op: ${cols.mkString("/")} have no non-null, non-NaN values to bucket")
    val n = cols.size
    val bitsPer   = math.min(16, 62 / n)
    val maxBucket = (1L << bitsPer) - 1
    // cleaned columns feed the bucket arithmetic too: a raw NaN row would
    // reach the ANSI cast-to-long and crash the rewrite; cleaned, a
    // NaN/null row gets a null z and clusters into one range
    def bucket(d: Int): Column = {
      val (lo, hi) = (stats.getDouble(2 * d), stats.getDouble(2 * d + 1))
      if (hi <= lo) lit(0L)
      else least(greatest(((clean(cols(d)) - lit(lo)) / lit(hi - lo) * lit(maxBucket.toDouble))
        .cast("long"), lit(0L)), lit(maxBucket))
    }
    val buckets = (0 until n).map(bucket)
    val z = (for { i <- 0 until bitsPer; d <- 0 until n } yield
      shiftright(buckets(d), i).bitwiseAND(1L) * lit(1L << (i * n + d))
    ).reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Number of data files currently backing a path table (compaction metric). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir)).count(s => s.getPath.getName.endsWith(".parquet"))
  }

  /** Bucketed managed table: pre-shuffles once at write time so subsequent
    * equi-joins and aggregations on `bucketCol` between co-bucketed tables
    * plan WITHOUT an Exchange — the decisive layout optimization for
    * repeated large-fact joins at 100 TB (pay one shuffle at ingest, never
    * again). Verify with `.explain`: no `Exchange` above the scans. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** S11: run `body` with a specific Parquet compression codec, restoring the
    * previous codec after — the reference brackets binary-payload writes with
    * `uncompressed` (`01. Ingest.py:176-183`: JPEG bytes don't recompress). */
  def withParquetCodec[T](spark: SparkSession, codec: String)(body: => T): T = {
    val key  = "spark.sql.parquet.compression.codec"
    val prev = spark.conf.get(key)
    spark.conf.set(key, codec)
    try body
    finally spark.conf.set(key, prev)
  }

  /** S13: drop table + recursive dir delete (`%fs rm -r`,
    * `03. Inference.py:62-67`). */
  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    // sibling artifacts (the write-lease lock, its crashed-renewal temps,
    // and any append stages) live NEXT TO the table dir and would linger
    // as orphans past the delete
    val lock = new Path(dir + ".__write_lock")
    fs.delete(lock, false)
    FsIO.sweepRenewTemps(fs, lock)
    fs.delete(TimePartitioned.appendStageRoot(dir), true)
    // a versioned table recreated at this path could collide with cached
    // commit-entry text (same version + same-millisecond commit name)
    VersionedTable.invalidateEntryCache(dir)
  }

  // ---- partition-scoped upsert target (the streaming-CDC table layout) ----
  //
  // A CDC stream's target must absorb small keyed update batches without
  // rewriting itself: lay the table out partitioned by a stable key bucket
  // (`key_bucket = pmod(xxhash64(keys), nBuckets)`), merge each batch against
  // ONLY the buckets its keys hash into, and swap just those partition
  // directories. Per batch, I/O is O(touched buckets), not O(target) — at
  // 100 TB with 4096 buckets, a 10-key batch rewrites ≤10 buckets (~0.25% of
  // the table), and every other partition's files are untouched bytes.
  // Crash-safety: the staged files are fully written BEFORE a marker lists
  // the buckets being swapped; recovery rolls the swap forward from the
  // marker (stage survives), and a re-run of the uncommitted micro-batch
  // re-merges idempotently.

  /** Stable bucket column over the key columns. xxhash64 never yields null
    * (null keys hash to the seed), so every row lands in a real partition. */
  def keyBucket(keyCols: Seq[String], nBuckets: Int): Column =
    pmod(xxhash64(keyCols.map(c => col(s"`$c`")): _*), lit(nBuckets.toLong)).cast("int")

  /** Lay out the initial target: one shuffle by bucket, then a partitioned
    * write (each bucket directory gets contiguous files), plus a `_layout`
    * sidecar recording (nBuckets, keyCols) — [[upsertPartitioned]] refuses
    * to merge under a different layout, because a mismatched bucket count
    * would hash a key into the wrong partition and silently DUPLICATE it
    * (the lookup misses, the "insert" lands in a new bucket while the old
    * row survives in the original one). */
  def initPartitionedTarget(df: DataFrame, targetDir: String, keyCols: Seq[String], nBuckets: Int): Unit = {
    df.withColumn("key_bucket", keyBucket(keyCols, nBuckets))
      .repartition(col("key_bucket"))
      .write.mode("overwrite").partitionBy("key_bucket").parquet(targetDir)
    // The sidecar must land after the data (overwrite clears the dir) but
    // atomically: write-to-temp-then-rename, so no reader ever observes a
    // partially written layout record. A crash in the window between the
    // data write and this rename leaves a target WITHOUT a sidecar — which
    // requireLayout treats as a hard error, not a bypassed check.
    val layout = new Path(targetDir, "_layout")
    val tmp    = new Path(targetDir, "_layout.tmp")
    FsIO.writeText(tmp.toString, s"nBuckets=$nBuckets\nkeyCols=${keyCols.mkString(",")}\n")
    val fs = layout.getFileSystem(FsIO.hadoopConf())
    fs.delete(layout, false)
    if (!fs.rename(tmp, layout)) sys.error(s"initPartitionedTarget: could not publish $layout")
  }

  /** Every [[upsertPartitioned]] target MUST carry the `_layout` sidecar
    * [[initPartitionedTarget]] writes. A missing sidecar is a hard error
    * (crashed init, or a directory that was never initialized) — silently
    * skipping the check would let a mismatched nBuckets merge duplicate
    * keys across buckets, the exact failure the guard exists to stop. */
  private def requireLayout(targetDir: String, keyCols: Seq[String], nBuckets: Int): Unit =
    FsIO.readText(s"$targetDir/_layout") match {
      case None =>
        sys.error(s"upsertPartitioned: target $targetDir has no _layout sidecar — " +
          "it was not initialized by initPartitionedTarget (or init crashed before " +
          "publishing the sidecar). Re-run initPartitionedTarget before merging; " +
          "merging unguarded could silently duplicate keys across buckets")
      case Some(body) =>
        val fields = body.split("\n").map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
        val declared = (fields("nBuckets").toInt, fields("keyCols").split(",").toSeq)
        require(declared == ((nBuckets, keyCols)),
          s"upsertPartitioned: target $targetDir was initialized with " +
            s"(nBuckets=${declared._1}, keyCols=${declared._2.mkString(",")}) but this merge " +
            s"uses (nBuckets=$nBuckets, keyCols=${keyCols.mkString(",")}) — a layout mismatch " +
            "would silently duplicate keys across buckets")
    }

  private def upsertStageDir(targetDir: String) = targetDir + ".__upsert_stage"
  private def upsertMarker(targetDir: String)   = new Path(targetDir, "_merge_inprogress")

  /** Roll forward a swap interrupted by a crash: the marker file lists the
    * buckets being swapped and only exists while the fully-written stage
    * directory does. Any bucket whose staged partition is still present is
    * re-swapped (delete-then-atomic-rename is idempotent); buckets already
    * moved have no staged copy left and are skipped. Returns true if there
    * was orphaned state. Runs automatically at the start of every
    * [[upsertPartitioned]]. */
  def recoverPartitionedTarget(spark: SparkSession, targetDir: String): Boolean = {
    val fs     = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = upsertMarker(targetDir)
    val stage  = upsertStageDir(targetDir)
    if (!fs.exists(marker)) {
      // no marker ⇒ no swap in flight; a leftover stage dir is pre-marker
      // garbage from a crash during the stage write — safe to drop
      if (fs.exists(new Path(stage))) fs.delete(new Path(stage), true)
      return false
    }
    val in = fs.open(marker)
    val buckets = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).map(_.toInt).toSeq finally in.close()
    buckets.foreach { b =>
      val sp = new Path(stage, s"key_bucket=$b")
      if (fs.exists(sp)) {
        val tp = new Path(targetDir, s"key_bucket=$b")
        if (fs.exists(tp)) fs.delete(tp, true)
        if (!fs.rename(sp, tp)) sys.error(s"recoverPartitionedTarget: could not restore bucket $b")
      }
    }
    fs.delete(marker, false)
    fs.delete(new Path(stage), true)
    true
  }

  /** Merge `updates` (unique per key, NO `key_bucket` column — it derives
    * here) into a bucket-partitioned target: read only the touched buckets,
    * [[mergeUpsert]] against them, stage the rewritten buckets, then swap
    * just those partition directories. Untouched partitions' files are never
    * opened, rewritten, or moved. */
  def upsertPartitioned(
      spark: SparkSession,
      targetDir: String,
      updates: DataFrame,
      keyCols: Seq[String],
      nBuckets: Int,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit =
    // single-writer HEARTBEAT lease over recover + stage + swap: two
    // upserts interleaving the marker/rename steps could each roll forward
    // the other's half-finished swap, and the stage write is
    // touched-bucket-proportional (see compact for the renewal rationale)
    FsIO.withWriteLockHeartbeat(targetDir, "upsertPartitioned", lockLeaseMs) { hb =>
      recoverPartitionedTarget(spark, targetDir)
      requireLayout(targetDir, keyCols, nBuckets)
      // cache the (small) update batch: it feeds the touched-bucket probe AND
      // both mergeUpsert join branches during the stage write — uncached, a
      // reduceBatch shuffle upstream would re-run three times per micro-batch
      val withBucket = updates.withColumn("key_bucket", keyBucket(keyCols, nBuckets)).persist()
      try {
        // ONE probe job delivers the touched buckets AND proves source-key
        // uniqueness (bounded by nBuckets — driver-safe). Proving it here
        // lets mergeUpsert skip its per-branch window tripwire: the window
        // is a source-sized shuffle that both join branches recomputed —
        // two shuffles of every micro-batch, pure per-batch fixed cost.
        val probe = withBucket.groupBy("key_bucket").agg(
          count(lit(1)).as("__n"),
          count_distinct(struct(keyCols.map(c => col(s"`$c`")): _*)).as("__nk"))
          .collect()
        val dup = probe.find(r => r.getLong(1) != r.getLong(2))
        require(dup.isEmpty,
          "upsertPartitioned: duplicate source key(s) in bucket " +
            s"${dup.map(_.getInt(0)).getOrElse(-1)} — MERGE requires a unique " +
            "source per key; pre-aggregate the source")
        val touched = probe.map(_.getInt(0)).sorted
        if (touched.nonEmpty)
          upsertBuckets(spark, targetDir, withBucket, keyCols, touched,
            () => hb.verifyOwned("publishing the staged buckets"))
      } finally withBucket.unpersist(false)
    }

  private def upsertBuckets(
      spark: SparkSession,
      targetDir: String,
      withBucket: DataFrame,
      keyCols: Seq[String],
      touched: Array[Int],
      preCommit: () => Unit): Unit = {
    val current = spark.read.parquet(targetDir)
      .where(col("key_bucket").isin(touched.map(Int.box).toIndexedSeq: _*))
    // uniqueness was proven by the caller's probe — skip the window tripwire
    val merged = mergeUpsert(current, withBucket, keyCols, keysProvenUnique = true)
    commitStagedBuckets(spark, targetDir, merged, touched, "upsertPartitioned", preCommit)
  }

  /** Shared stage→marker→swap tail of the partition-scoped writers: write
    * the rewritten buckets to the stage dir, ensure every touched bucket
    * has a staged partition (an all-rows-deleted bucket stages EMPTY —
    * parquet's writer drops empty partitions, and skipping the swap would
    * resurrect the deleted rows), then the marker/rename/cleanup protocol
    * [[recoverPartitionedTarget]] rolls forward. */
  private def commitStagedBuckets(
      spark: SparkSession,
      targetDir: String,
      rewritten: DataFrame,
      touched: Array[Int],
      label: String,
      preCommit: () => Unit = () => ()): Unit = {
    val stage = upsertStageDir(targetDir)
    deleteDir(spark, stage)
    rewritten.repartition(col("key_bucket"))
      .write.mode("overwrite").partitionBy("key_bucket").parquet(stage)
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { b =>
      val sp = new Path(stage, s"key_bucket=$b")
      if (!fs.exists(sp)) fs.mkdirs(sp) // bucket emptied: stage an empty dir
    }
    // ownership gate BEFORE the marker: the marker is the roll-forward
    // commit point, and a writer whose lease was seized mid-stage-write
    // may be publishing a stage a rival has since clobbered
    preCommit()
    // marker AFTER the stage is fully written: its existence is the recovery
    // contract ("stage is complete — roll forward")
    FsIO.writeText(upsertMarker(targetDir).toString, touched.mkString("\n"))
    touched.foreach { b =>
      val sp = new Path(stage, s"key_bucket=$b")
      val tp = new Path(targetDir, s"key_bucket=$b")
      if (fs.exists(tp)) fs.delete(tp, true)
      if (!fs.rename(sp, tp)) sys.error(s"$label: swap failed for bucket $b")
    }
    fs.delete(upsertMarker(targetDir), false)
    fs.delete(new Path(stage), true)
  }

  /** Key-addressed DELETE (the GDPR right-to-be-forgotten shape) over a
    * bucket-partitioned target: read ONLY the buckets holding the doomed
    * keys, anti-join them out, and swap just those partitions — O(touched
    * buckets) I/O like [[upsertPartitioned]], same lease lock, marker
    * recovery, and crash-safe rename protocol. A bucket whose every row
    * dies swaps in as an empty partition rather than being skipped (the
    * correctness trap [[commitStagedBuckets]] documents). */
  def deletePartitioned(
      spark: SparkSession,
      targetDir: String,
      keys: DataFrame,
      keyCols: Seq[String],
      nBuckets: Int,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit =
    FsIO.withWriteLockHeartbeat(targetDir, "deletePartitioned", lockLeaseMs) { hb =>
      recoverPartitionedTarget(spark, targetDir)
      requireLayout(targetDir, keyCols, nBuckets)
      val delKeys = keys.select(keyCols.map(col): _*).distinct()
        .withColumn("key_bucket", keyBucket(keyCols, nBuckets)).persist()
      try {
        val touched = delKeys.select("key_bucket").distinct()
          .collect().map(_.getInt(0)).sorted // bounded by nBuckets — driver-safe
        if (touched.nonEmpty) {
          val current = spark.read.parquet(targetDir)
            .where(col("key_bucket").isin(touched.map(Int.box).toIndexedSeq: _*))
          // delete set is small by contract → broadcast anti join; the
          // target's payload never shuffles
          val remaining = current.join(
            broadcast(delKeys.select(keyCols.map(col): _*)), keyCols, "left_anti")
          commitStagedBuckets(spark, targetDir, remaining, touched, "deletePartitioned",
            () => hb.verifyOwned("publishing the staged buckets"))
        }
      } finally delKeys.unpersist(false)
    }

  /** Delta `MERGE INTO` emulation (upsert): WHEN MATCHED THEN UPDATE SET
    * <source columns>, WHEN NOT MATCHED THEN INSERT. The reference's storage
    * layer (Delta Lake) ships MERGE as its canonical upsert; on plain Parquet
    * we express the same semantics relationally, then the caller overwrites
    * the table ([[overwriteTable]]) for persistence.
    *
    * Result schema = target schema. For each matched key, non-key columns
    * present in `source` take the source value; columns absent from `source`
    * keep the target value. Source rows with no target match are inserted
    * (target-only columns null). Unmatched target rows pass through.
    *
    * 100 TB plan shape: NOT a full-outer join — Spark cannot broadcast
    * FullOuter, so that formulation sort-merge-shuffles the ENTIRE target
    * (payload columns included) even for a 10-row update batch. Instead:
    * update path = left-outer join (source broadcasts when small — the
    * common incremental-upsert case — and the target's rows never move);
    * insert path = left-anti of the source against the target's KEY
    * PROJECTION (column pruning means at worst the target ships keys only);
    * union the two. Worst case shuffles keys, never target payloads.
    *
    * Contract: `source` must contain all `keyCols` plus a subset of target
    * columns, and be unique per key. Like Delta MERGE, a duplicate source
    * key fails LOUDLY at execution time (a per-row assertion riding the
    * plan — silent fan-out of matched target rows would be corrupted
    * output); pre-aggregate the source to choose a winner.
    * `keysProvenUnique` (internal): a caller that has ALREADY proven source
    * keys unique (upsertPartitioned's touched-bucket probe doubles as the
    * proof) skips the window tripwire — the window is a source-sized
    * shuffle that BOTH join branches recompute, two shuffles of every
    * micro-batch in the streaming-upsert loop. */
  def mergeUpsert(target: DataFrame, source: DataFrame, keyCols: Seq[String],
      keysProvenUnique: Boolean = false): DataFrame = {
    val tCols = target.columns.toSeq
    // Membership checks follow the analyzer's case sensitivity (default:
    // INsensitive) — a source column cased differently from the target must
    // match here exactly as the join/select resolution below will match it,
    // not get spuriously rejected as "not in target schema".
    val caseSensitive = target.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val tColsN   = tCols.map(norm).toSet
    val srcColsN = source.columns.map(norm).toSet
    val keyColsN = keyCols.map(norm).toSet
    val extra = source.columns.filterNot(c => tColsN.contains(norm(c)))
    require(keyCols.forall(k => srcColsN.contains(norm(k))),
      s"mergeUpsert: source lacks key column(s) ${keyCols.filterNot(k => srcColsN.contains(norm(k))).mkString(", ")}")
    require(extra.isEmpty,
      s"mergeUpsert: source column(s) ${extra.mkString(", ")} not in target schema " +
        "(schema evolution goes through overwriteTableMergeSchema)")
    // string-qualified references (not df(...)): the source typically derives
    // from the target (read-modify-upsert), and shared-lineage attribute ids
    // would make unqualified references ambiguous after the join. Backticks
    // keep dotted column names from parsing as nested-field access.
    def tc(c: String) = col(s"t.`$c`")
    def sc(c: String) = col(s"s.`$c`")
    val cond = keyCols.map(k => tc(k) <=> sc(k)).reduce(_ && _)
    // Match marker doubling as the duplicate-key tripwire: a source row may
    // carry null in any column (even, under null-safe keys, a key), so
    // nullness can't stand in for "matched"; and a window count over the
    // source's keys (source-sized shuffle only — the cheap side) detects
    // contract violations where they corrupt output instead of trusting docs.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(c => col(s"`$c`")): _*)
    val marked =
      if (keysProvenUnique) source.withColumn("__matched", lit(true))
      else source.withColumn("__matched",
        when(count(lit(1)).over(w) === 1, lit(true))
          .otherwise(raise_error(concat(
            lit("mergeUpsert: duplicate source key ("),
            concat_ws(",", keyCols.map(c => col(s"`$c`").cast("string")): _*),
            lit(") — MERGE requires a unique source per key; pre-aggregate the source")))
            .cast("boolean")))
    val updated = target.alias("t").join(marked.alias("s"), cond, "left_outer")
      // the filter is semantically a no-op (unmatched rows coalesce true;
      // matched rows' marker is true or raises) — its job is to REFERENCE
      // the marker so column pruning cannot drop the tripwire when the
      // source carries no non-key columns (a keys-only source with a dup
      // key used to fan the matched target row out silently)
      .where(coalesce(col("s.__matched"), lit(true)))
      .select(tCols.map { c =>
        if (!keyColsN.contains(norm(c)) && srcColsN.contains(norm(c)))
          when(col("s.__matched"), sc(c)).otherwise(tc(c)).as(c)
        else tc(c).as(c)
      }: _*)
    // insert path re-uses `marked` and filters on the (always-true) marker so
    // the duplicate tripwire also fires for dup keys that match no target row
    // (column pruning would silently drop an unreferenced assertion column)
    val inserts = marked.alias("s")
      .join(target.select(keyCols.map(c => col(s"`$c`")): _*).alias("t"), cond, "left_anti")
      .where(col("s.__matched"))
      .select(tCols.map { c =>
        if (srcColsN.contains(norm(c))) sc(c).as(c)
        else lit(null).cast(target.schema(c).dataType).as(c)
      }: _*)
    updated.unionByName(inserts)
  }
}

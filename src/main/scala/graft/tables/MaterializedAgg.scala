package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained materialized aggregate over a [[VersionedTable]]
  * source: `GROUP BY groupCols` with `COUNT(*)` and `SUM(c)` per requested
  * column, refreshed from the source's change feed instead of recomputed.
  *
  * The maintenance identity (classic incremental view maintenance, e.g.
  * Gupta & Mumick's counting algorithm): every change row decomposes into a
  * retraction of the OLD tuple (−1 count, −old values, on the old group) and
  * an assertion of the NEW tuple (+1, +new values, on the new group) —
  * removed has only the retraction, added only the assertion, updated both
  * (so a group-moving update debits one group and credits another, and a
  * no-op update cancels exactly). Folding these contributions into the
  * previous state with one more SUM yields the new state; groups whose
  * count reaches zero vanish. COUNT and SUM are the self-maintainable
  * aggregates under deletes; MIN/MAX are not (a deleted minimum forces a
  * group re-scan) and are maintained HYBRID instead (see below).
  *
  * MIN/MAX hybrid maintenance (`minMaxCols`): inserts self-maintain —
  * `new_min = least(state_min, min(inserted))` — but a retraction has no
  * inverse, so a group whose retracted values REACH its stored extremum
  * (`min(deleted) <= state_min` or `max(deleted) >= state_max`) is DIRTY
  * and its extrema are recomputed by re-scanning ONLY that group's rows at
  * the current source version (the standard IVM answer: self-maintained on
  * insert, O(affected groups) rescan on delete). The dirty test and the
  * clean-path merge ride ONE union-aggregate over (state ∪ change rows) —
  * no joins, so NULL group keys group correctly — and the rescan pushes an
  * IN filter on the group columns down to parquet, so with group-clustered
  * files the untouched groups' data pages are never read (the spec proves
  * this physically by corrupting them). Retracting a NULL never dirties
  * (NULL never contributes to MIN/MAX); an all-NULL group stores NULL
  * extrema natively, no `nn` sidecar needed.
  *
  * Sum columns must be EXACT types (integral or decimal) — refused loudly
  * for float/double, because incremental refresh must reach bit-identical
  * state regardless of how many refreshes the history was split into, and
  * FP addition is not associative. Decimal sums are stored at precision 38
  * (Spark's cap) with the source's scale; overflow past 38 digits fails
  * loudly under ANSI arithmetic rather than wrapping.
  *
  * Scale shape (100 TB): REFRESH cost is O(changed files) + O(groups) —
  * the change feed prunes every data file shared between the last-refreshed
  * source version and the current one before any I/O ([[VersionedTable
  * .changes]]), the contribution fold is one map-side-combined aggregation
  * over changed rows only, and the state merge is a union-aggregate over
  * O(groups) rows. A daily refresh of a corpus-wide aggregate reads only
  * the day's rewritten files; the corpus itself is never re-scanned. The
  * spec proves the pruning physically (shared source files corrupted on
  * disk; refresh still answers, full recompute fails). The view's own
  * versions ride [[VersionedTable.commit]], so the dashboard reading
  * version N is isolated from the refresh publishing N+1.
  */
object MaterializedAgg {

  final case class Meta(sourceDir: String, sourceVersion: Long,
      keyCols: Seq[String], groupCols: Seq[String], sumCols: Seq[String])

  private def metaDir(viewDir: String) = new Path(viewDir, "_matview")
  private def metaPath(viewDir: String, v: Long) =
    new Path(metaDir(viewDir), f"$v%05d.meta")

  private def writeMeta(viewDir: String, v: Long, m: Meta): Unit = {
    val fs  = metaDir(viewDir).getFileSystem(FsIO.hadoopConf())
    val tmp = new Path(metaDir(viewDir), f"$v%05d.meta.tmp")
    FsIO.writeText(tmp.toString,
      s"sourceDir=${m.sourceDir}\nsourceVersion=${m.sourceVersion}\n" +
        m.keyCols.map(c => s"key=$c\n").mkString +
        m.groupCols.map(c => s"group=$c\n").mkString +
        m.sumCols.map(c => s"sum=$c\n").mkString)
    if (!fs.rename(tmp, metaPath(viewDir, v)))
      sys.error(s"MaterializedAgg: could not publish meta for view version $v in $viewDir")
  }

  private def readMeta(viewDir: String, v: Long): Meta = {
    val body = FsIO.readText(metaPath(viewDir, v).toString)
      .getOrElse(sys.error(s"MaterializedAgg: no meta for view version $v in $viewDir"))
    val lines = body.split("\n").toSeq
    def one(k: String)  = lines.find(_.startsWith(s"$k=")).get.stripPrefix(s"$k=")
    def many(k: String) = lines.filter(_.startsWith(s"$k=")).map(_.stripPrefix(s"$k="))
    Meta(one("sourceDir"), one("sourceVersion").toLong,
      many("key"), many("group"), many("sum"))
  }

  /** Latest view version that has BOTH a committed state and a published
    * meta (a crash between the two leaves an orphan state commit that is
    * simply not the refresh base). */
  private def latestMeta(viewDir: String): (Long, Meta) = {
    val md = metaDir(viewDir)
    val fs = md.getFileSystem(FsIO.hadoopConf())
    require(fs.exists(md), s"MaterializedAgg: $viewDir is not a materialized view (no _matview)")
    val metaName = "^(\\d+)\\.meta$".r
    val vs = fs.listStatus(md).toSeq
      .flatMap(s => metaName.findFirstMatchIn(s.getPath.getName).map(_.group(1).toLong))
    require(vs.nonEmpty, s"MaterializedAgg: $viewDir has no published meta")
    val v = vs.max
    (v, readMeta(viewDir, v))
  }

  /** Canonical stored type for a sum column: decimals widen to the
    * precision-38 cap (so the stored type never creeps across refreshes);
    * integrals store as long. Floats are refused — see class doc. */
  private def canonType(c: String, dt: DataType): DataType = dt match {
    case d: DecimalType => DecimalType(38, d.scale)
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => LongType
    case other => sys.error(
      s"MaterializedAgg: sum column `$c` has non-exact type $other — " +
        "incremental refresh needs associative (exact) addition; cast to " +
        "decimal first (e.g. col.cast(\"decimal(18,2)\"))")
  }

  private def sumColName(c: String) = s"sum_$c"
  private def nnColName(c: String)  = s"nn_$c"

  /** Build the view: full aggregate of the source's latest version,
    * committed as view version 0. Returns the view version. State schema:
    * groupCols, `cnt` (rows per group), and per sum column `sum_<c>` /
    * `nn_<c>` (the non-null count that lets [[read]] report SQL-exact NULL
    * for an all-null group). */
  def create(spark: SparkSession, sourceDir: String, viewDir: String,
      keyCols: Seq[String], groupCols: Seq[String], sumCols: Seq[String],
      lockLeaseMs: Long = TableManager.DefaultLockLeaseMs): Long = {
    require(groupCols.nonEmpty, "MaterializedAgg: need at least one group column")
    require(keyCols.nonEmpty, "MaterializedAgg: need the source's key columns")
    val srcV = VersionedTable.latestVersion(sourceDir)
      .getOrElse(sys.error(s"MaterializedAgg: $sourceDir has no committed version"))
    val full  = VersionedTable.read(spark, sourceDir, Some(srcV))
    val types = canonTypes(full, sumCols)
    val state = full.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.flatMap { c =>
          Seq(sum(col(s"`$c`").cast(types(c))).cast(types(c)).as(sumColName(c)),
            count(col(s"`$c`")).as(nnColName(c)))
        }: _*)
    val v = VersionedTable.commit(spark, state, viewDir, lockLeaseMs)
    writeMeta(viewDir, v, Meta(sourceDir, srcV, keyCols, groupCols, sumCols))
    v
  }

  private def canonTypes(df: DataFrame, sumCols: Seq[String]): Map[String, DataType] =
    sumCols.map { c =>
      val f = df.schema.fields.find(_.name == c)
        .getOrElse(sys.error(s"MaterializedAgg: no column `$c` in the source"))
      c -> canonType(c, f.dataType)
    }.toMap

  /** Fold the source changes since the last refresh into the state and
    * commit the result as the next view version (returned). A no-op when
    * the source hasn't moved — returns the current view version without
    * committing. */
  def refresh(spark: SparkSession, viewDir: String,
      lockLeaseMs: Long = TableManager.DefaultLockLeaseMs): Long =
    // Serialize refreshes on the META scope (lock file `_matview.__write_lock`
    // inside the view dir), NOT on viewDir itself — the inner
    // VersionedTable.commit takes the viewDir lease, and the lease is not
    // reentrant. Two refreshes still exclude each other here, so the
    // read-state → fold → commit → meta sequence stays single-writer.
    FsIO.withWriteLock(metaDir(viewDir).toString, "MaterializedAgg.refresh", lockLeaseMs) {
      val (viewV, meta) = latestMeta(viewDir)
      val srcV = VersionedTable.latestVersion(meta.sourceDir)
        .getOrElse(sys.error(s"MaterializedAgg: source ${meta.sourceDir} has no versions"))
      require(srcV >= meta.sourceVersion,
        s"MaterializedAgg: source went backwards ($srcV < ${meta.sourceVersion})")
      if (srcV == meta.sourceVersion) viewV
      else {
        val ch = VersionedTable.changes(spark, meta.sourceDir,
          meta.sourceVersion, srcV, meta.keyCols, meta.groupCols ++ meta.sumCols)
        // sum-column types come from the change feed's own schema (`<c>_new`
        // carries the source type) — NOT from a source-table read, whose
        // footer resolution would touch files the feed just pruned (the
        // O(changed files) contract covers schema I/O too).
        val types = meta.sumCols.map { c =>
          val f = ch.schema.fields.find(_.name == s"${c}_new")
            .getOrElse(sys.error(s"MaterializedAgg: change feed lost column `$c`"))
          c -> canonType(c, f.dataType)
        }.toMap
        def contrib(side: String, sign: Int): DataFrame = {
          val kinds = if (sign > 0) Seq("added", "updated") else Seq("removed", "updated")
          ch.where(col("change_type").isin(kinds: _*)).select(
            meta.groupCols.map(g => col(s"`${g}_$side`").as(g)) ++
              Seq(lit(sign.toLong).as("cnt")) ++
              meta.sumCols.flatMap { c =>
                val v = col(s"`${c}_$side`").cast(types(c))
                Seq((v * sign).cast(types(c)).as(sumColName(c)),
                  when(v.isNotNull, sign.toLong).otherwise(0L).as(nnColName(c)))
              }: _*)
        }
        val state  = VersionedTable.read(spark, viewDir, Some(viewV))
        val merged = state.unionByName(contrib("old", -1)).unionByName(contrib("new", 1))
          .groupBy(meta.groupCols.map(c => col(s"`$c`")): _*)
          .agg(sum(col("cnt")).as("cnt"),
            meta.sumCols.flatMap { c =>
              Seq(sum(col(sumColName(c))).cast(types(c)).as(sumColName(c)),
                sum(col(nnColName(c))).as(nnColName(c)))
            }: _*)
          .where(col("cnt") > 0)
        val v = VersionedTable.commit(spark, merged, viewDir, lockLeaseMs)
        writeMeta(viewDir, v, meta.copy(sourceVersion = srcV))
        v
      }
    }

  /** The view's query surface: groupCols, `cnt`, and `sum_<c>` per sum
    * column — with an all-null group's sum reported as NULL (SQL SUM
    * semantics), which the raw state encodes via `nn_<c>`. Time travel via
    * `version` reads an older view state with its own meta. */
  def read(spark: SparkSession, viewDir: String,
      version: Option[Long] = None): DataFrame = {
    val v     = version.getOrElse(latestMeta(viewDir)._1)
    val meta  = readMeta(viewDir, v)
    val state = VersionedTable.read(spark, viewDir, Some(v))
    state.select(meta.groupCols.map(c => col(s"`$c`")) ++ Seq(col("cnt")) ++
      meta.sumCols.map(c =>
        when(col(nnColName(c)) > 0, col(sumColName(c))).as(sumColName(c))): _*)
  }
}

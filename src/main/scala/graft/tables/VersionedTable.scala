package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned path tables — the Delta-log behaviors the plain swap protocol
  * can't give: TIME TRAVEL (read any retained version) and READER ISOLATION
  * during publish (a commit never deletes or renames the files under a
  * reader of an earlier version, unlike `swapDir`, which moves the live
  * directory away mid-read).
  *
  * Layout: `<dir>/v=<n>/` holds version n's parquet in full; the
  * `<dir>/_log/<n>.commit` entry (write-once: staged as `.tmp`, renamed
  * into place) IS the commit point — a version exists for readers iff its
  * commit file exists. Append-only per-version files rather than one
  * rewritten log: a rewrite needs delete-then-rename (no atomic
  * rename-over on HDFS), and a crash or concurrent read in that window
  * would observe NO log at all — vanishing committed history. With
  * one-file-per-commit there is nothing to rewrite and no such window.
  * A crash after the data write but before the commit-file rename leaves
  * an orphan directory that was never committed and never becomes visible
  * (version numbers are never reused, so it can't be resurrected by a
  * later commit either); the next [[vacuum]] sweeps it. This is a
  * deliberate miniature of the Delta transaction log: commit = one atomic
  * metadata rename, data files are immutable once written.
  *
  * Two commit flavors:
  *
  *  - **Snapshot** ([[commit]]): `<dir>/v=<n>/` holds version n's parquet
  *    in full — the overwrite-table cadence the reference uses
  *    (`01. Ingest.py:176-189` rewrites whole tables per run), where Delta
  *    itself would also rewrite the data files.
  *  - **Incremental** ([[commitAppend]] / [[commitUpdate]] /
  *    [[commitDelete]]): the commit entry carries a MANIFEST (`file=<rel>`
  *    lines) and versions SHARE unchanged data files — append writes only
  *    the new rows' files; update/delete rewrite only the files that
  *    actually contain matching rows (file-level copy-on-write, the Delta
  *    MERGE discipline). COMMIT cost is O(change), never O(table) — the
  *    property that makes versioning affordable on a 100 TB corpus, where
  *    a daily append must not re-copy the year.
  *
  * Both flavors interoperate: an incremental commit on top of a snapshot
  * references the snapshot's files in place; [[vacuum]] refcounts files
  * across retained manifests before deleting anything.
  *
  * Concurrency: commits and vacuums serialize through
  * [[FsIO.acquireWriteLock]] (the lease guard); readers take no lock ever —
  * they resolve the log once and from then on touch only immutable files.
  */
object VersionedTable {

  private def vDir(dir: String, v: Long) = new Path(dir, f"v=$v%05d")
  private def logDir(dir: String)        = new Path(dir, "_log")
  private val versionName = "^v=(\\d+)$".r
  // version AND commit-millis both ride in the entry NAME, so resolving the
  // log is ONE listStatus — no per-commit file read (O(versions) small-file
  // opens per read()/commit(), all inside the commit lease hold)
  private val commitName = "^(\\d+)-(\\d+)\\.commit$".r
  private def commitEntry(dir: String, v: Long, ms: Long) =
    new Path(logDir(dir), f"$v%05d-$ms%d.commit")

  /** Committed (version, commitMs) pairs in version order — the log,
    * verbatim. Includes versions later vacuumed (history stays; their DATA
    * is gone — [[read]] distinguishes). */
  def log(dir: String): Seq[(Long, Long)] = {
    val ld = logDir(dir)
    val fs = ld.getFileSystem(FsIO.hadoopConf())
    if (!fs.exists(ld)) Seq.empty
    else {
      // fail LOUDLY on a foreign layout at this path (e.g. a plain file
      // named _log): silently-empty here would make vacuum classify every
      // live version as an orphan and delete committed data
      require(fs.getFileStatus(ld).isDirectory,
        s"VersionedTable: $ld is not a log directory — $dir was not written " +
          "by this layer (or by an incompatible version of it); refusing to " +
          "treat its versions as uncommitted")
      fs.listStatus(ld).toSeq
        .flatMap(s => commitName.findFirstMatchIn(s.getPath.getName)
          .map(m => (m.group(1).toLong, m.group(2).toLong)))
        .sortBy(_._1)
    }
  }

  /** Latest committed version, or None for an empty/uninitialized table. */
  def latestVersion(dir: String): Option[Long] = log(dir).lastOption.map(_._1)

  /** Committed versions whose data is still present (not vacuumed),
    * ascending, with commit timestamps. */
  def versions(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    log(dir).filter { case (v, _) => fs.exists(vDir(dir, v)) }
  }

  /** Version numbers of all `v=<n>` dirs (committed or orphaned), ignoring
    * in-flight `.__tmp` staging dirs. */
  private def listVersionDirs(fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[Long] =
    if (!fs.exists(new Path(dir))) Seq.empty
    else fs.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory)
      .flatMap(s => versionName.findFirstMatchIn(s.getPath.getName).map(_.group(1).toLong))
      .sorted

  /** Commit `df` as the next version. Returns the new version number.
    * Serialized by the write lease; the data rename and the commit-file
    * rename are each atomic creates (never a delete of existing metadata),
    * so every crash window leaves the previously committed history fully
    * visible — never a torn table. */
  def commit(spark: SparkSession, df: DataFrame, dir: String,
      lockLeaseMs: Long = TableManager.DefaultLockLeaseMs): Long =
    FsIO.withWriteLock(dir, "VersionedTable.commit", lockLeaseMs) {
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // next = one past anything ever attempted — committed OR orphaned —
      // so a crashed commit's number is never reused (reuse would let a
      // stale orphan masquerade as the new version's data)
      val next = ((latestVersion(dir).getOrElse(-1L) +: listVersionDirs(fs, dir)).max: Long) + 1
      val tmp  = new Path(dir, f"v=$next%05d.__tmp")
      df.write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, vDir(dir, next)))
        sys.error(s"VersionedTable.commit: could not publish version $next in $dir")
      // the commit point: a write-once entry staged then renamed into the
      // log dir (readers never observe a partially named commit entry)
      val ms       = System.currentTimeMillis()
      val entryTmp = new Path(logDir(dir), f"$next%05d-$ms%d.commit.tmp")
      FsIO.writeText(entryTmp.toString, s"commitMs=$ms\n")
      if (!fs.rename(entryTmp, commitEntry(dir, next, ms)))
        sys.error(s"VersionedTable.commit: could not commit log entry $next in $dir")
      next
    }

  /** Read a table version — the latest by default, or a pinned one (time
    * travel). The returned plan reads exactly one immutable `v=<n>`
    * directory: later commits and vacuums of OTHER versions never touch
    * its files. */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val committed = log(dir)
    require(committed.nonEmpty, s"VersionedTable.read: $dir has no committed version")
    val v = version.getOrElse(committed.last._1)
    require(committed.exists(_._1 == v),
      s"version $v does not exist (committed: ${committed.map(_._1).mkString(", ")})")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(vDir(dir, v)),
      s"version $v of $dir was vacuumed " +
        s"(data retained for: ${versions(spark, dir).map(_._1).mkString(", ")})")
    spark.read.parquet(vDir(dir, v).toString)
  }

  /** Drop the data of all but the last `retainLast` committed versions,
    * plus any never-committed orphans from crashed commits (and stage
    * litter). The log keeps full history — a vacuumed version's read fails
    * with a "vacuumed" message, not "unknown version". Returns the dropped
    * version numbers. Readers of retained versions are untouched (their
    * files never move); a reader pinned to a version being vacuumed is the
    * documented Delta-VACUUM hazard — size `retainLast` to the longest
    * reader. */
  def vacuum(spark: SparkSession, dir: String, retainLast: Int,
      lockLeaseMs: Long = TableManager.DefaultLockLeaseMs): Seq[Long] = {
    require(retainLast >= 1, s"retainLast must be >= 1, got $retainLast")
    FsIO.withWriteLock(dir, "VersionedTable.vacuum", lockLeaseMs) {
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // crashed-before-rename staging litter goes too: data-dir stages and
      // commit-entry stages alike
      if (fs.exists(new Path(dir)))
        fs.listStatus(new Path(dir)).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.endsWith(".__tmp"))
          .foreach(s => fs.delete(s.getPath, true))
      if (fs.exists(logDir(dir)))
        fs.listStatus(logDir(dir)).toSeq
          .filter(_.getPath.getName.endsWith(".commit.tmp"))
          .foreach(s => fs.delete(s.getPath, false))
      val committed = log(dir).map(_._1)
      val keep      = committed.takeRight(retainLast).toSet
      val drop      = listVersionDirs(fs, dir).filterNot(keep) // old + orphans
      drop.foreach(v => fs.delete(vDir(dir, v), true))
      drop
    }
  }
}

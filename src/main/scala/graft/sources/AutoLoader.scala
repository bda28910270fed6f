package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamShim
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{DataType, StructType}

/** INCREMENTAL FILE INGEST over a growing raw directory — the Auto Loader
  * (`cloudFiles`) shape, rebuilt as a DSv1 streaming Source: directory-
  * listing discovery with DURABLE per-file state, so pre-existing files
  * backfill and new files ingest exactly once across restarts, paced by
  * `maxFilesPerTrigger`, with loud schema-drift refusal per new file.
  * `fileFormat` = `parquet` (default, drift-checked), `binaryFile` (one
  * row per raw file — the reference's image ingest, streamed), or `text`
  * (one row per line + source path — the raw LLM-corpus shape).
  *
  * {{{
  *   spark.readStream.format(AutoLoader.format)
  *     .option("path", rawDir)                 // the growing directory
  *     .option("maxFilesPerTrigger", 100)      // optional pacing
  *     .load()
  *     .writeStream.format(VersionedStream.format)  // exactly-once sink
  *     .option("path", tableDir).option("checkpointLocation", cp)
  *     .start()
  * }}}
  *
  * Durable state, all under the query's own checkpoint (`metadataPath`):
  *  - `schema.json` — the stream's schema, PINNED at first start (declared
  *    via `.schema(...)` or inferred from one footer). Every later start
  *    and every newly discovered file must match it exactly; drift refuses
  *    loudly (names + types), never silently null-fills a missing column
  *    the way a plain schema'd parquet read would.
  *  - `ledger/d-<n>.json` — one append-only entry per DISCOVERY that found
  *    files: the new files in (modTime, path) order with their assigned
  *    contiguous sequence numbers. The stream offset is the total file
  *    count, so `getBatch(start, end)` replays EXACTLY files
  *    (start, end] after any crash — discovery order is frozen at
  *    discovery time, never re-derived from a re-listing.
  *
  * 100 TB shape: discovery is one recursive listing per trigger (the cost
  * every directory-listing loader pays; cloud Auto Loader's notification
  * mode is an infra substitution, not an algorithm change) and the ledger
  * grows O(discoveries), not O(listing). Driver memory holds the full
  * (path, size) ledger — O(files ever seen), the same footprint as
  * Spark's own file source's seen-files map; the deployment lever for
  * both the listing and the memory is a date-partitioned landing zone
  * with the stream pointed at the live partition (and `cleanSource`
  * retiring committed files bounds the LISTED set from the other side).
  * Files are assumed immutable once visible (the blob-store contract the
  * reference's ingest relies on: `01. Ingest.py:33-36`); a file that
  * later CHANGES size refuses loudly rather than re-ingesting or serving
  * torn reads.
  */
class AutoLoader extends StreamSourceProvider {

  private def rawDirOf(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(sys.error("AutoLoader: .option(\"path\", <raw dir>) is required"))

  private def formatOf(parameters: Map[String, String]): String = {
    val f = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("fileFormat") => v }
      .getOrElse("parquet").toLowerCase(java.util.Locale.ROOT)
    require(AutoLoader.Formats.contains(f),
      s"AutoLoader: fileFormat `$f` is not supported — one of " +
        AutoLoader.Formats.mkString(", "))
    f
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft-autoload", formatOf(parameters) match {
      case "binaryfile" =>
        require(schema.isEmpty,
          "AutoLoader: fileFormat binaryFile has a FIXED schema " +
            "(path, modificationTime, length, content) — drop .schema(...)")
        AutoLoader.BinaryFileSchema
      case "text" =>
        require(schema.isEmpty,
          "AutoLoader: fileFormat text has a FIXED schema (value, path) — " +
            "drop .schema(...)")
        AutoLoader.TextSchema
      case "parquet" => schema.getOrElse {
        val dir = rawDirOf(parameters)
        AutoLoader.listDataFiles(dir).headOption match {
          case Some((first, _, _)) =>
            org.apache.spark.sql.graft.FooterShim.schemaOf(
              sqlContext.sparkSession, first)
          case None =>
            // a RESTARTED stream whose raw directory cleanSource already
            // drained still has its schema PINNED under the checkpoint —
            // but DSv1 gives sourceSchema no metadataPath, so the pin is
            // only reachable when the caller passes the query's
            // checkpointLocation as a read option too
            AutoLoader.pinnedSchema(parameters).getOrElse(sys.error(
              s"AutoLoader: $dir has no data files to infer a schema from — " +
                "declare one with .schema(...) to start over an empty " +
                "directory, or, when RESTARTING a stream whose raw files " +
                "were already cleaned, pass .option(\"checkpointLocation\", " +
                "<the query's checkpoint dir>) on the readStream so the " +
                "pinned schema under the checkpoint resolves"))
        }
      }
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    def opt(name: String) = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    val maxFiles = opt("maxFilesPerTrigger").map(_.toInt)
    maxFiles.foreach(m => require(m > 0,
      s"AutoLoader: maxFilesPerTrigger must be positive, got $m"))
    val clean = opt("cleanSource").map(_.toLowerCase(java.util.Locale.ROOT))
    clean.foreach(c => require(c == "delete" || c == "archive",
      s"AutoLoader: cleanSource must be `delete` or `archive`, got `$c`"))
    val archiveDir = opt("sourceArchiveDir")
    if (clean.contains("archive")) require(archiveDir.isDefined,
      "AutoLoader: cleanSource=archive needs .option(\"sourceArchiveDir\", <dir>)")
    new AutoLoader.AutoLoadSource(sqlContext.sparkSession, rawDirOf(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      metadataPath, maxFiles, formatOf(parameters), clean, archiveDir)
  }
}

object AutoLoader {

  /** `.format(AutoLoader.format)`. */
  val format: String = classOf[AutoLoader].getName

  /** Supported `fileFormat` option values. `parquet` (default) carries the
    * pinned-schema drift contract; `binaryfile` is the reference's image
    * front door (`01. Ingest.py:33-36` — one row per raw file:
    * path/modificationTime/length/content) streamed incrementally;
    * `text` is one row per line with the source path attached (the raw
    * LLM-corpus shape). */
  val Formats: Set[String] = Set("parquet", "binaryfile", "text")

  /** Recover the schema a previous run PINNED under the query's
    * checkpoint, from a `checkpointLocation` passed as a READ option —
    * the only handle sourceSchema has (DSv1 hands metadataPath to
    * createSource, not here). Scans `<cp>/sources/<i>/graft-autoload/
    * schema.json` in source order and takes the first pin found; streams
    * with several AutoLoader sources that need distinct schemas should
    * declare them with `.schema(...)` instead. */
  private[sources] def pinnedSchema(
      parameters: Map[String, String]): Option[StructType] =
    parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("checkpointLocation") => v }
      .flatMap { cp =>
        val sources = new Path(cp, "sources")
        val fs = sources.getFileSystem(graft.tables.FsIO.hadoopConf())
        if (!fs.exists(sources)) None
        else fs.listStatus(sources).toSeq
          // numeric source order — `<cp>/sources/<i>` names are integers,
          // and lexicographic order would visit 10 before 2
          .sortBy(s => s.getPath.getName.toLongOption.getOrElse(Long.MaxValue))
          .map(s => new Path(s.getPath, "graft-autoload/schema.json"))
          .find(fs.exists)
          .map(p => DataType.fromJson(
            graft.tables.FsIO.readText(p.toString).getOrElse(sys.error(
              s"AutoLoader: unreadable pinned schema $p")))
            .asInstanceOf[StructType])
      }

  /** Spark's own binaryFile source schema — fixed by the format. */
  val BinaryFileSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType, nullable = false),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType, nullable = true)))

  /** Text ingest schema: the line plus its source file. */
  val TextSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType, nullable = false)))

  /** (absolute path, size, modTime) of every data file under `dir`,
    * recursively, hidden files/dirs (`_`, `.`) skipped — Spark's own
    * listing convention. Deterministic (modTime, path) order. */
  private[sources] def listDataFiles(dir: String): Seq[(String, Long, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(graft.tables.FsIO.hadoopConf())
    if (!fs.exists(root)) return Seq.empty
    def hidden(p: Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def walk(p: Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.filterNot(s => hidden(s.getPath)).flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
      }
    walk(root).sortBy { case (p, _, m) => (m, p) }
  }

  private[graft] class AutoLoadSource(spark: SparkSession, rawDir: String,
      declaredSchema: StructType, metadataPath: String, maxFiles: Option[Int],
      fileFormat: String = "parquet",
      /** `cleanSource` (Spark file-source parity): after a batch's offset
        * COMMITS to the checkpoint, its raw files are deleted or archived
        * — the landing-zone retention loop. Only committed files are ever
        * touched (the [[commit]] callback is the trigger), so a crash
        * before commit replays from intact raw files; a cleaned file that
        * later vanishes from the listing is expected (the ledger keeps the
        * exactly-once history). */
      cleanSource: Option[String] = None,
      sourceArchiveDir: Option[String] = None)
      extends Source
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

    private val stateRoot  = new Path(metadataPath, "graft-autoload")
    private val ledgerDir  = new Path(stateRoot, "ledger")
    private val schemaFile = new Path(stateRoot, "schema.json")
    private val fs = stateRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // ---- pinned schema: written once, enforced on every start ----
    locally {
      fs.mkdirs(ledgerDir)
      graft.tables.FsIO.readText(schemaFile.toString) match {
        case Some(json) =>
          val pinned = DataType.fromJson(json).asInstanceOf[StructType]
          require(pinned == declaredSchema,
            s"AutoLoader: this checkpoint pinned schema ${pinned.simpleString} " +
              s"but the stream now declares ${declaredSchema.simpleString} — " +
              "schema drift needs a fresh checkpoint (and a plan for the " +
              "already-ingested rows)")
        case None =>
          val tmp = new Path(stateRoot, "schema.json.tmp")
          graft.tables.FsIO.writeText(tmp.toString, declaredSchema.json)
          require(fs.rename(tmp, schemaFile) || fs.exists(schemaFile),
            s"AutoLoader: could not pin the stream schema under $stateRoot")
      }
    }

    // ---- durable ledger: replayed into memory once per (re)start ----
    // ledger(i) = file with sequence number i+1 (offsets are 1-based
    // counts; offset 0 = nothing ingested)
    private val ledger = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    private val known  = scala.collection.mutable.HashSet.empty[String]
    locally {
      fs.listStatus(ledgerDir).toSeq
        .filter(_.getPath.getName.matches("d-\\d+\\.json"))
        .sortBy(_.getPath.getName)
        .foreach { s =>
          parseEntries(graft.tables.FsIO.readText(s.getPath.toString).getOrElse(""))
            .foreach { case (p, sz) => ledger += ((p, sz)); known += p }
        }
    }

    // minimal JSON lines: one `path\tsize` pair per line, tab-separated —
    // paths with tabs/newlines are refused at discovery (loudly), so the
    // encoding round-trips byte-exact without a JSON library
    private def renderEntries(files: Seq[(String, Long)]): String =
      files.map { case (p, sz) => s"$p\t$sz" }.mkString("\n")
    private def parseEntries(text: String): Seq[(String, Long)] =
      text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf('\t')
        (line.substring(0, i), line.substring(i + 1).toLong)
      }

    /** One discovery pass: list, diff against the ledger, validate the new
      * files' schemas, durably append, extend the in-memory ledger. Runs
      * on the driver inside getOffset/latestOffset (the listing the
      * contract requires); O(listing) compare, O(new files) footer reads. */
    private def discover(): Unit = synchronized {
      val listed = listDataFiles(rawDir)
      // an already-ingested file whose SIZE changed violates the
      // immutability contract — refuse rather than torn-read or re-ingest
      val bySize = listed.map(f => f._1 -> f._2).toMap
      val changed = ledger.filter { case (p, sz) => bySize.get(p).exists(_ != sz) }
      require(changed.isEmpty,
        s"AutoLoader: ${changed.size} already-ingested file(s) changed size " +
          s"(e.g. ${changed.head._1}) — raw files must be immutable once " +
          "visible; write-then-rename into the directory")
      val fresh = listed.filterNot(f => known(f._1))
      if (fresh.nonEmpty) {
        fresh.foreach { case (p, _, _) =>
          require(!p.exists(c => c == '\t' || c == '\n'),
            s"AutoLoader: file path contains a tab/newline: $p")
          // drift is a parquet concern — binaryFile/text carry the
          // format's own fixed schema regardless of content
          if (fileFormat == "parquet") {
            val s = org.apache.spark.sql.graft.FooterShim.schemaOf(spark, p)
            require(s == declaredSchema,
              s"AutoLoader: schema drift in $p — file has ${s.simpleString}, " +
                s"stream pinned ${declaredSchema.simpleString}; a plain read " +
                "would silently null-fill, so the stream refuses (fix the " +
                "producer or start a new stream for the new schema)")
          }
        }
        // discovery file named by the first sequence it assigns — sortable,
        // collision-free (the ledger only ever grows)
        val disc = new Path(ledgerDir, f"d-${ledger.size}%012d.json")
        val tmp  = new Path(ledgerDir, f"d-${ledger.size}%012d.json.tmp")
        graft.tables.FsIO.writeText(tmp.toString,
          renderEntries(fresh.map(f => (f._1, f._2))))
        require(fs.rename(tmp, disc),
          s"AutoLoader: could not publish discovery $disc")
        fresh.foreach { case (p, sz, _) => ledger += ((p, sz)); known += p }
      }
    }

    override def schema: StructType = declaredSchema

    @volatile private var lastPlanned: Option[Long] = None

    private def paceFrom(anchor: Option[Long]): Option[LongOffset] = {
      discover()
      val total = ledger.size.toLong
      if (total == 0) None
      else Some(LongOffset((anchor, maxFiles) match {
        case (Some(a), Some(m)) => math.min(total, a + m)
        case (None, Some(m))    => math.min(total, m.toLong)
        case _                  => total
      }))
    }

    override def getOffset: Option[Offset] = paceFrom(lastPlanned)

    // Trigger.AvailableNow: drain the backlog pinned at run start in paced
    // batches, then terminate — files landing mid-run are the next run's
    @volatile private var availableNowTarget: Option[Long] = None
    @volatile private var availableNowPrepared = false

    override def prepareForTriggerAvailableNow(): Unit = {
      discover()
      availableNowTarget = Some(ledger.size.toLong).filter(_ > 0)
      availableNowPrepared = true
    }

    override def getDefaultReadLimit
        : org.apache.spark.sql.connector.read.streaming.ReadLimit =
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

    override def latestOffset(
        start: org.apache.spark.sql.connector.read.streaming.Offset,
        limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
        : org.apache.spark.sql.connector.read.streaming.Offset = {
      val startN = Option(start).map {
        case l: LongOffset => l.offset
        case o             => o.json().trim.toLong
      }
      val anchor = (lastPlanned.toSeq ++ startN.toSeq).reduceOption(_ max _)
      if (availableNowPrepared && availableNowTarget.isEmpty) null
      else paceFrom(anchor) match {
        case Some(p) =>
          availableNowTarget match {
            case Some(t) if startN.exists(_ >= t) => null
            case Some(t) => LongOffset(math.min(p.offset, t))
            case None    => p
          }
        case None => null
      }
    }

    override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
      val endN = end match {
        case l: LongOffset => l.offset
        case o             => o.json().trim.toLong
      }
      val startN = start.map {
        case l: LongOffset => l.offset
        case o             => o.json().trim.toLong
      }.getOrElse(0L)
      lastPlanned = Some(endN)
      cleanUpTo(startN) // the start prefix is durably committed (see above)
      require(endN <= ledger.size,
        s"AutoLoader: checkpoint asks for file $endN but the ledger holds " +
          s"${ledger.size} — the checkpoint's ledger directory was deleted " +
          "or points at a different stream")
      // Under cleanSource, a COMMITTED batch's raw files are gone by
      // design — yet on every restart the engine constructs one recovery
      // getBatch over the last committed range, and the parquet path
      // lists its files eagerly. Skip vanished files ONLY below the
      // DURABLE cleaned-through marker (advanced before each sweep, so a
      // missing file under it is either retired or mid-sweep-crash — both
      // committed by construction); a file missing ABOVE the marker was
      // removed by something else and may back an uncommitted replay, so
      // the loud listing failure stands there, as it does without
      // cleanSource.
      val files =
        if (cleanSource.isEmpty)
          ledger.slice(startN.toInt, endN.toInt).map(_._1).toSeq
        else {
          val rawFs = new Path(rawDir).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          (startN until endN).map(i => (i, ledger(i.toInt)._1)).collect {
            case (i, f) if i >= cleanedThrough || rawFs.exists(new Path(f)) => f
          }
        }
      if (files.isEmpty) StreamShim.emptyStreaming(spark, declaredSchema)
      else StreamShim.asStreaming(fileFormat match {
        case "binaryfile" =>
          spark.read.format("binaryFile").load(files: _*)
        case "text" =>
          spark.read.text(files: _*)
            .withColumn("path", org.apache.spark.sql.functions.input_file_name())
        case _ =>
          spark.read.schema(declaredSchema).parquet(files: _*)
      })
    }

    // cleanSource: raw files are retired once their batch is DURABLY
    // committed. Two triggers cover every lifecycle: getBatch's START
    // offset is a committed prefix by construction (the engine only
    // constructs batch N+1 after batch N completed — and on restart,
    // start is the last committed boundary below the replay), so cleaning
    // fires as a multi-batch run advances; the engine's commit(end)
    // callback sweeps the final batch when the next trigger or the next
    // run reaches it. The low-water mark is DURABLE (`cleaned` under the
    // checkpoint state) and advances BEFORE the sweep: a file missing
    // below it is provably retired-or-mid-sweep-crash — i.e. committed —
    // which is what lets getBatch's recovery replay skip it while any
    // other disappearance still fails loudly. Crash between marker and
    // sweep only leaves files the next sweep re-walks idempotently.
    private val cleanedFile = new Path(stateRoot, "cleaned")
    // MONOTONIC marker discipline (the VersionedTable one-file-per-commit
    // rationale): the durable bound lives in the marker's NAME
    // (`cleaned-<n>`), a new marker is CREATED before old ones delete,
    // and a reader takes the max — so no crash point ever leaves zero
    // markers. The previous delete(cleaned)-then-rename advance had a
    // crash window between the two that restarted `cleanedThrough` at 0
    // and failed recovery loudly until manually restored. The legacy
    // single `cleaned` file is still honored (max'd in) so pre-existing
    // checkpoints migrate on their first advance.
    private def listCleanedMarkers(): Seq[Long] =
      if (!fs.exists(stateRoot)) Seq.empty
      else fs.listStatus(stateRoot).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("cleaned-"))
        .flatMap(_.stripPrefix("cleaned-").toLongOption)
    // the durable skip bound (replay-missing-file tolerance); the sweep's
    // own low-water mark is separate and IN-MEMORY ONLY, so after a crash
    // mid-sweep the first sweep of the new process re-walks the whole
    // marked prefix idempotently (a missing file is a no-op) and catches
    // any files the crashed sweep left behind
    @volatile private var cleanedThrough: Long =
      (graft.tables.FsIO.readText(cleanedFile.toString)
        .flatMap(_.trim.toLongOption).toSeq ++ listCleanedMarkers())
        .foldLeft(0L)(math.max)
    @volatile private var sweptThrough: Long = 0L
    private def cleanUpTo(n: Long): Unit = cleanSource.foreach { mode =>
      val rawFs = new Path(rawDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val upTo = math.min(n, ledger.size.toLong)
      if (upTo > sweptThrough) {
        if (upTo > cleanedThrough) {
          // marker FIRST (intent), sweep second: a file missing below the
          // marker is then provably retired-or-mid-sweep-crash. The new
          // marker is created BEFORE any old one deletes — a crash at any
          // instant leaves at least one marker, and max-over-survivors
          // reads correct (extra lower markers are harmless)
          graft.tables.FsIO.writeText(
            new Path(stateRoot, s"cleaned-$upTo").toString, "")
          listCleanedMarkers().filter(_ < upTo).foreach(n =>
            fs.delete(new Path(stateRoot, s"cleaned-$n"), false))
          fs.delete(cleanedFile, false) // retire the legacy single-file form
          cleanedThrough = upTo
        }
        (sweptThrough until upTo).foreach { i =>
          val p = new Path(ledger(i.toInt)._1)
          mode match {
            case "delete" => rawFs.delete(p, false)
            case _ =>
              val ad = new Path(sourceArchiveDir.get)
              rawFs.mkdirs(ad)
              if (rawFs.exists(p)) // idempotent re-walk after a crash
                rawFs.rename(p, new Path(ad, f"$i%012d-${p.getName}"))
          }
        }
        sweptThrough = upTo
      }
    }
    override def commit(end: Offset): Unit = cleanUpTo(end match {
      case l: LongOffset => l.offset
      case o             => o.json().trim.toLong
    })

    override def stop(): Unit = ()
    override def toString: String = s"AutoLoadSource[$rawDir]"
  }
}

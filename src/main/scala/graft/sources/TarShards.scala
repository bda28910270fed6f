package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.FsIO

/** WebDataset-style tar shard source/sink: a training corpus stored as a
  * directory of `.tar` shards whose members are `<key>.<ext>` payloads
  * (text, image bytes, json metadata). This is the dominant at-scale layout
  * for multimodal training data — sequential-read-friendly, object-store
  * native, resumable — and the natural export target for the reference's
  * image pipeline (`01. Ingest.py` persists (path, content) rows; a shard
  * export is the same payload re-packed for a data loader).
  *
  * Spark-first shape: the SHARD is the unit of parallelism in both
  * directions. Writing hash-assigns rows to shards and streams each shard
  * through one Hadoop output stream (payload bytes shuffle once, no driver
  * involvement); reading scans shards
  * with `binaryFile` and explodes members per task. At 100 TB that is
  * `corpus / shard_size` independent tasks with zero coordination — the
  * plan a 1000-executor cluster wants.
  *
  * The archive format is POSIX ustar written/parsed here directly (~60
  * lines): headers are 512-byte blocks with octal size fields, payloads
  * are 512-padded, the archive ends with two zero blocks. mtime/uid/gid
  * are pinned to 0 so shard bytes are a pure function of the rows —
  * re-running a write reproduces byte-identical shards (idempotent task
  * retries, diffable exports).
  */
object TarShards {

  private val Block = 512

  // ------------------------------------------------------------ tar encode

  private def octal(value: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(value)
    require(s.length < width, s"value $value overflows $width-char octal field")
    val out = new Array[Byte](width)
    System.arraycopy((("0" * (width - 1 - s.length)) + s)
      .getBytes(StandardCharsets.US_ASCII), 0, out, 0, width - 1)
    out(width - 1) = 0 // NUL terminator (GNU practice; a space is equally legal)
    out
  }

  /** One ustar header + padded payload for a regular file member. */
  private[sources] def memberBytes(name: String, payload: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100, s"member name too long for ustar (${nameBytes.length} > 100): $name")
    val header = new Array[Byte](Block)
    System.arraycopy(nameBytes, 0, header, 0, nameBytes.length)
    System.arraycopy(octal(420, 8), 0, header, 100, 8)             // mode 0644
    System.arraycopy(octal(0, 8), 0, header, 108, 8)               // uid
    System.arraycopy(octal(0, 8), 0, header, 116, 8)               // gid
    System.arraycopy(octal(payload.length.toLong, 12), 0, header, 124, 12)
    System.arraycopy(octal(0, 12), 0, header, 136, 12)             // mtime: pinned
    java.util.Arrays.fill(header, 148, 156, ' '.toByte)            // chksum as spaces
    header(156) = '0'                                              // typeflag: regular
    // POSIX ustar magic "ustar\0" + version "00"
    System.arraycopy(Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0'), 0, header, 257, 8)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += header(i) & 0xff; i += 1 }
    System.arraycopy(octal(sum, 7), 0, header, 148, 7)             // 6 digits + NUL
    header(155) = ' '
    val padded = (payload.length + Block - 1) / Block * Block
    val out = new Array[Byte](Block + padded)
    System.arraycopy(header, 0, out, 0, Block)
    System.arraycopy(payload, 0, out, Block, payload.length)
    out
  }

  // ------------------------------------------------------------ tar decode

  /** Parse a ustar archive into (memberName, payload) pairs. Only regular
    * files are emitted; links/dirs (never written by [[writeShards]]) are
    * skipped. Strict on structure — a truncated shard fails loudly rather
    * than yielding partial rows. */
  private[sources] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done) {
      require(off + Block <= bytes.length,
        s"truncated tar: header at $off overruns ${bytes.length}-byte shard")
      if (bytes(off) == 0) { done = true } // zero block: end of archive
      else {
        var nameEnd = off
        while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, off, nameEnd - off, StandardCharsets.UTF_8)
        val sizeStr = new String(bytes, off + 124, 12, StandardCharsets.US_ASCII)
          .takeWhile(c => c >= '0' && c <= '7')
        require(sizeStr.nonEmpty, s"unparsable size field for member '$name'")
        val size = java.lang.Long.parseLong(sizeStr, 8)
        require(size <= Int.MaxValue, s"member '$name' too large: $size")
        val typeflag = bytes(off + 156)
        val dataOff  = off + Block
        require(dataOff + size <= bytes.length,
          s"truncated tar: member '$name' payload overruns shard")
        if (typeflag == '0'.toByte || typeflag == 0)
          out += name -> java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size.toInt)
        off = dataOff + ((size + Block - 1) / Block * Block).toInt
      }
    }
    out.result()
  }

  // ------------------------------------------------------------ write path

  /** Write `df` as `nShards` tar shards under `dir` (`shard-00000.tar` …).
    * `nameCol` (string) is the member name, `contentCol` (binary) the
    * payload. Shard assignment is `xxhash64(shardBy) mod nShards` — a pure
    * function of the rows (NOT range partitioning, whose sampled
    * boundaries depend on the run) — and members sort by name within a
    * shard, so shard BYTES are a deterministic function of the rows.
    * `shardBy` defaults to the member name; multi-member examples
    * (`key.jpg` + `key.txt`) MUST pass their example key instead so a
    * loader reading one shard sequentially always sees complete examples
    * — co-location is the entire point of the WebDataset layout.
    * Each shard streams through one FS output stream (never materialized
    * in memory) to a temp file, then atomically renames into place: a
    * retried or re-run task rewrites the same bytes. */
  def writeShards(df: DataFrame, nameCol: String, contentCol: String,
      dir: String, nShards: Int, shardBy: Column = null): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val p  = new Path(dir)
    val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.mkdirs(p)
    // Overwrite semantics: clear previous shards first — a re-export with
    // fewer shards would otherwise leave stale high-numbered shards that
    // readShards silently includes (duplicate/ghost examples). NOTE the
    // export is NOT atomic across shards: a job failure mid-export leaves
    // a partial shard set (per-shard commits are atomic, the set is not) —
    // export to a fresh directory and rename it into place when the
    // previous corpus must survive a failed re-export.
    Option(fs.globStatus(new Path(p, "*.tar"))).getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, false))
    // ...and any tmp files a previously failed/killed task left behind
    // (dot-prefixed, so readers never saw them — but they'd accrete forever).
    Option(fs.globStatus(new Path(p, ".shard-*.tmp"))).getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, false))
    val shardKey = Option(shardBy).getOrElse(col(nameCol)).cast("string")
    df.select(
        pmod(xxhash64(shardKey), lit(nShards.toLong)).as("__shard"),
        col(nameCol).cast("string").as("name"), col(contentCol).as("content"))
      // repartitionByRange, not hash: hashing the shard id re-hashes an
      // already-uniform key, leaving ~37% of write tasks empty while
      // others serialize 2-3 shards — range partitioning is ~1:1 and the
      // shard bytes are deterministic regardless of task assignment
      .repartitionByRange(nShards, col("__shard"))
      .sortWithinPartitions("__shard", "name")
      .queryExecution.toRdd // InternalRow iterator: no Row conversion on the hot path
      .foreachPartition { rows =>
        // A task may own several shard ids (hash collisions across the
        // partitioner) — rows arrive sorted by (__shard, name), so each
        // consecutive run becomes one archive with its own atomic commit.
        val conf    = FsIO.hadoopConf()
        val fsx     = new Path(dir).getFileSystem(conf)
        val attempt = TaskContext.get().taskAttemptId()
        var cur     = -1L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var tmp: Path = null
        def commit(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)) // end-of-archive
          out.close(); out = null
          val fin = new Path(dir, f"shard-$cur%05d.tar")
          fsx.delete(fin, false)
          require(fsx.rename(tmp, fin), s"failed to commit shard $fin")
        }
        try {
          rows.foreach { r =>
            require(!r.isNullAt(1), "null member name — every row needs a non-null key")
            require(r.getUTF8String(1).numBytes > 0,
              "empty member name — a zero-first-byte header reads as the " +
                "end-of-archive block and would silently truncate the shard")
            val shard = r.getLong(0)
            if (shard != cur) {
              commit()
              cur = shard
              tmp = new Path(dir, f".shard-$cur%05d.tar.$attempt%d.tmp")
              out = fsx.create(tmp, true)
            }
            val payload = r.getBinary(2)
            out.write(memberBytes(r.getUTF8String(1).toString,
              if (payload == null) Array.emptyByteArray else payload))
          }
          commit()
        } finally if (out != null) {
          // failed mid-shard: close AND delete the orphan tmp so a killed
          // attempt leaves nothing behind (commit() nulls `out` on success,
          // so this path only runs on failure).
          out.close(); out = null
          try fsx.delete(tmp, false) catch { case _: java.io.IOException => () }
        }
      }
  }

  // ------------------------------------------------------------- read path

  /** Scan a shard directory back into (shard, member, content) rows — one
    * task per shard file via the `binaryFile` source (shards are split-proof
    * by nature, so a whole-file scan IS the right granularity; size the
    * shards, not the splits). */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.BINARY)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(col("path"), col("content"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        parseTar(bytes).map { case (name, payload) => (shard, name, payload) }
      }(enc)
      .toDF("shard", "member", "content")
  }
}

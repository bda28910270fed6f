package graft

import java.nio.file.Files

import graft.sources.{AutoLoader, VersionedStream}
import graft.tables.VersionedTable

class AutoLoaderSpec extends SparkSpec {

  private def run(raw: String, out: String, ckpt: String,
      maxFiles: Option[Int] = None): Unit = {
    val reader = spark.readStream.format(AutoLoader.format).option("path", raw)
    val q = maxFiles.fold(reader)(m =>
        reader.option("maxFilesPerTrigger", m.toString)).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop()
  }

  test("backfill + new files exactly-once across restarts; paced discovery") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_al").toString
    val (raw, out, ckpt) = (root + "/raw", root + "/out", root + "/ckpt")
    // wave 1: pre-existing files (the backfill), several part files
    (1L to 40L).map(i => (i, s"a$i")).toDF("id", "s").repartition(4)
      .write.mode("append").parquet(raw)
    run(raw, out, ckpt, maxFiles = Some(2)) // paced: 2 files per batch
    assert(spark.read.parquet(out).count() == 40L)
    // wave 2: new files land; the SAME checkpoint resumes and ingests
    // exactly them (per-file ledger, not a re-listing)
    (41L to 60L).map(i => (i, s"b$i")).toDF("id", "s").repartition(2)
      .write.mode("append").parquet(raw)
    run(raw, out, ckpt)
    val got = spark.read.parquet(out)
    assert(got.count() == 60L, "exactly the new files' rows appended")
    assert(got.select("id").as[Long].collect().toSet == (1L to 60L).toSet)
    // idle restart: nothing new, nothing re-ingested
    run(raw, out, ckpt)
    assert(spark.read.parquet(out).count() == 60L)
  }

  test("cleaned marker is monotonic: stale lower markers and the legacy file never regress it") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_al_marker").toString
    val (raw, out, ckpt) = (root + "/raw", root + "/out", root + "/ckpt")
    (1L to 12L).map(i => (i, s"m$i")).toDF("id", "s").repartition(3)
      .write.mode("append").parquet(raw)
    def runClean(): Unit = {
      val q = spark.readStream.format(AutoLoader.format).option("path", raw)
        .option("cleanSource", "delete").option("maxFilesPerTrigger", "1").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    runClean()
    assert(spark.read.parquet(out).count() == 12L)
    // the advance is a one-file-per-value CREATE (`cleaned-<n>`), pruned
    // after — never a delete-then-rename of a single live name whose
    // crash window leaves NO marker and restarts recovery at 0
    val stateDir = new java.io.File(s"$ckpt/sources/0/graft-autoload")
    val markers = stateDir.listFiles().map(_.getName).filter(_.startsWith("cleaned-"))
    assert(markers.nonEmpty, "the sweep must leave a monotonic cleaned-<n> marker")
    assert(markers.length == 1, s"stale markers must prune: ${markers.mkString(",")}")
    assert(!new java.io.File(stateDir, "cleaned").exists(), "legacy marker must retire")
    val n = markers.head.stripPrefix("cleaned-").toLong
    assert(n > 0)
    // worst readable crash state: a stale lower marker (crash before the
    // prune) AND a legacy `cleaned` file with a lower value. A restart
    // must read the MAX — a regressed bound would make the recovery
    // replay treat the already-retired files as foul play and refuse.
    java.nio.file.Files.writeString(stateDir.toPath.resolve("cleaned-1"), "")
    java.nio.file.Files.writeString(stateDir.toPath.resolve("cleaned"), "1")
    (13L to 15L).map(i => (i, s"m$i")).toDF("id", "s").repartition(1)
      .write.mode("append").parquet(raw)
    runClean()
    val got = spark.read.parquet(out)
    assert(got.count() == 15L)
    assert(got.select("id").as[Long].collect().toSet == (1L to 15L).toSet)
  }

  test("restart after cleanSource drained the raw dir: pinned schema recovers") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_al_drain").toString
    val (raw, out, ckpt) = (root + "/raw", root + "/out", root + "/ckpt")
    (1L to 10L).map(i => (i, s"x$i")).toDF("id", "s").repartition(2)
      .write.mode("append").parquet(raw)
    def restart(extra: Map[String, String]): Unit = {
      val reader = extra.foldLeft(
        spark.readStream.format(AutoLoader.format).option("path", raw)
          .option("cleanSource", "delete")) { case (r, (k, v)) => r.option(k, v) }
      val q = reader.load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    restart(Map.empty)
    assert(spark.read.parquet(out).count() == 10L)
    // the retention loop finishes draining the landing zone (every file is
    // committed at this point — an idle restart triggers no batch, so the
    // tail sweep is emulated: files deleted AND the durable cleaned marker
    // advanced, exactly the state a completed sweep leaves; without the
    // marker a vanished file reads as foul play and refuses loudly)
    new java.io.File(raw).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(_.delete())
    val ledgerSize = new java.io.File(s"$ckpt/sources/0/graft-autoload/ledger")
      .listFiles().filter(_.getName.matches("d-\\d+\\.json"))
      .map(f => java.nio.file.Files.readAllLines(f.toPath).size).sum
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      ckpt, "sources", "0", "graft-autoload", "cleaned"), ledgerSize.toString)
    // a plain inferred-schema restart now has nothing to infer from — it
    // must refuse with the recovery recipe, not a bare listing error
    val e = intercept[Exception] {
      spark.readStream.format(AutoLoader.format).option("path", raw).load()
    }
    assert(e.getMessage.contains("checkpointLocation"), e.getMessage)
    // passing the query's checkpoint as a READ option recovers the pin:
    // the fully-drained stream restarts cleanly (the recovery batch skips
    // the retired files) and new arrivals ingest under the pinned schema
    restart(Map("checkpointLocation" -> ckpt))
    (11L to 15L).map(i => (i, s"y$i")).toDF("id", "s").repartition(1)
      .write.mode("append").parquet(raw)
    restart(Map("checkpointLocation" -> ckpt))
    val got = spark.read.parquet(out)
    assert(got.count() == 15L)
    assert(got.select("id").as[Long].collect().toSet == (1L to 15L).toSet)
  }

  test("pacing honors maxFilesPerTrigger per micro-batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_al_pace").toString
    val (raw, ckpt) = (root + "/raw", root + "/ckpt")
    (1L to 30L).map(i => (i, i * 2.0)).toDF("id", "v").repartition(6)
      .write.mode("append").parquet(raw)
    var batchSizes = Vector.empty[Long]
    val q = spark.readStream.format(AutoLoader.format).option("path", raw)
      .option("maxFilesPerTrigger", "2").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes :+= df.count()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(batchSizes.sum == 30L, batchSizes.toString)
    assert(batchSizes.length >= 3, s"6 files at 2/trigger needs >=3 batches: $batchSizes")
  }

  test("schema drift refuses loudly; already-ingested file mutation refuses") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_al_drift").toString
    val (raw, out, ckpt) = (root + "/raw", root + "/out", root + "/ckpt")
    (1L to 5L).map(i => (i, s"a$i")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(raw)
    run(raw, out, ckpt)
    // a producer starts writing a WIDER schema: the stream must refuse,
    // not silently null-fill the missing column
    Seq((99L, "x", 1.5)).toDF("id", "s", "score").coalesce(1)
      .write.mode("append").parquet(raw)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format(AutoLoader.format).option("path", raw).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    assert(e.getMessage.contains("schema drift") ||
      Option(e.getCause).exists(_.getMessage.contains("schema drift")), e.getMessage)
  }

  test("binaryFile ingest: raw files stream in waves, one row each, exactly once") {
    val root = Files.createTempDirectory("graft_al_bin").toString
    val (raw, out, ckpt) = (root + "/raw", root + "/out", root + "/ckpt")
    new java.io.File(raw).mkdirs()
    def drop(name: String, bytes: Array[Byte]): Unit = {
      val tmp = java.nio.file.Paths.get(root, name + ".tmp")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(raw, name))
    }
    (1 to 5).foreach(i => drop(f"img_$i%03d.jpg", Array.fill[Byte](100 + i)(i.toByte)))
    def runBin(): Unit = {
      val q = spark.readStream.format(AutoLoader.format)
        .option("path", raw).option("fileFormat", "binaryFile").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    runBin()
    (6 to 8).foreach(i => drop(f"img_$i%03d.jpg", Array.fill[Byte](100 + i)(i.toByte)))
    runBin()
    val got = spark.read.parquet(out)
      .select("path", "length", "content").collect()
      .map(r => (new java.io.File(r.getString(0)).getName, r.getLong(1),
        r.getAs[Array[Byte]](2).length))
    assert(got.length == 8, s"8 raw files exactly once, got ${got.length}")
    assert(got.forall { case (n, len, clen) =>
      val i = n.stripPrefix("img_").stripSuffix(".jpg").toInt
      len == 100 + i && clen == 100 + i
    }, got.mkString(","))
    // declaring a schema for a fixed-schema format refuses loudly
    val e = intercept[Exception] {
      spark.readStream.format(AutoLoader.format)
        .option("path", raw).option("fileFormat", "binaryFile")
        .schema(AutoLoader.BinaryFileSchema).load()
    }
    assert(e.getMessage.contains("FIXED schema"), e.getMessage)
  }

  test("text ingest: one row per line with the source path attached") {
    val root = Files.createTempDirectory("graft_al_txt").toString
    val (raw, out, ckpt) = (root + "/raw", root + "/out", root + "/ckpt")
    new java.io.File(raw).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(raw, "a.txt"),
      "alpha\nbeta\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(raw, "b.txt"),
      "gamma\n".getBytes)
    val q = spark.readStream.format(AutoLoader.format)
      .option("path", raw).option("fileFormat", "text").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), new java.io.File(r.getString(1)).getName)).toSet
    assert(got == Set(("alpha", "a.txt"), ("beta", "a.txt"), ("gamma", "b.txt")), got.toString)
  }

  test("cleanSource retires committed raw files; uncommitted files survive a refusal") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_al_clean").toString
    val (raw, out, ckpt, arch) =
      (root + "/raw", root + "/out", root + "/ckpt", root + "/archive")
    (1L to 20L).map(i => (i, s"a$i")).toDF("id", "s").repartition(4)
      .write.mode("append").parquet(raw)
    def rawCount() = Option(new java.io.File(raw).listFiles())
      .fold(0)(_.count(_.getName.endsWith(".parquet")))
    val before = rawCount()
    // archive mode, paced 2 files/batch: each batch's getBatch archives
    // the COMMITTED prefix, so by run end only the final batch's files
    // can still be in the landing zone
    val q = spark.readStream.format(AutoLoader.format).option("path", raw)
      .option("maxFilesPerTrigger", "2")
      .option("cleanSource", "archive").option("sourceArchiveDir", arch).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(out).count() == 20L)
    assert(rawCount() <= 2, s"only the final batch may remain, found ${rawCount()}")
    assert(new java.io.File(arch).listFiles().count(_.getName.endsWith(".parquet"))
      == before - rawCount(), "archived, not deleted")
    // the stream keeps running correctly after cleaning: new files ingest
    // exactly once even though the old ones are gone from the listing
    (21L to 25L).map(i => (i, s"b$i")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(raw)
    def runDelete(): Unit = {
      val q2 = spark.readStream.format(AutoLoader.format).option("path", raw)
        .option("cleanSource", "delete").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q2.processAllAvailable(); q2.stop()
    }
    runDelete()
    assert(spark.read.parquet(out).as[(Long, String)].collect().map(_._1).toSet
      == (1L to 25L).toSet)
    assert(rawCount() <= 1, "at most the run's own final batch remains")
    // the next advancing run retires the previous run's final batch
    Seq((26L, "c")).toDF("id", "s").coalesce(1).write.mode("append").parquet(raw)
    runDelete()
    assert(spark.read.parquet(out).as[(Long, String)].collect().map(_._1).toSet
      == (1L to 26L).toSet)
    assert(rawCount() <= 1, "the retention loop keeps the landing zone bounded")
    // archive without a dir refuses at stream start (createSource is lazy)
    val e = intercept[Exception] {
      val qb = spark.readStream.format(AutoLoader.format).option("path", raw)
        .option("cleanSource", "archive").load()
        .writeStream.format("parquet")
        .option("path", root + "/out2")
        .option("checkpointLocation", root + "/ckpt2").start()
      qb.processAllAvailable(); qb.stop()
    }
    assert(e.getMessage.contains("sourceArchiveDir") ||
      Option(e.getCause).exists(_.getMessage.contains("sourceArchiveDir")), e.getMessage)
  }

  test("cleanSource crash matrix: {delete,archive} × {crash-before,after-commit} replay exactly-once") {
    import spark.implicits._
    for (mode <- Seq("delete", "archive")) {
      val root = Files.createTempDirectory(s"graft_al_crash_$mode").toString
      val (raw, out, ckpt, arch) =
        (root + "/raw", root + "/out", root + "/ckpt", root + "/archive")
      def rawParquets() = Option(new java.io.File(raw).listFiles())
        .fold(0)(_.count(_.getName.endsWith(".parquet")))
      def run(clean: Boolean): Unit = {
        val base = spark.readStream.format(AutoLoader.format).option("path", raw)
          .option("maxFilesPerTrigger", "1")
        val reader =
          if (!clean) base
          else if (mode == "delete") base.option("cleanSource", "delete")
          else base.option("cleanSource", "archive").option("sourceArchiveDir", arch)
        val q = reader.load().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }
      (1L to 40L).map(i => (i, s"a$i")).toDF("id", "s").repartition(4)
        .write.mode("append").parquet(raw)
      // CRASH-BEFORE-COMMIT: run WITHOUT cleaning (so raw stays intact —
      // exactly what a real crash leaves, since cleanup strictly follows
      // the commit), then drop the last commit marker: the restart must
      // REPLAY that batch from the still-present raw files
      run(clean = false)
      assert(spark.read.parquet(out).count() == 40L)
      val commits = new java.io.File(ckpt, "commits").listFiles()
        .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
      assert(commits.length == 4, s"paced 4 files at 1/trigger: ${commits.length}")
      assert(commits.last.delete())
      // the local fs keeps a hidden checksum twin; a real crash loses both
      new java.io.File(ckpt + "/commits", s".${commits.last.getName}.crc").delete()
      run(clean = true) // restart in cleaning mode replays batch 3
      assert(spark.read.parquet(out).as[(Long, String)].collect().map(_._1).toSet
        == (1L to 40L).toSet, s"[$mode] replayed batch must land exactly once")
      // the committed prefix was retired during the replayed run
      assert(rawParquets() <= 1, s"[$mode] committed prefix must retire, ${rawParquets()} left")
      if (mode == "archive")
        assert(new java.io.File(arch).listFiles().count(_.getName.endsWith(".parquet"))
          == 4 - rawParquets(), "retired files are archived, not deleted")
      // CRASH-AFTER-COMMIT: everything committed (and possibly already
      // retired); a plain restart must neither re-ingest nor fail on the
      // vanished files, and new arrivals still ingest exactly once
      run(clean = true)
      (41L to 45L).map(i => (i, s"b$i")).toDF("id", "s").coalesce(1)
        .write.mode("append").parquet(raw)
      run(clean = true)
      assert(spark.read.parquet(out).as[(Long, String)].collect().map(_._1).toSet
        == (1L to 45L).toSet, s"[$mode] post-crash stream stays exactly-once")
    }
  }

  test("end-to-end into a versioned table: exactly-once through both layers") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_al_e2e").toString
    val (raw, table, ckpt) = (root + "/raw", root + "/t", root + "/ckpt")
    (1L to 20L).map(i => (i, s"a$i")).toDF("id", "s").repartition(2)
      .write.mode("append").parquet(raw)
    def runE2E(): Unit = {
      val q = spark.readStream.format(AutoLoader.format).option("path", raw).load()
        .writeStream.format(VersionedStream.format)
        .option("path", table).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    runE2E()
    assert(VersionedTable.read(spark, table).count() == 20L)
    (21L to 25L).map(i => (i, s"b$i")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(raw)
    runE2E()
    assert(VersionedTable.read(spark, table).count() == 25L)
    assert(VersionedTable.read(spark, table).select("id").as[Long]
      .collect().toSet == (1L to 25L).toSet)
  }
}

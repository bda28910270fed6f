package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TarShardsSpec extends SparkSpec {

  import scala.sys.process._

  private def mkDocs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val text = i % 7 match {
        case 0 => "" // empty payload: zero data blocks
        case 1 => "unicode ✓ 中文 émoji " * (i % 5 + 1)
        case _ => s"doc $i body " * (i % 97 + 1) // crosses 512-byte blocks
      }
      (f"$i%012d.txt", text.getBytes(StandardCharsets.UTF_8), i.toLong, text)
    }.toDF("member", "payload", "id", "text")
  }

  test("shard round-trip is lossless and shard assignment is deterministic") {
    val docs = mkDocs(200).cache()
    val dir1 = Files.createTempDirectory("graft_tar_a").toString + "/s"
    val dir2 = Files.createTempDirectory("graft_tar_b").toString + "/s"
    TarShards.writeShards(docs, "member", "payload", dir1, nShards = 5)
    TarShards.writeShards(docs.repartition(11), "member", "payload", dir2, nShards = 5)

    val back = TarShards.readShards(spark, dir1)
      .select(regexp_extract(col("member"), "([0-9]+)\\.txt$", 1).cast("long").as("id"),
        decode(col("content"), "UTF-8").as("text"))
    val diff = back.union(docs.select("id", "text"))
      .groupBy("id", "text").count().where(col("count") =!= 2)
    assert(diff.count() == 0, "round-tripped rows differ from the source")

    // byte-determinism: same rows → same shard bytes, regardless of the
    // input partitioning (hash assignment + intra-shard sort)
    val files1 = new java.io.File(dir1).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    val files2 = new java.io.File(dir2).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    assert(files1.map(_.getName).toSeq == files2.map(_.getName).toSeq)
    files1.zip(files2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(Files.readAllBytes(a.toPath), Files.readAllBytes(b.toPath)),
        s"${a.getName} bytes differ across runs")
    }
    assert(files1.forall(f => !f.getName.contains("tmp")), "tmp files leaked")
  }

  test("orphaned tmp files from a killed attempt are swept on the next write") {
    val docs = mkDocs(20)
    val dir  = Files.createTempDirectory("graft_tar_tmp").toString + "/s"
    TarShards.writeShards(docs, "member", "payload", dir, nShards = 2)
    // forge the artifact a killed task leaves behind
    val orphan = new java.io.File(dir, ".shard-00001.tar.999.tmp")
    Files.write(orphan.toPath, "partial bytes".getBytes(StandardCharsets.UTF_8))
    TarShards.writeShards(docs, "member", "payload", dir, nShards = 2)
    assert(!orphan.exists(), "re-export must sweep orphaned .tmp files")
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar")) == 2)
  }

  test("shards are standard archives readable by GNU tar") {
    val docs = mkDocs(40)
    val dir  = Files.createTempDirectory("graft_tar_gnu").toString + "/s"
    TarShards.writeShards(docs, "member", "payload", dir, nShards = 2)
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    // cross-implementation check: GNU tar must list every member (it
    // validates magic + checksum on the way)
    val listed = Seq("tar", "-tf", shard.getAbsolutePath).!!.split("\n").filter(_.nonEmpty).toSet
    val expected = TarShards.readShards(spark, dir)
      .where(col("shard") === shard.getName)
      .select("member").collect().map(_.getString(0)).toSet
    assert(listed == expected, "GNU tar listing disagrees with our parser")
    // and payloads must extract byte-identical
    val work = Files.createTempDirectory("graft_tar_x").toFile
    assert(Seq("tar", "-xf", shard.getAbsolutePath, "-C", work.getAbsolutePath).! == 0)
    val member = expected.toSeq.sorted.last
    val extracted = Files.readAllBytes(new java.io.File(work, member).toPath)
    val ours = TarShards.readShards(spark, dir)
      .where(col("member") === member).select("content")
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(extracted, ours))
  }

  test("shardBy co-locates multi-member examples in one shard") {
    import spark.implicits._
    val members = (0 until 60).flatMap { i =>
      Seq((s"k$i", f"k$i%s.jpg", Array[Byte](1, 2, 3)),
        (s"k$i", f"k$i%s.txt", s"caption $i".getBytes(StandardCharsets.UTF_8)))
    }.toDF("key", "member", "payload")
    val dir = Files.createTempDirectory("graft_tar_co").toString + "/s"
    TarShards.writeShards(members, "member", "payload", dir, nShards = 4,
      shardBy = col("key"))
    val placement = TarShards.readShards(spark, dir)
      .select(regexp_extract(col("member"), "^(.*)\\.", 1).as("key"), col("shard"))
      .groupBy("key").agg(countDistinct("shard").as("n"), count(lit(1)).as("m"))
      .collect()
    assert(placement.length == 60)
    placement.foreach { r =>
      assert(r.getLong(1) == 1L, s"${r.getString(0)} split across shards")
      assert(r.getLong(2) == 2L, s"${r.getString(0)} lost a member")
    }
    // and the shards genuinely spread (not all in one)
    val nShardsUsed = TarShards.readShards(spark, dir).select("shard").distinct().count()
    assert(nShardsUsed >= 2)
  }

  test("reverse interop: archives CREATED BY GNU tar parse back byte-exact") {
    val work = Files.createTempDirectory("graft_tar_rev").toFile
    val payloads = Map(
      "a.txt" -> "hello tar".getBytes(StandardCharsets.UTF_8),
      "b.bin" -> Array.tabulate(700)(i => (i * 7 % 251).toByte), // crosses a block
      "empty.txt" -> Array.emptyByteArray)
    payloads.foreach { case (n, b) =>
      Files.write(new java.io.File(work, n).toPath, b)
    }
    val shardDir = Files.createTempDirectory("graft_tar_revs").toString
    val tarPath  = s"$shardDir/gnu.tar"
    // GNU tar's own writer (its default format, nonzero mtimes/uids)
    assert(Seq("tar", "-cf", tarPath, "-C", work.getAbsolutePath,
      "a.txt", "b.bin", "empty.txt").! == 0)
    val back = TarShards.readShards(spark, shardDir)
      .collect().map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toMap
    assert(back.keySet == payloads.keySet, s"members: ${back.keySet}")
    payloads.foreach { case (n, b) =>
      assert(java.util.Arrays.equals(back(n), b), s"$n payload corrupted")
    }
  }

  test("re-export with fewer shards leaves no stale shards behind") {
    val docs = mkDocs(100)
    val dir  = Files.createTempDirectory("graft_tar_re").toString + "/s"
    TarShards.writeShards(docs, "member", "payload", dir, nShards = 8)
    TarShards.writeShards(docs, "member", "payload", dir, nShards = 2)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(files.length <= 2, s"stale shards survived: ${files.map(_.getName).mkString(",")}")
    assert(TarShards.readShards(spark, dir).count() == 100)
  }

  test("truncated shard fails loudly, not with partial rows") {
    val docs = mkDocs(10)
    val dir  = Files.createTempDirectory("graft_tar_tr").toString + "/s"
    TarShards.writeShards(docs, "member", "payload", dir, nShards = 1)
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    val bytes = Files.readAllBytes(shard.toPath)
    Files.write(shard.toPath, java.util.Arrays.copyOf(bytes, bytes.length - 1536))
    val ex = intercept[Exception] {
      TarShards.readShards(spark, dir).count()
    }
    assert(ex.getMessage != null)
  }

  test("property: arbitrary binary payloads round-trip bit-exact through encode+parse") {
    val rnd = new scala.util.Random(7)
    val cases = (0 until 60).map { i =>
      val n = if (i % 10 == 0) 0 else rnd.nextInt(2000) // empties + block-crossers
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      (f"m$i%04d.bin", b)
    }
    val archive = cases.toArray.flatMap { case (n, b) => TarShards.memberBytes(n, b) } ++
      new Array[Byte](1024)
    val parsed = TarShards.parseTar(archive)
    assert(parsed.map(_._1) == cases.map(_._1))
    parsed.zip(cases).foreach { case ((_, got), (name, want)) =>
      assert(java.util.Arrays.equals(got, want), s"$name payload corrupted")
    }
  }

  test("member names over 100 bytes are rejected with a clear error") {
    val ex = intercept[IllegalArgumentException] {
      TarShards.memberBytes("x" * 101, Array.emptyByteArray)
    }
    assert(ex.getMessage.contains("too long"))
  }
}

package graft

import graft.tables.BloomIndex
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkSpec {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_bloomtest").toString + "/t"

  test("zero false negatives: every present key found; absent keys mostly prune to nothing") {
    val c = Tables.load(spark, sfDir, "customer").select("c_custkey", "c_name")
    val path = freshDir()
    c.repartition(8).write.parquet(path)
    BloomIndex.write(spark, path, "c_custkey", expectedPerFile = 1000L)
    val present = c.select("c_custkey").collect().map(_.getLong(0)).take(25)
    present.foreach { k =>
      val hit = BloomIndex.lookup(spark, path, "c_custkey", k.toString).count()
      assert(hit >= 1, s"present key $k not found — false negative, which blooms forbid")
    }
    // absent keys: expected kept files ≈ 8 * fpp — allow generous slack
    val absentKept = (1 to 30).map { i =>
      BloomIndex.prunedFiles(spark, path, "c_custkey", s"${1000000 + i}")._1.size
    }.sum
    assert(absentKept <= 30, s"absent keys kept $absentKept file-lookups across 30 probes")
    // lookup result ≡ plain equality filter (sampled)
    val k0 = present.head
    val viaBloom = BloomIndex.lookup(spark, path, "c_custkey", k0.toString)
      .collect().map(_.toString).sorted.toSeq
    val plain = spark.read.parquet(path).where(col("c_custkey") === k0)
      .collect().map(_.toString).sorted.toSeq
    assert(viaBloom == plain)
  }

  test("stale index and missing index fail loudly") {
    val c = Tables.load(spark, sfDir, "customer").select("c_custkey")
    val path = freshDir()
    c.repartition(4).write.parquet(path)
    val missing = intercept[IllegalStateException] {
      BloomIndex.lookup(spark, path, "c_custkey", "1")
    }
    assert(missing.getMessage.contains("BloomIndex.write"))
    BloomIndex.write(spark, path, "c_custkey")
    c.limit(5).coalesce(1).write.mode("append").parquet(path)
    val stale = intercept[IllegalArgumentException] {
      BloomIndex.lookup(spark, path, "c_custkey", "1")
    }
    assert(stale.getMessage.contains("STALE"))
    BloomIndex.write(spark, path, "c_custkey") // rebuild heals
    assert(BloomIndex.prunedFiles(spark, path, "c_custkey", "1")._2 == 5)
  }
}

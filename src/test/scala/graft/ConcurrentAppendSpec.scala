package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._
import graft.tables.VersionedTable

/** Lock-free append staging: commitAppend's O(data) phase (parquet write +
  * constraint proof) runs OUTSIDE the write lease; only the O(metadata)
  * publish tail serializes, with bounded retry on a live rival. These
  * specs pin the two behaviors that buys: (1) N concurrent appenders all
  * land exactly once with contiguous versions, (2) one appender's slow
  * staging does not serialize the others behind it. */
class ConcurrentAppendSpec extends SparkSpec {
  import spark.implicits._

  private def dirOf() =
    java.nio.file.Files.createTempDirectory("graft_capp").toString + "/t"

  test("concurrent appenders: every batch lands exactly once, versions contiguous") {
    val dir = dirOf()
    VersionedTable.commitAppend(spark, Seq((-1L, -1L)).toDF("k", "x"), dir) // v0
    val nThreads = 4
    val perThread = 3
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        start.await()
        try (0 until perThread).foreach { i =>
          val k = (t * perThread + i).toLong
          VersionedTable.commitAppend(spark,
            Seq((k, k * 10)).toDF("k", "x"), dir)
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"appender errors: ${errs.toArray.mkString("; ")}")
    val total = 1 + nThreads * perThread
    assert(VersionedTable.log(dir).map(_._1) == (0L until total.toLong),
      "versions must be contiguous")
    val rows = VersionedTable.read(spark, dir).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == (-1L until (nThreads * perThread).toLong).toSeq,
      s"every batch exactly once; got ${rows.mkString(",")}")
  }

  test("slow staging does not hold the lease: fast appenders commit DURING a rival's stage") {
    val dir = dirOf()
    VersionedTable.commitAppend(spark, Seq((0L, 0L)).toDF("k", "x"), dir) // v0
    val marker = java.nio.file.Files.createTempDirectory("graft_capp_m")
      .resolve("staging-started").toString
    // the slow appender's source plan sleeps INSIDE its write task — the
    // staging phase takes ≥2.5 s; under lease-held-during-staging semantics
    // the fast appender below would contend for that whole window
    val slowDf = spark.range(1).select(lit(999L).as("k"), lit(999L).as("x"))
      .map { r =>
        java.nio.file.Files.createFile(java.nio.file.Paths.get(marker))
        Thread.sleep(2500)
        (r.getLong(0), r.getLong(1))
      }.toDF("k", "x")
    @volatile var slowV = -1L
    val slow = new Thread(() => { slowV = VersionedTable.commitAppend(spark, slowDf, dir) })
    slow.start()
    // wait for the slow stage to be provably in flight
    val t0 = System.currentTimeMillis()
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(marker)) &&
      System.currentTimeMillis() - t0 < 30000) Thread.sleep(10)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(marker)), "slow stage never started")
    // three fast appends while the rival is mid-stage
    val fastVs = (1 to 3).map { i =>
      VersionedTable.commitAppend(spark, Seq((i.toLong, i.toLong)).toDF("k", "x"), dir)
    }
    slow.join(TimeUnit.SECONDS.toMillis(60))
    assert(slowV >= 0, "slow append never committed")
    assert(fastVs.max < slowV,
      s"fast appends ($fastVs) must commit BEFORE the slow stager's publish ($slowV)")
    assert(VersionedTable.read(spark, dir).count() == 5)
  }
}

package graft

import java.nio.file.Files

import graft.tables.{FsIO, TimePartitioned}
import org.apache.spark.sql.functions._

/** A RawLocalFileSystem wearing a scheme FsIO does not recognize as
  * having an atomic create-no-overwrite — the stand-in for S3A-without-
  * conditional-writes in the lock-honesty gate test. */
class MockNonAtomicFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

/** The maintenance-lease heartbeat (VERDICT r16 finding #1): a write
  * lease held across a DATA-PROPORTIONAL write must renew, or a
  * legitimately slow writer (a 100 TB staged overwrite runs hours) looks
  * crashed to the load-time heal, which then seizes the lock and deletes
  * the intent-less live stage — with the worst case being a truncated-
  * newDays intent that retires every old day (silent table loss). These
  * tests prove: a heartbeated holder never looks stale; a concurrent
  * heal during a slower-than-lease stage write is a no-op; and a writer
  * whose lease IS lost aborts loudly BEFORE publishing any intent. */
class LeaseHeartbeatSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft_lease").toString

  // epoch-nanos base inside 2023-11-14 UTC; +1 day for the second batch
  private val Day1 = 1700000000000000000L
  private val Day2 = Day1 + 86400L * 1000000000L

  test("fixed lease goes stale under a slow holder; heartbeat lease never does") {
    val root = tmp()
    // control — the r16 hazard: ts written once at acquire, a rival's
    // takeover succeeds once the body outlives the lease
    val dirA = root + "/a"
    FsIO.acquireWriteLock(dirA, "slow-fixed", staleMs = 400)
    Thread.sleep(900)
    val rivalA = FsIO.acquireWriteLock(dirA, "rival", staleMs = 400)
    FsIO.releaseWriteLock(rivalA)
    // heartbeated — same timings, the rival must stay locked out for the
    // whole body because the renewal keeps the lease age under staleMs/3
    val dirB = root + "/b"
    // wide margins: suites run in parallel and the heartbeat thread can be
    // starved — renewal every 500 ms against a 1.5 s lease tolerates ~1 s
    // of scheduler delay without reading as stale
    FsIO.withWriteLockHeartbeat(dirB, "slow-hb", staleMs = 1500) { hb =>
      Thread.sleep(2500) // well past the lease; only renewals keep it live
      intercept[FsIO.LockBusy] {
        FsIO.acquireWriteLock(dirB, "rival", staleMs = 1500)
      }
      hb.verifyOwned("end of body")
      assert(!hb.lost)
    }
    // released on exit: a fresh acquire succeeds immediately
    FsIO.releaseWriteLock(FsIO.acquireWriteLock(dirB, "after", staleMs = 1500))
  }

  test("verifyOwned aborts once a foreign owner replaces the lock") {
    val dir = tmp() + "/t"
    val e = intercept[RuntimeException] {
      FsIO.withWriteLockHeartbeat(dir, "writer", staleMs = 300) { hb =>
        FsIO.writeText(dir + ".__write_lock",
          s"owner=intruder\nts=${System.currentTimeMillis()}\nlabel=rival\n")
        // poll: under parallel-suite load a heartbeat tick can be delayed
        val deadline = System.currentTimeMillis() + 10000
        while (!hb.lost && System.currentTimeMillis() < deadline) Thread.sleep(50)
        assert(hb.lost, "heartbeat renewal should have flagged the foreign owner")
        hb.verifyOwned("publishing")
        fail("verifyOwned must abort on a lost lease")
      }
    }
    assert(e.getMessage.contains("lost before publishing"))
  }

  test("overwriteStaged slower than the lease survives concurrent heal attempts") {
    val dir = tmp() + "/t"
    val old = spark.range(0, 6).select((lit(Day1) + col("id")).as("ts"), col("id").as("v"))
    TimePartitioned.write(old, dir, "ts", filesPerDay = 1)
    // one upstream partition + one day partition: the 24 sleeps run
    // sequentially, so the stage write takes ~2.9 s against a 1.2 s lease
    // (renewal every 400 ms — ~800 ms of scheduler-delay tolerance)
    val slow = udf((x: Long) => { Thread.sleep(120L); x })
    val next = spark.range(0, 24, 1, numPartitions = 1)
      .select((lit(Day2) + col("id")).as("ts"), slow(col("id") + 100L).as("v"))
    val healerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    @volatile var writing = true
    val healer = new Thread(() => {
      try while (writing) {
        TimePartitioned.heal(spark, dir, leaseMs = 1200) // LockBusy no-op vs a LIVE writer
        Thread.sleep(100)
      } catch { case t: Throwable => healerErr.set(t) }
    })
    healer.start()
    try TimePartitioned.overwriteStaged(next, dir, "ts", filesPerDay = 1, leaseMs = 1200)
    finally { writing = false; healer.join(10000) }
    assert(healerErr.get() == null, s"healer failed: ${healerErr.get()}")
    val got = spark.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (100L until 124L), "overwrite result lost or truncated")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_overwrite_stage")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_overwrite_trash")))
  }

  test("a writer that loses its lease mid-write aborts BEFORE publishing an intent") {
    val dir = tmp() + "/t"
    val old = spark.range(0, 6).select((lit(Day1) + col("id")).as("ts"), col("id").as("v"))
    TimePartitioned.write(old, dir, "ts", filesPerDay = 1)
    val slow = udf((x: Long) => { Thread.sleep(150L); x })
    val next = spark.range(0, 14, 1, numPartitions = 1)
      .select((lit(Day2) + col("id")).as("ts"), slow(col("id") + 100L).as("v"))
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try TimePartitioned.overwriteStaged(next, dir, "ts", filesPerDay = 1, leaseMs = 600)
      catch { case t: Throwable => failure.set(t) }
    })
    writer.start()
    Thread.sleep(800) // mid stage-write: seize the lease like a healer would
    FsIO.writeText(dir + ".__write_lock",
      s"owner=intruder\nts=${System.currentTimeMillis()}\nlabel=heal-takeover\n")
    writer.join(30000)
    assert(!writer.isAlive, "writer hung after losing its lease")
    val t = failure.get()
    assert(t != null, "writer must abort once its lease is seized")
    assert(t.getMessage.contains("lost before"), s"unexpected failure: $t")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the invariant the heartbeat protects: NO intent — complete or torn —
    // may exist from an aborted writer (recovery rolling a truncated
    // intent forward is the silent-data-loss path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_overwrite_stage/_intent")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_overwrite_stage/_intent.tmp")))
    // old table intact (the stage subdir is underscore-hidden from readers)
    val got = spark.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 6L), "old snapshot must be untouched")
    // once the intruder's lease ages out, heal classifies the orphan
    // stage-without-intent as crash garbage and the table stays on the
    // old snapshot
    FsIO.writeText(dir + ".__write_lock",
      s"owner=intruder\nts=${System.currentTimeMillis() - 10000}\nlabel=heal-takeover\n")
    TimePartitioned.heal(spark, dir, leaseMs = 600)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_overwrite_stage")))
    val after = spark.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted
    assert(after.toSeq == (0L until 6L))
  }

  test("lock honesty: a scheme without atomic create is refused unless opted in") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.mock.impl", classOf[MockNonAtomicFs].getName)
    conf.set("fs.mock.impl.disable.cache", "true")
    val dir = "mock:" + tmp() + "/t"
    val e = intercept[IllegalStateException] {
      FsIO.acquireWriteLock(dir, "w", staleMs = 60000, conf = conf)
    }
    assert(e.getMessage.contains(FsIO.BestEffortLockKey))
    conf.setBoolean(FsIO.BestEffortLockKey, true)
    val l = FsIO.acquireWriteLock(dir, "w", staleMs = 60000, conf = conf)
    FsIO.releaseWriteLock(l, conf)
  }
}

package graft

import java.nio.file.Files

import graft.tables.TimePartitioned
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** CROSS-JVM race test for `append` vs a live/killed `overwriteStaged`
  * (VERDICT r17 #1/#3 — the silent-row-loss race the r17 audit found):
  * before round 18, `append` heal-no-op'd on LockBusy and wrote anyway,
  * so an append racing a live overwrite could land rows in a root
  * `p_day=` dir the writer's intent had already recorded as "retire" —
  * the swap then renamed the dir, fresh rows included, into trash and
  * deleted it. Now `append` holds the same heartbeat lease as every
  * maintenance writer. These tests prove the end state across a REAL
  * second JVM at the three interleavings that matter: the writer LIVES
  * (append must wait out the whole stage+swap and land post-swap), the
  * writer is SIGKILLed MID-STAGE (append takes over the stale lease,
  * heals back to the old snapshot, lands there), and SIGKILLed MID-SWAP
  * (append heals the intent FORWARD, lands on the new snapshot). In all
  * three: the appended row is never lost and never duplicated. */
class DayTableAppendRaceSpec extends SparkSpec {

  private val Day1    = DayStressChild.Day1
  private val DayNs   = 86400L * 1000000000L
  private val OldDays = 40

  private def seedOld(dir: String): Unit =
    TimePartitioned.write(
      spark.range(0L, OldDays.toLong).select(
        (lit(Day1) + col("id") * lit(DayNs)).as("ts"), col("id").as("v")),
      dir, "ts", filesPerDay = 1)

  private def vals(dir: String): Seq[Long] =
    spark.read.parquet(dir).select("v").collect().map(_.getLong(0)).toSeq

  private val oldSnapshot = (0L until OldDays.toLong).toSet
  private val newSnapshot =
    (0L until DayStressChild.NewDays.toLong).map(_ + DayStressChild.NewTag).toSet
  private val Marker = 999999L

  private def appendMarker(dir: String, leaseMs: Long): Unit =
    TimePartitioned.append(
      spark.range(0, 1).select(lit(Day1).as("ts"), lit(Marker).as("v")),
      dir, "ts", filesPerDay = 1, leaseMs = leaseMs, maxWaitMs = 180000L)

  test("append racing a LIVE cross-JVM overwrite waits and lands post-swap") {
    val root = Files.createTempDirectory("graft_apprace").toString
    val dir  = root + "/t"
    seedOld(dir)
    val fs    = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(dir, "_overwrite_stage")
    val log   = new java.io.File(root, "child.log")
    // generous child lease: the parent must NEVER read the live writer as
    // stale here — this test is about waiting, not takeover
    val child = DayChildHarness.spawn(dir, leaseMs = 10000L, log)
    try {
      val deadline = System.currentTimeMillis() + 120000L
      while (child.isAlive && !fs.exists(stage) &&
          System.currentTimeMillis() < deadline) Thread.onSpinWait()
      assert(fs.exists(stage) || DayChildHarness.childDone(log),
        s"child never staged:\n${DayChildHarness.logTail(log)}")
      // mid-stage append from THIS JVM: blocks on the child's lease
      appendMarker(dir, leaseMs = 10000L)
      child.waitFor()
      assert(DayChildHarness.childDone(log),
        s"child overwrite failed:\n${DayChildHarness.logTail(log)}")
      // the appended row landed strictly after the swap: full new
      // snapshot + marker, marker exactly once, nothing retired with it
      val got = vals(dir)
      assert(got.count(_ == Marker) == 1, s"appended row lost or duplicated: $got")
      assert(got.toSet == newSnapshot + Marker,
        s"append raced the overwrite into row loss (got ${got.size} rows)")
    } finally { child.destroyForcibly(); child.waitFor() }
  }

  private def killThenAppend(
      killWhen: (org.apache.hadoop.fs.FileSystem, Path) => Boolean): Unit = {
    val root = Files.createTempDirectory("graft_apprace").toString
    val dir  = root + "/t"
    seedOld(dir)
    val fs     = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage  = new Path(dir, "_overwrite_stage")
    val intent = new Path(stage, "_intent")
    val log    = new java.io.File(root, "child.log")
    val child  = DayChildHarness.spawn(dir, leaseMs = 1000L, log)
    val deadline = System.currentTimeMillis() + 120000L
    var sawStage = false
    while (child.isAlive && {
        sawStage = sawStage || fs.exists(stage)
        !killWhen(fs, new Path(dir))
      } && System.currentTimeMillis() < deadline) Thread.onSpinWait()
    child.destroyForcibly()
    child.waitFor()
    sawStage = sawStage || fs.exists(stage)
    assert(sawStage || DayChildHarness.childDone(log),
      s"child never started:\n${DayChildHarness.logTail(log)}")
    // the snapshot the kill point implies (exactly DayTableCrossJvmSpec's
    // rule): a surviving intent or a completed overwrite rolls FORWARD
    val expected =
      if (!fs.exists(stage) || fs.exists(intent)) newSnapshot else oldSnapshot
    // the append itself is the healer here: it retries the dead writer's
    // lease until stale, takes over, heals, and lands — no separate heal
    // call, which is exactly how a production appender meets a crash
    appendMarker(dir, leaseMs = 1000L)
    val got = vals(dir)
    assert(got.count(_ == Marker) == 1, s"appended row lost or duplicated: $got")
    assert(got.toSet == expected + Marker,
      s"append did not land on the healed snapshot (expected ${expected.size}+1 " +
        s"rows, got ${got.size})")
    assert(!fs.exists(stage), "stage must be cleaned by the append's heal")
    assert(!fs.exists(new Path(dir, "_overwrite_trash")),
      "trash must be cleaned by the append's heal")
  }

  test("writer SIGKILLed mid stage write: append heals to the OLD snapshot and lands") {
    killThenAppend { (fs, root) =>
      fs.exists(new Path(root, "_overwrite_stage")) && { Thread.sleep(300); true }
    }
  }

  test("writer SIGKILLed at the intent / mid swap: append heals FORWARD and lands") {
    killThenAppend { (fs, root) =>
      fs.exists(new Path(root, "_overwrite_stage/_intent"))
    }
  }
}

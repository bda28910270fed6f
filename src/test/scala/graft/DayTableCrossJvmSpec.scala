package graft

import java.nio.file.Files

import graft.tables.TimePartitioned
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** CROSS-JVM crash test for the day-table overwrite protocol (VERDICT
  * r16 #4): TimePartitionedSpec proves recovery from PLANTED crash
  * states; this spec produces them for real — a second JVM runs
  * `overwriteStaged` and is SIGKILLed at a protocol point chosen by
  * watching the filesystem (mid stage write = before the intent; mid
  * swap = right after the intent publishes). The parent then plays the
  * concurrent-reader role: waits out the dead writer's lease, heals, and
  * must converge on an ATOMIC snapshot — entirely the old table or
  * entirely the new one, decided exactly by whether the intent survived
  * the kill. A post-heal append proves the table is fully writable. */
class DayTableCrossJvmSpec extends SparkSpec {

  private val Day1    = DayStressChild.Day1
  private val DayNs   = 86400L * 1000000000L
  private val OldDays = 40
  private val ChildLeaseMs = 1000L

  private def seedOld(dir: String): Unit =
    TimePartitioned.write(
      spark.range(0L, OldDays.toLong).select(
        (lit(Day1) + col("id") * lit(DayNs)).as("ts"), col("id").as("v")),
      dir, "ts", filesPerDay = 1)

  private def spawn(dir: String, log: java.io.File): Process =
    DayChildHarness.spawn(dir, ChildLeaseMs, log)

  private def vSet(dir: String): Set[Long] =
    spark.read.parquet(dir).select("v").collect().map(_.getLong(0)).toSet

  private val oldSnapshot = (0L until OldDays.toLong).toSet
  private val newSnapshot =
    (0L until DayStressChild.NewDays.toLong).map(_ + DayStressChild.NewTag).toSet

  /** Spawn the child, kill it when `killWhen` first returns true (or let
    * it finish), then heal from THIS JVM after the dead writer's lease
    * ages out and assert atomic convergence. */
  private def runIteration(killWhen: (org.apache.hadoop.fs.FileSystem, Path) => Boolean): Unit = {
    val root = Files.createTempDirectory("graft_dayjvm").toString
    val dir  = root + "/t"
    seedOld(dir)
    assert(vSet(dir) == oldSnapshot)
    val fs     = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage  = new Path(dir, "_overwrite_stage")
    val intent = new Path(stage, "_intent")
    val log    = new java.io.File(root, "child.log")
    val child  = spawn(dir, log)
    val deadline = System.currentTimeMillis() + 120000L
    var sawStage = false
    while (child.isAlive && {
        sawStage = sawStage || fs.exists(stage)
        !killWhen(fs, new Path(dir))
      } && System.currentTimeMillis() < deadline) {
      // tight poll — ms matter mid-swap — but yield the core between
      // probes: a pure busy-spin on a loaded host can starve the very
      // child JVM whose protocol point it is trying to observe
      Thread.onSpinWait()
    }
    child.destroyForcibly()
    child.waitFor()
    sawStage = sawStage || fs.exists(stage)
    val childDone = DayChildHarness.childDone(log)
    // 'no stage on disk' is only evidence of a COMPLETED overwrite if the
    // child actually ran one — a child that died at startup would
    // otherwise masquerade as the forward branch against an untouched
    // old table and produce a misleading wrong-snapshot failure
    assert(sawStage || childDone, s"child never started its overwrite — see ${log.getPath}:\n" +
      DayChildHarness.logTail(log))
    // the intended snapshot is decided by what survived the kill: a
    // surviving intent (or a completed overwrite) rolls FORWARD to the
    // new days; anything less is crash garbage and the old table stands
    val expected =
      if (!fs.exists(stage) || fs.exists(intent)) newSnapshot else oldSnapshot
    // concurrent reader: reads through the crash state and the heal (the
    // pre-heal reads exercise the transient per-day-gap contract and the
    // reader-vs-healer race); the CONVERGENCE latch only arms once the
    // heal completes — before it, a kill at the intent-publish instant
    // legitimately serves the intact old snapshot, which is not the
    // property under test
    @volatile var healDone = false
    val converged = new java.util.concurrent.atomic.AtomicReference[Set[Long]]()
    val reader = new Thread(() => {
      val stop = System.currentTimeMillis() + 90000L
      while (converged.get == null && System.currentTimeMillis() < stop) {
        try {
          val got = vSet(dir)
          if (healDone && (got == oldSnapshot || got == newSnapshot)) converged.set(got)
        } catch { case _: Throwable => () }
        Thread.sleep(50)
      }
    })
    reader.start()
    Thread.sleep(ChildLeaseMs + 1500) // let the dead writer's lease go stale
    TimePartitioned.heal(spark, dir, leaseMs = ChildLeaseMs)
    healDone = true
    reader.join(90000)
    assert(converged.get != null, "reader never converged on a whole snapshot")
    assert(converged.get == expected,
      s"reader converged on the wrong snapshot (expected ${expected.size} rows, " +
        s"got ${converged.get.size})")
    assert(vSet(dir) == expected, "post-heal table is not the intended snapshot")
    assert(!fs.exists(stage), "stage must be cleaned after heal")
    assert(!fs.exists(new Path(dir, "_overwrite_trash")), "trash must be cleaned after heal")
    // the healed table is fully writable: append lands next to the snapshot
    TimePartitioned.append(
      spark.range(0, 1).select(lit(Day1).as("ts"), lit(999999L).as("v")),
      dir, "ts", filesPerDay = 1)
    assert(vSet(dir) == expected + 999999L)
  }

  test("killed mid stage write (no intent yet): heal restores the OLD snapshot") {
    runIteration { (fs, root) =>
      // kill ~300ms after the stage dir appears — squarely inside the
      // child's multi-second 120-partition stage write, before any intent
      // (the expectation is still read from the FS after the kill, so a
      // freak instant write stays a pass on the forward branch)
      val stage = new Path(root, "_overwrite_stage")
      fs.exists(stage) && { Thread.sleep(300); true }
    }
  }

  test("killed at the intent / mid swap: heal rolls FORWARD to the NEW snapshot") {
    runIteration { (fs, root) =>
      fs.exists(new Path(root, "_overwrite_stage/_intent"))
    }
  }
}

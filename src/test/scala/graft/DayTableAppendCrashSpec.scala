package graft

import java.nio.file.Files

import graft.tables.TimePartitioned
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** CROSS-JVM crash test for the stage-then-publish APPEND protocol: a
  * REAL second JVM runs `TimePartitioned.append` and the parent SIGKILLs
  * it at the two protocol points that matter.
  *
  *  - Killed MID-STAGING (stage lease live, no `_publish_intent`): the
  *    batch must never land — once the stage lease goes stale, the next
  *    maintenance touch sweeps the stage and the table is byte-identical
  *    to before the append.
  *  - Killed AT/AFTER THE INTENT: the batch is durably committed — the
  *    next touch rolls the publish forward and every appended row lands
  *    EXACTLY once (the publish renames are idempotent under re-run).
  *
  * Because the kill lands on a real process at uncontrolled latency, the
  * decision rule is read from the surviving filesystem state, exactly as
  * in [[DayTableAppendRaceSpec]]: evidence of commitment (a surviving
  * intent, or already-published rows) means the batch must fully land;
  * no evidence means it must fully vanish. */
class DayTableAppendCrashSpec extends SparkSpec {

  private val Day1    = DayStressChild.Day1
  private val DayNs   = 86400L * 1000000000L
  private val OldDays = 10

  private def seedOld(dir: String): Unit =
    TimePartitioned.write(
      spark.range(0L, OldDays.toLong).select(
        (lit(Day1) + col("id") * lit(DayNs)).as("ts"), col("id").as("v")),
      dir, "ts", filesPerDay = 1)

  private def vals(dir: String): Seq[Long] =
    spark.read.parquet(dir).select("v").collect().map(_.getLong(0)).toSeq

  private val oldSnapshot = (0L until OldDays.toLong).toSet
  private val appended =
    (0L until DayStressChild.NewDays.toLong).map(_ + DayStressChild.NewTag).toSet

  /** Settle every crashed stage: heal repeatedly until the stage root is
    * EMPTY — heal legitimately returns true (no settleable evidence)
    * while the dead child's stage lease still looks live, so "heal
    * succeeded" is not the loop condition; "no stage remains" is. */
  private def settle(dir: String, leaseMs: Long): Unit = {
    val fs    = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sroot = TimePartitioned.appendStageRoot(dir)
    val deadline = System.currentTimeMillis() + 60000L
    def unsettled(): Boolean =
      fs.exists(sroot) && fs.listStatus(sroot).nonEmpty
    while (unsettled() && System.currentTimeMillis() < deadline) {
      Thread.sleep(leaseMs / 2)
      TimePartitioned.heal(spark, dir, leaseMs = leaseMs)
    }
    assert(!unsettled(), "heal never settled the crashed append stage")
  }

  private def killAppendChild(killWhen: (org.apache.hadoop.fs.FileSystem, Path) => Boolean): Unit = {
    val root  = Files.createTempDirectory("graft_appcrash").toString
    val dir   = root + "/t"
    seedOld(dir)
    val fs    = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sroot = TimePartitioned.appendStageRoot(dir)
    val log   = new java.io.File(root, "child.log")
    val child = DayChildHarness.spawn(dir, leaseMs = 1000L, log, mode = "append")
    val deadline = System.currentTimeMillis() + 120000L
    var sawStage = false
    while (child.isAlive && {
        sawStage = sawStage || fs.exists(sroot)
        !killWhen(fs, sroot)
      } && System.currentTimeMillis() < deadline) Thread.onSpinWait()
    child.destroyForcibly()
    child.waitFor()
    sawStage = sawStage || fs.exists(sroot)
    assert(sawStage || DayChildHarness.childDone(log),
      s"child never staged:\n${DayChildHarness.logTail(log)}")
    // decision rule from the surviving state: a durable intent or any
    // already-published appended row means COMMITTED
    def anyIntent: Boolean =
      fs.exists(sroot) && fs.listStatus(sroot).exists(s =>
        s.isDirectory && fs.exists(new Path(s.getPath, "_publish_intent")))
    val committed = anyIntent || DayChildHarness.childDone(log) ||
      vals(dir).exists(_ >= DayStressChild.NewTag)
    settle(dir, leaseMs = 1000L)
    val got = vals(dir)
    val expected = if (committed) oldSnapshot ++ appended else oldSnapshot
    assert(got.size == got.toSet.size, s"duplicated rows after crash settle: $got")
    assert(got.toSet == expected,
      s"append crash settled to the wrong snapshot (committed=$committed, " +
        s"expected ${expected.size} rows, got ${got.size})")
    assert(!fs.exists(sroot) || fs.listStatus(sroot).isEmpty,
      "settle must leave no stage behind")
  }

  test("appender SIGKILLed mid-staging: batch vanishes, table untouched") {
    killAppendChild { (fs, sroot) =>
      fs.exists(sroot) && { Thread.sleep(250); true }
    }
  }

  test("appender SIGKILLed at the publish intent: batch rolls forward exactly-once") {
    killAppendChild { (fs, sroot) =>
      fs.exists(sroot) && fs.listStatus(sroot).exists(s =>
        s.isDirectory && fs.exists(new Path(s.getPath, "_publish_intent")))
    }
  }
}

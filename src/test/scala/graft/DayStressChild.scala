package graft

import graft.tables.TimePartitioned
import org.apache.spark.sql.functions._

/** Child process for [[DayTableCrossJvmSpec]]: a REAL second JVM running
  * a day-table staged overwrite that the parent kills (SIGKILL) at a
  * protocol point it selects by watching the filesystem — before the
  * intent publish (mid stage write) or after it (mid swap). The child
  * uses a SHORT heartbeat lease so the parent's post-kill heal can take
  * over within seconds rather than the production 15 minutes.
  *
  * Writes 120 days (one row each, v = day index + 100000) over whatever
  * snapshot the parent seeded. Prints CHILD_DONE only if the overwrite
  * ran to completion (most iterations kill it first).
  *
  * With a third arg `append`, the child instead runs a stage-then-publish
  * APPEND of the same 120 one-row days ([[DayTableAppendCrashSpec]]): the
  * parent kills it mid-STAGING (stage lease live, no intent — the batch
  * must be swept, zero rows land) or mid-PUBLISH (intent durable — the
  * batch must roll forward exactly-once at the next touch). */
object DayStressChild {

  val Day1 = 1700000000000000000L // 2023-11-14 UTC, epoch nanos
  val NewDays = 120
  val NewTag  = 100000L

  def main(args: Array[String]): Unit = {
    val (dir, leaseMs, mode) = args match {
      case Array(d, l)    => (d, l.toLong, "overwrite")
      case Array(d, l, m) => (d, l.toLong, m)
    }
    val spark = GraftSession.builder("local[2]", shufflePartitions = 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.range(0L, NewDays.toLong).select(
        (lit(Day1) + col("id") * lit(86400L * 1000000000L)).as("ts"),
        (col("id") + NewTag).as("v"))
      if (mode == "append")
        TimePartitioned.append(df, dir, "ts", filesPerDay = 1,
          leaseMs = leaseMs, maxWaitMs = 60000L)
      else
        TimePartitioned.overwriteStaged(df, dir, "ts", filesPerDay = 1,
          leaseMs = leaseMs)
      println("CHILD_DONE")
    } finally spark.stop()
  }
}

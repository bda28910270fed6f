package graft

import graft.tables.TimePartitioned
import org.apache.spark.sql.functions._

class TimePartitionedSpec extends SparkSpec {

  private val Day = 86400L * 1000000000L

  test("day boundaries are exact and inclusive; reader prunes to the window's days") {
    import spark.implicits._
    val d0 = 19724L * Day // some UTC midnight
    val rows = Seq(
      (1L, d0 - 1L),       // last nano of the previous day
      (2L, d0),            // exactly midnight
      (3L, d0 + Day - 1L), // last nano of day 0
      (4L, d0 + Day),      // midnight day 1
      (5L, d0 + 2 * Day + 5L))
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_spec").toString + "/t"
    TimePartitioned.write(rows.toDF("id", "ts"), dir, "ts")
    // 4 distinct days → 4 partition dirs
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("p_day=")) == 4)
    def ids(from: Long, to: Long): Set[Long] =
      TimePartitioned.readRange(spark, dir, "ts", from, to)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(d0, d0 + Day) == Set(2L, 3L, 4L), "inclusive midnight-to-midnight window")
    assert(ids(d0 - 1L, d0 - 1L) == Set(1L), "single-nano window on a day edge")
    // the partition column never escapes
    val cols = TimePartitioned.readRange(spark, dir, "ts", d0, d0 + Day).columns.toSeq
    assert(cols == Seq("id", "ts"))
    // plan prunes: a one-day window reads one partition of four
    val scanned = TimePartitioned.readRange(spark, dir, "ts", d0, d0 + Day - 1L)
      .queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.selectedPartitions.partitionCount).sum
    assert(scanned == 1, s"one-day window planned $scanned partitions")
  }

  test("pre-epoch timestamps map to the correct (negative-day) partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_neg").toString + "/t"
    val t = -3L * Day + 7L // 1969-12-29 00:00:00.000000007
    TimePartitioned.write(Seq((1L, t)).toDF("id", "ts"), dir, "ts")
    assert(new java.io.File(dir).listFiles().exists(_.getName == "p_day=1969-12-29"))
    assert(TimePartitioned.readRange(spark, dir, "ts", t, t).count() == 1)
  }

  test("pre-epoch ts in the last second of a UTC day floors (not truncates) to that day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_floor").toString + "/t"
    // 1969-12-31 23:59:59.5 — trunc-div would store it under p_day=1970-01-01
    // and readRange's floorDiv pruning would silently drop it.
    val t = -500000000L
    TimePartitioned.write(Seq((1L, t)).toDF("id", "ts"), dir, "ts")
    assert(new java.io.File(dir).listFiles().exists(_.getName == "p_day=1969-12-31"),
      "write path must floor the day key like the reader does")
    assert(TimePartitioned.readRange(spark, dir, "ts", t, t).count() == 1)
  }
}

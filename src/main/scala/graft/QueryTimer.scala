package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: run a comma-separated subset of declared queries
  * in the given order, print per-query seconds. Used to isolate bench
  * interactions (e.g. leaked block-manager pressure between queries).
  *
  * Usage: runMain graft.QueryTimer <sfDir> q_a,q_b,q_c [--release] [--stages]
  * With --release, unpersist all persistent RDDs + clear cache between
  * queries (the candidate bench isolation fix). With --stages, a listener
  * attributes each query's wall time to its Spark STAGES (wall, task-time
  * sum, task count, shuffle read/write) — the device that pins a
  * run-to-run spread on a named stage instead of "the query was slow".
  */
object QueryTimer {

  private class StageListener extends org.apache.spark.scheduler.SparkListener {
    case class Row(id: Int, name: String, wallMs: Long, taskMs: Long,
      tasks: Int, shReadMb: Double, shWriteMb: Double)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val wall = (for (s <- i.submissionTime; c <- i.completionTime) yield c - s).getOrElse(-1L)
      rows.add(Row(i.stageId, i.name.linesIterator.next(), wall,
        i.taskMetrics.executorRunTime, i.numTasks,
        i.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0,
        i.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0))
    }
    def drainTop(n: Int): Seq[Row] = {
      import scala.jdk.CollectionConverters._
      val out = rows.asScala.toVector.sortBy(-_.wallMs).take(n)
      rows.clear(); out
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val release = args.contains("--release")
    val stages  = args.contains("--stages")
    // same parallelism knob as Bench so interactions reproduce
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    val listener = if (stages) { val l = new StageListener
      spark.sparkContext.addSparkListener(l); Some(l) } else None
    names.foreach { n =>
      listener.foreach(_.drainTop(0)) // clear warmup stages
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMER $n%-28s $dt%8.3f s")
      listener.foreach { l =>
        // listener events drain asynchronously; settle before reading
        // (listenerBus is private[spark] — a short sleep suffices for a
        // diagnostics harness)
        Thread.sleep(300)
        l.drainTop(10).foreach(r =>
          println(f"  STAGE ${r.id}%4d wall=${r.wallMs / 1000.0}%7.3f s " +
            f"taskSum=${r.taskMs / 1000.0}%8.3f s tasks=${r.tasks}%4d " +
            f"shR=${r.shReadMb}%7.2f MB shW=${r.shWriteMb}%7.2f MB  ${r.name}%s"))
      }
      if (release) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

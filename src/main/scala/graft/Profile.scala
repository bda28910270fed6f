package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev utility for the optimization rounds: run a declared query k times in
  * a warmed session and report, per run, the wall time plus the job/stage/
  * task counts and shuffle volume — the "how many passes and shuffles does
  * this query actually do" view that a single bench number hides.
  *
  * Usage: runMain graft.Profile [sfDir] [k] query [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 3
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val shuffleB = new AtomicLong
    val verbose = sys.env.contains("SPARK_GRAFT_PROFILE_JOBS")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStart.remove(j.jobId)).foreach { case (t0, desc) =>
          println(f"[profile-job] job=${j.jobId} ${(System.nanoTime() - t0) / 1e3}%9.0fus $desc")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) shuffleB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    // same warmup as Bench so first-run numbers aren't codegen spin-up
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count(); li.groupBy("l_returnflag").count().count()

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to k).foreach { i =>
        Thread.sleep(250) // let listener events drain between runs
        val (j0, s0, t0, b0) = (jobs.get, stages.get, tasks.get, shuffleB.get)
        val w0 = System.nanoTime()
        val rows = try fn(spark, sfDir).count() catch {
          case e: Throwable => System.err.println(s"[profile] $n failed: ${e.getMessage}"); -1L
        }
        val dt = (System.nanoTime() - w0) / 1e9
        Thread.sleep(250)
        println(f"[profile] $n run$i: $dt%6.2fs rows=$rows jobs=${jobs.get - j0} " +
          f"stages=${stages.get - s0} tasks=${tasks.get - t0} " +
          f"shuffleMB=${(shuffleB.get - b0) / 1048576.0}%.2f")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One-off micro-batch cost profiler (not part of the public surface):
  * runs a declared stream-family query with a StreamingQueryListener and
  * prints Spark's own per-batch phase breakdown (`durationMs`:
  * addBatch = the batch's actual work, then the harness overheads —
  * latestOffset / getBatch / queryPlanning / walCommit / commitOffsets)
  * plus a per-phase total. The ProfileCommit methodology applied to one
  * foreachBatch cycle: the phase totals say where the stream family's
  * fixed cost sits. Usage: runMain graft.ProfileStream <sfDir> <q_name[,q…]>
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q_stream_upsert").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-level attribution: addBatch is opaque in durationMs — the jobs it
    // launches (by call site) say which engine step costs what
    case class Job(id: Int, site: String, wallMs: Long)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // the RDD's own name (first stage's last RDD scope) beats the
        // thread-inherited call site for work launched inside a stream
        val label = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobStart.put(j.jobId, (label.linesIterator.next(), j.time))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStart.remove(j.jobId)).foreach { case (site, t0) =>
          jobs.add(Job(j.jobId, site, j.time - t0)) }
    })

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Map[String, Long])]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        rows.add((e.progress.batchId,
          e.progress.durationMs.asScala.map { case (k, v) => k -> v.toLong }.toMap))
      }
    })

    names.foreach { n =>
      rows.clear(); jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drains asynchronously
      import scala.jdk.CollectionConverters._
      val batches = rows.asScala.toVector.sortBy(_._1)
      println(f"PROFILE $n wall=$wall%.2f s batches=${batches.size}")
      batches.foreach { case (id, m) =>
        val keys = Seq("triggerExecution", "addBatch", "latestOffset", "getBatch",
          "queryPlanning", "walCommit", "commitOffsets")
        println(s"  batch $id  " + keys.flatMap(k => m.get(k).map(v => f"$k=$v%d")).mkString(" "))
      }
      val phases = batches.flatMap(_._2.toSeq).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sum }.toSeq.sortBy(-_._2)
      println("  TOTALS " + phases.map { case (k, v) => s"$k=${v}ms" }.mkString(" "))
      jobs.asScala.toVector.sortBy(_.id).foreach(j =>
        println(f"  JOB ${j.id}%4d ${j.wallMs}%6d ms  ${j.site}%s"))
    }
    spark.stop()
  }
}

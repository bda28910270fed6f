package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: run a comma-separated subset of declared queries
  * in the given order, print per-query seconds. Used to isolate bench
  * interactions (e.g. leaked block-manager pressure between queries).
  *
  * Usage: runMain graft.QueryTimer <sfDir> q_a,q_b,q_c [--release]
  * With --release, unpersist all persistent RDDs + clear cache between
  * queries (the candidate bench isolation fix).
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val release = args.contains("--release")
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
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMER $n%-28s $dt%8.3f s")
      if (release) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

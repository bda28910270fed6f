package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for the declared queries, to
  * audit the properties the 100 TB design depends on — `PushedFilters` and
  * pruned `ReadSchema` on scans, `BroadcastHashJoin` for dimension joins,
  * `TakeOrderedAndProject` for top-k, WholeStageCodegen coverage.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}

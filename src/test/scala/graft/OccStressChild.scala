package graft

import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** Child process for [[OccCrossJvmSpec]]: a REAL second JVM racing the
  * commit protocol on a shared table directory. Each child appends
  * `nCommits` tagged batches; writer "a" also issues one copy-on-write
  * DELETE of its own early rows; writer "b" interleaves fail-loud vacuums
  * (retried here — LockBusy against a live rival is the documented
  * contract, not a failure). Prints one `CHILD_OK <id> <appends>` line and
  * exits 0 iff every operation eventually committed. */
object OccStressChild {

  private def retry[A](label: String)(body: => A): A = {
    val deadline = System.currentTimeMillis() + 120000L
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return body
      catch {
        case e: Throwable =>
          last = e
          Thread.sleep(50L + scala.util.Random.nextInt(100))
      }
    }
    throw new RuntimeException(s"$label: still refused after 120 s", last)
  }

  def main(args: Array[String]): Unit = {
    val Array(dir, id, nStr) = args
    val n = nStr.toInt
    val spark = GraftSession.builder("local[2]", shufflePartitions = 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      (0 until n).foreach { i =>
        retry(s"append $id/$i") {
          VersionedTable.commitAppend(spark,
            spark.range(0L, 5L).select(lit(id).as("writer"),
              lit(i.toLong).as("seq"), col("id").as("row")),
            dir)
        }
        if (id == "a" && i == n / 2)
          retry("delete a") {
            VersionedTable.commitDelete(spark, dir,
              col("writer") === "a" && col("seq") < 3L)
          }
        if (id == "b" && i % 5 == 4)
          retry("vacuum b") { VersionedTable.vacuum(spark, dir, retainLast = 5) }
      }
      // cross-JVM ALTER race, after a filesystem barrier: appends must
      // match the declared schema exactly, so both writers finish their
      // appends before either widens it — then both ADD a (distinct)
      // column concurrently; the metadata commits must serialize like any
      // other commit
      val root = new java.io.File(dir).getParentFile
      java.nio.file.Files.write(new java.io.File(root, s"done-$id").toPath,
        Array.emptyByteArray)
      val peer = new java.io.File(root, s"done-${if (id == "a") "b" else "a"}")
      val barrierDeadline = System.currentTimeMillis() + 120000L
      while (!peer.exists() && System.currentTimeMillis() < barrierDeadline)
        Thread.sleep(25)
      require(peer.exists(), s"peer of $id never reached the alter barrier")
      retry(s"alter $id") {
        VersionedTable.commitAddColumn(spark, dir, s"extra_$id",
          org.apache.spark.sql.types.LongType)
      }
      println(s"CHILD_OK $id $n")
    } finally spark.stop()
  }
}

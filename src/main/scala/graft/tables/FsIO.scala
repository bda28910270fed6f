package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Small-file text I/O over the Hadoop FS API (path-scheme-agnostic:
  * file:// now, HDFS/S3 at scale) — the single copy of the sidecar/artifact
  * plumbing used by the IVF index, the model registry, and the partitioned
  * upsert marker.
  */
object FsIO {

  /** A Hadoop configuration that carries the session's `spark.hadoop.*`
    * settings on BOTH driver and executors. Executors have no SparkSession,
    * but `SparkEnv.get.conf` is populated there — without this, an
    * `s3a://`/HDFS artifact read inside a task would use a bare
    * `Configuration` lacking credentials/endpoints. */
  def hadoopConf(): Configuration = {
    val conf = new Configuration()
    val env  = org.apache.spark.SparkEnv.get
    if (env != null) {
      env.conf.getAllWithPrefix("spark.hadoop.").foreach { case (k, v) => conf.set(k, v) }
    }
    conf
  }

  def writeText(path: String, text: String, conf: Configuration = hadoopConf()): Unit = {
    val p   = new Path(path)
    val fs  = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
  }

  def readText(path: String, conf: Configuration = hadoopConf()): Option[String] = {
    val p  = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Deterministic tmp-dir tag for a source path (shared by the IVF index
    * path and the ingest staging default). */
  def tmpTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")
}

package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap shared by Verify, Bench, and the test suites.
  *
  * Centralizes the configuration the engine requires:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the `events` fixture stores
  *    `TIMESTAMP(NANOS)`, which Spark 4 otherwise rejects with
  *    `PARQUET_TYPE_ILLEGAL` (SURVEY.md §5.1). With the flag set, `ts` reads
  *    as `LongType` epoch-nanoseconds; oracle SQL compares via `epoch_ns`.
  *  - AQE on (coalesce + skew-join): at the 100 TB design point we rely on
  *    runtime re-planning — partition coalescing after filters and skew-join
  *    splitting — instead of hand-tuned static partition counts.
  *  - Headless AWT: image kernels (`graft.image.Kernels`) run `javax.imageio`
  *    inside executor threads; no display exists in this environment
  *    (SURVEY.md §7 risk 6).
  */
object GraftSession {

  /** Apply the engine's standard configs to an existing builder (used by
    * Verify/Bench, which own master/parallelism per the driver contract). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = {
    System.setProperty("java.awt.headless", "true")
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
  }

  /** Standalone builder for tests / local exploration. */
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    configure(
      SparkSession.builder()
        .master(master)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver's fixture tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Mirrors the reference's two table flavors (SURVEY.md §1): path-addressed
  * tables (`spark.read.format("delta").load(path)`,
  * `02.b Train - PyTorch Distributed.py:80-82`) become plain Parquet path
  * scans here; catalog tables are provided by [[graft.tables.TableManager]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S5 path table scan. Column pruning + predicate pushdown reach the
    * Parquet reader automatically (verify via `PushedFilters`/`ReadSchema`
    * in `.explain("formatted")`).
    *
    * The engine's `events.ts` contract is LongType epoch-NANOSECONDS
    * (SURVEY.md §5.1; oracle SQL compares via `epoch_ns`). The fixture's
    * physical type has varied across driver generations — TIMESTAMP(NANOS)
    * (read as long via `nanosAsLong`) vs TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ) — so the loader normalizes any timestamp-typed `ts`
    * back to epoch-nanos here, in ONE place, instead of forking every
    * downstream operator and oracle on the fixture vintage. The session
    * time zone is pinned to UTC (GraftSession), so the NTZ→LTZ cast is
    * instant-preserving; micros→nanos multiplication is exact. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }
  }

  /** Parallelism floor for compute-dense passes over SCAN-shaped frames
    * (r18, guide §2.5 "input skew: one huge unsplittable file …
    * repartition immediately after the read"). The fixture tables are
    * single-row-group parquet files, so a scan yields ONE populated
    * partition no matter the split math — an expensive map/aggregate pass
    * downstream then runs on one core. A round-robin repartition to the
    * core count costs one linear shuffle of the projected input and buys
    * full parallelism for the pass; when the scan already has enough
    * partitions (the at-scale case) nothing is added. Call on scan-shaped
    * frames only (`.rdd` on a post-exchange AQE frame would execute the
    * upstream stages eagerly), and only where the consumer is
    * partitioning-invariant (aggregates, per-row maps — not first()/
    * collect_list-order consumers). */
  def parallelizeScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface — the same engine for SQL-first users.
  *
  * The engine's public surface is DataFrames (SURVEY.md §1, like the
  * reference's notebooks), but everything the DataFrame API declares is a
  * Catalyst logical plan, so exposing the fixture tables as temp views
  * makes every capability reachable from ANSI SQL text with zero extra
  * machinery — same optimizer, same physical plans, same pushdown. The
  * gate declares several queries in BOTH forms against the same DuckDB
  * oracle (`q_sql_*` in SparkEntry) to prove the equivalence holds, not
  * just assert it.
  *
  * 100 TB shape: views are lazy plan fragments (no materialization);
  * registering them costs a schema read per table. `run` is `spark.sql` —
  * whatever holds for a DataFrame plan (pruning, pushdown, AQE) holds
  * identically for its SQL-text twin.
  */
object Sql {

  /** Register every fixture table under `sfDir` as a temp view named after
    * the table (`lineitem`, `documents`, …), through [[Tables.load]] so the
    * `events.ts` epoch-nanos normalization applies to SQL readers too. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }

  /** Run SQL text against the registered views. */
  def run(spark: SparkSession, sqlText: String): DataFrame = spark.sql(sqlText)

  /** Convenience: register + run in one call (idempotent registration). */
  def run(spark: SparkSession, sfDir: String, sqlText: String): DataFrame = {
    registerViews(spark, sfDir)
    run(spark, sqlText)
  }
}

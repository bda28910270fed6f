package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * in `.explain("formatted")`). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

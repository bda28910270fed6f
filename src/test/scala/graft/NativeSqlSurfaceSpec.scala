package graft

import graft.catalog.GraftCatalog
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** The native SQL surface over versioned tables, round 13: Spark's own
  * metadata commands resolve through the DSv2 catalog, and the
  * maintenance verbs (OPTIMIZE / VACUUM / RESTORE) parse as native
  * statements through the head-token-scoped delegating parser.
  */
class NativeSqlSurfaceSpec extends SparkSpec {

  private def fresh(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nss").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 100L).select(col("id").as("k"), (col("id") * 2).as("x"))
        .repartition(4), dir)
    GraftCatalog.register(name, dir)
    dir
  }

  test("metadata commands resolve through the catalog") {
    fresh("nss_meta")
    val tables = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1))
    assert(tables.contains("nss_meta"), tables.mkString(","))
    val cols = spark.sql("SHOW COLUMNS IN graft.nss_meta").collect().map(_.getString(0))
    assert(cols.toSet == Set("k", "x"))
    val desc = spark.sql("DESCRIBE TABLE graft.nss_meta").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("k") == "bigint" && desc("x") == "bigint")
    val create = spark.sql("SHOW CREATE TABLE graft.nss_meta").head.getString(0)
    assert(create.contains("CREATE TABLE graft.nss_meta"), create)
  }

  test("OPTIMIZE / VACUUM / RESTORE parse as native statements") {
    val dir = fresh("nss_verbs")
    spark.sql("DELETE FROM graft.nss_verbs WHERE k >= 90")                   // v1
    val opt = spark.sql("OPTIMIZE graft.nss_verbs ZORDER BY (k) TARGET 2 FILES").head
    assert(opt.getString(0) == "OPTIMIZE" && opt.getLong(2) == 2L, opt.toString)
    // the re-layout changed no rows and z-ordered into 2 files
    assert(spark.sql("SELECT count(*) AS n FROM graft.nss_verbs").head.getLong(0) == 90L)
    // DRY RUN returns the deletion plan without touching anything
    val planned = spark.sql("VACUUM graft.nss_verbs RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0))
    assert(planned.nonEmpty)
    assert(spark.sql("SELECT count(*) AS n FROM graft.nss_verbs VERSION AS OF 0")
      .head.getLong(0) == 100L, "dry run must not drop history")
    // RESTORE rolls the table back as a new commit
    val rst = spark.sql("RESTORE TABLE graft.nss_verbs TO VERSION AS OF 0").head
    assert(rst.getString(0) == "RESTORE")
    assert(spark.sql("SELECT count(*) AS n FROM graft.nss_verbs").head.getLong(0) == 100L)
    // the real VACUUM drops history and reports the count
    val vac = spark.sql("VACUUM graft.nss_verbs RETAIN 1 VERSIONS").head
    assert(vac.getString(0) == "VACUUM" && vac.getLong(2) >= 1L, vac.toString)
    // v1's rewritten files are unreferenced by the restored head → swept;
    // v0's files survive through the restore's refcount, by design
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.nss_verbs VERSION AS OF 1").collect()
    }
    // unknown tables refuse with the registration hint; non-graft
    // statements still get Spark's own parser errors
    val e = intercept[Exception] { spark.sql("OPTIMIZE graft.nope TARGET 2 FILES") }
    assert(e.getMessage.contains("unknown table"), e.getMessage)
    intercept[Exception] { spark.sql("OPTIMIZE some_other_table") }
  }
}

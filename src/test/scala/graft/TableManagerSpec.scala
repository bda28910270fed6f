package graft

import graft.tables.TableManager
import java.nio.file.Files
import org.apache.spark.sql.functions._

class TableManagerSpec extends SparkSpec {

  test("overwriteTable + table scan round-trip (S4/S7)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    TableManager.overwriteTable(df, "t_roundtrip")
    assert(spark.table("t_roundtrip").count() == 2)
    TableManager.overwriteTable(df.where(col("id") === 1), "t_roundtrip")
    assert(spark.table("t_roundtrip").count() == 1)
    TableManager.dropTable(spark, "t_roundtrip")
  }

  test("overwriteTableMergeSchema unions schemas across writes (S8)") {
    import spark.implicits._
    TableManager.dropTable(spark, "t_evolve")
    TableManager.overwriteTableMergeSchema(spark, Seq((1L, "x")).toDF("id", "name"), "t_evolve")
    // second write lacks `name`, adds `score` — mergeSchema keeps both
    TableManager.overwriteTableMergeSchema(spark, Seq((2L, 9.5)).toDF("id", "score"), "t_evolve")
    val out = spark.table("t_evolve")
    assert(out.columns.toSet == Set("id", "name", "score"))
    val row = out.head()
    assert(row.getLong(0) == 2L && row.isNullAt(1) && row.getDouble(2) == 9.5)
    TableManager.dropTable(spark, "t_evolve")
  }

  test("compact rewrites a many-file dir into target file count, content-stable (S10)") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/data"
    val li  = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    li.repartition(16).write.parquet(dir)
    assert(TableManager.dataFileCount(spark, dir) >= 16)
    val before = spark.read.parquet(dir).orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    TableManager.compact(spark, dir, targetFiles = 2)
    assert(TableManager.dataFileCount(spark, dir) == 2)
    val after = spark.read.parquet(dir).orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    assert(after.sameElements(before))
  }

  test("withParquetCodec restores previous codec even on failure (S11)") {
    val prev = spark.conf.get("spark.sql.parquet.compression.codec")
    intercept[RuntimeException] {
      TableManager.withParquetCodec(spark, "uncompressed") {
        assert(spark.conf.get("spark.sql.parquet.compression.codec") == "uncompressed")
        sys.error("boom")
      }
    }
    assert(spark.conf.get("spark.sql.parquet.compression.codec") == prev)
  }
}

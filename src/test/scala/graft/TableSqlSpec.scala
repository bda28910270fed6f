package graft

import graft.tables.{TableSql, VersionedTable}
import org.apache.spark.sql.functions._

/** The SQL verb surface over versioned tables: each statement must route
  * onto the same commit protocol as the API call and leave the identical
  * state (the reference drives OPTIMIZE from `%sql`; a SQL-first user
  * drives all of DML this way). */
class TableSqlSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (String, Map[String, String]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsql").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 100L).select(col("id").as("k"), (col("id") * 2).as("x"))
        .repartition(4), dir)
    (dir, Map("events" -> dir))
  }

  test("UPDATE / DELETE / SELECT with VERSION AS OF") {
    val (dir, cat) = fresh()
    TableSql.execute(spark, cat, "UPDATE events SET x = x + 1000 WHERE k % 10 = 0")
    TableSql.execute(spark, cat, "DELETE FROM events WHERE k >= 90")
    val now = TableSql.execute(spark, cat,
      "SELECT count(*) AS n, sum(x) AS s FROM events").head
    assert(now.getLong(0) == 90)
    val expect = (0L until 90L).map(k => k * 2 + (if (k % 10 == 0) 1000 else 0)).sum
    assert(now.getLong(1) == expect)
    // time travel back to v0 in SQL text
    val v0 = TableSql.execute(spark, cat,
      "SELECT count(*) AS n FROM events VERSION AS OF 0").head
    assert(v0.getLong(0) == 100)
  }

  test("UPDATE with nested commas in SET expressions") {
    val (dir, cat) = fresh()
    TableSql.execute(spark, cat,
      "UPDATE events SET x = greatest(x, 50), k = k WHERE k < 5")
    val got = VersionedTable.read(spark, dir).where(col("k") < 5)
      .collect().map(r => r.getLong(1)).sorted
    assert(got.toSeq == Seq(50L, 50L, 50L, 50L, 50L))
  }

  test("OPTIMIZE [ZORDER BY] and VACUUM RETAIN n VERSIONS") {
    val (dir, cat) = fresh()
    TableSql.execute(spark, cat, "UPDATE events SET x = x + 1 WHERE k = 3")
    val r = TableSql.execute(spark, cat,
      "OPTIMIZE events ZORDER BY (k, x) TARGET 2 FILES").head
    assert(r.getString(0) == "OPTIMIZE")
    assert(VersionedTable.filesOf(dir, r.getLong(2)).size == 2)
    // rows unchanged by the re-layout
    assert(VersionedTable.read(spark, dir).count() == 100)
    val dropped = TableSql.execute(spark, cat, "VACUUM events RETAIN 1 VERSIONS").head
    assert(dropped.getString(0) == "VACUUM")
    assert(VersionedTable.read(spark, dir).count() == 100)
    intercept[Exception] { VersionedTable.read(spark, dir, Some(0L)).count() }
  }

  test("RESTORE TABLE TO VERSION AS OF and TIMESTAMP AS OF") {
    val (dir, cat) = fresh()
    Thread.sleep(15)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(15)
    TableSql.execute(spark, cat, "DELETE FROM events WHERE k < 50")
    assert(VersionedTable.read(spark, dir).count() == 50)
    // timestamp travel in SQL text (local-format timestamp string)
    val ts = new java.sql.Timestamp(betweenMs).toString
    val n0 = TableSql.execute(spark, cat,
      s"SELECT count(*) AS n FROM events TIMESTAMP AS OF '$ts'").head
    assert(n0.getLong(0) == 100)
    val rr = TableSql.execute(spark, cat, "RESTORE TABLE events TO VERSION AS OF 0").head
    assert(rr.getString(0) == "RESTORE")
    assert(VersionedTable.read(spark, dir).count() == 100)
  }

  test("MERGE INTO from a subquery: updates matched keys, inserts new ones") {
    val (dir, cat) = fresh()
    TableSql.execute(spark, cat,
      "MERGE INTO events USING (SELECT CAST(5 AS BIGINT) AS k, CAST(-1 AS BIGINT) AS x " +
        "UNION ALL SELECT CAST(500 AS BIGINT), CAST(500 AS BIGINT)) ON (k)")
    val got = VersionedTable.read(spark, dir)
    assert(got.count() == 101)
    assert(got.where(col("k") === 5L).head.getLong(1) == -1L)
    assert(got.where(col("k") === 500L).head.getLong(1) == 500L)
  }

  test("DESCRIBE HISTORY reports each verb's operation, ordering, and retention") {
    val (dir, cat) = fresh()
    TableSql.execute(spark, cat, "UPDATE events SET x = x + 1 WHERE k = 1")
    TableSql.execute(spark, cat, "DELETE FROM events WHERE k = 2")
    VersionedTable.commitDeleteDV(spark, dir, col("k") === 3L)
    TableSql.execute(spark, cat, "OPTIMIZE events TARGET 1 FILES")
    val h = TableSql.execute(spark, cat, "DESCRIBE HISTORY events")
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(3)))
    assert(h.toSeq == Seq(
      (0L, "APPEND", true), (1L, "UPDATE", true), (2L, "DELETE", true),
      (3L, "DELETE MOR", true), (4L, "OPTIMIZE", false)), h.mkString(","))
    // timestamps are monotone non-decreasing
    val ts = TableSql.execute(spark, cat, "DESCRIBE HISTORY events")
      .orderBy("version").collect().map(_.getTimestamp(1).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
  }

  test("unknown table fails loudly with the catalog listed") {
    val (_, cat) = fresh()
    val e = intercept[RuntimeException] {
      TableSql.execute(spark, cat, "DELETE FROM nope WHERE 1 = 1")
    }
    assert(e.getMessage.contains("unknown table"), e.getMessage)
  }
}

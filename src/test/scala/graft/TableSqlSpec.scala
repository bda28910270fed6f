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

  test("MERGE WHEN NOT MATCHED BY SOURCE arms parse in the verb grammar") {
    val (dir, cat) = fresh()
    spark.range(40L, 60L).select(col("id").as("k"), lit(1L).as("x"))
      .createOrReplaceTempView("tsql_nmbs_src")
    TableSql.execute(spark, cat,
      """MERGE INTO events USING tsql_nmbs_src ON (k)
        |WHEN MATCHED THEN UPDATE SET x = s.x
        |WHEN NOT MATCHED BY SOURCE AND t.k < 10 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND t.k < 20 THEN UPDATE SET x = -1""".stripMargin)
    val rows = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.size == 90, rows.size.toString)           // k<10 deleted
    assert((10L until 20L).forall(rows(_) == -1L))        // retention update
    assert((40L until 60L).forall(rows(_) == 1L))         // matched arm
    assert((20L until 40L).forall(k => rows(k) == 2 * k)) // carried over
    // MATCHED BY SOURCE (without NOT) refuses with the hint
    val e = intercept[Exception] {
      TableSql.execute(spark, cat,
        "MERGE INTO events USING tsql_nmbs_src ON (k) " +
          "WHEN MATCHED BY SOURCE THEN DELETE")
    }
    assert(e.getMessage.contains("NOT MATCHED BY SOURCE"), e.getMessage)
    // INSERT is not a BY SOURCE action
    val e2 = intercept[Exception] {
      TableSql.execute(spark, cat,
        "MERGE INTO events USING tsql_nmbs_src ON (k) " +
          "WHEN NOT MATCHED BY SOURCE THEN INSERT *")
    }
    assert(e2.getMessage.contains("UPDATE SET / DELETE"), e2.getMessage)
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

  test("CLONE accepts TIMESTAMP AS OF like RESTORE") {
    val (dir, cat) = fresh()                                     // v0
    Thread.sleep(15)
    val ts = new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(15)
    TableSql.execute(spark, cat, "DELETE FROM events WHERE k >= 50") // v1
    val cloneDir = java.nio.file.Files.createTempDirectory("graft_tsql_cl").toString + "/c"
    val r = TableSql.execute(spark, cat ++ Map("ev_clone" -> cloneDir),
      s"CREATE TABLE ev_clone SHALLOW CLONE events TIMESTAMP AS OF '$ts'").head
    assert(r.getString(0) == "SHALLOW CLONE", r.toString)
    // the clone pins the version current AT ts (v0: all 100 rows)
    assert(VersionedTable.read(spark, cloneDir).count() == 100L)
    assert(VersionedTable.read(spark, dir).count() == 50L)
  }

  test("unknown table fails loudly with the catalog listed") {
    val (_, cat) = fresh()
    val e = intercept[RuntimeException] {
      TableSql.execute(spark, cat, "DELETE FROM nope WHERE 1 = 1")
    }
    assert(e.getMessage.contains("unknown table"), e.getMessage)
  }

  test("concurrent SELECTs: same bare name, different dirs — no registry/catalog race") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    // 8 callers each map the SAME name `shared` to a DIFFERENT table whose
    // rows are a distinct constant — a racy registry (last register wins
    // mid-analysis) or a mid-statement current-catalog restore would make
    // some caller read another caller's table or fail resolution
    val dirs = (0 until 8).map { i =>
      val d = java.nio.file.Files.createTempDirectory("graft_tsql").toString + s"/t$i"
      VersionedTable.commitAppend(spark,
        spark.range(0L, 50L).select(col("id").as("k"), lit(i.toLong).as("tag")), d)
      d
    }
    val pool  = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val prevCatalog = spark.catalog.currentCatalog()
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, (Long, Long)]] {
          def call() = {
            start.await()
            try {
              val r = (0 until 5).map { _ =>
                val row = TableSql.execute(spark, Map("shared" -> dirs(i)),
                  "SELECT count(*) AS n, max(tag) AS t FROM shared").head
                (row.getLong(0), row.getLong(1))
              }
              Right(r.last): Either[Throwable, (Long, Long)]
            } catch { case t: Throwable => Left(t) }
          }
        })
      }
      start.countDown()
      futs.zipWithIndex.foreach { case (f, i) =>
        f.get(120, TimeUnit.SECONDS) match {
          case Right((n, tag)) =>
            assert(n == 50L && tag == i.toLong, s"caller $i read ($n, tag=$tag)")
          case Left(t) => fail(s"caller $i: ${t.getMessage}", t)
        }
      }
    } finally { pool.shutdownNow(); () }
    // the session's current catalog is restored after the dust settles
    assert(spark.catalog.currentCatalog() == prevCatalog)
  }
}

package graft

import java.nio.file.Files

import graft.catalog.GraftCatalog
import graft.tables.{TableSql, VersionedTable}
import org.apache.spark.sql.functions._

/** DataSourceV2 catalog + provider (round 12): versioned tables resolve
  * NATIVELY in Spark SQL — `graft.t`, `VERSION AS OF`, `TIMESTAMP AS OF`,
  * INSERT INTO/OVERWRITE, CTAS — and the read plan is the engine's own
  * parquet scan (pushdown intact), not a row-at-a-time shim.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val dir = Files.createTempDirectory("graft_cat").toString + "/t"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 100L).select(col("id").as("k"), (col("id") * 2).as("x"))
        .repartition(4), dir)
    GraftCatalog.register(name, dir)
    dir
  }

  test("SELECT FROM graft.t resolves through the catalog") {
    fresh("cat_t1")
    val n = spark.sql("SELECT count(*) AS n, sum(x) AS s FROM graft.cat_t1").head
    assert(n.getLong(0) == 100L && n.getLong(1) == 9900L)
  }

  test("VERSION AS OF and TIMESTAMP AS OF parse natively and pin the version") {
    val dir = fresh("cat_t2")
    Thread.sleep(15)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(15)
    VersionedTable.commitDelete(spark, dir, col("k") >= 50L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_t2").head.getLong(0) == 50L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_t2 VERSION AS OF 0")
      .head.getLong(0) == 100L)
    val ts = new java.sql.Timestamp(betweenMs).toString
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.cat_t2 TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == 100L)
  }

  test("the read plan is the engine's parquet scan with pushdown (rule fired)") {
    fresh("cat_t3")
    val df = spark.sql("SELECT x FROM graft.cat_t3 WHERE k = 7")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("FileScan parquet"), physical)
    assert(physical.contains("PushedFilters: [IsNotNull(k), EqualTo(k,7)"), physical)
    assert(df.head.getLong(0) == 14L)
  }

  test("INSERT INTO appends a commit; INSERT OVERWRITE snapshots") {
    val dir = fresh("cat_t4")
    spark.sql("INSERT INTO graft.cat_t4 SELECT CAST(500 AS BIGINT), CAST(1000 AS BIGINT)")
    assert(VersionedTable.latestVersion(dir).contains(1L))
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_t4").head.getLong(0) == 101L)
    spark.sql("INSERT OVERWRITE graft.cat_t4 SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_t4").head.getLong(0) == 1L)
    // history intact: the pre-overwrite version still reads
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_t4 VERSION AS OF 1")
      .head.getLong(0) == 101L)
  }

  test("CTAS creates and writes a versioned table") {
    fresh("cat_t5")
    val dst = Files.createTempDirectory("graft_cat").toString + "/ctas"
    GraftCatalog.register("cat_t5_top", dst)
    spark.sql("CREATE TABLE graft.cat_t5_top AS " +
      "SELECT k, x FROM graft.cat_t5 WHERE k < 10")
    assert(VersionedTable.read(spark, dst).count() == 10L)
    assert(spark.sql("SELECT sum(x) AS s FROM graft.cat_t5_top").head.getLong(0) == 90L)
  }

  test("TableSql SELECT path runs natively — a hostile literal is inert") {
    val dir = Files.createTempDirectory("graft_cat").toString + "/t"
    VersionedTable.commitAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    VersionedTable.commitAppend(spark, Seq((3L, "c")).toDF("k", "s"), dir)
    val r = TableSql.execute(spark, Map("events" -> dir),
      "SELECT k, 'events VERSION AS OF 0' AS lit FROM events VERSION AS OF 0 ORDER BY k")
    val rows = r.collect().map(x => (x.getLong(0), x.getString(1)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    assert(rows.forall(_._2 == "events VERSION AS OF 0"))
    // current catalog restored after the statement
    assert(spark.catalog.currentCatalog() == "spark_catalog")
  }

  test("unknown table and bad version fail loudly") {
    // Spark retries an unresolved `graft.x` as a direct file query (the
    // provider's shortName matches), so the surfaced error is its
    // UNSUPPORTED_DATASOURCE message — loud either way
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft.cat_no_such").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("graft"), e1.getMessage)
    fresh("cat_t6")
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft.cat_t6 VERSION AS OF 99").collect()
    }
    assert(e2.getMessage.contains("99"), e2.getMessage)
  }

  test("format(\"graft\") reads latest and time travel; write appends") {
    val dir = fresh("cat_t7")
    VersionedTable.commitDelete(spark, dir, col("k") >= 10L)
    assert(spark.read.format("graft").load(dir).count() == 10L)
    assert(spark.read.format("graft").option("versionAsOf", "0").load(dir).count() == 100L)
    Seq((500L, 0L)).toDF("k", "x").write.format("graft").mode("append").save(dir)
    assert(VersionedTable.read(spark, dir).count() == 11L)
  }

  test("native DELETE FROM graft.t WHERE ... commits a copy-on-write version") {
    val dir = fresh("cat_del")
    spark.sql("DELETE FROM graft.cat_del WHERE k >= 50 AND k < 90")
    assert(VersionedTable.latestVersion(dir).contains(1L))
    val ks = VersionedTable.read(spark, dir).select("k").collect().map(_.getLong(0)).toSet
    assert(ks == ((0L until 50L) ++ (90L until 100L)).toSet, ks.size.toString)
    // the deleted rows are still in history
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_del VERSION AS OF 0")
      .head.getLong(0) == 100L)
    // an untranslatable predicate no longer refuses — the strategy routes
    // it onto the scan-based copy-on-write (its own dedicated spec below)
    spark.sql("DELETE FROM graft.cat_del WHERE k % 2 = 0")
    assert(VersionedTable.read(spark, dir).select("k").collect()
      .map(_.getLong(0)).forall(_ % 2 == 1))
  }

  test("table names resolve case-insensitively") {
    val dir = fresh("cat_ci")
    assert(spark.sql("SELECT count(*) AS n FROM graft.CAT_CI").head.getLong(0) == 100L)
    assert(TableSql.execute(spark, Map("cat_ci2" -> dir),
      "SELECT count(*) AS n FROM Cat_CI2").head.getLong(0) == 100L)
  }

  test("DROP TABLE deregisters external tables but only deletes catalog-created data") {
    val dir = fresh("cat_ext")
    // external (registered) table: DROP removes the mapping, data survives
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_ext").head.getLong(0) == 100L)
    spark.sql("DROP TABLE graft.cat_ext")
    assert(VersionedTable.read(spark, dir).count() == 100L,
      "DROP TABLE must not delete an externally-registered directory")
    intercept[Exception] { spark.sql("SELECT * FROM graft.cat_ext").collect() }
    // managed (CTAS-created) table: DROP deletes the data too
    fresh("cat_src9")
    val dst = Files.createTempDirectory("graft_cat").toString + "/managed"
    GraftCatalog.register("cat_mng", dst)
    spark.sql("CREATE TABLE graft.cat_mng AS SELECT k, x FROM graft.cat_src9 WHERE k < 5")
    assert(VersionedTable.read(spark, dst).count() == 5L)
    spark.sql("DROP TABLE graft.cat_mng")
    assert(VersionedTable.latestVersion(dst).isEmpty,
      "DROP TABLE must delete a catalog-created (managed) directory")
  }

  test("native UPDATE graft.t plans onto commitUpdate (file-grain copy-on-write)") {
    val dir = fresh("cat_upd")
    spark.sql("UPDATE graft.cat_upd SET x = x + 1000 WHERE k % 10 = 0")
    val got = spark.sql(
      "SELECT count(*) AS n, sum(x) AS s FROM graft.cat_upd").head
    val expect = (0L until 100L).map(k => k * 2 + (if (k % 10 == 0) 1000 else 0)).sum
    assert(got.getLong(0) == 100L && got.getLong(1) == expect)
    // it committed through the protocol: one more version, old state retained
    assert(VersionedTable.latestVersion(dir).contains(1L))
    assert(spark.sql("SELECT sum(x) AS s FROM graft.cat_upd VERSION AS OF 0")
      .head.getLong(0) == (0L until 100L).map(_ * 2).sum)
    // unconditioned UPDATE rewrites every row
    spark.sql("UPDATE graft.cat_upd SET x = 0")
    assert(spark.sql("SELECT sum(x) AS s FROM graft.cat_upd").head.getLong(0) == 0L)
    // a pinned version refuses
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.cat_upd VERSION AS OF 0 SET x = 1").collect()
    }
    assert(e.getMessage != null)
  }

  test("native MERGE INTO graft.t plans onto commitMergeConditional") {
    val dir = fresh("cat_mrg")
    spark.range(90L, 110L)
      .select(col("id").as("k"), lit(9999L).as("x"))
      .createOrReplaceTempView("cat_mrg_src")
    spark.sql(
      "MERGE INTO graft.cat_mrg t USING cat_mrg_src s ON t.k = s.k " +
        "WHEN MATCHED AND t.k >= 95 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET x = s.x + 1 " +
        "WHEN NOT MATCHED THEN INSERT (k, x) VALUES (s.k, s.x)")
    val rows = spark.sql("SELECT k, x FROM graft.cat_mrg").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // k in [90,95): matched, updated to 10000; k in [95,100): matched, deleted;
    // k in [100,110): unmatched, inserted as 9999; k < 90: untouched
    assert(rows.size == 100 - 5 + 10, rows.size.toString)
    assert((90L until 95L).forall(rows(_) == 10000L))
    assert((95L until 100L).forall(k => !rows.contains(k)))
    assert((100L until 110L).forall(rows(_) == 9999L))
    assert(rows(42L) == 84L)
    assert(VersionedTable.latestVersion(dir).contains(1L))
    // star forms: UPDATE SET * / INSERT *
    spark.range(0L, 2L).select((col("id") + 200L).as("k"), lit(5L).as("x"))
      .createOrReplaceTempView("cat_mrg_src2")
    spark.sql("MERGE INTO graft.cat_mrg t USING cat_mrg_src2 s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_mrg WHERE x = 5")
      .head.getLong(0) == 2L)
    // a differing-type key (analyzer inserts implicit casts around the ON
    // equality) still resolves as the merge key
    spark.range(0L, 1L).select(lit(300).cast("int").as("k"), lit(8L).as("x"))
      .createOrReplaceTempView("cat_mrg_src3")
    spark.sql("MERGE INTO graft.cat_mrg t USING cat_mrg_src3 s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT x FROM graft.cat_mrg WHERE k = 300").head.getLong(0) == 8L)
    // unsupported shapes refuse loudly, naming the escape hatch
    val e1 = intercept[Exception] {
      spark.sql("MERGE INTO graft.cat_mrg t USING cat_mrg_src2 s ON t.k > s.k " +
        "WHEN MATCHED THEN DELETE").collect()
    }
    assert(e1.getMessage.contains("same-named"), e1.getMessage)
  }

  test("native MERGE: WHEN NOT MATCHED BY SOURCE update/delete arms") {
    val dir = fresh("cat_nmbs")
    // source names keys [40, 60); everything else is NOT matched by source
    spark.range(40L, 60L)
      .select(col("id").as("k"), lit(1L).as("x"))
      .createOrReplaceTempView("cat_nmbs_src")
    spark.sql(
      "MERGE INTO graft.cat_nmbs t USING cat_nmbs_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET x = s.x " +
        "WHEN NOT MATCHED BY SOURCE AND t.k < 10 THEN DELETE " +
        "WHEN NOT MATCHED BY SOURCE AND t.k < 20 THEN UPDATE SET x = -1")
    val rows = spark.sql("SELECT k, x FROM graft.cat_nmbs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.size == 90, rows.size.toString)           // k<10 deleted
    assert((10L until 20L).forall(rows(_) == -1L))        // retention update
    assert((40L until 60L).forall(rows(_) == 1L))         // matched arm
    assert((20L until 40L).forall(k => rows(k) == 2 * k)) // carried over
    assert(VersionedTable.latestVersion(dir).contains(1L))
    // an arm referencing the source refuses loudly — Spark's analyzer
    // excludes the source from the NMBS resolution scope (our
    // requireTargetOnly guard is defense-in-depth behind it)
    val e2 = intercept[Exception] {
      spark.sql("MERGE INTO graft.cat_nmbs t USING cat_nmbs_src s ON t.k = s.k " +
        "WHEN NOT MATCHED BY SOURCE AND s.x > 0 THEN DELETE").collect()
    }
    assert(e2.getMessage.contains("cannot be resolved"), e2.getMessage)
    // a subquery in a merge condition refuses loudly, naming the hatch
    val e3 = intercept[Exception] {
      spark.sql("MERGE INTO graft.cat_nmbs t USING cat_nmbs_src s ON t.k = s.k " +
        "WHEN MATCHED AND t.x > (SELECT max(x) FROM cat_nmbs_src) THEN DELETE")
        .collect()
    }
    assert(e3.getMessage.contains("subqueries are not supported"), e3.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns, then merges") {
    val dir = fresh("cat_evo")
    // source carries a column the target lacks
    spark.range(95L, 105L)
      .select(col("id").as("k"), (col("id") * 10).as("x"), lit("new").as("tag"))
      .createOrReplaceTempView("cat_evo_src")
    spark.sql(
      "MERGE WITH SCHEMA EVOLUTION INTO graft.cat_evo t USING cat_evo_src s " +
        "ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    val out = spark.sql("SELECT k, x, tag FROM graft.cat_evo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toMap
    assert(out.size == 105, out.size.toString)
    assert(out(42L) == ((84L, null)), "untouched rows read null in the new column")
    assert((95L until 100L).forall(k => out(k) == ((k * 10, "new"))), "matched rows updated")
    assert((100L until 105L).forall(k => out(k) == ((k * 10, "new"))), "unmatched rows inserted")
    // ATOMIC: the widening folds into the merge's OWN commit entry (v1) —
    // one transaction, Delta semantics; nothing committed at analysis time
    assert(VersionedTable.latestVersion(dir).contains(1L))
    val schemaV0 = VersionedTable.schemaOf(spark, dir, Some(0L)).fieldNames.toSet
    assert(schemaV0 == Set("k", "x"), "time travel below the merge reads the narrow schema")
    // WITHOUT the clause, a source-only column in an explicit assignment
    // still refuses (no silent evolution)
    spark.range(0L, 1L)
      .select(lit(900L).as("k"), lit(0L).as("x"), lit(1L).as("extra"))
      .createOrReplaceTempView("cat_evo_src2")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO graft.cat_evo t USING cat_evo_src2 s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT (k, x, extra) VALUES (s.k, s.x, s.extra)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("extra"), e.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION is atomic: a failed merge leaves the schema byte-identical") {
    val dir = fresh("cat_evo_atomic")
    val schemaBefore = VersionedTable.schemaOf(spark, dir, None)
    val vBefore = VersionedTable.latestVersion(dir)
    // duplicate source keys fail the ambiguous-merge gate AFTER analysis
    // (execution time) — exactly the window where the old analysis-time
    // alterTable commit would have left the widened column behind
    spark.range(0L, 2L)
      .select(lit(7L).as("k"), col("id").as("x"), lit("dup").as("tag"))
      .createOrReplaceTempView("cat_evo_dup_src")
    val e = intercept[Exception] {
      spark.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO graft.cat_evo_atomic t " +
          "USING cat_evo_dup_src s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *").collect()
    }
    assert(e.getMessage.contains("not"), e.getMessage) // ambiguous-merge refusal
    assert(VersionedTable.latestVersion(dir) == vBefore,
      "a failed evolving merge must not commit any version")
    assert(VersionedTable.schemaOf(spark, dir, None) == schemaBefore,
      "a failed evolving merge must leave the schema byte-identical")
    assert(!spark.table("graft.cat_evo_atomic").columns.contains("tag"),
      "the staged widening must not leak into later loads")
    // and the SAME table still evolves fine on a clean merge afterwards
    spark.range(200L, 201L)
      .select(col("id").as("k"), (col("id") * 10).as("x"), lit("ok").as("tag"))
      .createOrReplaceTempView("cat_evo_ok_src")
    spark.sql(
      "MERGE WITH SCHEMA EVOLUTION INTO graft.cat_evo_atomic t " +
        "USING cat_evo_ok_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    val row = spark.sql(
      "SELECT x, tag FROM graft.cat_evo_atomic WHERE k = 200").head
    assert(row.getLong(0) == 2000L && row.getString(1) == "ok")
    assert(VersionedTable.latestVersion(dir).map(_ - vBefore.get).contains(1L),
      "the successful evolving merge is ONE commit (schema + data together)")
  }

  test("native DELETE with untranslatable predicate falls back to scan-based copy-on-write") {
    val dir = fresh("cat_del_expr")
    // v1 Filter translation cannot express arithmetic — SupportsDelete
    // would refuse; the strategy routes it onto commitDelete's Column form
    spark.sql("DELETE FROM graft.cat_del_expr WHERE k % 7 = 3")
    val left = spark.sql("SELECT k FROM graft.cat_del_expr").collect().map(_.getLong(0)).toSet
    assert(left == (0L until 100L).filterNot(_ % 7 == 3).toSet, s"${left.size} rows left")
    // the pushable shape lands on the same protocol state (one more version)
    spark.sql("DELETE FROM graft.cat_del_expr WHERE k < 10")
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_del_expr").head.getLong(0)
      == (10L until 100L).count(_ % 7 != 3))
    assert(VersionedTable.latestVersion(dir).contains(2L))
    // subqueries refuse loudly with the Scala-API escape hatch named
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graft.cat_del_expr WHERE k IN " +
        "(SELECT k FROM graft.cat_del_expr WHERE x > 50)").collect()
    }
    assert(e.getMessage.contains("subqueries are not supported"), e.getMessage)
    // DELETE without WHERE (TrueLiteral) empties the table, history intact
    spark.sql("DELETE FROM graft.cat_del_expr")
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_del_expr").head.getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_del_expr VERSION AS OF 0")
      .head.getLong(0) == 100L)
  }

  test("native ALTER TABLE graft.t: add / rename / drop column, set properties") {
    val dir = fresh("cat_alt")
    spark.sql("ALTER TABLE graft.cat_alt ADD COLUMN note STRING")
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_alt WHERE note IS NULL")
      .head.getLong(0) == 100L)
    spark.sql("INSERT INTO graft.cat_alt SELECT CAST(500 AS BIGINT), CAST(0 AS BIGINT), 'tagged'")
    spark.sql("ALTER TABLE graft.cat_alt RENAME COLUMN note TO remark")
    assert(spark.sql(
      "SELECT remark FROM graft.cat_alt WHERE remark IS NOT NULL").head.getString(0)
      == "tagged")
    spark.sql("ALTER TABLE graft.cat_alt DROP COLUMN remark")
    assert(!spark.table("graft.cat_alt").columns.contains("remark"))
    spark.sql("ALTER TABLE graft.cat_alt SET TBLPROPERTIES ('owner.team' = 'ml-data')")
    assert(VersionedTable.property(dir, "owner.team").contains("ml-data"))
    spark.sql("ALTER TABLE graft.cat_alt UNSET TBLPROPERTIES ('owner.team')")
    assert(VersionedTable.property(dir, "owner.team").isEmpty)
    // rewrites refuse: type change is not a metadata operation
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cat_alt ALTER COLUMN x TYPE STRING").collect()
    }
    assert(e.getMessage.contains("unsupported ALTER") || e.getMessage.contains("not supported"),
      e.getMessage)
  }

  test("DROP TABLE managed-ness is the PERSISTED marker, never warehouse residency") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val wh = Files.createTempDirectory("graft_wh").toString
    // a user's versioned table that merely SITS under the warehouse (never
    // created through the catalog, no marker): DROP must only unmap it
    val pre = new org.apache.hadoop.fs.Path(wh, "preexist").toString
    VersionedTable.commitAppend(spark,
      spark.range(0L, 10L).select(col("id").as("k")), pre)
    val cat = new GraftCatalog
    val opts = new java.util.HashMap[String, String](); opts.put("warehouse", wh)
    cat.initialize("graftwh", new CaseInsensitiveStringMap(opts))
    val ident = Identifier.of(Array("default"), "preexist")
    assert(cat.tableExists(ident))
    assert(cat.dropTable(ident))
    assert(VersionedTable.latestVersion(pre).contains(0L),
      "DROP TABLE deleted an unmarked warehouse-resident directory")
    // created THROUGH the catalog: the marker is persisted with the table
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    cat.createTable(Identifier.of(Array("default"), "born_here"), schema,
      Array.empty, new java.util.HashMap[String, String]())
    val born = new org.apache.hadoop.fs.Path(wh, "born_here").toString
    assert(VersionedTable.property(born, GraftCatalog.ManagedProp).contains("true"),
      "createTable must persist the managed marker in the table directory")
    GraftCatalog.deregister("born_here")
    // restart simulation: the marker ALONE (no in-memory created-set entry)
    // must make DROP delete the data
    val mng = Files.createTempDirectory("graft_cat").toString + "/restarted"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 10L).select(col("id").as("k")), mng)
    VersionedTable.setProperty(mng, GraftCatalog.ManagedProp, "true")
    GraftCatalog.register("cat_restarted", mng)
    spark.sql("DROP TABLE graft.cat_restarted")
    assert(VersionedTable.latestVersion(mng).isEmpty,
      "the persisted marker must survive a restart and make DROP delete data")
  }

  test("readStream.table / writeStream.toTable stream through the catalog") {
    import org.apache.spark.sql.streaming.Trigger
    val src = fresh("cat_st_src")
    val dstDir = Files.createTempDirectory("graft_cat").toString + "/dst"
    VersionedTable.commitAppend(spark,
      spark.range(0L, 0L).select(col("id").as("k"), col("id").as("x")), dstDir)
    GraftCatalog.register("cat_st_dst", dstDir)
    val ckpt = Files.createTempDirectory("graft_cat").toString
    // table-name-addressed streaming, both ends: the v1 fallback resolves
    // the graft source/sink behind the DSv2 catalog identifiers
    // .format("graft") on the writer: Spark requires the stream writer's
    // source to match the target table's provider (same as Delta's contract)
    val q = spark.readStream.table("graft.cat_st_src")
      .where(col("k") < 50L)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$ckpt/c1")
      .trigger(Trigger.AvailableNow())
      .toTable("graft.cat_st_dst")
    q.awaitTermination()
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_st_dst").head.getLong(0) == 50L)
    // a second commit on the source streams incrementally (versioned sink
    // committed exactly one more version)
    spark.sql("INSERT INTO graft.cat_st_src SELECT CAST(7 AS BIGINT), CAST(700 AS BIGINT)")
    val q2 = spark.readStream.table("graft.cat_st_src")
      .where(col("k") < 50L)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$ckpt/c1")
      .trigger(Trigger.AvailableNow())
      .toTable("graft.cat_st_dst")
    q2.awaitTermination()
    assert(spark.sql("SELECT count(*) AS n FROM graft.cat_st_dst").head.getLong(0) == 51L)
    // the change feed is table-name addressable too (key columns resolve
    // from the table declaration, CDF meta columns ride along)
    VersionedTable.setKeyColumns(dstDir, Seq("k"))
    VersionedTable.commitUpdate(spark, dstDir, col("k") === 7L,
      Map("x" -> (col("x") + 1L)))
    val cdfOut = Files.createTempDirectory("graft_cat").toString
    val q3 = spark.readStream
      .option("readChangeFeed", "true").option("startingVersion", "3")
      .table("graft.cat_st_dst")
      .writeStream.format("parquet")
      .option("path", s"$cdfOut/out").option("checkpointLocation", s"$cdfOut/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q3.awaitTermination()
    val ch = spark.read.parquet(s"$cdfOut/out")
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((7L, "update_preimage"), (7L, "update_postimage")), ch.toString)
    // time travel is a batch concept: streaming a pinned version refuses
    val e = intercept[Exception] {
      spark.readStream.option("versionAsOf", "0").table("graft.cat_st_src")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$ckpt/c2")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("pinned") || m.contains("time travel")),
      msgs(e).mkString(" | "))
  }

  test("format(\"graft\") streams: readStream tails commits, writeStream commits versions") {
    import org.apache.spark.sql.streaming.Trigger
    val src = fresh("cat_t8")
    val r = Files.createTempDirectory("graft_cat").toString
    val dst = s"$r/dst"
    // graft -> graft: tail the source table, land each batch as a commit
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("path", dst).option("checkpointLocation", s"$r/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(VersionedTable.read(spark, dst).count() == 100L)
    spark.sql("INSERT INTO graft.cat_t8 SELECT CAST(900 AS BIGINT), CAST(1 AS BIGINT)")
    drain()
    assert(VersionedTable.read(spark, dst).count() == 101L)
    // the CDF flavor rides the same format string
    VersionedTable.setKeyColumns(src, Seq("k"))
    val cdf = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1").load(src)
      .writeStream.format("parquet")
      .option("path", s"$r/cdf").option("checkpointLocation", s"$r/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    cdf.awaitTermination()
    val types = spark.read.parquet(s"$r/cdf").select("_change_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("insert"), types.toString)
  }
}

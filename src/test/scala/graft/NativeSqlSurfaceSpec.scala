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

  test("verb statements with leading SQL comments still claim their head token") {
    fresh("nss_cmt")
    val r = spark.sql("-- nightly maintenance\n/* target layout */\nOPTIMIZE graft.nss_cmt TARGET 2 FILES").head
    assert(r.getString(0) == "OPTIMIZE", r.toString)
  }

  test("native ADD/DROP CONSTRAINT route onto the engine's CHECK constraints") {
    val dir = fresh("nss_ck")
    spark.sql("ALTER TABLE graft.nss_ck ADD CONSTRAINT pos CHECK (x >= 0)")
    assert(graft.tables.Constraints.list(dir).map(_._1) == Seq("pos"))
    // the protocol enforces it on every write path
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO graft.nss_ck SELECT CAST(9 AS BIGINT), CAST(-1 AS BIGINT)")
    }
    assert(e1.getMessage.contains("CHECK `pos`"), e1.getMessage)
    // adding a constraint existing rows violate refuses via Spark's own
    // validation scan (NEW_CHECK_CONSTRAINT_VIOLATION), nothing recorded
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_ck ADD CONSTRAINT huge CHECK (x > 1000)")
    }
    assert(e2.getMessage.contains("violated by existing data"), e2.getMessage)
    assert(graft.tables.Constraints.list(dir).map(_._1) == Seq("pos"))
    // drop frees the write path; a missing name refuses with the inventory
    spark.sql("ALTER TABLE graft.nss_ck DROP CONSTRAINT pos")
    spark.sql("INSERT INTO graft.nss_ck SELECT CAST(9 AS BIGINT), CAST(-1 AS BIGINT)")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_ck DROP CONSTRAINT nope")
    }
    assert(e3.getMessage.contains("no such constraint"), e3.getMessage)
  }

  test("DESCRIBE HISTORY / DETAIL parse as native statements") {
    val dir = fresh("nss_desc")
    spark.sql("DELETE FROM graft.nss_desc WHERE k >= 90")
    val hist = spark.sql("DESCRIBE HISTORY graft.nss_desc").collect()
    assert(hist.length == 2)
    assert(hist.map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(hist.forall(r => !r.isNullAt(1) && r.getBoolean(3)))
    val det = spark.sql("DESC DETAIL graft.nss_desc").head
    assert(det.getString(0) == dir && det.getLong(1) == 1L)
    assert(det.getLong(3) == 2L, "num_commits")
    // Spark's own DESCRIBE TABLE still resolves (nothing shadowed)
    assert(spark.sql("DESCRIBE TABLE graft.nss_desc").count() >= 2L)
  }

  test("verbs accept both TABLE spellings and resolve via the warehouse") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val dir = fresh("nss_sp")
    spark.sql("DELETE FROM graft.nss_sp WHERE k >= 50")
    // Delta's `RESTORE graft.t` (no TABLE) and `OPTIMIZE TABLE graft.t`
    // spellings both canonicalize onto the verb grammar
    assert(spark.sql("RESTORE graft.nss_sp TO VERSION AS OF 0").head.getString(0) == "RESTORE")
    assert(spark.sql("SELECT count(*) AS n FROM graft.nss_sp").head.getLong(0) == 100L)
    assert(spark.sql("OPTIMIZE TABLE graft.nss_sp TARGET 2 FILES").head.getString(0) == "OPTIMIZE")
    // a warehouse-resolved table (empty registry half) still takes the verb
    val wh = java.nio.file.Files.createTempDirectory("graft_nss_wh").toString
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try {
      // simulate a restart-resolvable table: lives under the warehouse,
      // never registered in this "process" — the session's own catalog
      // (rebuilt by resetCatalogs from the conf above) does the resolving
      VersionedTable.commitAppend(spark,
        spark.range(0L, 10L).select(col("id").as("k")),
        new org.apache.hadoop.fs.Path(wh, "wh_only").toString)
      // force a fresh catalog instance in the session to pick up warehouse
      org.apache.spark.sql.graft.PlanBridge.resetCatalogs(spark)
      assert(spark.sql("OPTIMIZE graft.wh_only TARGET 1 FILES").head.getLong(2) >= 1L)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft.warehouse")
      org.apache.spark.sql.graft.PlanBridge.resetCatalogs(spark)
    }
  }

  test("DRY RUN in a comment cannot flip a real VACUUM's output shape") {
    val dir = fresh("nss_dry")
    spark.sql("DELETE FROM graft.nss_dry WHERE k >= 90")
    // dry-ness is decided by TableSql's own vacuum grammar on the bare
    // statement, so a leading comment mentioning DRY RUN stays inert: this
    // is a REAL vacuum and must return the (verb, table, version) receipt
    val r = spark.sql(
      "/* todo: consider DRY RUN first */ VACUUM graft.nss_dry RETAIN 1 VERSIONS").head
    assert(r.getString(0) == "VACUUM" && r.getString(1) == "nss_dry", r.toString)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.nss_dry VERSION AS OF 0").collect()
    }
    // and a real DRY RUN still returns the deletion-plan shape
    spark.sql("DELETE FROM graft.nss_dry WHERE k >= 80")
    val planned = spark.sql(
      "-- nightly\nVACUUM graft.nss_dry RETAIN 1 VERSIONS DRY RUN").collect()
    assert(planned.nonEmpty && planned.head.schema.fieldNames.sameElements(Array("path")))
  }

  test("a GraftCatalog under another name gets the same verb surface") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nss_alt").toString
    spark.conf.set("spark.sql.catalog.graftalt", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftalt.warehouse", wh)
    try {
      org.apache.spark.sql.graft.PlanBridge.resetCatalogs(spark)
      VersionedTable.commitAppend(spark,
        spark.range(0L, 20L).select(col("id").as("k")).repartition(4),
        new org.apache.hadoop.fs.Path(wh, "alt_t").toString)
      assert(spark.sql("OPTIMIZE graftalt.alt_t TARGET 1 FILES").head.getString(0) == "OPTIMIZE")
      assert(spark.sql("DESCRIBE HISTORY graftalt.alt_t").count() == 2L)
      assert(spark.sql("RESTORE TABLE graftalt.alt_t TO VERSION AS OF 0").head.getString(0) == "RESTORE")
      val e = intercept[Exception] { spark.sql("OPTIMIZE graftalt.nope TARGET 1 FILES") }
      assert(e.getMessage.contains("unknown table"), e.getMessage)
      // a NON-graft catalog ident is never claimed: Spark's own error
      intercept[Exception] { spark.sql("OPTIMIZE spark_catalog.something TARGET 1 FILES") }
    } finally {
      spark.conf.unset("spark.sql.catalog.graftalt")
      spark.conf.unset("spark.sql.catalog.graftalt.warehouse")
      org.apache.spark.sql.graft.PlanBridge.resetCatalogs(spark)
    }
  }

  test("SHOW TBLPROPERTIES reads the engine's property store natively") {
    fresh("nss_props")
    spark.sql("ALTER TABLE graft.nss_props SET TBLPROPERTIES ('stage' = 'bronze', 'team' = 'etl')")
    val props = spark.sql("SHOW TBLPROPERTIES graft.nss_props").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("stage").contains("bronze") && props.get("team").contains("etl"), props.toString)
    val one = spark.sql("SHOW TBLPROPERTIES graft.nss_props ('stage')").head
    assert(one.getString(1) == "bronze", one.toString)
  }

  test("a multi-change schema ALTER lands as ONE protocol commit") {
    val dir = fresh("nss_one")
    val v0 = VersionedTable.latestVersion(dir).get
    spark.sql("ALTER TABLE graft.nss_one ADD COLUMNS (a INT, b STRING)")
    assert(VersionedTable.latestVersion(dir).contains(v0 + 1),
      "two added columns must be one commit, not two")
    assert(spark.table("graft.nss_one").columns.toSet == Set("k", "x", "a", "b"))
    // the op label records both changes
    val hist = spark.sql("DESCRIBE HISTORY graft.nss_one").collect()
      .map(_.getString(2)).mkString("|")
    assert(hist.contains("ADD COLUMN a") && hist.contains("ADD COLUMN b"), hist)
  }

  test("CONVERT TO GRAFT adopts a plain parquet dir zero-copy as v0") {
    val work = java.nio.file.Files.createTempDirectory("graft_nss_conv").toString
    val src  = s"$work/lake"
    spark.range(0L, 100L).select(col("id").as("k"), (col("id") * 3).as("x"))
      .repartition(4).write.parquet(src)
    val tdir = s"$work/t"
    GraftCatalog.register("nss_conv", tdir)
    val r = spark.sql(s"CONVERT TO GRAFT graft.nss_conv FROM '$src'").head
    assert(r.getString(0) == "CONVERT" && r.getLong(2) == 0L, r.toString)
    // zero-copy: the table dir owns no data files yet
    assert(!new java.io.File(s"$tdir/data").exists() ||
      new java.io.File(s"$tdir/data").listFiles().isEmpty)
    assert(spark.sql("SELECT count(*) AS n, sum(x) AS s FROM graft.nss_conv").head
      .getLong(1) == (0L until 100L).map(_ * 3).sum)
    // DML on the adopted table: copy-on-write into its OWN data/, source intact
    spark.sql("DELETE FROM graft.nss_conv WHERE k >= 50")
    assert(spark.sql("SELECT count(*) AS n FROM graft.nss_conv").head.getLong(0) == 50L)
    assert(spark.read.parquet(src).count() == 100L, "the source dir never changes")
    assert(spark.sql("SELECT count(*) AS n FROM graft.nss_conv VERSION AS OF 0")
      .head.getLong(0) == 100L)
    // vacuum must never delete adopted (absolute, out-of-table) files
    VersionedTable.vacuum(spark, tdir, retainLast = 1, graceMs = 0L)
    assert(spark.read.parquet(src).count() == 100L)
    // refusals: Hive-partitioned layouts and mixed schemas
    val part = s"$work/part"
    spark.range(4L).select(col("id").as("k"), (col("id") % 2).as("p"))
      .write.partitionBy("p").parquet(part)
    GraftCatalog.register("nss_conv2", s"$work/t2")
    val e1 = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT graft.nss_conv2 FROM '$part'")
    }
    assert(e1.getMessage.contains("Hive-partitioned"), e1.getMessage)
    val mixed = s"$work/mixed"
    spark.range(2L).select(col("id").as("k")).coalesce(1).write.parquet(mixed)
    spark.range(2L).select(col("id").as("k"), lit("w").as("extra"))
      .coalesce(1).write.mode("append").parquet(mixed)
    val e2 = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT graft.nss_conv2 FROM '$mixed'")
    }
    assert(e2.getMessage.contains("differing schemas"), e2.getMessage)
    // an existing table refuses
    val e3 = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT graft.nss_conv FROM '$src'")
    }
    assert(e3.getMessage.contains("already has commits"), e3.getMessage)
  }

  test("the managed marker is a reserved property: TBLPROPERTIES cannot launder it") {
    val dir = fresh("nss_guard")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_guard SET TBLPROPERTIES ('graft.managed' = 'true')")
    }
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_guard UNSET TBLPROPERTIES ('graft.managed')")
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    val e3 = intercept[Exception] {
      graft.tables.TableSql.execute(spark, Map("nss_guard" -> dir),
        "ALTER TABLE nss_guard SET TBLPROPERTIES ('GRAFT.MANAGED' = 'true')")
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
    assert(VersionedTable.property(dir, GraftCatalog.ManagedProp).isEmpty)
  }

  test("multi-change ALTER is all-or-none; position/window refusals are loud") {
    val dir = fresh("nss_alt2")
    val before = VersionedTable.latestVersion(dir)
    // second change invalid (NOT NULL): the FIRST must not have committed
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_alt2 ADD COLUMNS (a INT, b INT NOT NULL)")
    }
    assert(e.getMessage.contains("nullable"), e.getMessage)
    assert(VersionedTable.latestVersion(dir) == before,
      "a rejected change in a multi-change ALTER must apply NOTHING")
    assert(!spark.table("graft.nss_alt2").columns.contains("a"))
    // schema-level rejections (existing / duplicate names) are validated
    // up front too — the commit's own refusal must not fire half-way
    val eDup = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_alt2 ADD COLUMNS (a2 INT, x INT)") // x exists
    }
    assert(eDup.getMessage.contains("already exists"), eDup.getMessage)
    assert(VersionedTable.latestVersion(dir) == before)
    assert(!spark.table("graft.nss_alt2").columns.contains("a2"))
    val eDup2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_alt2 ADD COLUMNS (b1 INT, b1 STRING)")
    }
    assert(eDup2.getMessage.contains("already exists"), eDup2.getMessage)
    assert(VersionedTable.latestVersion(dir) == before)
    // FIRST/AFTER positioning refuses instead of silently appending
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_alt2 ADD COLUMN c INT FIRST")
    }
    assert(e2.getMessage.contains("FIRST/AFTER"), e2.getMessage)
    // property changes work in the CREATE → first-INSERT window
    val pend = java.nio.file.Files.createTempDirectory("graft_nss_pend").toString + "/p"
    GraftCatalog.register("nss_pending", pend)
    spark.sql("CREATE TABLE graft.nss_pending (k BIGINT)")
    spark.sql("ALTER TABLE graft.nss_pending SET TBLPROPERTIES ('stage' = 'bronze')")
    assert(VersionedTable.property(pend, "stage").contains("bronze"))
    // but schema changes before the first commit refuse with a real message
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.nss_pending ADD COLUMN x INT")
    }
    assert(e3.getMessage.contains("first write"), e3.getMessage)
  }
}

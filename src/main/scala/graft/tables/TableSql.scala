package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** SQL verbs over versioned tables — the Delta SQL surface the reference
  * drives from notebooks (`00. Explore.py:89-90` runs `%sql optimize
  * dais_2021.flowers_train`), routed onto [[VersionedTable]]'s commit
  * protocol instead of a Delta jar:
  *
  *   OPTIMIZE t [ZORDER BY (c1, ..., cN)] [WHERE <cond>] [TARGET n FILES]
  *   VACUUM t RETAIN n VERSIONS | HOURS [DRY RUN]
  *   DELETE FROM t WHERE <cond>
  *   UPDATE t SET a = <expr> [, b = <expr> ...] WHERE <cond>
  *   RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'yyyy-MM-dd HH:mm:ss'
  *   MERGE INTO t USING <view | (subquery)> ON (k1 [, k2 ...])
  *   MERGE INTO t USING <view | (subquery)> ON (k1 [, k2 ...])
  *     WHEN MATCHED [AND cond] THEN UPDATE SET a = expr [, b = expr ...] | UPDATE SET *
  *     WHEN MATCHED [AND cond] THEN DELETE
  *     WHEN NOT MATCHED [AND cond] THEN INSERT * | INSERT (a, b) VALUES (e1, e2)
  *     WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET a = expr ... | DELETE
  *   ALTER TABLE t RENAME COLUMN a TO b   (metadata-only, column mapping)
  *   ALTER TABLE t DROP COLUMN a          (metadata-only, tombstoned)
  *   ALTER TABLE t ADD COLUMN c <type>    (metadata-only, nullable, null-filled)
  *   ALTER TABLE t ADD CONSTRAINT n CHECK (<pred>) | DROP CONSTRAINT n
  *   ALTER TABLE t SET TBLPROPERTIES ('k' = 'v' [, ...])
  *   SHOW TBLPROPERTIES t
  *   CREATE TABLE t2 SHALLOW | DEEP CLONE t [VERSION AS OF n | TIMESTAMP AS OF 'ts']
  *   CONVERT TO GRAFT t FROM '<parquet dir>'   (zero-copy adoption as v0)
  *   DESCRIBE HISTORY t | DESCRIBE DETAIL t
  *   SELECT ... FROM t [VERSION AS OF n | TIMESTAMP AS OF 'yyyy-MM-dd HH:mm:ss'] ...
  *
  * Everything below the verb line is the engine's existing machinery —
  * conditions and SET expressions parse through Catalyst's `expr()`, so
  * the full SQL expression language applies. SELECT statements (and any
  * other statement Spark's grammar owns) resolve NATIVELY through the DSv2
  * catalog ([[graft.catalog.GraftCatalog]]): the name→dir map registers
  * there, `graft` becomes the current catalog for the statement, and the
  * text reaches `spark.sql` verbatim — `VERSION AS OF` / `TIMESTAMP AS OF`
  * parse in Spark's own grammar (no string rewriting, so literals are
  * inert by construction) and the read plan is the engine's own parquet
  * scan (same optimizer, same pushdown; see
  * [[graft.catalog.GraftTableResolution]]). DML verbs return a one-row
  * DataFrame (verb, table, version) for observability.
  *
  * The catalog is an explicit name → table-directory map: at 100 TB the
  * table registry is owned by the platform (a metastore); this layer only
  * needs the resolution, not the storage.
  */
object TableSql {

  /** Serializes the SELECT path's session-global mutations (name
    * registration, current-catalog set/restore) across concurrent
    * TableSql callers on the same process. */
  private val sqlLock = new Object

  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+(\w+)\s*(?:ZORDER\s+BY\s*\(([\w\s,]+)\))?\s*(?:WHERE\s+(.+?))?\s*(?:TARGET\s+(\d+)\s+FILES)?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+(\w+)\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS)(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+TABLE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val RestoreTsRe =
    """(?is)^\s*RESTORE\s+TABLE\s+(\w+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  // whole-row MERGE (the engine's commitMerge semantics): the source is a
  // registered temp view or any parenthesized subquery; ON lists the key
  // column(s) — arbitrary ON predicates are not equi-key merges and are
  // refused by omission
  private val MergeRe =
    """(?is)^\s*MERGE\s+INTO\s+(\w+)\s+USING\s+(\w+|\(.+\))\s+ON\s*\(\s*([\w\s,]+)\s*\)\s*;?\s*$""".r
  // conditional MERGE (Delta's full surface): same header, then one or
  // more WHEN clauses — parsed by [[parseMergeClauses]]
  private val MergeCondRe =
    """(?is)^\s*MERGE\s+INTO\s+(\w+)\s+USING\s+(\w+|\(.+?\))\s+ON\s*\(\s*([\w\s,]+)\s*\)\s*(WHEN\s.+?)\s*;?\s*$""".r
  // one WHEN arm; the lookahead stops each arm at the next WHEN or at end
  private val WhenArmRe =
    ("(?is)WHEN\\s+(NOT\\s+)?MATCHED(\\s+BY\\s+SOURCE)?\\s*(?:\\s+AND\\s+(.+?))?\\s*THEN\\s+" +
      "(UPDATE\\s+SET\\s+.+?|DELETE|INSERT\\s*\\*|INSERT\\s*\\(.+?\\)\\s*VALUES\\s*\\(.+?\\))" +
      "\\s*(?=WHEN\\s+(?:NOT\\s+)?MATCHED|$)").r
  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*$""".r
  private val DetailRe =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+(\w+)\s*;?\s*$""".r
  private val RenameColRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val DropColRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$""".r
  private val AddColRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w()<>,:\s]+?)\s*;?\s*$""".r
  private val AddConstraintRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*$""".r
  private val DropConstraintRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*$""".r
  private val SetPropsRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*$""".r
  private val ShowPropsRe =
    """(?is)^\s*SHOW\s+TBLPROPERTIES\s+(\w+)\s*;?\s*$""".r
  private val ConvertRe =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+(\w+)\s+FROM\s+'([^']+)'\s*;?\s*$""".r
  private val CloneRe =
    """(?is)^\s*CREATE\s+TABLE\s+(\w+)\s+(SHALLOW|DEEP)\s+CLONE\s+(\w+)\s*(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')?\s*;?\s*$""".r

  /** Default OPTIMIZE target when no TARGET clause is given. */
  val DefaultOptimizeFiles = 8

  /** Whether `sql` is a `VACUUM ... DRY RUN` by THIS grammar — the
    * maintenance-verb parser shapes its declared output from this, so
    * dry-ness can never drift from what [[execute]] will actually do
    * (matching a loose `DRY RUN` regex against the raw statement text once
    * misclassified a real vacuum whose leading comment mentioned it). */
  def isDryRunVacuum(sql: String): Boolean = sql match {
    case VacuumRe(_, _, _, dry) => dry != null
    case _ => false
  }

  def execute(spark: SparkSession, tables: Map[String, String],
      sql: String): DataFrame = {
    def dirOf(t: String): String = tables.getOrElse(t,
      sys.error(s"TableSql: unknown table `$t` (catalog: ${tables.keys.toSeq.sorted.mkString(", ")})"))
    def done(verb: String, t: String, v: Long): DataFrame = {
      import spark.implicits._
      Seq((verb, t, v)).toDF("verb", "table", "version")
    }
    sql match {
      case OptimizeRe(t, zlist, w, n) =>
        val target = Option(n).map(_.toInt).getOrElse(DefaultOptimizeFiles)
        val zCols  = Option(zlist).toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        done("OPTIMIZE", t,
          VersionedTable.commitCompact(spark, dirOf(t), target,
            zOrderCols = zCols, where = Option(w).map(expr)))
      case VacuumRe(t, n, unit, dry) =>
        if (dry != null) {
          // DRY RUN: the full deletion plan, nothing touched — one row per
          // planned path (Delta's VACUUM ... DRY RUN shape)
          val (_, paths) =
            if (unit.equalsIgnoreCase("VERSIONS"))
              VersionedTable.vacuumDryRun(spark, dirOf(t), retainLast = n.toInt)
            else
              VersionedTable.vacuumOlderThanDryRun(spark, dirOf(t),
                olderThanMs = n.toLong * 3600000L)
          import spark.implicits._
          paths.toDF("path")
        } else {
          val dropped =
            if (unit.equalsIgnoreCase("VERSIONS"))
              VersionedTable.vacuum(spark, dirOf(t), retainLast = n.toInt)
            else
              VersionedTable.vacuumOlderThan(spark, dirOf(t),
                olderThanMs = n.toLong * 3600000L)
          done("VACUUM", t, dropped.size.toLong)
        }
      case DeleteRe(t, cond) =>
        done("DELETE", t, VersionedTable.commitDelete(spark, dirOf(t), expr(cond)))
      case UpdateRe(t, setList, cond) =>
        val set = splitTop(setList).map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"TableSql: malformed SET assignment `$a`")
          a.take(i).trim -> expr(a.drop(i + 1).trim)
        }.toMap
        done("UPDATE", t, VersionedTable.commitUpdate(spark, dirOf(t), expr(cond), set))
      case RestoreRe(t, v) =>
        done("RESTORE", t, VersionedTable.commitRestore(spark, dirOf(t), v.toLong))
      case RestoreTsRe(t, ts) =>
        done("RESTORE", t, VersionedTable.commitRestore(spark, dirOf(t),
          VersionedTable.versionAsOf(dirOf(t), java.sql.Timestamp.valueOf(ts).getTime)))
      case HistoryRe(t) =>
        VersionedTable.history(spark, dirOf(t))
      case DetailRe(t) =>
        VersionedTable.detail(spark, dirOf(t))
      case RenameColRe(t, a, b) =>
        done("RENAME COLUMN", t, VersionedTable.commitRenameColumn(spark, dirOf(t), a, b))
      case DropColRe(t, c) =>
        done("DROP COLUMN", t, VersionedTable.commitDropColumn(spark, dirOf(t), c))
      case AddColRe(t, c, ddl) =>
        done("ADD COLUMN", t, VersionedTable.commitAddColumn(spark, dirOf(t), c,
          org.apache.spark.sql.types.DataType.fromDDL(ddl)))
      case AddConstraintRe(t, name, pred) =>
        Constraints.add(spark, dirOf(t), name, pred)
        done("ADD CONSTRAINT", t,
          VersionedTable.latestVersion(dirOf(t)).getOrElse(-1L))
      case DropConstraintRe(t, name) =>
        val existed = Constraints.drop(dirOf(t), name)
        require(existed, s"TableSql: no constraint `$name` on `$t`")
        done("DROP CONSTRAINT", t,
          VersionedTable.latestVersion(dirOf(t)).getOrElse(-1L))
      case SetPropsRe(t, kvs) =>
        // SQL-standard '' escaping inside key/value literals
        val kvRe = """(?s)^\s*'((?:[^']|'')+)'\s*=\s*'((?:[^']|'')*)'\s*$""".r
        def unq(x: String) = x.replace("''", "'")
        splitTop(kvs).foreach {
          case kvRe(k, v) =>
            val key = unq(k)
            require(!key.equalsIgnoreCase(graft.catalog.GraftCatalog.ManagedProp),
              s"TableSql: `$key` is a reserved engine property (it records " +
                "catalog managed-ness for DROP TABLE) and cannot be set " +
                "through TBLPROPERTIES")
            VersionedTable.setProperty(dirOf(t), key, unq(v))
          case other => sys.error(s"TableSql: malformed TBLPROPERTIES entry `$other` " +
            "(expected 'key' = 'value')")
        }
        done("SET TBLPROPERTIES", t,
          VersionedTable.latestVersion(dirOf(t)).getOrElse(-1L))
      case ShowPropsRe(t) =>
        import spark.implicits._
        VersionedTable.properties(dirOf(t)).toDF("key", "value")
      case ConvertRe(t, src) =>
        // zero-copy adoption of a plain parquet dir (Delta's CONVERT TO
        // DELTA); the converted name registers so it resolves afterwards
        val d = dirOf(t)
        val v = VersionedTable.convertParquet(spark, src, d)
        graft.catalog.GraftCatalog.register(t, d)
        done("CONVERT", t, v)
      case CloneRe(dst, flavor, src, v, ts) =>
        val version = Option(v).map(_.toLong).orElse(Option(ts).map(t =>
          VersionedTable.versionAsOf(dirOf(src),
            java.sql.Timestamp.valueOf(t).getTime)))
        done(s"${flavor.toUpperCase(java.util.Locale.ROOT)} CLONE", dst,
          if (flavor.equalsIgnoreCase("SHALLOW"))
            VersionedTable.cloneShallow(spark, dirOf(src), dirOf(dst), version)
          else VersionedTable.cloneDeep(spark, dirOf(src), dirOf(dst), version))
      case MergeRe(t, src, keys) =>
        val source =
          if (src.startsWith("(")) spark.sql(src.stripPrefix("(").stripSuffix(")"))
          else spark.table(src)
        val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        done("MERGE", t,
          VersionedTable.commitMerge(spark, dirOf(t), source, keyCols))
      case MergeCondRe(t, src, keys, arms) =>
        val source =
          if (src.startsWith("(")) spark.sql(src.stripPrefix("(").stripSuffix(")"))
          else spark.table(src)
        val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        done("MERGE", t, VersionedTable.commitMergeConditional(
          spark, dirOf(t), source, keyCols, parseMergeClauses(arms)))
      case _ =>
        // SELECT path: resolve NATIVELY through the DSv2 catalog
        // ([[graft.catalog.GraftCatalog]]) — register the name→dir map,
        // make `graft` the current catalog for the statement, and hand the
        // TEXT to spark.sql verbatim. `VERSION AS OF` / `TIMESTAMP AS OF`
        // parse in Spark's own grammar and resolve through
        // `loadTable(ident, version | timestamp)`; no string rewriting
        // happens, so a hostile literal containing `t VERSION AS OF 1`
        // needs no special-casing — the parser owns the text. Temp views
        // still shadow catalog tables (standard SQL precedence).
        // The register + set-current-catalog + analyze + restore sequence
        // mutates SESSION-GLOBAL state, so it is serialized under one lock:
        // a concurrent TableSql statement can neither observe the wrong
        // current catalog (or have it restored mid-analysis) nor analyze
        // against another caller's registration of the same bare name —
        // each statement re-registers ITS name→dir map inside the lock and
        // binds every reference before releasing it. Holding the lock for
        // analysis only is enough: spark.sql analyzes EAGERLY (Dataset
        // .ofRows asserts analysis), so every table reference is bound to
        // its concrete scan before the catalog is restored; later
        // execution needs no catalog state.
        sqlLock.synchronized {
          if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
            spark.conf.set("spark.sql.catalog.graft",
              classOf[graft.catalog.GraftCatalog].getName)
          tables.foreach { case (t, d) => graft.catalog.GraftCatalog.register(t, d) }
          val prevCatalog = spark.catalog.currentCatalog()
          spark.catalog.setCurrentCatalog("graft")
          try spark.sql(sql) finally spark.catalog.setCurrentCatalog(prevCatalog)
        }
    }
  }

  /** Parse the WHEN arms of a conditional MERGE into
    * [[VersionedTable.MergeClause]]s (order preserved — clause order is
    * the Delta priority rule). */
  private def parseMergeClauses(arms: String): Seq[VersionedTable.MergeClause] = {
    val ms = WhenArmRe.findAllMatchIn(arms).toSeq
    // COVERAGE gate: the matched arms must tile the whole WHEN text. A
    // condition the arm regex cannot split correctly — e.g. an inline
    // `CASE WHEN ... THEN ...` whose THEN truncates the lazy cond match —
    // leaves unmatched residue, and without this check the arm would be
    // silently DROPPED instead of rejected. CASE expressions inside clause
    // conditions are therefore refused here by construction; use the Scala
    // API (commitMergeConditional) for conditions the SQL front end can't
    // tokenize.
    locally {
      var pos = 0
      (ms.map(m => (m.start, m.end)) :+ ((arms.length, arms.length))).foreach {
        case (s0, e0) =>
          require(arms.substring(pos, s0).trim.isEmpty,
            s"TableSql: unparseable MERGE WHEN text `${arms.substring(pos, s0).trim}` " +
              "— check clause syntax; CASE expressions inside WHEN conditions are " +
              "not supported by the SQL front end (use the Scala API)")
          pos = e0
      }
    }
    val parsed = ms.iterator.map { m =>
      val not      = m.group(1) != null
      val bySource = m.group(2) != null
      val cond     = Option(m.group(3)).map(_.trim)
      val act      = m.group(4).trim
      val actU = act.toUpperCase(java.util.Locale.ROOT)
      require(not || !bySource,
        "TableSql: `WHEN MATCHED BY SOURCE` is not a merge arm — did you " +
          "mean `WHEN NOT MATCHED BY SOURCE`?")
      def parseSet(): Map[String, String] = {
        val setList = act.replaceFirst("(?is)^UPDATE\\s+SET\\s+", "").trim
        if (setList == "*") Map.empty[String, String] // UPDATE SET *
        else splitTop(setList).map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"TableSql: malformed MERGE SET assignment `$a`")
          a.take(i).trim -> a.drop(i + 1).trim
        }.toMap
      }
      if (not && bySource && actU.startsWith("UPDATE")) {
        // the retention arm: target-only rows — SET must be explicit
        // (commitMergeConditional enforces non-empty, like Delta)
        VersionedTable.WhenNotMatchedBySourceUpdate(cond, parseSet())
          : VersionedTable.MergeClause
      } else if (not && bySource && actU == "DELETE") {
        VersionedTable.WhenNotMatchedBySourceDelete(cond)
      } else if (not && bySource) {
        sys.error("TableSql: NOT MATCHED BY SOURCE supports only UPDATE SET / DELETE")
      } else if (!not && actU.startsWith("UPDATE")) {
        VersionedTable.WhenMatchedUpdate(cond, parseSet())
      } else if (!not && actU == "DELETE") {
        VersionedTable.WhenMatchedDelete(cond)
      } else if (not && actU.replaceAll("\\s+", "") == "INSERT*") {
        VersionedTable.WhenNotMatchedInsert(cond, None)
      } else if (not && actU.startsWith("INSERT")) {
        val ivRe = """(?is)^INSERT\s*\((.+?)\)\s*VALUES\s*\((.+)\)$""".r
        act match {
          case ivRe(cols, vals) =>
            val cs = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val vs = splitTop(vals)
            require(cs.length == vs.length,
              s"TableSql: INSERT lists ${cs.length} column(s) but ${vs.length} value(s)")
            VersionedTable.WhenNotMatchedInsert(cond, Some(cs.zip(vs).toMap))
          case _ => sys.error(s"TableSql: malformed INSERT clause `$act`")
        }
      } else sys.error("TableSql: malformed MERGE WHEN clause — " +
        (if (not) "NOT MATCHED supports only INSERT" else "MATCHED supports only UPDATE SET / DELETE"))
    }.toSeq
    require(parsed.nonEmpty, s"TableSql: MERGE has no parseable WHEN clause in `$arms`")
    parsed
  }

  /** Split on top-level commas only — commas nested in parens (function
    * calls, CASE arms) or inside single-quoted string literals don't
    * split. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb  = new StringBuilder
    var d   = 0
    var q   = false // inside a single-quoted literal ('' escapes toggle twice, harmlessly)
    s.foreach {
      case '\'' => q = !q; sb += '\''
      case '(' if !q => d += 1; sb += '('
      case ')' if !q => d -= 1; sb += ')'
      case ',' if d == 0 && !q => out += sb.toString; sb.clear()
      case c   => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

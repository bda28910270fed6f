package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** SQL verbs over versioned tables — the Delta SQL surface the reference
  * drives from notebooks (`00. Explore.py:89-90` runs `%sql optimize
  * dais_2021.flowers_train`), routed onto [[VersionedTable]]'s commit
  * protocol instead of a Delta jar:
  *
  *   OPTIMIZE t [ZORDER BY (a, b)] [TARGET n FILES]
  *   VACUUM t RETAIN n VERSIONS | VACUUM t RETAIN n HOURS
  *   DELETE FROM t WHERE <cond>
  *   UPDATE t SET a = <expr> [, b = <expr> ...] WHERE <cond>
  *   RESTORE TABLE t TO VERSION AS OF n
  *   MERGE INTO t USING <view | (subquery)> ON (k1 [, k2 ...])
  *   DESCRIBE HISTORY t
  *   SELECT ... FROM t [VERSION AS OF n | TIMESTAMP AS OF 'yyyy-MM-dd HH:mm:ss'] ...
  *
  * Everything below the verb line is the engine's existing machinery —
  * conditions and SET expressions parse through Catalyst's `expr()`, so
  * the full SQL expression language applies; SELECT statements rewrite
  * time-travel clauses to pinned temp views and then delegate verbatim to
  * `spark.sql` (same optimizer, same pushdown). DML verbs return a one-row
  * DataFrame (verb, table, version) for observability.
  *
  * The catalog is an explicit name → table-directory map: at 100 TB the
  * table registry is owned by the platform (a metastore); this layer only
  * needs the resolution, not the storage.
  */
object TableSql {

  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+(\w+)\s*(?:ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?\s*(?:TARGET\s+(\d+)\s+FILES)?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+(\w+)\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS)\s*;?\s*$""".r
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+TABLE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  // whole-row MERGE (the engine's commitMerge semantics): the source is a
  // registered temp view or any parenthesized subquery; ON lists the key
  // column(s) — arbitrary ON predicates are not equi-key merges and are
  // refused by omission
  private val MergeRe =
    """(?is)^\s*MERGE\s+INTO\s+(\w+)\s+USING\s+(\w+|\(.+\))\s+ON\s*\(\s*([\w\s,]+)\s*\)\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*$""".r
  private val TravelV  = """(?i)\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private val TravelTs = """(?i)\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r

  /** Default OPTIMIZE target when no TARGET clause is given. */
  val DefaultOptimizeFiles = 8

  def execute(spark: SparkSession, tables: Map[String, String],
      sql: String): DataFrame = {
    def dirOf(t: String): String = tables.getOrElse(t,
      sys.error(s"TableSql: unknown table `$t` (catalog: ${tables.keys.toSeq.sorted.mkString(", ")})"))
    def done(verb: String, t: String, v: Long): DataFrame = {
      import spark.implicits._
      Seq((verb, t, v)).toDF("verb", "table", "version")
    }
    sql match {
      case OptimizeRe(t, a, b, n) =>
        val target = Option(n).map(_.toInt).getOrElse(DefaultOptimizeFiles)
        val z      = (Option(a), Option(b)) match {
          case (Some(x), Some(y)) => Some((x, y))
          case _                  => None
        }
        done("OPTIMIZE", t,
          VersionedTable.commitCompact(spark, dirOf(t), target, zOrderBy = z))
      case VacuumRe(t, n, unit) =>
        val dropped =
          if (unit.equalsIgnoreCase("VERSIONS"))
            VersionedTable.vacuum(spark, dirOf(t), retainLast = n.toInt)
          else
            VersionedTable.vacuumOlderThan(spark, dirOf(t),
              olderThanMs = n.toLong * 3600000L)
        done("VACUUM", t, dropped.size.toLong)
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
      case HistoryRe(t) =>
        VersionedTable.history(spark, dirOf(t))
      case MergeRe(t, src, keys) =>
        val source =
          if (src.startsWith("(")) spark.sql(src.stripPrefix("(").stripSuffix(")"))
          else spark.table(src)
        val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        done("MERGE", t,
          VersionedTable.commitMerge(spark, dirOf(t), source, keyCols))
      case _ =>
        // SELECT path: pin time-travel clauses to temp views, register the
        // catalog's tables (latest) as plain views, delegate to spark.sql
        var text = sql
        TravelV.findAllMatchIn(sql).toSeq.foreach { m =>
          val (t, v) = (m.group(1), m.group(2).toLong)
          if (tables.contains(t)) {
            val view = s"${t}__v$v"
            VersionedTable.read(spark, dirOf(t), Some(v)).createOrReplaceTempView(view)
            text = text.replace(m.matched, view)
          }
        }
        TravelTs.findAllMatchIn(sql).toSeq.foreach { m =>
          val (t, ts) = (m.group(1), m.group(2))
          if (tables.contains(t)) {
            val ms   = java.sql.Timestamp.valueOf(ts).getTime
            val v    = VersionedTable.versionAsOf(dirOf(t), ms)
            val view = s"${t}__ts$v"
            VersionedTable.read(spark, dirOf(t), Some(v)).createOrReplaceTempView(view)
            text = text.replace(m.matched, view)
          }
        }
        tables.foreach { case (t, dir) =>
          if (text.matches(s"(?is).*\\b$t\\b.*"))
            VersionedTable.read(spark, dir).createOrReplaceTempView(t)
        }
        spark.sql(text)
    }
  }

  /** Split on top-level commas only (SET expressions may nest commas in
    * function calls or CASE arms). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb  = new StringBuilder
    var d   = 0
    s.foreach {
      case '(' => d += 1; sb += '('
      case ')' => d -= 1; sb += ')'
      case ',' if d == 0 => out += sb.toString; sb.clear()
      case c   => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

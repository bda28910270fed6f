package graft.plans

import graft.catalog.GraftCatalog
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Delegating SQL parser making the maintenance verbs native statements —
  * `spark.sql("OPTIMIZE graft.t ZORDER BY (k)")`, `VACUUM graft.t RETAIN
  * 48 HOURS [DRY RUN]`, `RESTORE TABLE graft.t TO VERSION AS OF 3` — the
  * same mechanism Delta's SQL extensions use (their parser intercepts
  * OPTIMIZE/VACUUM before delegating). Interception is head-token scoped:
  * no valid Spark statement begins with these verbs (Spark's own parser
  * throws on them), so nothing Spark can parse is ever shadowed, and only
  * catalog-qualified `<cat>.<name>` references where `<cat>` names a
  * [[GraftCatalog]] plugin (or is the conventional `graft`) are claimed —
  * anything else delegates and fails with Spark's own error. The claimed
  * statement
  * routes onto [[graft.tables.TableSql]]'s verb grammar (one
  * deterministic head substitution `graft.name` → `name`, never
  * content-based rewriting), which commits through the protocol.
  */
class GraftSqlParser(session: org.apache.spark.sql.SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  /** The session's catalog plugin registered under `cat`, when it is a
    * GraftCatalog — the claiming condition: a verb on `other.t` where
    * `other` is some non-graft catalog delegates (and fails with Spark's
    * own error), never errors here. */
  private def graftPlugin(cat: String): Option[GraftCatalog] =
    org.apache.spark.sql.graft.PlanBridge.catalogPlugin(session, cat)
      .collect { case g: GraftCatalog => g }

  /** Whether `cat.<name>` statements belong to this parser: the catalog
    * ident resolves to a GraftCatalog plugin, or is the conventional
    * `graft` name (usable through the process registry even before any
    * plugin is configured). */
  private def claims(cat: String): Boolean =
    cat.equalsIgnoreCase("graft") || graftPlugin(cat).isDefined

  /** Resolve a claimed table like the catalog does: the process registry,
    * then the catalog instance's warehouse mapping (a restarted process
    * has an empty registry but a fully resolvable warehouse table — every
    * other statement would work there, so must the maintenance verbs). */
  private def resolveDir(cat: String, name: String): Option[String] =
    GraftCatalog.resolve(name).orElse(
      graftPlugin(cat)
        .flatMap(_.warehouseDir(name))
        .filter(d => graft.tables.VersionedTable.latestVersion(d).isDefined))

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case ConvRe(cat, name, src) if claims(cat) =>
      // CONVERT creates the table, so resolution skips the committed-
      // version filter the other verbs need: the registry, else the
      // warehouse placement (exactly createTable's dirOf)
      val dir = GraftCatalog.resolve(name).orElse(
        graftPlugin(cat).flatMap(_.warehouseDir(name))).getOrElse(sys.error(
        s"graft: CONVERT cannot place table `$cat.$name` — register it " +
          s"(GraftCatalog.register) or configure spark.sql.catalog.$cat.warehouse"))
      GraftVerbCommand("CONVERT", name, dir,
        s"CONVERT TO GRAFT $name FROM '$src'", verbOutput())
    case DescRe(what, cat, name) if claims(cat) =>
      resolveDir(cat, name) match {
        case Some(dir) =>
          val whatU = what.toUpperCase(java.util.Locale.ROOT)
          GraftVerbCommand(s"DESCRIBE $whatU", name, dir,
            s"DESCRIBE $whatU $name",
            if (whatU == "HISTORY") historyOutput() else detailOutput())
        case None => sys.error(
          s"graft: DESCRIBE $what references unknown table `$cat.$name` — " +
            "register it (GraftCatalog.register) or create it through the " +
            "catalog first")
      }
    case HeadRe(verb, cat, name, rest) if claims(cat) =>
      resolveDir(cat, name) match {
        case Some(dir) =>
          // canonical verb-grammar spelling: OPTIMIZE/VACUUM take a bare
          // name, RESTORE takes `RESTORE TABLE` — the claimed statement may
          // carry either spelling (Delta accepts both)
          val head =
            if (verb.equalsIgnoreCase("RESTORE")) s"RESTORE TABLE $name"
            else s"${verb.toUpperCase(java.util.Locale.ROOT)} $name"
          val bare = s"$head $rest".trim
          // dry-ness comes from TableSql's OWN vacuum grammar over the bare
          // statement this command will execute — a `DRY RUN` inside a
          // leading comment (consumed above by Lead) or any other stray
          // mention can no longer flip the declared output shape
          val dry  = verb.equalsIgnoreCase("VACUUM") &&
            graft.tables.TableSql.isDryRunVacuum(bare)
          GraftVerbCommand(verb.toUpperCase(java.util.Locale.ROOT),
            name, dir, bare,
            if (dry) pathOutput() else verbOutput())
        case None => sys.error(
          s"graft: $verb references unknown table `$cat.$name` — register it " +
            "(GraftCatalog.register) or create it through the catalog first")
      }
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // head-token + catalog-qualified table: the only statements claimed —
  // and only when the catalog ident actually names a GraftCatalog (the
  // `claims` guard), so a GraftCatalog registered under any name gets the
  // same SQL surface and a foreign catalog's tables are never shadowed.
  // DESCRIBE HISTORY|DETAIL is likewise unambiguous — Spark's DESCRIBE
  // grammar would read HISTORY/DETAIL as a table name, never followed by
  // another identifier, so no valid Spark statement is shadowed. Leading
  // whitespace and SQL comments are skipped so a commented statement still
  // finds its head token (Spark's own parser tolerates them too).
  private val Lead = """(?:\s|--[^\n]*(?:\n|$)|/\*[\s\S]*?\*/)*"""
  private val HeadRe =
    ("""(?is)^""" + Lead + """(OPTIMIZE|VACUUM|RESTORE)\s+(?:TABLE\s+)?(\w+)\.(\w+)\b(.*)$""").r
  private val DescRe =
    ("""(?is)^""" + Lead + """DESC(?:RIBE)?\s+(HISTORY|DETAIL)\s+(\w+)\.(\w+)\s*;?\s*$""").r
  // `CONVERT TO GRAFT cat.t FROM '<parquet dir>'` — no valid Spark
  // statement begins with CONVERT, so the claim shadows nothing
  private val ConvRe =
    ("""(?is)^""" + Lead + """CONVERT\s+TO\s+GRAFT\s+(\w+)\.(\w+)\s+FROM\s+'([^']+)'\s*;?\s*$""").r

  private def verbOutput(): Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  private def pathOutput(): Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)())

  // mirrors of VersionedTable.history / .detail result shapes — the exec
  // re-checks field-by-field at run time, so drift fails loudly there
  private def historyOutput(): Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", org.apache.spark.sql.types.TimestampType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("data_change", org.apache.spark.sql.types.BooleanType, nullable = false)(),
    AttributeReference("retained", org.apache.spark.sql.types.BooleanType, nullable = false)())

  private def detailOutput(): Seq[Attribute] = Seq(
    AttributeReference("location", StringType)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("last_modified", org.apache.spark.sql.types.TimestampType)(),
    AttributeReference("num_commits", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_deletion_vectors", LongType, nullable = false)(),
    AttributeReference("key_columns", StringType)(),
    AttributeReference("num_constraints", LongType, nullable = false)(),
    AttributeReference("column_mapping", org.apache.spark.sql.types.BooleanType, nullable = false)(),
    AttributeReference("schema_retirements", org.apache.spark.sql.types.BooleanType, nullable = false)())
}

/** Parsed maintenance verb on a versioned table: executed by
  * [[GraftRowLevelStrategy]] through [[graft.tables.TableSql]]'s grammar. */
case class GraftVerbCommand(verb: String, name: String, dir: String,
    text: String, override val output: Seq[Attribute])
    extends LeafNode with Command

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions with the
  * function registry (activated via
  * `spark.sql.extensions=graft.plans.GraftExtensions`, which
  * `GraftSession.configure` sets). After registration the expressions are
  * callable from SQL and from `functions.call_function` — they resolve and
  * codegen like built-ins, with no UDF boundary.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // versioned-table reads resolved through the catalog / format("graft")
    // substitute their full V1 scan plan at analysis time (see
    // [[graft.catalog.GraftTableResolution]])
    ext.injectResolutionRule(session =>
      graft.catalog.GraftTableResolution(session))
    // UPDATE / MERGE INTO on catalog-resolved versioned tables plan onto
    // the commit protocol (Spark's BasicOperators refuses them otherwise)
    ext.injectPlannerStrategy(session => GraftRowLevelStrategy(session))
    // OPTIMIZE / VACUUM / RESTORE as native statements (head-token-scoped
    // delegating parser, the Delta SQL-extension mechanism)
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    // hidden day-partition pruning: ts-range predicates over PARTITIONED
    // BY (days(ts)) tables derive p_day directory-pruning bounds
    ext.injectOptimizerRule(session => DayPartitionPruning(session))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(arrayA, arrayB)")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_est"),
      new ExpressionInfo(classOf[MinHashAgreement].getName, "graft_minhash_est"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_minhash_est(sigA, sigB)")
        MinHashAgreement(children.head, children(1))
      }))
  }
}

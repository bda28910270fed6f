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
    // WindowExec's blanket "No Partition Defined" warning is quieted here
    // (after Spark's logging has initialized — a builder-time Configurator
    // call is wiped by Logging's own re-init): the engine carries exactly
    // FOUR audited global windows, every one frame-bounded in code
    // (withDictIndex's cardinality tripwire + withDictIndexLarge escape,
    // Clustering.fitCore's post-LIMIT(k) seed rank, q_rrf_fusion's two
    // post-LIMIT(100) leg ranks), so the warning carried no signal and
    // flooded every Verify/test log. Re-run the r19 audit before adding
    // any new global window.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
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

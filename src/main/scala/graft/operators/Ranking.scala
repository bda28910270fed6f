package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation metrics — the measurement half of the
  * similarity/ANN stack (an index you can't score is an index you can't
  * tune). Per query: precision@k, recall@k, reciprocal rank, and average
  * precision@k, over a (qid, rank, item) results relation and a
  * (qid, item) relevance relation.
  *
  * Exactness discipline: AP is a sum of per-rank precisions hits_r/r —
  * a FLOAT fold over varying denominators whose partial-aggregation
  * order Spark does not fix. Every term is therefore scaled by
  * L = lcm(1..k): hits_r·(L/r) is an exact integer, the sum is
  * order-free integer addition, and AP = Σ / (L·min(|rel|, k)) divides
  * once at the end — bit-identical on any partitioning AND in DuckDB
  * (the SURVEY §5 exact-aggregation rule). k ≤ 30 keeps the summed
  * numerator ≤ k²·lcm(1..30) ≈ 2·10¹⁵, three orders under Long.Max.
  *
  * Scale shape (100 TB): one rank-window pass over results truncated to
  * rank ≤ k (≤ k rows per query shuffle), relevance attaches by
  * (qid, item) equi-join, truth sizes by a (qid) count — all skinny keys,
  * no payloads.
  */
object Ranking {

  private def lcm(a: Long, b: Long): Long = {
    @annotation.tailrec
    def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)
    a / gcd(a, b) * b
  }

  /** Per-query metrics: (qid, n_rel, n_hits, p_at_k, r_at_k, rr, ap).
    * Queries present in `results` but with no relevant items at all are
    * excluded (metrics are undefined without a truth set); relevant items
    * never retrieved still count through n_rel (recall denominators), and
    * a query whose retrieved rows all sit past rank k earns ZERO metrics
    * rather than vanishing. Duplicate ranks or duplicate retrieved items
    * refuse loudly — they would make AP frame-dependent / recall > 1. */
  def metricsAtK(
      results: DataFrame, // (qidCol, rankCol, itemCol) — rank 1-based
      truth: DataFrame,   // (qidCol, itemCol)
      qidCol: String, rankCol: String, itemCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 30, s"k in [1,30] (lcm overflow bound), got $k")
    val L = (1 to k).foldLeft(1L)((acc, i) => lcm(acc, i.toLong))
    // two consumers (truth sizes + the relevance join) — materialize the
    // skinny distinct pair set once instead of re-running truth's lineage
    val rel = truth.select(col(qidCol).as("qid"), col(itemCol).as("item")).distinct()
      .localCheckpoint(true)
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val resAll = results.select(
      col(qidCol).as("qid"), col(rankCol).cast("long").as("rank"), col(itemCol).as("item"))
    val top = resAll
      .where(col("rank").between(1, k))
      .join(rel.withColumn("__rel", lit(1L)), Seq("qid", "item"), "left_outer")
      .withColumn("rel", coalesce(col("__rel"), lit(0L)))
      // EXACTNESS GUARDS (in-plan, k-bounded frames): a tied rank makes
      // the running-hits window RANGE-frame-dependent (AP could exceed 1
      // and disagree across engines), and a duplicate retrieved item
      // double-counts n_hits (recall above 1) — both refuse loudly
      .withColumn("rel",
        when(count(lit(1)).over(Window.partitionBy("qid", "rank")) > 1,
          raise_error(concat(lit("metricsAtK: duplicate rank for qid "),
            col("qid").cast("string"),
            lit(" — ranks must be unique per query (ties make AP frame-dependent)"))))
        .when(count(lit(1)).over(Window.partitionBy("qid", "item")) > 1,
          raise_error(concat(lit("metricsAtK: item retrieved at two ranks for qid "),
            col("qid").cast("string"), lit(" — dedupe the result list first"))))
        .otherwise(col("rel")))
    val w = Window.partitionBy("qid").orderBy("rank")
    val scored = top
      .withColumn("hits_r", sum(col("rel")).over(w))
      // exact integer AP term: rel·hits_r·(L/r) — L/r is exact by L's
      // construction, products bounded by k·L
      .withColumn("ap_term", col("rel") * col("hits_r") * (lit(L) / col("rank")).cast("long"))
    val agg = scored.groupBy("qid")
      .agg(
        sum(col("rel")).as("n_hits"),
        sum(col("ap_term")).as("ap_num"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel"))
    // domain = queries WITH a truth set that appear in `results` — a query
    // whose retrieved rows all sit past rank k earns ZERO metrics (an
    // inner join used to DROP it, silently inflating any mean over the
    // output by excluding exactly the worst performers)
    val inResults = nRel.join(resAll.select("qid").distinct(), Seq("qid"), "left_semi")
    agg.join(inResults, Seq("qid"), "right_outer")
      .select(
        col("qid"),
        col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / k, 6).as("p_at_k"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_rel").cast("double"), 6).as("r_at_k"),
        round(coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0)), 6).as("rr"),
        round(coalesce(col("ap_num"), lit(0L)).cast("double")
          / (least(col("n_rel"), lit(k.toLong)) * L).cast("double"), 6).as("ap"))
  }
}

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
    * never retrieved still count through n_rel (recall denominators). */
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
    val top = results.select(
        col(qidCol).as("qid"), col(rankCol).cast("long").as("rank"), col(itemCol).as("item"))
      .where(col("rank").between(1, k))
      .join(rel.withColumn("__rel", lit(1L)), Seq("qid", "item"), "left_outer")
      .withColumn("rel", coalesce(col("__rel"), lit(0L)))
    val w = Window.partitionBy("qid").orderBy("rank")
    val scored = top
      .withColumn("hits_r", sum(col("rel")).over(w))
      // exact integer AP term: rel·hits_r·(L/r) — L/r is exact by L's
      // construction, products bounded by k·L
      .withColumn("ap_term", col("rel") * col("hits_r") * (lit(L) / col("rank")).cast("long"))
    scored.groupBy("qid")
      .agg(
        sum(col("rel")).as("n_hits"),
        sum(col("ap_term")).as("ap_num"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel"))
      .join(nRel, Seq("qid"))
      .select(
        col("qid"),
        col("n_rel"),
        col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("p_at_k"),
        round(col("n_hits").cast("double") / col("n_rel").cast("double"), 6).as("r_at_k"),
        round(coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0)), 6).as("rr"),
        round(col("ap_num").cast("double")
          / (least(col("n_rel"), lit(k.toLong)) * L).cast("double"), 6).as("ap"))
  }
}

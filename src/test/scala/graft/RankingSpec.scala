package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {

  test("metricsAtK: hand-computed P/R/RR/AP on a known example") {
    import spark.implicits._
    val results = Seq(
      (1L, 1L, "a"), (1L, 2L, "x"), (1L, 3L, "b"), (1L, 4L, "y"), (1L, 5L, "z"),
      (2L, 1L, "p"), (2L, 2L, "q"), (2L, 3L, "r"), (2L, 4L, "s"), (2L, 5L, "t")
    ).toDF("qid", "rank", "item")
    val truth = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "m")).toDF("qid", "item")
    val m = Ranking.metricsAtK(results, truth, "qid", "rank", "item", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // qid 1: hits a@1, b@3 -> P@5=0.4, R=2/3, RR=1, AP=(1/1 + 2/3)/3 = 5/9
    assert(m(1L) == ((3L, 2L, 0.4, 0.666667, 1.0, 0.555556)), m(1L).toString)
    // qid 2: no relevant retrieved -> zeros, but n_rel counts
    assert(m(2L) == ((1L, 0L, 0.0, 0.0, 0.0, 0.0)), m(2L).toString)
  }

  test("metricsAtK: invariant to partitioning (exact integer AP terms)") {
    import spark.implicits._
    val results = (1 to 50).flatMap(q => (1 to 10).map(r => (q.toLong, r.toLong, s"i${(q * 7 + r * 3) % 23}")))
      .toDF("qid", "rank", "item")
    val truth = (1 to 50).flatMap(q => Seq((q.toLong, s"i${q % 23}"), (q.toLong, s"i${(q + 5) % 23}")))
      .toDF("qid", "item")
    val a = Ranking.metricsAtK(results, truth, "qid", "rank", "item", k = 10)
      .collect().map(_.toSeq).toSet
    val b = Ranking.metricsAtK(results.repartition(13), truth.repartition(7), "qid", "rank", "item", k = 10)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}

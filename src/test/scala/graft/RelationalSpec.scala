package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("withDictIndex assigns 0-based lexicographic ranks (A4 semantics)") {
    import spark.implicits._
    val df  = Seq("tulips", "daisy", "roses", "daisy", "tulips").toDF("label")
    val out = Relational.withDictIndex(df, "label", "idx")
      .select("label", "idx").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("daisy" -> 0L, "roses" -> 1L, "tulips" -> 2L))
  }

  test("withDictIndex keeps null-label rows with a null index") {
    import spark.implicits._
    val df = Seq(Some("b"), None, Some("a"), Some("b")).toDF("label")
    val out = Relational.withDictIndex(df, "label", "idx")
    assert(out.count() == 4)
    val nullRow = out.where(col("label").isNull).collect()
    assert(nullRow.length == 1 && nullRow.head.isNullAt(1))
    assert(out.where(col("label") === "a").head().getLong(1) == 0L)
  }

  test("withDictIndex preserves row count (re-attach join is 1:1)") {
    val docs = Tables.load(spark, sfDir, "documents")
    assert(Relational.withDictIndex(docs, "lang", "idx").count() == docs.count())
  }

  test("topK returns exactly k rows in order") {
    val orders = Tables.load(spark, sfDir, "orders")
    val top    = Relational.topK(orders, 5, col("o_totalprice").desc, col("o_orderkey")).collect()
    assert(top.length == 5)
    val prices = top.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("unionEvolved null-fills missing columns on both sides") {
    import spark.implicits._
    val a   = Seq((1L, "x")).toDF("id", "name")
    val b   = Seq((2L, 3.5)).toDF("id", "price")
    val out = Relational.unionEvolved(a, b)
    assert(out.columns.toSet == Set("id", "name", "price"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 3.5)
  }

  test("hashSplitTag is deterministic, complete, and near the target ratio") {
    val docs = Tables.load(spark, sfDir, "documents")
    val tagged = docs.select(col("doc_id"), Relational.hashSplitTag(col("doc_id"), 80).as("split"))
    val counts = tagged.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == docs.count())
    val trainFrac = counts("train").toDouble / docs.count()
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // same id → same split, always
    val again = docs.select(col("doc_id"), Relational.hashSplitTag(col("doc_id"), 80).as("split"))
    assert(tagged.except(again).count() == 0)
  }

  test("seededSplit is disjoint, complete, and reproducible (L3 self-check)") {
    val li           = Tables.load(spark, sfDir, "lineitem")
    val n            = li.count()
    val Array(a, b)  = Relational.seededSplit(li, Array(0.6, 0.4), 7L)
    val Array(a2, _) = Relational.seededSplit(li, Array(0.6, 0.4), 7L)
    assert(a.count() + b.count() == n)
    assert(a.count() == a2.count())
    assert(a.intersect(b).count() == 0)
  }
}

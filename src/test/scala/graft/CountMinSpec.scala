package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private def keysDf(counts: Map[String, Int]) = {
    import spark.implicits._
    counts.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
      .repartition(7) // arbitrary physical layout: results must not care
  }

  test("one-sided error: estimate >= true count, always") {
    import spark.implicits._
    val counts = (1 to 200).map(i => s"key$i" -> (1 + i % 17)).toMap
    val df = keysDf(counts)
    val sk = CountMin.build(df, "k", depth = 4, width = 64) // tight: forces collisions
    val est = df.distinct()
      .select(col("k"), sk.estimateCol(col("k")).as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: estimate ${est(k)} below true $n — CMS must overestimate")
    }
    assert(sk.total == counts.values.sum)
  }

  test("merge of disjoint builds is bit-identical to the single build") {
    val counts = (1 to 100).map(i => s"w$i" -> i).toMap
    val df = keysDf(counts)
    val whole = CountMin.build(df, "k", depth = 5, width = 128)
    val a = CountMin.build(df.where(length(col("k")) <= 2), "k", 5, 128)
    val b = CountMin.build(df.where(length(col("k")) > 2), "k", 5, 128)
    val merged = a.merge(b)
    assert(merged.cells.sameElements(whole.cells) && merged.total == whole.total)
    intercept[IllegalArgumentException] {
      a.merge(CountMin.build(df, "k", 5, 64))
    }
  }

  test("heavyKeys: sketch-prune + exact-confirm equals plain GROUP BY HAVING") {
    import spark.implicits._
    val counts = (1 to 300).map(i => s"t$i" -> (if (i % 29 == 0) 40 + i else 1 + i % 5)).toMap
    val df = keysDf(counts)
    val got = CountMin.heavyKeys(df, "k", threshold = 30, depth = 4, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = counts.filter(_._2 >= 30)
    assert(got == want, s"got ${got.size} heavies, want ${want.size}")
  }

  test("null keys are excluded; weighted build sums the weight column") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("k")
    val sk = CountMin.build(df, "k", 4, 32)
    assert(sk.total == 3L, "null keys must not count")
    val wdf = Seq(("a", 10L), ("a", 5L), ("b", 2L)).toDF("k", "w")
    val wsk = CountMin.build(wdf, "k", 4, 32, weight = col("w"))
    val est = wdf.select(col("k"), wsk.estimateCol(col("k")).as("e"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 15L && est("b") >= 2L && wsk.total == 17L)
  }
}

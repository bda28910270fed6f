package graft

import java.nio.file.Files

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {

  // rank tolerance: KLL k=200 guarantees ±1.65% @99%; allow slack for the
  // randomized compaction plus empirical-CDF discretization at small n
  private val RankTol = 0.04

  private def events = spark.read.parquet(s"$sfDir/events.parquet")
    .where(col("value").isNotNull)

  /** empirical inclusive rank of `v` within group values */
  private def exactRanks(q: org.apache.spark.sql.DataFrame, rankCols: Seq[(String, Double)]) = {
    val j = events.join(broadcast(q), "event_type")
    val aggs = rankCols.map { case (c, _) =>
      avg((col("value").cast("double") <= col(c)).cast("double")).as(s"r_$c")
    }
    j.groupBy("event_type").agg(aggs.head, aggs.tail: _*).collect().map { r =>
      r.getString(0) -> rankCols.indices.map(i => r.getDouble(1 + i))
    }.toMap
  }

  test("sketch quantiles land within rank tolerance of the exact distribution") {
    val sk = Quantiles.quantileSketches(events, Seq("event_type"), "value")
    val q = Quantiles.sketchQuantiles(sk, Seq("event_type"), Seq(0.1, 0.5, 0.9))
    // n is EXACT (KLL tracks stream length exactly)
    val exactN = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.select("event_type", "n").collect().foreach { r =>
      assert(exactN(r.getString(0)) == r.getLong(1), s"n mismatch for ${r.getString(0)}")
    }
    val ranks = exactRanks(q, Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
    ranks.foreach { case (g, rs) =>
      Seq(0.1, 0.5, 0.9).zip(rs).foreach { case (want, got) =>
        assert(math.abs(got - want) <= RankTol,
          f"group $g: rank of p${(want * 100).toInt} value is $got%.4f, want $want ± $RankTol")
      }
    }
  }

  test("build + persist + union round-trip: merged parts answer like the whole") {
    val ev = events.withColumn("part", pmod(col("event_id"), lit(4L)).cast("int"))
    val parts = Quantiles.quantileSketches(ev, Seq("event_type", "part"), "value")
    assert(parts.schema("sketch").dataType.typeName == "binary")
    // persist the sketch bytes like any column, read back, merge coarser
    val dir = Files.createTempDirectory("graft_kll").toString + "/s"
    parts.write.parquet(dir)
    val back = spark.read.parquet(dir)
    val merged = Quantiles.mergeSketches(back, Seq("event_type"))
    assert(merged.groupBy("event_type").count().where(col("count") > 1).count() == 0,
      "one sketch per group after merge")
    val q = Quantiles.sketchQuantiles(merged, Seq("event_type"), Seq(0.5, 0.99))
    // merged-of-parts keeps the rank contract vs the EXACT distribution
    val ranks = exactRanks(q, Seq("p50" -> 0.5, "p99" -> 0.99))
    ranks.foreach { case (g, rs) =>
      assert(math.abs(rs(0) - 0.5) <= RankTol, f"group $g p50 rank ${rs(0)}%.4f")
      assert(math.abs(rs(1) - 0.99) <= RankTol, f"group $g p99 rank ${rs(1)}%.4f")
    }
    // exact n survives the split/persist/merge round-trip
    val exactN = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.select("event_type", "n").collect().foreach { r =>
      assert(exactN(r.getString(0)) == r.getLong(1))
    }
  }

  test("nulls are skipped and degenerate ranks fail loudly") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0), Some(2.0)).map(("g", _)).toDF("g", "v")
    val q = Quantiles.sketchQuantiles(
      Quantiles.quantileSketches(df, Seq("g"), "v"), Seq("g"), Seq(0.5))
    val row = q.head()
    assert(row.getLong(1) == 3L, "null must not count toward n")
    assert(row.getDouble(2) == 2.0, "exact median of a 3-value stream (no compaction at n=3)")
    intercept[IllegalArgumentException] {
      Quantiles.sketchQuantiles(q, Seq("g"), Seq(1.5))
    }
  }
}

package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  private val H = 3600L * 1000000000L

  test("resampleFill: gaps generated, forward-filled; null-value buckets fill from prior") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L * H + 5L, Some(5.0)),          // bucket 0
      (1L, 2L * H + 9L, None: Option[Double]), // bucket 2: event with null value
      (1L, 3L * H + 1L, Some(7.0)),          // bucket 3
      (2L, 10L * H, Some(1.0))               // single-bucket key
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleFill(df, "user_id", "ts", "value", H)
      .orderBy("key", "bucket_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1) / H, if (r.isNullAt(2)) null else r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 5.0, 0L),
      (1L, 1L, 5.0, 1L), // generated gap, filled
      (1L, 2L, 5.0, 0L), // event present but null value: fills, not a gap
      (1L, 3L, 7.0, 0L),
      (2L, 10L, 1.0, 0L)))
  }

  test("resampleFill: in-bucket winner is latest ts, ties to larger value; pre-epoch floors") {
    import spark.implicits._
    val df = Seq(
      (1L, 100L, 1.0), (1L, 200L, 9.0),       // same bucket: ts 200 wins
      (3L, -1L, 4.0)                           // pre-epoch: floor -> bucket -1
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleFill(df, "user_id", "ts", "value", H)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 0L, 9.0), (3L, -H, 4.0)), out.toString)
  }

  test("resampleFill: span guard fails loudly on a detonating interval") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1.0), (1L, H * 400L, 2.0)).toDF("user_id", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.resampleFill(df, "user_id", "ts", "value", H, maxBucketsPerKey = 100)
    }
    assert(e.getMessage.contains("widen the interval"), e.getMessage)
  }
}

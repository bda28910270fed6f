package graft

import graft.operators.GroupedMap
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class GroupedMapSpec extends SparkSpec {

  test("flatMapGroupsRows matches the relational window equivalent (A5)") {
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "event_type", "value")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value_rebased", DoubleType)))
    val grouped = GroupedMap.flatMapGroupsRows(ev, "event_type", schema) { (key, it) =>
      val rows = it.toArray
      val mn   = rows.iterator.map(_.getDouble(2)).min
      rows.iterator.map(r => Row(r.getLong(0), key, r.getDouble(2) - mn))
    }.orderBy("event_id").collect()

    val windowed = ev.select(col("event_id"), col("event_type"),
      (col("value") - min("value").over(Window.partitionBy("event_type"))).as("value_rebased"))
      .orderBy("event_id").collect()

    assert(grouped.sameElements(windowed))
  }

  test("grouped-map can change cardinality (emit one summary row per group)") {
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "event_type", "value")
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("n", LongType)))
    val out = GroupedMap.flatMapGroupsRows(ev, "event_type", schema) { (key, it) =>
      Iterator.single(Row(key, it.size.toLong))
    }.collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).sum == ev.count())
  }
}

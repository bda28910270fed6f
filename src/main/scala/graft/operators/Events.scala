package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream product analytics over the engine's epoch-nanos contract —
  * the two queries every events pipeline grows first: ordered funnels and
  * cohort retention. Both are pure relational compositions (skinny
  * (user, ts) shuffles, no per-user state collection), so they scale the
  * same way the dedup family does: wire cost is keys, never payloads.
  */
object Events {

  /** Ordered funnel: for each user who performed `steps.head`, the
    * earliest time of each subsequent step that happens AT OR AFTER the
    * previous step's earliest time — the strict-progression funnel
    * (a click before the first view does not count as funnel progress).
    * Output: (userCol, t1 … tN) with nulls from the first unreached step
    * onward. Funnel conversion counts are one aggregation over this frame.
    *
    * Plan shape: one skinny (user, min-ts) aggregation per step plus a
    * user-key join against the accumulated frame — N-1 joins of
    * per-user 1-row frames, no window, no event-list collection; at
    * 100 TB every stage carries (user, ts) only. */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.length == steps.length, s"duplicate funnel steps: $steps")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    var i = 1
    while (i < steps.length) {
      val prev = s"t$i"
      val cur  = s"t${i + 1}"
      val next = events.where(col(typeCol) === steps(i))
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .where(col(tsCol) >= col(prev)) // null prev (unreached) drops here
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc = acc.join(next, Seq(userCol), "left_outer")
      i += 1
    }
    acc
  }

  /** Rolling active users: for every day, the count of DISTINCT users
    * active within the trailing `windowDays`-day window (WAU at 7, MAU at
    * 30). Scalable form: collapse to distinct (user, day) grains first,
    * then each grain CONTRIBUTES to its next `windowDays` window days via
    * a bounded map-side explode — no day-range self-join, no window over
    * a global sort; the only shuffle is the final (window_day, user)
    * count-distinct. Output: (day, n_users) restricted to days the data
    * actually spans. */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val DayNs = 86400L * 1000000000L
    val days = events.select(col(userCol),
        expr(s"`$tsCol` div ${DayNs}L").as("day"))
      .where(col(userCol).isNotNull)
      .distinct()
    val bounds = days.agg(max("day").as("__hi"))
    days
      .select(col(userCol),
        explode(sequence(col("day"), col("day") + (windowDays - 1))).as("w_day"))
      .crossJoin(broadcast(bounds)) // 1 row: keep only real days, in-plan
      .where(col("w_day") <= col("__hi"))
      .groupBy(col("w_day").as("day"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Cohort retention: cohort = the UTC day index of a user's first
    * activity; for every (cohort, day offset ≥ 0) the count of distinct
    * cohort users active that day. The standard triangular retention
    * matrix, as rows. Day indexes are exact integer floor-divisions of
    * the nanos timestamp — engine-replayable, no date parsing.
    *
    * Plan shape: distinct (user, day) first — collapses each user's
    * within-day events map-side before anything joins — then one
    * broadcast-friendly (user, cohort) attach and a skinny count-distinct
    * aggregation. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val DayNs = 86400L * 1000000000L
    // integer `div`, not the Column `/` (double division — epoch-nanos
    // exceed double's 53-bit mantissa; the windowedCounts hazard)
    val days = events.select(col(userCol),
        expr(s"`$tsCol` div ${DayNs}L").as("day"))
      .where(col(userCol).isNotNull)
      .distinct()
    val first = days.groupBy(col(userCol)).agg(min("day").as("cohort"))
    days.join(first, Seq(userCol))
      .select(col(userCol), col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .groupBy("cohort", "day_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}

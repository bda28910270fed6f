package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators beyond the reference's stateless inference:
  * watermarked windowed aggregation and `flatMapGroupsWithState`
  * sessionization — the Structured-Streaming surface a production events
  * pipeline needs (SURVEY.md §7 slice-4 stretch goal).
  */
object Stateful {

  /** Watermarked tumbling-window counts per key over an epoch-nanos event
    * time column (the fixture `events.ts` reads as long nanos under
    * `nanosAsLong`). Works identically on a batch or streaming DataFrame;
    * on streams the watermark bounds state (late data beyond `watermarkDur`
    * is dropped and closed windows are evicted — state stays O(open
    * windows), which is what makes this viable on an unbounded 100 TB/day
    * feed). */
  def windowedCounts(
      events: DataFrame,
      tsNanosCol: String = "ts",
      keyCol: String = "event_type",
      windowDur: String = "1 hour",
      watermarkDur: String = "10 minutes",
      valueCol: Option[String] = Some("value")): DataFrame = {
    // integer division: long/long in the Column DSL is DOUBLE division, and
    // epoch-nanos exceed double's 53-bit mantissa (~256 ns ULP) — an event
    // within that of an hour boundary would land in the wrong window
    val withTime = events.withColumn("event_time",
      timestamp_seconds(expr(s"`$tsNanosCol` div 1000000000")))
    val watermarked =
      if (withTime.isStreaming) withTime.withWatermark("event_time", watermarkDur) else withTime
    // valueCol is validated (and sum_value omitted when absent/None) so a
    // schema without it fails here with a clear message, not at analysis
    val aggs = count(lit(1)).as("n") +: valueCol.toSeq.map { v =>
      require(events.columns.contains(v),
        s"windowedCounts: value column '$v' not in input schema ${events.columns.mkString("[", ",", "]")}; " +
          "pass valueCol=None for count-only windows")
      sum(col(v)).as("sum_value")
    }
    watermarked
      .groupBy(window(col("event_time"), windowDur).as("w"), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("window_start") +: col(keyCol) +: col("n") +:
        valueCol.toSeq.map(_ => col("sum_value")): _*)
  }

  /** Streaming exact deduplication on key columns: on a stream the seen-key
    * state is bounded by the watermark (`dropDuplicatesWithinWatermark`
    * evicts keys older than the horizon — without this, seen-state grows
    * without bound on an unbounded 100 TB/day feed); in batch mode it is a
    * plain `dropDuplicates`. `eventTimeCol` must be a timestamp column. */
  def dedupWithinWatermark(
      df: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      watermarkDur: String = "10 minutes"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(eventTimeCol, watermarkDur).dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)

  /** Stream-stream (or batch) interval equi-join: rows join when the keys
    * match and `rightTimeCol` falls within `[leftTimeCol - gap, leftTimeCol]`
    * — "attach the right-side events from the preceding gap window".
    *
    * On streams BOTH sides are watermarked and the time bound is what lets
    * Structured Streaming evict buffered rows: without it, a stream-stream
    * join must keep every past row forever (unbounded state on an unbounded
    * feed). With it, state per side is O(watermark + gap) of data — the
    * standard production shape for click-attribution joins. In batch mode
    * the same plan is a plain join with a range predicate.
    *
    * Column names must be globally unique across the two sides (rename
    * before calling) so the condition resolves unambiguously. */
  def streamIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      gap: String = "1 hour",
      watermarkDur: String = "10 minutes"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTimeCol, watermarkDur) else left
    val r = if (right.isStreaming) right.withWatermark(rightTimeCol, watermarkDur) else right
    l.join(r,
      col(leftKeyCol) === col(rightKeyCol) &&
        col(rightTimeCol) >= col(leftTimeCol) - expr(s"INTERVAL $gap") &&
        col(rightTimeCol) <= col(leftTimeCol),
      "inner")
  }

  case class SessionEvent(user_id: Long, ts: Long, event_type: String)
  case class TimedSessionEvent(user_id: Long, ts: Long, event_type: String, event_time: java.sql.Timestamp)
  case class Session(user_id: Long, start_ns: Long, end_ns: Long, n_events: Long)

  /** Gap-based sessionization via `flatMapGroupsWithState`: consecutive
    * events of a user separated by more than `gapNanos` start a new session.
    *
    * Batch mode: each group arrives complete in one invocation — every
    * session (including the trailing one) is emitted. Streaming mode: only
    * sessions CLOSED by a later event are emitted; the open trailing
    * session's events stay in `GroupState` and carry across micro-batches,
    * so a session spanning a batch boundary is emitted once, complete. An
    * idle user's open session only closes when that user's next event
    * arrives — use [[sessionizeStream]] for watermark-driven idle flushing.
    * The group is
    * sorted in memory — the per-user event set must fit an executor, the
    * same contract as every grouped-map (A5). */
  def sessionize(events: Dataset[SessionEvent], gapNanos: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionEvent], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[List[SessionEvent]]) =>
          val buffered = state.getOption.getOrElse(Nil) ++ it.toList
          val sorted   = buffered.sortBy(_.ts)
          if (sorted.isEmpty) Iterator.empty
          else {
            // split into segments at gaps; the last segment is the open session
            val segments = scala.collection.mutable.ListBuffer(scala.collection.mutable.ListBuffer(sorted.head))
            sorted.tail.foreach { e =>
              if (e.ts - segments.last.last.ts > gapNanos) segments += scala.collection.mutable.ListBuffer(e)
              else segments.last += e
            }
            def toSession(seg: Seq[SessionEvent]): Session =
              Session(userId, seg.head.ts, seg.last.ts, seg.size.toLong)
            if (streaming) {
              state.update(segments.last.toList) // open session carries over
              segments.init.map(s => toSession(s.toSeq)).iterator
            } else {
              state.update(Nil)
              segments.map(s => toSession(s.toSeq)).iterator
            }
          }
      }
  }

  /** Streaming sessionization WITH idle flush: like [[sessionize]], but the
    * open trailing session also emits once the event-time watermark passes
    * `last event + gap` — an idle user's session closes without needing
    * another event from them. Input is the raw (user_id, ts-nanos,
    * event_type) shape; this wrapper attaches the event-time column,
    * applies the watermark, and registers an `EventTimeTimeout` per group
    * at `last + gap`. State per user is the open session only — bounded. */
  def sessionizeStream(
      events: DataFrame,
      gapNanos: Long,
      watermarkDur: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    require(events.isStreaming, "sessionizeStream is the streaming variant; use sessionize for batch")
    val gapMs = gapNanos / 1000000L
    events
      .withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("event_time", watermarkDur)
      // the watermarked attribute must remain in the stateful operator's
      // input schema — group the timed shape and convert inside the kernel
      .select(col("user_id"), col("ts"), col("event_type"), col("event_time"))
      .as[TimedSessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionEvent], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, timedIt: Iterator[TimedSessionEvent], state: GroupState[List[SessionEvent]]) =>
          val it = timedIt.map(e => SessionEvent(e.user_id, e.ts, e.event_type))
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: flush the open session
            val open = state.getOption.getOrElse(Nil)
            state.remove()
            if (open.isEmpty) Iterator.empty
            else Iterator.single(Session(userId, open.head.ts, open.last.ts, open.size.toLong))
          } else {
            val sorted = (state.getOption.getOrElse(Nil) ++ it.toList).sortBy(_.ts)
            val segments = scala.collection.mutable.ListBuffer(scala.collection.mutable.ListBuffer(sorted.head))
            sorted.tail.foreach { e =>
              if (e.ts - segments.last.last.ts > gapNanos) segments += scala.collection.mutable.ListBuffer(e)
              else segments.last += e
            }
            val closed    = segments.init.map(s => Session(userId, s.head.ts, s.last.ts, s.size.toLong))
            val lastMs    = segments.last.last.ts / 1000000L
            val horizonMs = lastMs + gapMs
            val wmMs      = state.getCurrentWatermarkMs()
            // STRICTLY behind the watermark: an extender needs
            // e.ts <= last + gap, i.e. e_ms <= horizonMs < wmMs — late,
            // dropped, so nothing admissible can extend the session
            if (horizonMs < wmMs) {
              // emit NOW — a deferred timeout only fires after the watermark
              // advances again, which never happens on a source that goes idle
              val open = segments.last
              state.remove()
              (closed :+ Session(userId, open.head.ts, open.last.ts, open.size.toLong)).iterator
            } else {
              // horizonMs == wmMs is deliberately NOT flushed: an on-time
              // event AT the watermark (not late) can still land exactly on
              // the horizon and extend the session (extension test is
              // `<= gap`) — flushing here would split one logical session
              // in two. Park it with a timeout just past the watermark
              // (the API requires timeout > watermark).
              state.update(segments.last.toList)
              state.setTimeoutTimestamp(math.max(horizonMs, wmMs + 1))
              closed.iterator
            }
          }
      }
  }

  /** Convenience: sessionize the fixture events table (ts = epoch nanos). */
  def sessionizeEvents(spark: SparkSession, events: DataFrame, gapNanos: Long): Dataset[Session] = {
    import spark.implicits._
    sessionize(
      events.select(col("user_id"), col("ts"), col("event_type")).as[SessionEvent],
      gapNanos)
  }
}

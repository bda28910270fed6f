package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  private val Day = 86400L * 1000000000L

  test("funnel enforces strict step ordering; unreached steps are null") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: clicks BEFORE its first view — click must not count,
      // the later click does
      (2L, "click", 50L), (2L, "view", 100L), (2L, "click", 150L),
      // user 3: view only
      (3L, "view", 10L),
      // user 4: purchase before click — purchase must not count
      (4L, "view", 10L), (4L, "purchase", 20L), (4L, "click", 30L),
      // user 5: never views → absent from the funnel
      (5L, "click", 10L), (5L, "purchase", 20L))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((Some(100L), Some(200L), Some(300L))))
    assert(out(2L) == ((Some(100L), Some(150L), None)), s"early click leaked: ${out(2L)}")
    assert(out(3L) == ((Some(10L), None, None)))
    assert(out(4L) == ((Some(10L), Some(30L), None)), s"early purchase leaked: ${out(4L)}")
  }

  test("rollingActiveUsers counts each user once per trailing window, clamps to real days") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L), (1L, 0L), (1L, 2L), // user 1 on days 0 (twice) and 2
      (2L, 0L),                     // user 2 on day 0 only
      (3L, 9L))                     // user 3 far later
      .map { case (u, d) => (u, "view", d * Day + 5L) }
      .toDF("user_id", "event_type", "ts")
    val out = Events.rollingActiveUsers(ev, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // trailing-3-day windows: day 0 {1,2}=2, day 1 {1,2}=2, day 2 {1,2,+1@2}=2,
    // day 3 {1@2}=1, day 4 {1@2}=1, days 5-8 empty (absent), day 9 {3}=1
    assert(out == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 9L -> 1L),
      s"got $out")
    assert(!out.keySet.exists(_ > 9L), "windows past the data's last day must clamp")
  }

  test("property: funnel equals a brute-force per-user replay on random event streams") {
    import spark.implicits._
    val steps = Seq("view", "click", "purchase")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val ev = (0 until 300).map { _ =>
        (rnd.nextInt(20).toLong, steps(rnd.nextInt(3)), rnd.nextInt(1000).toLong)
      }
      // driver-side ground truth: strict forward replay over sorted events
      def truth(user: Long): Option[(Long, Option[Long], Option[Long])] = {
        val mine = ev.filter(_._1 == user).sortBy(e => (e._3, e._2))
        def earliest(step: String, atOrAfter: Long): Option[Long] =
          mine.filter(e => e._2 == step && e._3 >= atOrAfter).map(_._3).minOption
        earliest("view", Long.MinValue).map { t1 =>
          val t2 = earliest("click", t1)
          (t1, t2, t2.flatMap(earliest("purchase", _)))
        }
      }
      val got = Events.funnel(ev.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", steps)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
      val want = (0L until 20L).flatMap(u => truth(u).map(u -> _)).toMap
      assert(got == want, s"seed $seed: funnel diverged from brute force")
    }
  }

  test("property: rollingActiveUsers equals the brute-force window count") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      val grains = (0 until 200).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(20).toLong))
      val ev = grains.map { case (u, d) => (u, "e", d * Day + rnd.nextInt(1000)) }
      val got = Events.rollingActiveUsers(ev.toDF("user_id", "event_type", "ts"),
          "user_id", "ts", windowDays = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val maxDay = grains.map(_._2).max
      val want = (0L to maxDay).map { day =>
        day -> grains.collect {
          case (u, d) if d <= day && d > day - 5 => u
        }.distinct.size.toLong
      }.filter(_._2 > 0).toMap
      assert(got == want, s"seed $seed: rolling counts diverged from brute force")
    }
  }

  test("retention: cohort day from first activity, distinct users per offset") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 1L), (1L, 3L), // cohort 0, returns d1 (twice), d3
      (2L, 0L), (2L, 3L),                     // cohort 0, returns d3
      (3L, 1L))                               // cohort 1, never returns
      .map { case (u, d) => (u, "view", d * Day + 7L) }
      .toDF("user_id", "event_type", "ts")
    val out = Events.retention(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 2L,
      (1L, 0L) -> 1L), s"got $out")
  }
}

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

  test("withDictIndexLarge (two-phase rank) matches withDictIndex exactly") {
    // a "vocabulary" big enough to spread over several range partitions
    val words = spark.range(0, 3000)
      .selectExpr("concat('w', lpad(cast(id as string), 5, '0')) AS label",
        "id % 7 AS payload")
    val fast = Relational.withDictIndex(words, "label", "idx")
      .select("label", "idx").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Relational.withDictIndexLarge(words, "label", "idx", numParts = 16)
      .select("label", "idx").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == fast)
    assert(twoPhase.size == 3000 && twoPhase("w00000") == 0L && twoPhase("w02999") == 2999L)
  }

  test("withDictIndexLarge keeps null-label rows and the 1:1 re-attach") {
    import spark.implicits._
    val df  = Seq(Some("b"), None, Some("a"), Some("b")).toDF("label")
    val out = Relational.withDictIndexLarge(df, "label", "idx", numParts = 2)
    assert(out.count() == 4)
    assert(out.where(col("label").isNull).head().isNullAt(1))
    assert(out.where(col("label") === "a").head().getLong(1) == 0L)
  }

  test("withDictIndex fails loudly past the dictionary-cardinality contract") {
    val words = spark.range(0, 100).selectExpr("cast(id as string) AS label")
    val e = intercept[Exception] {
      Relational.withDictIndex(words, "label", "idx", maxDictSize = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("withDictIndexLarge")),
      s"expected the guard message, got: ${msgs(e).mkString(" | ")}")
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

  test("hashSplitTag never overflows for extreme long ids (ANSI mode)") {
    import spark.implicits._
    // ids beyond ~3.5e9 overflowed the bare Knuth multiply under ANSI mode
    val ids = Seq(0L, 1L, 3499999999L, Long.MaxValue, Long.MinValue, -17L).toDF("id")
    val out = ids.select(col("id"), Relational.hashSplitTag(col("id"), 80).as("split")).collect()
    assert(out.length == 6 && out.forall(r => Set("train", "val")(r.getString(1))))
    // below the pre-mod prime the split matches the original bare hash
    assert(out.find(_.getLong(0) == 1L).get.getString(1) ==
      (if ((1L * 2654435761L) % 100 < 80) "train" else "val"))
  }

  test("hashSplitTagAnyType splits string ids deterministically") {
    import spark.implicits._
    val ids = (0 until 500).map(i => s"doc-uuid-$i").toDF("id")
    val tag = Relational.hashSplitTagAnyType(col("id"), 80).as("split")
    val counts = ids.select(tag).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500)
    assert(counts("train") > 350 && counts("train") < 450, s"got $counts")
    assert(ids.select(col("id"), tag).except(ids.select(col("id"), tag)).count() == 0)
  }

  test("asofJoin attaches the latest right value at or before each left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 50L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (3L, 1L, 9.0))
      .toDF("k", "t", "v")
    val out = Relational.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("k", "t").collect()
    // (1,5): no right ≤ 5 → null; (1,10): tie is inclusive → 1.0;
    // (1,20): latest ≤ 20 is 15 → 2.0; (2,50): no right rows for key → null
    assert(out.length == 4)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")))
    assert(out(1).getDouble(out(1).fieldIndex("asof_v")) == 1.0)
    assert(out(2).getDouble(out(2).fieldIndex("asof_v")) == 2.0)
    assert(out(3).isNullAt(out(3).fieldIndex("asof_v")))
  }

  test("asofJoin ignores right rows with null timestamps (no phantom matches)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1")).toDF("k", "t", "ev")
    // asc sort is NULLS FIRST: unfiltered, this null-ts row would sort as
    // "earlier than everything" and attach 99.0 to the matchless left row
    val right = Seq((1L, Option.empty[Long], 99.0), (1L, Some(200L), 1.0))
      .toDF("k", "t", "v")
    val out = Relational.asofJoin(left, right, Seq("k"), "t", "t", Seq("v")).head()
    assert(out.isNullAt(out.fieldIndex("asof_v")),
      s"null-ts right row must match nothing, got ${out.get(out.fieldIndex("asof_v"))}")
  }

  test("asofJoin preserves left cardinality and all left columns") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("t"), col("event_type"))
    val clicks = ev.where(col("event_type") === "click").drop("event_type")
    val buys   = ev.where(col("event_type") === "purchase")
      .groupBy("user_id", "t").agg(count(lit(1)).cast("double").as("n_buy"))
    val joined = Relational.asofJoin(clicks, buys, Seq("user_id"), "t", "t", Seq("n_buy"))
    assert(joined.count() == clicks.count())
    assert(joined.columns.toSet == Set("user_id", "event_id", "t", "asof_n_buy"))
  }

  test("saltedAggregate matches the plain group-by on exact decimal sums") {
    val ev = Tables.load(spark, sfDir, "events")
    val dec = "decimal(38,4)"
    val salted = Relational.saltedAggregate(ev, "event_type", 8,
      partialAggs = Seq(sum(col("value").cast(dec)).as("ps"), count(lit(1)).as("pn")),
      mergeAggs = Seq(sum(col("ps")).cast(dec).as("s"), sum(col("pn")).as("n")))
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value").cast(dec)).cast(dec).as("s"), count(lit(1)).as("n"))
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
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

  test("hashStratifiedSample: per-stratum rates, determinism, subset, default for unmapped/null") {
    import spark.implicits._
    val df = (0L until 2000L).map(i =>
      (i, if (i % 4 == 3) null else s"s${i % 3}")).toDF("id", "stratum")
    def sample() = Relational.hashStratifiedSample(
      df, col("id"), col("stratum"), Map("s0" -> 100, "s1" -> 50, "s2" -> 0), defaultPct = 100)
    val kept = sample().collect().map(r => (r.getLong(0), r.getString(1)))
    // pct=100 keeps every row, pct=0 none; the hash rule decides in between
    assert(kept.count(_._2 == "s0") == df.where($"stratum" === "s0").count())
    assert(kept.count(_._2 == "s2") == 0)
    assert(kept.count(_._2 == null) == df.where($"stratum".isNull).count()) // default applies to null
    val s1Kept  = kept.count(_._2 == "s1").toDouble
    val s1Total = df.where($"stratum" === "s1").count().toDouble
    assert(s1Kept / s1Total > 0.3 && s1Kept / s1Total < 0.7, s"s1 rate ${s1Kept / s1Total}")
    // deterministic: same rows kept on a re-run, and a subset of the input
    assert(sample().collect().map(r => r.getLong(0)).toSet == kept.map(_._1).toSet)
    // consistency with hashSplitTag's bucket: s1 at 50% keeps exactly the
    // ids whose bucket < 50
    val expected = df.where($"stratum" === "s1").collect().map(_.getLong(0))
      .filter(id => ((id % 1000003L) * 2654435761L) % 100L < 50L).toSet
    assert(kept.filter(_._2 == "s1").map(_._1).toSet == expected)
  }

  test("deterministicShuffle: reproducible order, salt changes it, key matches the hash rule") {
    import spark.implicits._
    val df = (0L until 300L).toDF("id")
    def order(salt: Long) =
      Relational.deterministicShuffle(df, col("id"), salt).collect().map(_.getLong(0)).toSeq
    assert(order(7L) == order(7L))                       // same salt → same order
    assert(order(7L) != order(8L))                       // epoch reshuffle
    assert(order(7L).sorted == (0L until 300L))          // a permutation, nothing lost
    val keyed = Relational.deterministicShuffle(df, col("id"), 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    keyed.foreach { case (id, k) =>
      assert(k == ((id % 1000003L) + 7L) % 1000003L * 2654435761L % 1000000L)
    }
  }

  test("approximate aggregates land within tolerance of exact answers") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
      countDistinct(col("l_orderkey")).as("e"),
      percentile_approx(col("l_quantity").cast("double"), lit(0.5), lit(10000)).as("am"),
      expr("median(CAST(l_quantity AS DOUBLE))").as("em")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"HLL estimate $a vs exact $e")
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 1.0,
      s"approx median ${r.getDouble(2)} vs exact ${r.getDouble(3)}")
  }

  test("withGlobalRank matches a single-partition row_number for any order") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, (i * 7919L) % 97L)).toDF("id", "v")
    val got = Relational.withGlobalRank(df, "rnk", numParts = 8, col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, v) => (-v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got == want)
    // empty input ranks to an empty frame, not an error
    assert(Relational.withGlobalRank(df.where(lit(false)), "rnk", 8, col("id")).count() == 0)
  }

  test("mixtureSample: binding stratum kept whole, target mixture achieved, deterministic") {
    import spark.implicits._
    // n: a=1200, b=300, c=500; weights 3:1:1 → c = min(1200/3, 300/1, 500/1) = 300
    // → keep a: 900, b: 300 (whole — binding), c: 300 in expectation
    val df = (0L until 2000L).map { i =>
      val s = if (i < 1200) "a" else if (i < 1500) "b" else "c"
      (i, s)
    }.toDF("id", "stratum").union(Seq((9999L, "drop_me")).toDF("id", "stratum"))
    val kept = Relational.mixtureSample(df, col("id"), col("stratum"),
        Map("a" -> 3.0, "b" -> 1.0, "c" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byS = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byS.contains("drop_me"))                 // unlisted strata drop
    assert(byS("b") == 300)                          // binding stratum kept whole
    // hash buckets are uniform but not exact — allow ±12% around the target
    assert(math.abs(byS("a") - 900) < 108, s"a kept ${byS("a")}")
    assert(math.abs(byS("c") - 300) < 36, s"c kept ${byS("c")}")
    // deterministic and a subset of the input
    val again = Relational.mixtureSample(df, col("id"), col("stratum"),
        Map("a" -> 3.0, "b" -> 1.0, "c" -> 1.0)).collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_._1).toSet)
    assert(kept.map(_._1).toSet.subsetOf(df.collect().map(_.getLong(0)).toSet))
  }

  test("saltedJoin result set equals the plain inner join (hot-key skew)") {
    import spark.implicits._
    // 900 of 1000 fact rows share key 7 — the skew the salt spreads out
    val fact = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong, i.toLong))
      .toDF("k", "fact_val")
    val dim = Seq((7L, "hot"), (950L, "cold"), (999L, "cold2"), (12345L, "unmatched"))
      .toDF("k", "dim_val")
    val plain  = fact.join(dim, Seq("k")).select("k", "fact_val", "dim_val")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Relational.saltedJoin(fact, dim, "k", col("fact_val"), saltBuckets = 8)
      .select("k", "fact_val", "dim_val")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 902)
  }

  test("negativeSample: never a positive, k per user, partitioning-invariant, salt-sensitive") {
    import spark.implicits._
    val pos = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L))
      .toDF("user_id", "item_id")
    val items = (10L to 29L).map(Tuple1(_)).toDF("p_partkey")
    def run(df: org.apache.spark.sql.DataFrame, salt: Long = 0L) =
      Relational.negativeSample(df, "user_id", "item_id", items, "p_partkey", k = 4, salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val out = run(pos)
    val posSet = Set((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L))
    out.foreach { case (u, i, _) => assert(!posSet((u, i)), s"sampled a positive ($u,$i)") }
    assert(out.groupBy(_._1).forall(_._2.length == 4)) // 20 items, ≤2 positives → full k
    assert(out.map(_._1).distinct.sorted == Seq(1L, 2L, 3L))
    assert(run(pos.repartition(7)) == out)             // layout-invariant
    assert(run(pos, salt = 99L) != out)                // salt re-rolls the choice
  }

  test("binnedRangeJoin: an interval spanning too many bins fails loudly, not OOM") {
    import spark.implicits._
    val dim  = Seq(("catchall", 0.0, 1e9)).toDF("band", "lo", "hi")
    val fact = Seq((1L, 5.0)).toDF("id", "v")
    val e = intercept[Exception] { // SparkRuntimeException (USER_RAISED_EXCEPTION)
      Relational.binnedRangeJoin(fact, "v", dim, "lo", "hi",
        binWidth = 1.0, maxBinsPerInterval = 1000).collect()
    }
    assert(e.getMessage.contains("widen binWidth"), e.getMessage)
  }

  test("madOutliers: Hampel flag on a known group; null value yields null flag") {
    import spark.implicits._
    // group a: values 1..9 + spike 100 → med 5.5 (even count midpoint),
    // adevs {4.5,3.5,...,0.5,0.5,...,94.5} → mad 2.5 → threshold 7.5:
    // only the spike exceeds it. group b: constant → mad 0, nothing flagged
    // except deviants (none).
    val rows = ((1 to 9).map(v => ("a", Some(v.toDouble))) :+ ("a", Some(100.0)) :+
      ("a", Option.empty[Double]) :+ ("b", Some(7.0)) :+ ("b", Some(7.0))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    val df = rows.toDF("id", "g", "v")
    val out = Relational.madOutliers(df, "v", "g").collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        (Option(r.get(r.fieldIndex("outlier"))).map(_.asInstanceOf[Long]),
          r.getDouble(r.fieldIndex("med")))).toMap
    assert(out(9L)._1.contains(1L))                    // the spike
    (0 to 8).foreach(i => assert(out(i.toLong)._1.contains(0L), s"row $i"))
    assert(out(10L)._1.isEmpty)                        // null value → null flag
    assert(out(11L)._1.contains(0L) && out(11L)._2 == 7.0)
  }

  test("binnedRangeJoin equals the plain inequality join; multi-bin + overlap + edge cases") {
    import spark.implicits._
    // intervals: multi-bin spans, overlaps, a degenerate (lo == hi), an
    // exact-bin-edge hi, and values sitting exactly on lo and hi bounds
    val dim = Seq(("a", 0.0, 25.0), ("b", 10.0, 40.0), ("c", 30.0, 30.0),
      ("d", 20.0, 20.00001), ("e", 35.0, 50.0)).toDF("band", "lo", "hi")
    val fact = (0 to 50).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val binned = rows(Relational.binnedRangeJoin(fact, "v", dim, "lo", "hi", binWidth = 10.0))
    val plain  = rows(fact.join(dim, col("v") >= col("lo") && col("v") < col("hi")))
    assert(binned == plain && binned.nonEmpty)
    assert(!binned.exists(_._2 == "c"))                  // degenerate interval drops
    assert(binned.contains((39L, "b")) && !binned.contains((40L, "b"))) // hi exclusive
    assert(binned.contains((10L, "a")) && binned.contains((10L, "b")))  // overlap: both match
  }

  test("groupQuota: caps per group, keeps under-quota groups whole, ranks deterministically") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 1L)).toDF("id", "grp", "score")
    val out = Relational.groupQuota(df, "grp", 2, col("score").desc, col("id"))
      .orderBy("grp", "rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // group a: score 30 ties on ids 2,3 → id ascending; id 1 (rk 3) cut
    assert(out.toSeq == Seq((2L, "a", 1L), (3L, "a", 2L), (5L, "b", 1L)))
  }

  test("HLL sketches: union-of-parts ≡ sketch-of-whole, estimates within 2% of exact") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val parts = Relational.distinctSketches(ev, Seq("event_type", "half"), "user_id")
    val merged = Relational.unionSketchEstimate(parts, Seq("event_type")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = Relational.unionSketchEstimate(
      Relational.distinctSketches(ev, Seq("event_type"), "user_id"), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole, "union of half-sketches must equal the whole-stream sketch")
    merged.foreach { case (t, est) =>
      val ex = exact(t).toDouble
      assert(math.abs(est - ex) / ex <= 0.02, s"$t: est $est vs exact $ex")
    }
  }

  test("winsorize clamps tails to the percentile band and keeps every row") {
    import spark.implicits._
    // values 1..100: p10 = 10.9, p90 = 90.1 (linear interpolation)
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Relational.winsorize(df, "v", 0.1, 0.9)
    assert(out.count() == 100)
    val m = out.collect().map(r => r.getAs[Double]("v") -> r.getAs[Double]("v_w")).toMap
    assert(m(1.0) == 10.9 && m(5.0) == 10.9)   // low tail clamped up
    assert(m(100.0) == 90.1 && m(95.0) == 90.1) // high tail clamped down
    assert(m(50.0) == 50.0)                     // interior untouched
  }

  test("equiDepthHistogram: near-equal buckets, exact edges, no global window") {
    import spark.implicits._
    val df = (1 to 80).map(i => i.toDouble).toDF("v")
    val out = Relational.equiDepthHistogram(df, "v", buckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // cuts at p25/p50/p75 of 1..80 = 20.75, 40.5, 60.25 → buckets of 20
    assert(out.toSeq == Seq(
      (1L, 20L, 1.0, 20.0), (2L, 20L, 21.0, 40.0),
      (3L, 20L, 41.0, 60.0), (4L, 20L, 61.0, 80.0)))
    // plan must not contain a single-partition global sort window
    val plan = Relational.equiDepthHistogram(df, "v", 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "equi-depth histogram must not use a global window")
  }

  test("hashPrioritySample: n per group, reproducible across partitionings") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("g", "id")
    def sampled(d: org.apache.spark.sql.DataFrame) =
      Relational.hashPrioritySample(d, "g", 5, "id")
        .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s1 = sampled(df)
    val s2 = sampled(df.repartition(7))
    assert(s1 == s2, "sample must not depend on physical layout")
    assert(s1.size == 10 && s1.count(_._1 == "a") == 5)
  }

  test("temperatureSample keeps the binding stratum whole, thins the head") {
    import spark.implicits._
    // strata: a=400 rows, b=100, c=25 → rates sqrt(25)*sqrt(n)/n = 5/sqrt(n)
    val df = ((0L until 400L).map(i => ("a", i)) ++
      (400L until 500L).map(i => ("b", i)) ++
      (500L until 525L).map(i => ("c", i))).toDF("g", "id")
    val kept = Relational.temperatureSample(df, col("id"), col("g"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // c (the binding stratum, rate 1.0) survives completely
    assert(kept("c") == 25L)
    // expected keep rates: a → 5/20 = 0.25, b → 5/10 = 0.5; the id-hash
    // bucket is uniform so counts land near expectation
    assert(kept("a") > 60 && kept("a") < 140, s"a kept ${kept("a")}, expected ~100")
    assert(kept("b") > 30 && kept("b") < 70, s"b kept ${kept("b")}, expected ~50")
    // deterministic across physical layout
    val again = Relational.temperatureSample(df.repartition(7), col("id"), col("g"))
      .select("id").collect().map(_.getLong(0)).toSet
    val first = Relational.temperatureSample(df, col("id"), col("g"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(first == again)
  }

  test("validateRules: declaration-order violations, null counts as failure") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(99.0), "ok"),   // fails r1
      (3L, None, "bad"),        // null v → fails r1; fails r2
      (4L, Some(5.0), "bad")    // fails r2
    ).toDF("id", "v", "s")
    val out = Relational.validateRules(df, Seq(
        "v_small" -> (col("v") < 50), "s_ok" -> (col("s") === "ok")))
      .select("id", "violations", "is_valid").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "", 1L), (2L, "v_small", 0L), (3L, "v_small,s_ok", 0L), (4L, "s_ok", 0L)))
  }

  test("scd2Merge: closes changed versions, passes history through, inserts new keys") {
    import spark.implicits._
    val d0 = java.sql.Date.valueOf("2020-01-01")
    val dim = Seq(
      (1L, "alice", 10.0, d0, Option.empty[java.sql.Date], true),  // will change
      (2L, "bob", 20.0, d0, None, true),                           // unchanged
      (3L, "carol", 5.0, d0, Some(java.sql.Date.valueOf("2020-06-01")), false), // history
      (3L, "carol", 30.0, java.sql.Date.valueOf("2020-06-01"), None, true)      // current v2
    ).toDF("k", "name", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "alice", 99.0),   // tracked change
      (2L, "bob", 20.0),     // no change → untouched
      (9L, "zoe", 1.0)       // new key
    ).toDF("k", "name", "bal")
    val out = Relational.scd2Merge(dim, updates, "k", Seq("name", "bal"),
        to_date(lit("2021-06-01")))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(2), Option(r.getDate(4)).map(_.toString),
        r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 10.0, Some("2021-06-01"), false),  // closed
      (1L, 99.0, None, true),                 // reopened
      (2L, 20.0, None, true),                 // untouched
      (3L, 5.0, Some("2020-06-01"), false),   // history passthrough
      (3L, 30.0, None, true),                 // current, unchanged
      (9L, 1.0, None, true)))                 // new key
  }

  test("snapshotDiff emits the minimal change set with null-safe compares") {
    import spark.implicits._
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d"))).toDF("k", "v")
    val neu = Seq((1L, Some("a")), (2L, Some("B")), (3L, Some("c")),
      (5L, Some("e"))).toDF("k", "v")
    val out = Relational.snapshotDiff(old, neu, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged → omitted; 2 value change; 3 null→value counts as change
    assert(out == Map(2L -> "update", 3L -> "update", 4L -> "delete", 5L -> "insert"))
  }

  test("zscoreNormalize: hand-checked moments, layout-invariant, 1-row group null") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)).toDF("g", "v")
    val out = Relational.zscoreNormalize(df, "v", "g")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    // group a: mean 2, sample std 1 → z = v - 2; group b: n=1 → null
    assert(out == Set(("a", 1.0, Some(-1.0)), ("a", 2.0, Some(0.0)),
      ("a", 3.0, Some(1.0)), ("b", 5.0, None)))
    val re = Relational.zscoreNormalize(df.repartition(5), "v", "g")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(re == out, "z-scores must not depend on physical layout")
  }

  test("applyChangeSet inverts snapshotDiff (round-trip law)") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val neu = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("k", "v")
    val changes = Relational.snapshotDiff(old, neu, "k", Seq("v"))
      .join(neu, Seq("k"), "left_outer")
    val applied = Relational.applyChangeSet(old, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = neu.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(applied == expected)
  }

  test("columnStats: one-scan exact stats, non-numeric min/max null") {
    import spark.implicits._
    val df = Seq((1.0, "x"), (2.0, "y"), (Double.NaN, "x"))
      .toDF("v", "s").withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val m = Relational.columnStats(df, Seq("v", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5))))).toMap
    assert(m("v") == ((2L, 1L, 2L, Some(1.0), Some(2.0))))
    assert(m("s") == ((3L, 0L, 2L, None, None)))
  }

  test("columnStatsApprox: same schema/counts/min/max as exact, n_distinct within rsd tolerance") {
    val li   = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_discount", "l_extendedprice", "l_returnflag")
    val exact  = Relational.columnStats(li, cols).orderBy("column").collect()
    val approx = Relational.columnStatsApprox(li, cols).orderBy("column").collect()
    assert(Relational.columnStatsApprox(li, cols).schema ==
      Relational.columnStats(li, cols).schema)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      // everything except the sketch estimate is identical
      assert(e.getLong(1) == a.getLong(1) && e.getLong(2) == a.getLong(2))
      assert(Option(e.get(4)) == Option(a.get(4)) && Option(e.get(5)) == Option(a.get(5)))
      // HLL++ at rsd 5%: generous 3-sigma-ish bound, floor for tiny counts
      val (nd, est) = (e.getLong(3), a.getLong(3))
      assert(math.abs(est - nd) <= math.max(5L, (nd * 0.15).toLong),
        s"${e.getString(0)}: est $est vs exact $nd")
    }
  }
}

package graft

import graft.operators.{Dedup, Relational, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3), using ScalaCheck generators
  * with deterministic seeds (samples drawn explicitly — the scalatest
  * bridge artifact is not available offline).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val tokenGen = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "iota", "kappa")
  private val docGen = Gen.nonEmptyListOf(tokenGen).map(_.mkString(" "))

  test("property: dedup is idempotent (dedup(dedup(x)) == dedup(x))") {
    import spark.implicits._
    samples(Gen.listOfN(30, docGen), 5).foreach { texts =>
      val df    = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once  = Dedup.dropExactDuplicates(df, "text", "doc_id")
      val twice = Dedup.dropExactDuplicates(once, "text", "doc_id")
      assert(once.count() == twice.count())
      assert(once.select("doc_id").except(twice.select("doc_id")).count() == 0)
      // every surviving text is unique
      assert(once.select("text").distinct().count() == once.count())
    }
  }

  test("property: connectedComponents equals brute-force union-find on random graphs") {
    import spark.implicits._
    // driver-side union-find ground truth
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      // fully compress, then component id = min id of the set (find yields it:
      // unions always point larger roots at smaller ones)
      (0L until n.toLong).map(i => i -> find(i)).toMap
    }
    val n = 24
    val edgeGen = Gen.listOfN(18,
      Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)).suchThat { case (a, b) => a != b })
    samples(edgeGen, 6).foreach { edges =>
      val expected = unionFind(n, edges)
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // connectedComponents only labels vertices that appear in some edge
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched)
      touched.foreach { v =>
        assert(got(v) == expected(v),
          s"vertex $v: got component ${got(v)}, union-find says ${expected(v)} (edges=$edges)")
      }
    }
  }

  test("property: near-dedup drop is idempotent (drop(drop(x)) == drop(x))") {
    import spark.implicits._
    // bigram shingles over a tiny vocabulary generate plenty of near-dup
    // pairs; idempotence must hold regardless
    samples(Gen.listOfN(40, docGen), 4).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.dropNearDuplicates(df, "text", "doc_id", shingleN = 2, minJaccard = 0.8)
        .localCheckpoint() // freeze: the second pass must see the surviving set
      val twice = Dedup.dropNearDuplicates(once, "text", "doc_id", shingleN = 2, minJaccard = 0.8)
      assert(twice.count() == once.count(),
        s"second near-dedup pass dropped rows: ${once.count()} -> ${twice.count()}")
      assert(once.select("doc_id").except(twice.select("doc_id")).count() == 0)
    }
  }

  test("property: transitive near-dedup keeps exactly one representative per component") {
    import spark.implicits._
    samples(Gen.listOfN(30, docGen), 3).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val kept = Dedup.dropNearDuplicatesTransitive(df, "text", "doc_id",
        shingleN = 2, minJaccard = 0.8)
      // survivors must be pairwise below the threshold on exact bigram jaccard
      def shingles(t: String): Set[String] = {
        // trim/lower/split exactly like the engine's tokenizer kernels
        val toks = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        if (toks.length <= 2) Set(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSet
      }
      val rows = kept.collect().map(r => (r.getLong(0), r.getString(1)))
      for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      } {
        val (sa, sb) = (shingles(ta), shingles(tb))
        val j = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
        assert(j < 0.8, s"survivors $ia,$ib still near-dup (jaccard=$j)")
      }
    }
  }

  test("property: label index is a bijection to 0-based lexicographic ranks") {
    import spark.implicits._
    val labelsGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct)
    samples(labelsGen, 8).foreach { labels =>
      val rows = labels.flatMap(l => Seq.fill(3)(l))
      val out = Relational.withDictIndex(rows.toDF("label"), "label", "idx")
        .select("label", "idx").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = labels.sorted.zipWithIndex.map { case (l, i) => l -> i.toLong }.toMap
      assert(out == expected)
    }
  }

  test("property: fingerprint is invariant under token permutation and duplication") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(tokenGen), 10).foreach { toks =>
      val variants = Seq(
        toks.mkString(" "),
        scala.util.Random.javaRandomToRandom(new java.util.Random(42)).shuffle(toks).mkString(" "),
        (toks ++ toks).mkString(" "))
      val fps = variants.toDF("text")
        .select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
      assert(fps.distinct.length == 1, s"fingerprints diverged for $toks")
    }
  }

  test("property: jaccard is symmetric, bounded, and 1 iff equal sets") {
    import spark.implicits._
    val pairGen = for {
      a <- Gen.nonEmptyListOf(tokenGen).map(_.distinct)
      b <- Gen.nonEmptyListOf(tokenGen).map(_.distinct)
    } yield (a, b)
    samples(pairGen, 10).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("x", "y")
      val (j1, j2) = (
        df.select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0),
        df.select(Dedup.jaccard(col("y"), col("x"))).head().getDouble(0))
      assert(j1 == j2 && j1 >= 0.0 && j1 <= 1.0)
      if (a.toSet == b.toSet) assert(j1 == 1.0)
      else assert(j1 < 1.0)
    }
  }

  test("property: quality score bounded in [0,1] for arbitrary printable text") {
    import spark.implicits._
    val textGen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val texts   = samples(textGen, 30).filter(_.nonEmpty)
    val scores = texts.toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    scores.foreach(s => assert(s >= 0.0 && s <= 1.0))
  }

  test("property: left-outer re-attach preserves left cardinality for unique right keys") {
    import spark.implicits._
    // the J1 invariant the reference relies on (01. Ingest.py:128-129)
    samples(Gen.listOfN(50, Gen.choose(0L, 20L)), 5).foreach { keys =>
      val left  = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("row_id", "k")
      val right = keys.distinct.map(k => (k, s"v$k")).toDF("k", "v")
      assert(left.join(right, Seq("k"), "left_outer").count() == left.count())
    }
  }

  test("property: mergeUpsert output keys = target ∪ source; unmatched rows unchanged") {
    import graft.tables.TableManager
    import spark.implicits._
    val kvGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 30L), Gen.choose(-1e4, 1e4)))
      .map(_.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toSeq) // unique keys
    samples(Gen.zip(kvGen, kvGen), 6).foreach { case (t, s) =>
      val target = t.toDF("id", "bal")
      val source = s.toDF("id", "bal")
      val out = TableManager.mergeUpsert(target, source, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val tM = t.toMap; val sM = s.toMap
      assert(out.keySet == tM.keySet ++ sM.keySet)
      out.foreach { case (k, v) =>
        // matched/inserted keys carry the source value; the rest keep target
        assert(v == sM.getOrElse(k, tM(k)), s"key $k: got $v")
      }
    }
  }

  test("property: asofJoin value equals the brute-force latest-at-or-before lookup") {
    import spark.implicits._
    val evGen = Gen.listOfN(30, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 100L)))
    samples(Gen.zip(evGen, evGen), 5).foreach { case (l, r) =>
      val left  = l.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("row_id", "k", "t")
      // unique (k, ts) on the right, per the operator contract
      val rDistinct = r.distinct.map { case (k, ts) => (k, ts, k * 1000.0 + ts) }
      val right = rDistinct.toDF("k", "t", "v")
      val out = Relational.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
        .collect().map(row => (row.getLong(row.fieldIndex("row_id")),
          if (row.isNullAt(row.fieldIndex("asof_v"))) None
          else Some(row.getDouble(row.fieldIndex("asof_v"))))).toMap
      l.zipWithIndex.foreach { case ((k, ts), i) =>
        val expect = rDistinct.filter(e => e._1 == k && e._2 <= ts)
          .sortBy(_._2).lastOption.map(_._3)
        assert(out(i.toLong) == expect, s"row $i key $k ts $ts")
      }
    }
  }

  test("property: scd2Merge is idempotent — re-applying the same batch is a no-op") {
    import spark.implicits._
    val valGen = Gen.chooseNum(0, 5).map(_.toDouble)
    samples(Gen.listOfN(20, valGen), 5).foreach { vals =>
      val dim = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, v, java.sql.Date.valueOf("2020-01-01"),
          Option.empty[java.sql.Date], true)
      }.toDF("k", "v", "valid_from", "valid_to", "is_current")
      val updates = vals.zipWithIndex.collect {
        case (v, i) if i % 3 == 0 => (i.toLong, v + 1.0)
      }.toDF("k", "v")
      val eff   = to_date(lit("2021-01-01"))
      val once  = graft.operators.Relational.scd2Merge(dim, updates, "k", Seq("v"), eff)
      val twice = graft.operators.Relational.scd2Merge(once, updates, "k", Seq("v"), eff)
      // after the first apply every update key's current row already holds
      // the new value → the second apply changes nothing
      assert(twice.count() == once.count())
      val a = once.collect().map(_.toSeq).toSet
      val b = twice.collect().map(_.toSeq).toSet
      assert(a == b, "second application must be a no-op")
    }
  }

  test("property: pageRank total mass bounded by N·scale, every rank >= base") {
    import spark.implicits._
    val edgeGen = for {
      s <- Gen.chooseNum(0L, 19L); d <- Gen.chooseNum(0L, 19L)
    } yield (s, d)
    samples(Gen.listOfN(40, edgeGen), 5).foreach { edges =>
      val df  = edges.toDF("src", "dst")
      val out = graft.operators.Graph.pageRankFixedPoint(df, "src", "dst", iterations = 3)
        .collect().map(_.getLong(1))
      val n = out.length
      assert(out.forall(_ >= 150000L), "every node keeps at least the base mass")
      // damping conserves at most the full mass; dangling nodes only lose
      assert(out.sum <= n.toLong * 1000000L, s"mass ${out.sum} exceeds ${n} * scale")
    }
  }

  test("property: temperatureSample keeps the binding stratum whole, never upsamples") {
    import spark.implicits._
    val sizeGen = Gen.chooseNum(5, 60)
    samples(Gen.listOfN(4, sizeGen), 5).foreach { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, s) =>
        (0 until sz).map(i => (s"s$s", (s * 1000 + i).toLong))
      }
      val df = rows.toDF("g", "id")
      val kept = graft.operators.Relational
        .temperatureSample(df, col("id"), col("g"))
        .groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val ns = sizes.zipWithIndex.map { case (sz, s) => s"s$s" -> sz.toLong }.toMap
      // no stratum ever grows
      kept.foreach { case (g, k) => assert(k <= ns(g), s"$g upsampled: $k > ${ns(g)}") }
      // the smallest stratum has rate 1.0 → kept in full
      val binding = ns.minBy { case (g, n) => (n, g) }._1
      assert(kept(binding) == ns(binding), s"binding stratum $binding thinned")
    }
  }

  test("property: jaccardJoinExact equals brute force on random docs, several thresholds") {
    import spark.implicits._
    // thresholds chosen to include the float-ceil hazard class (0.6*5 -> 4
    // under double ceil) and a high selective cut
    val thresholds = Seq(0.3, 0.5, 0.6, 0.8)
    samples(Gen.listOfN(40, docGen), 3).zipWithIndex.foreach { case (texts, si) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sets = df.select(col("doc_id"),
        graft.operators.Dedup.wordShinglesUdf(2)(col("text")).as("toks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      thresholds.foreach { t =>
        val num = math.round(t * 1000000L)
        val expected = (for {
          a <- sets.keys; b <- sets.keys; if a < b
          i = (sets(a) & sets(b)).size.toLong
          u = (sets(a) | sets(b)).size.toLong
          if u > 0 && i * 1000000L >= u * num
        } yield (a, b)).toSet
        val got = graft.operators.Dedup.jaccardJoinExact(df, "text", "doc_id", t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expected,
          s"sample $si t=$t: missing ${(expected diff got).take(5)} extra ${(got diff expected).take(5)}")
      }
    }
  }

  test("jaccardJoinExact: reported jaccard is the exact rounded ratio and respects the threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),       // shingles: ab bc cd de ef (5)
      (2L, "a b c d e x"),       // shares ab bc cd de (4 of 6-union... )
      (3L, "q r s t u v")
    ).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.jaccardJoinExact(df, "text", "doc_id", 0.5)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    // shingle sets: {ab,bc,cd,de,ef} vs {ab,bc,cd,de,ex}: i=4, u=6
    assert(r.getDouble(2) == math.rint(4.0 / 6.0 * 1e6) / 1e6 || math.abs(r.getDouble(2) - 0.666667) < 1e-9)
  }
}

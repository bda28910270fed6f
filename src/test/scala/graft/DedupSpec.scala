package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exactGroups keeps min id and counts duplicates") {
    val df  = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = Dedup.exactGroups(df, "text", "doc_id")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("dropExactDuplicates is idempotent") {
    val df   = docs(1L -> "a", 2L -> "a", 3L -> "b")
    val once = Dedup.dropExactDuplicates(df, "text", "doc_id")
    assert(once.count() == 2)
    assert(Dedup.dropExactDuplicates(once, "text", "doc_id").count() == 2)
  }

  test("null-text rows are never merged as duplicates of each other") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Option.empty[String]), (3L, Option.empty[String]),
      (4L, Some("a"))).toDF("doc_id", "text")
    // sha2(null)=null would otherwise collapse rows 2 and 3 into one group
    val groups = Dedup.exactGroups(df, "text", "doc_id").collect()
    assert(groups.length == 1 && groups.head.getLong(2) == 2L, "only the 'a' group exists")
    val kept = Dedup.dropExactDuplicates(df, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L), s"both null-text rows must survive, got $kept")
  }

  test("minHash LSH surfaces a planted near-duplicate pair") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 38).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val far  = (100 to 140).map(i => s"alt$i").mkString(" ")
    val df   = docs(1L -> base, 2L -> near, 3L -> far)
    val pairs = Dedup.minHashCandidatePairs(df, "text", "doc_id",
      shingleN = 1, numHashes = 64, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("estimatedJaccard is 1.0 for identical texts") {
    val df = docs(1L -> "w1 w2 w3 w4", 2L -> "w1 w2 w3 w4")
    val est = Dedup.minHashCandidatePairs(df, "text", "doc_id",
      shingleN = 1, numHashes = 64, bands = 16, minJaccard = 0.0)
      .collect().head.getDouble(2)
    assert(est == 1.0)
  }

  test("simHash of identical token streams is identical; near texts are close") {
    import spark.implicits._
    val df = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta iota").toDF("text")
    val hs = df.select(Dedup.simHash(TextAnalysis.tokens(col("text"))).as("h"))
      .collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(java.lang.Long.bitCount(hs(0) ^ hs(2)) < 20)
  }

  test("simHashCandidatePairs finds identical docs at hamming 0") {
    val df = docs(1L -> "p q r s t u v w", 2L -> "p q r s t u v w", 3L -> "completely different words here now ok yes no")
    val pairs = Dedup.simHashCandidatePairs(df, "text", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("null text rows are skipped, not fatal, in LSH candidate generation") {
    import spark.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w4"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val mh = Dedup.minHashCandidatePairs(df, "text", "doc_id",
      shingleN = 1, numHashes = 64, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == Set((1L, 2L)))
    val sh = Dedup.simHashCandidatePairs(df, "text", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh == Set((1L, 2L)))
  }

  test("string ids survive exact dedup (no silent long cast)") {
    import spark.implicits._
    val df  = Seq(("docB", "same"), ("docA", "same"), ("docC", "other")).toDF("doc_id", "text")
    val out = Dedup.dropExactDuplicates(df, "text", "doc_id")
      .collect().map(_.getString(0)).toSet
    assert(out == Set("docA", "docC"))
  }

  test("string ids work through the LSH pair path too (MinHash/SimHash/near-drop)") {
    import spark.implicits._
    val df = Seq(
      ("docB", "alpha beta gamma delta epsilon zeta eta theta"),
      ("docA", "alpha beta gamma delta epsilon zeta eta theta"),
      ("docC", "totally different words nothing shared here at all"))
      .toDF("doc_id", "text")
    val mh = Dedup.minHashCandidatePairs(df, "text", "doc_id", shingleN = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(mh == Set(("docA", "docB")), mh.toString)
    val sh = Dedup.simHashCandidatePairs(df, "text", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sh == Set(("docA", "docB")), sh.toString)
    // keep-min-id drop: lexicographic min wins for string ids
    val kept = Dedup.dropNearDuplicates(df, "text", "doc_id", shingleN = 2)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("docA", "docC"), kept.toString)
  }

  test("simHashCandidatePairs rejects maxHamming beyond the pigeonhole guarantee") {
    val df = docs(1L -> "a b c")
    intercept[IllegalArgumentException] {
      Dedup.simHashCandidatePairs(df, "text", "doc_id", maxHamming = 4)
    }
  }

  test("jaccard exact values") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j  = df.select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("dropNearDuplicates keeps one representative per near-dup group") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 38).map(i => s"tok$i").mkString(" ") + " o1 o2"
    val far  = (100 to 140).map(i => s"alt$i").mkString(" ")
    val df   = docs(1L -> base, 2L -> near, 3L -> far)
    val kept = Dedup.dropNearDuplicates(df, "text", "doc_id",
      shingleN = 1, minJaccard = 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // 2 is the near-dup of 1 with larger id
    // idempotent
    val again = Dedup.dropNearDuplicates(
      df.where(col("doc_id").isin(kept.toSeq: _*)), "text", "doc_id",
      shingleN = 1, minJaccard = 0.7)
    assert(again.count() == 2)
  }

  test("connectedComponents merges transitive clusters to min-id labels") {
    import spark.implicits._
    // edges (1,3),(2,3): 1 and 2 connect only through 3; plus isolated pair (10,11)
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("transitive near-dedup keeps one representative per connected cluster") {
    // j(t1,t2)=j(t2,t3)=17/23≈0.74 confirm at 0.7; j(t1,t3)=14/26≈0.54 does
    // not — clustering through t2 must still collapse all three to doc 1.
    // (0.74 keeps the 16-band hit probability at ~99.7%; pairs nearer the
    // threshold can legitimately be missed by LSH.)
    val w    = (n: Range) => n.map(i => s"w$i").mkString(" ")
    val df   = docs(1L -> w(1 to 20), 2L -> w(4 to 23), 3L -> w(7 to 26), 9L -> w(200 to 240))
    val kept = Dedup.dropNearDuplicatesTransitive(df, "text", "doc_id",
      shingleN = 1, minJaccard = 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }

  test("jaccardTextUdf kernel is value-identical to the HOF shingle jaccard") {
    // fixture docs: adjacent pairs, several shingle widths, incl. the
    // short-text truncated-shingle edge case and empty-ish strings
    val d = Tables.load(spark, sfDir, "documents").limit(200)
      .select(col("doc_id"), col("text"))
    val a = d.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = d.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val pairs = a.join(b, col("id_b") === col("id_a") + 1)
    for (n <- Seq(1, 2, 3)) {
      val mismatch = pairs.select(
          Dedup.jaccardTextUdf(n)(col("ta"), col("tb")).as("kernel"),
          Dedup.jaccard(
            Dedup.wordShingles(col("ta"), n), Dedup.wordShingles(col("tb"), n)).as("hof"))
        .where(col("kernel") =!= col("hof")).count()
      assert(mismatch == 0, s"shingleN=$n")
    }
    // edge cases the fixture may not cover — incl. tab/newline-edged texts,
    // where Spark's trim (0x20 only) and split (keeps trailing empties)
    // diverge from Java's String.trim/one-arg split
    import spark.implicits._
    val edge = Seq(("a", "a"), ("a b", "b a"), ("", ""), ("  ", "x"), ("one two", "one"),
      ("hello world\n", "hello world"), ("\thello world", "hello world"),
      ("a\tb\nc", "a b c"), ("x \n", "x"))
      .toDF("ta", "tb")
    for (n <- Seq(1, 3)) {
      val rows = edge.select(
        Dedup.jaccardTextUdf(n)(col("ta"), col("tb")).as("kernel"),
        Dedup.jaccard(
          Dedup.wordShingles(col("ta"), n), Dedup.wordShingles(col("tb"), n)).as("hof")).collect()
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"n=$n row=$r"))
    }
  }

  test("wordShinglesUdf kernel emits the exact wordShingles set, doc for doc") {
    val d = Tables.load(spark, sfDir, "documents").limit(200)
      .select(col("doc_id"), col("text"))
    import spark.implicits._
    val edge = Seq((9001L, "hello world\n"), (9002L, "\thello a b c"),
      (9003L, ""), (9004L, "  "), (9005L, "one"), (9006L, "a\tb\nc d"))
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val mismatch = d.unionByName(edge).select(
          array_sort(Dedup.wordShinglesUdf(n)(col("text"))).as("kernel"),
          array_sort(Dedup.wordShingles(col("text"), n)).as("hof"))
        .where(col("kernel") =!= col("hof")).count()
      assert(mismatch == 0, s"shingleN=$n")
    }
  }

  test("dedupChunks drops later chunk occurrences and reassembles in order") {
    val df = docs(
      1L -> "aaaabbbb",   // chunks: aaaa, bbbb — both first occurrences
      2L -> "bbbbcccc",   // bbbb is a dup of doc 1's → only cccc survives
      3L -> "aaaa")       // entirely duplicate → doc vanishes from output
    val out = Dedup.dedupChunks(df, "text", "doc_id", chunkSize = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((2L, 8L, "aaaabbbb")))
    assert(out(2L) == ((1L, 4L, "cccc")))
  }

  test("dedupChunks collapses WITHIN-doc repeats (first position wins)") {
    val df  = docs(1L -> "xxxxxxxx")  // chunk xxxx at idx 0 and 1
    val out = Dedup.dedupChunks(df, "text", "doc_id", chunkSize = 4).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L && out.head.getString(3) == "xxxx")
  }

  test("dedupChunks: trailing short chunk dedups by value like any other") {
    // doc 1's trailing "cc" (short chunk) equals doc 2's full text chunk
    val df  = docs(1L -> "aaaacc", 2L -> "cc")
    val out = Dedup.dedupChunks(df, "text", "doc_id", chunkSize = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "aaaacc"))
  }

  test("dedupAgainstCorpus keeps only texts new to history, min-id within batch") {
    val history = docs(1L -> "seen before", 2L -> "also seen")
    val prior   = Dedup.exactGroups(history, "text", "doc_id").select("content_hash")
    val batch   = docs(
      10L -> "seen before",    // dup of history → dropped
      11L -> "brand new",      // survives
      12L -> "brand new",      // within-batch dup → dropped (11 wins)
      13L -> "also new")
    val kept = Dedup.dedupAgainstCorpus(batch, "text", "doc_id", prior)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
  }

  test("verifyPairsExactJaccard re-attaches payload and confirms candidates") {
    val df    = docs(1L -> "a b c d e f", 2L -> "a b c d e g", 3L -> "z z2 z3 z4 z5 z6")
    val pairs = Dedup.minHashCandidatePairs(df, "text", "doc_id",
      shingleN = 1, numHashes = 64, bands = 16, minJaccard = 0.2)
    val exact = Dedup.verifyPairsExactJaccard(pairs, df, "text", "doc_id", shingleN = 1)
      .where(col("id_a") === 1 && col("id_b") === 2).collect()
    assert(exact.nonEmpty)
    assert(math.abs(exact.head.getDouble(2) - 5.0 / 7.0) < 1e-9)
  }

  test("editDistanceJoinPairs: substitution, deletion, insertion pairs found; distant pairs not") {
    import spark.implicits._
    val names = Seq(1L -> "alpha", 2L -> "alphb", 3L -> "alpa", 4L -> "beta",
      5L -> "betas", 6L -> "gamma", 7L -> null.asInstanceOf[String])
      .toDF("id", "name")
    val got = Dedup.editDistanceJoinPairs(names, "name", "id", maxDist = 1)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // alpha~alphb (sub), alpha~alpa (del), alphb~alpa dist 2 (excluded),
    // beta~betas (ins); gamma pairs with nothing; null never pairs
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 1L), (4L, 5L, 1L)))
  }

  test("nearDedupAgainstIndex: drops history near-dups and collapses batch groups; nulls pass") {
    import spark.implicits._
    val history = docs(
      1L -> "the quick brown fox jumps over the lazy dog and keeps on running far away",
      2L -> "completely different text about spark engines and columnar execution at scale")
    val index = Dedup.minHashIndex(history, "text", "doc_id", shingleN = 2)
    val batch = Seq(
      10L -> "the quick brown fox jumps over the lazy dog and keeps on running far away", // exact vs history → est 1.0
      11L -> "the quick brown fox jumps over the lazy dog and keeps on running far off",  // near vs history 1
      12L -> "unrelated novel content entirely fresh words never indexed anywhere before",
      13L -> "unrelated novel content entirely fresh words never indexed anywhere before", // in-batch dup of 12
      14L -> null.asInstanceOf[String]).toDF("doc_id", "text")
    val out = Dedup.nearDedupAgainstIndex(batch, "text", "doc_id", index,
        shingleN = 2, minEstJaccard = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(12L, 14L)) // 10/11 match history, 13 loses to 12, null passes
  }

  test("nearDedupAgainstIndex at J == 1.0: exact set-equality confirm, no est collisions") {
    import spark.implicits._
    val history = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta")
    val index = Dedup.minHashIndex(history, "text", "doc_id", shingleN = 2)
    val batch = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta",       // exact copy → drop
      11L -> "alpha beta gamma delta epsilon zeta eta theta iota",  // J < 1 superset → keep
      // within-batch SET-equal pair (texts differ, bigram SETS equal:
      // both are {"x y","y x"}) → 13 collapses to 12
      12L -> "x y x y",
      13L -> "x y x y x y").toDF("doc_id", "text")
    val out = Dedup.nearDedupAgainstIndex(batch, "text", "doc_id", index,
        shingleN = 2, minEstJaccard = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(11L, 12L))
    // legacy index without the seth fingerprint: the estimate fallback
    // still drops the exact copy (equal sets ⇒ equal signatures)
    val legacy = Dedup.nearDedupAgainstIndex(batch, "text", "doc_id",
        index.drop("seth"), shingleN = 2, minEstJaccard = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(legacy == Set(11L, 12L))
    // the fingerprint is SET-sensitive, not text-sensitive
    val h = Dedup.shingleSetHash(col("text"), 2)
    val fps = Seq("x y x y", "x y x y x y", "x y z")
      .toDF("text").select(h.as("f")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("editDistanceJoinPairs: full recall vs brute force at maxDist=2") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet").limit(120)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val got = Dedup.editDistanceJoinPairs(cust, "name", "id", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = cust.select(col("id").as("id_a"), col("name").as("n_a"))
    val b = cust.select(col("id").as("id_b"), col("name").as("n_b"))
    val brute = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("n_a"), col("n_b")).cast("long").as("dist"))
      .where(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty) // the sequential fixture names guarantee close pairs
  }

  test("duplicateWindowStats flags planted cross-doc spans, strided window count") {
    import spark.implicits._
    val shared = "X" * 40 // spans windows at strides 0 and 16 in both docs
    val docs = Seq(
      (0L, shared + ("a" * 60)),
      (1L, shared + ("b" * 60)),
      (2L, "c" * 100),      // unique content → no dup windows
      (3L, "tiny")          // shorter than width → no windows, absent row
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateWindowStats(docs, "text", "doc_id", width = 32, stride = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    // len 100 → (100-32) div 16 + 1 = 5 windows per doc
    assert(out(2L) == (5L, 0L))
    // windows at offset 0 ("X"*32) match across docs 0/1; offset 16 mixes
    // X and a/b so only the aligned all-X window duplicates
    assert(out(0L)._1 == 5L && out(0L)._2 >= 1L)
    assert(out(0L)._2 == out(1L)._2)
  }

  test("duplicateSpans merges hit windows into maximal islands; removeDuplicateSpans excises them") {
    import spark.implicits._
    // doc 0/1 share a 48-char prefix (hit windows at 0 and 16 merge into
    // one island [0, 48)); doc 2 is clean; doc 3 shares a MIDDLE span with
    // doc 0 so excision must stitch head + tail around it
    val mid = "M" * 32
    val docs = Seq(
      (0L, ("P" * 48) + ("a" * 16) + mid + ("a" * 16)),
      (1L, ("P" * 48) + ("b" * 80)),
      (2L, "c" * 100),
      (3L, ("d" * 32) + mid + ("e" * 48))).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "text", "doc_id", width = 32, stride = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // doc 0: island [0,48) from the shared prefix; mid sits at offset 64 —
    // NOT stride-aligned to a window in doc 0 (windows at 64 exist: 64%16=0,
    // so [64,96) is a window there) and doc 3 has it at 32 ([32,64) window)
    // — identical 32-char text at aligned strides in both → flagged
    assert(spans.contains((0L, 0L, 48L)), spans.toString)
    assert(spans.contains((0L, 64L, 96L)) && spans.contains((3L, 32L, 64L)), spans.toString)
    assert(!spans.exists(_._1 == 2L))
    val byId = Dedup.removeDuplicateSpans(docs, "text", "doc_id", width = 32, stride = 16)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId(2L) == ("c" * 100, 0L))               // untouched pass-through
    val (c0, n0) = byId(0L)
    assert(n0 == 48L + 32L && c0 == ("a" * 16) + ("a" * 16)) // head island + mid span cut
    val (c3, n3) = byId(3L)
    assert(n3 == 32L && c3 == ("d" * 32) + ("e" * 48))       // middle stitch
    byId.foreach { case (_, (c, n)) => assert(n >= 0 && c != null) }
  }
}

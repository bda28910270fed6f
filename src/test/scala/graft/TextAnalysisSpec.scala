package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head()
  }

  test("tokenCount splits on whitespace runs, trimmed") {
    assert(one("  the quick   brown fox ", TextAnalysis.tokenCount(col("text"))).getLong(0) == 4L)
  }

  test("stopwordRatio and punctRatio") {
    assert(one("the a of xyzzy", TextAnalysis.stopwordRatio(col("text"))).getDouble(0) == 0.75)
    assert(one("ab!?", TextAnalysis.punctRatio(col("text"))).getDouble(0) == 0.5)
  }

  test("qualityScore stays in [0,1]") {
    val texts = Seq("", "!!!", "the cat sat on the mat", ("word " * 200).trim)
    texts.foreach { t =>
      val q = one(t, TextAnalysis.qualityScore(col("text"))).getDouble(0)
      assert(q >= 0.0 && q <= 1.0, s"score $q out of range for '$t'")
    }
  }

  test("langId identifies real-language samples") {
    val cases = Seq(
      "the cat and the dog is in the house with you" -> "en",
      "der hund und die katze ist nicht in das haus" -> "de",
      "el perro y la casa es una cosa que los gatos" -> "es",
      "le chien est dans une maison que les chats pour je" -> "fr",
      "你好世界这是中文文本" -> "zh")
    cases.foreach { case (text, expected) =>
      assert(one(text, TextAnalysis.langId(col("text"))).getString(0) == expected, s"for: $text")
    }
  }

  test("langId returns 'und' for text matching no language markers") {
    assert(one("hello world friends forever", TextAnalysis.langId(col("text"))).getString(0) == "und")
  }

  test("fingerprint is order- and duplication-invariant") {
    val a = one("b a c a", TextAnalysis.fingerprint(col("text"))).getString(0)
    val b = one("c b a", TextAnalysis.fingerprint(col("text"))).getString(0)
    val c = one("c b a d", TextAnalysis.fingerprint(col("text"))).getString(0)
    assert(a == b)
    assert(a != c)
  }

  test("chunks cover the text with the configured overlap") {
    import spark.implicits._
    val text = "x" * 500
    val out  = Seq(text).toDF("text")
      .select(TextAnalysis.chunks(col("text"), chunkSize = 256, stride = 200))
      .head().getSeq[String](0)
    assert(out.length == 3) // ceil(500/200)
    assert(out(0).length == 256 && out(1).length == 256 && out(2).length == 100)
    // consecutive chunks overlap by chunkSize - stride = 56 chars
    assert(out(0).takeRight(56) == out(1).take(56))
    // short text yields exactly one chunk
    val one = Seq("short").toDF("text")
      .select(TextAnalysis.chunks(col("text"), 256, 200)).head().getSeq[String](0)
    assert(one == Seq("short"))
  }

  test("subwordCountApprox counts words, digit runs, punctuation") {
    assert(one("hello, world 42", TextAnalysis.subwordCountApprox(col("text"))).getLong(0) == 4L)
  }

  test("qualityLangKernel is bit-identical to the Catalyst qualityScore + langId") {
    import spark.implicits._
    val fixture = Tables.load(spark, sfDir, "documents").select(col("text"))
    val edges = Seq(
      "", "   ", "...", "!!!?", "the the the", "der die das und ist",
      "le la le les et", "一鿿 mixed 中文 text",
      "tabs\tand\nnewlineshere", "MiXeD CaSe The AND of",
      "numbers 123 456", "😀 emoji a1", "x").toDF("text")
    val all = fixture.unionByName(edges)
    val rows = all.select(
      TextAnalysis.qualityScore(col("text")).as("q_cat"),
      TextAnalysis.langId(col("text")).as("l_cat"),
      TextAnalysis.qualityLangUdf(col("text")).as("ql"))
      .select(col("q_cat"), col("l_cat"), col("ql.quality").as("q_k"), col("ql.lang").as("l_k"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"quality mismatch: catalyst=${r.getDouble(0)} kernel=${r.getDouble(2)}")
      assert(r.getString(1) == r.getString(3),
        s"lang mismatch: catalyst=${r.getString(1)} kernel=${r.getString(3)}")
    }
    assert(rows.length > 500)
  }

  test("piiScrub redacts emails, phones, IPs — email first so digits survive whole") {
    val s = one("mail bob.smith+x@ex.co.uk tel 555-0142 ip 192.168.0.1 done",
      TextAnalysis.piiScrub(col("text"))).getString(0)
    assert(s == "mail <EMAIL> tel <PHONE> ip <IP> done")
    // the email's local-part digits must not be half-eaten by the phone rule
    val s2 = one("x 555-0142@ex.org y", TextAnalysis.piiScrub(col("text"))).getString(0)
    assert(s2 == "x <EMAIL> y", s"got '$s2'")
    // non-PII digits survive
    val s3 = one("version 1.2 of 2024", TextAnalysis.piiScrub(col("text"))).getString(0)
    assert(s3 == "version 1.2 of 2024")
  }

  test("repetitionRatio: looping text high, distinct text zero, degenerate safe") {
    // "the the the" → bigrams ["the the", "the the"] → (2-1)/2 = 0.5
    assert(one("the the the", TextAnalysis.repetitionRatio(col("text"))).getDouble(0) == 0.5)
    assert(one("all words here differ", TextAnalysis.repetitionRatio(col("text"))).getDouble(0) == 0.0)
    // single token: one (truncated) gram, all distinct
    assert(one("x", TextAnalysis.repetitionRatio(col("text"))).getDouble(0) == 0.0)
  }

  test("tfIdf: tf counts repeats, df counts docs, rare terms outscore stopwords") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the the dog"),
      (3L, "the bird flew away")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // 'the' appears twice in doc 2, in all 3 docs → score 2 * (3/3) = 2
    assert(out((2L, "the")) == ((2L, 3L, 2.0)))
    // 'cat' appears once, in 1 doc → score 1 * (3/1) = 3 > any 'the' score
    assert(out((1L, "cat")) == ((1L, 1L, 3.0)))
    assert(out.keys.count(_._2 == "the") == 3)
  }

  test("packSequences: stride-fill rule — chunk joins the sequence its offset starts in") {
    import spark.implicits._
    // doc 1 chunk tokens: 10, 10, 10, 10 with budget 16:
    //   offsets-before 0,10,20,30 → seq 0,0,1,1
    // doc 2 single 40-token chunk: offset 0 → seq 0 (over budget, no gap)
    val chunked = Seq(
      (1L, 0L, 10L), (1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L),
      (2L, 0L, 40L)).toDF("doc_id", "chunk_idx", "n_tokens")
    val packed = TextAnalysis.packSequences(chunked, "doc_id", "chunk_idx", "n_tokens", budget = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(packed == Set((1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 1L), (2L, 0L, 0L)))
  }

  test("packSequences: every sequence except a doc's last reaches the budget") {
    import spark.implicits._
    val chunked = (0L until 50L).map(i => (i % 5, i, 7L)).toDF("doc_id", "chunk_idx", "n_tokens")
    val seqs = TextAnalysis.packSequences(chunked, "doc_id", "chunk_idx", "n_tokens", budget = 20L)
      .groupBy("doc_id", "seq_idx").agg(sum("n_tokens").as("tot"))
    val maxSeq = seqs.groupBy("doc_id").agg(max("seq_idx").as("last")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    seqs.collect().foreach { r =>
      val (doc, seq, tot) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (seq != maxSeq(doc)) assert(tot >= 20L, s"non-final seq $seq of doc $doc under budget: $tot")
    }
  }

  test("contamination counts shared eval/train n-grams; clean docs report zero") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),          // eval: shares trigrams with doc 1
      (1L, "alpha beta gamma delta epsilon"),  // train
      (10L, "zz yy xx ww"),                    // eval: no shared grams
      (3L, "totally different words here")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(docs, "text", "doc_id",
        isEval = col("doc_id") % 10 === 0, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 0 grams: "alpha beta gamma", "beta gamma delta" — both in doc 1
    assert(out(0L) == ((2L, 2L, 1L)))
    assert(out(10L) == ((2L, 0L, 0L)))
    assert(!out.contains(1L) && !out.contains(3L)) // train docs don't report
  }

  test("contamination: null-text rows are ignored on both sides") {
    import spark.implicits._
    val docs = Seq((0L, null: String), (1L, "a b c"), (20L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(docs, "text", "doc_id",
        isEval = col("doc_id") % 10 === 0, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(20L -> 1L)) // null eval doc absent; doc 20 matches doc 1
  }

  test("contaminationBloom is bit-identical to the exact contamination plan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val isEval = col("doc_id") % 10 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val exact = rows(TextAnalysis.contamination(docs, "text", "doc_id", isEval, n = 3))
    // a tight fpp AND a sloppy one — false positives must never show through
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = rows(TextAnalysis.contaminationBloom(docs, "text", "doc_id", isEval, n = 3, fpp))
      assert(bloom == exact, s"bloom(fpp=$fpp) diverged from exact")
    }
    assert(exact.nonEmpty)
  }

  test("contaminationFraction: exact severity ratios; sloppy bloom never shows through") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),              // eval
      (1L, "alpha beta gamma delta epsilon"),      // train: 2 of 3 grams shared
      (2L, "alpha beta gamma"),                    // train: 1 of 1 shared (full copy)
      (3L, "totally different words entirely ok"), // train: 0 shared
      (4L, "xy"),                                  // train: sub-n doc = 1 whole-doc gram
      (5L, null: String)).toDF("doc_id", "text")   // train: null text → absent
    for (fpp <- Seq(0.01, 0.5)) { // fpp 0.5 floods false positives at the confirm join
      val out = TextAnalysis.contaminationFraction(docs, "text", "doc_id",
          isEval = col("doc_id") === 0L, n = 3, fpp = fpp)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(out(1L) == ((3L, 2L, 0.666667)), s"fpp=$fpp: ${out(1L)}")
      assert(out(2L) == ((1L, 1L, 1.0)))
      assert(out(3L) == ((3L, 0L, 0.0)))
      assert(out(4L) == ((1L, 0L, 0.0)))
      assert(!out.contains(0L) && !out.contains(5L))
    }
  }

  test("htmlExtract strips script/style content, comments, tags; decodes entities safely") {
    def x(h: String) = one(h, TextAnalysis.htmlExtract(col("text"))).getString(0)
    assert(x("<p>Hello <b>world</b></p>") == "Hello world")
    assert(x("<script>if (1 < 2) alert('x');</script>after") == "after")
    assert(x("<style type=\"a\">p { color: red }</style>text") == "text")
    assert(x("a<!-- hidden <b>bold</b> -->b") == "a b")
    assert(x("x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end") ==
      "x & y <tag> \"q\" 's' end")
    // double-encoded entity must single-decode (& LAST in the chain)
    assert(x("&amp;lt;") == "&lt;")
    assert(x("  spaced\n\tout  ") == "spaced out")
    // multi-line script block (the (?s) flag) and nested tags inside it
    assert(x("<script>\nvar a = \"<div>\";\n</script>kept") == "kept")
  }

  test("buildVocab: ids dense in (count desc, token asc) order, minCount prunes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b  c d"),
      (3L, null: String),
      (4L, "   ")).toDF("doc_id", "text")
    val v = TextAnalysis.buildVocab(docs, "text", minCount = 1, numParts = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // counts: b=4, a=3, c=2, d=1; blank text contributes nothing
    assert(v.sortBy(_._3).toSeq == Seq(("b", 4L, 0L), ("a", 3L, 1L), ("c", 2L, 2L), ("d", 1L, 3L)))
    val pruned = TextAnalysis.buildVocab(docs, "text", minCount = 2, numParts = 4)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(pruned.sortBy(_._2).toSeq == Seq(("b", 0L), ("a", 1L), ("c", 2L)))
  }

  test("ngramLmScore: hand-computed corpus LM mean-probability scores") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcabc"),        // grams: abc bca cab abc
      (2L, "abc"),           // grams: abc
      (3L, null: String),    // excluded
      (4L, "  "))            // excluded (empty after trim)
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmScore(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // LM: abc→3, bca→1, cab→1; total = 5
    // doc 1: n_grams 4, hits 3+1+1+3 = 8, score 8/(4·5) = 0.4
    // doc 2: n_grams 1, hits 3, score 3/(1·5) = 0.6
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((4L, 8L, 0.4)))
    assert(out(2L) == ((1L, 3L, 0.6)))
  }

  test("ngramLmScore: sub-width text forms one truncated gram") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "ab")).toDF("doc_id", "text")
    val out  = TextAnalysis.ngramLmScore(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // both docs: the single gram "ab" with corpus count 2, total 2 → 2/(1·2)=1
    assert(out == Set((1L, 2L, 1.0)))
  }

  test("bm25: hand-checked score on a two-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "cat dog"), (2L, "cat cat fish")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "text", "doc_id", k1 = 1.2, b = 0.75)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(5))).toMap
    // n_docs=2, avgdl=2.5. "dog": df=1, idf=(2-1+0.5)/(1+0.5)=1.0; doc1 dl=2,
    // tf=1 → norm=2/2.5=0.8, denom=1+1.2*(0.25+0.75*0.8)=2.02,
    // score=1.0*(1*2.2/2.02)=1.089109 (rounded 6)
    assert(math.abs(out((1L, "dog")) - 1.089109) < 1e-6)
    // "cat" appears in both docs: df=2, idf=(2-2+0.5)/(2+0.5)=0.2
    // doc2: tf=2, dl=3, norm=1.2, denom=2+1.2*(0.25+0.9)=3.38,
    // score=0.2*(2*2.2/3.38)=0.260355
    assert(math.abs(out((2L, "cat")) - 0.260355) < 1e-6)
    // rarer token outranks the common one at equal tf
    assert(out((1L, "dog")) > out((1L, "cat")))
  }

  test("bm25: null text and blank docs contribute nothing") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.bm25(docs, "text", "doc_id")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("invertedIndex: sorted distinct postings with df") {
    import spark.implicits._
    val docs = Seq((3L, "b a b"), (1L, "a c"), (2L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "text", "doc_id")
      .orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("a", 3L, "1,2,3"), ("b", 1L, "3"), ("c", 1L, "1")))
  }

  test("gopherFlags: hand-computed metrics, each rule rejects independently") {
    import spark.implicits._
    val good  = ("the quick brown fox jumps over the lazy dog today " * 6).trim // 60 words, mean 4.0, 12 stop hits
    val stopy = ("the and of to in is it that for on " * 6).trim               // 60 words, mean 2.5 → mean-len reject
    val short = "alpha beta gamma delta epsilon"                               // 5 words → word-count reject
    val nums  = ("12345 67890 " * 30).trim                                     // 60 words, alpha 0.0 → alpha reject
    val docs = Seq((1L, good), (2L, stopy), (3L, short), (4L, nums)).toDF("doc_id", "text")
    val out = docs
      .select($"doc_id", TextAnalysis.gopherFlags($"text").as("g"))
      .select($"doc_id", $"g.n_words", $"g.mean_word_len", $"g.stop_hits",
        $"g.alpha_ratio", $"g.keep")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(out(0) == ((1L, 60L, 4.0, 12L, 1.0, true)))
    assert(out(1) == ((2L, 60L, 2.5, 60L, 1.0, false)))
    assert(out(2) == ((3L, 5L, 5.2, 0L, 1.0, false)))
    assert(out(3) == ((4L, 60L, 5.0, 0L, 0.0, false)))
  }

  test("extractDomains: lowercased hosts, both schemes, path/port stripped, no-URL text empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "see HTTP://Example.COM/a/b and https://Sub.Host.org?q=1 done"),
      (2L, "no urls here"),
      (3L, "https://a-b.c99.net/x http://a-b.c99.net/y")).toDF("doc_id", "text")
    val got = docs.select($"doc_id", TextAnalysis.extractDomains($"text").as("ds"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
    assert(got(0) == ((1L, Seq("example.com", "sub.host.org"))))
    assert(got(1) == ((2L, Seq())))
    assert(got(2) == ((3L, Seq("a-b.c99.net", "a-b.c99.net")))) // duplicates preserved
  }

  private val sennrichCorpus: String =
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")

  test("bpeTrain learns the classic Sennrich merge sequence, ties lexicographic") {
    import spark.implicits._
    val df = Seq((1L, sennrichCorpus)).toDF("doc_id", "text")
    // pair counts: (e,s)=9 ties (s,t)=9 → lex picks (e,s); then (es,t)=9;
    // then (l,o)=7 ties (o,w)=7 → (l,o); then (lo,w)=7
    val merges = TextAnalysis.bpeTrain(df, "text", numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("bpeTrain distributed path learns the identical merge sequence") {
    import spark.implicits._
    val df = Seq((1L, sennrichCorpus)).toDF("doc_id", "text")
    // maxDriverVocab = 0 forces the distributed merge loop
    val merges = TextAnalysis.bpeTrain(df, "text", numMerges = 4, maxDriverVocab = 0)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("bpeTrain driver and distributed trainers agree merge-for-merge on a real corpus") {
    // the >maxDriverVocab fallback must be SEMANTICALLY identical, not just
    // pass the 4-merge toy sequence: train a deeper table on the messy
    // synthetic corpus through both paths (ties included) and compare
    // position-by-position
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(150)
    val driver      = TextAnalysis.bpeTrain(docs, "text", numMerges = 24)
    val distributed = TextAnalysis.bpeTrain(docs, "text", numMerges = 24, maxDriverVocab = 0)
    assert(driver.size == 24)
    assert(driver == distributed,
      s"first divergence at ${driver.zip(distributed).indexWhere(p => p._1 != p._2)}")
  }

  test("bpeTrain stops early when every word is a single symbol") {
    import spark.implicits._
    val df = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "text", numMerges = 10)
    assert(merges == Seq(("a", "b"))) // one possible merge, then exhausted
  }

  test("bpeEncodeUdf segments unseen words by rank order; null text stays null") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val enc = TextAnalysis.bpeEncodeUdf(merges)
    val df = Seq((1L, "lowest"), (2L, "newest wider"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.select($"id", enc($"text").as("toks")).orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[String](1).toSeq))
    assert(got(0) == ((1L, Seq("low", "est"))))
    assert(got(1) == ((2L, Seq("n", "e", "w", "est", "w", "i", "d", "e", "r"))))
    assert(got(2) == ((3L, null)))
  }

  test("typeTokenRatio: distinct over total tokens") {
    assert(one("a a b c", TextAnalysis.typeTokenRatio(col("text"))).getDouble(0) == 0.75)
    assert(one("same same same same", TextAnalysis.typeTokenRatio(col("text"))).getDouble(0) == 0.25)
  }

  test("charEntropy: 0 for constant text, ln 2 for a two-symbol balance") {
    assert(one("aaaa", TextAnalysis.charEntropy(col("text"))).getDouble(0) == 0.0)
    val ln2 = BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one("aabb", TextAnalysis.charEntropy(col("text"))).getDouble(0) == ln2)
    // no phantom empty-string char from Spark's trailing-empty split
    assert(one("ab", TextAnalysis.charEntropy(col("text"))).getDouble(0) == ln2)
  }

  test("zipfSlope matches a hand-computed OLS fit of ln(count) on ln(rank)") {
    import spark.implicits._
    // counts: aa=4, bb=2, cc=1 → ranks 1,2,3
    val df = Seq((1L, "aa aa aa aa bb bb cc")).toDF("doc_id", "text")
    val row = TextAnalysis.zipfSlope(df, "text").head()
    val (xs, ys) = (Seq(1.0, 2.0, 3.0).map(math.log), Seq(4.0, 2.0, 1.0).map(math.log))
    val (mx, my) = (xs.sum / 3, ys.sum / 3)
    val want = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(row.getDouble(0) - want) < 1e-6)
    assert(row.getLong(1) == 3L)
  }

  test("bigramPmi: hand-checked counts on a 4-token corpus") {
    import spark.implicits._
    // tokens x y x y: bigrams (x,y)×2, (y,x)×1; uni x=2 y=2; n1=4, n2=3
    val df = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramPmi(df, "text", minCount = 1)
      .orderBy(desc("pmi")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def pmi(cab: Double) = BigDecimal(math.log(cab * 4 * 4 / (3 * 2 * 2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("x", "y", 2L, pmi(2)), ("y", "x", 1L, pmi(1))))
  }

  test("piiCount audits what piiScrub redacts") {
    val s = "mail bob.smith+x@corp.example.org from 192.168.0.1 call 555-1234 done"
    assert(one(s, TextAnalysis.piiScrub(col("text"))).getString(0) ==
      "mail <EMAIL> from <IP> call <PHONE> done")
    assert(one(s, TextAnalysis.piiCount(col("text"))).getLong(0) == 3L)
    val clean = "no pii in this sentence at all"
    assert(one(clean, TextAnalysis.piiScrub(col("text"))).getString(0) == clean)
    assert(one(clean, TextAnalysis.piiCount(col("text"))).getLong(0) == 0L)
  }

  test("stripBoilerplate drops lines above the doc-frequency cutoff, keeps order") {
    import spark.implicits._
    val docs = Seq(
      (0L, "banner\nalpha\ntail 0"),
      (1L, "banner\nbeta\ntail 1"),
      (2L, "banner\ngamma\ntail 2")).toDF("id", "text")
    val out = TextAnalysis.stripBoilerplate(docs, "text", "id", maxDocFreq = 2)
      .orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("alpha\ntail 0", "beta\ntail 1", "gamma\ntail 2"))
    // the cutoff is strict: a line in exactly maxDocFreq docs survives
    val kept = TextAnalysis.stripBoilerplate(docs, "text", "id", maxDocFreq = 3)
      .orderBy("id").collect().map(_.getString(1))
    assert(kept.toSeq == Seq(
      "banner\nalpha\ntail 0", "banner\nbeta\ntail 1", "banner\ngamma\ntail 2"))
  }

  test("normalizeText: case/punct/space-insensitive canonical form, idempotent") {
    val a = one("  Hello,   WORLD!! 42 ", TextAnalysis.normalizeText(col("text"))).getString(0)
    assert(a == "hello world 42")
    // idempotence: normalizing a normalized form is the identity
    val b = one(a, TextAnalysis.normalizeText(col("text"))).getString(0)
    assert(b == a)
  }

  test("c4Clean keeps punctuated >=minWords lines, drops brace/lorem/thin pages") {
    def clean(s: String) = one(s, TextAnalysis.c4Clean(col("text"), minWords = 3, minLines = 2))
      .getStruct(0)
    val good = clean("one two three.\nshort.\nno terminal punct here\nfour five six ok!\nx y z?")
    assert(good.getBoolean(1) && good.getLong(2) == 3L)
    assert(good.getString(0) == "one two three.\nfour five six ok!\nx y z?")
    // fewer than minLines survivors → page dropped, text null
    val thin = clean("one two three.\nnope\nnah")
    assert(!thin.getBoolean(1) && thin.isNullAt(0))
    // curly brace anywhere → dropped even with enough good lines
    val code = clean("one two three.\nfour five six.\nvar f = { a: 1 }")
    assert(!code.getBoolean(1))
    // lorem ipsum, case-insensitive → dropped
    val lorem = clean("one two three.\nfour five six.\nLoReM IpSuM dolor sit.")
    assert(!lorem.getBoolean(1))
  }

  test("domainAffinity ranks target-vocabulary docs above off-domain docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha alpha beta", true),   // target docs use alpha/beta
      (1L, "alpha beta beta", true),
      (2L, "gamma delta gamma", false), // off-domain vocabulary
      (3L, "alpha beta gamma", false)   // mixed
    ).toDF("doc_id", "text", "tgt")
    val m = TextAnalysis.domainAffinity(docs, "text", "doc_id", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.size == 4)
    // pure-target vocab docs score highest, pure-off-domain lowest
    assert(m(0L) > m(3L) && m(1L) > m(3L) && m(3L) > m(2L))
    // off-domain-only grams have zero target mass → affinity exactly 0
    assert(m(2L) == 0.0)
  }

  test("charGramCounts kernel ≡ Catalyst charGram explode + count") {
    val docs = Tables.load(spark, sfDir, "documents")
      .where(col("text").isNotNull).limit(100)
    val t = trim(lower(col("text")))
    val hof = docs.select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(length(t) - 2, lit(1))), i => t.substr(i, lit(3)))).as("gram"))
      .groupBy("doc_id", "gram").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val kudf = org.apache.spark.sql.functions.udf(
      (s: String) => TextAnalysis.charGramCounts(s, 3))
    val kernel = docs.select(col("doc_id"), explode(kudf(col("text"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong)).toSet
    assert(kernel == hof)
    // substr end-truncation edge: len < n yields the whole string once
    assert(TextAnalysis.charGramCounts(" ab ", 3) == Map("ab" -> 1))
  }

  test("decontaminateDrop scores train docs by eval-gram overlap") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox", true),   // eval
      (1L, "the quick brown dog runs", false), // shares 'the quick brown'
      (2L, "completely different words here", false), // clean
      (3L, "quick brown fox jumps", false) // shares 'quick brown fox'
    ).toDF("doc_id", "text", "ev")
    val m = TextAnalysis.decontaminateDrop(docs, "text", "doc_id", col("ev"), n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m.keySet == Set(1L, 2L, 3L)) // eval docs not scored
    assert(m(1L) == ((1L, 0L)) && m(3L) == ((1L, 0L))) // contaminated at minShared=1
    assert(m(2L) == ((0L, 1L)))                        // clean survives
  }

  test("canonicalizeUrl: case, tracking params, order, fragment, slash all collapse") {
    def canon(u: String) =
      Option(one(u, TextAnalysis.canonicalizeUrl(col("text"))).get(0)).map(_.toString)
    val want = Some("http://site.example.com/a?a=1&b=2")
    assert(canon("HTTP://Site.Example.COM/a?utm_source=x&b=2&a=1#frag") == want)
    assert(canon("http://site.example.com/a/?a=1&b=2") == want)
    assert(canon("http://site.example.com/a?b=2&a=1&gclid=zz") == want)
    // no query → no '?'
    assert(canon("https://Host.com/path#x") == Some("https://host.com/path"))
    // all params tracking → query dropped entirely
    assert(canon("http://h.com/p?utm_campaign=c&fbclid=f") == Some("http://h.com/p"))
    // malformed (no scheme) → null
    assert(canon("not a url").isEmpty)
  }

  test("dedupDocLines keeps first occurrence of each line, in order") {
    val got = one("b\na\nb\nc\na\nb", TextAnalysis.dedupDocLines(col("text"))).getString(0)
    assert(got == "b\na\nc")
  }

  test("packExamples: budget respected, FFD beats naive, layout-invariant") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, 50L + (i * 37) % 400)).toDF("doc_id", "n")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.packExamples(d, "doc_id", "n", budget = 512, buckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run(docs)
    assert(out.length == 200)
    // no bin exceeds the budget
    val perBin = out.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    assert(perBin.values.forall(_ <= 512L))
    // FFD fill beats the one-doc-per-bin degenerate packing by a wide margin
    val total = out.map(_._2).sum.toDouble
    assert(total / (perBin.size * 512.0) > 0.7, s"fill ${total / (perBin.size * 512)}")
    // reproducible across upstream layouts
    assert(run(docs.repartition(13)).toSet == out.toSet)
    // over-budget doc rejected loudly
    val ex = intercept[IllegalArgumentException] {
      run(Seq((0L, 600L)).toDF("doc_id", "n"))
    }
    assert(ex.getMessage.contains("budget"))
  }

  test("compressionRatio orders repetitive text below prose-like text") {
    import spark.implicits._
    val df = Seq(
      (0L, "spark " * 200),                                   // degenerate repetition
      (1L, (0 until 200).map(i => s"w${i * 7919 % 997}").mkString(" ")), // varied
      (2L, ""), (3L, null.asInstanceOf[String])).toDF("id", "text")
    val m = df.select(col("id"), TextAnalysis.compressionRatioUdf(col("text")).as("z"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(m(0L).get < 0.1, s"repetitive ${m(0L)}")
    assert(m(1L).get > m(0L).get * 3, s"varied ${m(1L)} vs ${m(0L)}")
    assert(m(2L).contains(1.0) && m(3L).isEmpty)
  }

  test("heavyHitters: MG-pruned result equals brute-force groupBy at several supports") {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs.where(col("text").isNotNull)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
    val total = toks.count().toDouble
    for (support <- Seq(0.001, 0.005, 0.02)) {
      val brute = toks.groupBy("token").count()
        .where(col("count").cast("double") > support * total)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val hh = TextAnalysis.heavyHitters(docs, "text", support)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hh == brute, s"support=$support: ${hh.size} vs ${brute.size}")
    }
    // skew-free sanity: a corpus where NOTHING crosses the threshold
    import spark.implicits._
    val uniform = (1 to 50).map(i => (i.toLong, s"tok$i unique$i")).toDF("doc_id", "text")
    assert(TextAnalysis.heavyHitters(uniform, "text", support = 0.5).count() == 0L)
  }

  test("normalizeNfc composes decomposed sequences; stripAccents folds both spellings; null passes") {
    import spark.implicits._
    val composed   = "caf\u00e9"      // e-acute as one code point
    val decomposed = "cafe\u0301"     // e + combining acute
    val df = Seq((1L, decomposed), (2L, composed), (3L, "mühle"), (4L, null))
      .toDF("id", "t")
    val out = df.select(col("id"),
        TextAnalysis.normalizeNfc(col("t")).as("nfc"),
        TextAnalysis.stripAccents(col("t")).as("st"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == ((composed, "cafe")))    // NFC composes; accent folds
    assert(out(2L) == ((composed, "cafe")))    // composed input is a fixpoint
    assert(out(3L)._2 == "muhle")              // diaeresis folds too
    assert(out(4L) == ((null, null)))
    // the dedup motivation: NFC makes the two spellings hash-identical
    assert(out(1L)._1 == out(2L)._1 && composed != decomposed)
  }

  test("winnowing: kernel matches the relational window-min form on fixtures") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val kern = TextAnalysis.winnowFingerprints(docs, "text", "doc_id", k = 8, w = 16)
      .collect().map(_.toSeq).toSet
    val rel = TextAnalysis.winnowFingerprintsRelational(
        docs.select(col("doc_id"), col("text")), "text", "doc_id", k = 8, w = 16)
      .collect().map(_.toSeq).toSet
    assert(kern.nonEmpty && kern == rel,
      s"kernel ${kern.size} vs relational ${rel.size}; diff sample: ${(kern diff rel).take(3)} / ${(rel diff kern).take(3)}")
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 substring share a fingerprint; gaps bounded by w") {
    import spark.implicits._
    val shared = "the common stretch of text that both documents carry verbatim"
    assert(shared.length >= 16 + 8 - 1)
    val df = Seq(
      (1L, "first document prefix aaaa " + shared + " and a distinct tail zzz"),
      (2L, "completely different opening qqqq " + shared + " different ending yyy"),
      (3L, "no overlap here at all - this text shares nothing with the others beyond stopwords")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "text", "doc_id", k = 8, w = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val f1 = fps.collect { case (1L, fp) => fp }.toSet
    val f2 = fps.collect { case (2L, fp) => fp }.toSet
    val f3 = fps.collect { case (3L, fp) => fp }.toSet
    assert((f1 & f2).nonEmpty, "shared substring must yield a shared fingerprint")
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty, "unrelated docs should not collide at these sizes")
    // density guarantee: every w-window selects, so consecutive selected
    // positions are at most w apart
    val pos1 = TextAnalysis.winnowFingerprints(df.where(col("doc_id") === 1), "text", "doc_id", k = 8, w = 16)
      .orderBy("pos").collect().map(_.getLong(1))
    assert(pos1.zip(pos1.tail).forall { case (a, b) => b - a <= 16 }, pos1.toSeq.toString)
  }

  test("winnowStats: n_shared counts distinct cross-doc hashes, zero for unrelated docs") {
    import spark.implicits._
    val shared = "the common stretch of text that both documents carry verbatim"
    val df = Seq(
      (1L, "first document prefix aaaa " + shared + " and a distinct tail zzz"),
      (2L, "completely different opening qqqq " + shared + " different ending yyy"),
      (3L, "no overlap here at all - this text shares nothing with the others beyond stopwords")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.winnowStats(df, "text", "doc_id", k = 8, w = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L)._2 > 0 && rows(2L)._2 > 0, rows.toString)
    assert(rows(3L)._2 == 0, rows.toString)
    assert(rows.values.forall { case (nFp, nSh) => nSh <= nFp })
  }
}

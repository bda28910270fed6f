package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language identification, fingerprinting. Pure Catalyst
  * expressions (pushdown/prune/codegen like any built-in; the only shuffles
  * are whatever aggregation the caller adds on top) — with two deliberate
  * escape hatches mirroring `Dedup`'s kernel rationale: [[qualityLangUdf]]
  * (fused per-row scoring kernel) and the DataFrame-level [[tfIdf]].
  */
object TextAnalysis {

  /** Whitespace tokenizer (lowercased). `\s+` on trimmed text matches the
    * DuckDB oracle's `string_split_regex(trim(lower(text)), '\s+')`. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count heuristic: words + digit runs + punctuation
    * marks counted separately (a cheap stand-in for a real tokenizer's
    * token count, useful for budget estimates). */
  def subwordCountApprox(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Public so the DuckDB oracle SQL is generated from the same constant. */
  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "be", "this", "are")

  /** Fraction of tokens that are (English) stopwords — a standard
    * natural-language-ness signal in corpus quality filters. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(
        size(filter(t, w => w.isInCollection(stopwordsEn))).cast("double") /
          size(t).cast("double"))
  }

  /** Fraction of non-whitespace characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column = {
    val stripped = regexp_replace(lower(text), "[a-z0-9\\s]", "")
    val nonWs    = regexp_replace(lower(text), "\\s", "")
    when(length(nonWs) === 0, lit(0.0))
      .otherwise(length(stripped).cast("double") / length(nonWs).cast("double"))
  }

  /** Composite document quality score in [0,1]: length signal + low-punct
    * signal + stopword-presence signal. Deterministic double arithmetic —
    * the DuckDB oracle replicates the identical formula. */
  def qualityScore(text: Column): Column = {
    val lengthScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val punctScore  = lit(1.0) - punctRatio(text)
    val stopScore   = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    round(lengthScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3), 6)
  }

  /** Per-language marker tokens for the n-gram/stopword language-ID
    * heuristic. Small closed sets keep the generated `In` predicates
    * codegen-friendly. */
  private[graft] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "you", "that", "with", "this", "have"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "una", "y", "con"),
    "fr" -> Seq("le", "les", "et", "est", "une", "que", "dans", "pour", "je"))

  /** Heuristic language ID: argmax over marker-token hit counts, with a CJK
    * character-range detector for zh. Returns a language code column. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val scores = langMarkers.map { case (lang, ws) =>
      struct(
        size(filter(t, w => w.isInCollection(ws))).cast("double").as("score"),
        lit(lang).as("lang"))
    }
    // CJK codepoints are strong evidence: weight 2 per character.
    val zh = struct(
      (length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) * 2).cast("double").as("score"),
      lit("zh").as("lang"))
    // Fallback floor: text matching no markers at all scores below 0.5 for
    // every language and classifies as "und" (undetermined) — without this,
    // the all-zero tie would resolve to the lexicographically greatest code
    // and label markerless Latin text as zh.
    val und = struct(lit(0.5).as("score"), lit("und").as("lang"))
    // greatest() over (score, lang) structs: max score, ties → lexicographically
    // greatest language code (deterministic).
    greatest((scores :+ zh :+ und): _*).getField("lang")
  }

  /** Split text into fixed-size character chunks on a stride, with overlap
    * `chunkSize - stride` — the standard LLM-corpus chunking shape. Returns
    * an array column; pair with `posexplode` for (chunk_idx, chunk) rows.
    * Pure per-row Catalyst expressions: chunking 100 TB is a map-side
    * projection, no shuffle. */
  def chunks(text: Column, chunkSize: Int, stride: Int): Column = {
    require(stride > 0 && chunkSize >= stride, "need chunkSize >= stride > 0")
    val nChunks = greatest(ceil(length(text).cast("double") / lit(stride)).cast("int"), lit(1))
    transform(sequence(lit(0), nChunks - 1), i => text.substr(i * stride + 1, lit(chunkSize)))
  }

  /** PII patterns for corpus scrubbing (emails, phone-shaped numbers, IPv4),
    * each RE2-compatible so an external engine applies them identically —
    * the pre-training hygiene pass every public corpus pipeline runs (C4
    * strips lines by pattern; this is the redaction variant). Order matters:
    * emails go first so their digits can't be half-eaten by the phone rule. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    // the optional second dash group captures full NANP-style 3-3-4
    // numbers; without it "555-867-5309" half-redacted to
    // "<PHONE>-5309", leaving identifiable digits in the corpus
    "\\b\\d{3}-\\d{2,4}(?:-\\d{2,4})?\\b" -> "<PHONE>")

  /** Redact PII spans with typed tags. Pure per-row Catalyst `regexp_replace`
    * chain — scrubbing 100 TB is a map-side projection, no shuffle. */
  def piiScrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Extract normalized URL hosts from text: every `http(s)://host` match,
    * lowercased (URL authority is case-insensitive). RE2-safe ASCII pattern
    * so an external engine extracts the identical set; pure map-side
    * `regexp_extract_all`. The building block of domain-level corpus
    * hygiene — blocklist filtering and per-domain quotas both join on the
    * host this returns (see `q_url_filter` / `Relational.groupQuota`). */
  val urlHostPattern = "https?://([a-z0-9.-]+)"
  def extractDomains(text: Column): Column =
    regexp_extract_all(lower(text), lit(urlHostPattern), lit(1))

  /** Duplicated word-n-gram fraction in [0,1] — the repetition signal of
    * Gopher/C4-style quality filtering (a looping generation or boilerplate
    * page repeats its n-grams; natural prose doesn't). 0 = all n-grams
    * distinct. Gram construction matches the near-dedup shingler: positions
    * `1..max(len-(width-1),1)`, the final gram truncated on short texts. */
  def repetitionRatio(text: Column, gramWidth: Int = 2): Column = {
    require(gramWidth >= 1, s"gramWidth must be >= 1, got $gramWidth")
    val tk    = tokens(text)
    val grams = transform(
      sequence(lit(1), greatest(size(tk) - (gramWidth - 1), lit(1))),
      i => concat_ws(" ", slice(tk, i, lit(gramWidth))))
    (size(grams) - size(array_distinct(grams))).cast("double") /
      size(grams).cast("double")
  }

  /** Gopher-style composite quality rules (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", table A1 — word-count bounds, mean-word-
    * length band, stopword floor, alpha-word floor), restricted to the
    * word-level subset since the fixture corpus has no line structure.
    * Returns a struct of the per-document metrics plus the combined `keep`
    * verdict, so a pipeline can either filter on `keep` or log the metric
    * distribution. Pure map-side Catalyst expressions — filtering 100 TB is
    * a projection + predicate, no shuffle; the only doubles are two final
    * divisions of exact integer counts, so the DuckDB oracle reproduces
    * every value bit-exactly. */
  def gopherFlags(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopHits: Int = 2, minAlphaRatio: Double = 0.8): Column = {
    val tk        = tokens(text)
    val nWords    = size(tk).cast("long")
    // Total in-word characters = length of the text with all whitespace
    // removed (tokens are whitespace-delimited, so nothing else is lost).
    val wordChars = length(regexp_replace(trim(lower(text)), "\\s", "")).cast("long")
    val meanLen   = wordChars.cast("double") / nWords.cast("double")
    val stopHits  = size(filter(tk, w => w.isInCollection(stopwordsEn))).cast("long")
    val alphaRatio =
      size(filter(tk, w => w.rlike("[a-z]"))).cast("double") / nWords.cast("double")
    val keep = nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      stopHits >= minStopHits && alphaRatio >= minAlphaRatio
    struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
      stopHits.as("stop_hits"), alphaRatio.as("alpha_ratio"), keep.as("keep"))
  }

  /** Canonical bag-of-words fingerprint: sha256 over the sorted distinct
    * lowercase token set. Two documents with the same token set (any order,
    * any duplication) collide — the classic "fingerprint dedup" canonical
    * form. */
  def fingerprint(text: Column): Column =
    sha2(array_join(array_sort(array_distinct(tokens(text))), " "), 256)

  /** Character n-gram positions 1..max(len-(n-1), 1) over trimmed lowered
    * text, WITH duplicates (counts matter here, unlike the shingle sets). */
  private def charGrams(text: Column, n: Int): Column = {
    val t = trim(lower(text))
    transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))), i => t.substr(i, lit(n)))
  }

  /** Counting kernel replicating [[charGrams]] + per-doc counting in one
    * pass: grams of `trim(lower(text))` at positions 1..max(len-(n-1),1),
    * the final gram truncated at the string end exactly as `substr` does.
    * Locale.ROOT lowercasing — same parity contract (and caveat) as
    * [[qualityLangKernel]]. Trim is [[Dedup.sparkTrim]] (0x20 spaces only),
    * NOT `String.trim` — Catalyst/DuckDB `trim` keeps edge tabs/newlines
    * and the kernel must count the same grams they do. */
  private[graft] def charGramCounts(text: String, n: Int): Map[String, Int] = {
    val t    = Dedup.sparkTrim(text).toLowerCase(java.util.Locale.ROOT)
    val len  = t.length
    val last = math.max(len - (n - 1), 1)
    val m    = new java.util.HashMap[String, Int]()
    var i = 1
    while (i <= last && len > 0) {
      val g = t.substring(i - 1, math.min(i - 1 + n, len))
      m.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }

  /** Corpus-LM quality score — the CCNet/Wikipedia-LM perplexity-filter
    * shape without a pretrained model: build a character n-gram language
    * model FROM the corpus itself, then score each document by how typical
    * its grams are. Score = sum(corpus_count(gram)) / (n_grams_doc · N) —
    * the arithmetic MEAN gram probability. The mean (not the geometric/
    * log-perplexity form) is deliberate: numerator and both denominator
    * factors are exact integers, so the score is ONE double division and
    * bit-reproducible in any engine — no `ln` whose last-ulp behavior
    * differs across libms (same rationale as [[tfIdf]]'s ratio idf).
    * Boilerplate/looping text scores high, rare-charset junk scores low.
    *
    * Plan shape (100 TB): the gram explode never shuffles at full width —
    * partial aggregation collapses it map-side to ≤ charset^n rows per
    * partition for the LM build and to per-doc partials for the scoring
    * pass; the LM itself (≤ charset^n rows) broadcasts. The 1-row total
    * joins in-plan (no driver collect). Long-range overflow: hits ≤
    * n_grams_doc · max_count and n_grams_doc · N — both < 2^63 until the
    * corpus exceeds ~10^14 grams × 10^3-gram docs; beyond that switch the
    * product to DECIMAL(38,0).
    *
    * Output: (idCol, n_grams, hits, lm_score), null/empty-text rows
    * excluded. */
  def ngramLmScore(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"gram width must be >= 1, got $n")
    // Per-doc gram counts come from ONE pass of a tight counting kernel
    // (the qualityLangUdf escape-hatch rationale): the HOF form explodes
    // every gram occurrence (len-2 rows per doc) through an interpreted
    // substring lambda and then shuffles (id, gram) pairs to count them —
    // the kernel emits the already-counted per-doc map, so the explode is
    // distinct-grams-sized and the (id, gram) count shuffle disappears.
    // Value-identical (exact integer counts over the same trim/lower
    // grams; CharGram parity asserted in TextAnalysisSpec). The skinny
    // (id, gram, n) frame feeds the LM build AND the scoring join; it is
    // materialized once (eager localCheckpoint) so the kernel runs one
    // time, not once per plan branch.
    val gramCountsUdf = udf((s: String) => charGramCounts(s, n))
    val tf = docs
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(gramCountsUdf(col(textCol))))
      .select(col(idCol), col("key").as("gram"), col("value").cast("long").as("n"))
      .localCheckpoint(true)
    val lm    = tf.groupBy("gram").agg(sum("n").as("cnt"))
    val total = lm.agg(sum("cnt").cast("long").as("total"))
    tf.join(broadcast(lm), Seq("gram"))
      .groupBy(idCol)
      .agg(sum("n").cast("long").as("n_grams"),
        sum(col("n") * col("cnt")).cast("long").as("hits"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_grams"), col("hits"),
        (col("hits").cast("double") / (col("n_grams") * col("total")).cast("double"))
          .as("lm_score"))
  }

  /** Fused (quality, lang) result of [[qualityLangUdf]]. */
  case class QualityLang(quality: Double, lang: String)

  /** Tight-loop JVM kernel computing [[qualityScore]] AND [[langId]] in ONE
    * pass over the text — the corpus-prep hot path. The Catalyst forms
    * re-tokenize and re-scan the text six times (stopword filter, punct
    * regexes, four marker filters), all interpreted HOFs; the kernel does
    * one tokenization + one character scan (same escape-hatch rationale as
    * `Dedup.minHashSignatureUdf`). Bit-identical to the Catalyst forms —
    * `TextAnalysisSpec` asserts parity on the fixtures — so CorpusPipeline
    * can swap it in without moving the quality/language cut lines. Null
    * text null-propagates.
    *
    * Locale note: the kernel lowercases with Locale.ROOT (as the tokenizer
    * kernels do), while Catalyst's `lower()` may route through the JVM
    * default locale for non-ASCII text — identical under the en/root
    * locales this engine pins via `-Duser.language=en` (build.sbt); on an
    * unpinned tr/az JVM the dotted/dotless-i mapping could differ. */
  def qualityLangUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => if (text == null) null else qualityLangKernel(text))

  private val stopSet = stopwordsEn.toSet
  private val markerSets: Seq[(String, Set[String])] =
    langMarkers.map { case (l, ws) => (l, ws.toSet) }

  private[operators] def qualityLangKernel(text: String): QualityLang = {
    val toks = Dedup.sparkTokens(text) // trim/lower/split exactly like tokens()
    // one pass over tokens: stopword hits + per-language marker hits
    var nStop = 0
    val hits  = new Array[Int](markerSets.length)
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (stopSet.contains(w)) nStop += 1
      var j = 0
      while (j < markerSets.length) {
        if (markerSets(j)._2.contains(w)) hits(j) += 1
        j += 1
      }
      i += 1
    }
    // one pass over chars: punct/non-ws counts on the LOWERED text (exactly
    // punctRatio's regexes: \s is Java's [ \t\n\x0B\f\r]) + CJK count on the
    // RAW text (exactly langId's [一-鿿] class)
    // iterate CODE POINTS, not UTF-16 units: Spark's length() counts code
    // points, so a supplementary-plane char (emoji) is ONE punct char there
    // — a charAt loop would count its two surrogate units twice
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    var punct = 0; var nonWs = 0
    var c = 0
    while (c < lowered.length) {
      val cp = lowered.codePointAt(c)
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == '\u000B' || cp == '\f' || cp == '\r'
      if (!isWs) {
        nonWs += 1
        if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9'))) punct += 1
      }
      c += Character.charCount(cp)
    }
    var cjk = 0
    c = 0
    while (c < text.length) {
      val cp = text.codePointAt(c)
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      c += Character.charCount(cp)
    }
    // quality: identical formula and operation order as qualityScore()
    val lengthScore = math.min(toks.length.toDouble / 100.0, 1.0)
    val punctScore  = 1.0 - (if (nonWs == 0) 0.0 else punct.toDouble / nonWs.toDouble)
    val stopScore   = math.min((nStop.toDouble / toks.length.toDouble) * 5.0, 1.0)
    val raw         = lengthScore * 0.4 + punctScore * 0.3 + stopScore * 0.3
    // Spark's Round(double, 6): BigDecimal(x) (shortest-repr) HALF_UP
    val quality = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // lang: greatest (score, lang) struct — max score, ties to the
    // lexicographically greatest code (langId's tie rule)
    var bestScore = 0.5; var bestLang = "und"
    def consider(score: Double, lang: String): Unit =
      if (score > bestScore || (score == bestScore && lang.compareTo(bestLang) > 0)) {
        bestScore = score; bestLang = lang
      }
    var j = 0
    while (j < markerSets.length) {
      consider(hits(j).toDouble, markerSets(j)._1); j += 1
    }
    consider(cjk.toDouble * 2.0, "zh")
    QualityLang(quality, bestLang)
  }

  /** TF-IDF term relevance over a document corpus: one row per (doc, token)
    * with term frequency, document frequency, and `score = tf * (N / df)`
    * (ratio idf — double mul/div are IEEE-exact, so the score is
    * bit-reproducible across engines; `ln`-damped idf is libm-dependent and
    * callers wanting it can apply `log(n_docs / df)` on top of the returned
    * tf/df columns).
    *
    * Scale shape (100 TB): tokenize+explode is map-side; tf is one shuffle
    * on (id, token); df aggregates the tf output by token (vocabulary-sized,
    * far smaller than the corpus) and re-attaches by broadcast when it fits,
    * AQE-planned otherwise. Stopword df rows are the classic skew keys —
    * AQE skew-join handles them (GraftSession). The corpus count comes from
    * a 1-row aggregate cross join, not a driver round-trip. */
  def tfIdf(docs: org.apache.spark.sql.DataFrame, textCol: String, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
    val tf   = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfq  = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n    = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfq, Seq("token")).crossJoin(n)
      .select(col("id"), col("token"), col("tf"), col("df"),
        (col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double")))
          .as("score"))
  }

  /** Sequence packing: assign ordered chunks of each document to fixed
    * token-budget training sequences. A chunk goes to the sequence its
    * CUMULATIVE starting offset falls in (`seq_idx = tokens-before div
    * budget`) — the deterministic stride-fill rule. Chunks are never split:
    * a chunk straddling a boundary stays with the sequence it started in
    * (that sequence runs over budget, and the next one starts short by the
    * same amount), and a single chunk larger than the budget can make the
    * per-doc seq_idx sequence skip values. What IS guaranteed: every chunk
    * is assigned to exactly one sequence, assignment depends only on
    * (order, token counts, budget), and sequence boundaries land on budget
    * multiples of the cumulative token stream.
    *
    * Scale shape (100 TB): the window partitions by DOCUMENT — millions of
    * independent partitions, no global ordering, no single-partition window
    * (packing across documents needs a global running sum, which serializes;
    * cross-document packing at scale is a per-executor-partition concern,
    * not a relational one). One shuffle on the doc key, arithmetic after
    * that is map-side. */
  def packSequences(
      chunked: org.apache.spark.sql.DataFrame,
      docCol: String,
      orderCol: String,
      tokensCol: String,
      budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(docCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    chunked
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      // integer division of non-negative longs: exact on both engines
      .withColumn("seq_idx", expr(s"(__cum - `$tokensCol`) div ${budget}L"))
      .drop("__cum")
  }

  /** Multi-document example packing — the "many short docs per context
    * window" training-prep step ([[packSequences]] splits LONG docs across
    * windows; this fills windows with SHORT docs): first-fit-decreasing
    * bin packing of whole documents into `budget`-token bins. FFD is the
    * classic 11/9·OPT+1 guarantee (Johnson 1973); docs longer than the
    * budget are rejected loudly rather than silently dropped.
    *
    * Determinism WITHOUT a global sort: rows hash into `buckets` fixed
    * partitions by id (a pure function of the data, not the input
    * layout), each partition packs its own docs — so bin assignments are
    * reproducible across runs and upstream partitionings, which is what a
    * resumable pipeline needs. Global FFD would need a total sort and
    * serialize; per-partition FFD is the standard distributed form (each
    * bucket's packing is independent, bin ids namespace by partition).
    *
    * Scale shape (100 TB): one hash exchange of (id, n_tokens) pairs —
    * the document text is NOT needed here; join the assignment back by id
    * to materialize packed sequences. Per-partition state is the bin
    * capacity array (bounded by bucket row count). */
  def packExamples(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      buckets: Int = 32): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n_tokens", LongType),
      StructField("bin_id", LongType)))
    val rows = df
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("n"))
      .where(col("n") > 0)
    val over = rows.where(col("n") > budget).limit(1).collect()
    require(over.isEmpty,
      s"doc ${over.headOption.map(_.getLong(0))} exceeds the $budget-token budget; " +
        "split it with packSequences first")
    rows.repartition(buckets, pmod(col("id"), lit(buckets.toLong)))
      .mapPartitions { it =>
        val part = it.map(r => (r.getLong(0), r.getLong(1))).toArray
          .sortBy { case (id, n) => (-n, id) } // FFD: size desc, id tiebreak
        val pid  = org.apache.spark.TaskContext.getPartitionId().toLong
        val free = scala.collection.mutable.ArrayBuffer.empty[Long]
        part.iterator.map { case (id, n) =>
          var b = free.indexWhere(_ >= n)
          if (b < 0) { free += budget; b = free.length - 1 }
          free(b) -= n
          Row(id, n, (pid << 32) | b.toLong)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Per-document zlib compression ratio (compressed/raw bytes) — the
    * cheap redundancy signal corpus pipelines run next to the word-level
    * filters (highly repetitive machine-generated text compresses far
    * below prose). JVM-Deflater-specific byte counts → rows-only by
    * contract; the prose-vs-repetition ordering is spec-checked. Pure
    * per-row kernel, no shuffle. */
  def compressionRatioUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => {
      if (s == null) null
      else {
        val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (raw.isEmpty) java.lang.Double.valueOf(1.0)
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
          d.setInput(raw); d.finish()
          val buf = new Array[Byte](raw.length + 64)
          var n = 0
          while (!d.finished()) n += d.deflate(buf, 0, buf.length) // count only
          d.end()
          java.lang.Double.valueOf(n.toDouble / raw.length)
        }
      }
    })

  /** Train/eval decontamination: for each eval document, count the distinct
    * word n-grams it shares with ANY training document — the standard
    * pre-training hygiene check (eval contamination via n-gram collision).
    * Returns one row per eval doc: (id, n_grams, n_shared, contaminated).
    *
    * Scale shape (100 TB): n-grams explode map-side; the train side is
    * reduced to DISTINCT grams (vocabulary-bounded, far smaller than the
    * corpus) before the join, and the join carries (gram, id) only — no
    * document payloads shuffle. Gram-frequency skew (stopword-ish grams)
    * is AQE skew-join territory, same as tfIdf's df join. */
  def contamination(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      isEval: Column,
      n: Int): org.apache.spark.sql.DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("__text"), isEval.as("__is_eval"))
    // wordShingles is per-doc distinct, so (id, gram) pairs are unique here.
    // Kernel UDF form: same shingle SET, one pass per doc — the interpreted
    // HOF chain was the dominant cost of the decontamination family.
    val grams = base.select(col("id"), col("__is_eval"),
      explode(Dedup.wordShinglesUdf(n)(col("__text"))).as("gram"))
    // ONE pass over the shingled corpus: a gram-partitioned window marks
    // grams any training doc holds, then eval rows aggregate per doc.
    // Splitting train/eval into separate plan branches (semi-join shape)
    // would scan + tokenize + explode the whole corpus TWICE — the dominant
    // map-side cost at scale — because the differing filters block exchange
    // reuse between the branches.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    grams
      .withColumn("__in_train", max(when(!col("__is_eval"), lit(1)).otherwise(lit(0))).over(w))
      .where(col("__is_eval"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__in_train")).cast("long").as("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("long"))
  }

  /** The DROPPING side of decontamination — [[contamination]] audits the
    * EVAL set; this scores the TRAIN docs (the set you actually filter
    * before pretraining): per train doc, how many of its distinct n-grams
    * any eval doc holds, and `kept` = n_shared < minShared. Same one-pass
    * gram-window plan as [[contamination]] with the roles reversed —
    * corpus scanned and shingled ONCE. */
  def decontaminateDrop(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      isEval: Column,
      n: Int,
      minShared: Long = 1L): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("__text"), isEval.as("__is_eval"))
    val grams = base.select(col("id"), col("__is_eval"),
      explode(Dedup.wordShinglesUdf(n)(col("__text"))).as("gram"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    grams
      .withColumn("__in_eval", max(when(col("__is_eval"), lit(1)).otherwise(lit(0))).over(w))
      .where(!col("__is_eval"))
      .groupBy(col("id"))
      .agg(sum(col("__in_eval")).cast("long").as("n_shared"))
      .withColumn("kept", (col("n_shared") < minShared).cast("long"))
  }

  /** [[contamination]] restructured for the 100 TB regime, same exact
    * result. There the corpus sides are wildly asymmetric: the TRAIN corpus
    * is the 100 TB scan while the eval/benchmark set is tiny (thousands of
    * docs, millions of grams). The one-pass window plan above shuffles the
    * ENTIRE train gram stream on `gram` to answer a question about the tiny
    * side — at scale that shuffle IS the job.
    *
    * This variant broadcasts a Bloom filter built over the distinct EVAL
    * grams (MBs for millions of grams at 1% fpp) and prunes the train gram
    * stream MAP-SIDE against it: only grams that possibly collide with an
    * eval gram (true hits + `fpp` of the rest) ever shuffle. An exact inner
    * join against the true eval-gram set then discards the false positives,
    * so the output is bit-identical to [[contamination]] — the Bloom stage
    * only prunes, never decides. This is the sketch-prefilter + exact-confirm
    * pattern (the same shape Spark's own runtime bloom-join pushdown
    * applies, made explicit and sized by the caller).
    *
    * Cost model vs [[contamination]]: two passes over the (cheap, map-side)
    * eval shingling instead of one, plus a driver-aggregated Bloom build over
    * the distinct eval grams, in exchange for reducing the train-side
    * shuffle from O(|train grams|) to O(|hits| + fpp·|train grams|). Choose
    * it whenever |eval| ≪ |train| — i.e. always, for real decontamination. */
  def contaminationBloom(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      isEval: Column,
      n: Int,
      fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val spark = docs.sparkSession
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("__text"), isEval.as("__is_eval"))
    // (id, gram) unique per doc — wordShingles is per-doc distinct
    val evalGrams = base.where(col("__is_eval"))
      .select(col("id"), explode(Dedup.wordShinglesUdf(n)(col("__text"))).as("gram"))
      // consumed three times (distinct-gram set, Bloom build via that set,
      // final join + per-doc counts); eval side is small by contract
      .persist()
    val evalGramSet = evalGrams.select("gram").distinct().persist()
    val nEvalGrams  = evalGramSet.count() // also materializes both caches
    val bloomBc = spark.sparkContext.broadcast(
      evalGramSet.stat.bloomFilter("gram", math.max(nEvalGrams, 1L), fpp))
    val mightHit = udf((g: String) => bloomBc.value.mightContainString(g))
    // Train side: explode map-side, drop Bloom misses BEFORE the distinct's
    // shuffle — the only train grams that cross the wire are possible hits.
    val trainHits = base.where(!col("__is_eval"))
      .select(explode(Dedup.wordShinglesUdf(n)(col("__text"))).as("gram"))
      .where(mightHit(col("gram")))
      .distinct()
      // exact confirm: false positives fail this join; survivors are
      // precisely the train∩eval grams
      .join(evalGramSet, Seq("gram"))
    val shared = evalGrams.join(trainHits, Seq("gram"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    val out = evalGrams.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
      .join(shared, Seq("id"), "left_outer")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("long"))
      // flatten lineage off the caches so they can be released eagerly
      // (dropping blocks later would force recomputation of the Bloom build)
      .localCheckpoint()
    evalGrams.unpersist(false)
    evalGramSet.unpersist(false)
    out
  }

  /** Fractional contamination score per TRAIN document — the GPT-3 appendix
    * C measure: what fraction of a training doc's distinct word n-grams
    * also appear in the eval/benchmark set. [[decontaminateDrop]] answers
    * the binary keep/drop question; this grades SEVERITY (a doc quoting one
    * benchmark sentence scores 0.02, a verbatim copy scores 1.0), which is
    * what a contamination-budget policy thresholds on.
    *
    * Plan shape (100 TB): the per-doc gram total is `size(shingles)` —
    * computed MAP-SIDE, zero shuffle — so the only shuffled stream is the
    * Bloom-pruned hit candidates (the [[contaminationBloom]] asymmetric
    * discipline: eval is tiny by contract, its gram set broadcasts as a
    * Bloom filter, and only possible hits cross the wire for the exact
    * confirm join). Result is exact — the Bloom only prunes.
    *
    * Output: (id, n_grams, n_shared, overlap_frac) for every train doc
    * with ≥1 gram; frac = round(n_shared / n_grams, 6) in identical
    * double-operation order on both engines. */
  def contaminationFraction(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      isEval: Column,
      n: Int,
      fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val spark = docs.sparkSession
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("__text"), isEval.as("__is_eval"))
    val evalGramSet = base.where(col("__is_eval"))
      .select(explode(Dedup.wordShinglesUdf(n)(col("__text"))).as("gram"))
      .distinct().persist()
    val nEvalGrams = evalGramSet.count()
    val bloomBc = spark.sparkContext.broadcast(
      evalGramSet.stat.bloomFilter("gram", math.max(nEvalGrams, 1L), fpp))
    val mightHit = udf((g: String) => bloomBc.value.mightContainString(g))
    val train = base.where(!col("__is_eval"))
      .select(col("id"), Dedup.wordShinglesUdf(n)(col("__text")).as("__grams"))
      .where(size(col("__grams")) > 0)
      .persist() // two consumers: map-side totals + the hit-candidate explode
    val totals = train.select(col("id"), size(col("__grams")).cast("long").as("n_grams"))
    val shared = train
      .select(col("id"), explode(col("__grams")).as("gram"))
      .where(mightHit(col("gram")))
      .join(evalGramSet, Seq("gram")) // exact confirm: false positives drop
      .groupBy("id").agg(count(lit(1)).cast("long").as("n_shared"))
    val out = totals.join(shared, Seq("id"), "left_outer")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("overlap_frac",
        round(col("n_shared").cast("double") / col("n_grams").cast("double"), 6))
      .localCheckpoint()
    train.unpersist(false)
    evalGramSet.unpersist(false)
    out
  }

  /** HTML → text extraction — the step a crawl-derived corpus runs BEFORE
    * every quality/dedup operator in this file (C4/RefinedWeb start from
    * WET/WARC HTML). Deliberately a pure `Column` regexp/replace chain —
    * whole-stage-codegen'd, no UDF, and expressible verbatim in any other
    * engine (the oracle runs the identical chain):
    * script/style blocks (with their CONTENT) → comments → all tags →
    * named-entity decode (`&amp;` LAST — the standard double-decode rule)
    * → whitespace collapse + trim. Patterns stay in the Java∩RE2 regex
    * subset (inline `(?is)` flags, lazy `.*?`, no lookaround). This is the
    * tag-stripping core, not a DOM parser: malformed nesting degrades
    * gracefully (identically in every engine) rather than erroring. */
  def htmlExtract(html: Column): Column = {
    val stripped = Seq(
      "(?is)<script[^>]*>.*?</script>",
      "(?is)<style[^>]*>.*?</style>",
      "(?s)<!--.*?-->",
      "(?s)<[^>]+>")
      .foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    // & last: "&amp;lt;" must decode to "&lt;", not "<"
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(stripped) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Build a frequency-ranked vocabulary over a corpus: one row per token
    * with its corpus count and a dense 0-based `vocab_id` assigned by
    * (count DESC, token ASC) — the conventional id order (id 0 = most
    * frequent; the tie-break makes the ranking a total order). Tokens below
    * `minCount` are pruned BEFORE ranking, the standard rare-token cutoff.
    *
    * Scale shape (100 TB): the explode+count is map-side-combined (partial
    * aggregation reduces each task's stream to its local distinct tokens
    * before the shuffle), the count shuffle carries (token, long) only, and
    * the global id assignment is `Relational.withGlobalRank`'s two-phase
    * rank — a vocab of hundreds of millions of tokens ranks in parallel
    * with no single-partition window and no value collect. */
  def buildVocab(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Long = 1,
      numParts: Int = 256): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val counts = docs
      .where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "") // trim+split leaves one empty token on blank text
      .groupBy("token").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
    Relational.withGlobalRank(counts, "vocab_id", numParts, col("n").desc, col("token"))
  }

  /** EXACT corpus heavy hitters at sketch cost: the tokens whose total
    * occurrence count exceeds `support` × (total non-empty tokens). Two
    * passes, the sketch-prune + exact-confirm pattern of
    * [[contaminationBloom]]:
    *  1. per-partition Misra–Gries with k = ⌈1/support⌉ counters — a
    *     bounded-memory one-pass sketch whose candidate union is a
    *     GUARANTEED superset of every true heavy hitter (pigeonhole: a
    *     token with global count > N/k must exceed N_p/k in at least one
    *     partition's stream);
    *  2. exact count restricted to the candidates (broadcast equi-join
    *     prunes the token stream map-side), thresholded on the true total.
    * The sketch only PRUNES, never decides — the output is bit-identical
    * to the brute-force token groupBy, which is exactly what the DuckDB
    * oracle runs.
    *
    * Scale shape (100 TB): the naive plan's (token, count) shuffle is
    * vocabulary-sized — fine — but its map-side hash aggregate holds the
    * full per-partition vocabulary; MG caps pass-1 state AND shuffle at k
    * rows per partition, and pass 2 shuffles only candidate occurrences
    * (≤ k·partitions tokens survive the broadcast prune). The corpus is
    * scanned twice — the standard price for exact answers in bounded
    * memory. Tokenization inside the kernel is [[Dedup.sparkTokens]], the
    * proven `tokens()` replica, so pass 1 and pass 2 see identical tokens. */
  def heavyHitters(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      support: Double): org.apache.spark.sql.DataFrame = {
    require(support > 0 && support < 1, s"support must be in (0,1), got $support")
    val k     = math.ceil(1.0 / support).toInt
    val spark = docs.sparkSession
    import spark.implicits._
    val texts = docs.where(col(textCol).isNotNull).select(col(textCol)).as[String]
    // Pass 1 emits the MG candidates AND a null-token row carrying the
    // partition's exact token count — the threshold total comes from the
    // same scan instead of a third one. Tiny frame (≤ k+1 rows/partition),
    // checkpointed eagerly so its two consumers don't re-run the pass.
    val pass1 = texts.mapPartitions { it =>
      // Misra–Gries: k counters; on overflow decrement ALL (dropping
      // zeros) — each decrement round retires k+1 occurrences, so a token
      // with count_p > N_p/k cannot be fully cancelled within the partition
      val counters = new java.util.HashMap[String, java.lang.Long]()
      var nTokens  = 0L
      it.foreach { text =>
        val toks = Dedup.sparkTokens(text)
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (t.nonEmpty) {
            nTokens += 1
            val cur = counters.get(t)
            if (cur != null) counters.put(t, cur + 1L)
            else if (counters.size < k) counters.put(t, 1L)
            else {
              val itr = counters.entrySet().iterator()
              while (itr.hasNext) {
                val e = itr.next()
                if (e.getValue <= 1L) itr.remove() else e.setValue(e.getValue - 1L)
              }
            }
          }
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().asScala.iterator.map(t => (t, 0L)) ++
        Iterator((null: String, nTokens))
    }.toDF("token", "cnt").localCheckpoint(true)
    val candidates = pass1.where(col("token").isNotNull).select("token").distinct()
    val total      = pass1.where(col("token").isNull)
      .agg(sum("cnt").cast("long").as("total"))
    docs.where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .join(broadcast(candidates), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n").cast("double") > lit(support) * col("total").cast("double"))
      .select(col("token"), col("n"))
  }

  /** BM25 relevance per (doc, token) — the standard ranked-retrieval scorer
    * (Robertson/Spärck Jones; the Okapi weighting tfIdf graduates into).
    * Uses the RATIO idf `(N - df + 0.5) / (df + 0.5)` rather than its log —
    * same rationale as [[tfIdf]]: every factor is then either an exact
    * integer or one correctly-rounded IEEE division/multiply in a fixed
    * order, so an external engine replays the score bit-exactly (`ln`
    * implementations are NOT bit-portable across libms; monotonicity — all
    * a ranker needs — is unchanged).
    *
    * Scale shape (100 TB): tf/dl/df are map-side-combined aggregations that
    * shuffle (id|token, long) pairs only; `n_docs`/`avgdl` is a 1-row
    * aggregate joined in-plan (broadcast under the cross join, no driver
    * collect); the df side of the tf⋈df join is token-cardinality (vocab-
    * sized, AQE-broadcastable). Text never rides past the explode. */
  def bm25(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      k1: Double = 1.2,
      b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val tf  = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dl  = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val tot = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val idf   = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfD   = col("tf").cast("double")
    val norm  = col("dl").cast("double") / (col("sum_dl").cast("double") / col("n_docs").cast("double"))
    val denom = tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * norm)
    tf.join(dl, Seq("id")).join(dfq, Seq("token")).crossJoin(tot)
      .select(col("id"), col("token"), col("tf"), col("df"), col("dl"),
        round(idf * (tfD * lit(k1 + 1.0) / denom), 6).as("score"))
  }

  /** Inverted index over a corpus: one row per token with its document
    * frequency and the sorted posting list (distinct doc ids ascending) —
    * the retrieval-side artifact a decontamination or search pass probes.
    * Postings are emitted as a comma-joined string so the artifact is
    * engine-portable (array hash layouts are not).
    *
    * Scale shape (100 TB): the explode collapses to distinct (token, id)
    * map-side before the one token-key shuffle; each group then sorts only
    * its own postings (no global sort). A web-scale stopword's posting list
    * is the inherent skew — cap or elide head tokens (df cutoff) in a real
    * deployment; here the contract is the complete index. */
  def invertedIndex(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        array_join(transform(array_sort(collect_list(col("id"))), _.cast("string")), ",")
          .as("postings"))
  }

  // -------------------------------------------------------------- BPE

  /** Merge every non-overlapping left-to-right adjacent (a, b) symbol pair
    * into the single symbol a+b — pure Catalyst `aggregate` fold, no UDF. */
  private def mergeAdjacent(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn byte-pair-encoding merges (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units") — the real-tokenizer
    * counterpart of [[subwordCountApprox]].
    *
    * Architecture is the paper's own: corpus-scale work is ONE
    * tokenize+count shuffle producing the word-frequency DICTIONARY; the
    * merge loop then runs on that compact dict. When the dict fits the
    * documented bound (`maxDriverVocab`, default 2²⁰ word forms — a full
    * web-corpus word-form dict is tens of millions of SHORT strings, so
    * even 100 TB corpora usually fit) it is collected ONCE and the
    * iterative argmax runs as a driver loop — the dict here is the MODEL
    * being built, vocabulary-bounded not corpus-bounded, the same
    * sanctioned exception as `ScoringModel`'s weights; 40 merges cost
    * milliseconds instead of 120 scheduler round-trips. Above the bound the
    * loop stays fully distributed (one pair-count aggregate + map-side HOF
    * fold per merge, 1-row argmax to the driver, lineage flattened via
    * localCheckpoint every few rounds). Both paths implement identical
    * semantics — ties break (count desc, pair lexicographic asc) so the
    * learned merge table is deterministic — and the spec runs the classic
    * Sennrich corpus through BOTH. */
  def bpeTrain(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      numMerges: Int,
      maxDriverVocab: Int = 1 << 20): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val wordCounts = docs
      .where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    if (wordCounts.count() <= maxDriverVocab)
      bpeTrainDriver(
        wordCounts.collect().map(r => (r.getString(0), r.getLong(1))), numMerges)
    else bpeTrainDistributed(wordCounts, numMerges)
  }

  /** In-memory merge loop over the collected word-frequency dict (the
    * standard fast-BPE trainer shape). */
  private def bpeTrainDriver(
      dict: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words  = dict.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (!exhausted && merges.size < numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), n, _ + _); i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
            (c == best._2 && Ordering[(String, String)].lt(p, best._1))) best = (p, c)
        }
        val (a, b) = best._1
        merges += ((a, b))
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), n)
          }
        }
      }
    }
    merges.toSeq
  }

  /** Distributed merge loop for dicts beyond the driver bound: identical
    * semantics, one pair-count aggregate + map-side fold per merge. */
  private def bpeTrainDistributed(
      wordCounts: org.apache.spark.sql.DataFrame, numMerges: Int): Seq[(String, String)] = {
    var dict = wordCounts
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("syms"), col("n"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var sinceCheckpoint = 0
    while (!exhausted && merges.size < numMerges) {
      val top = dict
        .where(size(col("syms")) >= 2) // keeps the position sequence ascending
        .select(col("n"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        dict = dict.select(mergeAdjacent(col("syms"), a, b).as("syms"), col("n"))
        // flatten lineage every few rounds, not every round — the HOF fold
        // plans stack only a few expressions deep per merge
        sinceCheckpoint += 1
        if (sinceCheckpoint >= 4) { dict = dict.localCheckpoint(true); sinceCheckpoint = 0 }
      }
    }
    merges.toSeq
  }

  /** Encode text with a learned merge table: per word, repeatedly apply the
    * LOWEST-RANK applicable merge until none applies (the standard BPE
    * encode loop — rank order, not left-to-right scan order, so encoding
    * agrees with training). Imperative per-row kernel → UDF (the documented
    * escape hatch; the merge table ships once per executor in the closure,
    * the loop allocates per word, not per merge). Null text → null. */
  def bpeEncodeUdf(merges: Seq[(String, String)])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val byRank = merges.toIndexedSeq
    val rank   = merges.zipWithIndex.toMap
    udf((text: String) =>
      if (text == null) null
      // Dedup.sparkTokens, NOT String.trim/default-locale toLowerCase: the
      // encode must tokenize exactly like the Catalyst form bpeTrain
      // learned merges on (a tr/az default locale would lowercase "III" to
      // dotless-i words no merge table contains, silently degrading the
      // encoding to character level)
      else Dedup.sparkTokens(text).filter(_.nonEmpty).toSeq
        .flatMap(w => bpeEncodeWord(w, rank, byRank)))
  }

  private[operators] def bpeEncodeWord(
      w: String,
      rank: Map[(String, String), Int],
      byRank: IndexedSeq[(String, String)]): Seq[String] = {
    var syms = w.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      val cands = (0 until syms.length - 1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))))
      if (cands.isEmpty) done = true
      else {
        val (a, b) = byRank(cands.min)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  // ------------------------------------------------- lexical statistics

  /** Type-token ratio — distinct tokens / total tokens, the classic
    * lexical-diversity signal (low TTR flags template/spam text the way
    * [[repetitionRatio]] flags verbatim loops, but at whole-vocabulary
    * rather than n-gram granularity). Pure map-side Catalyst; empty/blank
    * text → 1.0 (single empty token over itself). */
  def typeTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    round(size(array_distinct(toks)).cast("double") / size(toks).cast("double"), 6)
  }

  /** Character-level Shannon entropy (nats) — the randomness signal that
    * separates natural prose (≈2.5–3.3 nats) from base64/hex blobs (high)
    * and repeated-character padding (near 0); a standard cheap filter
    * column next to [[qualityScore]].
    *
    * Computed as `ln(n) − (Σ_c cnt_c·ln cnt_c)/n` over the SORTED distinct
    * characters so the fold order (and hence the last-ulp of the double
    * sum) is engine-reproducible; the per-row cost is O(distinct·len),
    * bounded by alphabet size, and the whole thing is one codegen'd
    * expression — no shuffle, no UDF. */
  def charEntropy(text: Column): Column = {
    // Spark's split(limit=-1) keeps the zero-width trailing match as an
    // empty string — drop it so char counts (and n) match a plain
    // char-by-char split
    val cs   = filter(split(text, ""), c => c =!= "")
    val n    = size(cs).cast("double")
    val uniq = array_sort(array_distinct(cs))
    val sumClnC = aggregate(
      uniq,
      lit(0.0),
      (acc, c) => {
        val cnt = size(filter(cs, x => x === c)).cast("double")
        acc + cnt * log(cnt)
      })
    round(log(n) - sumClnC / n, 6)
  }

  /** Zipf slope of the corpus token-frequency distribution: OLS slope of
    * `ln(count)` against `ln(rank)` over the top `topN` token ranks —
    * natural corpora sit near −1 (Zipf's law); a slope far from it flags
    * synthetic or truncated corpora. One tokenize+count shuffle, a
    * vocabulary-sized rank (top-N via one TakeOrdered), and a 1-row
    * regression aggregate; ranks tie-break lexicographically so the fit is
    * deterministic. */
  def zipfSlope(
      docs: org.apache.spark.sql.DataFrame, textCol: String, topN: Int = 1000)
      : org.apache.spark.sql.DataFrame = {
    val counts = docs
      .where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(topN)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("n"), col("token"))))
    counts.agg(
      round(regr_slope(log(col("n").cast("double")), log(col("rank").cast("double"))), 6)
        .as("zipf_slope"),
      count(lit(1)).as("n_ranks"))
  }

  /** Pointwise mutual information for adjacent-token bigrams —
    * collocation mining (`ln(p(ab)/(p(a)p(b)))`), the standard phrase
    * detector over a training corpus. Three token-level aggregates
    * (unigram counts, bigram counts, two 1-row totals attached by cross
    * join — never a driver round-trip); the unigram side is
    * vocabulary-sized, so both attach joins broadcast under AQE. `minCount`
    * suppresses the unstable low-frequency tail. The PMI expression keeps
    * one fixed operation order (all-integer products cast to double,
    * single `ln`) so both engines serialize identical doubles. */
  def bigramPmi(
      docs: org.apache.spark.sql.DataFrame, textCol: String, minCount: Long = 5L)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("tk"))
    // the empty token (Spark's split keeps leading/trailing empties on
    // tab/newline-edged text) is filtered like every sibling token op —
    // here from BOTH stats, so "" can neither appear as a collocate nor
    // inflate the unigram total every PMI value divides by
    val uni = toks.select(explode(col("tk")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val nUni = uni.agg(sum(col("cw")).as("n1"))
    val bi = toks
      .where(size(col("tk")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => struct(
          element_at(col("tk"), i).as("a"),
          element_at(col("tk"), i + 1).as("b")))).as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"))
      .where(col("a") =!= "" && col("b") =!= "")
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val nBi = bi.agg(sum(col("cab")).as("n2"))
    bi.where(col("cab") >= minCount)
      .join(uni.withColumnRenamed("w", "a").withColumnRenamed("cw", "ca"), Seq("a"))
      .join(uni.withColumnRenamed("w", "b").withColumnRenamed("cw", "cb"), Seq("b"))
      .crossJoin(nUni).crossJoin(nBi)
      .select(col("a"), col("b"), col("cab"),
        round(log(
          (col("cab").cast("double") * col("n1").cast("double") * col("n1").cast("double")) /
            (col("n2").cast("double") * col("ca").cast("double") * col("cb").cast("double"))), 6)
          .as("pmi"))
  }

  // --------------------------------------------------- PII audit / boilerplate

  /** Count of [[piiPatterns]] matches over the ORIGINAL text (counts are
    * independent per pattern — a span matched by two patterns counts
    * twice; [[piiScrub]]'s sequential replacement is what resolves the
    * overlap in the redacted output). The audit column a compliance log
    * records next to the scrub. */
  def piiCount(text: Column): Column =
    piiPatterns
      .map { case (re, _) => size(regexp_extract_all(text, lit(re), lit(0))).cast("long") }
      .reduce(_ + _)

  /** Boilerplate line removal (CCNet/C4-style): drop every line whose
    * trimmed form appears in more than `maxDocFreq` DISTINCT documents
    * (nav bars, cookie banners, newsletter prompts), and reassemble each
    * document from its surviving lines in original order.
    *
    * Scale shape (100 TB): the doc-frequency side collapses to distinct
    * (id, line) map-side before one line-key shuffle, and the blocked set
    * (lines over the cutoff) is tiny by construction — boilerplate is
    * what repeats — so the anti-join broadcasts. Reassembly shuffles each
    * doc's surviving lines once on the doc key; the per-doc sort is local
    * (`array_sort` of that doc's lines, never a global sort). */
  def stripBoilerplate(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      maxDocFreq: Long): org.apache.spark.sql.DataFrame = {
    val lines = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("nline", trim(col("line")))
    val blocked = lines
      .where(col("nline") =!= "")
      .select(col("id"), col("nline")).distinct()
      .groupBy("nline").agg(count(lit(1)).as("doc_freq"))
      .where(col("doc_freq") > maxDocFreq)
      .select(col("nline"))
    lines
      .join(blocked, Seq("nline"), "left_anti")
      .groupBy(col("id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
  }

  /** DSIR-style domain-affinity score (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — simplified from the
    * hashed-n-gram log-likelihood ratio to a RATIO OF GRAM MASSES so the
    * arithmetic stays bit-reproducible; `ln` would not be):
    *
    *   affinity(d) = (Σ_g n_d[g]·c_tgt[g] · T_raw) / (Σ_g n_d[g]·c_raw[g] · T_tgt)
    *
    * where c_·[g] are corpus token counts over the target subset vs the
    * whole corpus, T_· the corpus totals, and the sums run over the doc's
    * token occurrences with multiplicity. > 1 ⇒ the doc's vocabulary leans
    * toward the target domain. Numerator/denominator are exact long sums
    * and products with ONE final double division (the tfIdf/lm-score
    * discipline) — bit-identical across engines. At true corpus scale the
    * products approach long range; switch the two sums to DECIMAL(38,0)
    * there (same plan shape).
    *
    * Scale shape (100 TB): one token shuffle to (doc, tok, n) — the tfIdf
    * shape — one stats join on tok, one doc-sum; the 1-row totals frame
    * broadcasts. Document payloads never shuffle. */
  def domainAffinity(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      targetPred: Column): org.apache.spark.sql.DataFrame = {
    val toks = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), coalesce(targetPred, lit(false)).as("is_t"),
        explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val stats = toks.groupBy("tok").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val totals = stats.agg(sum("c_r").as("t_r"), sum("c_t").as("t_t"))
    val tf = toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("n"))
    tf.join(stats, "tok")
      .groupBy(col("id"))
      .agg(sum(col("n") * col("c_t")).as("num"), sum(col("n") * col("c_r")).as("den"))
      .crossJoin(broadcast(totals))
      .select(col("id"),
        ((col("num") * col("t_r")).cast("double") /
          (col("den") * col("t_t")).cast("double")).as("affinity"))
  }

  /** URL canonicalization — the crawl-frontier dedup key (the same page
    * arrives as http/HTTP, with tracking params, reordered queries,
    * fragments, trailing slashes): lowercase scheme+host, drop the
    * fragment, drop `utm_*`/`fbclid`/`gclid` tracking params, SORT the
    * surviving params (order never distinguishes resources), strip one
    * trailing path slash. Pure per-row Catalyst (regexp splits + HOF
    * filter/sort) in the RE2-safe subset, so an external engine replays
    * it byte-identically. Malformed URLs (no scheme://host match)
    * canonicalize to null. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host   = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val path0  = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path   = regexp_replace(path0, "/$", "")
    // anchored from the string head: a '?' INSIDE the fragment (SPA hash
    // routes like "#/page?tab=1") is fragment content and must drop with
    // it, not leak into the canonical query
    val query  = regexp_extract(url, "^[^#]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)="))
    val q = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    when(scheme =!= "" && host =!= "",
      concat(scheme, lit("://"), host, path, q))
  }

  /** Per-document line dedup — the within-page "discard duplicate lines"
    * hygiene pass (C4 runs it before the corpus-level filters; nav menus
    * and footers repeat WITHIN a page too): keep each line's first
    * occurrence, preserving order. Pure per-row HOF (`array_distinct`
    * keeps first-occurrence order by contract); no shuffle. Contrast
    * [[stripBoilerplate]], which drops lines repeating ACROSS documents. */
  def dedupDocLines(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")

  // ------------------------------------------------- canonicalization / C4

  /** Unicode NFC canonicalization — composes decomposed sequences (e +
    * U+0301 → é) so byte-level ops (exact dedup hashes, shingles,
    * fingerprints) see ONE canonical form regardless of how upstream
    * encoders spelled the text; without it the same sentence in NFC and
    * NFD hashes differently and defeats exact dedup. JVM `Normalizer`
    * implements the same Unicode normalization the external engines do
    * (oracle-checked vs DuckDB's `nfc_normalize`). Per-row UDF — no
    * Catalyst builtin exists; map-side only, nothing shuffles. */
  def normalizeNfc(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    f(text)
  }

  /** Accent stripping: NFD-decompose, then drop every combining mark
    * (`\p{M}`) — mühleisen → muhleisen, é → e, composed or decomposed
    * input alike. The standard search/dedup-key fold for Latin-script
    * diacritics (oracle-checked vs DuckDB's `strip_accents`); lossy by
    * design, so it belongs in KEY derivation, not in the stored text. */
  def stripAccents(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}+", ""))
    f(text)
  }

  /** Canonical text form for normalization-insensitive exact dedup: lower,
    * map every non-alphanumeric to a space, collapse whitespace runs, trim.
    * Catches the trivial mutations (case, punctuation, spacing) that defeat
    * raw-byte exact dedup while staying a pure per-row Catalyst chain. The
    * regexes use only the RE2-compatible subset (`[^a-z0-9\s]`, `\s+`), so
    * an external engine replays them byte-identically. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** C4 page cleaning (Raffel et al. 2020 §2.2 — the three mechanical
    * rules that need no model): keep only lines that end in terminal
    * punctuation AND have ≥ `minWords` words; drop the whole page when
    * fewer than `minLines` lines survive, or the page contains "lorem
    * ipsum" (any case), or a curly brace (code, not prose). Returns a
    * struct `(text, keep, n_kept)` — cleaned text is null when the page
    * is dropped.
    *
    * Scale shape (100 TB): entirely per-row higher-order functions over
    * the split line array — no shuffle, no UDF, stays in codegen. */
  def c4Clean(text: Column, minWords: Int = 5, minLines: Int = 3): Column = {
    val kept = filter(split(text, "\n"),
      l => l.rlike("[.!?]$") && size(split(trim(l), " +")) >= minWords)
    val pageOk = size(kept) >= minLines &&
      !lower(text).contains("lorem ipsum") && !text.contains("{")
    struct(
      when(pageOk, array_join(kept, "\n")).as("text"),
      pageOk.as("keep"),
      size(kept).cast("long").as("n_kept"))
  }

  // ------------------------------------------------------------ winnowing

  /** Winnowing constants (Schleimer, Wilkerson, Aiken 2003, "Winnowing:
    * Local Algorithms for Document Fingerprinting"): k-gram rolling
    * polynomial hash h = Σ cᵢ·B^(k-1-i) mod M over lowercased text, all
    * exact positive long arithmetic — cross-engine reproducible, so the
    * whole pipeline (hash, selection, sharing stats) oracle-replays. */
  val WinnowBase: Long = 257L
  val WinnowMod: Long  = 1000000007L

  /** 2²¹: packs (hash, position) as one orderable long key
    * `h·PosCap + pos` (h < M ⇒ key < 2.2e15, exact in a long). Bounds
    * document length — enforced in the kernel. */
  val WinnowPosCap: Long = 1L << 21

  /** P(j) = B^(k-1-j) mod M — the per-position gram-hash weights; shared
    * with the generated oracle SQL so the engines cannot drift. */
  def winnowPowers(k: Int): Array[Long] = {
    val p = new Array[Long](k)
    p(k - 1) = 1L
    var j = k - 2
    while (j >= 0) { p(j) = p(j + 1) * WinnowBase % WinnowMod; j -= 1 }
    p
  }

  /** Doc-local winnowing kernel: one O(len) pass computes the rolling
    * gram hashes AND the window-min selection — only the selected
    * fingerprints (density ~2/(w+1) of grams) ever leave the row. This is
    * the 100 TB shape: fingerprint selection is per-document by
    * definition, so it must not cost a (doc, gram-position) shuffle; the
    * skinny (id, fingerprint) pairs are all that reaches the sharing
    * aggregation. Selection rule: minimal (hash, position) per trailing
    * w-window (deterministic total order; any fixed rule preserves the
    * winnowing guarantee that a shared substring of length ≥ w+k-1 yields
    * a shared fingerprint), consecutive re-selections collapsed. */
  private def winnowKernelUdf(k: Int, w: Int) =
    udf((text: String) => {
      if (text == null) null
      else {
        // CODE POINTS, not UTF-16 units (qualityLangKernel's discipline):
        // the relational/oracle form positions and hashes by code point
        // (Spark substr/ascii count characters), so a supplementary-plane
        // char iterated as two surrogate units would shift every gram hash
        // and position out of parity
        val cps = text.toLowerCase(java.util.Locale.ROOT)
          .codePoints().toArray
        val n = cps.length
        require(n < WinnowPosCap, s"winnowing caps documents at ${WinnowPosCap} chars, got $n")
        val nGrams = n - k + 1
        if (nGrams < w) Array.empty[Long]
        else {
          val topPow = winnowPowers(k)(0)
          val keys   = new Array[Long](nGrams)
          var h = 0L
          var i = 0
          while (i < k) { h = (h * WinnowBase + cps(i)) % WinnowMod; i += 1 }
          keys(0) = h * WinnowPosCap
          i = 1
          while (i < nGrams) {
            h = ((h - cps(i - 1).toLong * topPow % WinnowMod + WinnowMod) * WinnowBase
              + cps(i + k - 1)) % WinnowMod
            keys(i) = h * WinnowPosCap + i
            i += 1
          }
          val out  = new scala.collection.mutable.ArrayBuffer[Long](2 * nGrams / (w + 1) + 2)
          var last = -1L
          var e    = w - 1
          while (e < nGrams) {
            var min = keys(e)
            var b   = e - w + 1
            while (b < e) { if (keys(b) < min) min = keys(b); b += 1 }
            if (min != last) { out += min; last = min }
            e += 1
          }
          out.toArray
        }
      }
    })

  /** Winnowing fingerprints: (id, pos, fp) — the selected k-gram hashes
    * and their 0-based character positions. Docs with fewer than `w`
    * grams emit nothing (both engines share the rule). */
  def winnowFingerprints(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 16): org.apache.spark.sql.DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(winnowKernelUdf(k, w)(col(textCol))).as("key"))
      // exact unpack: keys are positive, PosCap is 2²¹ — shift, don't divide
      .select(col("id"),
        (col("key") % WinnowPosCap).as("pos"),
        shiftright(col("key"), 21).as("fp"))
  }

  /** Relational reference form of the winnow selection — gram hashes via
    * Horner-HOF, window-min via a frame spec — the oracle-shaped plan the
    * kernel must match bit-for-bit (parity spec in TextAnalysisSpec). */
  private[graft] def winnowFingerprintsRelational(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    val t = lower(col(textCol))
    val grams = transform(sequence(lit(0), length(t) - k), p =>
      aggregate(sequence(lit(0), lit(k - 1)), lit(0L),
        (acc, j) => (acc * WinnowBase + ascii(t.substr(p + j + 1, lit(1)))) % WinnowMod))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("i").rowsBetween(-(w - 1), 0)
    df.where(col(textCol).isNotNull && length(t) - k + 1 >= w)
      .select(col(idCol).as("id"), posexplode(grams))
      .select(col("id"), col("pos").as("i"),
        (col("col") * WinnowPosCap + col("pos")).as("key"))
      .withColumn("skey", min(col("key")).over(win))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("i")))
      .where(col("rn") >= w)
      .select(col("id"), col("skey")).distinct()
      .select(col("id"),
        (col("skey") % WinnowPosCap).as("pos"),
        shiftright(col("skey"), 21).as("fp"))
  }

  /** Per-doc winnowing summary for cross-doc overlap detection (the MOSS
    * report shape): n_fp = selected fingerprints, n_shared = distinct
    * fingerprint hashes of this doc that also occur in ≥1 other doc.
    * Only (id, fp) pairs shuffle. */
  def winnowStats(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 16): org.apache.spark.sql.DataFrame = {
    val fps = winnowFingerprints(df, textCol, idCol, k, w)
      .localCheckpoint(true) // two consumers below — don't re-run the kernel scan
    val perDoc = fps.groupBy("id").agg(count(lit(1)).as("n_fp"))
    val docHash = fps.select("id", "fp").distinct()
    val shared = docHash.groupBy("fp")
      .agg(count(lit(1)).as("nd")).where(col("nd") > 1).select("fp")
    val nShared = docHash.join(shared, Seq("fp"))
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
    perDoc.join(nShared, Seq("id"), "left_outer")
      .select(col("id"), col("n_fp"), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact,
  * fingerprint, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Algorithms follow the published literature: min-wise hashing and shingle
  * resemblance (Broder, "On the resemblance and containment of documents",
  * 1997), LSH banding over signature slices (Leskovec/Rajaraman/Ullman,
  * "Mining of Massive Datasets" ch. 3), SimHash random-projection
  * fingerprints (Charikar 2002; Manku et al., "Detecting near-duplicates
  * for web crawling", WWW 2007 — the 4-block Hamming pigeonhole comes from
  * there), and quadratic-bucket capping as practiced by large-corpus
  * dedup pipelines (e.g. Lee et al., "Deduplicating training data makes
  * language models better", 2022).
  *
  * Scale design (100 TB):
  *  - Never shuffle the document payload. Every shuffling stage projects to
  *    (key, id) or (key, signature) first; full rows are re-attached by key
  *    join at the end if the caller wants them. This is the reference's own
  *    rule ("reduce df down to data used", `01. Ingest.py:122-129`),
  *    promoted to an invariant.
  *  - MinHash signatures are computed per-row with Catalyst higher-order
  *    functions — a single map-side pass, no explode of the shingle set
  *    through a shuffle, no UDF/UDAF state.
  *  - LSH banding multiplies rows only by the number of bands, carrying
  *    (band_key, id) — candidate generation cost is independent of document
  *    size.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: sha256 content hash → (keep_id = min id, count).
    * Only (hash, id) flows through the shuffle. Null-text rows are excluded
    * — a null can't duplicate anything, and sha2(null) = null would
    * otherwise collapse every missing-text row into ONE group (silently
    * "deduplicating" unrelated rows; same null discipline as the
    * MinHash/SimHash generators). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(sha2(col(textCol), 256).as("content_hash"), col(idCol))
      .where(col("content_hash").isNotNull)
      .groupBy("content_hash")
      // keep_id keeps the id column's own type (string ids stay strings —
      // a long cast would NULL them and silently drop every row downstream)
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dup"))

  /** Keep exactly one row (the min-id one) per distinct text; null-text
    * rows pass through untouched.
    *
    * Plan shape (100 TB): compute the DROP set — ids that lost their hash
    * group, bounded by the duplicate count — in one (hash, id) window pass,
    * then left-anti it against the corpus. The previous inner-join-on-
    * keep-ids formulation shuffled a corpus-sized key set; the drop set is
    * usually tiny and AQE broadcasts the anti join. Payloads never shuffle
    * either way. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toDrop = df.select(sha2(col(textCol), 256).as("content_hash"), col(idCol))
      .where(col("content_hash").isNotNull)
      .withColumn("__keep", min(idCol).over(Window.partitionBy("content_hash")))
      .where(col(idCol) =!= col("__keep"))
      .select(idCol)
    df.join(toDrop, Seq(idCol), "left_anti")
  }

  /** Sub-document (chunk-level) exact dedup — the paragraph-dedup pass of
    * C4/RefinedWeb-style pipelines, adapted to this corpus' text shape
    * (no newlines, so "paragraphs" are the engine's standard non-overlapping
    * `chunkSize`-char chunks). A chunk survives only at its FIRST corpus
    * position (min (doc_id, chunk_idx) over its sha256 group); every later
    * occurrence is dropped and the remaining chunks re-assemble per document
    * in original order.
    *
    * Plan shape (100 TB): the chunk text never shuffles for the dedup
    * decision — chunks are hashed map-side and only (hash, doc_id, chunk_idx)
    * flows through the first-occurrence window; the tiny drop set left-antis
    * back against a re-derived chunk relation (chunking is a cheap map-side
    * projection, so deriving it twice beats shuffling chunk payloads once).
    * The only payload shuffle is the final per-doc reassembly of SURVIVING
    * chunks, which is the output itself.
    *
    * Returns (idCol, n_kept, kept_chars, text) with `text` the re-assembled
    * surviving prose. Null-text rows are excluded (a null can't duplicate
    * anything; mirrors [[exactGroups]]' discipline). */
  def dedupChunks(df: DataFrame, textCol: String, idCol: String, chunkSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def chunkRel = df.where(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(TextAnalysis.chunks(col(textCol), chunkSize, chunkSize)))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"), col("col").as("chunk"))
    val toDrop = chunkRel
      .select(sha2(col("chunk"), 256).as("h"), col(idCol), col("chunk_idx"))
      .withColumn("__first",
        min(struct(col(idCol), col("chunk_idx"))).over(Window.partitionBy("h")))
      .where(struct(col(idCol), col("chunk_idx")) =!= col("__first"))
      .select(col(idCol), col("chunk_idx"))
    chunkRel.join(toDrop, Seq(idCol, "chunk_idx"), "left_anti")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_kept"),
        sum(length(col("chunk"))).cast("long").as("kept_chars"),
        // sort_array on (chunk_idx, chunk) structs restores original order
        // without requiring any ordering guarantee from the aggregation
        array_join(
          transform(sort_array(collect_list(struct(col("chunk_idx"), col("chunk")))),
            s => s.getField("chunk")), "").as("text"))
  }

  /** Incremental exact dedup: keep only the rows of `batch` whose content
    * hash does not already appear in `priorHashes` (a single-column relation
    * of sha256 hashes — the persisted "seen" index of an already-ingested
    * corpus). This is the arriving-data hygiene pass of a continuously fed
    * training corpus: dedup the delta against the whole history WITHOUT
    * re-scanning the history's text.
    *
    * Plan shape (100 TB): the history contributes only 32-byte hashes (its
    * text is never read); the batch hashes map-side and left-antis on the
    * hash — AQE broadcasts whichever side is small (a daily batch vs a year
    * of history, or a tiny history vs a bulk backfill). Batch payloads never
    * shuffle: the anti join carries (hash, id), and survivors re-attach by
    * id semi join. Within-batch duplicates are ALSO collapsed (min-id wins)
    * so output is fully deduped against history ∪ itself. Null-text rows
    * are excluded from the output (nothing to index or compare — a hygiene
    * pass discards them; contrast [[dropExactDuplicates]], which passes
    * them through for the in-corpus case). */
  def dedupAgainstCorpus(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      priorHashes: DataFrame): DataFrame = {
    val hashCol  = priorHashes.columns.head
    val batchKeys = batch
      .select(sha2(col(textCol), 256).as("__h"), col(idCol))
      .where(col("__h").isNotNull)
    val survivors = dropKeyDuplicates(batchKeys, "__h", idCol)
      .join(priorHashes.select(col(hashCol).as("__h")), Seq("__h"), "left_anti")
      .select(idCol)
    batch.join(survivors, Seq(idCol), "left_semi")
  }

  /** Keep the min-`idCol` row per distinct `keyCol` (helper for key-level
    * relations that are already projected down from payloads). */
  private def dropKeyDuplicates(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__keep", min(idCol).over(Window.partitionBy(keyCol)))
      .where(col(idCol) === col("__keep"))
      .drop("__keep")
  }

  /** 32-byte fingerprint of a text's distinct word-shingle SET: sha256
    * over the doc's SORTED distinct 64-bit shingle hashes — the same
    * splitmix-finished hash family the MinHash signature is built from,
    * computed in the signature kernel's single tokenize+shingle pass
    * (a separate Catalyst shingle pipeline measurably tripled the index
    * build cost: interpreted HOFs, per-doc array materialization).
    * Equal shingle sets give equal fingerprints always; unequal sets
    * collide only through the same per-shingle 64-bit collisions the
    * signature estimate already rides on. This definition is the
    * PERSISTED-INDEX contract: never change it — a redefined
    * fingerprint would silently stop matching docs indexed by an older
    * version. */
  def shingleSetHash(text: Column, shingleN: Int): Column = {
    val f = udf((t: String) =>
      if (t == null) null
      else sha256Hex(minHashKernel(t, shingleN, 0, EmptySeeds, wantSet = true)._2))
    f(text)
  }

  /** MinHash signature index of a corpus — the NEAR-dup analogue of
    * [[dedupAgainstCorpus]]'s hash index: persist this (id, sig, seth)
    * relation and incremental batches near-dedup against it without ever
    * re-reading the corpus text (8·numHashes + 32 bytes per historical
    * doc). `seth` is the exact shingle-SET fingerprint
    * ([[shingleSetHash]], computed in the same kernel pass as the
    * signature): at `minEstJaccard == 1.0`, [[nearDedupAgainstIndex]]
    * confirms candidates on set EQUALITY instead of the signature
    * estimate — a high-Jaccard non-identical pair collides on all
    * `numHashes` slots with probability ≈ J^numHashes (≈0.14 per J=0.97
    * pair at 64 hashes — real on corpora with planted near-dups), and
    * the fingerprint removes that false-positive direction while the
    * index stays text-free. */
  def minHashIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64): DataFrame =
    minHashSigs(df, textCol, idCol, shingleN, numHashes, withSeth = true)

  /** [[minHashIndex]] with the shingle-set fingerprint OPTIONAL: the
    * PERSISTED index always carries `seth` (that is the public contract
    * above), but a transient batch-side signature relation at a
    * FRACTIONAL threshold never consults it — materializing the set,
    * sorting it and running SHA-256 per arriving doc would be pure
    * wasted CPU on the streaming dedup hot path. `withSeth = false`
    * keeps the schema (a typed null `seth`) so downstream joins are
    * shape-identical. */
  private def minHashSigs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      numHashes: Int,
      withSeth: Boolean): DataFrame = {
    val seed      = 42L
    val slotSeeds = Array.tabulate(numHashes)(i => splitmix64(seed + i))
    if (withSeth) {
      val both = udf((t: String) =>
        if (t == null) null
        else {
          val (sig, set) = minHashKernel(t, shingleN, numHashes, slotSeeds, wantSet = true)
          (sig, sha256Hex(set))
        })
      df.select(col(idCol).as("id"), both(col(textCol)).as("__ss"))
        .where(col("__ss").isNotNull)
        .select(col("id"), col("__ss._1").as("sig"), col("__ss._2").as("seth"))
    } else {
      val sigOnly = udf((t: String) =>
        if (t == null) null
        else minHashKernel(t, shingleN, numHashes, slotSeeds, wantSet = false)._1)
      df.select(col(idCol).as("id"), sigOnly(col(textCol)).as("sig"))
        .where(col("sig").isNotNull)
        .withColumn("seth", lit(null).cast("string"))
    }
  }

  /** Batch rows with their MinHash signature AND shingle-set fingerprint
    * attached (`sig`, `seth` — the persisted-index column contract) in ONE
    * kernel pass per row — the streaming combined-sink form, where the
    * micro-batch sink doubles as the signature index and survivors persist
    * payload + signature together ([[graft.streaming.StreamingInference
    * .streamNearDedup]]). Null-text rows keep NULL sig/seth (they cannot
    * near-dup; index readers filter `sig IS NOT NULL`). Refuses a batch
    * already carrying the reserved column names. */
  private[graft] def withMinHashSigs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      numHashes: Int): DataFrame = {
    require(!df.columns.contains("sig") && !df.columns.contains("seth"),
      "withMinHashSigs: batch already carries a `sig`/`seth` column")
    val seed      = 42L
    val slotSeeds = Array.tabulate(numHashes)(i => splitmix64(seed + i))
    val both = udf((t: String) =>
      if (t == null) null
      else {
        val (sig, set) = minHashKernel(t, shingleN, numHashes, slotSeeds, wantSet = true)
        (sig, sha256Hex(set))
      })
    df.withColumn("__ss", both(col(textCol)))
      .select(df.columns.map(c => col(s"`$c`")) :+
        col("__ss._1").as("sig") :+ col("__ss._2").as("seth"): _*)
  }

  /** [[nearDedupAgainstIndex]] drop-set entry point for the streaming
    * combined-sink path: the caller owns the signature frame's cache
    * lifecycle (the returned drop set is LAZY — evaluate it while
    * `batchSigs`' persist is live). */
  private[graft] def nearDedupDropSet(
      batchSigs: DataFrame, // (id, sig, seth)
      index: DataFrame,     // (id, sig, seth)
      numHashes: Int,
      bands: Int,
      minEstJaccard: Double,
      maxBucketSize: Int = 64): DataFrame =
    nearDedupDropIds(batchSigs, index, numHashes, bands, minEstJaccard,
      exact = minEstJaccard >= 1.0 && index.columns.contains("seth"), maxBucketSize)

  /** Incremental NEAR-dedup of an arriving batch against a persisted
    * [[minHashIndex]]: drop batch docs whose estimated Jaccard vs ANY
    * historical doc reaches `minEstJaccard`, and collapse within-batch
    * near-dup groups to the min id (one-pass rule, as
    * [[dropNearDuplicates]]). Returns surviving batch rows.
    *
    * Confirmation at FRACTIONAL thresholds is the SIGNATURE estimate on
    * both legs — the index deliberately holds no text, so the
    * exact-Jaccard re-check of the in-corpus path is unavailable; with 64
    * hashes the estimate's standard error is ≈ 1/√64 ≈ 0.125, which is
    * the documented precision contract there (tighten with more hashes,
    * not with a text re-read). At `minEstJaccard == 1.0` the decision is
    * EXACT when the index carries the [[shingleSetHash]] `seth` column
    * (every [[minHashIndex]] since r18 does): candidates confirm on set
    * equality, so neither leg can drop a doc to an all-slots estimate
    * collision (P ≈ J^numHashes per high-J pair). A legacy index without
    * `seth` falls back to the estimate with its documented collision
    * risk. Recall is unchanged either way: equal sets imply equal
    * signatures, so every true pair still meets in all its bands.
    *
    * Plan shape (100 TB): both sides band map-side; candidates meet in the
    * (band_key, id) join, signatures re-attach per unique candidate pair by
    * id join, batch payloads shuffle never (survivor semi join at the end).
    * History bands are index-derived — the corpus text stays cold. */
  def nearDedupAgainstIndex(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      index: DataFrame, // (id, sig[, seth]) from minHashIndex
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      minEstJaccard: Double = 0.8,
      maxBucketSize: Int = 64): DataFrame = {
    val exact = minEstJaccard >= 1.0 && index.columns.contains("seth")
    val batchSigs = minHashSigs(batch, textCol, idCol, shingleN, numHashes, withSeth = exact)
    batchSigs.persist()
    try {
      // checkpoint the DROP SET (ids only, bounded) while the signature
      // cache is live — never the payload-carrying result (withSigsCache's
      // discipline); the anti join then evaluates lazily against it
      val dropIds = nearDedupDropIds(batchSigs, index, numHashes, bands,
        minEstJaccard, exact, maxBucketSize)
        .withColumnRenamed("id", idCol)
        .localCheckpoint(true)
      batch.join(dropIds, Seq(idCol), "left_anti")
    } finally batchSigs.unpersist(false)
  }

  /** Drop-id set for [[nearDedupAgainstIndex]]: batch ids whose estimated
    * Jaccard vs ANY history doc reaches the threshold, plus within-batch
    * group losers (min-id-wins). ONE unified band join generates both
    * candidate legs (r19; previously two joins + three distincts): the
    * batch side probes (history ∪ lower-id batch siblings) in a single
    * pass. Cap semantics are unchanged pair-for-pair:
    *  - batch×history pair (b,h) exists iff they share a band key whose
    *    batch-side count AND hist-side count are both ≤ `maxBucketSize`
    *    (the old per-side underCap anti-joins);
    *  - within-batch pair (a,b), a<b, exists iff they share a band key
    *    with batch-side count in [2, maxBucketSize] (BoundedBucket's gate;
    *    the ≥2 bound is implied by the pair itself, and both endpoints sit
    *    in the SAME bucket so one per-key gate covers both).
    * Only (band_key, id) rows flow through the join; signatures re-attach
    * per unique candidate afterwards (§2.3 payload discipline — ids, not
    * 8·numHashes-byte signatures, cross the candidate shuffle). */
  private def nearDedupDropIds(
      batchSigs: DataFrame, // (id, sig, seth) — seth may be typed-null
      index: DataFrame,     // (id, sig[, seth]) from minHashIndex
      numHashes: Int,
      bands: Int,
      minEstJaccard: Double,
      exact: Boolean,
      maxBucketSize: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val r = numHashes / bands
    // candidate confirmation: exact set equality at J == 1.0, signature
    // estimate at fractional thresholds (see scaladoc). Per-PAIR legacy
    // fallback inside the exact path: a pre-seth index row surfaces a
    // null fingerprint under parquet schema merge, and `null === x`
    // would silently UNCONFIRM it — an exact copy in a legacy index
    // must still drop, so null-fingerprint pairs keep the estimate.
    def confirmed(sigA: Column, sigB: Column, sethA: Column, sethB: Column): Column =
      if (exact)
        when(sethA.isNotNull && sethB.isNotNull, sethA === sethB)
          .otherwise(estimatedJaccardNative(sigA, sigB) >= minEstJaccard)
      else estimatedJaccardNative(sigA, sigB) >= minEstJaccard
    val histSigs =
      if (exact) index.select(col("id"), col("sig"), col("seth"))
      else index.select(col("id"), col("sig"), lit(null).cast("string").as("seth"))
    val batchBands = batchSigs.select(col("id"),
      explode(lshBandKeys(col("sig"), bands, r)).as("band_key"))
    val histBands  = histSigs.select(col("id"),
      explode(lshBandKeys(col("sig"), bands, r)).as("band_key"))
    // Degenerate band keys (empty/boilerplate docs banding to one value)
    // are dropped per side first — without the cap the band join is the
    // one uncapped m·n pair generator in the file (a hot key shared by a
    // 10k-doc batch and a 10M-doc history materializes 10¹¹ rows);
    // recall contract as always: near-dups in a dropped bucket still meet
    // in their other bands. The per-side count is a skinny (band_key)
    // aggregation, and the anti join ships only the (tiny) over-cap keys.
    def underCap(bnds: DataFrame): DataFrame =
      bnds.join(
        bnds.groupBy("band_key").agg(count(lit(1)).as("__n"))
          .where(col("__n") > maxBucketSize).select("band_key"),
        Seq("band_key"), "left_anti")
    val bOk = underCap(batchBands)
    val hOk = underCap(histBands)
    // the probe side: history docs plus batch siblings; `__hist`
    // disambiguates the two id domains (a replayed doc id can exist in
    // both) and selects which sig relation re-attaches below
    val others = hOk.select(col("band_key"), col("id").as("o_id"), lit(true).as("__hist"))
      .unionAll(bOk.select(col("band_key"), col("id").as("o_id"), lit(false).as("__hist")))
    val oSigs = batchSigs.select(col("id").as("o_id"), lit(false).as("__hist"),
        col("sig").as("sig_o"), col("seth").as("seth_o"))
      .unionAll(histSigs.select(col("id").as("o_id"), lit(true).as("__hist"),
        col("sig").as("sig_o"), col("seth").as("seth_o")))
    bOk.select(col("band_key"), col("id").as("b_id"))
      .join(others, Seq("band_key"))
      .where(col("__hist") || col("o_id") < col("b_id"))
      .select("b_id", "o_id", "__hist").distinct()
      .join(batchSigs.select(col("id").as("b_id"), col("sig").as("sig_b"),
        col("seth").as("seth_b")), Seq("b_id"))
      .join(oSigs, Seq("o_id", "__hist"))
      .where(confirmed(col("sig_b"), col("sig_o"), col("seth_b"), col("seth_o")))
      .select(col("b_id").as("id")).distinct()
  }

  // ---------------------------------------------------------- shingling

  /** Distinct character n-gram (shingle) set of the lowercased text. */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(trim(text))
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
        i => t.substr(i, lit(n))))
  }

  /** Distinct word n-gram set (n consecutive tokens joined by a space). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  // ----------------------------------------------------------- minhash

  /** JVM replica of `TextAnalysis.tokens` (= `split(trim(lower(text)),
    * "\\s+")`) — the kernels MUST tokenize exactly like the Catalyst form:
    * Spark's `trim` strips only 0x20 spaces (Java's `String.trim` also
    * strips tabs/newlines/control chars — a real divergence on texts edged
    * with them), and Spark's `split` keeps leading AND trailing empty
    * tokens (Java's one-arg `split` drops trailing empties). */
  private[operators] def sparkTokens(text: String): Array[String] =
    sparkTrim(text).toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)

  /** JVM replica of Catalyst `trim`: strips ONLY leading/trailing 0x20
    * spaces. Java's `String.trim` also strips tabs/newlines/control chars
    * (everything <= 0x20) — a real divergence on texts edged with them, so
    * every kernel that must match a `trim(...)` Catalyst plan or the DuckDB
    * oracle has to route through this instead. */
  private[operators] def sparkTrim(text: String): String = {
    var s = 0; var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    text.substring(s, e)
  }

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a2ca9ab4c19bL
    z ^ (z >>> 31)
  }

  /** MinHash signature (array of `numHashes` longs) of a shingle-set column.
    *
    * Hash family: an INDEPENDENT hash per slot — slot i takes the min over
    * shingles of `xxhash64(shingle, i)`. (An affine `(a*h+b) mod p` family
    * sized to avoid ANSI-mode long overflow is a trap: with `a*h < p` the
    * map never wraps, is monotone in `h`, and every slot collapses to the
    * same min-base-hash shingle — the Jaccard estimate degenerates toward
    * 1.0. Independent slot hashes have no multiplication and no bias.)
    *
    * One sequential fold over the shingle array; pure per-row computation —
    * embarrassingly parallel, zero shuffle. */
  def minHashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    val init = array(Array.fill(numHashes)(lit(Long.MaxValue)): _*)
    aggregate(
      shingles,
      init,
      (acc, s) => {
        val perms = array((0 until numHashes).map(i => xxhash64(s, lit(seed), lit(i))): _*)
        zip_with(acc, perms, (x, y) => least(x, y))
      })
  }

  /** Tight-loop JVM MinHash signature kernel — same semantics as
    * [[minHashSignature]] (own base hash family) but ~an order of magnitude
    * faster: Catalyst higher-order functions evaluate interpreted, and the
    * 64-permutation fold per shingle dominates; a scalar UDF with a while
    * loop is the sanctioned escape hatch for per-row imperative kernels
    * (SURVEY.md §7 custom-vs-builtin tally). Tokenization + shingling +
    * hashing happen inside the loop — no intermediate arrays cross the
    * Tungsten boundary. */
  def minHashSignatureUdf(shingleN: Int, numHashes: Int, seed: Long = 42L)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    // independent per-slot seeds (see minHashSignature: affine families
    // constrained to avoid overflow degenerate; slot-wise mixing does not)
    val slotSeeds = Array.tabulate(numHashes)(i => splitmix64(seed + i))
    udf((text: String) => {
      if (text == null) null // null-propagate like the Catalyst HOF form
      else minHashSignatureKernel(text, shingleN, numHashes, slotSeeds)
    })
  }

  private def minHashSignatureKernel(
      text: String, shingleN: Int, numHashes: Int, slotSeeds: Array[Long]): Array[Long] =
    minHashKernel(text, shingleN, numHashes, slotSeeds, wantSet = false)._1

  private val EmptySeeds = Array.empty[Long]

  /** The single tokenize+shingle+hash pass behind [[minHashSignatureUdf]]
    * and [[minHashIndex]]: yields the numHashes-slot signature and, when
    * `wantSet`, the doc's SORTED distinct 64-bit shingle hashes (the
    * [[shingleSetHash]] input). One pass for both — the index grain needs
    * signature AND fingerprint, and tokenization dominates. */
  private def minHashKernel(text: String, shingleN: Int, numHashes: Int,
      slotSeeds: Array[Long], wantSet: Boolean): (Array[Long], Array[Long]) = {
    val toks = sparkTokens(text)
    val sig  = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[Long]()
    val last = math.max(0, toks.length - shingleN)
    var j    = 0
    while (j <= last) {
      // polynomial hash over the shingle's tokens, splitmix-finished
      var h = 1125899906842597L
      var t = j
      val end = math.min(toks.length, j + shingleN)
      while (t < end) {
        val s = toks(t)
        var c = 0
        while (c < s.length) { h = 31 * h + s.charAt(c); c += 1 }
        h = 31 * h + ' '
        t += 1
      }
      val h0 = splitmix64(h)
      if (seen.add(h0)) {
        var k = 0
        while (k < numHashes) {
          val v = splitmix64(h0 ^ slotSeeds(k))
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      j += 1
    }
    if (!wantSet) (sig, null)
    else {
      val set = new Array[Long](seen.size)
      val it  = seen.iterator()
      var i   = 0
      while (it.hasNext) { set(i) = it.next(); i += 1 }
      java.util.Arrays.sort(set)
      (sig, set)
    }
  }

  /** Lowercase-hex SHA-256 over the big-endian bytes of `sorted` — the
    * [[shingleSetHash]] encoding. */
  private def sha256Hex(sorted: Array[Long]): String = {
    val buf = java.nio.ByteBuffer.allocate(8 * sorted.length)
    var i = 0
    while (i < sorted.length) { buf.putLong(sorted(i)); i += 1 }
    val d  = java.security.MessageDigest.getInstance("SHA-256").digest(buf.array())
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < d.length) {
      sb.append(Character.forDigit((d(b) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(b) & 0xf, 16))
      b += 1
    }
    sb.toString
  }

  /** Estimated Jaccard similarity = fraction of agreeing signature slots.
    * Composable Catalyst form; [[estimatedJaccardNative]] is the codegen
    * expression used on the per-pair hot path. Value-identical edge
    * contract: either side empty (the MinHashUnion zero of an all-null
    * group) → 0.0; mismatched non-empty lengths → runtime error (zip_with
    * would silently null-pad and return a plausible-looking number for
    * signatures from different numHashes configs). */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    when(size(sigA) === 0 || size(sigB) === 0, lit(0.0))
      .when(size(sigA) =!= size(sigB),
        raise_error(concat(lit("estimatedJaccard: mismatched signature lengths "),
          size(sigA).cast("string"), lit(" vs "), size(sigB).cast("string"))).cast("double"))
      .otherwise(
        aggregate(
          zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
          lit(0),
          (acc, x) => acc + x).cast("double") / size(sigA).cast("double"))

  /** Native-expression form of [[estimatedJaccard]]
    * (see [[graft.plans.MinHashAgreement]]) — identical values, primitive
    * codegen loop. Requires the GraftExtensions session extension. */
  def estimatedJaccardNative(sigA: Column, sigB: Column): Column =
    call_function("graft_minhash_est", sigA, sigB)

  /** LSH band keys: hash each of `bands` contiguous signature slices
    * (band index is mixed in so identical slices in different bands do not
    * collide). */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(j => xxhash64(slice(sig, j * rowsPerBand + 1, rowsPerBand), lit(j))): _*)

  /** Cache-scoped execution for the pair generators: the (id, signature)
    * projection is persisted for its three uses (banding + two re-attach
    * joins), the pair result is materialized EAGERLY via localCheckpoint
    * while the cache is live, and the cache is released before returning —
    * no session-lifetime cached blocks (ADVICE r01). The returned frame is
    * backed by the checkpoint blocks (bounded: pairs only, no payloads),
    * which the ContextCleaner reclaims once the frame is unreachable. */
  private[operators] def withSigsCache(sigs: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    sigs.persist()
    try build(sigs).localCheckpoint(true)
    finally sigs.unpersist(false)
  }

  /** Size-capped bucket collector: counts every row exactly, collects ids
    * only up to cap+1 (enough to DETECT overflow without ever buffering a
    * mega-bucket), and finishes to the id list iff 2 ≤ n ≤ cap — empty
    * otherwise. Buffer memory is ≤ (cap+1) ids per bucket by
    * construction, on the partial (map) side too. Generic over the id
    * type — instantiated for long AND string ids ([[bucketedPairs]]
    * dispatches on the column type; the exact-dedup family supports
    * string/UUID document ids, so the LSH family must too). */
  private class BoundedBucket[T](cap: Int)(implicit
      bEnc: org.apache.spark.sql.Encoder[(Long, Seq[T])],
      oEnc: org.apache.spark.sql.Encoder[Seq[T]])
      extends org.apache.spark.sql.expressions.Aggregator[
        T, (Long, Seq[T]), Seq[T]] {
    override def zero: (Long, Seq[T]) = (0L, Vector.empty)
    override def reduce(b: (Long, Seq[T]), id: T): (Long, Seq[T]) =
      (b._1 + 1, if (b._2.length <= cap) b._2 :+ id else b._2)
    override def merge(a: (Long, Seq[T]), b: (Long, Seq[T])): (Long, Seq[T]) =
      (a._1 + b._1, (a._2 ++ b._2).take(cap + 1))
    override def finish(b: (Long, Seq[T])): Seq[T] =
      if (b._1 >= 2 && b._1 <= cap) b._2 else Seq.empty
    override def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Seq[T])] = bEnc
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[T]] = oEnc
  }

  /** Bucketed pair generation shared by the LSH candidate generators: ONE
    * size-capped aggregation collects each surviving bucket's (bounded) id
    * list and the pair cartesian is a MAP-SIDE double explode — no
    * self-join shuffle, no pre-pass. A bucket of n rows yields n(n-1)/2
    * pairs — the cap keeps one degenerate mega-bucket (boilerplate, empty
    * docs, …) from dominating quadratically; near-dups inside a dropped
    * bucket still meet in their other buckets.
    *
    * The r8 scaling study (SCALING.md) showed the previous two-pass form
    * (count pre-pass + keep-join + collect) shuffling the banded frame
    * TWICE once the surviving-bucket frame outgrew the broadcast
    * threshold (×60+ fixtures); [[BoundedBucket]] enforces the cap inside
    * the single aggregation instead — same surviving-bucket semantics
    * (exact count gate, ids only materialized for buckets under the cap),
    * half the wire. */
  private[operators] def bucketedPairs(
      banded: DataFrame, // (bucketCols…, id)
      bucketCols: Seq[String],
      maxBucketSize: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val bucketed = banded.schema("id").dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        udaf(new BoundedBucket[Long](maxBucketSize)(
          ExpressionEncoder[(Long, Seq[Long])](), ExpressionEncoder[Seq[Long]]()))
          .apply(col("id").cast("long"))
      case StringType =>
        udaf(new BoundedBucket[String](maxBucketSize)(
          ExpressionEncoder[(Long, Seq[String])](), ExpressionEncoder[Seq[String]]()))
          .apply(col("id"))
      case other => sys.error(
        s"bucketedPairs: unsupported id type $other — integral or string ids")
    }
    banded.groupBy(bucketCols.map(col): _*)
      .agg(bucketed.as("__ids"))
      .where(size(col("__ids")) >= 2)
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Near-duplicate candidate pairs via MinHash + LSH banding.
    *
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b, filtered to
    * `minJaccard`. The only shuffled payload is (band_key, id, signature);
    * rows sharing any band bucket meet in a self-equi-join on band_key.
    * At 100 TB the band join is the classic LSH plan: bucket sizes stay
    * small for reasonable (bands, rowsPerBand), and AQE handles stragglers
    * from pathological buckets. Evaluates eagerly (see [[withSigsCache]]).
    *
    * Requires the `GraftExtensions` session extension (the per-pair Jaccard
    * estimate runs through the native `graft_minhash_est` expression);
    * `GraftSession.configure` registers it — a bare SparkSession fails at
    * analysis with an unresolved-function error. Same requirement for
    * [[dropNearDuplicates]] / [[dropNearDuplicatesTransitive]]. */
  def minHashCandidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val r = numHashes / bands
    val rawSigs = df.select(
      col(idCol).as("id"),
      minHashSignatureUdf(shingleN, numHashes)(col(textCol)).as("sig"))
      .where(col("sig").isNotNull) // null-text rows can't near-dup; drop before banding
    withSigsCache(rawSigs) { sigs =>
      // Payload discipline: only (band_key, id) — 16 bytes — flows through the
      // band join and the pair dedup; the 8*numHashes-byte signatures are
      // re-attached per unique pair afterwards by id join.
      val banded = sigs
        .select(col("id"), explode(lshBandKeys(col("sig"), bands, r)).as("band_key"))
      val pairs = bucketedPairs(banded, Seq("band_key"), maxBucketSize)
      pairs
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), estimatedJaccardNative(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .where(col("est_jaccard") >= minJaccard)
    }
  }

  // ----------------------------------------------------------- simhash

  private val BitMasks: Array[Long] = Array.tabulate(64)(b => 1L << b)

  /** 64-bit SimHash over a token array: bit b of the result is set iff the
    * sum over tokens of ±1 (sign = bit b of xxhash64(token)) is positive.
    * Single per-row fold, no shuffle. */
  def simHash(tokensCol: Column): Column = {
    val masks = array(BitMasks.map(lit): _*)
    val counters = aggregate(
      tokensCol,
      array(Array.fill(64)(lit(0L)): _*),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, masks, (c, m) => c + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(counters, masks, (c, m) => when(c > 0L, m).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Tight-loop JVM SimHash kernel — same rationale as
    * [[minHashSignatureUdf]]: the 64-lane counter update per token is
    * interpreted under Catalyst HOFs; a while-loop UDF wins decisively.
    * Null text null-propagates (boxed return type). */
  val simHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      if (text == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(simHashKernel(text))
    })

  private def simHashKernel(text: String): Long = {
    {
      val toks     = sparkTokens(text)
      val counters = new Array[Int](64)
      var i        = 0
      while (i < toks.length) {
        val s = toks(i)
        var h = 1125899906842597L
        var c = 0
        while (c < s.length) { h = 31 * h + s.charAt(c); c += 1 }
        h = splitmix64(h)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b   = 0
      while (b < 64) { if (counters(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: block on 4 × 16-bit sub-hashes (two
    * hashes within Hamming distance ≤3 of each other share at least one
    * exact 16-bit block — pigeonhole), then filter on true distance.
    * `maxHamming` is capped at 3: beyond that the 4-block scheme can no
    * longer guarantee candidate recall, so larger radii are rejected rather
    * than silently under-reporting. The `maxBucketSize` cap is the OTHER
    * recall trade: a block bucket past the cap is dropped, and at distance
    * exactly 3 a pair may share only ONE block (pigeonhole is tight), so
    * pairs inside a dropped bucket can be missed — unlike LSH banding,
    * "they meet in their other buckets" does NOT hold here. Raise
    * maxBucketSize (bounded memory, quadratic pairs per bucket) when the
    * guarantee must be exact on boilerplate-heavy corpora. The (id, hash) projection is cached for
    * the duration of the pair build and released before returning
    * ([[withSigsCache]] — it feeds blocking plus both re-attach joins). */
  def simHashCandidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming must be in [0,3]: the 4-block pigeonhole only guarantees recall to distance 3")
    val rawHashed = df.select(
      col(idCol).as("id"),
      simHashUdf(col(textCol)).as("sh"))
      .where(col("sh").isNotNull) // null-text rows can't near-dup; drop before blocking
    withSigsCache(rawHashed) { hashed =>
      val blocked = hashed.select(
        col("id"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("blk"), shiftright(col("sh"), j * 16).bitwiseAND(0xffffL).as("key"))): _*)).as("block"))
        .select(col("id"), col("block.blk"), col("block.key"))
      val pairs = bucketedPairs(blocked, Seq("blk", "key"), maxBucketSize)
      pairs
        .join(hashed.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(hashed.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
        .where(col("hamming") <= maxHamming)
    }
  }

  // ------------------------------------------------- edit-distance join

  /** All strings reachable from `s` by deleting exactly one character —
    * pure Catalyst HOF (codegen'd), no UDF. */
  private def deleteOne(s: Column): Column =
    transform(sequence(lit(1), length(s)), i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))

  /** The up-to-`d`-deletions neighborhood of `s` (including `s` itself),
    * distinct. Size is O(len^d) — intended for short strings (names,
    * titles, codes), per [[editDistanceJoinPairs]]'s contract. */
  def deletionVariants(s: Column, d: Int): Column = {
    var vs = array(s)
    (1 to d).foreach { _ =>
      vs = array_distinct(concat(vs, flatten(transform(vs, v => deleteOne(v)))))
    }
    vs
  }

  /** Edit-distance fuzzy self-join: all pairs within Levenshtein distance
    * `maxDist`, exactly (full recall, no false positives). Candidate
    * generation is FastSS deletion neighborhoods (Bocek et al., "Fast
    * Similarity Search in Large Dictionaries", 2007): if dist(s,t) ≤ d,
    * deleting the ≤d unaligned characters of an optimal alignment from each
    * side yields a COMMON string, so the ≤d-deletion neighborhoods
    * intersect — joining on neighborhood members is recall-complete, and the
    * exact `levenshtein` verify removes false candidates.
    *
    * Scale shape (100 TB): per row this emits O(len^d) short keys; the
    * shuffle carries (variant_key, id, short string) — never a document
    * payload. Contract: `strCol` holds NAME/TITLE-length strings and should
    * be exact-deduped first (identical strings share every variant key, so
    * k identical copies cost k² candidate pairs — run
    * [[dropExactDuplicates]] upstream, which a dedup pipeline does anyway);
    * document-scale similarity belongs to MinHash/SimHash above. */
  def editDistanceJoinPairs(
      df: DataFrame,
      strCol: String,
      idCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (neighborhood size is O(len^d)), got $maxDist")
    val strs = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .where(col("s").isNotNull)
    // The variant join shuffles (key, id) ONLY — attaching the strings here
    // would replicate each string once per deletion variant (O(len^d)
    // copies) through the join and the distinct; instead the deduped pair
    // list re-attaches both strings by two id joins afterwards (pairs ≪
    // variants, and the id side is the original table, broadcast under AQE).
    val keyed = strs
      .select(col("id"), explode(deletionVariants(col("s"), maxDist)).as("k"))
    val cand = keyed.as("a")
      .join(keyed.as("b"), col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // pairs sharing several variant keys verify once, not once per key
    cand
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      // threshold form = banded DP, O(len·d) per pair instead of O(len²);
      // returns -1 above the threshold, hence the >= 0 guard
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b"), maxDist).cast("long").as("dist"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** End-to-end near-dedup: generate MinHash+LSH candidates, confirm them
    * with exact n-gram Jaccard, then keep one representative per pair by
    * dropping the larger id (standard "keep first" policy — for chains
    * a~b~c this conservatively drops b and c; exact transitive clustering
    * would need iterative connected components, which near-dedup pipelines
    * typically skip in favor of this one-pass rule).
    *
    * Scale shape: candidates + confirmation shuffle only ids/signatures;
    * the final anti-join removes the drop-set from the full corpus in one
    * broadcast-able pass (the drop-set is pairs-bounded, far smaller than
    * the corpus). */
  def dropNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.8,
      maxBucketSize: Int = 64): DataFrame = {
    // maxBucketSize passes through to the LSH candidate generator: an
    // IDENTICAL-text group shares the same bucket in EVERY band, so a
    // group larger than the cap is dropped from all its buckets at once
    // and its members escape dedup — size the cap above the largest
    // expected exact-duplicate multiplicity (boilerplate/empty docs)
    val candidates = minHashCandidatePairs(df, textCol, idCol, shingleN, numHashes, bands,
      minJaccard = minJaccard * 0.8, // permissive estimate; exact check decides
      maxBucketSize = maxBucketSize)
    val confirmed = verifyPairsExactJaccard(candidates, df, textCol, idCol, shingleN)
      .where(col("jaccard") >= minJaccard)
    val toDrop = confirmed.select(col("id_b").as(idCol)).distinct()
    df.join(toDrop, Seq(idCol), "left_anti")
  }

  /** Distributed connected components over an undirected pair-edge list by
    * iterative min-label propagation: every vertex repeatedly adopts the
    * minimum component id among itself and its neighbors, converging in
    * O(graph diameter) rounds — near-dup graphs are shallow (dup clusters
    * are dense), so a handful of rounds suffices at corpus scale. Each round
    * is one join + aggregation over (id, comp) pairs only; lineage is cut
    * with localCheckpoint per round so plans stay flat. Returns
    * (id, component) with component = min id of the cluster. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist()
    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var converged = false
    var i         = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("id_b"), col("component").as("ncomp")), Seq("id_b"))
        .groupBy(col("id_a").as("id"))
        .agg(min("ncomp").as("ncomp"))
      val next = labels
        .join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
        .localCheckpoint()
      val changed = next.join(labels.select(col("id"), col("component").as("prev")), Seq("id"))
        .where(col("component") =!= col("prev")).limit(1).count() > 0
      labels = next
      converged = !changed
      i += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] connectedComponents: not converged after $maxIter rounds — " +
          "a component wider than the iteration budget may report multiple representatives")
    edges.unpersist()
    labels
  }

  /** Transitive near-dedup: clusters ALL connected candidates (a~c through
    * b even when (a,c) was never a candidate pair) and keeps the min-id
    * representative of each component — the exact clustering the one-pass
    * keep-first policy of [[dropNearDuplicates]] approximates. */
  def dropNearDuplicatesTransitive(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.8): DataFrame = {
    val candidates = minHashCandidatePairs(df, textCol, idCol, shingleN, numHashes, bands,
      minJaccard = minJaccard * 0.8)
    val confirmed = verifyPairsExactJaccard(candidates, df, textCol, idCol, shingleN)
      .where(col("jaccard") >= minJaccard)
    val comps = connectedComponents(confirmed.select("id_a", "id_b"))
    val toDrop = comps.where(col("id") =!= col("component")).select(col("id").as(idCol))
    df.join(toDrop, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------- minhash UDAF

  /** MinHash set-union sketch as a custom `Aggregator` (the one genuine
    * UDAF this engine needs — SURVEY.md §2h): aggregating row signatures
    * with element-wise min yields the signature of the UNION of the rows'
    * shingle sets, so `groupBy(k).agg(minHashUnion(sig))` estimates
    * cross-group Jaccard on arbitrarily large groups in one distributive
    * pass (partial aggregation map-side, like sum). */
  class MinHashUnion extends org.apache.spark.sql.expressions.Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty
    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
      if (a == null) b // null-text rows contribute nothing to the union
      else if (b.isEmpty) a.toArray
      else {
        require(a.length == b.length,
          s"MinHashUnion: mixed signature lengths ${a.length} vs ${b.length} in one group")
        var i = 0; while (i < b.length) { if (a(i) < b(i)) b(i) = a(i); i += 1 }; b
      }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      if (b1.isEmpty) b2 else if (b2.isEmpty) b1
      else {
        require(b1.length == b2.length,
          s"MinHashUnion: mixed signature lengths ${b1.length} vs ${b2.length} in one group")
        var i = 0; while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }; b1
      }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form of [[MinHashUnion]] for `agg(...)`. */
  def minHashUnion(sig: Column): Column =
    udaf(new MinHashUnion()).apply(sig)

  /** Per-group MinHash signatures: estimate Jaccard between whole groups
    * (e.g. near-duplicate SOURCES, not documents). */
  def groupMinHashSignatures(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      shingleN: Int = 1,
      numHashes: Int = 64): DataFrame =
    df.select(col(groupCol), minHashSignatureUdf(shingleN, numHashes)(col(textCol)).as("sig"))
      .groupBy(groupCol)
      .agg(minHashUnion(col("sig")).as("group_sig"))

  // ------------------------------------------------------ n-gram jaccard

  /** Exact Jaccard similarity between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / uni.cast("double"))
  }

  /** Exact-threshold Jaccard set-similarity JOIN via prefix filtering
    * (Bayardo, Ma, Srikant 2007, "Scaling Up All Pairs Similarity
    * Search"; Xiao et al.'s PPJoin refines the same principle): under a
    * shared global token order, any pair with J(a,b) ≥ t shares at least
    * one token inside each side's (n − ⌈t·n⌉ + 1)-prefix — so candidates
    * come from a skinny equi-join on PREFIX tokens only, then verify
    * exactly. Unlike the MinHash/LSH path this has NO false negatives:
    * the output is exactly every qualifying pair — the op to reach for
    * when the dedup decision must be auditable.
    *
    * Exactness discipline: the threshold is interpreted as the rational
    * round(minJaccard·10⁶)/10⁶ and EVERY threshold comparison is integer
    * (prefix length via ceil-div, the min·den ≥ num·max length filter,
    * the i·den ≥ num·u verification) — a float ⌈t·n⌉ can round the
    * prefix one token short and silently drop qualifying pairs (0.6·5
    * ceils to 4 in doubles). The reported `jaccard` column is display
    * rounding only.
    *
    * Scale shape (100 TB): the global order is RAREST-FIRST (document
    * frequency asc, token asc), so prefix buckets are dominated by rare
    * tokens — the AllPairs heuristic that keeps the candidate join's
    * fan-out small; the length filter prunes cross-size pairs before
    * token arrays re-attach; only (token-hash, id, n) triples and the
    * candidate pairs shuffle — every stage past the one shingling
    * projection runs in the 64-bit hash domain. No bucket cap exists
    * here BY CONTRACT (exactness forbids dropping); for corpora where a
    * frequent token lands in many prefixes, the LSH path is the
    * approximate fallback. Evaluates eagerly (see [[withSigsCache]]). */
  def jaccardJoinExact(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minJaccard: Double,
      shingleN: Int = 2): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard in (0, 1], got $minJaccard (0 would join all pairs)")
    val den  = 1000000L
    val num  = math.round(minJaccard * den)
    // set elements are word shingles, not raw tokens: on a corpus with a
    // compact vocabulary nearly ALL token-set pairs clear any threshold
    // (measured: 74% of fixture pairs at t=0.5) — shingles carry the
    // word-order signal that makes the join discriminative, the same
    // reason the MinHash family shingles.
    //
    // Wire + work discipline: shingle STRINGS exist only inside this one
    // projection — every downstream stage (document-frequency count,
    // global ordering, prefix join, verification intersect) runs in the
    // 64-bit xxhash64 domain (~2.5× fewer bytes than strings through
    // every shuffle; the f=200 scaling run exhausted 70 GB of spill disk
    // on string arrays before the verification stage alone was hashed).
    // Set identity via xxhash64 carries the same 2⁻⁶⁴-collision contract
    // as sha256 content-hash dedup ([[exactGroups]]); the global prefix
    // order just needs to be any consistent total order, so (df asc,
    // hash asc) serves exactly as well as (df asc, token asc). The frame
    // is cached because THREE stages consume it (df-count, ordering,
    // verification) — uncached, the shingling UDF re-runs per consumer.
    val setsH = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), wordShinglesUdf(shingleN)(col(textCol)).as("toks"))
      .where(col("toks").isNotNull)
      .select(col("id"),
        array_sort(transform(col("toks"), t => xxhash64(t))).as("h"),
        size(col("toks")).cast("long").as("hn"))
    withSigsCache(setsH) { sets =>
      val expl = sets.select(col("id"), explode(col("h")).as("tok"))
      val freq = expl.groupBy("tok").agg(count(lit(1)).as("df"))
      // per-doc token hashes in global (df asc, hash asc) order + doc size
      val ordered = expl.join(freq, "tok")
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("sorted"))
        .select(col("id"),
          transform(col("sorted"), s => s.getField("tok")).as("toks"),
          size(col("sorted")).as("n"))
      // prefix length n − ceilDiv(num·n, den) + 1. The divide-then-truncate
      // is exact here: n·num + den−1 ≤ ~2^50 is an exact double, /10⁶ is
      // correctly rounded, and a non-integer true quotient sits ≥ 10⁻⁶ from
      // the next integer — 4 orders beyond the ulp — so truncation equals
      // the integer ceil-div for every representable n.
      val prefix = ordered.select(col("id"), col("n"),
          posexplode(slice(col("toks"), lit(1),
            (col("n") - (col("n") * num + (den - 1)).divide(den).cast("long") + 1).cast("int"))))
        .select(col("id"), col("n"), (col("pos") + 1).as("rk"), col("col").as("tok"))
      // pair-specific overlap bound α = ceil(t·(n_a+n_b)/(1+t)) — with
      // t = num/den: ceilDiv(num·(n_a+n_b), num+den); same exact-truncation
      // argument as the prefix (gap ≥ 1/(num+den) ≫ ulp)
      def alpha(nA: Column, nB: Column): Column =
        (((nA + nB) * num + (num + den - 1)).divide(num + den)).cast("long")
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
            // length filter: J ≥ t ⇒ min(n)·den ≥ num·max(n)
            least(col("a.n"), col("b.n")) * den >= greatest(col("a.n"), col("b.n")) * num &&
            // PPJoin positional filter: tokens matching at sorted ranks
            // (rk_a, rk_b) cap the possible overlap at
            // 1 + min(n_a − rk_a, n_b − rk_b) — prune pairs that cannot
            // reach α even if every remaining token matched
            lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) >=
              alpha(col("a.n"), col("b.n")))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      // verification re-attaches the cached sorted hash arrays; the union
      // is never materialized (u = n_a + n_b − i)
      val withSets = cand
        .join(sets.select(col("id").as("id_a"), col("h").as("h_a"), col("hn").as("n_a")), Seq("id_a"))
        .join(sets.select(col("id").as("id_b"), col("h").as("h_b"), col("hn").as("n_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("h_a"), col("h_b"))).cast("long").as("i"),
          col("n_a"), col("n_b"))
        .withColumn("u", col("n_a") + col("n_b") - col("i"))
      withSets
        .where(col("i") * den >= col("u") * num && col("u") > 0)
        .select(col("id_a"), col("id_b"),
          round(col("i").cast("double") / col("u").cast("double"), 6).as("jaccard"))
    }
  }

  /** Tight-loop exact word-shingle Jaccard between two raw texts — value-
    * identical to `jaccard(wordShingles(a,n), wordShingles(b,n))` (HashSet
    * intersect over the same distinct shingle sets, same division), but a
    * single JVM kernel instead of interpreted HOF shingling + array
    * intersect/union (the same rationale as [[minHashSignatureUdf]]).
    * Null text null-propagates like the HOF form. */
  def jaccardTextUdf(shingleN: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: String, b: String) => {
      if (a == null || b == null) null.asInstanceOf[java.lang.Double]
      else {
        val sa = shingleSetKernel(a, shingleN)
        val sb = shingleSetKernel(b, shingleN)
        var inter = 0
        val it = sa.iterator
        while (it.hasNext) if (sb.contains(it.next())) inter += 1
        val uni = sa.size + sb.size - inter
        java.lang.Double.valueOf(if (uni == 0) 0.0 else inter.toDouble / uni)
      }
    })

  /** UDF form of [[wordShingles]] over [[shingleSetKernel]] — the same
    * distinct word n-gram SET (explode/join/count consumers are order-
    * insensitive), one tight tokenize+shingle pass per doc instead of the
    * interpreted HOF chain (sequence → slice → concat_ws per position →
    * array_distinct), whose lambda evaluation dominates the shingling
    * stage of the decontamination family. Null text propagates null like
    * the Catalyst form. Set-parity spec in DedupSpec. */
  def wordShinglesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      if (text == null) null
      else {
        val s   = shingleSetKernel(text, n)
        val arr = new Array[String](s.size)
        val it  = s.iterator
        var i   = 0
        while (it.hasNext) { arr(i) = it.next(); i += 1 }
        arr
      }
    })

  /** Distinct word n-gram set, mirroring [[wordShingles]] exactly: tokens =
    * [[sparkTokens]] (Spark trim/split semantics, incl. kept empty tokens),
    * shingle start positions 0..max(len-n,0) (so short texts yield one
    * truncated shingle, like `greatest(..., 1)`). */
  private def shingleSetKernel(text: String, n: Int): java.util.HashSet[String] = {
    val toks = sparkTokens(text)
    val set  = new java.util.HashSet[String]()
    val last = math.max(0, toks.length - n)
    var j    = 0
    while (j <= last) {
      set.add(toks.slice(j, math.min(toks.length, j + n)).mkString(" "))
      j += 1
    }
    set
  }

  /** Exact n-gram Jaccard verification of candidate pairs: re-attach each
    * candidate doc's PRE-COMPUTED shingle set by id join (payload never
    * rides through the LSH shuffle) and intersect the sets in the JVM
    * kernel. Typical use: filter `minHashCandidatePairs` output to
    * confirmed near-duplicates. */
  def verifyPairsExactJaccard(
      pairs: DataFrame, // (id_a, id_b, …)
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3): DataFrame = {
    // Only docs that actually appear in a candidate pair are re-attached:
    // the semi-join filter runs BEFORE the shingle projection, so
    // non-candidate docs never feed the pair join. (At 100 TB this is the
    // difference between shipping the corpus twice and shipping only the
    // near-dup suspects.) Shingling happens ONCE PER DOC in that projection
    // — a per-pair text kernel would re-tokenize a hot document (boilerplate
    // appearing in k pairs) k times, exactly where near-dup corpora are
    // most expensive.
    val candidateIds = pairs.select(col("id_a").as("__cid"))
      .unionAll(pairs.select(col("id_b").as("__cid")))
      .distinct()
    val shingleArr = udf((t: String) => {
      if (t == null) null
      else {
        val s   = shingleSetKernel(t, shingleN)
        val out = new Array[String](s.size)
        s.toArray(out)
        out
      }
    })
    val texts = df
      .join(candidateIds, df(idCol) === col("__cid"), "left_semi")
      .select(col(idCol).as("id"), shingleArr(col(textCol)).as("sh"))
    pairs
      .join(texts.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardSetsUdf(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** Set-Jaccard over two pre-shingled arrays — value-identical to
    * [[jaccardTextUdf]] on the originating texts (same distinct sets, same
    * division; both-empty → 0.0; null propagates). */
  private val jaccardSetsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Seq[String], b: Seq[String]) => {
      if (a == null || b == null) null.asInstanceOf[java.lang.Double]
      else {
        val sa = new java.util.HashSet[String](a.size * 2)
        a.foreach(sa.add)
        var inter = 0
        b.foreach(s => if (sa.contains(s)) inter += 1)
        val uni = sa.size + b.size - inter
        // b is a set by construction (distinct shingles), so b.size is its
        // cardinality and the union arithmetic is exact
        java.lang.Double.valueOf(if (uni == 0) 0.0 else inter.toDouble / uni)
      }
    })

  /** Cross-document duplicated-substring detection — the ExactSubstr signal
    * of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), reduced from suffix-array joins to strided fixed-width
    * windows: a `width`-char window starting every `stride` chars is
    * "duplicated" when the IDENTICAL window text occurs in more than one
    * distinct document. Returns per-doc `(n_windows, n_dup)` — the dup
    * fraction is the usual removal/flagging criterion. Stride > 1 trades
    * recall of unaligned overlaps for a bounded window count (the paper's
    * suffix automaton finds all offsets; at 100 TB the strided variant is
    * what pipelines actually run first).
    *
    * Scale shape: the one shuffle carries (width-byte window, id) — never
    * the document; doc-frequency is map-side combined; the duplicated-
    * window set is small by construction (duplication is the anomaly), so
    * the flag-back join broadcasts under AQE. */
  def duplicateWindowStats(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 32,
      stride: Int = 16): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val wins = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= width)
      .select(col(idCol).as("id"),
        explode(transform(
          expr(s"sequence(0, (length(`$textCol`) - $width) div $stride)"),
          p => col(textCol).substr(p * stride + 1, lit(width)))).as("win"))
    val dup = wins.groupBy("win")
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") > 1)
      .select(col("win"), lit(1L).as("isdup"))
    wins.join(dup, Seq("win"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("isdup"), lit(0L))).as("n_dup"))
  }

  /** Positioned strided windows — the [[duplicateWindowStats]] extraction
    * with each window's char offset kept: (id, start, win). */
  private def positionedWindows(
      docs: DataFrame, textCol: String, idCol: String, width: Int, stride: Int): DataFrame =
    docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= width)
      .select(col(idCol).as("id"),
        explode(transform(
          expr(s"sequence(0, (length(`$textCol`) - $width) div $stride)"),
          p => struct((p * stride).cast("long").as("s"),
            col(textCol).substr(p * stride + 1, lit(width)).as("w")))).as("u"))
      .select(col("id"), col("u.s").as("start"), col("u.w").as("win"))

  /** Cross-document duplicate SPANS — [[duplicateWindowStats]] upgraded
    * from a per-doc count to the actual char intervals: every strided
    * window whose text occurs in >1 distinct document is a hit, and
    * overlapping/adjacent hit windows within a doc merge into maximal
    * half-open intervals [span_start, span_end) via the classic
    * gaps-and-islands pass (an island breaks where a hit starts past the
    * running max end of everything before it). This is the removal
    * geometry of ExactSubstr dedup (Lee et al. 2022) — what you cut, not
    * just how much.
    *
    * Scale shape: the one wide shuffle carries (width-char window, id) —
    * the fixed-width window string IS its own bounded fingerprint; the
    * document payload never moves. The islands pass windows over (id,
    * start, end) hit triples only, partitioned by doc — hits are the
    * anomaly, so that frame is small by construction. Within-doc repeats
    * are NOT flagged (df counts distinct docs): that signal is
    * [[duplicateWindowStats]]/repetition territory. */
  def duplicateSpans(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 32,
      stride: Int = 16): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val wins = positionedWindows(docs, textCol, idCol, width, stride)
    val dup = wins.groupBy("win")
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") > 1)
      .select("win")
    val hits = wins.join(dup, Seq("win"), "left_semi")
      .select(col("id"), col("start"), (col("start") + width).as("e"))
    val prev = Window.partitionBy("id").orderBy("start")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.partitionBy("id").orderBy("start")
      .rowsBetween(Window.unboundedPreceding, 0)
    hits
      .withColumn("brk",
        when(col("start") > coalesce(max("e").over(prev), lit(-1L)), 1L).otherwise(0L))
      .withColumn("g", sum("brk").over(cum))
      .groupBy(col("id"), col("g"))
      .agg(min("start").as("span_start"), max("e").as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"))
  }

  /** ExactSubstr REMOVAL: excise every [[duplicateSpans]] interval from
    * the text (all copies cut — the paper's default), emitting
    * (idCol, clean, n_removed) for every non-null-text doc; span-free docs
    * pass through with n_removed = 0. The excision is a per-row Catalyst
    * `aggregate` fold over the doc's sorted span list (keep the gap before
    * each span, then the tail) — no UDF, no second shuffle beyond
    * [[duplicateSpans]]' own: the span list rides a per-doc collect_list
    * (bounded: spans ≤ windows of ONE doc) joined back to the payload. */
  def removeDuplicateSpans(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 32,
      stride: Int = 16): DataFrame = {
    val spans = duplicateSpans(docs, textCol, idCol, width, stride)
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end")))).as("__spans"))
    val zero = struct(lit(0L).as("pos"), lit("").as("acc"))
    val excised = aggregate(col("__spans"), zero,
      (acc, iv) => struct(
        iv.getField("span_end").as("pos"),
        concat(acc.getField("acc"),
          col(textCol).substr((acc.getField("pos") + 1).cast("int"),
            (iv.getField("span_start") - acc.getField("pos")).cast("int"))).as("acc")),
      acc => concat(acc.getField("acc"),
        col(textCol).substr((acc.getField("pos") + 1).cast("int"),
          (length(col(textCol)) - acc.getField("pos")).cast("int"))))
    docs.where(col(textCol).isNotNull)
      .join(spans, Seq(idCol), "left_outer")
      .select(col(idCol), col(textCol).as("__orig"),
        when(col("__spans").isNull, col(textCol)).otherwise(excised).as("clean"))
      .select(col(idCol), col("clean"),
        (length(col("__orig")) - length(col("clean"))).cast("long").as("n_removed"))
  }
}

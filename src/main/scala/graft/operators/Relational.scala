package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators beyond plain built-ins (SURVEY.md §2d/§2e). */
object Relational {

  /** A4 dictionary-encode: attach a dense 0-based index = lexicographic rank
    * of the label (the reference's `sorted(labels)` + `enumerate` + UDF
    * lookup, `01. Ingest.py:76-88`).
    *
    * Scale design (100 TB): the reference collects the distinct labels to the
    * driver and closes a Python UDF over the dict — a driver round-trip plus
    * a per-row Python hop. Here the distinct aggregation reduces the table to
    * the label set, and the rank runs on that reduced set only. Two regimes,
    * picked by the measured dictionary cardinality (one count job over the
    * already-reduced set):
    *
    *  - label-cardinality dictionaries (≤ `maxDictSize`): THIS method —
    *    rank via a single-partition window over the tiny set, re-attach by
    *    broadcast hash join; the big side neither shuffles nor collects,
    *    and a fail-loud tripwire fires if the dictionary outgrows the
    *    contract.
    *  - vocab-sized dictionaries: [[withDictIndexLarge]] — a
    *    single-partition window would serialize on one task, so rank goes
    *    two-phase and the re-attach is a plain shuffle join.
    */
  def withDictIndex(df: DataFrame, labelCol: String, indexCol: String,
      maxDictSize: Long = 1000000): DataFrame = {
    val labels = df
      .select(labelCol)
      .where(col(labelCol).isNotNull) // null is not a label; see join below
      .distinct()
      // global rank on a label-cardinality frame: one of the engine's four
      // audited global windows, bounded by the tripwire right below (use
      // withDictIndexLarge past it); GraftSession quiets WindowExec's
      // blanket no-partition warning for exactly this audited set
      .withColumn(indexCol, (dense_rank().over(Window.orderBy(col(labelCol))) - 1).cast("long"))
      // Cardinality tripwire (same fail-loud discipline as mergeUpsert's
      // duplicate-key assertion): the single-partition rank and the
      // broadcast both assume a label-cardinality dictionary. A vocab-sized
      // one would silently serialize on one task and then blow the
      // broadcast — fail with directions instead. Costs nothing: the rank
      // already evaluated.
      .withColumn(indexCol,
        when(col(indexCol) < maxDictSize, col(indexCol))
          .otherwise(raise_error(lit(s"withDictIndex: dictionary exceeds $maxDictSize " +
            s"distinct labels — use withDictIndexLarge for vocab-sized dictionaries"))
            .cast("long")))
    // left-outer: rows with a null label keep their row (null index) rather
    // than silently vanishing through an inner join's null-key non-match
    df.join(broadcast(labels), Seq(labelCol), "left_outer")
  }

  /** [[withDictIndex]] for vocab-sized dictionaries (beyond broadcast /
    * single-task-rank range): TWO-PHASE rank — range-repartition the
    * distinct label set, rank within each partition in parallel, then add
    * per-partition offsets (a ≤`numParts`-row driver collect; the label
    * VALUES never reach the driver). The re-attach is a plain shuffle join:
    * a multi-GB dictionary must not broadcast. The distinct set is cached
    * for the range-partitioner's sampling pass and the ranked result is
    * localCheckpointed (dictionary-sized blocks, reclaimed on GC) so the
    * collected offsets can never disagree with a re-sampled partitioning. */
  def withDictIndexLarge(df: DataFrame, labelCol: String, indexCol: String,
      numParts: Int = 256): DataFrame = {
    val labels = df
      .select(labelCol)
      .where(col(labelCol).isNotNull)
      .distinct()
    val ranked = withGlobalRank(labels, indexCol, numParts, col(labelCol))
    df.join(ranked, Seq(labelCol), "left_outer")
  }

  /** TWO-PHASE global rank: attach `indexCol` = 0-based position of each row
    * under the total order `order` — without a single-partition window.
    * Range-repartition on the order keys, rank within each partition in
    * parallel, then add per-partition offsets (a ≤`numParts`-row driver
    * collect of COUNTS; row values never reach the driver). `order` must be
    * a total order over `df`'s rows (ties across rows would make ranks
    * nondeterministic between runs). The input is cached for the range
    * partitioner's sampling pass and the ranked result localCheckpointed so
    * the collected offsets can never disagree with a re-sampled
    * partitioning. The backbone of [[withDictIndexLarge]] and
    * `TextAnalysis.buildVocab`. */
  def withGlobalRank(df: DataFrame, indexCol: String, numParts: Int,
      order: Column*): DataFrame = {
    val in = df.persist() // one computation feeds both the sampling + shuffle passes
    val local = in
      .repartitionByRange(numParts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__li", (row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)) - 1).cast("long"))
      .localCheckpoint()
    in.unpersist(false) // the checkpoint cut the lineage
    val counts = local.groupBy("__pid").agg(count(lit(1)).as("c"))
      .orderBy("__pid").collect() // ≤ numParts rows — driver-safe
    // offset(pid) = rows in order-earlier partitions (range partition ids
    // ascend with the sort order, including for descending order columns)
    var acc = 0L
    val offsets = counts.map { r =>
      val o = r.getInt(0) -> acc; acc += r.getLong(1); o
    }.toMap
    if (offsets.isEmpty) local.drop("__pid", "__li").withColumn(indexCol, lit(0L).cast("long"))
    else local
      .withColumn(indexCol, col("__li") + element_at(typedLit(offsets), col("__pid")))
      .drop("__pid", "__li")
  }

  /** Top-k by explicit order. Plans as TakeOrderedAndProject: per-partition
    * heap of k rows, then a k-way driver merge — no global sort, no full
    * shuffle, O(k) driver memory. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** S8 mergeSchema emulation (`.option("mergeSchema", True)` on Delta
    * writes, `01. Ingest.py:180`): union two schema-evolved relations by
    * column name, null-filling columns missing on either side. */
  def unionEvolved(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** The overflow-safe deterministic id-hash bucket every sampling/split
    * operator keys rows by: `((id mod 1000003) * 2654435761) mod m`. ONE
    * definition — external oracles replay this expression bit-exactly, so
    * the five call sites must never drift (the prime pre-mod bounds the
    * product under 2^52; see [[hashSplitTag]]'s doc for the argument).
    *
    * COMPOSITION CAVEAT: every operator built on this shares ONE unsalted
    * bucket per id — composing two of them is degenerate (a 30% sample
    * keeps exactly the rows a later 80% split tags "train"). That is
    * deliberate (the oracle replays one formula), but pipelines that need
    * independent decisions must derive a fresh id per stage (e.g.
    * xxhash64(id, lit(stage)) first, as [[hashSplitTagAnyType]] does). */
  private def hashBucket(idCol: Column, m: Long): Column =
    pmod(pmod(idCol.cast("long"), lit(1000003L)) * lit(2654435761L), lit(m))

  /** Deterministic hash-based split: assigns each row to train/val by a
    * multiplicative hash of its NUMERIC id — reproducible across runs,
    * engines, and repartitionings (unlike `randomSplit`, whose sampling is
    * partition-seeded). The standard way to cut a training corpus so the
    * same document always lands in the same split.
    *
    * Hash: `((id mod 1000003) * 2654435761) mod 100` — the prime pre-mod
    * bounds the multiplicand below 2^20, so the product stays under 2^52
    * and can never overflow a long, for ANY long id, under ANSI mode
    * (a bare `id * 2654435761` overflows for ids above ~3.5e9). For ids
    * below 1000003 the result is identical to the bare Knuth hash. The
    * formula is plain integer arithmetic, so an external SQL engine can
    * reproduce the split exactly (see `q_hash_split`'s oracle).
    *
    * The id must be integral — callers with string ids should hash them to
    * a long first ([[hashSplitTagAnyType]] does exactly that); a string fed
    * directly here would coerce (ANSI: throw; legacy: silent double
    * arithmetic), so [[graft.operators.CorpusPipeline.prepare]] validates
    * the id type up front. */
  def hashSplitTag(idCol: Column, trainPct: Int): Column = {
    require(trainPct > 0 && trainPct < 100, s"trainPct must be in (0,100), got $trainPct")
    val bucket = hashBucket(idCol, 100L)
    when(bucket < trainPct, lit("train")).otherwise(lit("val"))
  }

  /** [[hashSplitTag]] for arbitrary id types (string UUIDs, composite keys
    * rendered to text, …): the id is first reduced to a long with xxhash64.
    * Deterministic across runs/partitionings within Spark, but xxhash64 is
    * engine-specific — use the numeric variant when an external oracle must
    * reproduce the split. */
  def hashSplitTagAnyType(idCol: Column, trainPct: Int): Column = {
    require(trainPct > 0 && trainPct < 100, s"trainPct must be in (0,100), got $trainPct")
    when(pmod(xxhash64(idCol), lit(100L)) < trainPct, lit("train")).otherwise(lit("val"))
  }

  /** Deterministic stratified sampling: keep a per-stratum percentage of
    * rows, selected by the same overflow-safe id-hash bucket as
    * [[hashSplitTag]] (NOT an RNG — `df.stat.sampleBy` draws per-row
    * Bernoulli from a seeded stream, which is engine-internal and
    * irreproducible outside Spark; the hash rule is plain integer
    * arithmetic any engine replays, see `q_stratified_sample`'s oracle).
    * Rebalancing a skewed corpus (downsample the dominant language, keep
    * the rare ones) is the canonical use.
    *
    * A stratum absent from `pctByStratum` keeps `defaultPct`% of its rows;
    * a null stratum value matches no map entry and falls to `defaultPct`.
    * Purely map-side: a filter over existing columns — no shuffle, pushdown
    * stays intact, and the same row set is kept at any partitioning. */
  def hashStratifiedSample(
      df: DataFrame,
      idCol: Column,
      stratumCol: Column,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 0): DataFrame = {
    require(pctByStratum.values.forall(p => p >= 0 && p <= 100) &&
      defaultPct >= 0 && defaultPct <= 100, "percentages must be in [0,100]")
    val bucket = hashBucket(idCol, 100L)
    // deterministic CASE order (sorted keys) so plans are stable run-to-run
    val pct = pctByStratum.toSeq.sortBy(_._1).foldRight(lit(defaultPct): Column) {
      case ((s, p), other) => when(stratumCol === s, lit(p)).otherwise(other)
    }
    df.where(bucket < pct)
  }

  /** Rebalance a corpus to a TARGET mixture: given relative weights per
    * stratum (domain/source/language), keep the LARGEST subset whose
    * expected stratum proportions equal the weights. Per-stratum keep rate
    * `r_s = c·w_s/N_s` with `c = min_s(N_s/w_s)` — the binding stratum (the
    * one scarcest relative to its target share) is kept whole and every
    * other stratum downsamples to match. Strata not in `weights` are
    * dropped. Row selection is the same overflow-safe id-hash bucket as
    * [[hashSplitTag]] (deterministic, engine-replayable — see
    * `q_mixture_sample`'s oracle), over 1e6 buckets for rate resolution.
    *
    * Scale shape (100 TB): pass 1 is a map-side-combined count per stratum
    * (output rows = #strata, tiny); the rate arithmetic happens IN THE PLAN
    * on that tiny frame (stratum counts never reach the driver), and pass 2
    * re-attaches rates by broadcast join + map-side filter. Nothing large
    * ever shuffles. The double arithmetic deriving `r_s` is ordered
    * identically in the oracle SQL, so the kept row set is bit-reproducible
    * across engines. */
  def mixtureSample(
      df: DataFrame,
      idCol: Column,
      stratumCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and strictly positive")
    val counts = df.where(stratumCol.isin(weights.keys.toSeq: _*))
      .groupBy(stratumCol.as("__stratum"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", weights.toSeq.sortBy(_._1).foldRight(lit(null).cast("double"): Column) {
        case ((s, w), other) => when(col("__stratum") === s, lit(w)).otherwise(other)
      })
    // c = min_s(N_s/w_s) attached by an unpartitioned window over the counts
    // frame — ≤|weights| rows, so the single-partition window is free, and
    // unlike an agg + crossJoin (two plan branches over the same aggregate)
    // the counts subtree — and the corpus scan under it — evaluates ONCE
    val rates = counts
      .withColumn("__c", min(col("__n") / col("__w")).over(Window.partitionBy()))
      .select(col("__stratum"), (col("__c") * col("__w") / col("__n")).as("__rate"))
    val bucket = hashBucket(idCol, 1000000L)
    df.join(broadcast(rates), stratumCol === col("__stratum"))
      .where(bucket.cast("double") < col("__rate") * lit(1000000.0))
      .drop("__stratum", "__rate")
  }

  /** Deterministic global shuffle — the "randomize training order" step of
    * a pretraining pipeline, without RNG state: sort by the overflow-safe
    * multiplicative hash of (id, salt). Same salt → same order across runs,
    * engines, partitionings (epoch reshuffles pass a different salt);
    * contrast `orderBy(rand(seed))`, whose draws are partition-seeded and
    * change with the input layout. The returned `shuffle_key` column makes
    * the order itself checkable (ties broken by id).
    *
    * Scale shape (100 TB): a sort is a range exchange — sampled boundaries,
    * balanced output partitions, no single-task bottleneck; hash values are
    * uniform by construction so the ranges carry equal weight. */
  def deterministicShuffle(df: DataFrame, idCol: Column, salt: Long): DataFrame = {
    require(salt >= 0 && salt < 1000003L, s"salt must be in [0, 1000003), got $salt")
    val key = pmod(pmod(pmod(idCol.cast("long"), lit(1000003L)) + lit(salt), lit(1000003L)) *
      lit(2654435761L), lit(1000000L))
    df.withColumn("shuffle_key", key).orderBy(col("shuffle_key"), idCol)
  }

  /** As-of join: attach to every left row the `valueCols` of the LATEST
    * right row with `right.tsCol <= left.tsCol` within the same key group
    * (inclusive tie: a right row at exactly the left timestamp matches).
    * Left rows with no earlier right row keep null values (left-outer
    * semantics) — the time-series point-in-time join (trades ⋈ quotes).
    *
    * Plan shape (100 TB): NOT a range join — an inequality join explodes
    * quadratically per key and Spark would plan a nested-loop. Instead both
    * sides union into one relation tagged by side and a single
    * `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side
    * ROWS UNBOUNDED PRECEDING)` carries each right value forward to the
    * left rows that follow it. Cost: ONE shuffle on the key columns and a
    * per-key sort — the same price as a regular sort-merge join, no
    * blow-up. Right rows sort before left rows at equal ts (side 0 < 1),
    * which is what makes the tie inclusive.
    *
    * Contract: the right side should be unique per (keys, ts) — pre-
    * aggregate it otherwise (ambiguous same-timestamp rows have no defined
    * winner); a null in a right `valueCol` is skipped by ignoreNulls (the
    * previous non-null value carries forward) rather than emitted. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val lt = left.schema(leftTsCol).dataType
    val rt = right.schema(rightTsCol).dataType
    require(lt == rt, s"asofJoin: timestamp types differ (left $lt vs right $rt) — cast one side first")
    val payload = left.columns.filterNot(keys.contains).toSeq // left keeps every non-key column
    val lU = left.select(
      keys.map(col) ++
        Seq(col(leftTsCol).as("__asof_ts"), lit(1).as("__asof_side")) ++
        payload.map(col) ++
        valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(s"$outPrefix$v")): _*)
    // 'right.ts <= left.ts' is never true for a null right timestamp — but
    // asc sort is NULLS FIRST, so an unfiltered null-ts row would sort as
    // "earlier than everything" and silently attach to matchless left rows
    val rU = right.where(col(rightTsCol).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTsCol).as("__asof_ts"), lit(0).as("__asof_side")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(v => col(v).as(s"$outPrefix$v")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(lU.unionByName(rU)) { (d, v) =>
      d.withColumn(s"$outPrefix$v", last(col(s"$outPrefix$v"), ignoreNulls = true).over(w))
    }
    carried.where(col("__asof_side") === 1).drop("__asof_ts", "__asof_side")
  }

  /** Skew-safe aggregation by salting: phase 1 aggregates on
    * (key, salt ∈ [0, saltBuckets)) so a hot key's rows spread over
    * `saltBuckets` reducers; phase 2 merges the partials per key. Use when
    * one key dominates (AQE skew handling covers joins; pre-AQE aggregation
    * skew needs this classic two-phase form). `aggs` must be algebraic
    * (sum/count/min/max) — supply both the partial and the merge form. */
  def saltedAggregate(
      df: DataFrame,
      keyCol: String,
      saltBuckets: Int,
      partialAggs: Seq[Column],
      mergeAggs: Seq[Column]): DataFrame =
    // monotonically_increasing_id already embeds the partition id in its
    // high bits; pmod of it alone round-robins rows across salt buckets
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keyCol)
      .agg(mergeAggs.head, mergeAggs.tail: _*)

  /** Skew-safe equi-join by salting — the join-side complement of
    * [[saltedAggregate]]: the (large, skewed) left side gets a deterministic
    * salt in [0, saltBuckets) and the (smaller) right side replicates once
    * per salt, joining on (key, salt) so one hot key's rows spread over
    * `saltBuckets` reducers instead of landing on one. Result set is
    * EXACTLY the plain inner join's (oracle-checked against it). AQE's
    * skew-join handles most cases at runtime by splitting oversized
    * partitions; the salted form is the explicit-plan fallback for when the
    * skew is known up front or AQE is off, and it composes with bucketed
    * layouts that AQE won't re-split. Replication cost: |right| ×
    * saltBuckets rows through the right shuffle — keep the dimension side
    * right. The salt hashes the left row's id-ish column (any column with
    * per-row variety), not RNG — replayable across retries. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      saltCol: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val salted = left.withColumn("__salt", pmod(xxhash64(saltCol), lit(saltBuckets)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<bigint>")))
    salted.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Deterministic negative sampling for implicit-feedback / contrastive
    * training: for every user appearing in `positives`, `k` items they did
    * NOT interact with, chosen by a replayable arithmetic hash instead of
    * RNG: `x = (user·2654435761 + item·(40503 + 2·salt) + salt) mod
    * (2³¹−1)`, then MID-SQUARE `h = x² mod (2³¹−1)` — exact long
    * arithmetic end to end (x < 2³¹ so x² < 2⁶², no overflow; ids must
    * stay < ~10⁹ and salts moderate), so ANY engine replays the choice
    * bit-exactly (same rationale as [[hashPrioritySample]]). The squaring
    * is load-bearing: the linear form alone is ORDER-PRESERVING over
    * dense id ranges (consecutive items step the hash by a constant —
    * the "sample" degenerates to the lowest item ids, and an additive
    * salt shifts every hash equally without re-rolling anything); x²
    * moves ~2x·step per item step and wraps many times, scrambling
    * consecutive ids. Salt enters the item MULTIPLIER (kept odd) so each
    * epoch's sample is a genuinely different permutation. Output
    * (userCol, itemCol, rk), rk 1..k by (hash asc, item asc).
    *
    * Plan shape: the item catalog broadcasts (recommender catalogs are
    * dim-table-sized; for a catalog beyond broadcast, hash-filter it to a
    * per-user candidate budget FIRST — rejection sampling — and keep this
    * plan), users×items fan out map-side, positives knock out true
    * interactions via left-anti, and the per-user top-k is one group-key
    * window. Nothing but (user, item, hash) triples ever shuffles. */
  def negativeSample(
      positives: DataFrame,
      userCol: String,
      itemCol: String,
      items: DataFrame,
      itemKeyCol: String,
      k: Int,
      salt: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pos = positives.select(col(userCol), col(itemCol)).distinct()
    // Parallelism floor (r18, guide §2.5/§2.6): the distinct user side is
    // small post-aggregation and AQE coalesces it to ~one partition — which
    // then generates and partially-aggregates the users × catalog candidate
    // space on ONE core. Spreading the users over the cores costs one tiny
    // shuffle of user ids and parallelizes the whole candidate pipeline.
    // The repartition is UNCONDITIONAL (ADVICE r18): a distinct output
    // with more than `target` partitions is reshuffled down to it —
    // harmless, since only 8-byte user ids move and results are
    // partitioning-invariant (spec-asserted).
    // (unconditional: the repartition moves 8-byte user ids — linear and
    // tiny against the users × catalog stage it balances; probing the
    // post-distinct partition count instead would force AQE to execute
    // the distinct eagerly just to answer it)
    val target = positives.sparkSession.sparkContext.defaultParallelism
    val users  = pos.select(col(userCol)).distinct().repartition(target)
    val cand = users
      .crossJoin(broadcast(items.select(col(itemKeyCol).cast("long").as(itemCol))))
    // broadcast the positive set: the generated candidate side is
    // users × catalog — shuffling IT on (user, item) to knock out the far
    // smaller positive set is backwards (measured: the anti-join shuffle
    // was the whole operator's wire cost). Positives of the SAMPLED users
    // are small by the same contract that lets the catalog broadcast; if
    // either outgrows memory, sample users in slices.
    val neg = cand.join(broadcast(pos), Seq(userCol, itemCol), "left_anti")
      .withColumn("__x", pmod(
        col(userCol).cast("long") * 2654435761L +
          col(itemCol) * (40503L + 2L * salt) + salt,
        lit(2147483647L)))
      .withColumn("__h", pmod(col("__x") * col("__x"), lit(2147483647L)))
      .drop("__x")
    // Bounded partial top-k, NOT a window: the candidate set is
    // users × catalog (the anti-join barely shrinks it), and a
    // row_number window would shuffle every candidate on the user key —
    // measured 33 MB at sf0.1, growing with catalog size. The aggregator
    // combines map-side to ≤ k pairs per (partition, user), so the wire
    // carries O(users · k) regardless of catalog size. Same rank order
    // (__h asc, item asc), value-identical to the window form.
    val topk = udaf(new MinKLongPairs(k))
    neg.groupBy(col(userCol))
      .agg(topk(col("__h"), col(itemCol)).as("__top"))
      .select(col(userCol), posexplode(col("__top")).as(Seq("__pos", "__hi")))
      .select(col(userCol), col("__hi._2").as(itemCol),
        (col("__pos") + 1).cast("long").as("rk"))
  }

  /** Bounded min-k of (hash, item) pairs ordered (hash asc, item asc) —
    * the partial-aggregation replacement for a per-group ranking window
    * (the Similarity.TopKNeighbors pattern on long pairs). */
  private class MinKLongPairs(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private def insert(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
      val pos = buf.indexWhere(e => e._1 > x._1 || (e._1 == x._1 && e._2 > x._2))
      val merged =
        if (pos < 0) buf :+ x
        else { val (a, b) = buf.splitAt(pos); (a :+ x) ++ b }
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: Seq[(Long, Long)] = Seq.empty
    override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = insert(b, a)
    override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
      b2.foldLeft(b1)(insert)
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Robust per-group outlier flagging via Median Absolute Deviation —
    * the heavy-tail-safe sibling of [[zscoreNormalize]]: mean/std both
    * move with the outliers they're meant to find, medians don't
    * (breakdown point 50% vs 0%). A row is flagged when
    * `|x - median(group)| > nMads · median(|x - median(group)|)` — the
    * classic Hampel rule. Adds (med, mad, outlier) to every non-null-group
    * row; outlier is null when the value is null (unknown, not clean).
    *
    * Determinism: both medians interpolate the even-count midpoint as
    * (a+b)/2 over exact doubles (the q_median cross-engine contract), the
    * deviations are exact IEEE subtractions, and the flag compares
    * `adev > nMads·mad` — one multiply, same result bit in any engine.
    *
    * Scale shape: two skinny (group, value) shuffles for the two medians
    * (EXACT median buffers a group's values — at 100 TB swap both
    * aggregations to `approx_percentile(…, 0.5)`, the columnStatsApprox
    * precedent; plan shape is unchanged), then two broadcast joins of the
    * per-group stat rows back to the payload — the payload never
    * shuffles. */
  def madOutliers(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      nMads: Double = 3.0): DataFrame = {
    require(nMads > 0, s"nMads must be > 0, got $nMads")
    // null-safe joins: a null group key forms its own stats group (the
    // zscoreNormalize discipline) — a plain === join would silently drop
    // every null-group row, breaking the row-preserving contract
    val med = df.groupBy(groupCol).agg(median(col(valueCol)).as("med"))
      .withColumnRenamed(groupCol, "__g1")
    val dev = df.join(broadcast(med), col(groupCol) <=> col("__g1"))
      .withColumn("__adev", abs(col(valueCol) - col("med")))
      .drop("__g1")
    val mad = dev.groupBy(groupCol).agg(median(col("__adev")).as("mad"))
      .withColumnRenamed(groupCol, "__g2")
    dev.join(broadcast(mad), col(groupCol) <=> col("__g2"))
      .withColumn("outlier", (col("__adev") > lit(nMads) * col("mad")).cast("long"))
      .drop("__adev", "__g2")
  }

  /** Equi-bucketed interval join — the SCALE form of a range join. The
    * broadcast-nested-loop plan Spark picks for `fact JOIN dim ON v >= lo
    * AND v < hi` evaluates |fact|·|dim| predicate pairs; right for a
    * handful of bands (q_range_join), wrong past ~1e3 intervals. This
    * rewrite makes it an EQUI-join: each interval is exploded to the
    * fixed-width bins it covers, each fact row maps to exactly ONE bin
    * (`floor(v / binWidth)`), and the residual range predicate filters the
    * bin-collision candidates. Result is exactly the inequality join's —
    * each (fact, interval) pair can only meet through the fact value's
    * single bin, so no dedup is needed.
    *
    * Cost model (100 TB): shuffle |fact| + |dim| · (width/binWidth + 1)
    * skinny rows through one hash join instead of |fact| · |dim| predicate
    * evaluations through a nested loop; pick `binWidth` near the median
    * interval width so the dim replication factor stays ~2. Intervals are
    * half-open [lo, hi); degenerate (null / lo >= hi) intervals drop. The
    * upper bin is `floor(hi / binWidth)` even when `hi` lands exactly on a
    * bin edge — at most one empty-bin replica per interval, filtered by
    * the residual, in exchange for no float edge-case arithmetic.
    *
    * `maxBinsPerInterval` is a loud guard, not a tuning knob: ONE interval
    * spanning millions of bins (a mis-set binWidth, or an outlier
    * [0, 10⁹) catch-all band) would explode into that many replicas inside
    * a single task — the failure is an executor OOM with no actionable
    * message. The guard raises per-row with the offending interval
    * instead; widen binWidth (or split the outlier band) and rerun. */
  def binnedRangeJoin(
      fact: DataFrame,
      valueCol: String,
      dim: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      maxBinsPerInterval: Int = 65536): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    val factB = fact.where(col(valueCol).isNotNull)
      .withColumn("__bin", floor(col(valueCol).cast("double") / binWidth).cast("long"))
    val loBin = floor(col(loCol).cast("double") / binWidth).cast("long")
    val hiBin = floor(col(hiCol).cast("double") / binWidth).cast("long")
    val dimB = dim
      .where(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) < col(hiCol))
      .withColumn("__binspan",
        when(hiBin - loBin < maxBinsPerInterval, hiBin - loBin)
          .otherwise(raise_error(concat(
            lit(s"binnedRangeJoin: interval ["), col(loCol), lit(", "), col(hiCol),
            lit(s") spans more than $maxBinsPerInterval bins at binWidth=$binWidth — " +
              "widen binWidth or split the outlier band")))))
      .withColumn("__bin", explode(sequence(loBin, loBin + col("__binspan"))))
      .drop("__binspan")
    factB.join(dimB, Seq("__bin"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** L3: seeded random split (reference train/val split, `02.a …:79`).
    * Direct built-in; engine-specific sampling, so never oracle-checked
    * (SURVEY.md §5 hazard 3) — self-tested for disjointness + completeness. */
  def seededSplit(df: DataFrame, weights: Array[Double], seed: Long): Array[DataFrame] =
    df.randomSplit(weights, seed)

  /** Per-group quota cap: keep at most `n` rows per `groupCol`, chosen by
    * `order` (which MUST be a total order within a group — tie-break on a
    * unique id — or the kept set is engine-dependent). The corpus shape:
    * cap documents per source domain so one crawl host can't dominate the
    * training mix (C4/CommonCrawl-style per-domain caps).
    *
    * Scale shape (100 TB): one shuffle on the group key, then a per-group
    * streaming rank — no global sort. `row_number` early-outs nothing by
    * itself, but the window's rank filter is applied before any downstream
    * join, so at most `n·|groups|` rows survive the stage. Domain skew (one
    * giant host) serializes that host's partition; mitigate upstream with a
    * pre-filter or salt+re-rank when a single group exceeds executor memory. */
  def groupQuota(df: DataFrame, groupCol: String, n: Int, order: Column*): DataFrame = {
    require(n >= 1, s"quota must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rk",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(order: _*)).cast("long"))
      .where(col("rk") <= n)
  }

  /** Deterministic per-group uniform sample: keep `n` rows per group
    * chosen by md5-of-id priority — hash order is uniform over ids but
    * REPRODUCIBLE across runs, engines, and partitionings (the property
    * plain `rand()` sampling can't give a data pipeline that must be
    * replayable). md5 rather than the engine-native 64-bit hashes because
    * its hex form is identical everywhere (xxhash64 seeds differ by
    * engine). Same plan shape as [[groupQuota]]: one group-key shuffle,
    * per-group streaming rank, no global sort. */
  def hashPrioritySample(df: DataFrame, groupCol: String, n: Int, idCol: String): DataFrame =
    groupQuota(df, groupCol, n, md5(col(idCol).cast("string")), col(idCol))

  /** Per-group HLL distinct-count SKETCHES (Apache DataSketches HllSketch,
    * built into Spark 4) — the persistable form of approx_count_distinct.
    * The sketch column is a mergeable partial aggregate: persist per
    * batch/day/source, then [[unionSketchEstimate]] combines ANY grouping
    * of them later without re-reading the data — incremental corpus
    * statistics (distinct users/tokens/urls so far) at a few KB per group
    * instead of a corpus re-scan. lgK 12 ≈ ±1.6% standard error. */
  def distinctSketches(
      df: DataFrame, groupCols: Seq[String], valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge persisted sketches to a coarser grouping and estimate: the
    * union is exact over sketch state (no re-count error beyond the
    * sketches' own), so sketch-of-whole ≡ union-of-parts — spec-verified. */
  def unionSketchEstimate(
      sketches: DataFrame, groupCols: Seq[String], sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("approx_distinct"))

  /** Winsorize: clamp `valueCol` to its [pLo, pHi] percentile band — the
    * outlier-taming variant of the quantile band FILTER (q_quantile_filter
    * drops the tails; winsorizing keeps the rows and caps the values, the
    * usual choice when a training pipeline can't afford to lose documents).
    * Bounds are computed IN THE PLAN (1-row aggregate, broadcast cross
    * join — no driver collect) and rounded to 6 decimals so an external
    * engine's `quantile_cont` agrees bit-wise. Adds `<valueCol>_w`.
    *
    * Scale note: exact `percentile` is a sort-based aggregate; at 100 TB
    * swap the bounds aggregate for `percentile_approx` (same plan shape —
    * only the 1-row aggregate changes, and the clamp is map-side either
    * way). */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val v = col(valueCol).cast("double")
    val bounds = df.agg(
      round(percentile(v, lit(pLo)), 6).as("__lo"),
      round(percentile(v, lit(pHi)), 6).as("__hi"))
    df.crossJoin(bounds)
      // null propagates: Spark's greatest/least SKIP nulls, so the bare
      // clamp would hand every null row the pLo bound — fabricated data
      // in a training pipeline where null must stay null
      .withColumn(s"${valueCol}_w",
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Temperature-scaled mixture sampling (the mT5/XLM-R corpus-balancing
    * rule, Xue et al. 2021 §3.1): resample strata toward weights
    * `w_s ∝ N_s^α` with α = 0.5, damping the head languages/domains
    * without flattening to uniform. Built on [[mixtureSample]]'s machinery,
    * but the weights are DERIVED IN THE PLAN from the observed counts —
    * keep rate `r_s = min_t(√N_t) · √N_s / N_s`, so the binding (smallest)
    * stratum is kept whole and every other stratum is thinned toward the
    * α = 0.5 curve.
    *
    * α is FIXED at 0.5 by design: `sqrt` is correctly rounded in IEEE 754
    * (both engines produce the identical double), while a general `pow(n,
    * α)` is not guaranteed bit-identical across libm implementations — and
    * because the constant is `min_t(√N_t)` rather than a normalizing SUM,
    * no floating-point summation (whose order differs across engines) ever
    * occurs: every rate is a product/quotient of exactly-rounded terms.
    * Row choice is the overflow-safe id-hash bucket of [[hashSplitTag]] —
    * deterministic across runs, engines, partitionings.
    *
    * Scale shape (100 TB): identical to [[mixtureSample]] — one tiny
    * count-per-stratum aggregate (map-side combined), rate arithmetic on
    * that frame, broadcast re-attach, map-side filter. Nothing large
    * shuffles. */
  def temperatureSample(df: DataFrame, idCol: Column, stratumCol: Column): DataFrame = {
    val counts = df.where(stratumCol.isNotNull)
      .groupBy(stratumCol.as("__stratum"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val rates = counts
      .withColumn("__c", min(sqrt(col("__n"))).over(Window.partitionBy()))
      .select(col("__stratum"), (col("__c") * sqrt(col("__n")) / col("__n")).as("__rate"))
    val bucket = hashBucket(idCol, 1000000L)
    df.join(broadcast(rates), stratumCol === col("__stratum"))
      .where(bucket.cast("double") < col("__rate") * lit(1000000.0))
      .drop("__stratum", "__rate")
  }

  /** Data-quality expectations (the Delta Live Tables / Great Expectations
    * shape): evaluate named rule predicates per row and attach
    * `violations` — the comma-joined names of FAILED rules in declaration
    * order ('' when all pass) — plus `is_valid` (1/0). A rule evaluating
    * to NULL counts as a violation: ANSI three-valued logic must not let a
    * null slip through as "valid" (the same reason SQL CHECK constraints
    * accept NULL is exactly what a data-quality gate must NOT do).
    * Callers split valid rows from the quarantine with one map-side
    * filter on `is_valid`; keeping both in one pass means the source is
    * scanned ONCE, not once per destination.
    *
    * Scale shape (100 TB): purely map-side — no shuffle, no driver
    * round-trip; predicates stay inside whole-stage codegen. */
  def validateRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size, s"duplicate rule names in $names")
    val viol = concat_ws(",", rules.map { case (n, p) =>
      when(coalesce(p, lit(false)), lit(null).cast("string")).otherwise(lit(n))
    }: _*)
    df.withColumn("violations", viol)
      .withColumn("is_valid", (col("violations") === "").cast("long"))
  }

  /** SCD Type-2 merge — the warehouse dimension-versioning pattern: apply
    * an update batch to a dimension that carries `(validFrom, validTo,
    * currentCol)` validity metadata. Per key:
    *  - current row matched with a change in any `trackedCols` → the old
    *    version CLOSES (`validTo` = effectiveDate, current = false) and a
    *    new version OPENS from the update row;
    *  - matched with no tracked change → untouched (no spurious version);
    *  - update key absent from the dimension → a brand-new open version;
    *  - historical (non-current) rows pass through untouched.
    * Change detection is null-safe (`<=>`): null → value and value → null
    * both count as changes. `updates` must carry exactly the business
    * columns (dimension schema minus the three SCD columns).
    *
    * Scale shape (100 TB): the dimension never shuffles — the only join
    * against it is on the key with the (small, by contract) update batch
    * on the other side, and the derived changed-key set is explicitly
    * broadcast for the semi/anti splits; the same LeftOuter+LeftAnti
    * discipline as `TableManager.mergeUpsert` (never FullOuter, which
    * cannot broadcast). */
  def scd2Merge(
      dim: DataFrame,
      updates: DataFrame,
      keyCol: String,
      trackedCols: Seq[String],
      effectiveDate: Column,
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      currentCol: String = "is_current"): DataFrame = {
    val scdCols = Seq(validFrom, validTo, currentCol)
    val bizCols = dim.columns.toSeq.filterNot(scdCols.contains)
    require(updates.columns.toSeq.sorted == bizCols.sorted,
      s"updates must carry exactly the business columns $bizCols, got ${updates.columns.toSeq}")
    require(trackedCols.forall(bizCols.contains), s"trackedCols must be business columns")
    val outCols = (bizCols ++ scdCols).map(col)

    // a null currentCol row would pass NEITHER filter (both where clauses
    // reject null) and silently vanish from the dimension on every merge —
    // refuse in-plan instead (raise_error evaluates per row, no extra job)
    val curGuard = when(col(currentCol).isNull,
      raise_error(concat(lit(s"scd2Merge: null `$currentCol` for key "),
        col(keyCol).cast("string"),
        lit(" — a row neither current nor historical would be dropped"))))
      .otherwise(col(currentCol))
    val cur  = dim.where(curGuard)
    val hist = dim.where(!curGuard).select(outCols: _*)
    val d = cur.alias("d")
    val u = updates.alias("u")

    val changed = trackedCols
      .map(c => !(col(s"d.$c") <=> col(s"u.$c")))
      .reduce(_ || _)
    // bounded by the update batch — broadcastable by contract
    val changedKeys = d.join(u, col(s"d.$keyCol") === col(s"u.$keyCol"))
      .where(changed)
      .select(col(s"u.$keyCol").as("__ck"))

    val kept = cur.join(broadcast(changedKeys), col(keyCol) === col("__ck"), "left_anti")
      .select(outCols: _*)
    val closed = cur.join(broadcast(changedKeys), col(keyCol) === col("__ck"), "left_semi")
      .withColumn(validTo, effectiveDate.cast("date"))
      .withColumn(currentCol, lit(false))
      .select(outCols: _*)
    val openedChanged = updates.join(broadcast(changedKeys), col(keyCol) === col("__ck"), "left_semi")
    val openedNew = updates.join(cur.select(col(keyCol)), Seq(keyCol), "left_anti")
    val opened = openedChanged.unionByName(openedNew)
      .withColumn(validFrom, effectiveDate.cast("date"))
      .withColumn(validTo, lit(null).cast("date"))
      .withColumn(currentCol, lit(true))
      .select(outCols: _*)

    hist.unionByName(kept).unionByName(closed).unionByName(opened)
  }

  /** Snapshot diff — the batch CDC primitive for incremental pipelines:
    * compare two versions of a keyed table and emit one row per CHANGED
    * key with `op` ∈ insert (key only in `newDf`), delete (only in
    * `oldDf`), update (in both, any `compareCols` differs null-safely).
    * Unchanged keys are omitted — the output is the minimal change set a
    * downstream incremental job replays.
    *
    * Scale shape (100 TB): ONE full-outer sort-merge join on the key —
    * unavoidable for a symmetric diff (either side may hold keys the
    * other lacks; contrast scd2Merge, whose update side is small by
    * contract) — carrying key + compared columns only; callers should
    * project payload columns away first. With both snapshots bucketed by
    * key (TableManager.writeBucketed) the exchange disappears entirely. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    // PRESENCE FLAGS, not key.isNull: a row whose key VALUE is null would
    // read as "absent" on its own side (an old-side null-key row was
    // misreported as an insert); the null-safe join keeps null keys
    // matchable and the flags make match-ness explicit
    val o = oldDf.select((keyCol +: compareCols).map(col): _*)
      .withColumn("__o_present", lit(true)).alias("o")
    val n = newDf.select((keyCol +: compareCols).map(col): _*)
      .withColumn("__n_present", lit(true)).alias("n")
    val changed = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    o.join(n, col(s"o.$keyCol") <=> col(s"n.$keyCol"), "full_outer")
      .withColumn("op",
        when(col("__o_present").isNull, "insert")
          .when(col("__n_present").isNull, "delete")
          .when(changed, "update"))
      .where(col("op").isNotNull)
      .select(coalesce(col(s"n.$keyCol"), col(s"o.$keyCol")).as(keyCol), col("op"))
  }

  /** Group-wise z-score standardization — the per-stratum feature scaling
    * step of an ML-prep pipeline ((v − μ_g)/σ_g with the sample std):
    * group moments come from ORDER-INDEPENDENT exact decimal power sums
    * (the q_stats_agg discipline — a float `avg`/`stddev` is not
    * reproducible across partitionings), convert to double once, and the
    * z expression applies map-side after a broadcast join of the tiny
    * per-group stats frame. Rounded to 6 decimals for cross-engine
    * agreement. Integer-valued (or low-scale) columns keep the power sums
    * exact in DECIMAL(38,4); single-member groups (σ undefined) yield
    * null. Adds `<valueCol>_z`. */
  def zscoreNormalize(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val dec = "decimal(38,4)"
    val v   = col(valueCol)
    val stats = df.groupBy(col(groupCol).as("__g")).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(v.cast(dec)).cast(dec).cast("double").as("__sx"),
      sum((v * v).cast(dec)).cast(dec).cast("double").as("__sxx"))
    val n  = col("__n")
    val sx = col("__sx")
    val sxx = col("__sxx")
    // CaseWhen evaluates only the matched branch, so the divisions are
    // guarded against ANSI DIVIDE_BY_ZERO: n = 1 (σ undefined) and
    // zero-variance groups both yield null
    val variance = (sxx - sx * sx / n) / (n - lit(1.0))
    // Null-safe join keeps rows with a NULL group key (their stats group is
    // the null group; a plain === join would silently drop them, breaking
    // the row-preserving contract)
    df.join(broadcast(stats), col(groupCol) <=> col("__g"))
      .withColumn(s"${valueCol}_z",
        when(n > lit(1.0),
          when(variance > lit(0.0),
            round((v.cast("double") - sx / n) / sqrt(variance), 6))))
      .drop("__g", "__n", "__sx", "__sxx")
  }

  /** Apply a CDC change set to a keyed snapshot — the DLT "APPLY CHANGES
    * INTO" batch primitive, inverse of [[snapshotDiff]]: `changes` carries
    * the key, an `op` column (insert | update | delete), and the full new
    * row values for insert/update. Delete keys drop, update keys replace,
    * insert keys append. `applyChangeSet(old, snapshotDiff-with-values)`
    * reproduces the new snapshot exactly — the round-trip law the oracle
    * checks.
    *
    * Scale shape (100 TB): the change set is small by contract, so both
    * the removal anti-join and the replacement union broadcast; the
    * target never shuffles (the mergeUpsert discipline). */
  def applyChangeSet(
      target: DataFrame,
      changes: DataFrame,
      keyCol: String,
      opCol: String = "op"): DataFrame = {
    val valCols = target.columns.toSeq
    require(changes.columns.contains(opCol), s"changes must carry `$opCol`")
    require(valCols.filterNot(_ == keyCol).forall(changes.columns.contains),
      "changes must carry every target column for insert/update rows")
    // an UNRECOGNIZED op string ("UPDATE", "upsert", a typo) would join
    // its key into the removal set but never re-apply the row — a silent
    // delete; refuse in-plan (raise_error evaluates per row, no extra job)
    val opChecked = changes.withColumn(opCol,
      when(col(opCol).isin("insert", "update", "delete"), col(opCol))
        .otherwise(raise_error(concat(
          lit("applyChangeSet: unrecognized op `"), col(opCol),
          lit("` (expected insert | update | delete, case-sensitive)")))))
    val touched = opChecked.select(col(keyCol).as("__k")).distinct()
    val kept = target.join(broadcast(touched), col(keyCol) === col("__k"), "left_anti")
    val applied = opChecked.where(col(opCol).isin("insert", "update"))
      .select(valCols.map(col): _*)
    kept.unionByName(applied)
  }

  /** ANALYZE-style column statistics in ONE scan: per listed column the
    * non-null count, null count, exact distinct count, and numeric
    * min/max (null for non-numeric columns — the double cast yields null
    * there). Exact distincts expand the aggregate per column (the
    * Expand-operator plan Spark builds for multi-distinct); at 100 TB
    * swap `countDistinct` for `approx_count_distinct` — same one-scan
    * shape, sketch-sized state. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // try_cast: under ANSI mode a plain string→double cast THROWS on
    // non-numeric values; try_cast yields null (≡ DuckDB TRY_CAST)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__${c}__cnt"),
      countDistinct(col(c)).as(s"__${c}__nd"),
      min(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"__${c}__min"),
      max(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"__${c}__max")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stats = cols.map(c => struct(
      lit(c).as("column"),
      col(s"__${c}__cnt").as("n_notnull"),
      (col("__n") - col(s"__${c}__cnt")).as("n_null"),
      col(s"__${c}__nd").as("n_distinct"),
      col(s"__${c}__min").as("min_d"),
      col(s"__${c}__max").as("max_d")))
    one.select(explode(array(stats: _*)).as("s")).select(col("s.*"))
  }

  /** [[columnStats]] with the 100 TB distinct-count plan the exact form's
    * doc promises: `approx_count_distinct` (HLL++, default rsd 5%) instead
    * of `countDistinct`. Same one-scan shape and output schema, but the
    * multi-distinct Expand operator disappears — the scan stream is no
    * longer replicated once per profiled column, and per-column state is a
    * fixed-size sketch instead of a distinct-values hash set. This is the
    * variant to run on a wide 100 TB table; the exact form remains for
    * when distinct counts feed correctness decisions. Tolerance-vs-exact
    * spec in RelationalSpec. */
  def columnStatsApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__${c}__cnt"),
      approx_count_distinct(col(c), rsd).as(s"__${c}__nd"),
      min(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"__${c}__min"),
      max(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"__${c}__max")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stats = cols.map(c => struct(
      lit(c).as("column"),
      col(s"__${c}__cnt").as("n_notnull"),
      (col("__n") - col(s"__${c}__cnt")).as("n_null"),
      col(s"__${c}__nd").as("n_distinct"),
      col(s"__${c}__min").as("min_d"),
      col(s"__${c}__max").as("max_d")))
    one.select(explode(array(stats: _*)).as("s")).select(col("s.*"))
  }

  /** Equi-depth histogram WITHOUT a global window: bucket boundaries come
    * from one exact-percentile aggregate (interior cut points, rounded to 6
    * decimals for cross-engine agreement), then every row buckets map-side
    * by counting boundaries ≤ its value — no `ntile` over a single
    * partition, which is the usual (and scale-fatal) way to write this.
    * Rows equal to a rounded cut point land in the upper bucket on both
    * engines (same `<=` rule), so bucket populations are reproducible.
    * Returns (bucket 1..buckets, n, lo, hi) — min/max are exact doubles,
    * no float summation anywhere. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val v = col(valueCol).cast("double")
    val cuts = (1 until buckets).map(_.toDouble / buckets)
    val bounds = df.agg(
      transform(percentile(v, typedLit(cuts)), c => round(c, 6)).as("__cuts"))
    // nulls are EXCLUDED, matching the percentile aggregate that computed
    // the cuts over non-null values only — without the filter every null
    // row landed in bucket 1 (the filter lambda drops all cuts for null),
    // silently skewing the histogram
    df.where(v.isNotNull).crossJoin(bounds)
      .withColumn("bucket", (size(filter(col("__cuts"), b => b <= v)) + 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"))
  }
}

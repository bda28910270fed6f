package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composed pipeline a user of
  * this engine runs over raw documents, assembled from the operator modules:
  *
  * {{{
  *  quality filter (TextAnalysis.qualityScore ≥ threshold)
  *    → language filter (TextAnalysis.langId ∈ allowed)
  *    → exact dedup (Dedup.dropExactDuplicates)
  *    → near dedup (Dedup.dropNearDuplicates, MinHash+LSH)
  *    → chunking (TextAnalysis.chunks, stride+overlap, posexplode)
  *    → deterministic split (Relational.hashSplitTag)
  * }}}
  *
  * Every stage is map-side or id-keyed (the dedup stages shuffle only
  * hashes/signatures/ids — SURVEY.md §7 100 TB rule), so the pipeline's
  * shuffle volume is bounded by key widths, not document payloads. Stage
  * order matters at scale: filters first (cheapest, map-side, shrink
  * everything downstream), exact dedup before near dedup (hash group-by is
  * far cheaper than LSH), chunking last (it multiplies rows).
  */
object CorpusPipeline {

  case class Config(
      minQuality: Double = 0.3,
      languages: Seq[String] = Seq("en"),
      nearDedup: Boolean = true,
      nearDedupJaccard: Double = 0.8,
      nearDedupShingleN: Int = 3,
      chunkSize: Int = 2048,
      chunkStride: Int = 1792,
      trainPct: Int = 90)

  /** Run the full preparation over (idCol, textCol) documents. Output:
    * one row per chunk — (id, chunk_idx, chunk, quality, lang, split). */
  def prepare(docs: DataFrame, textCol: String, idCol: String, cfg: Config = Config()): DataFrame = {
    // the split stage hashes the id arithmetically — a string id would
    // coerce (ANSI: runtime throw; legacy: silent double math), so fail
    // fast with an actionable message instead (ADVICE r01)
    val idType = docs.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"CorpusPipeline.prepare: id column '$idCol' must be numeric for the deterministic " +
        s"hash split (got ${idType.simpleString}); pre-hash string ids to a long " +
        "(e.g. xxhash64) or use Relational.hashSplitTagAnyType")
    val text: Column = col(textCol)
    // fused JVM kernel: one tokenization + one char scan per doc instead of
    // the six interpreted HOF/regex passes of the composable Catalyst forms
    // (bit-identical — parity asserted in TextAnalysisSpec); at 100 TB the
    // per-document scoring pass is the dominant map-side CPU of corpus prep.
    // asNondeterministic is an optimizer fence, not a semantic claim: a
    // deterministic UDF gets substituted into the pushed-down filter's two
    // struct-field branches and re-evaluated 2-3x per row — the fence keeps
    // the kernel at exactly ONE invocation per document (CorpusPipelineSpec
    // asserts the invocation count)
    require(cfg.languages.nonEmpty,
      "CorpusPipeline: languages must be non-empty — an empty isin() is " +
        "constant-false and would silently emit an EMPTY corpus (list the " +
        "languages to keep; there is no 'no filter' spelling)")
    val scored = docs
      .withColumn("__ql", TextAnalysis.qualityLangUdf.asNondeterministic()(text))
      .withColumn("quality", col("__ql.quality"))
      .withColumn("lang", col("__ql.lang"))
      .drop("__ql")
      .where(col("quality") >= cfg.minQuality && col("lang").isin(cfg.languages: _*))
    // Materialize the filtered + exact-deduped corpus ONCE (projected to the
    // columns the rest of the pipeline needs). The near-dedup stage references
    // its input several times (signature scan, two exact-Jaccard re-attach
    // sides, final anti-join) — without this cut, each reference re-runs the
    // quality/langId regex scoring and the exact-dedup join over the full
    // corpus (~5× recompute; measured 21s → 12s on the sf0.1 bench). The
    // checkpoint is the standard stage-boundary tradeoff at 100 TB too:
    // one materialization of the filtered corpus versus five regex passes.
    //
    // The exact-dedup keep-set is computed from the RAW docs (sha-only
    // projection) rather than from `scored`, so the quality/langId regex
    // scoring runs exactly once (on the `scored` side of the join below)
    // instead of twice. Equivalent result: exact duplicates share the text,
    // hence the same quality/lang — a duplicate group passes the filter all
    // together or not at all, and its min-id representative is the same
    // computed before or after filtering.
    val keepIds = Dedup.exactGroups(docs, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val exact = scored.join(keepIds, Seq(idCol))
      .select(col(idCol), text, col("quality"), col("lang"))
      .localCheckpoint()
    val deduped =
      if (cfg.nearDedup)
        Dedup.dropNearDuplicates(exact, textCol, idCol,
          shingleN = cfg.nearDedupShingleN, minJaccard = cfg.nearDedupJaccard)
      else exact
    deduped
      .select(col(idCol), col("quality"), col("lang"),
        posexplode(TextAnalysis.chunks(text, cfg.chunkSize, cfg.chunkStride)))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"), col("col").as("chunk"),
        col("quality"), col("lang"),
        Relational.hashSplitTag(col(idCol), cfg.trainPct).as("split"))
  }

  /** Per-document dropout provenance for the SAME pipeline as [[prepare]] —
    * the observability counterpart every production corpus run needs
    * ("why did my document disappear?", "what did each stage cost us?").
    * One row per non-null-text input doc:
    *
    *  - `passed_filter` — cleared the quality + language gate,
    *  - `is_rep`        — is its exact-duplicate group's min-id representative
    *                      (computed over ALL docs, the [[prepare]] rule),
    *  - `kept`          — survived near-dedup among the filtered reps
    *                      (the docs that reach [[prepare]]'s output),
    *  - `n_chunks`      — chunks it contributes (0 unless kept).
    *
    * Stage-level funnel counts are one `sum()` aggregation over this frame.
    * Same plan discipline as [[prepare]] (score once behind the optimizer
    * fence, sha/signature/id-only shuffles); the extra cost over a bare run
    * is just the flag joins. Fully oracle-replayable — every flag derives
    * from deterministic set membership. */
  def audit(docs: DataFrame, textCol: String, idCol: String, cfg: Config = Config()): DataFrame = {
    val idType = docs.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"CorpusPipeline.audit: id column '$idCol' must be numeric (got ${idType.simpleString})")
    val text = col(textCol)
    require(cfg.languages.nonEmpty,
      "CorpusPipeline: languages must be non-empty — an empty isin() is " +
        "constant-false and would silently audit an EMPTY corpus")
    val scored = docs.where(text.isNotNull)
      .withColumn("__ql", TextAnalysis.qualityLangUdf.asNondeterministic()(text))
      .select(col(idCol), text, col("__ql.quality").as("quality"), col("__ql.lang").as("lang"))
      .localCheckpoint() // consumed by the flag joins AND the survivors leg
    val passed = col("quality") >= cfg.minQuality && col("lang").isin(cfg.languages: _*)
    val reps = Dedup.exactGroups(docs, textCol, idCol)
      .select(col("keep_id").as("__rep_id"), lit(1L).as("__is_rep"))
      // skinny (id, flag) pairs consumed by the survivors leg AND the final
      // flag join — uncheckpointed, the sha scan over raw docs re-ran per
      // consumer (the exact recompute prepare's checkpoint comment fences)
      .localCheckpoint()
    val s = scored.where(passed)
      .join(reps.select(col("__rep_id").as(idCol)), Seq(idCol))
      .select(col(idCol), text, col("quality"), col("lang"))
      // the near-dedup stage references its input ~5 times (signature
      // scan, two re-attach sides, anti join) — cut the lineage once
      .localCheckpoint()
    val survivors =
      (if (cfg.nearDedup)
        Dedup.dropNearDuplicates(s, textCol, idCol,
          shingleN = cfg.nearDedupShingleN, minJaccard = cfg.nearDedupJaccard)
      else s)
        .select(col(idCol), lit(1L).as("__kept"))
    scored
      .join(reps, col(idCol) === col("__rep_id"), "left_outer")
      .join(survivors, Seq(idCol), "left_outer")
      .select(col(idCol), round(col("quality"), 6).as("quality"), col("lang"),
        passed.cast("long").as("passed_filter"),
        coalesce(col("__is_rep"), lit(0L)).as("is_rep"),
        coalesce(col("__kept"), lit(0L)).as("kept"),
        when(col("__kept") === 1L,
          size(TextAnalysis.chunks(text, cfg.chunkSize, cfg.chunkStride)).cast("long"))
          .otherwise(lit(0L)).as("n_chunks"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) — sublinear-memory
  * frequency estimation with one-sided error: an estimate is NEVER below
  * the true count, and exceeds it by more than ε·N with probability at
  * most δ (ε = e/width, δ = e^-depth). The one-sidedness is the whole
  * point for pruning: a "find keys with count ≥ T" query answered through
  * the sketch can have false POSITIVES (cheap — the exact confirm kills
  * them) but never false negatives, so sketch + confirm is EXACT.
  *
  * Scale shape (100 TB): the build is one map-side-combined aggregation
  * whose state is capped at depth×width cells per partition — the shuffle
  * carries at most depth×width rows per map task regardless of input size
  * or key cardinality, and the driver holds one depth×width Long array
  * (~80 KB at 5×2048). Estimation is a broadcast-free LITERAL column
  * expression (the cells ride in the plan, codegen'd `element_at`), so the
  * heavy-key filter runs map-side with zero shuffle; only rows of
  * surviving candidate keys reach the exact groupBy. Against a billion
  * distinct keys where a plain `GROUP BY HAVING` shuffles every row, the
  * sketch path shuffles only the heavy tail — the classic
  * "sketch-prune, exact-confirm" discipline this repo already uses for
  * Misra–Gries heavy hitters ([[TextAnalysis]]), here in point-query form.
  *
  * Sketches over disjoint inputs MERGE by cell-wise addition into exactly
  * the sketch of the union (integer sums commute — bit-identical to a
  * single build), which is what makes the build embarrassingly parallel
  * and incremental (yesterday's sketch + today's delta).
  */
object CountMin {

  /** An immutable built sketch: `cells(i*width + j)` = row i, column j. */
  final case class CMSketch(depth: Int, width: Int, total: Long, cells: Array[Long]) {

    /** Point estimate of `key`'s total weight as a codegen'd Column: the
      * MIN over rows of each row's hashed cell. The cells are embedded as
      * an array LITERAL — no UDF, no broadcast variable, whole-stage
      * codegen keeps the filter in the scan stage. */
    def estimateCol(key: Column): Column = {
      val cellsLit = lit(cells)
      (0 until depth).map { i =>
        // element_at is 1-based; row-major layout
        element_at(cellsLit,
          (lit(i * width) + pmod(xxhash64(key, lit(i)), lit(width)) + 1).cast("int"))
      }.reduce(least(_, _))
    }

    /** Cell-wise merge: the sketch of the concatenated inputs, exactly. */
    def merge(other: CMSketch): CMSketch = {
      require(depth == other.depth && width == other.width,
        s"merge: shape mismatch ${depth}x$width vs ${other.depth}x${other.width}")
      val out = new Array[Long](cells.length)
      var i = 0
      while (i < cells.length) { out(i) = cells(i) + other.cells(i); i += 1 }
      CMSketch(depth, width, total + other.total, out)
    }
  }

  /** Build a sketch of `keyCol`'s weighted frequencies. NULL keys are
    * excluded (SQL aggregation convention). `weight` defaults to 1 per
    * row; it is cast to long — sketch arithmetic is exact-integer. */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int,
      weight: Column = lit(1L)): CMSketch = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")
    val key = col(s"`$keyCol`")
    // one row per (sketch row, cell): posexplode of the depth hashed
    // indices, then a map-side-combined sum — partial state ≤ depth*width
    val cellsDf = df.where(key.isNotNull)
      .select(posexplode(array((0 until depth).map(i =>
        pmod(xxhash64(key, lit(i)), lit(width))): _*)).as(Seq("i", "j")),
        weight.cast("long").as("w"))
      .groupBy("i", "j").agg(sum("w").as("w"))
      .collect()
    val cells = new Array[Long](depth * width)
    var total = 0L
    cellsDf.foreach { r =>
      cells(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
      if (r.getInt(0) == 0) total += r.getLong(2)
    }
    CMSketch(depth, width, total, cells)
  }

  /** EXACT heavy keys via sketch-prune + exact-confirm: all keys whose
    * true row count ≥ `threshold`, with their exact counts. The sketch
    * filter is map-side (no false negatives — one-sided error), so the
    * groupBy shuffles only candidate keys' rows; the exact HAVING then
    * removes collision-inflated false positives. Result ≡ plain
    * `GROUP BY key HAVING count ≥ threshold`, at a fraction of the
    * shuffle when heavy keys are rare. */
  def heavyKeys(df: DataFrame, keyCol: String, threshold: Long,
      depth: Int = 5, width: Int = 2048): DataFrame =
    heavyKeys(df, keyCol, threshold, build(df, keyCol, depth, width))

  /** [[heavyKeys]] against a PREBUILT sketch (reuse across queries, or a
    * merged incremental sketch). The sketch must cover `df` — a sketch of
    * a subset could underestimate and break the no-false-negative
    * guarantee. */
  def heavyKeys(df: DataFrame, keyCol: String, threshold: Long,
      sketch: CMSketch): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val key = col(s"`$keyCol`")
    df.where(key.isNotNull && sketch.estimateCol(key) >= threshold)
      .groupBy(key.as(keyCol)).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }
}

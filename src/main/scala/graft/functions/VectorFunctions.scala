package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built entirely from
  * Catalyst higher-order functions (`zip_with` / `aggregate` / `transform`)
  * — no UDF boundary, no serialization of the closure per row, and the
  * expressions evaluate inside the task thread (the reference pays a
  * Python-worker hop for the equivalent numpy math,
  * `02.a Train - TensorFlow Distributed.py:226-231`).
  *
  * Determinism: all folds are sequential left-to-right over the array, in
  * double precision, so results are bit-stable across partitionings and
  * match a straightforward scalar loop (the DuckDB oracle's
  * `list_cosine_similarity` over `DOUBLE[]` agrees to 1 ulp).
  */
object VectorFunctions {

  /** Widen a float array to double before arithmetic (exact conversion). */
  def toDoubleArray(a: Column): Column = transform(a, _.cast("double"))

  /** Dot product: sequential fold, double precision. The per-element widen
    * makes the MULTIPLY double-precision too — without it a float-array
    * input would round each product to float before the double accumulation
    * (diverging from this doc's contract and the DOUBLE[] oracle). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot(a,b) / (|a| * |b|). Inputs may be float arrays;
    * they are widened to double first. A zero-norm side yields NaN — the
    * IEEE result [[cosineNative]] computes — rather than Spark's Divide
    * semantics (ANSI: DIVIDE_BY_ZERO crash; legacy: NULL), so the two
    * forms stay value-identical on degenerate vectors too. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDoubleArray(a)
    val bd = toDoubleArray(b)
    val den = norm2(ad) * norm2(bd)
    when(den === 0.0, lit(Double.NaN)).otherwise(dot(ad, bd) / den)
  }

  /** Native-expression cosine (see [[graft.plans.CosineSimilarity]]):
    * bit-identical to [[cosine]] but runs as a primitive codegen loop —
    * use on hot paths over float-array columns. Requires the
    * `GraftExtensions` session extension (GraftSession sets it). */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Native-expression dot product (see [[graft.plans.DotProduct]]): the
    * norm-free core of [[cosineNative]], for plans that cache per-row norms
    * and pay only the dot per PAIR (k-NN joins). Bit-identical accumulation
    * to [[dot]] over float arrays. */
  def dotNative(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Native L2 norm of a float array: `sqrt(graft_dot(a, a))` — the exact
    * double [[cosineNative]] computes internally for each side. */
  def norm2Native(a: Column): Column = sqrt(dotNative(a, a))

  /** 0-based index of the max element (F4, the reference's `np.argmax`,
    * `02.a …:226,230`). Ties resolve to the first occurrence, matching
    * numpy. */
  def argmax(a: Column): Column =
    (array_position(a, array_max(a)) - 1).cast("long")

  /** Max |x| over the vector, in double — the symmetric-quantization scale. */
  def maxAbs(a: Column): Column = array_max(transform(a, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization: `floor(x * 127 / max|x|)` per element —
    * the storage-compression step of a large embedding corpus (4× smaller
    * than float32 before encoding). `floor` (not round-half-even) is chosen
    * deliberately: floor semantics are identical across engines, so the
    * quantized values are bit-reproducible in an external SQL oracle, while
    * `round` ties break differently between Java and C++ runtimes.
    * Zero/degenerate vectors (max|x| = 0) quantize to null, not a
    * divide-by-zero artifact. Map-side projection: quantizing 100 TB is one
    * scan, no shuffle. */
  def quantizeInt8(a: Column): Column = {
    val mx = maxAbs(a)
    // non-finite elements null the whole vector like the zero-norm case:
    // NaN would otherwise make mx NaN, pass the > 0.0 test (Spark NaN
    // ordering), and Floor's raw (long) cast would silently quantize
    // EVERY element to 0 — a legitimate-looking artifact the oracle's
    // floor(NaN) cannot reproduce
    when(mx > 0.0 && !isnan(mx) && mx =!= Double.PositiveInfinity,
      transform(a, x => floor(x.cast("double") * lit(127.0) / mx).cast("long")))
      .otherwise(lit(null))
  }

  /** Deterministic sparse random projection (Achlioptas 2003, "Database-
    * friendly random projections"): out[j] = Σ_i q(in[i]) · r(i,j) with
    * r ∈ {+1, −1, 0} at density 1/3, the dimensionality-reduction step that
    * makes downstream ANN/clustering cheap (64-d → 16-d cuts every cosine
    * 4×). Two determinism choices make it bit-reproducible in an external
    * SQL oracle:
    *
    *  - the projection matrix is not sampled but COMPUTED per cell from the
    *    mixed cell index `((i·outDim + j) · 2654435761) % 1000003 % 6`
    *    (0→+1, 1→−1, else 0) — the prime modulus breaks the affine-mod-6
    *    structure a direct `(ai+bj) % 6` would have (which makes columns
    *    j and j+6 identical shifts of each other);
    *  - inputs are `floor`-quantized to integers (same rationale as
    *    [[quantizeInt8]]) so the accumulation is exact long arithmetic —
    *    order-free, no float-sum nondeterminism cross-engine.
    *
    * Map-side projection: reducing 100 TB of embeddings is one scan, no
    * shuffle, fully codegen'd (nested HOFs, no UDF boundary). */
  def sparseRandomProject(a: Column, inDim: Int, outDim: Int,
      quantScale: Int = 1000): Column = {
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(sequence(lit(0), lit(inDim - 1)), lit(0L), (acc, i) => {
        val cell = (i * outDim + j).cast("long") * lit(2654435761L) % 1000003L % 6L
        val sign = when(cell === 0L, lit(1L)).when(cell === 1L, lit(-1L)).otherwise(lit(0L))
        acc + floor(element_at(a, i + 1).cast("double") * quantScale).cast("long") * sign
      }))
    // a NaN element would silently contribute 0 (Floor's raw (long) cast)
    // and an Inf element Long.MaxValue (then an ANSI overflow mid-scan) —
    // null the projection for non-finite inputs, like quantizeInt8
    when(exists(a, x => isnan(x.cast("double")) ||
        abs(x.cast("double")) === Double.PositiveInfinity),
      lit(null)).otherwise(proj)
  }
}

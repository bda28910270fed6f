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
    * they are widened to double first. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDoubleArray(a)
    val bd = toDoubleArray(b)
    dot(ad, bd) / (norm2(ad) * norm2(bd))
  }

  /** Native-expression cosine (see [[graft.plans.CosineSimilarity]]):
    * bit-identical to [[cosine]] but runs as a primitive codegen loop —
    * use on hot paths over float-array columns. Requires the
    * `GraftExtensions` session extension (GraftSession sets it). */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

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
    when(mx > 0.0,
      transform(a, x => floor(x.cast("double") * lit(127.0) / mx).cast("long")))
      .otherwise(lit(null))
  }
}

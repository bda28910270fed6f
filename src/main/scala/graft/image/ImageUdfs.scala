package graft.image

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Typed size struct returned by the size UDF — the reference declares the
  * same shape as `@pandas_udf("width: int, height: int")`
  * (`01. Ingest.py:59-62`). */
case class ImgSize(width: Int, height: Int)

/** Spark UDF surface over [[Kernels]] (SURVEY.md §2h UDF mapping): Scala
  * `udf()` on binary columns in place of the reference's pandas UDFs — no
  * Arrow serialization to a Python worker, the kernel runs in the task
  * thread. These are genuine per-row imperative kernels (image codecs), the
  * one place SURVEY §7 sanctions UDFs over built-ins.
  */
object ImageUdfs {

  // Every UDF null-propagates (null payload → null result, same discipline
  // as Dedup's text kernels): binary columns are nullable — a left-outer
  // re-attach or a corpus row with missing content would otherwise NPE
  // inside the kernel and abort the whole job.

  /** I1 `(width, height)` struct. */
  val imageSize: UserDefinedFunction =
    udf((b: Array[Byte]) =>
      if (b == null) null.asInstanceOf[ImgSize]
      else { val (w, h) = Kernels.size(b); ImgSize(w, h) })

  /** I3 grayscale PNG bytes. */
  val grayscalePng: UserDefinedFunction =
    udf((b: Array[Byte]) => if (b == null) null else Kernels.grayscalePng(b))

  /** I2 bilinear resize (JPEG out). */
  val resizeJpg: UserDefinedFunction =
    udf((b: Array[Byte], w: Int, h: Int) => if (b == null) null else Kernels.resizeJpg(b, w, h))

  /** Center crop (eval-time transform shape). */
  val centerCropJpg: UserDefinedFunction =
    udf((b: Array[Byte], side: Int) => if (b == null) null else Kernels.centerCropJpg(b, side))

  /** I5 seeded random crop+flip augmentation. */
  val randomCropFlipJpg: UserDefinedFunction =
    udf((b: Array[Byte], side: Int, seed: Long) =>
      if (b == null) null else Kernels.randomCropFlipJpg(b, side, seed))

  /** Deterministic near-duplicate generator (uniform brightness shift). */
  val brightnessShift: UserDefinedFunction =
    udf((b: Array[Byte], delta: Int) => if (b == null) null else Kernels.brightnessShiftJpg(b, delta))

  /** Decoded-pixel checksum (test/verification helper — SURVEY §5 hazard 4). */
  val pixelChecksum: UserDefinedFunction =
    udf((b: Array[Byte]) =>
      if (b == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(Kernels.decodedPixelChecksum(b)))

  /** I6 model-as-UDF: decode → featurize → score → `[prediction, json]`,
    * the reference's `mlflow.pyfunc.spark_udf` contract
    * (`03. Inference.py:28,86`). The model instance rides the closure once
    * per task, not per row. */
  def scoringUdf(model: ScoringModel): UserDefinedFunction =
    udf((b: Array[Byte]) => if (b == null) null else model.predict(Kernels.normalizedFeatures(b)))

  /** Convenience: apply scoring to a content column. */
  def score(model: ScoringModel)(content: Column): Column = scoringUdf(model)(content)
}

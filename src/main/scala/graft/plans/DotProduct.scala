package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two float-array columns, with
  * whole-stage codegen — the norm-free core of [[CosineSimilarity]].
  *
  * Why it exists: in an all-pairs or celled k-NN JOIN the fused cosine
  * recomputes BOTH vectors' norms for every pair — 3 multiply-adds per
  * element where only the dot product varies pair-to-pair. Precomputing
  * `sqrt(Σx²)` once per ROW (via `graft_dot(v, v)`) and dividing the
  * per-pair dot by the two cached norms does a third of the arithmetic for
  * bit-identical results: the accumulation order of each sum is unchanged,
  * and `dot / (na * nb)` multiplies/divides the exact same doubles the
  * fused form produces internally.
  *
  * Same contracts as [[CosineSimilarity]]: sequential left-to-right double
  * fold; null if either side is null; mismatched dimensions fail fast.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: mismatched vector dimensions ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var dot = 0.0
    var i   = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException("graft_dot: mismatched vector dimensions " +
         |    $x.numElements() + " vs " + $y.numElements());
         |}
         |int $n = $x.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

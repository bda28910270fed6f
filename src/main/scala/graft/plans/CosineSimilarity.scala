package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity between two float-array
  * columns, with whole-stage codegen.
  *
  * This is the SURVEY.md §7 "custom `Expression`" upgrade path, applied to
  * the hottest vector kernel: the composable higher-order-function form
  * (`graft.functions.VectorFunctions.cosine`) evaluates interpreted with
  * per-element boxing; this expression runs a primitive `getFloat` loop over
  * `ArrayData`, inside the generated code of the enclosing stage — no
  * virtual calls, no boxing, no UDF serialization.
  *
  * Semantics are identical to the HOF form (and the DuckDB oracle):
  * a sequential left-to-right double fold, `dot / (sqrt(na) * sqrt(nb))`,
  * so results are bit-equal across all three implementations.
  * Null handling: null if either array is null; array elements are assumed
  * non-null (embedding contract). Mismatched dimensions fail fast with an
  * explicit error (like DuckDB) rather than silently truncating — a short
  * corrupt embedding must surface, not rank.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

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
        s"graft_cosine: mismatched vector dimensions ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var dot = 0.0
    var na  = 0.0
    var nb  = 0.0
    var i   = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val xi  = ctx.freshName("xi")
      val yi  = ctx.freshName("yi")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException("graft_cosine: mismatched vector dimensions " +
         |    $x.numElements() + " vs " + $y.numElements());
         |}
         |int $n = $x.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

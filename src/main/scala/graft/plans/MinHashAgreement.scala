package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native expression: fraction of agreeing slots between two MinHash
  * signatures (= the Jaccard estimate). Same rationale as
  * [[CosineSimilarity]]: this runs once per LSH candidate pair — the
  * interpreted `zip_with`/`aggregate` form pays per-element boxing on the
  * hottest loop of near-dup verification; here it is a primitive `getLong`
  * comparison loop inside whole-stage codegen.
  *
  * Mismatched signature lengths fail fast (signatures from different
  * `numHashes` configurations must not be compared silently).
  */
case class MinHashAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_minhash_est"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  // An EMPTY sketch is legitimate — MinHashUnion.zero for a group whose
  // texts are all null — and an empty set's Jaccard estimate against
  // anything is 0.0, so either-side-empty short-circuits BEFORE the length
  // fail-fast (which still guards genuinely mixed numHashes configs).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() == 0 || y.numElements() == 0) 0.0
    else if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: mismatched signature lengths ${x.numElements()} vs ${y.numElements()}")
    else {
      val n     = x.numElements()
      var agree = 0
      var i     = 0
      while (i < n) {
        if (x.getLong(i) == y.getLong(i)) agree += 1
        i += 1
      }
      agree.toDouble / n
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n     = ctx.freshName("n")
      val i     = ctx.freshName("i")
      val agree = ctx.freshName("agree")
      s"""
         |if ($x.numElements() == 0 || $y.numElements() == 0) {
         |  ${ev.value} = 0.0;
         |} else if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException("graft_minhash_est: mismatched signature lengths " +
         |    $x.numElements() + " vs " + $y.numElements());
         |} else {
         |  int $n = $x.numElements();
         |  int $agree = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.getLong($i) == $y.getLong($i)) $agree++;
         |  }
         |  ${ev.value} = ((double) $agree) / $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

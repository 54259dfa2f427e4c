package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: squared Euclidean (L2) distance of two
 * numeric-array columns (element type float or double, independently per
 * side), accumulated sequentially in double.
 *
 * The product-quantization family ([[graft.analytics.Similarity]] PQ
 * codebooks) scores every subvector against m×k broadcast centroids — at
 * 100 TB that inner loop dominates the scan, so like
 * [[CosineSimilarity]] this is the "(b) custom Expression" case: with
 * `doGenCode` the distance folds into the surrounding whole-stage-codegen
 * loop as a tight primitive `for`, instead of per-element lambda
 * interpretation over `aggregate(zip_with(...))` (measured 5× on the
 * analogous q87 assignment hot path). Mismatched lengths compare the
 * common prefix (min length), mirroring the cosine convention; squared L2
 * is defined for every input including zero vectors, so unlike cosine
 * there is no undefined→NULL branch — NULL out only on NULL input arrays
 * (BinaryExpression null-intolerance).
 */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_l2_distance expects float or double arrays, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // float elements widen to double exactly (same value either side holds
  // the double centroid), so the result is engine-order independent
  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (xd, yd) = (isDouble(left), isDouble(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      val dv = xv - yv
      acc += dv * dv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("dv")
      val getX = if (isDouble(left)) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY = if (isDouble(right)) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dv = $getX - $getY;
         |  $acc += $dv * $dv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2Distance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "squared_l2_distance"
}

object SquaredL2Distance {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4 classic Column ⇄ Expression bridge). */
  def squaredL2(a: Column, b: Column): Column =
    GraftBridge.columnOf(SquaredL2Distance(
      GraftBridge.expressionOf(a), GraftBridge.expressionOf(b)))
}

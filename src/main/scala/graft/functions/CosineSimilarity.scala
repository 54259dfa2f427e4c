package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: cosine similarity of two numeric-array
 * columns (element type float or double, independently per side), computed
 * in double with sequential accumulation.
 *
 * Numerically identical to the higher-order-function formulation in
 * [[graft.analytics.Similarity]] (`aggregate(zip_with(...))` — same
 * element order, same `dot / (sqrt(na) * sqrt(nb))` formula), but with
 * `doGenCode` it compiles into the surrounding whole-stage-codegen loop: a
 * tight primitive `for` over the two arrays instead of per-element lambda
 * interpretation + an intermediate zipped array. At 100 TB the scoring loop
 * is the hot path of any ANN scan, so this is the preference-order "(b)
 * custom Expression" case from the design notes (the reference has no
 * vector ops at all; this is north-star surface).
 */
case class CosineSimilarity(left: Expression, right: Expression)
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
      s"cosine_similarity expects float or double arrays, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // element accessors, resolved once per side at plan time: a float element
  // is widened to double exactly like the HOF form's cast("double"), so
  // the value is bit-identical whichever side holds the (double) centroid
  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (xd, yd) = (isDouble(left), isDouble(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // zero-magnitude input ⇒ cosine is UNDEFINED ⇒ NULL, never NaN: Spark
    // orders NaN ABOVE every double (so a 0/0 score would out-rank real
    // similarities and pass >= thresholds), while SQL engines yield NULL
    // for the same division — the hostile-fixture sweep caught the q87/
    // q92/q96 family diverging on exactly this. NULL behaves identically
    // on both sides: comparisons fail, sums skip, DESC sorts last.
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = if (isDouble(left)) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY = if (isDouble(right)) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $getX;
         |  double $yv = $getY;
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4 classic Column ⇄ Expression bridge). */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.columnOf(CosineSimilarity(
      GraftBridge.expressionOf(a), GraftBridge.expressionOf(b)))
}

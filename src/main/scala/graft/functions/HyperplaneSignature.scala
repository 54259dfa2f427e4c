package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: random-hyperplane LSH signature — the sign
 * bits of `coefs.length` projections of a numeric-array column, packed
 * into a long (bit p set iff Σᵢ xᵢ·coefs(p)(i) ≥ 0).
 *
 * Numerically identical to the higher-order-function formulation in
 * [[graft.analytics.Similarity.lshBucketCol]] (per plane: `aggregate(
 * zip_with(emb, coefs, _*_))` in element order — the fused loop below
 * accumulates each plane's sum in the same i-order, so every projection
 * is the same double), but ONE primitive pass over the embedding instead
 * of `nplanes` interpreted lambda traversals with intermediate zipped
 * arrays — the q38/q58/q37 banding scans are per-row × nplanes hot paths
 * at corpus scale, the same amplification shape that made the Lloyd
 * assignment the q87 bottleneck (BENCH_NOTES round 6).
 *
 * The coefficient matrix is a driver-side literal (Vector of Vectors, so
 * case-class equality stays structural for plan canonicalization),
 * shipped into codegen as a reference object.
 */
case class HyperplaneSignature(child: Expression,
    coefs: Vector[Vector[Double]]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects a float or double array, got ${t.simpleString}")
  }

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  @transient private lazy val matrix: Array[Array[Double]] =
    coefs.map(_.toArray).toArray

  /** Width every coefficient row shares (the embedding dim the planes
    * were drawn for). */
  @transient private lazy val dim: Int =
    if (matrix.isEmpty) 0 else matrix(0).length

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val planes = matrix.length
    val n = x.numElements()
    // HOF parity on ragged rows: zip_with pads the shorter side with
    // nulls, the aggregate sum goes null, and when(null >= 0) leaves
    // every plane bit 0 — so a row whose length differs from the
    // coefficient dim must yield signature 0, not a partial projection
    if (n != dim) return 0L
    val acc = new Array[Double](planes)
    var i = 0
    while (i < n) {
      val xv = if (isDouble) x.getDouble(i) else x.getFloat(i).toDouble
      var p = 0
      while (p < planes) {
        val row = matrix(p)
        if (i < row.length) acc(p) += xv * row(i)
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      if (acc(p) >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("hyperplanes", matrix, "double[][]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val xv = ctx.freshName("xv")
      val sig = ctx.freshName("sig")
      val getX = if (isDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      // dim guard mirrors nullSafeEval: ragged rows → signature 0 (HOF parity)
      s"""
         |long $sig = 0L;
         |int $n = $a.numElements();
         |if ($m.length > 0 && $n == $m[0].length) {
         |  double[] $acc = new double[$m.length];
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $getX;
         |    for (int $p = 0; $p < $m.length; $p++) {
         |      $acc[$p] += $xv * $m[$p][$i];
         |    }
         |  }
         |  for (int $p = 0; $p < $m.length; $p++) {
         |    if ($acc[$p] >= 0) $sig |= 1L << $p;
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_signature"
}

object HyperplaneSignature {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4 classic Column ⇄ Expression bridge). */
  def signature(emb: Column, coefs: Vector[Vector[Double]]): Column =
    GraftBridge.columnOf(HyperplaneSignature(GraftBridge.expressionOf(emb), coefs))
}

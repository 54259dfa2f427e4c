package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: the MinHash signature — per permutation p,
 * min over the input hash array of `(h * as(p) + bs(p)) % prime` — in ONE
 * pass over the hashes instead of `numPerm` interpreted higher-order
 * `transform` traversals (the q32 signature build is per-row × numPerm,
 * the same amplification shape as the Lloyd-assignment and hyperplane
 * fixes; BENCH_NOTES round 6).
 *
 * Numerically identical to the HOF formulation in
 * [[graft.analytics.Dedup.minhashSignature]]: Spark long arithmetic IS
 * Java long arithmetic (same wrap-around multiply, same `%` remainder),
 * and min is order-independent. An empty hash array yields all-null
 * minima, exactly like `array_min` over an empty array.
 */
case class MinhashSignature(child: Expression,
    as: Vector[Long], bs: Vector[Long], prime: Long) extends UnaryExpression {

  require(as.length == bs.length, "coefficient vectors must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${t.simpleString}")
  }

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val perms = aArr.length
    if (n == 0) return new GenericArrayData(new Array[Any](perms))
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var p = 0
      while (p < perms) {
        val v = (h * aArr(p) + bArr(p)) % prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$aRef.length]);
         |} else {
         |  long[] $mins = new long[$aRef.length];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $hs.getLong($i);
         |    for (int $p = 0; $p < $aRef.length; $p++) {
         |      long $v = ($h * $aRef[$p] + $bRef[$p]) % ${prime}L;
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4 classic Column ⇄ Expression bridge). */
  def signature(hashes: Column, as: Vector[Long], bs: Vector[Long], prime: Long): Column =
    GraftBridge.columnOf(MinhashSignature(GraftBridge.expressionOf(hashes), as, bs, prime))
}

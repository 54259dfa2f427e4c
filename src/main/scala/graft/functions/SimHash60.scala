package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: 60-bit SimHash fingerprint from an
 * array<long> of word hashes — bit b of the output is the majority vote of
 * bit b across the inputs (strict majority, ties clear).
 *
 * Value-identical to the declarative formulation it replaces in
 * [[graft.analytics.Dedup]] (`sum of when(2*size(filter(bit b set)) >
 * size, 1<<b)`, asserted in CosineSimilaritySpec) — but that form walks the
 * hash array 60 times through interpreted lambda filters; this is ONE
 * primitive pass per row inside whole-stage codegen. Null elements vote
 * "unset" but still count toward the total, matching `size()` vs
 * null-dropping `filter()` semantics of the declarative form.
 */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) * 2 > n) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    for (int $b = 0; $b < 60; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($votes[$b] * 2 > $n) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash60 {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4 classic Column ⇄ Expression bridge). */
  def simhash60(hashes: Column): Column =
    GraftBridge.columnOf(SimHash60(GraftBridge.expressionOf(hashes)))
}

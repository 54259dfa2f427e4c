package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: `|A ∩ B|` of two SORTED, DISTINCT
 * `array<long>` columns via a linear merge walk.
 *
 * The set-similarity hot path (char/word shingle Jaccard — the exact
 * verifier every near-dup family funnels into) computes
 * `array_intersect` + `array_union` per candidate pair; each builds a
 * hash set over the pair's elements, which at 100 TB means two
 * O(|A|+|B|) set constructions with per-element hashing for EVERY
 * candidate pair. When both inputs are pre-sorted once per document
 * (`array_sort`, amortized over all the pairs the doc appears in), the
 * intersection count is a branch-light two-pointer walk over primitive
 * longs, and `|A ∪ B| = |A| + |B| - |A ∩ B|` makes the union free.
 * With `doGenCode` the walk inlines into the whole-stage-codegen join
 * loop. Sortedness/distinctness is the caller's contract (as with any
 * merge join); unsorted input silently undercounts, so callers sort in
 * the same projection that builds the array.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4 classic Column ⇄ Expression bridge). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.columnOf(SortedIntersectCount(
      GraftBridge.expressionOf(a), GraftBridge.expressionOf(b)))
}

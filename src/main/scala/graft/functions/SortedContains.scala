package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: membership test of a long against a SORTED,
 * DISTINCT `array<long>` via binary search.
 *
 * Spark's `array_contains` is a LINEAR scan of the array — fine for
 * row-sized arrays, quadratic in disguise when the array is a broadcast
 * heavy-hitter set probed once per token/span of every document (the q98
 * boilerplate drop set: O(spans × |set|) per document). Against a sorted
 * set the probe is O(log |set|); at a 4M-entry drop set that is ~22
 * comparisons instead of 4M per span. Sortedness/distinctness is the
 * caller's contract (callers build the set with `sort_array(collect_set)`
 * in the same aggregate); unsorted input silently mis-answers, same
 * contract as [[SortedIntersectCount]].
 *
 * NULL semantics match `array_contains` under non-null inputs (the only
 * shape q98 produces: span strings from `array_join` are never NULL):
 * NULL array or NULL needle ⇒ NULL, else true/false.
 */
case class SortedContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // containsNull arrays are REJECTED, not scanned: binary search reads
      // slots with arr.getLong, which returns undefined data on a null
      // slot — a user-supplied array with NULL entries would silently
      // mis-answer (the sortedness contract is unverifiable, but the
      // null-element case is checkable at analysis time). The engine's
      // callers build sets with sort_array(collect_set(...)), whose
      // element type is containsNull = false.
      case (ArrayType(LongType, false), LongType) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, true), _) => TypeCheckResult.TypeCheckFailure(
        "sorted_contains requires an array<bigint> with non-nullable " +
          "elements (a NULL slot would be read as undefined data by the " +
          "binary search); build the set with sort_array(collect_set(...))")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_contains expects (array<bigint>, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    var found = false
    while (lo <= hi && !found) {
      val mid = (lo + hi) >>> 1
      val mv = arr.getLong(mid)
      if (mv == v) found = true
      else if (mv < v) lo = mid + 1
      else hi = mid - 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val mv = ctx.freshName("mv")
      s"""
         |int $lo = 0; int $hi = $a.numElements() - 1;
         |${ev.value} = false;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $mv = $a.getLong($mid);
         |  if ($mv == $b) { ${ev.value} = true; break; }
         |  else if ($mv < $b) { $lo = $mid + 1; } else { $hi = $mid - 1; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_contains"
}

object SortedContains {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point (Spark 4 classic Column ⇄ Expression bridge). */
  def sortedContains(arr: Column, v: Column): Column =
    GraftBridge.columnOf(SortedContains(
      GraftBridge.expressionOf(arr), GraftBridge.expressionOf(v)))
}

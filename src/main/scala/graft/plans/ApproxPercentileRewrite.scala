package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Opt-in optimizer rule: rewrite exact `percentile` aggregates into
 * `approx_percentile` (a mergeable t-digest-style sketch) without touching
 * query code.
 *
 * Why: Spark's exact [[Percentile]] buffers EVERY group value in the
 * aggregation buffer — at warehouse scale (~60M mostly-distinct doubles per
 * group at 100× the test SF) that buffer is the executor OOM. The engine
 * already offers two safe spellings (the sort-based
 * [[graft.operators.ExactPercentile]] and explicit `approx_percentile`),
 * but a fleet of existing queries doesn't get rewritten by hand. This rule
 * is the operational escape hatch: flip
 * `spark.graft.percentile.approx.enabled=true` on the big cluster and every
 * exact percentile in every submitted plan becomes a bounded-memory sketch
 * with rank error ≤ 1/accuracy, schema-identical to the exact form.
 *
 * Scope guards (rewrite only when provably equivalent-in-shape):
 *  - frequency expression must be the literal 1 (the `percentile(col, p)`
 *    form — weighted percentiles have no approx counterpart);
 *  - `reverse` must be false (no approx analogue);
 *  - DISTINCT / FILTER aggregates pass through untouched (`copy` keeps
 *    those flags on the enclosing [[AggregateExpression]]).
 *
 * [[ApproximatePercentile]] returns the child's type (a real sample value)
 * where [[Percentile]] returns an interpolated double, so the replacement
 * is wrapped in a cast back to the original result type — downstream
 * operators and the driver-facing schema see no change.
 *
 * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`; the
 * flag is read per-invocation from SQLConf so a session can toggle it
 * between queries (tests do).
 */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.percentile.approx.enabled"
  val AccuracyKey = "spark.graft.percentile.approx.accuracy"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").toBoolean

  private def accuracy: Int =
    conf.getConfString(AccuracyKey,
      ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY.toString).toInt

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v: Long, _) => v == 1L
    case Literal(v: Int, _) => v == 1
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformWithPruning(_.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.AGGREGATE)) {
      case agg: Aggregate =>
        agg.transformExpressionsUp {
          case ae @ AggregateExpression(
              p @ Percentile(_, _, freq, _, _, reverse), _, _, _, _)
              if !reverse && isOne(freq) && !ae.isDistinct && ae.filter.isEmpty =>
            val approx = new ApproximatePercentile(
              p.child, p.percentageExpression, Literal(accuracy))
            val rewritten = ae.copy(aggregateFunction = approx)
            if (approx.dataType == p.dataType) rewritten
            else Cast(rewritten, p.dataType)
        }
    }
}

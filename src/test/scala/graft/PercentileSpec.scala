package graft

import graft.analytics.Relational
import org.scalatest.funsuite.AnyFunSuite

/** The sort-based exact percentile equals the builtin buffering form after
  * rounding (same quantile_cont definition), and its plan carries no
  * percentile aggregate buffer. */
class PercentileSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("sorted formulation reproduces the builtin percentile values") {
    val a = Relational.q45Percentiles(spark, d)
      .orderBy("l_returnflag").collect().toSeq
    val b = Relational.q73PercentilesSorted(spark, d)
      .select("l_returnflag", "price_p25", "price_p50", "price_p75", "qty_p50", "n_rows")
      .orderBy("l_returnflag").collect().toSeq
    assert(a == b)
  }

  test("no Percentile aggregate in the sorted plan") {
    val plan = Relational.q73PercentilesSorted(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), plan.take(500))
  }
}

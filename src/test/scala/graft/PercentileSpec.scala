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

  test("NULL values are ignored, matching percentile_cont semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)), ("g", Some(2.0)))
      .toDF("k", "v")
    val sorted = graft.operators.ExactPercentile
      .of(df, "k", "v", Seq(("p50", 0.5)), countAlias = Some("n"))
      .collect()(0)
    assert(sorted.getDouble(1) == 2.0) // median of {1,2,3}, null excluded
    assert(sorted.getLong(2) == 3L) // non-null count
    val builtin = df.groupBy("k").agg(expr("percentile(v, 0.5)")).collect()(0).getDouble(1)
    assert(sorted.getDouble(1) == builtin)
  }

  test("no Percentile aggregate in the sorted plan") {
    val plan = Relational.q73PercentilesSorted(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), plan.take(500))
  }
}

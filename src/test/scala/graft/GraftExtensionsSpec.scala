package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions. */
class GraftExtensionsSpec extends AnyFunSuite with SparkSuite {

  test("cosine_similarity callable from SQL after registration") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      """SELECT cosine_similarity(
        |  cast(array(1.0, 2.0, 3.0) as array<float>),
        |  cast(array(1.0, 2.0, 3.0) as array<float>)) AS c""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("wrong arity is rejected") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT cosine_similarity(cast(array(1.0) as array<float>))").collect()
    }
  }

  test("wrong element type fails analysis") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0), array(2.0))").collect()
    }
  }

  test("simhash60 callable from SQL after registration") {
    GraftExtensions.register(spark)
    // majority vote over {1b, 1b, 2b}: bit0 set (2/3), bit1 clear (1/3)
    val v = spark.sql(
      "SELECT simhash60(array(1L, 1L, 2L)) AS s").collect()(0).getLong(0)
    assert(v == 1L)
    intercept[Exception] {
      spark.sql("SELECT simhash60(array('x'))").collect()
    }
  }

  test("sorted_contains callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT sorted_contains(array(1L, 5L, 9L), 5L) AS hit, " +
        "sorted_contains(array(1L, 5L, 9L), 4L) AS miss").collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    intercept[Exception] {
      spark.sql("SELECT sorted_contains(array('x'), 'x')").collect()
    }
  }

  private def percentilePlanOf(sql: String): String = {
    spark.sql(sql).queryExecution.optimizedPlan.toString
  }

  test("percentile rewrite: off by default, on under the flag, schema stable") {
    GraftExtensions.register(spark)
    spark.range(0, 10001).createOrReplaceTempView("pr_nums")
    val q = "SELECT percentile(id, array(0.25, 0.5, 0.75)) AS p FROM pr_nums"

    // default: flag unset → exact percentile survives optimization
    assert(percentilePlanOf(q).contains("percentile("))
    assert(!percentilePlanOf(q).contains("percentile_approx"))

    spark.conf.set(plans.ApproxPercentileRewrite.EnabledKey, "true")
    try {
      val df = spark.sql(q)
      assert(df.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      // result type must be unchanged (exact returns double; approx returns
      // the child type and the rule casts it back)
      assert(df.schema("p").dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false) ||
        df.schema("p").dataType.simpleString.startsWith("array<double>"))
      val got = df.collect()(0).getSeq[Double](0)
      // uniform 0..10000: rank error at default accuracy is ≤ ~1/10000
      val want = Seq(2500.0, 5000.0, 7500.0)
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) <= 10001.0 / 1000, s"got $g want ~$w") }

      // guarded forms pass through: weighted frequency, DISTINCT, FILTER
      assert(percentilePlanOf(
        "SELECT percentile(id, 0.5, 2) AS p FROM pr_nums").contains("percentile("))
      val distinctPlan = percentilePlanOf(
        "SELECT percentile(DISTINCT id, 0.5) AS p FROM pr_nums")
      // DISTINCT percentile must remain EXACT (semantics change under a
      // sketch: distinct-ness alters which values feed the quantile)
      assert(!distinctPlan.contains("percentile_approx"),
        s"DISTINCT percentile was rewritten to approx:\n$distinctPlan")
      val filterPlan = percentilePlanOf(
        "SELECT percentile(id, 0.5) FILTER (WHERE id % 2 = 0) AS p FROM pr_nums")
      assert(!filterPlan.contains("percentile_approx"),
        s"FILTER percentile was rewritten to approx:\n$filterPlan")
    } finally spark.conf.unset(plans.ApproxPercentileRewrite.EnabledKey)
  }
}

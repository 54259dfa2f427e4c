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
}

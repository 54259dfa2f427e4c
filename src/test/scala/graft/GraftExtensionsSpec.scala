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
}

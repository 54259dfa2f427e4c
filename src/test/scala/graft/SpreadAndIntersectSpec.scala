package graft

import graft.analytics.{Relational, Tables}
import graft.functions.SortedIntersectCount
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Regression locks for the round-4 performance machinery: the guarded
 * small-scan spread (identity at scale, repartition below parallelism),
 * pushdown surviving the spread, and the native merge-walk intersect
 * (interpreted ≡ codegen ≡ the builtin set ops on sorted distinct input).
 */
class SpreadAndIntersectSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("spread: single-partition scan fans out to parallelism; wide input untouched") {
    val one = Seq(1, 2, 3).toDF("x").coalesce(1)
    assert(Tables.spread(spark, one).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    val p = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).toDF("x").repartition(p + 2)
    // already ≥ parallelism → identity (no extra exchange at scale)
    assert(Tables.spread(spark, wide).rdd.getNumPartitions == p + 2)
  }

  test("q01 plan: filter pushdown and column pruning survive the spread exchange") {
    val plan = Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate predicate not pushed to parquet:\n$plan")
    // pruned read schema: the 16-column table scans only the 7 used columns
    assert(!plan.contains("l_comment") && !plan.contains("l_partkey"),
      s"unused columns not pruned from the scan:\n$plan")
  }

  test("sorted_intersect_count: interpreted == codegen == builtin set ops") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L, 6L, 9L)), // 3 common
      (Seq(1L, 2L), Seq(3L, 4L)),                      // disjoint
      (Seq.empty[Long], Seq(1L, 2L)),                  // empty side
      (Seq(7L), Seq(7L)))                              // identical singletons
      .toDF("a", "b")
    val c = SortedIntersectCount.sortedIntersectCount(col("a"), col("b"))
    val expected = size(array_intersect(col("a"), col("b")))
    // codegen path (whole-stage) and interpreted path (after a barrier that
    // forces eval) must both match the builtin
    val got = df.select(c.as("n"), expected.as("e")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    assert(got.map(_.getInt(0)).toSeq == Seq(3, 0, 0, 1))
    // null input → null out (BinaryExpression null-safety)
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(c).collect()(0).isNullAt(0))
  }

  test("sorted_intersect_count rejects non-long-array inputs at analysis") {
    val bad = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(SortedIntersectCount.sortedIntersectCount(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("sorted_intersect_count") ||
      e.getMessage.contains("DATATYPE_MISMATCH") || e.getMessage.contains("array<bigint>"),
      s"unexpected analysis error: ${e.getMessage}")
  }
}

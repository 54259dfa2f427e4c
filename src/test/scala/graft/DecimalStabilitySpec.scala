package graft

import java.nio.file.Files

import graft.analytics.Tables
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Partitioning-independence of every money-sum / average query: rewrite the
 * fixture tables into a deliberately different physical layout (7-way
 * round-robin repartition → different file count, different scan order,
 * different summation association) and assert the collected results are
 * IDENTICAL to the single-file layout's. Double summation is
 * order-dependent at ~1e-10 relative — with thousands of groups that lands
 * on a cent-rounding boundary often enough to flip a hash between runs;
 * the DECIMAL(18,6)-summation treatment (Relational.decSum/decAvg) makes
 * the rounded values exact and therefore layout-stable, which is what a
 * 1000-executor cluster (whose scan order is never deterministic) needs.
 */
class DecimalStabilitySpec extends AnyFunSuite with SparkSuite {

  private val src = "/root/testdata/sf0.001"

  private lazy val shuffledDir: String = {
    val dir = TempDirs.tempDir("graft_repart").toString
    Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .repartition(7)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events: TIMESTAMP(NANOS) source — round-trip through Tables.events
    // (nanos → micros), after which the copy is plain TIMESTAMP
    Tables.events(spark, src)
      .repartition(7)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Every oracle-hashed query whose output contains a rounded double sum
    * or average (the full list from the round-3 audit plus q72's original). */
  private val moneyQueries = Seq(
    "q01_pricing_summary", "q02_revenue_band", "q03_segment_revenue",
    "q05_nation_revenue", "q06_region_customers", "q10_running_total",
    "q13_cube_orders", "q19_having_big_customers", "q20_conditional_agg",
    "q22_monthly_orders", "q24_hourly_events", "q25_sessionize",
    "q47_pivot", "q50_trailing_spend", "q53_sliding_windows",
    "q67_interval_join", "q72_trade_flows")

  private def canonical(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("money-sum queries are identical across physical layouts") {
    moneyQueries.foreach { name =>
      val base = canonical(SparkEntry.queries(name)(spark, src).collect())
      val repart = canonical(SparkEntry.queries(name)(spark, shuffledDir).collect())
      assert(base.nonEmpty, s"$name: empty result")
      assert(base == repart, s"$name: result differs between layouts")
    }
  }
}

package graft

import graft.analytics.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Gate for q98's size-probed cleanse plan: the broadcast (binary-search
 * SortedContains) path and the anti-join degrade path must be
 * row-identical on every corpus shape, because the probe picks between
 * them at runtime and the oracle hash must not depend on the choice.
 * The hostile fixture is the boilerplate-heavy shape the degrade path
 * exists for: every document shares half its spans with the whole corpus.
 */
class BoilerplateDegradeSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).sorted.toSeq

  /** Every doc: 4 spans (8 words at spanWords=2), 2 shared chrome spans +
    * 2 unique spans — 50% boilerplate by construction. */
  private def boilerHeavy(nDocs: Int): DataFrame =
    (0 until nDocs).map { i =>
      (i.toLong, s"nav bar legal footer u${i}a u${i}b u${i}c u${i}d")
    }.toDF("doc_id", "text")

  private val shapes: Seq[(String, DataFrame)] = Seq(
    "50%-shared-span hostile corpus" -> boilerHeavy(300),
    "mixed corpus with null/empty text and all-dropped docs" -> Seq(
      (1L, "x y a b x y"), (2L, "x y c d"), (3L, "x y"),
      (4L, null: String), (5L, ""), (6L, "p q r s")
    ).toDF("doc_id", "text"))

  for ((name, docs) <- shapes) {
    test(s"degrade ≡ broadcast: $name") {
      val bc = TextStats.boilerplateRemovalOf(docs, 2, 2,
        maxBroadcastSpans = Long.MaxValue)
      val dg = TextStats.boilerplateRemovalOf(docs, 2, 2,
        maxBroadcastSpans = 0L)
      assert(rows(bc) == rows(dg))
    }
  }

  test("degrade path shuffles span rows, never a broadcast of the set") {
    val plan = TextStats.boilerplateRemovalOf(boilerHeavy(50), 2, 2,
      maxBroadcastSpans = 0L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "forced degrade must not cross-join a broadcast set")
  }

  test("probe picks broadcast for small sets (plan unchanged for the gate)") {
    val plan = TextStats.boilerplateRemovalOf(boilerHeavy(50), 2, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
  }

  /** Chained-chrome corpus: doc i shares its `c{i}` span with doc i+1, so
    * the drop set grows LINEARLY with the corpus (the shape that outgrows
    * a broadcast) and 50% of every doc's non-unique spans are boilerplate. */
  private def chainedChrome(n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      format_string("c%sa c%sb c%sa c%sb u%sa u%sb u%sc u%sd",
        col("id"), col("id"), col("id") - 1, col("id") - 1,
        col("id"), col("id"), col("id"), col("id")).as("text"))

  test("10x soak: degrade path wall grows ≲ linearly on the linear-drop-set shape") {
    def run(n: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = TextStats.boilerplateRemovalOf(chainedChrome(n), 2, 2,
          maxBroadcastSpans = 0L)
        .agg(sum(col("n_dropped")).as("nd"), count(col("cleaned_hash")).as("nh"))
        .collect().head
      ((System.nanoTime() - t0) / 1e9, r.getLong(0))
    }
    def minOf2(n: Long): (Double, Long) = {
      val a = run(n); val b = run(n)
      (math.min(a._1, b._1), a._2)
    }
    val (t1, d1) = minOf2(20000L)
    val (t10, d10) = minOf2(200000L)
    assert(d1 == 2L * 20000 - 2, s"hand-derived drop count at n=20k: $d1")
    assert(d10 == 2L * 200000 - 2, s"hand-derived drop count at n=200k: $d10")
    info(f"q98 degrade soak: 20k docs ${t1}%.2f s, 200k docs ${t10}%.2f s, x${t10 / t1}%.1f")
    // the wall-clock ratio is advisory on shared/loaded hardware (round-10
    // ADVICE: an in-test timing ratio fails without any code regression) —
    // it HARD-fails only when soak timing is explicitly requested
    if (sys.env.contains("SPARK_GRAFT_SOAK_TIMING"))
      assert(t10 / t1 <= 6.0,
        f"10x data must cost ≲ linear wall (got x${t10 / t1}%.1f)")
    else if (t10 / t1 > 6.0)
      info(f"advisory: wall ratio x${t10 / t1}%.1f exceeded 6.0 on this host " +
        "(not asserted; set SPARK_GRAFT_SOAK_TIMING to enforce)")
  }
}

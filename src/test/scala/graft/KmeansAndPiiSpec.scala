package graft

import graft.analytics.{Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q82 (PII redaction) and q83 (Lloyd k-means cells): planted-marker
  * recall, redaction completeness, assignment determinism, and the
  * broadcast shape of the scoring join. */
class KmeansAndPiiSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("q82: every planted marker is detected and redaction removes all matches") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val expectedEmails = docs.filter(col("doc_id") % 7 === 0).count()
    val expectedIps = docs.filter(col("doc_id") % 11 === 0).count()
    val profile = TextStats.piiRedactionProfile(spark, d)
    val totals = profile.agg(
      sum(col("n_email")).as("e"), sum(col("n_ip")).as("i"),
      sum(col("chars_removed")).as("c")).head()
    assert(totals.getLong(0) == expectedEmails, "email recall != planted count")
    assert(totals.getLong(1) == expectedIps, "ip recall != planted count")
    assert(totals.getLong(2) > 0, "redaction removed no characters")
  }

  test("q83: cells partition the corpus, assignments are repartition-stable") {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val cells = Similarity.kmeansCells(emb, k = 8, iters = 2).cache()
    assert(cells.count() == emb.count(), "k-means dropped or duplicated vectors")
    assert(cells.select("cell").distinct().count() <= 8)
    // iteration must actually move assignments off the vec_id % k init
    val moved = cells.filter(col("cell") =!= pmod(col("vec_id"), lit(8L))).count()
    assert(moved > 0, "two Lloyd iterations changed nothing — suspicious init/assign wiring")
    // decimal-summed centroids + rounded argmax keys: a different input
    // partitioning must produce identical assignments
    val re = Similarity.kmeansCells(emb.repartition(7), k = 8, iters = 2)
    assert(cells.select("vec_id", "cell").exceptAll(re.select("vec_id", "cell")).isEmpty,
      "k-means assignment depends on input partitioning")
    cells.unpersist()
  }

  test("q83 plan: centroid scoring joins via broadcast, not a shuffled cartesian") {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val plan = Similarity.kmeansCells(emb, k = 8, iters = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast centroid join in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "corpus x centroids fell back to a shuffled cartesian")
  }
}

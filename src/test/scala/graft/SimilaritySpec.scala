package graft

import graft.analytics.{Similarity, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-heap top-k must reproduce the window top-k exactly (same
  * tie-break), and IVF recall behaves like IVF (subset of brute force when
  * probing all cells). */
class SimilaritySpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("bounded-heap top-k == window row_number top-k, bitwise") {
    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = corpus.join(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosineNative(col("q_emb"), col("c_emb")))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val viaWindow = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rn"))
      .orderBy("query_id", "rn").collect().toSeq

    val viaHeap = Similarity.bruteForceTopK(spark, d, k = 5)
      .orderBy("query_id", "rn").collect().toSeq

    assert(viaHeap == viaWindow)
  }

  test("ivf with all cells probed returns the brute-force result") {
    val nCells = 1 << 3 // hyperplane cells: 2^nplanes
    val brute = Similarity.bruteForceTopK(spark, d, k = 3)
      .orderBy("query_id", "rn").collect().toSeq
    val ivfAll = Similarity.ivfTopK(spark, d, k = 3, nprobe = nCells)
      .orderBy("query_id", "rn").collect().toSeq
    assert(ivfAll == brute)
  }

  test("q110 recall audit: probing every cell scores recall 1.0 per query") {
    val out = Similarity.ivfRecallStats(spark, d, k = 3, nprobe = 1 << 3)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(2) == 1.0),
      "nprobe = ncells makes IVF exact, so recall must be 1.0 for every query")
  }

  test("q108 isotropy: hand-computed centroid cosines; zero vector keeps norm, drops cosine") {
    import spark.implicits._
    // centroid of {[1,0],[0,1],[0,0]} = [1/3,1/3] ∝ [1,1]: both unit axis
    // vectors score cos = 1/sqrt(2); the zero vector's cosine is
    // undefined (NULL) but its norm 0 still counts in label 0's mean
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0f, 1f), 1),
      (2L, Array(0f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.isotropyStatsOf(emb)
      .orderBy("label")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0, 2L, 0.707107, 0.5),
      (1, 1L, 0.707107, 1.0)))
  }
}

package graft

import graft.analytics.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator gates. */
class Round9OpsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).sorted.toSeq

  test("q99 vocab cap: capped ≡ uncapped when the vocabulary fits the cap") {
    val docs = graft.analytics.Tables.documents(spark, d)
    assert(rows(TextStats.perplexityBucketsOf(docs)) ==
      rows(TextStats.perplexityBucketsOf(docs, vocabCap = Int.MaxValue)))
  }

  test("q99 vocab cap: out-of-vocabulary grams fall to the smoothing floor") {
    // cap=1 on "a a a b a": uni keeps a(cu=4), V=1; bi keeps "a a"(cb=2).
    // terms: aa -log10(3/5)=0.221849 (x2), ab (cb->0) -log10(1/5)=0.698970,
    // ba (w1 b uncapped -> cu->0) -log10(1/1)=0. score = 1.142668/4
    val docs = Seq((1L, "en", "a a a b a")).toDF("doc_id", "lang", "text")
    val out = TextStats.perplexityBucketsOf(docs, vocabCap = 1)
      .as[(String, String, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out == Seq(("en", "head", 1L, 5L, Some(0.285667), Some(0.285667))))
  }

  test("PQ family degrades to empty results on a degenerate corpus (no crash)") {
    import graft.analytics.Similarity
    val empty = Seq.empty[(Long, Array[Float], String)]
      .toDF("vec_id", "embedding", "label")
    val allNull = Seq((1L, null: Array[Float], "a"), (2L, null: Array[Float], "b"))
      .toDF("vec_id", "embedding", "label")
    for (emb <- Seq(empty, allNull)) {
      assert(Similarity.pqStatsOf(emb, 2, 2, 1).count() == 0)
      assert(Similarity.pqAdcTopKOf(emb, 2, 2, 1, 3, 1L).count() == 0)
      assert(Similarity.pqRecallStatsOf(emb, 2, 2, 1, 3, 1L).count() == 0)
    }
  }

  test("q99 vocab cap: model broadcast stays bounded and the plan keeps the broadcast joins") {
    val plan = TextStats.perplexityBucketsOf(
        graft.analytics.Tables.documents(spark, d), vocabCap = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "capped LM tables must still reach the scoring scan via broadcast")
  }
}

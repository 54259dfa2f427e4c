package graft

import graft.analytics.{Dedup, Quantization, Tables, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the round-3 analytics ops (q75-q77): char-shingle
  * extraction, token rarity accounting, and int8 embedding quantization. */
class AnalyticsOpsSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("charShingles: sliding 1-based n-grams, deduped; short text truncates") {
    import spark.implicits._
    val out = Seq("abcdef", "abc", "aaaaaa")
      .toDF("text")
      .select(Dedup.charShingles(col("text"), 5).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("abcde", "bcdef")) // positions 1..len-4
    assert(out(1) == Seq("abc")) // shorter than n → one truncated shingle
    assert(out(2) == Seq("aaaaa")) // dedup collapses identical shingles
  }

  test("q75 char-ngram jaccard: symmetric bound, self-similarity, threshold") {
    val pairs = Dedup.charNgramJaccardPairs(spark, d).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b, "pair not canonically ordered")
      assert(j >= 0.2 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("q76 token rarity: df accounting is exact on a hand-built corpus") {
    import spark.implicits._
    // corpus: "x" appears in 3 docs, "y" in 2, "z" in 1 (rare at factor 4)
    val docs = Seq(
      (0L, "x y z"), (1L, "x y"), (2L, "x x")) // dup x in doc 2 counts once
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")))
    val tmp = TempDirs.tempDir("rarity").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextStats.tokenRarity(spark, tmp)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Long)].collect()
    // df: x=3, y=2, z=1; n_docs=3, rare ⇔ df*4 < 3 ⇔ never → relax: z has df 1
    // rareFactor=4: 1*4 < 3 is false → n_rare all 0 with only 3 docs
    assert(out(0) == ((0L, 3L, 6L, 2.0, 0L))) // x+y+z: 3+2+1
    assert(out(1) == ((1L, 2L, 5L, 2.5, 0L))) // x+y: 3+2
    assert(out(2) == ((2L, 1L, 3L, 3.0, 0L))) // x once (distinct)
  }

  test("q76 plan: vocabulary (unbounded-cardinality) side is never broadcast") {
    val plan = TextStats.tokenRarity(spark, d).queryExecution.executedPlan.toString
    // the 1-row corpus count is the ONLY broadcast; the df-table join on
    // `tok` must be a shuffle join — at 100 TB the vocabulary is
    // corpus-sized and a broadcast of it is a driver OOM
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts == 1, s"expected only the 1-row count broadcast, plan:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"df-table join is not a shuffle join:\n$plan")
  }

  test("q77 quantization: codes bounded, per-element error ≤ half a bucket") {
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos"), col("x").cast("double").as("x"))
    // widest per-dimension bucket = (mx-mn)/256; mid-rise dequantization
    // error is ≤ step/2 per element
    val maxStep = e.groupBy(col("pos"))
      .agg(((max(col("x")) - min(col("x"))) / 256.0).as("step"))
      .agg(max(col("step"))).collect()(0).getDouble(0)
    val stats = Quantization.int8QuantStats(spark, d).collect()
    assert(stats.length == Tables.embeddings(spark, d).count())
    stats.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) <= 255, "code out of uint8 range")
      assert(r.getDouble(5) <= maxStep / 2 + 1e-9,
        s"max_abs_err ${r.getDouble(5)} exceeds half-bucket ${maxStep / 2}")
    }
  }
}

package graft

import graft.analytics.{Relational, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators: the full iterated BPE training loop (q97) and the
  * oracle-hashable sketch gates (q46/q63 — bound flags, see
  * SketchBoundsSpec for the gate-flag run). */
class Round8OpsSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("q97 BPE training: hand-computed merges on a tiny corpus") {
    import spark.implicits._
    // corpus: "abab" x3, "abc" x2  (single words per doc)
    //   word table: abab->3, abc->2
    //   it1 pairs: (a,b): 2*3+2 = 8 ; (b,a): 3 ; (b,c): 2  -> merge (a,b)
    //     rewrite: abab -> [ab,ab], abc -> [ab,c]
    //   it2 pairs: (ab,ab): 3 ; (ab,c): 2                  -> merge (ab,ab)
    //     rewrite: abab -> [abab], abc -> [ab,c]
    //   it3 pairs: (ab,c): 2                               -> merge (ab,c)
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc")).toDF("text")
    val out = TextStats.bpeTrainOf(docs, nMerges = 3, vocabCap = 100)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "a", "b", "ab", 8L),
      (2, "ab", "ab", "abab", 3L),
      (3, "ab", "c", "abc", 2L)))
  }

  test("q97 BPE training: greedy even-offset merges inside runs (the (a,a) overlap case)") {
    import spark.implicits._
    // "aaaa": it1 pairs (a,a)x3 -> merge (a,a) greedily: [aa,aa]
    //   it2: (aa,aa)x1 -> merge -> [aaaa]; exhausted after (no pairs left)
    val docs = Seq("aaaa").toDF("text")
    val out = TextStats.bpeTrainOf(docs, nMerges = 5, vocabCap = 100)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L)))
  }

  test("q97 BPE training: code-point symbols (multibyte parity with the oracle)") {
    import spark.implicits._
    // U+1F600 is non-BMP: two UTF-16 units, ONE code point — a UTF-16
    // split would produce surrogate halves and diverge from SQL semantics
    val smile = new String(Character.toChars(0x1F600))
    val docs = Seq(s"$smile$smile$smile").toDF("text")
    val out = TextStats.bpeTrainOf(docs, nMerges = 1, vocabCap = 100)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq((1, smile, smile, smile + smile, 2L)))
  }

  test("q97's first merge equals q95's top pair on the shared corpus") {
    import spark.implicits._
    val top = TextStats.bpePairCounts(spark, d, topK = 1)
      .as[(String, Long)].collect().head
    val first = TextStats.bpeTrain(spark, d, nMerges = 1)
      .select(col("merged"), col("n_occurrences"))
      .as[(String, Long)].collect().head
    assert(first == top)
  }

  test("q46/q63 production sketch forms stay sketch-only (no exact-distinct / rank-join pass)") {
    // the gate queries pay a verification cost by design; the production
    // forms must not — no Expand (count distinct) in approxDistinct's plan,
    // and percentileApprox stays a single aggregate over one scan
    val p46 = Relational.approxDistinct(spark, d).queryExecution.executedPlan.toString
    assert(!p46.contains("Expand"), "approxDistinct must not pay the exact-distinct expand")
    val p63 = Relational.percentileApprox(spark, d).queryExecution.executedPlan.toString
    assert(!p63.contains("Join"), "percentileApprox must stay a single-scan aggregate")
  }
}

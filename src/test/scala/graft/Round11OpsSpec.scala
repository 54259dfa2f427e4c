package graft

import graft.analytics.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operator gates. */
class Round11OpsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("q129: first occurrence survives, within-doc repeats drop, reassembly ordered") {
    // spanWords = 2 for readable planted spans. Doc 1 repeats "a b" twice
    // (within-doc dup), doc 2 repeats doc 1's spans (cross-doc dup) plus
    // its own unique tail, doc 3 is untouched, doc 4 is the hostile
    // empty-text shape.
    val docs = Seq(
      (1L, "a b c d a b"),
      (2L, "c d e f"),
      (3L, "g h"),
      (4L, "")).toDF("doc_id", "text")
    val rows = TextStats.paragraphDedupOf(docs, spanWords = 2)
      .select("doc_id", "n_paragraphs", "n_dropped", "kept_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: spans [a b][c d][a b] -> third drops (first "a b" survives)
    assert(rows(1L) == ((3L, 1L, 4L)))
    // doc 2: [c d] lost to doc 1's pos 1, [e f] unique
    assert(rows(2L) == ((2L, 1L, 2L)))
    assert(rows(3L) == ((1L, 0L, 2L)))
    // empty text: one empty span, globally unique here, 0 kept tokens
    assert(rows(4L) == ((1L, 0L, 0L)))
    // reassembly hash pins order: doc 1 cleaned text is "a b c d"
    val h = TextStats.paragraphDedupOf(docs, spanWords = 2)
      .filter(col("doc_id") === 1L).select("cleaned_hash").as[Long].head()
    val expect = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("a b c d".getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(h == expect, "cleaned_hash must pin the reassembled 'a b c d'")
  }

  test("q129 plan: hash-keyed equi-joins only, no cartesian, span text never shuffles") {
    val plan = TextStats.paragraphDedup(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "paragraph dedup must stay equi-join shaped")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "paragraph dedup must not degrade to a nested-loop join")
  }
}

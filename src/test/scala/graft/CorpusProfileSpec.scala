package graft

import graft.analytics.{Sampling, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q103 source caps, q104 encoding quality, q105 Zipf/diversity:
  * hand-computed fixtures + the plan shapes the scale posture rests on. */
class CorpusProfileSpec extends AnyFunSuite with SparkSuite {

  test("q103 source caps: over-cap source ranked by md5 lottery, under-cap passes whole") {
    import spark.implicits._
    // srcA has 4 docs, cap 2 -> keep the 2 lowest md5(doc_id); srcB has 1.
    val docs = Seq(
      (1L, "srcA", 10L), (2L, "srcA", 20L), (3L, "srcA", 30L), (4L, "srcA", 40L),
      (5L, "srcB", 50L)).toDF("doc_id", "source", "n_chars")
    val out = Sampling.sourceCapStatsOf(docs, cap = 2)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // replicate the lottery: md5 of the decimal string of doc_id
    val kept = Seq(1L, 2L, 3L, 4L)
      .sortBy(id => org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString))
      .take(2).toSet
    val keptChars = kept.toSeq.map(_ * 10).sum
    assert(out == Seq(
      ("srcA", 4L, 2L, 2L, keptChars, kept.sum),
      ("srcB", 1L, 1L, 0L, 50L, 5L)))
  }

  test("q103 source caps: NULL source still caps (null-safe count join)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option.empty[String], 1L), (2L, None, 1L), (3L, None, 1L))
      .toDF("doc_id", "source", "n_chars")
    val out = Sampling.sourceCapStatsOf(docs, cap = 1)
      .as[(Option[String], Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 1)
    val (src, n, kept, dropped, _, _) = out.head
    assert(src.isEmpty && n == 3L && kept == 1L && dropped == 2L)
  }

  test("q103 plan: under-cap path has no window sort; counts join broadcasts") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"s${i % 10}", i)).toDF("doc_id", "source", "n_chars")
    val plan = Sampling.sourceCapStatsOf(docs, cap = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "per-source counts must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q104 encoding quality: control/replacement/non-ascii/ws-run counting") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "plain ascii text"),
      ("s1", "bad\u0001\u0002 \uFFFD\uFFFD caf\u00e9"), // 2 ctrl, 2 repl, é
      ("s1", "a  b   c"),                                  // 2 ws runs
      ("s2", null.asInstanceOf[String]),
      ("s2", "\uD83D\uDE00")             // non-BMP emoji U+1F600 = 1 code point
    ).toDF("source", "text")
    val out = TextStats.encodingQualityOf(docs)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("s1", 3L, 0L, 2L, 2L, 3L, 2L),  // non_ascii: é + the 2 U+FFFD
      ("s2", 2L, 1L, 0L, 0L, 1L, 0L)))
  }

  test("q105 Zipf fit: exact slope on a constructed power law, NULL on degenerate fit") {
    import spark.implicits._
    // srcA: freqs 4,2,1 for tokens a,b,c -> points (log 1, log 4),
    // (log 2, log 2), (log 3, log 1). srcB: one token type -> denom 0 -> NULL.
    val docs = Seq(
      ("srcA", "a a a a b b c"),
      ("srcB", "only only")).toDF("source", "text")
    val out = TextStats.zipfDiversityOf(docs, topN = 100)
      .orderBy("source")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    val xs = Seq(1.0, 2.0, 3.0).map(math.log10)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log10)
    def r12(v: Double) = BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (x, y) = (xs.map(r12), ys.map(r12))
    val (n, sx, sy) = (3.0, x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val slope = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      ("srcA", 7L, 3L, 0.428571, Some(slope)),
      ("srcB", 2L, 1L, 0.5, None)))
  }

  test("q105: null text contributes no tokens; token split survives multibyte") {
    import spark.implicits._
    val docs = Seq(
      ("s", "caf\u00e9 caf\u00e9 \uD83D\uDE00"),
      ("s", null.asInstanceOf[String])).toDF("source", "text")
    val out = TextStats.zipfDiversityOf(docs, topN = 100)
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq(("s", 3L, 2L)))
  }
}

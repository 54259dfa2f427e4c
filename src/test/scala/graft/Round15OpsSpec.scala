package graft

import graft.analytics.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operator: DoReMi-lite domain reweighting (q157).
  * Value-exactness against DuckDB is the driver oracle's job; these pin
  * the mixture semantics on planted domains the big corpus can't
  * isolate. */
class Round15OpsSpec extends AnyFunSuite with SparkSuite {

  /** Two domains over a shared vocabulary: `easy` repeats the corpus's
    * dominant bigram, `hard` is mostly bigrams that appear only once in
    * the corpus, so hard's mean NLL under the general model is strictly
    * higher and the multiplicative-weights update must upweight it. */
  test("q157: the harder domain gets the larger mixture weight; weights normalize") {
    import spark.implicits._
    val easy = (1L to 8L).map(i => (i, "easy", "the cat sat on the mat"))
    val hard = (101L to 104L).map(i =>
      (i, "hard", s"zeta$i omega$i theta$i kappa$i"))
    val out = TextStats.domainReweightOf(
      (easy ++ hard).toDF("doc_id", "source", "text"),
      vocabCap = 1024, rounds = 3, eta = 1.0)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val e = out("easy"); val h = out("hard")
    assert(e._2 == 8L && h._2 == 4L)
    assert(e._3 == 8L * 5 && h._3 == 4L * 3, s"bigram counts: $e $h")
    assert(h._4.get > e._4.get,
      s"hard domain must have higher NLL (got hard=${h._4} easy=${e._4})")
    assert(h._5.get > e._5.get,
      s"mirror descent must upweight the hard domain (got $out)")
    val sum = out.values.flatMap(_._5).sum
    assert(math.abs(sum - 1.0) < 1e-5, s"weights must normalize (sum=$sum)")
  }

  test("q157: single active domain takes weight 1; no-bigram and NULL sources handled") {
    import spark.implicits._
    val docs = Seq(
      (1L, "solo", "alpha beta gamma alpha beta"),
      (2L, "solo", "alpha beta alpha"),
      // one-word and NULL texts carry no bigrams: NULL nll, NULL weight
      (3L, "short", "single"),
      (4L, "short", null.asInstanceOf[String]),
      // NULL source is its own domain and participates in the mixture
      (5L, null.asInstanceOf[String], "alpha beta gamma"))
      .toDF("doc_id", "source", "text")
    val rows = TextStats.domainReweightOf(docs, 1024, rounds = 2, eta = 1.0)
      .collect().map(r => (Option(r.getString(0)),
        r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .map(t => t._1 -> t).toMap
    assert(rows(Some("short"))._3.isEmpty && rows(Some("short"))._4.isEmpty,
      "a domain with no bigrams must have NULL nll and NULL weight")
    assert(rows(None)._4.nonEmpty, "the NULL-source domain must be weighted")
    val active = Seq(rows(Some("solo")), rows(None))
    val sum = active.flatMap(_._4).sum
    assert(math.abs(sum - 1.0) < 1e-5, s"active weights must normalize ($active)")
    assert(rows(Some("short"))._2 == 2L)
  }

  test("q157: plan scores through broadcast hash joins; no cartesian product") {
    val plan = TextStats.domainReweight(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product may appear:\n$plan")
  }
}

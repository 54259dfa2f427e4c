package graft

import graft.analytics.{Dedup, Relational, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Machine-checked properties for the approximate/probabilistic queries that
 * cannot be driver-oracle'd by value (q32 LSH pairs, q37 IVF ANN, q46 HLL,
 * q63 approx percentiles): planted-duplicate recall, value-exactness vs an
 * independent recomputation, recall@k vs the exact path, and error bounds
 * vs the exact aggregates.
 */
class SketchBoundsSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("q32 minhash: every planted near-duplicate pair is found, no cross-pair noise") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 5 planted pairs: 120-word doc + a copy with the last 4 words changed
    // (3-gram Jaccard ≈ 0.9) + 20 unrelated docs over disjoint vocabularies
    def doc(vocab: String, n: Int): String =
      Seq.fill(n)(s"$vocab${rnd.nextInt(50)}").mkString(" ")
    val planted = (0 until 5).flatMap { p =>
      val base = doc(s"v${p}_", 120)
      val near = base.split(" ").dropRight(4).mkString(" ") + s" x1$p x2$p x3$p x4$p"
      Seq((p * 2L, base), (p * 2L + 1, near))
    }
    val noise = (0 until 20).map(i => (100L + i, doc(s"z${i}_", 120)))
    val docs = (planted ++ noise).toDF("doc_id", "text")

    val found = Dedup.minhashPairsFor(docs, numPerm = 16, bands = 4, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 5).map(p => (p * 2L, p * 2L + 1)).toSet
    assert(expected.subsetOf(found), s"missed planted pairs: ${expected -- found}")
    assert(found.forall { case (a, b) => a / 2 == b / 2 && a < 100 && b < 100 },
      s"false pairs across unrelated docs: ${found.filterNot { case (a, b) => a / 2 == b / 2 }}")
  }

  test("q32 minhash on the fixture: emitted jaccard values match an independent recomputation") {
    import spark.implicits._
    val emitted = Dedup.minhashPairs(spark, d)
      .as[(Long, Long, Double)].collect()
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // plain-Scala reimplementation (no Spark expressions involved)
    def wordSet(t: String): Set[String] = t.trim.split("\\s+").toSet
    emitted.foreach { case (a, b, j) =>
      assert(a < b)
      val (wa, wb) = (wordSet(texts(a)), wordSet(texts(b)))
      val exact = wa.intersect(wb).size.toDouble / wa.union(wb).size
      assert(exact >= 0.5, s"pair ($a,$b) below threshold: $exact")
      assert(math.abs(j - exact) < 1e-6, s"pair ($a,$b): emitted $j, recomputed $exact")
    }
    assert(emitted.map { case (a, b, _) => (a, b) }.distinct.length == emitted.length)
  }

  test("q74 label propagation finds exact connected components, incl. long chains") {
    import spark.implicits._
    // components: {1,2,3} (fork), {10,11}, {20..25} (chain of diameter 5 —
    // forces multiple propagation rounds)
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L, 25L -> 20L))

    // empty pair graph → empty clusters, not a crash
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.duplicateClusters(none).count() == 0)
  }

  test("q58 banded near-dup: no cartesian / nested-loop join in the physical plan") {
    val plan = Dedup.embeddingNearDups(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan contains a nested-loop join")
  }

  test("q37 IVF ANN: recall@5 >= 0.6 vs the exact brute-force top-k") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(spark, d))
    val approx = pairs(Similarity.ivfTopK(spark, d))
    assert(exact.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall@5 = $recall")
  }

  test("q46 HLL: approx distinct within 10% of exact per group") {
    import spark.implicits._
    val approx = Relational.approxDistinct(spark, d)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = graft.analytics.Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, ex) =>
      val rel = math.abs(approx(flag) - ex).toDouble / ex
      assert(rel <= 0.10, s"group $flag: approx ${approx(flag)} vs exact $ex (rel $rel)")
    }
  }

  test("q63 approx percentiles within 1% of the exact q45 values") {
    import spark.implicits._
    val exact = Relational.q45Percentiles(spark, d)
      .as[(String, Double, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Relational.percentileApprox(spark, d)
      .as[(String, Double, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      for ((ev, av) <- Seq(e._2 -> a._2, e._3 -> a._3, e._4 -> a._4, e._5 -> a._5)) {
        assert(math.abs(av - ev) / math.max(math.abs(ev), 1e-9) <= 0.01,
          s"group $flag: approx $av vs exact $ev")
      }
      assert(a._6 == e._6) // same row counts
    }
  }

  test("q46/q63 gate queries: every sketch-bound flag is true (oracle-hashable shape)") {
    import spark.implicits._
    val d46 = Relational.q46ApproxDistinct(spark, d)
      .select("l_returnflag", "bound_ok").as[(String, Boolean)].collect()
    assert(d46.nonEmpty && d46.forall(_._2), s"q46 bound violated: ${d46.toSeq}")
    val d63 = Relational.q63PercentileApprox(spark, d)
      .select("l_returnflag", "p25_ok", "p50_ok", "p75_ok", "qty_ok")
      .as[(String, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(d63.nonEmpty && d63.forall(r => r._2 && r._3 && r._4 && r._5),
      s"q63 rank guarantee violated: ${d63.toSeq}")
  }

  test("q111 minhash calibration: identical texts estimate 1.0; errors stay in the estimator band") {
    import spark.implicits._
    import graft.analytics.Dedup
    // two identical docs and one unrelated: the identical pair must band
    // together with a FULL signature match; the unrelated doc must not
    // reach the candidate set at all
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val out = Dedup.minhashCalibrationFor(docs, numPerm = 16, bands = 4)
      .as[(Long, Long, Int, Double, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 16, 1.0, 1.0, 0.0)))

    // fixture-wide: the numPerm=16 estimator's error on banded candidates
    // stays within 3 standard deviations of the binomial bound (~0.125
    // per component at 1/sqrt(16)); anything larger means the estimate
    // and exact computations drifted apart
    val cal = Dedup.minhashCalibration(spark, "/root/testdata/sf0.001")
      .agg(org.apache.spark.sql.functions.max("abs_err")).head().getDouble(0)
    assert(cal <= 3 * 0.125, s"calibration error $cal outside the estimator band")
  }
}

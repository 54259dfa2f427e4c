package graft

import graft.analytics.{Dedup, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operators: DoReMi-lite domain reweighting (q157), containment
  * near-dup pairs (q158), soft-dedup reweighting (q159).
  * Value-exactness against DuckDB is the driver oracle's job; these pin
  * the semantics on planted examples the big corpus can't isolate. */
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

  /** Doc 2 is a quoted 4-word span of the 20-word doc 1: its 2 shingles
    * all appear among doc 1's 18, so containment is 1.0 but Jaccard is
    * 2/18 — far below every symmetric gate — and the pair must surface
    * with jaccard_missed = true. Doc 3 shares nothing: no pair. */
  test("q158: a quoted subset document is found at containment 1.0, tiny Jaccard") {
    import spark.implicits._
    val long = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, long),
      (2L, "tok1 tok2 tok3 tok4"),
      (3L, "zeta omega theta kappa")).toDF("doc_id", "text")
    val rows = Dedup.containmentPairsFor(docs, pct = 80)
      .as[(Long, Long, Long, Long, Long, Double, Double, Boolean)]
      .collect()
    assert(rows.length == 1, s"exactly the subset pair: ${rows.toSeq}")
    val r = rows.head
    assert(r._1 == 1L && r._2 == 2L)
    assert(r._3 == 2L && r._4 == 18L && r._5 == 2L, s"shingle sets: $r")
    assert(r._6 == 1.0, s"containment: $r")
    assert(math.abs(r._7 - 2.0 / 18.0) < 1e-4, s"jaccard: $r")
    assert(r._8, s"this is exactly the pair Jaccard misses: $r")
  }

  /** The prefix filter must not lose a pair whose shared shingles are the
    * CORPUS-COMMON ones (worst case for rarest-first prefixes): B misses
    * exactly A's rarest shingles, so the match is found only because A's
    * prefix length ⌊(1−t)·|A|⌋+1 extends one past the misses. */
  test("q158: prefix filter keeps a pair that overlaps only on common shingles") {
    import spark.implicits._
    // A = 'rare' + c1..c9: its 'rare c1 c2' shingle is unique (df=1, A's
    // first prefix slot); every pure-c shingle appears in 6 docs. B drops
    // 'rare': the overlap is the 7 common shingles, containment 7/7 = 1.
    val fill = (1 to 4).map(i =>
      (100L + i, (1 to 9).map(j => s"c$j").mkString(" ")))
    val docs = (Seq(
      (1L, "rare " + (1 to 9).map(j => s"c$j").mkString(" ")),
      (2L, (1 to 9).map(j => s"c$j").mkString(" "))) ++ fill)
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairsFor(docs, pct = 80)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      s"the full-containment pair must survive the prefix filter: $pairs")
  }

  test("q158: plan is hash-join only — no cartesian, no broadcast nested loop") {
    val plan = Dedup.containmentPairs(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$plan")
  }

  /** Doc 2 embeds a verbatim 20-token span of doc 1 (a6..a25) between
    * fresh prefix/suffix tokens: one diagonal run of 13 shared 8-grams,
    * longest span exactly 20. Doc 3 shares two sub-8-token fragments
    * with doc 1 — no shared 8-gram at all — so exactly one pair must
    * survive the minSpan=12 gate. */
  test("q160: a quoted 20-token span is measured exactly; short fragments are below the gate") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"a$i")
    val doc1 = a.mkString(" ")
    val doc2 = ((1 to 5).map(i => s"b$i") ++ a.slice(5, 25) ++
      (1 to 5).map(i => s"c$i")).mkString(" ")
    val doc3 = (a.take(8) ++ (1 to 10).map(i => s"z$i") ++
      a.slice(19, 27)).mkString(" ")
    val rows = TextStats.longestSharedSpansOf(
      Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text"),
      k = 8, dfCap = 128, minSpan = 12)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 1, s"exactly the quoted pair: ${rows.toSeq}")
    val r = rows.head
    assert(r._1 == 1L && r._2 == 2L)
    assert(r._3 == 20L, s"longest span must be the exact quote length: $r")
    assert(r._4 == 1L && r._5 == 13L, s"one run of 13 aligned 8-grams: $r")
  }

  /** Five users share the (click-dominant, 4-15 events, hour-band 0)
    * profile — two of them with an error event, so the class is k=5,
    * l=2: releasable. A sixth error-dominant user is alone in its class
    * (k=1): risky. The dominant-type tiebreak and both risk branches are
    * pinned. */
  test("q161: equivalence classes carry exact k and l; both risk branches fire") {
    import spark.implicits._
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = (for {
      u <- 1 to 5
      e <- Seq.fill(4)("click") ++ Seq("view") ++
        (if (u >= 4) Seq("error") else Seq.empty)
    } yield (u.toLong, e, t(3, u))) ++
      Seq((6L, "error", t(13, 0)), (6L, "error", t(13, 5)))
    val out = graft.analytics.Relational.kAnonymityAuditOf(
      rows.toDF("user_id", "event_type", "ts"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2, r._3) -> r).toMap
    val safe = out(("click", "4-15", 0L))
    assert(safe._4 == 5L && safe._5 == 2L && !safe._6,
      s"the 5-user 2-value class is releasable: $safe")
    val risky = out(("error", "1-3", 2L))
    assert(risky._4 == 1L && risky._5 == 1L && risky._6,
      s"the singleton class is re-identifiable: $risky")
    assert(out.size == 2, s"exactly two classes: $out")
  }

  /** A zero-variance stratum earns NO allocation (Neyman weight N·S = 0)
    * while the spread stratum takes the whole budget, with the emitted
    * n_alloc itself capped at the stratum size (the allocation is always
    * feasible — the drawn set realizes it exactly); the stddev is pinned
    * to the closed form. */
  test("q162: allocation follows N·S — zero-variance stratum gets nothing") {
    import spark.implicits._
    val uniform = (1L to 10L).map(i => ("uniform", i, Seq.fill(5)("w").mkString(" ")))
    val spread = (1L to 10L).map(i =>
      ("spread", 100L + i, Seq.fill(i.toInt)("w").mkString(" ")))
    val out = graft.analytics.Sampling.neymanSampleOf(
      (uniform ++ spread).toDF("source", "doc_id", "text"), budget = 500L)
      .as[(String, Long, Double, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val u = out("uniform"); val sp = out("spread")
    assert(u._2 == 10L && u._3 == 0.0 && u._4 == 0L && u._5 == 0L && u._6 == 0L,
      s"zero-variance stratum must draw nothing: $u")
    // population stddev of 1..10 = sqrt(8.25) rounded to 6 dp
    assert(math.abs(sp._3 - 2.872281) < 1e-9, s"closed-form stddev: $sp")
    assert(sp._4 == 10L, s"allocation is capped at the stratum size: $sp")
    assert(sp._5 == 10L && sp._6 == 55L, s"draw realizes n_alloc exactly: $sp")
    assert(sp._7 == (101L to 110L).sum, s"checksum is the full stratum: $sp")
  }

  /** Planted cluster of 3 + a singleton in one source: weights 3·(1/3)
    * and 1·1 — eff_docs 2.0 of 4, mass_removed 0.5. The near-dup trio is
    * the same text, so the simhash graph must close it into one cluster. */
  test("q159: soft-dedup weights sum to one per cluster; singleton keeps weight 1") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("softdedup").toString
    Seq(
      (1L, base, "en", "web", base.length.toLong),
      (2L, base + " iota", "en", "web", base.length + 5L),
      (3L, base + " kappa", "en", "web", base.length + 6L),
      (4L, "utterly unrelated content nothing shared here at all", "en", "web", 52L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.clearSharedClusterEdges()
    try {
      val r = Dedup.softDedupWeights(spark, dir).collect()
      assert(r.length == 1)
      val row = r.head
      assert(row.getAs[Long]("n_docs") == 4L)
      assert(row.getAs[Long]("n_clustered") == 3L, s"trio clustered: $row")
      assert(math.abs(row.getAs[Double]("eff_docs") - 2.0) < 1e-6, s"$row")
      assert(math.abs(row.getAs[Double]("mass_removed") - 0.5) < 1e-6, s"$row")
      val effChars = row.getAs[Double]("eff_chars")
      val total = row.getAs[Long]("total_chars")
      assert(effChars < total, s"duplicated chars must be down-weighted: $row")
    } finally Dedup.clearSharedClusterEdges()
  }
}

package graft

import graft.analytics.{Sampling, Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 pipeline operators: q87 SemDeDup (within-cell semantic
  * near-dups over k-means cells), q88 Gopher quality rules, q89
  * temperature-weighted mixture sampling. Value-exactness is the DuckDB
  * oracle's job; these pin planted-fixture semantics, determinism, and
  * the plan shapes the 100 TB posture depends on. */
class Round6OpsSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q87

  private def embFixture() = {
    import spark.implicits._
    // vec 9 duplicates vec 1 exactly; everything else is axis-orthogonal
    // (cosine 0 across axes), so the ONLY pair at cosine >= 0.9 is (1, 9)
    def axis(i: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == i % 8) 1f else 0f)
    (Seq((1L, axis(1), 0), (9L, axis(1), 0)) ++
      (2L to 8L).map(i => (i, axis(i.toInt), 0)))
      .toDF("vec_id", "embedding", "label")
  }

  test("q87: an exact duplicate vector is dropped, keep-lowest, schedule-stable") {
    val out = Similarity.semdedupStatsOf(embFixture(), k = 2, iters = 1,
      threshold = 0.9)
    val total = out.agg(
      sum(col("n_members")), sum(col("n_dup_pairs")),
      sum(col("n_dropped")), sum(col("dropped_checksum"))).head()
    assert(total.getLong(0) == 9, "cells must partition the corpus")
    assert(total.getLong(1) == 1, s"expected exactly the planted pair, got $out")
    assert(total.getLong(2) == 1, "exactly one vector is a semantic dup")
    assert(total.getLong(3) == 9L, "keep-lowest must drop vec 9, not vec 1")
    val re = Similarity.semdedupStatsOf(embFixture().repartition(5), k = 2,
      iters = 1, threshold = 0.9)
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty,
      "semdedup output depends on input partitioning")
  }

  test("q87: sample-trained codebook still catches every exact duplicate") {
    // identical vectors have equal cosine to EVERY centroid and identical
    // tie-breaks, so co-assignment (and the dup pair) cannot depend on
    // which vectors trained the codebook
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val dup = emb.limit(0).unionByName( // vec (max+1) duplicates vec of min id
      emb.orderBy(col("vec_id")).limit(1)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          col("embedding"), col("label")))
    val corpus = emb.unionByName(dup)
    val out = Similarity.semdedupStatsOf(corpus, k = 4, iters = 2,
      threshold = 0.999999, trainSampleMod = 4)
    val total = out.agg(sum(col("n_members")), sum(col("n_dropped")),
      sum(col("dropped_checksum"))).head()
    assert(total.getLong(0) == corpus.count(), "assignment lost vectors")
    assert(total.getLong(1) >= 1, "planted exact duplicate not dropped")
  }

  test("q87 plan: pair generation equi-joins on cell, never a cartesian") {
    val plan = Similarity.semdedupStats(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"within-cell pair sweep fell back to a cartesian:\n$plan")
    // members tally: cells partition the fixture corpus
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val out = Similarity.semdedupStats(spark, d)
    assert(out.agg(sum(col("n_members"))).head().getLong(0) == emb.count())
  }

  // ---------------------------------------------------------------- q88

  test("q88: each rule fires on exactly its planted offender") {
    import spark.implicits._
    def w(n: Int, len: Int) = Seq.fill(n)("a" * len)
    val pass = ("the" +: w(24, 5)).mkString(" ")        // mean 4.92, stop .04
    val shortDoc = ("the" +: w(4, 5)).mkString(" ")      // 5 words
    val longWords = w(25, 7).mkString(" ")               // mean 7, stop 0
    val digits = ("the" +: Seq.fill(24)("a1b2c")).mkString(" ") // alpha .04
    val docs = Seq(
      ("s_pass", pass), ("s_words", shortDoc),
      ("s_longw", longWords), ("s_digit", digits)).toDF("source", "text")
    val out = TextStats.gopherQualityOf(docs, minWords = 20, maxWords = 90,
      minMeanLen = 4.0, maxMeanLen = 5.0, minStopFrac = 0.02,
      minAlphaFrac = 0.8)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out("s_pass") == ((0L, 0L, 0L, 0L, 1L)), s"clean doc flagged: $out")
    assert(out("s_words") == ((1L, 0L, 0L, 0L, 0L)), s"word-count rule: $out")
    // 7-char words also carry zero stopwords: two rules fire, n_pass 0
    assert(out("s_longw") == ((0L, 1L, 1L, 0L, 0L)), s"mean-len rule: $out")
    assert(out("s_digit") == ((0L, 0L, 0L, 1L, 0L)), s"alpha rule: $out")
  }

  test("q88: fixture rules all exercise and pass+fails tally per source") {
    import spark.implicits._
    val out = TextStats.gopherQuality(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(out.map(_._2).sum == docs)
    // every doc either passes or fails >= 1 rule (never negative slack)
    out.foreach { r =>
      assert(r._7 <= r._2 && r._7 >= r._2 - (r._3 + r._4 + r._5 + r._6),
        s"pass/fail ledger inconsistent: $r")
    }
    assert(out.map(_._3).sum > 0 || out.map(_._4).sum > 0,
      "no rule fired on the fixture — thresholds are dead")
  }

  // ---------------------------------------------------------------- q89

  test("q89: sqrt weighting upsamples the low-resource group, keep-set is stable") {
    import spark.implicits._
    // lang a: 4 docs, lang b: 1 doc -> weights 2/3, 1/3; budget 3 ->
    // p_a = 0.5, p_b = 1.0 (capped): every b doc survives
    val docs = (1L to 4L).map(i => ("a", i, "x y z")) :+ (("b", 5L, "x y"))
    val df = docs.toDF("lang", "doc_id", "text")
    val out = Sampling.temperatureMixtureOf(df, budgetDocs = 3)
      .as[(String, Long, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a")._2 == 4 && out("b")._2 == 1)
    assert(math.abs(out("a")._3 - 0.666667) < 1e-9, s"weight: ${out("a")}")
    assert(math.abs(out("b")._3 - 0.333333) < 1e-9, s"weight: ${out("b")}")
    assert(out("b")._4 == 1, "capped keep-probability must keep every b doc")
    assert(out("b")._5 == 2, "kept tokens must count the kept doc's words")
    assert(out("a")._4 <= 4)
    val re = Sampling.temperatureMixtureOf(df.repartition(3), budgetDocs = 3)
      .as[(String, Long, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out == re, "mixture keep-set depends on partitioning")
  }

  // ---------------------------------------------------------------- q90

  test("q90: a span shared by two documents is dropped once, first instance kept") {
    import spark.implicits._
    // chunk stride 4/0: docB's second chunk is byte-identical to docA's
    // first; the lexicographic-first instance (docA, idx 0) must survive
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y z w a b c d")).toDF("doc_id", "text")
    val out = Sampling.chunkDedupOf(Sampling.chunkDocumentsOf(docs, 4, 0))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, 0L)), s"first instance must be kept: $out")
    assert(out(2L) == ((2L, 1L)), s"later duplicate span must drop: $out")
  }

  test("q90: dropped tally equals chunks minus distinct hashes on the fixture") {
    val chunks = Sampling.chunkDocuments(spark, d)
    val out = Sampling.chunkDedupOf(chunks)
    val totals = out.agg(sum(col("n_chunks")), sum(col("n_dropped"))).head()
    assert(totals.getLong(0) == chunks.count())
    assert(totals.getLong(1) ==
      chunks.count() - chunks.select("chunk_hash").distinct().count(),
      "every duplicate instance beyond the first must be dropped, none else")
  }

  test("q89 plan: per-group thresholds broadcast back, corpus never shuffles for the join") {
    val plan = Sampling.temperatureMixture(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"expected a broadcast threshold join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  // ---------------------------------------------------------------- q91

  test("q91: count-difference weights keep positive-class docs, lottery re-admits the tail") {
    import spark.implicits._
    // hand-computed: alpha occurs 6x in 'en' docs + 1x outside, beta 8x
    // outside only => wt(alpha) = 6*9 - 1*6 = +48, wt(beta) = -48.
    // Scores: d1=d2=+144 (kept on score), d3=-144 but wins the md5
    // lottery (bucket 0), d4=-144 / d5=-48 lose (buckets 7, 7).
    // alpha/beta hash to distinct feature buckets (251, 235 mod 256).
    // doc 7: NULL text — no tokens, no training mass, score 0; it loses
    // the lottery (bucket 1) so it must appear in the DROPPED ledger row,
    // not silently vanish (the explode_outer path)
    val docs = Seq(
      (1L, "alpha alpha alpha", "en", "s1"),
      (2L, "alpha alpha alpha", "en", "s1"),
      (3L, "beta beta beta", "de", "s1"),
      (4L, "beta beta beta", "fr", "s1"),
      (5L, "alpha beta beta", "zh", "s1"),
      (7L, null.asInstanceOf[String], "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextStats.classifierQualityStatsOf(docs, nBuckets = 256, lotteryMod = 10)
      .select(col("kept"), col("n_docs"), col("sum_score").cast("long"))
      .as[(Boolean, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(true) == ((3L, 144L)), s"kept ledger wrong: $out")
    assert(out(false) == ((3L, -192L)), s"dropped ledger wrong: $out")
  }

  test("q91: every document lands in exactly one ledger row; partition-stable") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val out = TextStats.classifierQualityStatsOf(docs, 256, 10)
    assert(out.agg(sum(col("n_docs"))).head().getLong(0) == docs.count(),
      "ledger must partition the corpus")
    val re = TextStats.classifierQualityStatsOf(docs.repartition(7), 256, 10)
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty,
      "classifier ledger depends on input partitioning")
  }

  test("q91 plan: fixed-size model broadcast, no cartesian") {
    val plan = TextStats.classifierQualityStats(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the nBuckets-row weight model broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q88: a null-text doc fails the word-count rule and only it — and stays in the tally") {
    import spark.implicits._
    val docs = Seq(
      ("s0", "the a of to and in the a of to and in the a of to and in ok ok"),
      ("s0", null.asInstanceOf[String]))
      .toDF("source", "text")
    val out = TextStats.gopherQualityOf(docs, 20, 90, 4.0, 5.0, 0.02, 0.8)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // (source, n_docs, f_words, f_mean_len, f_stop, f_alpha, n_pass)
    assert(out._2 == 2, "null-text doc fell out of the per-source tally")
    assert(out._3 >= 1, "null text (0 words) must fail the word-count rule")
    assert(out._7 <= 1, "null text must not count as passing all rules")
  }

  // ---------------------------------------------------------------- q95

  test("q95: BPE pair counts weight by word frequency and break ties lexicographically") {
    import spark.implicits._
    // 'abab' x2 in the corpus => ab: 2*2=4, ba: 2*1=2; 'cd' adds cd: 1;
    // the single-char word 'x' contributes no pairs
    val docs = Seq("abab abab cd x").toDF("text")
    val out = TextStats.bpePairCountsOf(docs, topK = 5)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("ab", 4L), ("ba", 2L), ("cd", 1L)), s"got $out")
    // a count tie at the cut must resolve by pair order, identically in
    // the oracle's ORDER BY
    val tie = TextStats.bpePairCountsOf(Seq("aa bb").toDF("text"), topK = 1)
      .as[(String, Long)].collect().toSeq
    assert(tie == Seq(("aa", 1L)), s"tie-break drifted: $tie")
  }

  // ---------------------------------------------------------------- q92

  test("q92: the most prototypical member is pruned, floor(n/4) count, ties to lowest id") {
    import spark.implicits._
    // three identical axis-1 vectors + one axis-2: centroid leans to
    // axis 1, so the A-copies out-rank B; floor(4/4) = 1 pruned and the
    // vec_id tie-break picks vec 1 among the equal-cosine copies
    def axis(i: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == i) 1f else 0f)
    val emb = Seq(
      (1L, axis(1), 0), (2L, axis(1), 0), (3L, axis(1), 0), (4L, axis(2), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.protoPruneStatsOf(emb, k = 1, iters = 1,
      pruneNum = 1, pruneDen = 4)
    val r = out.select("n_members", "n_pruned", "pruned_checksum")
      .as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((4L, 1L, 1L)),
      s"expected the lowest-id prototypical copy pruned: ${r.toSeq}")
  }

  test("q96: the D4 composite drops exactly q87's semantic dups, then prunes floor(surv/4)") {
    val out = Similarity.d4PipelineStatsOf(embFixture(), k = 2, iters = 1,
      threshold = 0.9, pruneNum = 1, pruneDen = 4)
    val total = out.agg(sum(col("n_members")), sum(col("n_sem_dropped")),
      sum(col("n_kept"))).head()
    assert(total.getLong(0) == 9, "cells must partition the corpus")
    assert(total.getLong(1) == 1, "exactly the planted duplicate is semantic-dropped")
    // n_kept = members - sem drops - proto prunes, per cell
    val bad = out.filter(
      col("n_kept") =!= col("n_members") - col("n_sem_dropped") - col("n_proto_pruned"))
      .count()
    assert(bad == 0, "kept accounting does not balance")
    // composite invariant on real data: the semantic stage inside q96
    // equals q87 standalone, and the prune count is floor(survivors/4)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val d4 = Similarity.d4PipelineStatsOf(emb, 8, 2, 0.35, 1, 4)
    val semAlone = Similarity.semdedupStatsOf(emb, 8, 2, 0.35)
    assert(d4.agg(sum(col("n_sem_dropped"))).head().getLong(0) ==
      semAlone.agg(sum(col("n_dropped"))).head().getLong(0),
      "composite semantic stage diverges from q87")
    val badPrune = d4.filter(col("n_proto_pruned") =!=
      floor((col("n_members") - col("n_sem_dropped")) / 4)).count()
    assert(badPrune == 0, "prune count must be floor(survivors/4)")
  }

  test("q92: prune count is exactly floor(n/4) per cell; partition-stable") {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val out = Similarity.protoPruneStatsOf(emb, 8, 2, 1, 4)
    assert(out.withColumn("n_cell_chk", col("n_members") / 4)
      .filter(col("n_pruned") =!= floor(col("n_cell_chk"))).count() == 0,
      "per-cell prune count must be floor(n_members/4)")
    val re = Similarity.protoPruneStatsOf(emb.repartition(5), 8, 2, 1, 4)
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty,
      "prototype pruning depends on input partitioning")
  }
}

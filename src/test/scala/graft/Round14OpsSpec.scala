package graft

import graft.analytics.{Dedup, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: padded-batch waste audit (q150) and incremental
  * cross-snapshot dedup (q151). Value-exactness against DuckDB is the
  * driver oracle's job; these pin the semantics on hand-computed
  * fixtures the big corpus can't isolate. */
class Round14OpsSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.01"

  test("q150: padding waste matches the hand-computed ledger, both strategies") {
    import spark.implicits._
    // doc_id order carries token counts [5,1,4,2,3]; batch=2.
    // arrival batches (5,1)(4,2)(3): padded = 4+2+0 = 6, real 15
    // sorted  batches (1,2)(3,4)(5): padded = 1+1+0 = 2, real 15
    val docs = Seq(
      (1L, "en", "a b c d e"), (2L, "en", "a"), (3L, "en", "a b c d"),
      (4L, "en", "a b"), (5L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    val out = Sampling.paddingWasteOf(docs, batch = 2)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    val arr = out("arrival"); val srt = out("sorted")
    assert((arr._3, arr._4, arr._5, arr._6) == ((3L, 5L, 15L, 6L)),
      s"arrival ledger was $arr")
    assert((srt._3, srt._4, srt._5, srt._6) == ((3L, 5L, 15L, 2L)),
      s"sorted ledger was $srt")
    assert(arr._7 == math.round(6.0 / 21 * 1e6) / 1e6.toDouble)
    assert(srt._7 == math.round(2.0 / 17 * 1e6) / 1e6.toDouble)
  }

  test("q150: null text occupies a slot at zero tokens; all-empty lang has 0 waste") {
    import spark.implicits._
    val docs = Seq(
      (1L, "xx", null.asInstanceOf[String]), (2L, "xx", null.asInstanceOf[String]),
      (3L, "en", "a b"), (4L, "en", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "text")
    val out = Sampling.paddingWasteOf(docs, batch = 2)
    // xx: one batch of two empty rows -> 0 real, 0 padded, waste 0.0 (guarded)
    val xx = out.filter(col("lang") === "xx" && col("strategy") === "arrival")
      .select("n_batches", "n_docs", "real_tokens", "padded_slots", "waste_pct")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(xx == ((1L, 2L, 0L, 0L, 0.0)))
    // en: null doc (0 tokens) shares a batch with the 2-token doc ->
    // padded = 2*2 - 2 = 2
    val en = out.filter(col("lang") === "en" && col("strategy") === "arrival")
      .select("padded_slots").as[Long].head()
    assert(en == 2L)
  }

  test("q150: invariants on the real corpus — marginals agree, sorting never pads more") {
    import spark.implicits._
    val out = Sampling.paddingWaste(spark, d).cache()
    val byStrat = out.groupBy(col("strategy"))
      .agg(sum(col("n_docs")).as("docs"), sum(col("real_tokens")).as("real"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byStrat("arrival") == byStrat("sorted"),
      "both strategies must see the identical corpus")
    // per-lang: contiguous equal-size grouping of the sorted order
    // minimizes the sum of batch maxima -> sorted waste <= arrival waste
    val worse = out.groupBy(col("lang"))
      .pivot("strategy", Seq("arrival", "sorted"))
      .sum("padded_slots")
      .filter(col("sorted") > col("arrival")).count()
    assert(worse == 0, "length-bucketed batching padded more than arrival order")
    out.unpersist()
  }

  test("q151: planted exact / near / admitted incoming docs land in the right bins") {
    import spark.implicits._
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    // same word SET, different order => identical simhash (hamming 0),
    // different md5 => near-dup, deterministically
    val reordered = "theta eta zeta epsilon delta gamma beta alpha"
    val docs = Seq(
      (1L, "s1", corpusText),                       // corpus
      (2L, "s1", "one two three four five six"),    // corpus
      (3L, "s1", corpusText),                       // incoming: exact dup of 1
      (6L, "s1", reordered),                        // incoming: near dup of 1
      (9L, "s1", "completely unrelated words that share nothing at all xyz"),
      (12L, "s1", null.asInstanceOf[String]))       // incoming: null => admitted
      .toDF("doc_id", "source", "text")
    val row = Dedup.incrementalDedupOf(docs)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(row == (("s1", 4L, 1L, 1L, 2L, 21L)),
      s"expected (s1, 4 incoming, 1 exact, 1 near, 2 admitted, 9+12 checksum); got $row")
  }

  test("q151: ledger partitions the incoming set on the real corpus") {
    import spark.implicits._
    val led = Dedup.incrementalDedup(spark, d).cache()
    val bad = led.filter(
      col("n_incoming") =!= col("n_exact_dup") + col("n_near_dup") + col("n_admitted"))
      .count()
    assert(bad == 0, "exact + near + admitted must partition n_incoming")
    val totalIncoming = led.agg(sum(col("n_incoming"))).head().getLong(0)
    val expected = graft.analytics.Tables.documents(spark, d)
      .filter(col("doc_id") % 3 === 0).count()
    assert(totalIncoming == expected)
    led.unpersist()
  }

  test("round-14 plans: equi-join shaped, no cartesian; q151 near gate is a semi-join") {
    val sd = "/root/testdata/sf0.001"
    Seq("q150_padding_waste", "q151_incremental_dedup",
        "q152_vad_segments", "q153_quality_keepers",
        "q154_budget_selection", "q155_audio_fp_histogram").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sd)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q fell back to a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q degraded to a nested-loop join")
    }
    // q156 joins two 1-row model-size frames without keys — a broadcast
    // nested loop over one row is the intended shape (q147 precedent), so
    // it only takes the cartesian check
    val p156 = SparkEntry.queries("q156_moore_lewis")(spark, sd)
      .queryExecution.executedPlan.toString
    assert(!p156.contains("CartesianProduct"), "q156 fell back to a cartesian")
    val p151 = SparkEntry.queries("q151_incremental_dedup")(spark, sd)
      .queryExecution.executedPlan.toString
    assert(p151.contains("LeftSemi"),
      "the banded near gate must stay a semi-join (no pair stream)")
  }

  test("q152: VAD segments match the constructed byte pattern; empty payload is one silence segment") {
    import spark.implicits._
    import graft.analytics.Multimodal
    // 256 'a' bytes (rms 31 -> silence), 256 spaces (rms 96 -> speech),
    // 256 'a' (silence): segments S/sp/S. Empty text: one 0-sample frame
    // with NULL energy -> one silence segment. NULL text: no frames.
    val t1 = "a" * 256 + " " * 256 + "a" * 256
    val docs = Seq(
      (1L, "s", t1), (2L, "s", null.asInstanceOf[String]), (3L, "s", ""))
      .toDF("doc_id", "source", "text")
    val row = Multimodal.vadSegmentsOf(docs, frameBytes = 256, threshold = 45.0)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(row == (("s", 2L, 4L, 1L, 4L, 1L, 1L)),
      s"expected (s, 2 docs, 4 frames, 1 speech, 4 segments, 1 speech seg, run 1); got $row")
  }

  test("q152: per-source frame mass reconciles with the q131 frame table") {
    import spark.implicits._
    import graft.analytics.{Multimodal, Tables}
    val vad = Multimodal.vadSegments(spark, d)
    val vadFrames = vad.agg(sum(col("n_frames"))).head().getLong(0)
    val q131Frames = Multimodal.audioFrameFeatures(spark, d).count()
    assert(vadFrames == q131Frames,
      s"VAD ledger lost frames: $vadFrames vs $q131Frames")
    val bad = vad.filter(col("n_speech_frames") > col("n_frames") ||
      col("n_speech_segments") > col("n_segments") ||
      (col("n_speech_segments") === 0 && col("max_speech_run") =!= 0) ||
      col("max_speech_run") > col("n_speech_frames")).count()
    assert(bad == 0, "segment marginals must be internally consistent")
  }

  test("q153: quality keeper dominates the min-id baseline; marginals reconcile with q74") {
    import spark.implicits._
    import graft.analytics.Dedup
    val led = Dedup.qualityKeepers(spark, d).cache()
    // the keeper maximizes chars within its cluster, so per-source sums
    // over the SAME led clusters can never lose to the min-id baseline
    val regress = led.filter(col("kept_chars") < col("minid_kept_chars") ||
      col("chars_gain") < 0).count()
    assert(regress == 0, "quality keeper must dominate the min-id keeper")
    val (nClusters, nMembers) = led
      .agg(sum(col("n_clusters_led")), sum(col("n_members")))
      .as[(Long, Long)].head()
    val clusters = Dedup.simhashClusters(spark, d).cache()
    assert(nClusters == clusters.select("cluster_id").distinct().count(),
      "every cluster must have exactly one quality keeper")
    assert(nMembers == clusters.count(),
      "member mass must cover every clustered doc exactly once")
    clusters.unpersist(); led.unpersist()
  }

  test("q154: uniform-quality corpus reduces the cut to the md5 lottery; budget is monotone") {
    import spark.implicits._
    import graft.analytics.Sampling
    // all docs score 1 (fails words/mean-len/stopword, passes alpha) with
    // 1 token each -> the budget cut is exactly `budget` lottery-lowest docs
    val docs = (1L to 10L).map(i => (i, "xx", "s", "zzz"))
      .toDF("doc_id", "lang", "source", "text")
    val row = Sampling.budgetSelectionOf(docs, budgetTokens = 3)
      .as[(String, Long, Long, Long, Long, Long)].head()
    val expectIds = (1L to 10L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString)
      .take(3)
    assert(row == (("xx", 10L, 3L, 3L, 1L, expectIds.sum)),
      s"expected the 3 lottery-lowest docs (${expectIds.mkString(",")}), got $row")
    // monotone in the budget on the real corpus
    val small = Sampling.budgetSelection(spark, d, budgetTokens = 500)
      .select("lang", "n_selected").as[(String, Long)].collect().toMap
    val large = Sampling.budgetSelection(spark, d, budgetTokens = 5000)
      .select("lang", "n_selected").as[(String, Long)].collect().toMap
    assert(small.keySet == large.keySet)
    assert(small.forall { case (l, n) => n <= large(l) },
      "a larger budget can never select fewer documents")
  }

  test("q155: delta-sign fingerprint matches the constructed contour; same contour pairs at hamming 0") {
    import spark.implicits._
    import graft.analytics.Multimodal
    // frames of 16 bytes: 'a'*16 (rms 31) -> ' '*16 (rms 96) -> 'a'*16 (31)
    // deltas: rise (bit 0), fall (no bit) => fp = 1. Two different texts
    // with the same contour must share the fingerprint (hamming 0).
    val up = "a" * 16 + " " * 16 + "a" * 16
    val up2 = "b" * 16 + "," * 16 + "b" * 16 // different bytes, same contour
    val docs = Seq((1L, up), (2L, up2), (3L, "a" * 16))
      .toDF("doc_id", "text")
    val fps = Multimodal.audioFingerprintsOf(docs, frameBytes = 16)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(fps(1L) == 1L, s"expected rise-then-fall fp 1, got ${fps(1L)}")
    assert(fps(2L) == 1L, "same energy contour must share the fingerprint")
    assert(fps(3L) == 0L, "single-frame media fingerprints as 0")
    // the single-pass fold must equal the builtin-only spelling exactly
    // (fingerprint rounding parity), on a real corpus
    val corpus = graft.analytics.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val fold = Multimodal.audioFingerprintsOf(corpus, 16)
    val decl = Multimodal.audioFingerprintsDeclarative(corpus, 16)
    assert(fold.filter(col("h128").isNotNull).exceptAll(decl).isEmpty &&
      decl.exceptAll(fold.filter(col("h128").isNotNull)).isEmpty,
      "single-pass fold diverges from the declarative fingerprint spelling")
    // histogram invariants on the real corpus
    val hist = Multimodal.audioFpHistogram(spark, d).cache()
    assert(hist.filter(col("hamming") < 0 || col("hamming") > 6).count() == 0)
    assert(hist.count() > 0, "sf0.01 must band at least one audio near-dup pair")
    hist.unpersist()
  }

  test("q156: in-domain-looking docs select, out-of-domain docs do not; ref is the largest source") {
    import spark.implicits._
    import graft.analytics.TextStats
    // target domain speaks vocabulary A; the general pool has one A-looking
    // doc (must select: the in-domain model finds it easier) and two
    // B-vocabulary docs (must not: the in-domain model only has the
    // smoothing floor for them)
    // strict separation by construction: an A-bigram has identical counts
    // in both models but the GENERAL vocabulary is larger (V_g 10 > V_t 8)
    // => every A-term is strictly positive; a B-bigram is repetitive
    // (general model knows it well: term_g <= log10(17/7)) while the
    // target only has its OOV floor log10(8) => strictly negative
    val tgt = (1L to 6L).map(i =>
      (i, "tgt",
        "alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta"))
    val genA = Seq((101L, "gen", "alpha beta gamma delta epsilon zeta"))
    val genB = Seq((102L, "gen", "omega psi omega psi omega psi omega psi"),
      (103L, "gen", "omega psi omega psi omega psi omega psi"))
    val docs = (tgt ++ genA ++ genB).toDF("doc_id", "source", "text")
    val out = TextStats.mooreLewisOf(docs, vocabCap = 65536)
      .select("source", "n_docs", "n_scored", "n_selected", "is_ref")
      .as[(String, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("tgt")._5 && !out("gen")._5, "largest source must be the reference")
    assert(out("gen")._2 == 3 && out("gen")._3 == 3)
    assert(out("gen")._4 == 1,
      s"exactly the A-vocabulary doc must select from 'gen': ${out("gen")}")
    // in-domain docs are by definition easier under their own model
    assert(out("tgt")._4 == out("tgt")._2,
      s"every reference-source doc must select: ${out("tgt")}")
  }

  test("q156: ledger invariants and a single reference on the real corpus") {
    import spark.implicits._
    import graft.analytics.TextStats
    val led = TextStats.mooreLewis(spark, d).cache()
    assert(led.filter(col("n_selected") > col("n_scored") ||
      col("n_scored") > col("n_docs")).count() == 0)
    assert(led.filter(col("is_ref")).count() == 1, "exactly one reference source")
    led.unpersist()
  }

  test("q151: an incoming batch against an empty corpus admits everything") {
    import spark.implicits._
    // all ids are multiples of 3 -> corpus side is empty
    val docs = Seq((3L, "s", "a b c"), (6L, "s", "d e f"))
      .toDF("doc_id", "source", "text")
    val row = Dedup.incrementalDedupOf(docs)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(row == (("s", 2L, 0L, 0L, 2L, 9L)))
  }
}

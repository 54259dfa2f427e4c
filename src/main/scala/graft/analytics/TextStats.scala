package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines over `documents`:
 * token counting, quality scoring, heuristic language-ID, and document
 * fingerprinting. Pure column expressions — every op is a narrow map over
 * the scan (zero shuffles until the final aggregate), which is exactly what
 * you want when the input is 100 TB of text: the per-document work pipelines
 * inside whole-stage codegen and aggregates partially map-side.
 */
object TextStats {

  import Tables._

  def words(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(words(c))

  /** BPE-ish token estimate: ~4 chars/token heuristic (ceil(len/4)). */
  def bpeTokenEstimate(lenCol: Column): Column =
    ceil(lenCol.cast("double") / 4.0).cast("long")

  /** English stopword ratio — the language-ID signal. */
  val enStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "for")

  def stopwordRatio(c: Column): Column = {
    val ws = words(c)
    size(filter(ws, w => w.isin(enStopwords: _*))).cast("double") / size(ws)
  }

  /**
   * Intra-document repetition (a Gopher-style quality rule): the fraction
   * of word n-grams that are repeats of an earlier n-gram in the same
   * document. High ratios flag boilerplate / degenerate generations.
   * Map-side only — the non-distinct n-gram list stays inside the row.
   * Flag compares the ROUNDED ratio so both engines agree at the boundary.
   * Documents shorter than `n` words yield one truncated n-gram (the
   * remaining words joined — `concat_ws` drops the out-of-range NULLs) with
   * ratio 0, same convention as [[Dedup.ngramsFromWords]] and reproduced
   * exactly by the oracle.
   */
  def repetitionProfile(s: SparkSession, d: String,
      n: Int = 3, flagThreshold: Double = 0.02): DataFrame =
    documentsSpread(s, d) // per-row n-gram transform before the (absent) shuffle
      .select(col("doc_id"), col("text"))
      .withColumn("ws", words(col("text")))
      .withColumn("ng", // NON-distinct shingles: repeats are the signal
        transform(sequence(lit(0), greatest(size(col("ws")) - n, lit(0))),
          i => concat_ws(" ", (0 until n).map(k => get(col("ws"), i + k)): _*)))
      .select(
        col("doc_id"),
        size(col("ng")).as("n_ngrams"),
        round(lit(1.0) - size(array_distinct(col("ng"))).cast("double") /
          greatest(size(col("ng")), lit(1)), 6).as("rep_ratio"))
      .withColumn("is_repetitive", col("rep_ratio") > flagThreshold)

  /** Per-source token totals: exact whitespace tokens + BPE-ish estimate. */
  def tokenTotals(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("source"))
      .agg(
        sum(tokenCount(col("text")).cast("long")).as("total_tokens"),
        sum(bpeTokenEstimate(col("n_chars"))).as("est_bpe_tokens"),
        count(lit(1)).as("n_docs"))

  /** Per-language quality profile: mean doc length, token count, mean token
    * length — the filter signals of a data-quality pass. */
  def qualityProfile(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        round(avg(col("n_chars")), 6).as("avg_chars"),
        round(avg(tokenCount(col("text"))), 6).as("avg_tokens"),
        round(avg(col("n_chars").cast("double") / tokenCount(col("text"))), 6)
          .as("avg_token_len"),
        count(lit(1)).as("n_docs"))

  /** Heuristic language ID: stopword-ratio threshold → 'en' / 'other';
    * confusion profile against the generator's lang label. */
  def langIdConfusion(s: SparkSession, d: String, threshold: Double = 0.02): DataFrame =
    documents(s, d)
      .withColumn("predicted_lang",
        when(stopwordRatio(col("text")) > threshold, lit("en")).otherwise(lit("other")))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /**
   * Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
   * ... Gopher", table A1): per-document repetition-independent filters —
   * word count in [minWords, maxWords], mean word length in [minMeanLen,
   * maxMeanLen], stopword fraction ≥ minStopFrac (a real-prose signal),
   * alphabetic-word fraction ≥ minAlphaFrac. Emits the per-source rule
   * ledger: how many documents each rule rejects and how many survive all
   * of them — the dashboard a corpus-quality pass is tuned against.
   * Bounds here are tightened to the fixture's synthetic distribution
   * (words 10–99, mean len 3.7–5.3) so every rule is exercised; the
   * published operating points (50–100k words, 3–10 chars) are parameter
   * choices, not different code.
   *
   * 100 TB posture: one narrow map over (source, text) — all four signals
   * come out of a single word-split in the row — then a map-side-combined
   * aggregate on the (tiny) source key. No shuffle of document bodies.
   * Ratio compares use 6-dp-rounded keys so the DuckDB oracle agrees at
   * rule boundaries.
   */
  def gopherQuality(s: SparkSession, d: String,
      minWords: Int = 20, maxWords: Int = 90,
      minMeanLen: Double = 4.0, maxMeanLen: Double = 5.0,
      minStopFrac: Double = 0.02, minAlphaFrac: Double = 0.8): DataFrame =
    gopherQualityOf(documents(s, d), minWords, maxWords, minMeanLen,
      maxMeanLen, minStopFrac, minAlphaFrac)

  /** [[gopherQuality]] over an arbitrary (source, text) frame. */
  def gopherQualityOf(docs: DataFrame,
      minWords: Int, maxWords: Int, minMeanLen: Double, maxMeanLen: Double,
      minStopFrac: Double, minAlphaFrac: Double): DataFrame =
    gopherFlagged(docs, Seq("source"), minWords, maxWords, minMeanLen,
      maxMeanLen, minStopFrac, minAlphaFrac)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("f_words")).cast("long").as("n_fail_words"),
        sum(col("f_mean_len")).cast("long").as("n_fail_mean_len"),
        sum(col("f_stop")).cast("long").as("n_fail_stopword"),
        sum(col("f_alpha")).cast("long").as("n_fail_alpha"),
        sum(when(col("f_words") + col("f_mean_len") + col("f_stop") +
          col("f_alpha") === 0, 1L).otherwise(0L)).as("n_pass"))

  /** The per-document Gopher rule flags (doc_id, source, f_words,
    * f_mean_len, f_stop, f_alpha) — [[gopherQualityOf]]'s scoring step,
    * exposed so q146 can cross-classify against the learned filter. */
  def gopherDocFlags(docs: DataFrame,
      minWords: Int = 20, maxWords: Int = 90,
      minMeanLen: Double = 4.0, maxMeanLen: Double = 5.0,
      minStopFrac: Double = 0.02, minAlphaFrac: Double = 0.8): DataFrame =
    gopherFlagged(docs, Seq("doc_id", "source"), minWords, maxWords,
      minMeanLen, maxMeanLen, minStopFrac, minAlphaFrac)

  private def gopherFlagged(docs: DataFrame, keyCols: Seq[String],
      minWords: Int, maxWords: Int, minMeanLen: Double, maxMeanLen: Double,
      minStopFrac: Double, minAlphaFrac: Double): DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and", "in")
    docs
      .withColumn("ws", words(col("text")))
      // null text ⇒ 0 words ⇒ fails the word-count rule (and only it):
      // without the coalesces a null row's flags are NULL, the sums skip
      // it, and the per-source tally no longer partitions the corpus —
      // and diverges from the oracle's CASE-WHEN null semantics
      .withColumn("nw", coalesce(size(col("ws")), lit(0)))
      .withColumn("mean_len",
        round(aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w))
          .cast("double") / col("nw"), 6))
      .withColumn("stop_frac",
        round(size(filter(col("ws"), w => w.isin(stop: _*))).cast("double") /
          col("nw"), 6))
      .withColumn("alpha_frac",
        round(size(filter(col("ws"), w => w.rlike("^[a-z]+$"))).cast("double") /
          col("nw"), 6))
      .select(keyCols.map(col) ++ Seq(
        (col("nw") < minWords || col("nw") > maxWords).cast("int").as("f_words"),
        coalesce((col("mean_len") < minMeanLen || col("mean_len") > maxMeanLen)
          .cast("int"), lit(0)).as("f_mean_len"),
        coalesce((col("stop_frac") < minStopFrac).cast("int"), lit(0)).as("f_stop"),
        coalesce((col("alpha_frac") < minAlphaFrac).cast("int"), lit(0)).as("f_alpha")): _*)
  }

  /**
   * q146: quality-filter agreement matrix — per source, the 2×2
   * cross-classification of the LEARNED filter's verdict (q91's
   * classifier `kept`) against the HEURISTIC rules' verdict (q88's
   * all-Gopher-rules pass). The table a pipeline reads when tuning
   * filters: high `clf_only`/`gopher_only` mass means the two disagree
   * and thresholds need attention — the q127 method-agreement discipline
   * applied to quality filtering.
   *
   * One token-explode pass feeds the classifier (model train + score),
   * one narrow pass computes the rule flags; the join is doc-keyed and
   * the output source-keyed. Both verdicts are the exact q88/q91
   * spellings, so the matrix rows reconcile with those tables.
   */
  def filterAgreement(s: SparkSession, d: String,
      nBuckets: Int = 256, lotteryMod: Int = 10): DataFrame = {
    val docs = documents(s, d)
    val weights = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      classifierWeights(docs, nBuckets), eager = true)
    val clf = classifierScores(docs, weights, nBuckets, lotteryMod)
      .select(col("doc_id"), col("kept"))
    val gp = gopherDocFlags(docs)
      .select(col("doc_id"), col("source"),
        (col("f_words") + col("f_mean_len") + col("f_stop") +
          col("f_alpha") === 0).as("gpass"))
    gp.join(clf, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept") && col("gpass"), 1L).otherwise(0L)).as("n_both_pass"),
        sum(when(col("kept") && !col("gpass"), 1L).otherwise(0L)).as("n_clf_only"),
        sum(when(!col("kept") && col("gpass"), 1L).otherwise(0L)).as("n_gopher_only"),
        sum(when(!col("kept") && !col("gpass"), 1L).otherwise(0L)).as("n_both_fail"))
      .withColumn("agreement",
        round((col("n_both_pass") + col("n_both_fail")).cast("double") /
          col("n_docs"), 6))
  }

  /**
   * q147: source-distribution drift audit — per source, the chi-square
   * statistic of its token-length-bin distribution against the REFERENCE
   * source (the largest, deterministically chosen), with Laplace-smoothed
   * expectations so an empty reference bin cannot divide by zero. The
   * corpus-drift alarm a pipeline runs per snapshot/source before mixing:
   * a source whose length profile walked away from the reference shows a
   * large chi2 long before eval metrics move.
   *
   * Engine-exactness: each bin's chi-square term is rounded to 12 dp and
   * summed as DECIMAL (the q125 discipline), so aggregation order cannot
   * fork engines; the bin grid is a fixed 7-row broadcast; NULL sources
   * are real groups (null-safe joins throughout).
   */
  def sourceDriftChi2(s: SparkSession, d: String,
      binTokens: Int = 16, maxBin: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBins = maxBin + 1
    val binned = documents(s, d)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("bin",
        least(ceil(col("n_tokens") / binTokens.toDouble), lit(maxBin)).cast("int"))
    val binCounts = binned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("o"))
    val srcTotals = binCounts.groupBy(col("source"))
      .agg(sum(col("o")).as("n_docs"))
    val ref = srcTotals
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_docs").desc, col("source").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("source").as("ref_source"), col("n_docs").as("n_ref"))
    val refBins = binCounts.join(broadcast(ref),
        binCounts("source") <=> ref("ref_source"))
      .select(col("bin"), col("o").as("ref_o"))
    val allBins = s.range(0, nBins.toLong).select(col("id").cast("int").as("bin"))
    val grid = srcTotals.join(broadcast(allBins))
      .join(binCounts.withColumnRenamed("source", "bc_source"),
        srcTotals("source") <=> col("bc_source") &&
          allBins("bin") === binCounts("bin"), "left")
      .select(srcTotals("source"), allBins("bin"), col("n_docs"),
        coalesce(col("o"), lit(0L)).as("o"))
      .join(broadcast(refBins.withColumnRenamed("bin", "rb_bin")),
        col("bin") === col("rb_bin"), "left")
      .join(broadcast(ref))
      .withColumn("e", col("n_docs").cast("double") *
        ((coalesce(col("ref_o"), lit(0L)) + 1).cast("double") /
          (col("n_ref") + nBins).cast("double")))
      .withColumn("term",
        round((col("o").cast("double") - col("e")) *
          (col("o").cast("double") - col("e")) / col("e"), 12))
    grid.groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        max((col("source") <=> col("ref_source")).cast("int")).as("is_ref_i"),
        round(sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
          .as("chi2"))
      .select(col("source"), col("n_docs"),
        (col("is_ref_i") === 1).as("is_ref"), col("chi2"))
  }

  /**
   * Document fingerprint: Karp-Rabin polynomial rolling hash over word
   * codepoints (base 31, mod 1e9+7), computed with a sequential
   * higher-order `aggregate` — the building block for shift-resistant
   * near-dup detection (winnowing), exposed here as a per-doc fingerprint.
   */
  def rollingFingerprint(c: Column): Column =
    aggregate(words(c), lit(0L),
      (acc, w) => pmod(acc * 31 + ascii(w) + length(w), lit(1000000007L)))

  def fingerprints(s: SparkSession, d: String): DataFrame =
    documentsSpread(s, d).select( // per-word rolling hash, map-only plan
      col("doc_id"),
      rollingFingerprint(col("text")).as("fingerprint"),
      tokenCount(col("text")).as("n_tokens"))

  /**
   * Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): hash every
   * positional word k-gram, slide a w-hash window, keep each window's
   * MINIMUM hash, emit the distinct minima as the document's fingerprint
   * set. The guarantee that makes this the shift-resistant member of the
   * dedup family: any shared run of ≥ w+k-1 words between two documents
   * contributes at least one IDENTICAL fingerprint to both, no matter how
   * the surrounding text shifts word positions — so near-dups meet in an
   * equi-join on `fp` where whole-document hashes (q42) miss them.
   *
   * Plan shape (r19, guide §2.4): MAP-SIDE array form — gram hashing,
   * the sliding-window minima and the per-doc dedup all happen in the
   * scan stage, so the operator adds NO shuffle of its own (the old
   * posexplode + lead/min-window spelling paid an Exchange
   * hashpartitioning(doc_id) just to assemble grams, plus a second
   * exchange for the trailing distinct). The historical hazard that
   * forced the window form — CollapseProject inlining every stage into
   * the next lambda, re-tokenizing the document per window element,
   * O(n²·w) interpreted evals — is defeated by materializing EACH
   * intermediate array as an explode-of-1-element-array Generate output
   * ([[spanColumns]]/[[allGramHashesOf]] discipline): the words array
   * and the gram-hash array are attributes, so every lambda sees a
   * computed array, O(n·w) total.
   *
   * Every hash is exact integer arithmetic on md5 prefixes
   * (engine-reproducible, [[Dedup.shingleHash]] family), so the full
   * pipeline is value-oracle-checked. Conventions unchanged: one
   * truncated gram for sub-k docs (concat_ws skips the null tail), one
   * clamped window for sub-w gram sets (slice clamps at the array end),
   * NULL text yields no rows.
   *
   * Scaling note (r20 ADVICE): the map-side form holds each document's
   * full words array AND gram-hash array in one task row, so a single
   * pathological multi-megaword document concentrates O(n·w) transient
   * allocation in one task (the old window form had the same asymptotic
   * cost but streamed rows). A 100 TB run over unbounded documents
   * should length-cap or split monster docs upstream — that is where
   * the memory spike would appear.
   */
  def winnowFingerprints(s: SparkSession, d: String,
      k: Int = 3, w: Int = 4): DataFrame =
    // spread: per-gram md5 is heavy pre-shuffle compute now that hashing
    // is map-side (identity at any real scan width)
    documentsSpread(s, d)
      .select(col("doc_id"), explode(array(words(col("text")))).as("ws"))
      .filter(col("ws").isNotNull)
      // gram-hash array: positions 0..max(nw−k, 0)
      .select(col("doc_id"), explode(array(transform(
        sequence(lit(0), greatest(size(col("ws")) - k, lit(0))),
        i => conv(substring(md5(concat_ws(" ",
            (0 until k).map(j => get(col("ws"), i + j)): _*).cast("binary")),
          1, 15), 16, 10).cast("long")))).as("hs"))
      // winnow minima: window starts 0..max(n_grams−w, 0), min over the
      // (end-clamped) w-slice; per-doc distinct in-row
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
        j => array_min(slice(col("hs"), j + 1, lit(w)))))).as("fp"))

  /**
   * Winnowing near-dup candidates: documents sharing ≥ `minShared`
   * fingerprints. The join key is a uniform 60-bit hash, so at 100 TB the
   * candidate generation is a skew-free shuffle equi-join on `fp` (never
   * all-pairs); the shared-count aggregate is map-side partial. Downstream
   * verification (exact Jaccard) is [[Dedup.verifyJaccard]]'s job, as with
   * the MinHash candidates.
   */
  def winnowPairs(s: SparkSession, d: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      dfCap: Int = 128): DataFrame = {
    val fps = dfCapped(winnowFingerprints(s, d, k, w), "fp", dfCap)
    val a = fps.select(col("doc_id").as("doc_a"), col("fp"))
    val b = fps.select(col("doc_id").as("doc_b"), col("fp"))
    a.join(b, "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * q168: winnowing recall audit — the approximation-honesty discipline
   * (q107/q110/q111/q122/q166) applied to the fingerprint family.
   * Winnowing's theorem (Schleimer/Wilkerson/Aiken) guarantees any
   * shared run of ≥ w+k−1 words contributes ≥1 shared fingerprint; the
   * PRACTICAL operating point (the q79 pair gate: ≥ minShared shared
   * fingerprints, selection-frequency df cap) trades some of that
   * recall for candidate volume. This audit prices the trade: the
   * exhaustive shared-(w+k−1)-gram pairs (q84's machinery at the
   * theorem's granularity, ≥1 shared gram) are the ground truth, and
   * each overlap band reports how many the winnow gate catches —
   * low-overlap pairs (1 shared gram ≈ one short shared run) are
   * exactly where sampling loses evidence, and the table shows it
   * instead of asserting it.
   *
   * 100 TB posture: both sides are the already-audited linear
   * shuffle-equi-join shapes (uniform 60-bit keys, df-capped hot keys,
   * map-side pair counts); the audit join is pair-keyed on the TRUE
   * pair set, which the ground truth already bounds.
   */
  def winnowRecallStats(s: SparkSession, d: String, k: Int = 3, w: Int = 4,
      minShared: Int = 2, dfCap: Int = 128): DataFrame = {
    val truth = sharedGramPairsOf(documentsSpread(s, d), k + w - 1, 1, dfCap)
    val caught = winnowPairs(s, d, k, w, minShared, dfCap)
      .select(col("doc_a"), col("doc_b"), lit(1).as("hit"))
    truth.join(caught, Seq("doc_a", "doc_b"), "left")
      .withColumn("band",
        when(col("n_shared") >= 5, "5+")
          .when(col("n_shared") >= 2, "2-4")
          .otherwise("1"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_true_pairs"),
        coalesce(sum(col("hit")), lit(0)).cast("long").as("n_caught"))
      .withColumn("recall",
        round(col("n_caught").cast("double") / col("n_true_pairs"), 6))
  }

  /**
   * Hot-key guard for the pair self-joins: drop join keys whose document
   * frequency exceeds `dfCap` BEFORE the join. A boilerplate gram ("click
   * here to accept the terms of …") present in d documents would emit
   * d²/2 candidate rows inside ONE key group — quadratic volume and a
   * straggler partition at once, and the join key being uniform over
   * DISTINCT grams spreads groups but cannot shrink one. Declared
   * semantics change: a pair attested ONLY by ultra-common keys (shared
   * by > dfCap docs) is noise, not duplication evidence — the standard
   * call in exact-substring dedup (suffix-array pipelines cap or drop
   * boilerplate runs the same way). The default cap is far above the
   * corpus fixtures' maximum df (4 at sf0.1), so test-scale output is
   * unchanged; the ORACLE carries the same predicate (QUALIFY
   * count(*) OVER (PARTITION BY h)), keeping the queries value-checked.
   *
   * Shape: one window count over the key — a linear, uniformly-keyed
   * shuffle that leaves the frame hash-partitioned on the key, exactly
   * the partitioning the self-join needs. No broadcast of a "hot set"
   * (at 100 TB the hot tail itself can exceed broadcast size).
   */
  private def dfCapped(keyed: DataFrame, keyCol: String, dfCap: Int): DataFrame =
    keyed
      .withColumn("_df", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("_df") <= dfCap)
      .drop("_df")

  /** All positional word k-gram hashes of each document, distinct per doc.
    *
    * Round 19 (guide §2.4 "remove shuffles outright"): MAP-SIDE array
    * form. The previous posexplode + lead/count-window spelling computed
    * the grams AFTER an Exchange hashpartitioning(doc_id) (the windows'
    * partitioning), so every consumer paid (a) a corpus-word-sized
    * shuffle whose only purpose was gram assembly and (b) a second
    * exchange for the trailing `.distinct()`. Here the gram strings, the
    * md5 hashes and the per-doc dedup (`array_distinct` over the hash
    * array ≡ the old global distinct — (doc_id, h) is unique within a
    * doc) are all computed in the SCAN stage, and nothing shuffles until
    * the consumer's own keyed operation. The round-7 "array-HOF 10×
    * slower" hazard (CollapseProject inlining split(text) into the gram
    * lambda, re-splitting per element) is avoided the same way as
    * [[spanColumns]]: `ws` is an explode-of-1-element-array Generate
    * output, which CollapseProject cannot inline; the lambda sees a
    * materialized array attribute (plan-verified).
    *
    * Gram convention unchanged: positions 0..max(nw−k, 0), concat_ws
    * skips the null tail, so docs shorter than k words still yield one
    * truncated gram — bit-identical hashes to the window form. */
  def allGramHashes(s: SparkSession, d: String, k: Int): DataFrame =
    // spread: md5 per gram occurrence is heavy pre-shuffle compute now
    // that hashing is map-side ([[Tables.documentsSpread]]; identity at
    // any real scan width)
    allGramHashesOf(documentsSpread(s, d), k)

  /** [[allGramHashes]] over an arbitrary (doc_id, text) frame — the form
    * a streaming decontamination gate applies per micro-batch. */
  def allGramHashesOf(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(array(words(col("text")))).as("ws"))
      // NULL text ⇒ NULL ws: the old posexplode emitted no rows for it,
      // and greatest(size(NULL)−k, 0) = 0 would otherwise fabricate one
      // empty gram here
      .filter(col("ws").isNotNull)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(0), greatest(size(col("ws")) - k, lit(0))),
        i => conv(substring(md5(concat_ws(" ",
            (0 until k).map(j => get(col("ws"), i + j)): _*).cast("binary")),
          1, 15), 16, 10).cast("long")))).as("h"))

  /**
   * Exhaustive shared-n-gram duplication pairs — the EXACT-substring
   * member of the dedup family (Lee et al., "Deduplicating Training Data
   * Makes Language Models Better"): two documents sharing any run of ≥ k
   * words share at least one identical k-gram hash, with no sampling loss.
   * [[winnowPairs]] is the sampled variant (window minima, ~1/w of the
   * grams); this one trades gram-table volume for total recall — the
   * choice a pipeline makes per corpus tier. Emits pairs with the count
   * of distinct shared k-gram hashes ≥ `minShared`.
   *
   * 100 TB posture: the gram table is corpus-word-sized (the declared
   * cost of exactness); its key is a uniform 60-bit hash, so the
   * self-equi-join shuffle partitions evenly, candidate pairs collapse in
   * map-side partial counts, and no stage is ever all-pairs. Hot
   * boilerplate grams are dropped by [[dfCapped]] before the join — the
   * one key shape uniform hashing cannot defuse.
   *
   * Cap granularity caveat: this cap counts RAW gram document frequency,
   * while [[winnowPairs]] caps the winnow-SELECTION frequency of a hash
   * (how many docs picked it as a window minimum, ≤ its raw df). With
   * caps active the two outputs are therefore not strictly nested on
   * boilerplate-heavy corpora — a gram can exceed the raw-df cap here
   * while its winnow selections stay under the fp cap there. The
   * winnow ⊆ exhaustive containment is a property of the UNCAPPED
   * operators (SharedGramSpec asserts it with caps disabled); each cap is
   * the right skew control for its own join's key distribution.
   */
  def sharedGramPairs(s: SparkSession, d: String,
      k: Int = 8, minShared: Int = 3, dfCap: Int = 128): DataFrame =
    // spread (r19): map-side gram md5 is heavy pre-shuffle compute
    sharedGramPairsOf(documentsSpread(s, d), k, minShared, dfCap)

  /** [[sharedGramPairs]] over an arbitrary (doc_id, text) frame. */
  def sharedGramPairsOf(docs: DataFrame,
      k: Int, minShared: Int, dfCap: Int): DataFrame = {
    val g = dfCapped(allGramHashesOf(docs, k), "h", dfCap)
    val a = g.select(col("doc_id").as("doc_a"), col("h"))
    val b = g.select(col("doc_id").as("doc_b"), col("h"))
    a.join(b, "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** POSITIONAL word k-gram hashes — [[allGramHashesOf]] keeping `wpos`
    * and per-position multiplicity (no distinct): the match-matrix input
    * for [[longestSharedSpansOf]]. Same r19 map-side array form (grams +
    * md5 in the scan stage, posexplode index = gram position, no
    * window shuffle); the Generate barrier keeps the words array
    * materialized exactly once per row. */
  def gramPositionsOf(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(array(words(col("text")))).as("ws"))
      .filter(col("ws").isNotNull)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), greatest(size(col("ws")) - k, lit(0))),
        i => conv(substring(md5(concat_ws(" ",
            (0 until k).map(j => get(col("ws"), i + j)): _*).cast("binary")),
          1, 15), 16, 10).cast("long"))).as(Seq("wpos", "h")))
      .select(col("doc_id"), col("wpos").cast("long").as("wpos"), col("h"))

  /**
   * q160: longest verbatim shared token span per document pair — the
   * MEMORIZATION-RISK audit on top of q84's total-recall gram surface
   * (Lee et al. 2022 deduplicate at ≥ 50-token substrings; the Carlini
   * memorization studies measure exactly "longest verbatim overlap").
   * q84 says HOW MANY k-grams two documents share; this says HOW LONG
   * the longest contiguous run is — the number that separates shared
   * boilerplate phrases from a quoted page.
   *
   * A shared span of L ≥ k tokens is exactly a run of L−k+1 shared
   * k-grams whose positions advance together in both documents, i.e.
   * consecutive `pos_a` at constant diagonal `pos_a − pos_b` in the
   * match matrix — so the longest span is k−1 + the longest
   * gaps-and-islands run per (pair, diagonal), found with one window.
   *
   * 100 TB posture: the positional gram table is corpus-word-sized (the
   * declared cost of exactness, same as q84); its join key is the
   * uniform 60-bit hash with boilerplate grams dropped by the
   * document-frequency cap BEFORE the join, so the match matrix is
   * linear in verbatim-duplication mass, never all-pairs; the islands
   * window partitions by (pair, diagonal) — group size bounded by span
   * length. Every output column is INTEGER arithmetic: nothing can fork
   * engines.
   */
  /** q160 defaults — interpolated into the q160 oracle SQL (SparkEntry)
    * so the engines cannot silently desync on them. */
  val SpanGramK: Int = 8
  val SpanDfCap: Int = 128
  val SpanMinLen: Int = 12

  def longestSharedSpans(s: SparkSession, d: String, k: Int = SpanGramK,
      dfCap: Int = SpanDfCap, minSpan: Int = SpanMinLen): DataFrame =
    longestSharedSpansOf(documentsSpread(s, d), k, dfCap, minSpan)

  /** [[longestSharedSpans]] over an arbitrary (doc_id, text) frame. */
  def longestSharedSpansOf(docs: DataFrame, k: Int, dfCap: Int,
      minSpan: Int): DataFrame = {
    // the positional table feeds the df model and both join sides: pin
    // the narrow (doc_id, wpos, h) rows once (the q151/q158 discipline)
    val gp = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      gramPositionsOf(docs, k), eager = false)
    val okH = gp.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("h"))
    val cp = gp.join(okH, "h")
    val a = cp.select(col("doc_id").as("doc_a"), col("h"), col("wpos").as("pos_a"))
    val b = cp.select(col("doc_id").as("doc_b"), col("h"), col("wpos").as("pos_b"))
    val m = a.join(b, "h")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("diag", col("pos_a") - col("pos_b"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    val runs = m
      .withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col("doc_a"), col("doc_b"))
      .agg(
        (max(col("run")) + lit(k - 1)).cast("long").as("longest_span"),
        count(lit(1)).cast("long").as("n_runs"),
        sum(col("run")).cast("long").as("n_aligned_grams"))
      .filter(col("longest_span") >= minSpan)
  }

  /**
   * N-gram-level contamination — the train/test overlap gate at k-gram
   * granularity (the GPT-3 report's 13-gram dedup, parameterized): for
   * every corpus document, the fraction of its distinct k-gram hashes
   * that appear anywhere in the "benchmark" slice (doc_id ≡ 0 mod
   * `benchStride`, id-capped like q66). Word-set Jaccard (q66) misses
   * reordered copies; shared k-grams catch verbatim spans specifically.
   *
   * Scale shape: the benchmark gram set is eval-sized and hard-capped —
   * a broadcast — so corpus docs are scored in one map-side semi-join
   * pass plus their own per-doc aggregate; the corpus never shuffles by
   * content.
   */
  def ngramContamination(s: SparkSession, d: String, k: Int = 8,
      benchStride: Long = 97, maxBench: Long = 1000,
      flagThreshold: Double = 0.5): DataFrame = {
    val grams = allGramHashes(s, d, k)
    val benchGrams = grams
      .filter(col("doc_id") % benchStride === 0 && col("doc_id") < benchStride * maxBench)
      .select(col("h")).distinct()
    grams
      .filter(col("doc_id") % benchStride =!= 0)
      .join(broadcast(benchGrams).withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("hit_ratio",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
      .filter(col("hit_ratio") >= flagThreshold)
  }

  /**
   * q167: contamination-aware split audit — the release table of the C4
   * documentation audit (Dodge et al. 2021) crossed with the engine's
   * own split assignment: q85's exact benchmark-overlap flags joined
   * onto q64's deterministic train/val/test label, per split. The two
   * numbers a release gate reads: contaminated docs landing in TEST are
   * direct evaluation leakage; contaminated docs landing in TRAIN are
   * memorization risk — and because both the flag and the split are
   * pure deterministic functions of content/id, the table is
   * reproducible on both engines bit-for-bit.
   *
   * 100 TB shape: q85's machinery unchanged (eval-capped broadcast gram
   * set, corpus grams never shuffle before the per-doc rollup); the
   * flagged-doc set joins the narrow (doc_id, split, n_tokens) stream
   * on doc_id; the output is 3 rows.
   */
  def contaminatedSplitAudit(s: SparkSession, d: String, k: Int = 8,
      benchStride: Long = 97, maxBench: Long = 1000,
      flagThreshold: Double = 0.5): DataFrame = {
    val flagged = ngramContamination(s, d, k, benchStride, maxBench,
      flagThreshold).select(col("doc_id"), lit(1).as("flag"))
    documents(s, d)
      .filter(col("doc_id") % benchStride =!= 0)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .withColumn("split", Sampling.splitName(col("doc_id")))
      .join(flagged, Seq("doc_id"), "left")
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("flag")), lit(0)).cast("long").as("n_contaminated"),
        coalesce(sum(when(col("flag") === 1, col("n_tokens"))), lit(0))
          .cast("long").as("contaminated_tokens"))
      .withColumn("contamination_rate",
        round(col("n_contaminated").cast("double") / col("n_docs"), 6))
  }

  /**
   * q138: Bloom-prefiltered decontamination rollup — per-source counts of
   * documents whose k-gram overlap with the benchmark set reaches
   * `flagThreshold` (the removal verdict a decontamination pass acts on;
   * The Pile / RefinedWeb discipline).
   *
   * Same exact semantics as [[ngramContamination]]'s hit accounting, but
   * the corpus-side gram stream is prefiltered by a
   * [[graft.functions.BloomContains]] probe built over the benchmark gram
   * hashes BEFORE the confirm join: at 100 TB the gram stream is
   * corpus-sized while true contamination is eval-sized, so the one-sided
   * Bloom (no false negatives — proven in Round11bOpsSpec) discards the
   * overwhelmingly clean volume inside the scan's codegen stage, and only
   * possible hits reach the broadcast confirm-join that removes false
   * positives. The result is bit-identical to the exact join; the oracle
   * runs the exact form.
   *
   * The benchmark hash collect is a MODEL BUILD, not a data collect: the
   * eval set is hard-capped (`maxBench` docs) exactly like the DSIR /
   * classifier broadcasts, and it lands in the plan as a fixed-size bit
   * array plus the confirm-side broadcast.
   */
  def bloomDecontamination(s: SparkSession, d: String, k: Int = 8,
      benchStride: Long = 97, maxBench: Long = 1000,
      flagThreshold: Double = 0.2): DataFrame = {
    import graft.functions.BloomContains
    val grams = allGramHashes(s, d, k)
    val benchSel = col("doc_id") % benchStride === 0 &&
      col("doc_id") < benchStride * maxBench
    val benchGrams = grams.filter(benchSel).select(col("h")).distinct()
    val benchHashes = benchGrams.collect().map(_.getLong(0)) // eval-sized model
    val bits = BloomContains.build(
      benchHashes.iterator, BloomContains.sizeFor(benchHashes.length.toLong))

    // corpus = every non-multiple of the stride (q85's convention — NOT
    // !benchSel: a stride multiple above the bench cap is in NEITHER set,
    // matching the oracle's `doc_id % stride <> 0`)
    val corpusGrams = grams.filter(col("doc_id") % benchStride =!= 0)
    val totals = corpusGrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val hits = corpusGrams
      .filter(BloomContains.contains(col("h"), bits))     // scan-side prefilter
      .join(broadcast(benchGrams), Seq("h"))              // exact confirm
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val perDoc = totals.join(hits, Seq("doc_id"), "left")
      .withColumn("hit_ratio",
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_grams"), 6))
    perDoc
      .join(documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hit_ratio") >= flagThreshold, 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contam_ratio",
        round(col("n_contaminated").cast("double") / col("n_docs"), 6))
  }

  /**
   * q141: span-level surgical decontamination (Lee et al. 2022; the GPT-3
   * appendix discipline) — instead of FLAGGING contaminated documents
   * (q85/q138), REMOVE exactly the token spans that overlap a benchmark
   * k-gram and keep the rest of the document: every token covered by any
   * hitting gram (positions `wpos .. wpos+k-1`) is dropped, the survivors
   * reassemble in order, and the per-source table reports documents
   * touched, tokens removed, and a checksum over every cleaned text so
   * the oracle pins the reassembly itself.
   *
   * One corpus scan: the token stream derives grams in-row (lead()
   * window), the bench gram set is an eval-sized broadcast, and a token
   * is covered iff any of the previous k-1 grams (or its own) hit — a
   * bounded running `max` over the same window order, so coverage never
   * materializes a positions table or re-joins the corpus. Only
   * (doc_id, wpos, word-after-filter) ever shuffles.
   */
  def surgicalDecontamination(s: SparkSession, d: String, k: Int = 8,
      benchStride: Long = 97, maxBench: Long = 1000): DataFrame = {
    val benchGrams = allGramHashes(s, d, k)
      .filter(col("doc_id") % benchStride === 0 && col("doc_id") < benchStride * maxBench)
      .select(col("h")).distinct()
    val corpus = documents(s, d).filter(col("doc_id") % benchStride =!= 0)
    surgicalRollupOf(surgicalLedgerOf(corpus, benchGrams, k))
  }

  /**
   * [[surgicalDecontamination]]'s per-document ledger over an arbitrary
   * (doc_id, text, source) frame and a frozen bench gram set — a PURE
   * per-document function (each doc's row depends only on its own text
   * and the bench set), which is what lets the streaming gate merge
   * ledger rows idempotently under replay. Text-free output: the cleaned
   * text leaves the plan as its 60-bit hash (`cleaned_h`).
   */
  def surgicalLedgerOf(docs: DataFrame, benchGrams: DataFrame,
      k: Int = 8): DataFrame = {
    val ord = Window.partitionBy(col("doc_id")).orderBy(col("wpos"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val cover = ord.rowsBetween(-(k - 1), 0)
    val toks = docs
      .select(col("doc_id"), col("source"),
        posexplode(words(col("text"))).as(Seq("wpos", "word")))
      .withColumn("n_words", count(lit(1)).over(byDoc))
      .withColumn("gram", when(
        col("wpos") < greatest(col("n_words") - k, lit(0)) + 1,
        concat_ws(" ",
          col("word") +: (1 until k).map(j => lead(col("word"), j).over(ord)): _*)))
      .withColumn("h",
        conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10).cast("long"))
    toks
      .join(broadcast(benchGrams.select(col("h"))).withColumn("bhit", lit(1)),
        Seq("h"), "left")
      .withColumn("ghit", coalesce(col("bhit"), lit(0)))
      .withColumn("covered", max(col("ghit")).over(cover) === 1)
      .groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(!col("covered"), 1L).otherwise(0L)).as("n_kept"),
        conv(substring(md5(concat_ws(" ", transform(
          array_sort(collect_list(when(!col("covered"),
            struct(col("wpos"), col("word"))))),
          p => p.getField("word"))).cast("binary")), 1, 15), 16, 10)
          .cast("long").as("cleaned_h"))
  }

  /** The q141 per-source table as a deterministic function of the ledger
    * — shared by the batch query and the streaming gate's readback. */
  def surgicalRollupOf(ledger: DataFrame): DataFrame =
    ledger.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_kept") < col("n_tokens"), 1L).otherwise(0L))
          .as("n_docs_touched"),
        sum(col("n_tokens")).as("tokens_before"),
        sum(col("n_tokens") - col("n_kept")).as("tokens_removed"),
        sum(pmod(col("cleaned_h"), lit(1000000007L))).as("cleaned_checksum"))

  /**
   * The composite training-data prep pipeline in one plan: language filter →
   * quality gate (token-count band) → exact dedup (keep lowest doc_id per
   * identical text) → per-source token accounting. Each stage is a narrow
   * transform or a single hash-shuffle; this is the shape of a real corpus
   * cleanse run, end to end.
   */
  def corpusPrep(s: SparkSession, d: String,
      lang: String = "en", minTokens: Int = 10, maxTokens: Int = 1000): DataFrame = {
    val docs = documents(s, d)
      .filter(col("lang") === lang)
      .withColumn("n_tokens", tokenCount(col("text")))
      .filter(col("n_tokens").between(minTokens, maxTokens))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
  }

  /**
   * Token rarity profile — an IDF-style quality signal without the libm
   * hazard: per document, the document-frequency mass of its distinct
   * tokens (docs full of ubiquitous tokens score high `avg_df`; docs
   * carrying corpus-rare tokens show up in `n_rare`). Two-stage shape that
   * scales: (1) distinct-token explode → df aggregate; (2) shuffle
   * hash join of (doc_id, tok) against the df table on `tok`, then a
   * per-doc aggregate. The df table is deliberately NOT broadcast: a web
   * corpus's vocabulary is corpus-sized (URLs, typos, hex blobs — billions
   * of distinct tokens at 100 TB), so forcing it into a broadcast relation
   * is a driver OOM; the equi-join shuffle-partitions the vocabulary with
   * uniform (token-hash) keys instead. `avg_df` is one
   * IEEE division of two exact integers, so both engines produce the same
   * bits (no float-sum association drift); natural-log IDF would hit libm
   * ulp differences across engines and is left to callers.
   * A token is "rare" when `df * rareFactor < n_docs`.
   */
  def tokenRarity(s: SparkSession, d: String, rareFactor: Int = 4): DataFrame = {
    val docs = documents(s, d)
    val docTokens = docs.select(col("doc_id"),
      explode(array_distinct(words(col("text")))).as("tok"))
    val dfTable = docTokens.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    docTokens
      .join(dfTable.hint("shuffle_hash"), "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("df")).as("sum_df"),
        round(sum(col("df")).cast("double") / count(lit(1)), 6).as("avg_df"),
        sum(when(col("df") * rareFactor < col("n_docs"), 1L).otherwise(0L))
          .as("n_rare"))
  }

  /**
   * PII redaction profile — the scrubbing pass every training corpus runs
   * before release: detect + redact emails and IPv4 addresses, report
   * per-source hit counts and how many characters redaction removed.
   * The fixture corpus is synthetic word salad, so deterministic PII
   * markers are PLANTED first (doc_id-derived, identical in both engines)
   * — the operator then detects and redacts them from real column data.
   *
   * Regex parity: patterns restricted to syntax Java regex and RE2
   * (DuckDB) interpret identically — character classes, `{m,n}` bounds,
   * no backreferences/lookaround. Redaction is `regexp_replace` (Spark
   * replaces all matches; the oracle passes the 'g' flag).
   *
   * 100 TB posture: pure narrow maps over the scan feeding a tiny
   * per-source aggregate — the scrub pipelines inside whole-stage codegen
   * and shuffles only (source, partials).
   */
  def piiRedactionProfile(s: SparkSession, d: String): DataFrame = {
    val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    documents(s, d)
      .withColumn("text2", concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" reach user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10.0."), col("doc_id") % 256, lit(".7")))
          .otherwise(lit(""))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text2"), emailRe, "<EMAIL>"), ipRe, "<IP>"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text2").rlike(emailRe), 1L).otherwise(0L)).as("n_email"),
        sum(when(col("text2").rlike(ipRe), 1L).otherwise(0L)).as("n_ip"),
        sum((length(col("text2")) - length(col("redacted"))).cast("long"))
          .as("chars_removed"))
  }

  /**
   * Classifier-based quality filtering — the third published filter family
   * next to heuristic rules (q88 Gopher) and contamination gates (q85/q66):
   * a linear bag-of-hashed-tokens model (the fastText hashing trick,
   * Joulin et al. 2016; the GPT-3 appendix-A quality classifier is the
   * same shape trained WebText-vs-CommonCrawl) scores every document, and
   * a deterministic md5 lottery re-admits a slice of the rejected tail —
   * the reproducible analog of GPT-3's `np.random.pareto` re-inclusion,
   * which keeps the filtered corpus from collapsing onto the classifier's
   * head.
   *
   * Deterministic and oracle-exact BY CONSTRUCTION — no trained floats:
   *  - feature bucket = 60-bit md5-prefix token hash mod `nBuckets`
   *    ([[Dedup.mdHash60]] convention — both engines compute it
   *    bit-identically);
   *  - class proxy: `lang = 'en'` positive (the DSIR-style target domain),
   *    everything else negative;
   *  - per-bucket weight = pos_b·N − neg_b·P (bucket occurrences in each
   *    class vs class totals): an exact integer whose sign is
   *    sign(p̂_pos(b) − p̂_neg(b)) — the count-difference linear score;
   *    log-odds weights would hit libm ulp divergence across engines;
   *  - doc score = Σ weight over the doc's token occurrences;
   *  - keep ⇔ score > 0 OR md5(doc_id) ≡ 0 (mod `lotteryMod`).
   *
   * 100 TB posture: the model is `nBuckets` rows — FIXED size by the
   * hashing trick (unlike q76's deliberately-shuffled corpus-sized
   * vocabulary), so broadcasting it is correct at any corpus size.
   * Training is one explode → groupBy(bucket) with map-side combine
   * (≤ nBuckets×partitions partial rows shuffle); the weight frame is
   * eagerly checkpointed so train and score are two clean corpus scans —
   * exactly the passes the real pipeline makes. Scoring shuffles one
   * combined (doc_id, score) row per doc; weights, scores and ledger
   * sums are DECIMAL(38,0) internally because the un-normalized weights
   * grow with the square of corpus token count, which wraps int64
   * silently (non-ANSI Spark) near ~5e10 tokens. The final REPORT column
   * alone is cast to DOUBLE: parquet DECIMAL(38,0) decodes as exact
   * `Decimal` objects under Arrow but as float64 under DuckDB's pandas
   * bridge, so a cross-engine hash of the ledger diverges on
   * representation even when every value is identical (observed against
   * the driver gate; values were Decimal-exact). DOUBLE is
   * representation-stable across both readers and exact for any ledger
   * this side of 2^53 (sf1 tops out near 6e13).
   */
  def classifierQualityStats(s: SparkSession, d: String,
      nBuckets: Int = 256, lotteryMod: Int = 10): DataFrame =
    classifierQualityStatsOf(documents(s, d), nBuckets, lotteryMod)

  /** [[classifierQualityStats]] over an arbitrary
    * (doc_id, text, lang, source) frame. */
  def classifierQualityStatsOf(docs: DataFrame,
      nBuckets: Int, lotteryMod: Int): DataFrame = {
    val weights = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      classifierWeights(docs, nBuckets), eager = true)
    classifierScores(docs, weights, nBuckets, lotteryMod)
      .groupBy(col("source"), col("kept"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score")).cast("decimal(38,0)").cast("double").as("sum_score"))
  }

  /** Token feature bucket — [[Dedup.mdHash60]] folded to the model's
    * fixed hash range (the fastText hashing trick). */
  private def featureBucket(w: Column, nBuckets: Int): Column =
    pmod(Dedup.mdHash60(w), lit(nBuckets.toLong))

  /** Train the count-difference weight model over `docs`: an
    * (up to `nBuckets`)-row (b, wt) frame. A model-training batch event —
    * the streaming gate ([[graft.streaming.StreamingCorpus
    * .startClassifierGate]]) scores against a FROZEN copy of this.
    * Weights are DECIMAL(38,0): the un-normalized products grow with the
    * square of corpus token count, which wraps int64 (silently, in
    * non-ANSI Spark) near ~5e10 tokens — exactly the scale this is for. */
  def classifierWeights(docs: DataFrame, nBuckets: Int): DataFrame = {
    val toks = docs.select((col("lang") === "en").as("pos"),
        explode(words(col("text"))).as("w"))
      .withColumn("b", featureBucket(col("w"), nBuckets))
    val counts = toks.groupBy(col("b")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("pos_b"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("neg_b"))
    val tot = counts.agg(
      sum(col("pos_b")).as("p_tot"), sum(col("neg_b")).as("n_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("b"),
        (col("pos_b").cast("decimal(38,0)") * col("n_tot")
          - col("neg_b").cast("decimal(38,0)") * col("p_tot")).as("wt"))
  }

  /** Score `docs` against a trained (b, wt) model: one
    * (doc_id, source, score, kept) row per doc. Pure in (docs, weights)
    * — the streaming gate's per-batch quarantine equals the batch
    * filter's dropped set under any arrival order because nothing here
    * depends on what else is in the batch. `nBuckets` must match the
    * model's training value (it fixes the feature hash range). The model
    * join is LEFT with weight-0 fill: a token in a bucket the training
    * corpus never produced carries no evidence, and a doc of only such
    * tokens must still score 0 and face the keep rule — an inner join
    * would silently admit it with no row at all. Scoring needs only
    * (doc_id, source, text); the class-proxy `lang` column is a
    * training-time concern. */
  def classifierScores(docs: DataFrame, weights: DataFrame,
      nBuckets: Int, lotteryMod: Int): DataFrame =
    // explode_OUTER: a null-text doc has no tokens, but it must still
    // emit a score-0 row and face the keep rule — plain explode would
    // silently drop it from the ledger and slip it past the gate. The
    // null token's bucket is null, misses the model, and coalesces to 0.
    docs.select(col("doc_id"), col("source"),
        explode_outer(words(col("text"))).as("w"))
      .withColumn("b", featureBucket(col("w"), nBuckets))
      .join(broadcast(weights), Seq("b"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(coalesce(col("wt"), lit(0).cast("decimal(38,0)"))).as("score"))
      .withColumn("kept",
        col("score") > 0 ||
          Sampling.idBucket(col("doc_id"), lotteryMod.toLong) === 0)

  /**
   * q123: DSIR importance resampling (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling") — the hashed-n-gram
   * instantiation: fit bag-of-hashed-ngram distributions for the TARGET
   * domain (here the `lang = 'en'` slice, the same class proxy the q91
   * classifier trains on) and for the RAW corpus, weight every document
   * by its log importance ratio log p̂_tgt(x) − log p̂_raw(x) (add-one
   * smoothing over the `nBuckets` hash range), and resample without
   * replacement ∝ the importance weight via deterministic Gumbel-top-k:
   * key = log w + Gumbel(u), u derived from the md5 id lottery
   * ([[Sampling.idBucket]]), top `keepN` by (key desc, doc_id).
   * Gumbel-top-k sampling equals weighted sampling without replacement
   * (Efraimidis–Spirakis / Vieira), so the selection IS the paper's
   * resampling step with the engine's reproducibility discipline instead
   * of a hidden RNG.
   *
   * 100 TB posture: features are unigram+bigram hashes folded to
   * `nBuckets` (the paper's hashing trick), so BOTH models are
   * nBuckets-row broadcast tables no matter the corpus; scoring is a
   * second narrow gram scan joining those tables (q99's spelling), and
   * the top-`keepN` selection compiles to TakeOrdered (map-side partial
   * top-k — no global sort materializes). Per-gram terms round to 6 dp
   * and sum as DECIMAL so array-order and join-order sums agree exactly
   * (the q99 discipline); the Gumbel key stays decimal so the final
   * (key, doc_id) order is a total order both engines compute bit-equal.
   * NULL-lang docs count to raw only (unknown domain is not target
   * evidence); gram-less docs (null/empty text) score 0 and still enter
   * the lottery — selection must not silently exempt them.
   */
  def dsirSelect(s: SparkSession, d: String, nBuckets: Int = 256,
      keepN: Int = 100): DataFrame =
    // spread: the gram stream md5-hashes every unigram+bigram occurrence
    // before its first shuffle — the documented heavy-pre-shuffle-compute
    // case ([[graft.analytics.Tables.documentsSpread]]); identity at scale
    dsirSelectOf(documentsSpread(s, d), nBuckets, keepN)

  /** [[dsirSelect]] over an arbitrary (doc_id, lang, source, text) frame.
    *
    * Round 19 (guide §1.2 "remove unnecessary passes" / §2.3 "aggregate
    * before you shuffle"): ONE tokenize+hash pass. The gram stream folds
    * to per-(doc, bucket) counts — ≤ nBuckets rows per document — and
    * BOTH the importance model and every document's score derive from
    * that pinned fold. The previous spelling ([[dsirModelOf]] +
    * [[dsirKeyedOf]], kept for the streaming gate's frozen-model path)
    * tokenized and md5-hashed the corpus TWICE (train pass + score pass).
    * Score identity: Σ_occurrences term_b ≡ Σ_b c_b·term_b — the per-term
    * decimals are exact, multiplication by an integer count is exact, so
    * the decimal sums are bit-equal and the Gumbel selection order is
    * unchanged (oracle hash identical; pinned by the r19 A/B).
    *
    * NOTE (r20 ADVICE): the fold pin is EAGER, so merely CONSTRUCTING
    * this DataFrame (a plan dump, a registry enumeration) runs the full
    * corpus tokenize+hash job before any action — the A/B-measured
    * price of the blocking barrier paying off for q123's consumer
    * branches. Plan-only consumers should dump at a small SF. */
  def dsirSelectOf(docs: DataFrame, nBuckets: Int = 256,
      keepN: Int = 100): DataFrame = {
    val fold = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      dsirGramStream(docs,
          Seq(col("doc_id"), (col("lang") === "en").as("tgt")), nBuckets)
        .groupBy(col("doc_id"), col("tgt"), col("b"))
        .agg(count(lit(1)).as("c")),
      eager = true)
    // model: same counts as [[dsirModelOf]] (tb/rb roll up from the fold
    // exactly — integer sums), same smoothing arithmetic
    val counts = fold.groupBy(col("b")).agg(
      sum(when(col("tgt"), col("c")).otherwise(0L)).as("tb"),
      sum(col("c")).as("rb"))
    val tot = counts.agg(sum(col("tb")).as("t_tot"), sum(col("rb")).as("r_tot"))
    val model = counts.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log((col("tb") + 1).cast("double") /
            (col("t_tot") + nBuckets).cast("double")) -
          log((col("rb") + 1).cast("double") /
            (col("r_tot") + nBuckets).cast("double")), 6)
          .cast("decimal(18,6)").as("term"))
    // scoring: the fold already carries the per-doc multiplicity, so the
    // broadcast model join runs over folded rows, not gram occurrences
    val perDoc = fold
      .join(broadcast(model), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("term"), lit(0).cast("decimal(18,6)"))
        .cast("decimal(28,6)") * col("c")).as("logw"))
    val u = (Sampling.idBucket(col("doc_id"), 1000000L).cast("double") + 0.5) /
      lit(1000000.0)
    val keyed = docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("logw", coalesce(col("logw"), lit(0).cast("decimal(28,6)")))
      .withColumn("gumbel", round(-log(-log(u)), 6).cast("decimal(18,6)"))
      .withColumn("sel_key", col("logw") + col("gumbel"))
      .select(col("doc_id"), col("source"), col("logw"), col("sel_key"))
    dsirTopOf(keyed, keepN)
  }

  /** The hashed unigram + bigram feature stream (one row per occurrence)
    * with the bucket column — shared by DSIR training and scoring. */
  private def dsirGramStream(docs: DataFrame, cols: Seq[Column],
      nBuckets: Int): DataFrame = {
    val ws = docs
      .withColumn("w", words(col("text")))
      .withColumn("nw", coalesce(size(col("w")), lit(0)))
    // one explode of unigrams ++ bigrams = ONE scan of the corpus text
    // per pass (the union-of-two-explodes spelling read it twice); the
    // nw guard matters — sequence(1, 0) would DESCEND, not come up empty
    val bigrams = when(col("nw") >= 2,
      transform(sequence(lit(1), col("nw") - 1),
        i => concat(element_at(col("w"), i), lit(" "),
          element_at(col("w"), i + 1))))
      .otherwise(array().cast("array<string>"))
    ws.select(cols :+ explode(concat(col("w"), bigrams)).as("g"): _*)
      .withColumn("b", featureBucket(col("g"), nBuckets))
  }

  /** Train the DSIR importance model over `docs`: the (b, term) frame of
    * per-bucket smoothed log importance ratios (target = the en slice,
    * raw = every gram; both distributions from ONE aggregate pass —
    * nBuckets rows, broadcast). A model-training batch event: the
    * streaming gate ([[graft.streaming.StreamingCorpus.startDsirGate]])
    * scores against a FROZEN copy. */
  def dsirModelOf(docs: DataFrame, nBuckets: Int = 256): DataFrame = {
    val counts = dsirGramStream(docs, Seq((col("lang") === "en").as("tgt")), nBuckets)
      .groupBy(col("b")).agg(
        sum(when(col("tgt"), 1L).otherwise(0L)).as("tb"),
        count(lit(1)).as("rb"))
    val tot = counts.agg(sum(col("tb")).as("t_tot"), sum(col("rb")).as("r_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log((col("tb") + 1).cast("double") /
            (col("t_tot") + nBuckets).cast("double")) -
          log((col("rb") + 1).cast("double") /
            (col("r_tot") + nBuckets).cast("double")), 6)
          .cast("decimal(18,6)").as("term"))
  }

  /** Score `docs` against a trained (b, term) model: one (doc_id, source,
    * logw, sel_key) row per doc — the decimal log-ratio sum plus the
    * deterministic Gumbel selection key. Pure in (docs, model), so the
    * streaming gate's maintained table equals batch scoring under any
    * arrival order; `nBuckets` must match the model's training value. */
  def dsirKeyedOf(docs: DataFrame, model: DataFrame,
      nBuckets: Int = 256): DataFrame = {
    val perDoc = dsirGramStream(docs, Seq(col("doc_id")), nBuckets)
      .join(broadcast(model), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("term"), lit(0).cast("decimal(18,6)"))
        .cast("decimal(28,6)")).as("logw"))
    val u = (Sampling.idBucket(col("doc_id"), 1000000L).cast("double") + 0.5) /
      lit(1000000.0)
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("logw", coalesce(col("logw"), lit(0).cast("decimal(28,6)")))
      .withColumn("gumbel", round(-log(-log(u)), 6).cast("decimal(18,6)"))
      .withColumn("sel_key", col("logw") + col("gumbel"))
      .select(col("doc_id"), col("source"), col("logw"), col("sel_key"))
  }

  /** The Gumbel-top-k selection over a (doc_id, source, logw, sel_key)
    * frame — TakeOrdered, then rank over the keepN survivors only. */
  def dsirTopOf(keyed: DataFrame, keepN: Int): DataFrame =
    keyed.orderBy(col("sel_key").desc, col("doc_id")).limit(keepN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sel_key").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("source"),
        round(col("logw").cast("double"), 6).as("logw"),
        round(col("sel_key").cast("double"), 6).as("sel_key"))

  /**
   * BPE tokenizer-training pair counts (Sennrich et al. 2016, "Neural
   * Machine Translation of Rare Words with Subword Units") — the merge-
   * selection step of byte-pair-encoding training: corpus-weighted counts
   * of adjacent character pairs, ranked. The top pair IS the next BPE
   * merge; the full training iteration over the progressively merged
   * symbol vocabulary is [[bpeTrain]] (q97) — this query keeps the
   * single-step observable.
   *
   * 100 TB posture — the classic BPE trick: pair counting runs over the
   * WORD-FREQUENCY TABLE, not the raw corpus. The corpus is scanned once
   * into (word, n) — a vocab-sized map-side-combined aggregate — and the
   * character-pair explode multiplies vocab rows (bounded by vocabulary
   * growth, not corpus growth). Deterministic top-k: (count desc, pair
   * asc) total order, single-char words carry no pairs by definition.
   */
  def bpePairCounts(s: SparkSession, d: String, topK: Int = 20): DataFrame =
    bpePairCountsOf(documents(s, d), topK)

  /** [[bpePairCounts]] over an arbitrary (text) frame. */
  def bpePairCountsOf(docs: DataFrame, topK: Int): DataFrame = {
    val wordCounts = docs
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    wordCounts
      .select(col("n"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topK)
  }

  /**
   * Full iterated BPE tokenizer training (Sennrich et al. 2016) — the
   * driver loop [[bpePairCounts]] documents as the standard shape, now
   * implemented: `nMerges` rounds of (count pairs over the word-frequency
   * table → pick the top pair → greedily merge it left-to-right in every
   * word). Output: one row per learned merge, in training order, with the
   * pair's corpus-weighted occurrence count AT SELECTION TIME.
   *
   * 100 TB posture — the split every real tokenizer trainer uses:
   *  - the DISTRIBUTED part is the one corpus scan into the word-frequency
   *    table (map-side-combined agg; only (word, partial_count) shuffles);
   *  - the merge loop runs on the DRIVER over that table, capped at
   *    `vocabCap` rows by the deterministic (n desc, word asc) order — a
   *    bounded model-sufficient-statistics collect, the same class of
   *    model-training event as the k-means codebook or the classifier's
   *    256-bucket weight table (both broadcast back); iterating it as
   *    2·nMerges tiny Spark jobs would add thousands of driver-synced
   *    barriers to compute over kilobytes.
   *
   * Determinism (oracle-exact BY CONSTRUCTION):
   *  - top pair = max by (count desc, left asc, right asc) — a total order;
   *  - merge application is greedy left-to-right non-overlapping (for a
   *    pair (a,a) inside a run of a's this merges the even offsets —
   *    the only overlap case, since a≠b matches can never be adjacent);
   *  - symbols are Unicode CODE POINTS, not UTF-16 units, so multibyte
   *    text splits identically to the oracle's character semantics.
   */
  def bpeTrain(s: SparkSession, d: String, nMerges: Int = 8,
      vocabCap: Int = 65536): DataFrame =
    bpeTrainOf(documents(s, d), nMerges, vocabCap)

  /** [[bpeTrain]] over an arbitrary (text) frame. */
  def bpeTrainOf(docs: DataFrame, nMerges: Int, vocabCap: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    bpeFitMerges(docs, nMerges, vocabCap)
      .toDF("merge_rank", "l_sym", "r_sym", "merged", "n_occurrences")
  }

  /** The driver-side BPE fit shared by [[bpeTrain]] (q97, the training
    * observable) and [[bpeEncode]] (q100, the application): `nMerges`
    * rounds of top-pair selection + greedy rewrite over the bounded
    * word-frequency table (see [[bpeTrain]]'s scaladoc for why the fit is
    * a driver loop over sufficient statistics, not 2·nMerges Spark jobs).
    * Returns (rank, left, right, merged, count-at-selection). */
  def bpeFitMerges(docs: DataFrame, nMerges: Int,
      vocabCap: Int): Seq[(Int, String, String, String, Long)] = {
    val s = docs.sparkSession
    import s.implicits._
    val wordTable = docs
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(vocabCap)
      .as[(String, Long)].collect()
    // driver-side model fit over the bounded stats table (see scaladoc)
    var syms: Array[(Array[String], Long)] = wordTable.map { case (w, n) =>
      val cps = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      (cps, n)
    }
    def mergeWord(ss: Array[String], a: String, b: String): Array[String] = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < ss.length) {
        if (i < ss.length - 1 && ss(i) == a && ss(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += ss(i); i += 1 }
      }
      out.result()
    }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((ss, n) <- syms; i <- 0 until ss.length - 1) {
        val key = (ss(i), ss(i + 1))
        counts(key) = counts.getOrElse(key, 0L) + n
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((k, a, b, a + b, c))
        syms = syms.map { case (ss, n) => (mergeWord(ss, a, b), n) }
        k += 1
      }
    }
    merges.result()
  }

  /**
   * BPE encoding — APPLY the tokenizer [[bpeTrain]] learns: every word of
   * the corpus is split into code-point symbols and the learned merges are
   * replayed in rank order (greedy left-to-right non-overlapping, the
   * Sennrich et al. 2016 inference rule). Output: the corpus-weighted
   * token-frequency table (top `topK` by count desc, token asc), with the
   * corpus-wide total token count pinned on every row — so the oracle
   * checks both the exact per-token frequencies AND the global encoding
   * length.
   *
   * 100 TB posture — encoding never touches the corpus row-wise:
   *  - ONE corpus scan into the full word-frequency table (map-side
   *    combined; only (word, partial_count) shuffles — vocab-sized);
   *  - each DISTINCT word is encoded once by a NARROW chain of
   *    `nMerges` literal string replaces over the vocab table (the
   *    merges are driver-fit model constants, exactly the classifier /
   *    codebook broadcast discipline);
   *  - token explode + final agg stay vocab-bounded.
   *  A per-document token view would be the same broadcast-join of the
   *  (word → tokens) table back onto the corpus — still one corpus scan.
   *
   * Merge application is spelled as STRING REPLACE over a delimited
   * symbol form (each symbol wrapped `\n sym \n`, so symbols are bounded
   * on both sides and adjacent wrappers never share a delimiter):
   * `replace("\na\n\nb\n" → "\nab\n")`. Both engines' `replace` is
   * literal, left-to-right, non-overlapping — which IS the greedy BPE
   * rewrite (a merged symbol `a+b` can never equal `a`, so no rescan
   * chain exists; pair (a,a) in a run merges even offsets exactly as the
   * replace does). Parity with the array fold is spec-pinned
   * (Round8OpsSpec) including non-BMP code points and the (a,a) run case.
   */
  def bpeEncode(s: SparkSession, d: String, nMerges: Int = 8,
      vocabCap: Int = 65536, topK: Int = 40): DataFrame =
    bpeEncodeOf(documents(s, d), nMerges, vocabCap, topK)

  /** [[bpeEncode]] over an arbitrary (text) frame. */
  def bpeEncodeOf(docs: DataFrame, nMerges: Int, vocabCap: Int,
      topK: Int): DataFrame =
    // every corpus word (len >= 1: the zero-length split artifact of
    // empty/whitespace text carries no symbols and is excluded on both
    // engines — Spark's sequence(1,0) would DESCEND where DuckDB's
    // range(1,1) is empty)
    bpeEncodeWordFreq(
      docs.select(explode(words(col("text"))).as("word"))
        .filter(length(col("word")) >= 1)
        .groupBy(col("word")).agg(count(lit(1)).as("n")),
      bpeFitMerges(docs, nMerges, vocabCap), topK)

  /** The q100 encode tail over an arbitrary (word, n) frequency table and
    * a FROZEN merge list — shared by the batch audit (merges fit on the
    * same corpus) and the streaming gate ([[graft.streaming
    * .StreamingCorpus.bpeEncodeLedger]], merges frozen from the corpus
    * snapshot): each DISTINCT word is encoded once by the rank-ordered
    * replace chain, then token counts roll up corpus-weighted. */
  def bpeEncodeWordFreq(wordFreq: DataFrame,
      merges: Seq[(Int, String, String, String, Long)], topK: Int): DataFrame = {
    val delimited = array_join(
      transform(sequence(lit(1), length(col("word"))),
        i => concat(lit("\n"), col("word").substr(i, lit(1)), lit("\n"))),
      "")
    val encoded = merges.foldLeft(delimited) { case (c, (_, a, b, m, _)) =>
      call_function("replace", c,
        lit("\n" + a + "\n\n" + b + "\n"), lit("\n" + m + "\n"))
    }
    val toks = wordFreq
      .select(col("n"), explode(filter(split(encoded, "\n", -1),
        x => x =!= lit(""))).as("token"))
      .groupBy(col("token")).agg(sum(col("n")).as("n_occurrences"))
    val total = toks.agg(sum(col("n_occurrences")).as("total_tokens"))
    toks.crossJoin(broadcast(total))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)
  }

  /**
   * q124: tokenizer fertility audit — per language, how the ONE shared
   * BPE tokenizer (trained by [[bpeFitMerges]], the q97 loop) treats that
   * language's text: tokens per word (fertility — the standard
   * multilingual-tokenizer health metric: a language with fertility ≫
   * the corpus mean pays more sequence length per word and trains
   * worse), characters per token (compression), and the raw word/token
   * mass. A training-data pipeline reads this table before fixing a
   * tokenizer: it is where under-served languages show up.
   *
   * 100 TB posture — the [[bpeEncodeOf]] discipline verbatim: one corpus
   * scan into the per-(lang, word) frequency table (map-side combined,
   * vocab-sized), each DISTINCT word encoded once by the nMerges-step
   * literal replace chain (driver-fit model constants), and the final
   * per-language aggregate runs over vocab rows. Ratios divide exact
   * long sums and round to 6 dp, so cross-engine parity needs no decimal
   * machinery. NULL-lang documents form their own audit row.
   */
  def bpeFertility(s: SparkSession, d: String, nMerges: Int = 8,
      vocabCap: Int = 65536): DataFrame =
    bpeFertilityOf(documents(s, d), nMerges, vocabCap)

  /** [[bpeFertility]] over an arbitrary (lang, text) frame. */
  def bpeFertilityOf(docs: DataFrame, nMerges: Int, vocabCap: Int): DataFrame = {
    val merges = bpeFitMerges(docs, nMerges, vocabCap)
    val wordFreq = docs
      .select(col("lang"), explode(words(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
    val delimited = array_join(
      transform(sequence(lit(1), length(col("word"))),
        i => concat(lit("\n"), col("word").substr(i, lit(1)), lit("\n"))),
      "")
    val encoded = merges.foldLeft(delimited) { case (c, (_, a, b, m, _)) =>
      call_function("replace", c,
        lit("\n" + a + "\n\n" + b + "\n"), lit("\n" + m + "\n"))
    }
    wordFreq
      .withColumn("n_toks",
        size(filter(split(encoded, "\n", -1), x => x =!= lit(""))).cast("long"))
      .withColumn("n_chars", length(col("word")).cast("long"))
      .groupBy(col("lang"))
      .agg(
        sum(col("n")).as("n_words"),
        sum(col("n") * col("n_toks")).as("n_tokens"),
        round(sum(col("n") * col("n_toks")).cast("double") /
          sum(col("n")), 6).as("fertility"),
        round(sum(col("n") * col("n_chars")).cast("double") /
          sum(col("n") * col("n_toks")), 6).as("chars_per_token"))
  }

  /**
   * q125: per-document lexical entropy profile — the Shannon entropy of
   * each document's word distribution (and its normalized form
   * H / log₂ types), aggregated per language. The signal between q70's
   * repetition ratios and q105's corpus-level Zipf fit: low entropy flags
   * templated/repetitive text (a C4/Gopher-family quality dial), entropy
   * ≈ its maximum flags word-salad; filter thresholds come from this
   * table's per-language distribution, not from a global constant.
   *
   * Determinism: per-(doc, word) entropy terms are rounded to 6 dp and
   * summed as DECIMAL (the q99 discipline), the normalized form rounds
   * per doc before the per-language decimal average, so both engines
   * aggregate identical values in any order. Single-type docs define
   * norm_entropy = 0 (H is 0; log₂ 1 would divide by zero). Documents
   * with no words (null text) carry no distribution and are excluded —
   * they are q88/q91's concern, not an entropy signal.
   *
   * 100 TB posture: one corpus scan into (doc, word, count) map-side
   * partials; everything after is doc- then language-keyed narrow
   * aggregates. No broadcast state at all.
   */
  def entropyProfile(s: SparkSession, d: String): DataFrame =
    entropyProfileOf(documents(s, d))

  /** [[entropyProfile]] over an arbitrary (doc_id, lang, text) frame.
    *
    * Round 20 (guide §2.4 "remove shuffles outright" / §1.2): MAP-SIDE
    * per-document form. The old spelling exploded words to rows, paid an
    * Exchange for the (doc, lang, word) count aggregate, a second for the
    * per-doc totals aggregate, a doc-keyed shuffle JOIN to attach them,
    * and a fourth exchange for the language rollup — four shuffles of
    * corpus-derived rows for a quantity that is a pure per-document
    * function of the text. Here the per-(doc, word) counts come from
    * run lengths over the SORTED words array (boundary positions where
    * sorted[i] ≠ sorted[i−1] — the CDC starts/slices trick), the 6-dp
    * rounded entropy terms decimal-sum in-row with `aggregate`, and the
    * whole document collapses to one (lang, types, h, norm_h) row in the
    * scan stage; the ONLY shuffle left is the language rollup (map-side
    * combined, |langs| rows). Each intermediate array (`ws`, sorted
    * `sw`, `starts`) is an explode-of-1-element-array Generate output so
    * CollapseProject cannot inline the tokenizer into the sort, the sort
    * into the boundary lambda, or the boundary filter into the
    * run-length lambda (the round-7 O(n²) hazard).
    *
    * Value equivalence (pinned by Round10OpsSpec's scalar replay and the
    * q125 oracle hash): run lengths over the sorted array ≡ the old
    * per-(doc, word) counts; p, the 6-dp term round, the decimal(38,6)
    * sum (Spark's Sum over decimal(28,6) widens to exactly that type),
    * types ≡ count of distinct words, and the norm_h spelling are
    * unchanged expression for expression. */
  def entropyProfileOf(docs: DataFrame): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), col("lang"),
        explode(array(words(col("text")))).as("ws"))
      // NULL text ⇒ NULL ws: the old explode emitted no rows for it and
      // the doc was excluded — same here
      .filter(col("ws").isNotNull)
      .select(col("lang"), explode(array(sort_array(col("ws")))).as("sw"))
      // run starts (0-based): 0, plus every i where the sorted word
      // changes — one run per distinct word, run length = its count
      .select(col("lang"), col("sw"), explode(array(concat(
        array(lit(0)),
        when(size(col("sw")) >= 2,
          filter(sequence(lit(1), size(col("sw")) - 1),
            i => get(col("sw"), i) =!= get(col("sw"), i - 1)))
          .otherwise(array().cast("array<int>"))))).as("starts"))
      .select(col("lang"),
        size(col("starts")).as("types"),
        aggregate(
          transform(sequence(lit(0), size(col("starts")) - 1),
            k => round(-((coalesce(get(col("starts"), k + 1), size(col("sw"))) -
                get(col("starts"), k)).cast("double") / size(col("sw"))) *
              log2((coalesce(get(col("starts"), k + 1), size(col("sw"))) -
                get(col("starts"), k)).cast("double") / size(col("sw"))), 6)
              .cast("decimal(18,6)")),
          lit(BigDecimal(0)).cast("decimal(38,6)"),
          (acc, x) => acc + x.cast("decimal(38,6)")).as("h"))
      .withColumn("norm_h",
        when(col("types") <= 1, lit(BigDecimal(0)).cast("decimal(18,6)"))
          .otherwise(round(col("h").cast("double") /
            log2(col("types").cast("double")), 6).cast("decimal(18,6)")))
    perDoc.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("h")).cast("double") / count(lit(1)), 6).as("avg_entropy"),
        round(sum(col("norm_h").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("avg_norm_entropy"),
        round(max(col("h")).cast("double"), 6).as("max_entropy"),
        round(min(col("h")).cast("double"), 6).as("min_entropy"))
  }

  /** Corpus-wide heavy hitters: the canonical distributed word count with a
    * deterministic top-k (count desc, word asc). Map-side partial aggs do
    * the heavy lifting; only (word, partial_count) pairs shuffle. */
  def heavyHitters(s: SparkSession, d: String, k: Int = 20): DataFrame =
    documents(s, d)
      .select(explode(words(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)

  /** 60-bit hash of a string (md5 prefix) — the engine-reproducible hash
    * convention shared with the chunk/shingle families. NULL in ⇒ NULL out. */
  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /**
   * q126: count-min-sketch heavy-hitter audit (Cormode & Muthukrishnan
   * 2005) — the MERGEABLE approximate counterpart of q52's exact word
   * count. The sketch is a depth×width table of bucket counts under
   * depth independent md5-derived hashes; a word's estimate is the MIN
   * of its depth bucket counts, which can only OVERESTIMATE (collisions
   * add, never subtract). Like q107/q110/q111, this is the honesty
   * audit: it computes both tiers and reports the per-word overestimate,
   * so an operator can pick (depth, width) from measured error before
   * trusting the sketch alone. The production path at 100 TB is the
   * sketch tier by itself: depth·width counters of FIXED size replace
   * the vocab-sized exact shuffle, the table is associative+commutative
   * under addition (map-side combined here; delta-mergeable across
   * streams — [[graft.streaming.StreamingCorpus.startCmsGate]] maintains
   * exactly this state).
   *
   * Determinism: row i's bucket is the i-th 32-bit slice of md5(word)
   * mod width (one digest per token), so both engines place every token
   * identically; counts are exact longs.
   */
  def cmsHeavyHitters(s: SparkSession, d: String, depth: Int = 4,
      width: Int = 1024, k: Int = 20): DataFrame =
    // spread (r19): one md5 per token + depth-way explode before the
    // first shuffle — the documented heavy-pre-shuffle-compute case
    cmsHeavyHittersOf(documentsSpread(s, d), depth, width, k)

  /** [[cmsHeavyHitters]] over an arbitrary (text) frame. */
  def cmsHeavyHittersOf(docs: DataFrame, depth: Int, width: Int,
      k: Int): DataFrame = {
    val toks = docs.select(explode(words(col("text"))).as("w"))
    val sketch = cmsSketchOf(toks, depth, width)
    val top = toks.groupBy(col("w").as("word"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("word"))
      .limit(k)
    cmsEstimatesOf(sketch, top, depth, width)
      .select(col("word"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overestimate"))
      .orderBy(col("n_exact").desc, col("word"))
  }

  /** Serve CMS estimates for a candidate `word` frame (other columns ride
    * along): min over the depth bucket counts, sketch broadcast. */
  def cmsEstimatesOf(sketch: DataFrame, candidates: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val carried = candidates.columns.map(col).toSeq
    candidates
      .select(carried :+
        explode(cmsSlices(md5(col("word")), depth, width)).as("ib"): _*)
      .select(carried :+ col("ib.i").as("i") :+ col("ib.b").as("b"): _*)
      .join(broadcast(sketch), Seq("i", "b"))
      .groupBy(carried: _*)
      .agg(min(col("c")).as("n_est"))
  }

  /** The (i, b, c) count-min sketch of a one-column (`w`) token stream:
    * ≤ depth·width rows, built map-side in ONE pass over the stream with
    * ONE md5 per token — the depth row-hashes are disjoint 32-bit slices
    * of that digest (the standard double-hashing discipline; Kirsch &
    * Mitzenmacher 2006 for the Bloom-family argument), so the per-token
    * cost does not scale with depth. */
  def cmsSketchOf(toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks
      .select(md5(col("w")).as("h"))
      .select(explode(cmsSlices(col("h"), depth, width)).as("ib"))
      .groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** The depth (i, b) CMS coordinates of one md5 digest: row i's bucket
    * is hex slice [8i+1, 8i+8] (32 bits) mod width. depth ≤ 4 — the
    * digest holds four disjoint 32-bit slices. */
  private def cmsSlices(h: Column, depth: Int, width: Int): Column = {
    require(depth <= 4, s"CMS depth $depth > 4: one md5 digest holds four 32-bit slices")
    transform(sequence(lit(0), lit(depth - 1)),
      i => struct(i.as("i"),
        pmod(conv(h.substr(i * lit(8) + lit(1), lit(8)), 16, 10).cast("long"),
          lit(width.toLong)).as("b")))
  }

  /**
   * Boilerplate span removal — the C4 / RefinedWeb "line dedup" rule over
   * a corpus whose documents carry no newlines: the repeated unit is a
   * non-overlapping `spanWords`-word span. A span whose hash occurs in
   * ≥ `dfThreshold` DISTINCT documents is boilerplate (navigation chrome,
   * license banners, templated headers) and is removed from EVERY document;
   * the cleaned text is reassembled in original span order. Differs from
   * [[graft.analytics.Sampling.chunkDedup]] (keep-first survivorship): here
   * no copy survives, which is the published C4 rule for spans that repeat
   * across documents.
   *
   * 100 TB posture: two clean corpus scans, corpus text never shuffles.
   * Scan 1 explodes (doc_id, span_hash) — 16 bytes/span — and aggregates
   * document frequency into the boilerplate drop set (a heavy-hitter table,
   * size ≤ total_spans / dfThreshold), pinned once with a lazy local
   * checkpoint whose materializing count() IS the one-job size probe that
   * selects the cleanse plan:
   *
   *  - set fits a broadcast (`maxBroadcastSpans`): the set collapses to one
   *    sorted-array row, scan 2 recomputes spans in-row and filters with
   *    the binary-search [[graft.functions.SortedContains]] — O(log |set|)
   *    per span, not `array_contains`'s O(|set|) linear walk — so cleansing
   *    stays a narrow map (same two-pass shape as the classifier filter's
   *    model/score split);
   *  - set too large (pathological boilerplate-heavy corpora — the df cap
   *    grows linearly with corpus size at a fixed threshold): DEGRADE to
   *    the exploded left-anti join against the checkpointed hash table
   *    (shuffle rows are (doc_id, pos, span) — span text, never documents)
   *    with ordered reassembly via the posexplode position key. Same
   *    semantics, pinned by BoilerplateDegradeSpec (forced-degrade ≡
   *    broadcast on identical corpora, incl. the hostile 50%-shared-span
   *    fixture); requires non-null doc_id (the corpus primary key).
   *
   * Output per document: span count, dropped count, kept whitespace tokens,
   * and a 60-bit hash of the reassembled cleaned text (pinning REASSEMBLY
   * ORDER, not just the drop set). All-spans-dropped ⇒ NULL cleaned text ⇒
   * NULL hash; NULL/empty text ⇒ one empty span (split semantics both
   * engines share) with 0 kept tokens.
   */
  def boilerplateRemoval(s: SparkSession, d: String,
      spanWords: Int = 8, dfThreshold: Int = 2): DataFrame =
    // spread (r19): span split + hash per span before the first shuffle
    boilerplateRemovalOf(documentsSpread(s, d), spanWords, dfThreshold)

  /** [[boilerplateRemoval]] over an arbitrary (doc_id, text) frame.
    * `maxBroadcastSpans` caps the broadcast drop set (default 4M hashes =
    * 32 MB of longs, comfortably under executor broadcast budgets); larger
    * sets take the anti-join degrade path. */
  def boilerplateRemovalOf(docs: DataFrame, spanWords: Int,
      dfThreshold: Int, maxBroadcastSpans: Long = 1L << 22): DataFrame = {
    val withSpans = docs
      .withColumn("w", words(coalesce(col("text"), lit(""))))
      .withColumn("spans", transform(
        sequence(lit(0),
          greatest(ceil(size(col("w")).cast("double") / spanWords), lit(1))
            .cast("int") - 1),
        i => array_join(slice(col("w"), i * spanWords + 1, lit(spanWords)), " ")))
    // scan 1: span document frequency -> boilerplate hash table, pinned so
    // the probe and the chosen cleanse plan share one materialization
    val dropSet = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      withSpans
        .select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"), hash60(col("span")).as("sh"))
        .groupBy(col("sh"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= dfThreshold)
        .select(col("sh")),
      eager = false)
    val nBoiler = dropSet.count() // one job: materializes + sizes the set
    if (nBoiler <= maxBroadcastSpans) {
      // scan 2: narrow cleanse against the broadcast sorted set, in-row
      // reassembly; probes are binary searches
      val boiler = dropSet.agg(sort_array(collect_set(col("sh"))).as("bp"))
      withSpans
        .crossJoin(broadcast(boiler))
        .withColumn("kept",
          filter(col("spans"), sp =>
            !graft.functions.SortedContains.sortedContains(
              col("bp"), hash60(sp))))
        .withColumn("cleaned",
          when(size(col("kept")) === 0, lit(null).cast("string"))
            .otherwise(array_join(col("kept"), " ")))
        .select(
          col("doc_id"),
          size(col("spans")).cast("long").as("n_spans"),
          (size(col("spans")) - size(col("kept"))).cast("long").as("n_dropped"),
          when(col("cleaned").isNull || col("cleaned") === "", lit(0L))
            .otherwise(size(split(col("cleaned"), "\\s+")).cast("long"))
            .as("kept_tokens"),
          hash60(col("cleaned")).as("cleaned_hash"))
    } else {
      // degrade: anti-join the exploded span stream against the hash
      // table, reassemble in position order
      val keptAgg = withSpans
        .select(col("doc_id"),
          posexplode(col("spans")).as(Seq("pos", "span")))
        .withColumn("sh", hash60(col("span")))
        .join(dropSet, Seq("sh"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("span")))).as("ps"))
        .select(col("doc_id"), size(col("ps")).as("n_kept"),
          array_join(transform(col("ps"), p => p.getField("span")), " ")
            .as("cleaned"))
      withSpans.select(col("doc_id"), size(col("spans")).as("ns"))
        .join(keptAgg, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          col("ns").cast("long").as("n_spans"),
          (col("ns") - coalesce(col("n_kept"), lit(0))).cast("long")
            .as("n_dropped"),
          when(col("cleaned").isNull || col("cleaned") === "", lit(0L))
            .otherwise(size(split(col("cleaned"), "\\s+")).cast("long"))
            .as("kept_tokens"),
          hash60(col("cleaned")).as("cleaned_hash"))
    }
  }

  /**
   * q129: paragraph-level exact dedup — the Dolma discipline, the
   * granularity between chunk-level dedup (q90) and boilerplate removal
   * (q98): every paragraph (fixed `spanWords`-word span, the same split
   * both span families share) is content-hashed, the FIRST occurrence in
   * global (doc_id, pos) order survives, every later copy — including
   * within-document repeats — is removed, and the cleaned text is
   * reassembled in position order. Differs from q98 exactly where Dolma
   * differs from C4-style boilerplate removal: q98 drops ALL copies of a
   * frequent span; paragraph dedup keeps one canonical copy.
   *
   * Output per document: paragraph count, dropped count, kept whitespace
   * tokens, and the 60-bit hash of the reassembled cleaned text (pinning
   * SURVIVORSHIP and REASSEMBLY ORDER, not just counts).
   *
   * 100 TB posture: the dedup shuffles only (doc_id, pos, hash60) rows —
   * span text never leaves its document row. One hash-keyed map-side-
   * combined min aggregate elects keepers, one hash-keyed equi-join marks
   * losers, one doc-keyed aggregate collects dropped positions, and
   * reassembly is an IN-ROW filter of the original span array against the
   * sorted drop-position set (binary-search probes, the q98 broadcast-
   * path discipline).
   */
  def paragraphDedup(s: SparkSession, d: String, spanWords: Int = 8): DataFrame =
    // spread (r19): span split + hash60 per span before the first shuffle
    paragraphDedupOf(documentsSpread(s, d), spanWords)

  /** [[paragraphDedup]] over an arbitrary (doc_id, text) frame; requires
    * non-null unique doc_id (the corpus primary key — survivorship is
    * (doc_id, pos)-ordered). */
  /** The shared paragraph split: `spans` = fixed `spanWords`-word windows
    * (the q98 spelling — NULL/empty text yields one empty span). */
  private[graft] def spanColumns(docs: DataFrame, spanWords: Int): DataFrame =
    docs
      // Generate barrier (r19, guide §1.2): explode of a 1-element array
      // materializes `w` as a Generate output attribute. As a plain
      // Project alias, CollapseProject inlined split(trim(text)) into the
      // spans lambda — re-tokenizing the document once PER SPAN (~nw/8
      // splits per doc; plan-verified `slice(split(trim(...)))` inside
      // lambdafunction). Generate output attributes cannot be inlined, so
      // the text is split exactly once per row.
      .select(col("*"),
        explode(array(words(coalesce(col("text"), lit(""))))).as("w"))
      .withColumn("spans", transform(
        sequence(lit(0),
          greatest(ceil(size(col("w")).cast("double") / spanWords), lit(1))
            .cast("int") - 1),
        i => array_join(slice(col("w"), i * spanWords + 1, lit(spanWords)), " ")))

  /** The paragraph occurrence stream (doc_id, pos, sh, n_toks) — the
    * narrow surface both the batch dedup and the streaming gate shuffle;
    * span TEXT never leaves its document row. */
  def paragraphOccurrencesOf(docs: DataFrame, spanWords: Int): DataFrame =
    spanColumns(docs, spanWords)
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"), hash60(col("span")).as("sh"),
        when(col("span") === "", 0L)
          .otherwise(size(split(col("span"), "\\s+")).cast("long")).as("n_toks"))

  def paragraphDedupOf(docs: DataFrame, spanWords: Int): DataFrame = {
    val withSpans = spanColumns(docs, spanWords)
    // the only shuffled surface: narrow (doc_id, pos, hash) occurrence rows
    val occ = withSpans
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"), hash60(col("span")).as("sh"))
    // keeper election: lexicographic min (doc_id, pos) per content hash —
    // associative/commutative, so map-side partials collapse hot hashes
    val keepers = occ.groupBy(col("sh"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
    val droppedPs = occ.join(keepers, "sh")
      .filter(col("doc_id") =!= col("k.doc_id") || col("pos") =!= col("k.pos"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("drop_ps"))
    withSpans.join(droppedPs, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("drop_ps").isNull, col("spans"))
          .otherwise(filter(col("spans"), (_, i) =>
            !graft.functions.SortedContains.sortedContains(
              col("drop_ps"), i.cast("long")))))
      .withColumn("cleaned",
        when(size(col("kept")) === 0, lit(null).cast("string"))
          .otherwise(array_join(col("kept"), " ")))
      .select(
        col("doc_id"),
        size(col("spans")).cast("long").as("n_paragraphs"),
        coalesce(size(col("drop_ps")), lit(0)).cast("long").as("n_dropped"),
        when(col("cleaned").isNull || col("cleaned") === "", lit(0L))
          .otherwise(size(split(col("cleaned"), "\\s+")).cast("long"))
          .as("kept_tokens"),
        hash60(col("cleaned")).as("cleaned_hash"))
  }

  /**
   * q132: content-defined chunk dedup — the CDC (Rabin/FastCDC) member of
   * the chunk family: chunk boundaries fall where a rolling content hash
   * satisfies the gear criterion (here: hash60 of the trailing word
   * bigram ≡ 0 mod `divisor`, average chunk ≈ `divisor` words), so an
   * INSERTION shifts only the chunks it touches — the boundary positions
   * downstream re-synchronize, where q90's fixed windows re-chunk the
   * whole tail. Output: the duplicate chunk mass (content hash, copy
   * count, document count, chunk length) — n_copies ≥ 2 only, so the
   * result is duplicate-mass-sized, not corpus-sized.
   *
   * Declared divergence from production CDC: no min/max chunk-length
   * clamp (pure gear criterion) — chunk lengths are geometric(1/divisor),
   * which is the analyzable baseline and keeps both engines' replay
   * identical.
   *
   * Plan shape (the winnowing discipline): words explode to rows, the
   * boundary bit is a lag window, the chunk id a running sum window —
   * whole-stage-codegen end to end, ONE shuffle on doc_id for the
   * windows, then hash-keyed aggregates; chunk text reassembles in-group
   * from sorted (pos, word) structs.
   */
  def cdcChunkDedup(s: SparkSession, d: String, divisor: Int = 16): DataFrame =
    // spread (r20): boundary hashing + chunk md5 are heavy pre-shuffle
    // compute now that chunking is map-side (identity at any real scan
    // width — the gram-family precedent)
    cdcChunkDedupOf(documentsSpread(s, d), divisor)

  /** [[cdcChunkDedup]] over an arbitrary (doc_id, text) frame. */
  def cdcChunkDedupOf(docs: DataFrame, divisor: Int): DataFrame =
    cdcChunkLedgerOf(cdcChunkOccurrencesOf(docs, divisor))

  /** The per-document CDC chunk rows (doc_id, chunk_id, chunk_md5, nw) —
    * a pure per-document function of the text (CDC boundaries are
    * content-local), which is what makes the streaming gate's state
    * arrival-order/replay independent: the batch audit counts these
    * rows, the gate ([[graft.streaming.StreamingCorpus.startCdcChunkGate]])
    * maintains exactly this table keyed (doc_id, chunk_id).
    *
    * Round 20 (guide §2.4 "remove shuffles outright"): MAP-SIDE array
    * form, the [[allGramHashesOf]]/[[winnowFingerprints]] move applied to
    * the chunk family. The old spelling posexploded words to rows and
    * paid an Exchange hashpartitioning(doc_id) for the lag/running-sum
    * windows plus a SECOND doc-keyed exchange to reassemble chunk text
    * with collect_list — two corpus-word-sized shuffles whose only
    * purpose was per-document bookkeeping that is computable in-row.
    * Here the boundary positions (gear criterion on the trailing word
    * bigram), the chunk start offsets, the chunk md5s and the chunk
    * lengths are all computed in the SCAN stage over the words array;
    * nothing shuffles until the consumer's own keyed operation
    * (q132's ledger aggregate / the gate's bucketed merge). Both
    * intermediate arrays (`ws`, `starts`) are explode-of-1-element-array
    * Generate outputs so CollapseProject cannot inline the tokenizer
    * into the boundary lambda or the boundary filter into the per-chunk
    * slice lambda (the round-7 O(n²) re-evaluation hazard).
    *
    * Boundary convention — pinned by CdcBoundaryFixtureSpec against the
    * retained windowed reference [[cdcChunkOccurrencesWindowed]] and by
    * the q132 oracle hash: a cut falls AFTER word p (0-based, p ≥ 1)
    * when hash60(w[p−1] ⧺ " " ⧺ w[p]) ≡ 0 mod divisor; a cut after the
    * LAST word creates no empty chunk (the old running-sum simply had no
    * row left to increment, so valid new-chunk starts are p+1 ≤ n−1);
    * NULL text yields no rows; empty text tokenizes to [""] and yields
    * one chunk of md5("") with nw = 1, exactly as the old posexplode
    * emitted its single (pos 0, "") row. */
  def cdcChunkOccurrencesOf(docs: DataFrame, divisor: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(array(words(col("text")))).as("ws"))
      .filter(col("ws").isNotNull)
      // chunk start offsets (0-based): 0, plus p+1 for every boundary
      // word p in 1..n−2 (a boundary at the last word opens no chunk)
      .select(col("doc_id"), col("ws"), explode(array(concat(
        array(lit(0)),
        when(size(col("ws")) >= 3,
          transform(
            filter(sequence(lit(1), size(col("ws")) - 2),
              p => hash60(concat_ws(" ",
                get(col("ws"), p - 1), get(col("ws"), p))) % divisor === 0),
            p => p + 1))
          .otherwise(array().cast("array<int>"))))).as("starts"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("starts")) - 1),
        k => struct(
          md5(array_join(slice(col("ws"), get(col("starts"), k) + 1,
            coalesce(get(col("starts"), k + 1), size(col("ws"))) -
              get(col("starts"), k)), " ").cast("binary")).as("m"),
          (coalesce(get(col("starts"), k + 1), size(col("ws"))) -
            get(col("starts"), k)).cast("long").as("nw"))))
        .as(Seq("chunk_id", "ch")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("ch.m").as("chunk_md5"), col("ch.nw").as("nw"))

  /** The pre-round-20 windowed spelling of [[cdcChunkOccurrencesOf]],
    * retained as the boundary-convention REFERENCE for
    * CdcBoundaryFixtureSpec: the map-side rewrite must match it row for
    * row on the planted boundary shapes (empty/NULL text, sub-3-word
    * docs, boundary at the last word, divisor 1 = cut everywhere).
    * Not called from any query path. */
  private[graft] def cdcChunkOccurrencesWindowed(docs: DataFrame,
      divisor: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cum = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    val wr = docs
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "word")))
    val withChunk = wr
      .withColumn("pw", lag(col("word"), 1).over(byDoc))
      .withColumn("b",
        when(col("pw").isNotNull &&
          hash60(concat_ws(" ", col("pw"), col("word"))) % divisor === 0, 1L)
          .otherwise(0L))
      .withColumn("chunk_id", coalesce(sum(col("b")).over(cum), lit(0L)))
    withChunk
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("word")))).as("pw"))
      .select(col("doc_id"), col("chunk_id"),
        md5(array_join(transform(col("pw"), p => p.getField("word")), " ")
          .cast("binary")).as("chunk_md5"),
        size(col("pw")).cast("long").as("nw"))
  }

  /** The q132 duplicate-chunk-mass ledger over a chunk-occurrence frame —
    * shared by the batch audit and the gate's served table. */
  def cdcChunkLedgerOf(occ: DataFrame): DataFrame = occ
    .groupBy(col("chunk_md5"))
    .agg(count(lit(1)).as("n_copies"),
      countDistinct(col("doc_id")).as("n_docs"),
      min(col("nw")).as("n_words"))
    .filter(col("n_copies") >= 2)

  /**
   * q135: linear-counting distinct-vocabulary sketch + audit — the
   * mergeable approximate COUNT-DISTINCT member of the sketch family
   * (Whang et al. 1990), next to q126's CMS (frequencies) and q115's
   * MinHash unions (set similarity): per language, an m-bit bitmap where
   * bit = hash(word) mod m; distinct-word estimate = −m·ln(z/m) with z
   * the unset-bit count. Chosen over HLL deliberately: the bitmap is
   * exact integer state both engines replay bit-for-bit, so the estimate
   * — unlike Spark's approx_count_distinct — is fully oracle-checkable,
   * and bitmaps merge by OR (map-side combinable, stream-mergeable).
   * The audit reports the exact distinct count and the relative error —
   * the q107/q110/q126 honesty discipline: m is chosen from measured
   * error, not faith.
   *
   * 100 TB posture: state is ≤ m rows per language no matter the corpus
   * (the (lang, bucket) distinct), one scan, map-side combines; the
   * exact tier is the corpus-linear audit part — production serves the
   * sketch alone.
   */
  /** The set bits of the q135 bitmap: distinct (lang, bucket) rows —
    * the state the batch audit counts and the streaming gate maintains
    * (set union is idempotent/commutative/associative, so the gate needs
    * no batch bookkeeping at all). */
  def vocabBuckets(docs: DataFrame, m: Int): DataFrame =
    docs.filter(col("lang").isNotNull)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .select(col("lang"), pmod(hash60(col("w")), lit(m.toLong)).as("b"))
      .distinct()

  /** The q135 estimate columns from a set-bit count — shared by the batch
    * audit and the gate's served table. */
  def linearCountEstimate(m: Int): Column =
    round(lit(-m.toDouble) *
      log((lit(m.toDouble) - col("n_set_bits")) / m.toDouble), 6)

  def distinctSketchAudit(s: SparkSession, d: String, m: Int = 4096): DataFrame = {
    val tok = documents(s, d)
      .filter(col("lang").isNotNull)
      .select(col("lang"), explode(words(col("text"))).as("w"))
    val buckets = vocabBuckets(documents(s, d), m)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_set_bits"))
    val exact = tok.groupBy(col("lang"))
      .agg(countDistinct(col("w")).as("n_exact"))
    val est = lit(-m.toDouble) * log((lit(m.toDouble) - col("n_set_bits")) / m.toDouble)
    exact.join(buckets, Seq("lang"))
      .select(col("lang"), col("n_exact"), col("n_set_bits"),
        linearCountEstimate(m).as("n_est"),
        round(abs(est - col("n_exact")) / col("n_exact"), 6).as("rel_err"))
  }

  /**
   * q134: script profile — per-language mean character-class fractions
   * (Latin letters, Cyrillic, CJK unified, digits, whitespace), the
   * mC4/CCNet script-filtering signal: a "lang=en" slice with rising CJK
   * or Cyrillic mass is misrouted text or mojibake the lang-id pass
   * missed (complements q104's encoding-quality profile).
   *
   * Cross-engine determinism: classes are EXPLICIT codepoint ranges in
   * `\x{...}` syntax (identical semantics in Java regex and RE2 —
   * named classes like \p{IsLatin} diverge between engines) and
   * whitespace is the explicit [ \t\n\r\f] set (Java's \s includes
   * \x0B, RE2's does not); per-doc fractions round to 6 dp then sum as
   * DECIMAL (the q125 discipline), so aggregation order cannot fork
   * the engines. Char counts are codepoint counts on both sides.
   *
   * 100 TB posture: one scan, per-row regexp counts (codegen'd), one
   * lang-keyed map-side-combined aggregate.
   */
  def scriptProfile(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    val n = length(t).cast("double")
    def frac(pat: String) = when(n > 0,
      round((length(t) - length(regexp_replace(t, pat, ""))).cast("double") / n, 6)
        .cast("decimal(18,6)"))
    val classes = Seq(
      "latin" -> "[A-Za-z]",
      "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
      "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
      "digit" -> "[0-9]",
      "space" -> "[ \\t\\n\\r\\f]")
    val perDoc = documents(s, d).select(
      col("lang") +: classes.map { case (nm, p) => frac(p).as(nm) }: _*)
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        classes.map { case (nm, _) =>
          when(count(col(nm)) > 0,
            round(sum(col(nm)).cast("double") / count(col(nm)), 6))
            .as(s"avg_$nm") }: _*)
  }

  /**
   * CCNet-style language-model quality bucketing: score every document by
   * its average bigram negative log-probability under a per-language model
   * trained on the corpus itself (add-one smoothing over the observed
   * vocabulary), then split each language into head / middle / tail
   * perplexity terciles — the exact selection signal CCNet feeds a KenLM
   * model; here the LM is the corpus-trained bigram table, which is the
   * distributed observable (KenLM's k-gram backoff weights are a modeling
   * refinement on the same count table).
   *
   * 100 TB posture: the MODEL is vocabulary-BOUNDED by the `vocabCap`
   * knob ([[bpeTrain]]'s word-table discipline): only the top `vocabCap`
   * unigrams and bigrams per language (by count, ties broken by gram) are
   * retained, so the broadcast count tables are ≤ 2·cap·|langs| rows no
   * matter how the corpus's distinct-gram count grows (Heaps' law makes
   * the uncapped table corpus-bounded, not type-bounded — it WILL outgrow
   * Spark's 8 GB broadcast ceiling on a real crawl). Grams that miss the
   * capped tables fall to the add-one smoothing floor (cb→0, cu→0 ⇒
   * denominator V), which is the published CCNet treatment of
   * out-of-vocabulary grams anyway. Scoring is a second NARROW scan:
   * per-bigram rows hash-join the broadcast tables, so no corpus-sized
   * shuffle and no text shuffle. Only (doc_id, lang, score) — 3 narrow
   * columns — enters the tercile window. Per-bigram terms are rounded to
   * 6 dp and summed as DECIMAL so the in-row (array-order) sum and the
   * oracle's join-order sum agree exactly. On a corpus whose vocabulary
   * sits under the cap the capped model IS the uncapped model
   * (Round9OpsSpec pins capped ≡ uncapped there; the oracle SQL carries
   * the same cap predicate).
   *
   * Documents with < 2 words have no bigrams ⇒ NULL score ⇒ bucket "none"
   * (kept, so the per-language tally still partitions the corpus).
   */
  def perplexityBuckets(s: SparkSession, d: String): DataFrame =
    // spread (r19): tokenize + bigram explode + per-term decimal
    // rounding before the first shuffle
    perplexityBucketsOf(documentsSpread(s, d))

  /** Default model cap: 64Ki grams per table per language — bpeTrain's
    * vocab discipline; comfortably broadcastable at any corpus size. */
  val PerplexityVocabCap = 65536

  /** [[perplexityBuckets]] over an arbitrary (doc_id, lang, text) frame. */
  /**
   * q156: Moore–Lewis cross-entropy-difference selection (Moore & Lewis
   * 2010) — the third member of the data-selection triad (q123 DSIR =
   * hashed importance weights, q154 = quality-budget greedy): score every
   * document by mean bigram NLL under the GENERAL corpus model minus
   * mean bigram NLL under the IN-DOMAIN model trained on the reference
   * source (largest source, q147's deterministic pick), and select
   * score > 0 — the classic threshold: the in-domain model finds the
   * document strictly easier than the general one. Both models follow
   * q99's exact conventions (vocabCap-bounded count tables, add-one
   * smoothing over the capped vocabulary, -log10, 6-dp decimal term
   * sums), so all three selectors share one modeling vocabulary.
   *
   * Documents with no bigrams (< 2 words, incl. NULL text) have NULL
   * score and are never selected, but stay in the per-source tally.
   *
   * 100 TB posture: ONE token explode feeds a combined (gram, general
   * count, in-domain count) aggregate — the in-domain flag is a
   * broadcast-joined predicate, not a second scan — and each model's cap
   * is the q99 two-stage partial top-K (64 hash sub-buckets, then a
   * cap-bounded global stage), so all four count tables broadcast at
   * ≤ cap rows regardless of vocabulary growth. Scoring is a second
   * narrow pass over the per-bigram stream with four broadcast hash
   * joins and a map-side-combined per-doc decimal sum; the ledger is a
   * per-source aggregate. Nothing corpus-sized ever shuffles.
   */
  def mooreLewis(s: SparkSession, d: String,
      vocabCap: Int = PerplexityVocabCap): DataFrame =
    mooreLewisOf(documentsSpread(s, d), vocabCap)

  /** [[mooreLewis]] over an arbitrary (doc_id, source, text) frame.
    *
    * The model bundle is PINNED before scoring: [[mooreLewisScoreOf]]
    * filters it five ways (four count tables + the ref row), and without
    * the pin each filter branch re-plans the whole union — re-running
    * every capping window and both count scans per branch (measured:
    * 3.35 s vs 2.5 s at sf0.1; the streaming gate caches the bundle for
    * the same reason). ≤ 4·cap + 1 rows, so the pin is tiny. */
  def mooreLewisOf(docs: DataFrame, vocabCap: Int): DataFrame =
    mooreLewisLedgerOf(
      mooreLewisScoreOf(docs,
        org.apache.spark.sql.GraftBridge.checkpointNoStats(
          mooreLewisModelsOf(docs, vocabCap), eager = false)))

  /**
   * The FROZEN q156 model bundle as one tagged narrow frame — four
   * capped count tables (`ug`/`ut` unigrams, `bg`/`bt` bigrams; general
   * vs in-domain) plus the `ref` row naming the reference source. Built
   * once from the corpus snapshot; [[mooreLewisScoreOf]] and the
   * streaming gate ([[graft.streaming.StreamingCorpus.startMooreLewisGate]])
   * both score against it, so batch and stream share one model by
   * construction. ≤ 4·cap + 1 rows regardless of corpus size.
   */
  def mooreLewisModels(s: SparkSession, d: String,
      vocabCap: Int = PerplexityVocabCap): DataFrame =
    mooreLewisModelsOf(documents(s, d), vocabCap)

  /** [[mooreLewisModels]] over an arbitrary (doc_id, source, text) frame. */
  def mooreLewisModelsOf(docs: DataFrame, vocabCap: Int): DataFrame = {
    val wsDocs = docs
      .withColumn("w", words(col("text")))
      .withColumn("nw", coalesce(size(col("w")), lit(0)))
    // reference (in-domain) source: the q147 deterministic pick
    val ref = wsDocs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_docs").desc, col("source").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("source").as("ref_source"))
    val flagged = wsDocs.join(broadcast(ref))
      .withColumn("is_tgt", (col("source") <=> col("ref_source")).cast("long"))
    // ONE explode feeds both models' unigram counts
    val uCounts = flagged
      .select(col("is_tgt"), explode(col("w")).as("w1"))
      .groupBy(col("w1"))
      .agg(count(lit(1)).as("cu_g"), sum(col("is_tgt")).as("cu_t"))
    // ... and one bigram explode feeds both models' bigram counts
    val bCounts = mlBigramsOf(flagged, Seq("is_tgt"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cb_g"), sum(col("is_tgt")).as("cb_t"))
    // Round 19 (guide §2.4 "remove shuffles outright"): the four capped
    // count tables stack into ONE (kind, gram, cnt) stream and cap in one
    // two-stage window pass partitioned by kind — per-kind ranks are
    // identical to the four separate [[cappedTopKByKind]] runs (the kind
    // column just adds a partition key), so the bundle's rows are
    // unchanged, while 8 window exchanges collapse to 2.
    val stacked = uCounts
      .select(col("w1").as("gram"), lit("ug").as("kg"), lit("ut").as("kt"),
        col("cu_g").as("cg"), col("cu_t").as("ct"))
      .unionByName(bCounts.select(col("b").as("gram"), lit("bg").as("kg"),
        lit("bt").as("kt"), col("cb_g").as("cg"), col("cb_t").as("ct")))
      .select(col("gram"), explode(array(
        struct(col("kg").as("kind"), col("cg").as("cnt")),
        struct(col("kt").as("kind"), col("ct").as("cnt")))).as("e"))
      .select(col("e.kind").as("kind"), col("gram"), col("e.cnt").as("cnt"))
    cappedTopKByKind(stacked, vocabCap)
      .unionByName(ref.select(lit("ref").as("kind"),
        col("ref_source").as("gram"), lit(0L).as("cnt")))
  }

  /** Per-bigram stream: `b` = "w[i] w[i+1]" plus `w1` = w[i] carried
    * STRUCTURALLY from the explode — scoring must never re-derive w1 by
    * splitting `b` (correct only while words() tokens cannot contain a
    * space; the DuckDB oracle carries w[i] directly, so both engines now
    * derive it identically by construction). */
  /** q99's two-stage partial top-K over a stacked (kind, gram, cnt)
    * stream, capped per kind (each model caps by its own count; the
    * 64-hash-sub-bucket stage bounds every sort — no one-task vocabulary
    * sort at any corpus size, and the global stage's per-kind partitions
    * each sort ≤ 64·cap survivors). One window pass caps EVERY stacked
    * model — per-kind ranks equal the per-table spelling's exactly, the
    * plan pays 2 exchanges instead of 2 per model (r19, guide §2.4).
    * Shared by the q156 model builder and [[generalBigramModelOf]]. */
  private def cappedTopKByKind(df: DataFrame, vocabCap: Int): DataFrame = {
    val local = df.filter(col("cnt") > 0)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("kind"), pmod(xxhash64(col("gram")), lit(64L)))
          .orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rn") <= vocabCap)
      .drop("rn")
    local.withColumn("rn", row_number().over(
        Window.partitionBy(col("kind"))
          .orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rn") <= vocabCap)
      .drop("rn")
  }

  /** The GENERAL-corpus half of the q156 bundle — capped `ug`/`bg` count
    * tables only (no in-domain flag, no reference pick): the shared
    * reference model for consumers that score against the whole corpus
    * (q157 domain reweighting). Input must carry `w`/`nw` (words()
    * array + its size). ≤ 2·cap rows regardless of corpus size. */
  private def generalBigramModelOf(wsDocs: DataFrame,
      vocabCap: Int): DataFrame = {
    val uCounts = wsDocs
      .select(explode(col("w")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu_g"))
    val bCounts = mlBigramsOf(wsDocs, Seq.empty)
      .groupBy(col("b")).agg(count(lit(1)).as("cb_g"))
    // stacked capping: one two-stage window pass for both models (r19,
    // guide §2.4) — per-kind rows identical to the per-table spelling
    cappedTopKByKind(
      uCounts.select(lit("ug").as("kind"), col("w1").as("gram"),
          col("cu_g").as("cnt"))
        .unionByName(bCounts.select(lit("bg").as("kind"), col("b").as("gram"),
          col("cb_g").as("cnt"))),
      vocabCap)
  }

  private def mlBigramsOf(df: DataFrame, extra: Seq[String]): DataFrame = df
    .filter(col("nw") >= 2)
    .select(extra.map(col) :+ explode(transform(
      sequence(lit(1), col("nw") - 1),
      i => struct(element_at(col("w"), i).as("w1"),
        concat(element_at(col("w"), i), lit(" "),
          element_at(col("w"), i + 1)).as("b")))).as("bg"): _*)
    .select(extra.map(col) :+ col("bg.w1").as("w1") :+
      col("bg.b").as("b"): _*)

  /**
   * Score (doc_id, source, text) rows against a FROZEN q156 model
   * bundle: per-doc (doc_id, source, nw, score, is_ref). A score is a
   * pure function of (document content, models) — arrival-order,
   * batching and re-delivery independent, which is what makes the
   * streaming gate's ledger ≡ batch under any replay.
   */
  def mooreLewisScoreOf(docs: DataFrame, models: DataFrame): DataFrame = {
    // Round 19 (guide §3.1 / §2.4): the four count-table lookups probe ONE
    // broadcast of the whole bundle, keyed on gram, with the per-kind
    // predicate riding the join condition — all four BroadcastHashJoins
    // canonicalize to the same build, so the plan holds 1 BroadcastExchange
    // + 3 ReusedExchanges instead of 4 separately built (and separately
    // jobbed) broadcasts. (kind, gram) is unique in the bundle, so each
    // left probe still matches ≤ 1 row — per-row results are unchanged.
    // Both vocabulary sizes come from ONE aggregate over the bundle
    // (previously two single-row count jobs + two crossJoin broadcasts).
    def m(a: String): DataFrame = models.select(col("kind").as(s"${a}_kind"),
      col("gram").as(s"${a}_gram"), col("cnt").as(s"${a}_cnt"))
    val refF = models.filter(col("kind") === "ref")
      .select(col("gram").as("ref_source"))
    val vRow = models.agg(
      sum(when(col("kind") === "ug", 1L).otherwise(0L)).as("v_g"),
      sum(when(col("kind") === "ut", 1L).otherwise(0L)).as("v_t"))
    val wsDocs = docs
      .withColumn("w", words(col("text")))
      .withColumn("nw", coalesce(size(col("w")), lit(0)))
    // scoring pass: per-bigram terms under both models, decimal-summed
    val terms = mlBigramsOf(wsDocs, Seq("doc_id"))
      .join(broadcast(m("bg")),
        col("b") === col("bg_gram") && col("bg_kind") === "bg", "left")
      .join(broadcast(m("bt")),
        col("b") === col("bt_gram") && col("bt_kind") === "bt", "left")
      .join(broadcast(m("ug")),
        col("w1") === col("ug_gram") && col("ug_kind") === "ug", "left")
      .join(broadcast(m("ut")),
        col("w1") === col("ut_gram") && col("ut_kind") === "ut", "left")
      .withColumn("cb_g", col("bg_cnt")).withColumn("cb_t", col("bt_cnt"))
      .withColumn("cu_g", col("ug_cnt")).withColumn("cu_t", col("ut_cnt"))
      .join(broadcast(vRow))
      // v = 0 (an empty model: e.g. the reference source holds only NULL
      // texts on a hostile corpus) would divide by zero — guard to NULL,
      // which nulls every doc's score through the null-skipping sum and
      // selects nothing: the honest answer for a meaningless model
      .withColumn("term_g",
        when(col("v_g") > 0,
          round(-log(10.0, (coalesce(col("cb_g"), lit(0L)) + 1.0) /
            (coalesce(col("cu_g"), lit(0L)) + col("v_g"))), 6))
          .cast("decimal(18,6)"))
      .withColumn("term_t",
        when(col("v_t") > 0,
          round(-log(10.0, (coalesce(col("cb_t"), lit(0L)) + 1.0) /
            (coalesce(col("cu_t"), lit(0L)) + col("v_t"))), 6))
          .cast("decimal(18,6)"))
    val scores = terms.groupBy(col("doc_id"))
      .agg(round((sum(col("term_g")).cast("double") / count(lit(1))) -
          (sum(col("term_t")).cast("double") / count(lit(1))), 6).as("score"))
    wsDocs.select(col("doc_id"), col("source"), col("nw"))
      .join(scores, Seq("doc_id"), "left")
      .join(broadcast(refF))
      .withColumn("is_ref", col("source") <=> col("ref_source"))
      .select(col("doc_id"), col("source"), col("nw"), col("score"),
        col("is_ref"))
  }

  /** The q156 per-source ledger over scored rows (shared by batch and
    * the streaming gate's served view). */
  def mooreLewisLedgerOf(scored: DataFrame): DataFrame =
    scored.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("score").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("score") > 0, col("nw").cast("long")).otherwise(0L))
          .as("selected_tokens"),
        when(count(col("score")) > 0,
          round(sum(col("score").cast("decimal(18,6)")).cast("double") /
            count(col("score")), 6)).as("avg_score"),
        max(col("is_ref").cast("int")).as("is_ref_i"))
      .withColumn("is_ref", col("is_ref_i") === 1)
      .drop("is_ref_i")

  /**
   * q157: DoReMi-lite domain reweighting (Xie et al. 2023, deterministic
   * reduction) — the fourth member of the data-selection family (q123
   * DSIR = importance weights, q154 = quality budget, q156 = Moore–Lewis
   * threshold; this one sets the per-DOMAIN mixture): each source's
   * difficulty is its token-weighted mean bigram NLL under the shared
   * general corpus model (q99/q156 conventions — capped vocab, add-one
   * smoothing, -log10, 6-dp decimal terms), and `rounds` steps of the
   * multiplicative-weights update
   * `w ← normalize(w · exp(eta · (nll − min nll)))` upweight the domains
   * the reference model finds hardest — DoReMi's excess-loss signal with
   * the trained proxy model replaced by the deterministic corpus bigram
   * model, so both engines replay the whole computation bit-for-bit.
   * Sources with no bigrams (all-NULL/short texts) keep NULL nll/weight
   * and never enter the mixture; NULL source is its own domain.
   *
   * Cross-engine float discipline: nll is rounded to 6 dp FIRST; each
   * round's unnormalized weight is quantized to DECIMAL(28,12) — a
   * 1-ulp exp() divergence (~1e-16) sits far below that quantum, and
   * the decimal SUM is exact and order-independent — then the
   * normalized weight re-rounds to 6 dp. Identical spelling in the
   * DuckDB oracle's unrolled round CTEs.
   *
   * 100 TB posture: ONE bigram stream over the corpus (q156's), two
   * broadcast model joins, a per-source map-side-combined decimal
   * aggregate; the mirror-descent loop runs DRIVER-side over ≤ |domains|
   * rows (the bpeFitMerges / k-means-codebook model-fit discipline) and
   * the output is |domains| rows.
   */
  def domainReweight(s: SparkSession, d: String,
      vocabCap: Int = PerplexityVocabCap, rounds: Int = 3,
      eta: Double = 1.0): DataFrame =
    domainReweightOf(documentsSpread(s, d), vocabCap, rounds, eta)

  /** [[domainReweight]] over an arbitrary (doc_id, source, text) frame. */
  def domainReweightOf(docs: DataFrame, vocabCap: Int, rounds: Int,
      eta: Double): DataFrame = {
    val spark = docs.sparkSession
    val wsDocs = docs
      .withColumn("w", words(col("text")))
      .withColumn("nw", coalesce(size(col("w")), lit(0)))
    // pinned for the same reason as the q156 bundle: the scoring pass
    // filters it two ways + the vocab count — without the pin each
    // branch re-plans both capping windows
    val models = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      generalBigramModelOf(wsDocs, vocabCap), eager = false)
    // shared-broadcast scoring (r19, guide §3.1 / §2.4): both lookups
    // probe ONE broadcast of the bundle keyed on gram (kind predicate in
    // the join condition → 1 BroadcastExchange + 1 ReusedExchange), and
    // the vocabulary size is one aggregate over the same pin
    def m(a: String): DataFrame = models.select(col("kind").as(s"${a}_kind"),
      col("gram").as(s"${a}_gram"), col("cnt").as(s"${a}_cnt"))
    val vG = models.agg(
      sum(when(col("kind") === "ug", 1L).otherwise(0L)).as("v_g"))
    val terms = mlBigramsOf(wsDocs, Seq("source"))
      .join(broadcast(m("bg")),
        col("b") === col("bg_gram") && col("bg_kind") === "bg", "left")
      .join(broadcast(m("ug")),
        col("w1") === col("ug_gram") && col("ug_kind") === "ug", "left")
      .withColumn("cb_g", col("bg_cnt")).withColumn("cu_g", col("ug_cnt"))
      .join(broadcast(vG))
      .withColumn("term_g",
        when(col("v_g") > 0,
          round(-log(10.0, (coalesce(col("cb_g"), lit(0L)) + 1.0) /
            (coalesce(col("cu_g"), lit(0L)) + col("v_g"))), 6))
          .cast("decimal(18,6)"))
    val perSource = terms.groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("term_g")).cast("double") / count(lit(1)), 6).as("nll"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    domainMixtureOf(perSource, counts, rounds, eta)
  }

  /** Driver-side mirror-descent + output assembly over a
    * (source, n_bigrams, nll) difficulty table and a (source, n_docs)
    * count table — ≤ |domains| rows each. Shared by batch q157 and the
    * streaming domain-reweight gate (which rebuilds the same two tables
    * from its per-doc score state), so the MW loop cannot fork between
    * the two paths. */
  private[graft] def domainMixtureOf(perSource: DataFrame, counts: DataFrame,
      rounds: Int, eta: Double): DataFrame = {
    val spark = perSource.sparkSession
    // driver-side mirror-descent over the |domains|-row difficulty table
    val act = perSource.select(col("source"), col("nll"))
      .filter(col("nll").isNotNull)
      .collect()
      .map(r => (Option(r.get(0)).map(_.toString), r.getDouble(1)))
      .sortBy(_._1) // deterministic driver iteration order (sums are exact anyway)
    val weights: Seq[(Option[String], Double)] =
      if (act.isEmpty) Seq.empty
      else {
        val mn = act.map(_._2).min
        val k = act.length
        var w: Seq[Double] = act.map(_ =>
          BigDecimal(1.0 / k).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        (1 to rounds).foreach { _ =>
          val u = act.zip(w).map { case ((_, nll), wi) =>
            BigDecimal(wi * math.exp(eta * (nll - mn)))
              .setScale(12, BigDecimal.RoundingMode.HALF_UP)
          }
          val sUm = u.sum // exact decimal sum — order-independent
          w = u.map(ui =>
            BigDecimal(ui.toDouble / sUm.toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        act.map(_._1).zip(w)
      }
    import spark.implicits._
    val wDf = weights.map { case (src, wt) => (src.orNull, wt) }
      .toDF("w_source", "weight")
    val ps = perSource.withColumnRenamed("source", "ps_source")
    counts
      .join(ps, col("source") <=> col("ps_source"), "left")
      .join(broadcast(wDf), col("source") <=> col("w_source"), "left")
      .select(col("source"), col("n_docs"), col("n_bigrams"), col("nll"),
        col("weight"))
  }

  /** The frozen general-corpus bigram model for the streaming
    * domain-reweight gate — q157's model built once from a corpus
    * snapshot (the q123/q156 frozen-model discipline: scores against a
    * frozen model are pure functions of content, hence replay-safe). */
  def domainModels(s: SparkSession, d: String,
      vocabCap: Int = PerplexityVocabCap): DataFrame =
    domainModelsOf(documents(s, d), vocabCap)

  /** [[domainModels]] over an arbitrary (doc_id, source, text) frame. */
  def domainModelsOf(docs: DataFrame,
      vocabCap: Int = PerplexityVocabCap): DataFrame =
    generalBigramModelOf(
      docs.withColumn("w", words(col("text")))
        .withColumn("nw", coalesce(size(col("w")), lit(0))),
      vocabCap)

  /**
   * Per-document q157 difficulty scores against a FROZEN model bundle:
   * (doc_id, source, n_bigrams, term_sum) with term_sum an exact
   * DECIMAL sum of the doc's 6-dp bigram NLL terms. A score row is a
   * pure function of (document content, models) — arrival-order,
   * batching and re-delivery independent — and the per-source
   * difficulty table is recoverable EXACTLY from the per-doc rows
   * (decimal addition is associative: Σ_source term_g ≡
   * Σ_docs Σ_doc term_g), which is what lets the streaming gate merge
   * doc-keyed score rows and still serve batch q157's numbers
   * bit-for-bit ([[domainReweightFromScores]]).
   */
  def domainScoreOf(docs: DataFrame, models: DataFrame): DataFrame = {
    val wsDocs = docs
      .withColumn("w", words(col("text")))
      .withColumn("nw", coalesce(size(col("w")), lit(0)))
    // shared-broadcast scoring — same plan shape as [[domainReweightOf]]
    def m(a: String): DataFrame = models.select(col("kind").as(s"${a}_kind"),
      col("gram").as(s"${a}_gram"), col("cnt").as(s"${a}_cnt"))
    val vG = models.agg(
      sum(when(col("kind") === "ug", 1L).otherwise(0L)).as("v_g"))
    val perDoc = mlBigramsOf(wsDocs, Seq("doc_id"))
      .join(broadcast(m("bg")),
        col("b") === col("bg_gram") && col("bg_kind") === "bg", "left")
      .join(broadcast(m("ug")),
        col("w1") === col("ug_gram") && col("ug_kind") === "ug", "left")
      .withColumn("cb_g", col("bg_cnt")).withColumn("cu_g", col("ug_cnt"))
      .join(broadcast(vG))
      .withColumn("term_g",
        when(col("v_g") > 0,
          round(-log(10.0, (coalesce(col("cb_g"), lit(0L)) + 1.0) /
            (coalesce(col("cu_g"), lit(0L)) + col("v_g"))), 6))
          .cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("term_g")).cast("decimal(38,6)").as("term_sum"))
    wsDocs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("term_sum"))
  }

  /** Rebuild q157's output from merged per-doc score rows
    * ([[domainScoreOf]]): the per-source difficulty table falls out of
    * exact decimal sums, and the SAME [[domainMixtureOf]] driver loop
    * runs over it — column-equal to batch [[domainReweight]] when the
    * scores' model was frozen from the corpus the rows cover. */
  def domainReweightFromScores(scored: DataFrame, rounds: Int = 3,
      eta: Double = 1.0): DataFrame = {
    val perSource = scored.groupBy(col("source"))
      .agg(
        when(sum(col("n_bigrams")) > 0, sum(col("n_bigrams")))
          .as("n_bigrams"),
        when(sum(col("n_bigrams")) > 0,
          round(sum(col("term_sum")).cast("double") /
            sum(col("n_bigrams")), 6)).as("nll"))
    val counts = scored.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    domainMixtureOf(perSource, counts, rounds, eta)
  }

  def perplexityBucketsOf(docs: DataFrame,
      vocabCap: Int = PerplexityVocabCap): DataFrame = {
    val wsDocs = docs
      .withColumn("w", words(col("text")))
      .withColumn("nw", coalesce(size(col("w")), lit(0)))
    // top-`vocabCap` grams per language, count-desc with gram tiebreak —
    // deterministic and identically ordered on both engines (UTF-8 byte
    // order == code-point order). TWO-STAGE partial top-K (round-10
    // ADVICE): a single per-language window funnels that language's whole
    // distinct-gram table through one task — a dominant language's
    // vocabulary becomes a one-partition sort/OOM hotspot at scale. Stage
    // one takes the top cap within 64 hash sub-buckets (64 parallel,
    // vocabulary-sized-but-partitioned sorts); the global top cap is a
    // subset of the sub-bucket survivors, so stage two sorts ≤ 64·cap
    // rows per language — bounded by the CAP, never by the vocabulary.
    // Survivors (and hence results) are identical to the one-window form.
    // Round 19 (guide §2.4): both per-lang capped tables stack into ONE
    // (kind, lang, gram, cnt) stream and cap in one two-stage window pass
    // partitioned by (kind, lang) — per-(kind, lang) ranks identical to
    // the two separate runs, 4 window exchanges → 2. The capped stack is
    // transient-pinned: it feeds the scoring broadcast AND the per-lang
    // vocabulary count, which otherwise each re-plan both windows.
    def capped(df: DataFrame): DataFrame = {
      val local = df.withColumn("rn", row_number().over(
          Window.partitionBy(col("kind"), col("lang"),
              pmod(xxhash64(col("gram")), lit(64L)))
            .orderBy(col("cnt").desc, col("gram"))))
        .filter(col("rn") <= vocabCap)
        .drop("rn")
      local.withColumn("rn", row_number().over(
          Window.partitionBy(col("kind"), col("lang"))
            .orderBy(col("cnt").desc, col("gram"))))
        .filter(col("rn") <= vocabCap)
        .drop("rn")
    }
    val stacked = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      capped(wsDocs
        .select(col("lang"), explode(col("w")).as("g"))
        .groupBy(col("lang"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit("u").as("kind"), col("lang"), col("g").as("gram"),
          col("cnt"))
        .unionByName(wsDocs
          .filter(col("nw") >= 2)
          .select(col("lang"), explode(transform(
            sequence(lit(1), col("nw") - 1),
            i => concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1)))).as("g"))
          .groupBy(col("lang"), col("g"))
          .agg(count(lit(1)).as("cnt"))
          .select(lit("b").as("kind"), col("lang"), col("g").as("gram"),
            col("cnt")))),
      eager = false)
    // Scoring = two BROADCAST hash joins of the per-bigram stream against
    // the vocab-bounded count tables + a map-side-combined per-doc decimal
    // sum. Round 8 replaced the per-row `element_at(map)` formulation:
    // Spark's GetMapValue is a LINEAR scan of the map's entry array, so
    // in-row lookups cost O(|vocab|) per bigram interpreted — 22 s at
    // sf0.1 vs ~1 s for the codegen'd join spelling below. The broadcast
    // correctness argument is unchanged (the count tables are exactly the
    // content the maps carried — type-bounded, not corpus-bounded; the
    // decimal per-term sum stays order-independent so values are
    // identical). NULL-lang bigram rows drop out of the equi-joins, which
    // reproduces the previous NULL-model → NULL-score behavior: the doc
    // rejoins with no score and lands in bucket 'none' on both engines.
    val vsize = stacked.filter(col("kind") === "u")
      .groupBy(col("lang")).agg(count(lit(1)).as("v"))
    val bigrams = wsDocs
      .filter(col("nw") >= 2)
      .select(col("doc_id"), col("lang"), explode(transform(
        sequence(lit(1), col("nw") - 1),
        i => struct(element_at(col("w"), i).as("w1"),
          concat(element_at(col("w"), i), lit(" "),
            element_at(col("w"), i + 1)).as("b")))).as("e"))
      .select(col("doc_id"), col("lang"),
        col("e.w1").as("w1"), col("e.b").as("b"))
    // both lookups probe ONE broadcast of the stacked tables keyed on
    // (lang, gram); the kind predicate rides the join condition, so the
    // second join reuses the first's broadcast build (r19, guide §3.1)
    def m(a: String): DataFrame = stacked.select(col("kind").as(s"${a}_kind"),
      col("lang").as(s"${a}_lang"), col("gram").as(s"${a}_gram"),
      col("cnt").as(s"${a}_cnt"))
    val perDoc = bigrams
      .join(broadcast(m("bi")),
        col("lang") === col("bi_lang") && col("b") === col("bi_gram") &&
          col("bi_kind") === "b", "left")
      .join(broadcast(m("un")),
        col("lang") === col("un_lang") && col("w1") === col("un_gram") &&
          col("un_kind") === "u", "left")
      .withColumn("cb", col("bi_cnt")).withColumn("cu", col("un_cnt"))
      .join(broadcast(vsize), Seq("lang")) // inner: NULL lang ⇒ no model
      .withColumn("term",
        round(-log10((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
          (coalesce(col("cu"), lit(0L)) + col("v")).cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("term").cast("decimal(28,6)")).cast("double") /
        count(lit(1)), 6).as("score"))
    val scored = wsDocs.select(col("doc_id"), col("lang"), col("nw"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("nw"), col("score"))
    // ONE pass over the scored table: the union-of-filters spelling
    // evaluated the whole model-join + per-doc-agg subtree once per
    // branch. Partitioning the tercile window by (lang, score IS NULL)
    // keeps the non-null terciles identical while the null partition's
    // ntile is computed-and-ignored ("none" wins in the CASE)
    val tercile = Window.partitionBy(col("lang"), col("score").isNull)
      .orderBy(col("score"), col("doc_id"))
    val bucketed = scored
      .withColumn("t", ntile(3).over(tercile))
      .withColumn("bucket",
        when(col("score").isNull, lit("none"))
          .when(col("t") === 1, lit("head"))
          .when(col("t") === 2, lit("middle"))
          .otherwise(lit("tail")))
    bucketed.groupBy(col("lang"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nw")).cast("long").as("n_tokens"),
        round(min(col("score")), 6).as("min_score"),
        round(max(col("score")), 6).as("max_score"))
  }

  /** Occurrences of `pattern` in `c` via the replace-and-diff char count
    * (single-char-class patterns only — each match removes exactly one
    * character). Engine-portable: Spark's `regexp_replace` and DuckDB's
    * 'g'-flagged form both replace every match, and both engines count
    * `length` in Unicode code points (the hostile fixture's non-BMP emoji
    * pin this). */
  private def charClassCount(c: Column, pattern: String): Column =
    length(c) - length(regexp_replace(c, pattern, ""))

  /**
   * q104: encoding-quality profile (the mojibake/corruption dashboard a
   * web-crawl ingest runs before anything else): per source — document
   * count, NULL-text count, and summed occurrences of C0/DEL control
   * characters, U+FFFD replacement characters (the smoking gun of a
   * mis-decoded byte stream), non-ASCII code points, and ≥2-length
   * whitespace runs (extraction artifacts).
   *
   * Pure narrow map over the scan — per-document regex counts fold into
   * whole-stage codegen, aggregate partially map-side; at 100 TB this is
   * one pass over the text bytes, no shuffle beyond the per-source rows.
   */
  def encodingQuality(s: SparkSession, d: String): DataFrame =
    encodingQualityOf(documentsSpread(s, d))

  /** [[encodingQuality]] over an arbitrary (source, text) frame. */
  def encodingQualityOf(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("text"))
      .withColumn("ctrl",
        charClassCount(col("text"), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"))
      .withColumn("repl", charClassCount(col("text"), "�"))
      .withColumn("nonascii", charClassCount(col("text"), "[^\\x00-\\x7F]"))
      // explicit whitespace class, NOT \s: Java's \s includes U+000B
      // (vertical tab) while RE2's does not, and U+000B is in the hostile
      // fixture's control-char vocabulary — the spelled-out class keeps
      // both engines counting the same runs
      .withColumn("wsruns", size(split(col("text"), "[ \\t\\n\\x0B\\f\\r]{2,}")) - 1)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
        coalesce(sum(col("ctrl")), lit(0L)).cast("long").as("ctrl_chars"),
        coalesce(sum(col("repl")), lit(0L)).cast("long").as("repl_chars"),
        coalesce(sum(col("nonascii")), lit(0L)).cast("long").as("non_ascii"),
        coalesce(sum(col("wsruns")), lit(0L)).cast("long").as("ws_runs"))

  /**
   * q105: Zipf fit + lexical-diversity profile. Per source: token and
   * type totals, type-token ratio, and the least-squares slope of
   * log₁₀(freq) against log₁₀(rank) over the top-100 tokens — natural
   * text sits near slope −1 (Zipf's law); templated/generated corpora
   * flatten or steepen, making the slope a cheap distribution-shift
   * alarm over a 100 TB corpus.
   *
   * Scale shape: the corpus collapses to the (source, token) frequency
   * table in one map-side-combined aggregate; the rank window runs over
   * that vocab-sized table, never the corpus. Determinism: ranks break
   * frequency ties by token; the regression inputs are 12-dp-rounded
   * logs and the moment sums are decimal (order-independent), so the
   * slope is bit-stable across partitionings and engines; a degenerate
   * single-point fit (denominator 0) is NULL, not NaN, on both sides.
   */
  def zipfDiversity(s: SparkSession, d: String, topN: Int = 100): DataFrame =
    zipfDiversityOf(documentsSpread(s, d), topN)

  /** [[zipfDiversity]] over an arbitrary (source, text) frame. */
  def zipfDiversityOf(docs: DataFrame, topN: Int): DataFrame = {
    val toks = docs.select(col("source"),
        explode(words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val freq = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("freq"))
    val totals = freq.groupBy(col("source")).agg(
      sum(col("freq")).as("n_tokens"),
      count(lit(1)).as("n_types"))
    val ranked = freq.withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("freq").desc, col("tok"))))
      .filter(col("rn") <= topN)
      .withColumn("x", round(log10(col("rn").cast("double")), 12))
      .withColumn("y", round(log10(col("freq").cast("double")), 12))
    val dec = "decimal(38,18)"
    val slope = ranked.groupBy(col("source")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x").cast(dec)).cast("double").as("sx"),
      sum(col("y").cast(dec)).cast("double").as("sy"),
      sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
    // null-safe: a NULL-source shard keeps its own profile row
    totals.join(slope.withColumnRenamed("source", "s2"),
        col("source") <=> col("s2"))
      .withColumn("denom", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(when(col("denom") =!= 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / col("denom")), 6)
          .as("zipf_slope"))
  }

  /**
   * q116: PMI collocations — the top-`topK` bigram collocations per
   * language by pointwise mutual information, with a `minCount` frequency
   * floor (rare pairs score spuriously high PMI; the floor is the
   * standard Church–Hanks guard). The table a tokenizer/phrase-mining
   * pass reads to decide which word pairs deserve a merged token, and a
   * cheap drift alarm: a corpus whose top collocations shift between
   * dumps changed register.
   *
   * PMI = log10(P(w1 w2) / (P(w1)·P(w2))), estimated from corpus counts:
   * log10((cb·NU·NU) / (NB·cu1·cu2)) — spelled with identical literal
   * association and a 6-dp round on both engines, and ranked by the
   * ROUNDED value (ties broken by the words), so a 1-ulp libm divergence
   * cannot flap the ordering across engines.
   *
   * 100 TB posture: the corpus collapses to per-language unigram/bigram
   * count tables in one map-side-combined pass each; everything after is
   * vocab-table joins keyed (lang, word) — uniformly distributed,
   * corpus-independent sizes once the `minCount` floor applies — and a
   * per-language window over ≤ topK·|langs| surviving rows. The corpus
   * itself is scanned twice and never shuffled.
   */
  def pmiCollocations(s: SparkSession, d: String,
      topK: Int = 20, minCount: Int = 3): DataFrame =
    pmiCollocationsOf(documents(s, d), topK, minCount)

  /** [[pmiCollocations]] over a (lang, text) frame.
    *
    * Round 20 fold-once A/B — tried, measured, REVERTED (guide §1.1
    * "optimize that one thing, then look again"): a q123-style single
    * tagged explode (unigrams with w2 = NULL + bigrams in one stream,
    * one aggregate, the fold serving all five downstream consumers) was
    * measured at sf0.1 min-of-3 in the same session as eager-pinned
    * 0.892 s, lazy-pinned 0.858 s and unpinned 0.894 s against this
    * two-scan spelling's 0.700 s: the tagged stream pushes 2n rows with
    * a two-string key through ONE hash aggregate (vs two n-row
    * single-string aggregates with map-side partials) and the pin's
    * localCheckpoint write/read of the vocab-sized fold costs more than
    * the second 17 MB scan it saves at this scale. At 100 TB the
    * trade-off may invert (two corpus scans vs one), but that claim
    * needs a cluster-scale measurement; the bench gate keeps the
    * two-scan form. */
  def pmiCollocationsOf(docs: DataFrame, topK: Int, minCount: Int): DataFrame = {
    val wsDocs = docs
      .filter(col("lang").isNotNull)
      .withColumn("w", words(col("text")))
      .withColumn("nw", coalesce(size(col("w")), lit(0)))
    val uni = wsDocs
      .select(col("lang"), explode(col("w")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cu"))
    val nu = uni.groupBy(col("lang")).agg(sum(col("cu")).as("nu"))
    val bi = wsDocs
      .filter(col("nw") >= 2)
      .select(col("lang"), explode(transform(
        sequence(lit(1), col("nw") - 1),
        i => struct(element_at(col("w"), i).as("w1"),
          element_at(col("w"), i + 1).as("w2")))).as("e"))
      .select(col("lang"), col("e.w1").as("w1"), col("e.w2").as("w2"))
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    val nb = bi.groupBy(col("lang")).agg(sum(col("cb")).as("nb"))
    pmiScoreOf(uni, nu, bi, nb, topK, minCount)
  }

  /** Scoring tier of [[pmiCollocationsOf]] over the fold-derived count
    * tables (spelling unchanged from the two-scan form). */
  private def pmiScoreOf(uni: DataFrame, nu: DataFrame, bi: DataFrame,
      nb: DataFrame, topK: Int, minCount: Int): DataFrame = {
    val scored = bi
      .filter(col("cb") >= minCount)
      .join(uni.select(col("lang"), col("tok").as("w1"), col("cu").as("cu1")),
        Seq("lang", "w1"))
      .join(uni.select(col("lang"), col("tok").as("w2"), col("cu").as("cu2")),
        Seq("lang", "w2"))
      .join(nu, Seq("lang"))
      .join(nb, Seq("lang"))
      .withColumn("pmi",
        round(log10((col("cb").cast("double") * col("nu") * col("nu")) /
          (col("nb").cast("double") * col("cu1") * col("cu2"))), 6))
    // two-stage partial top-K (round-10 ADVICE, the q99 `capped`
    // discipline): a dominant language's scored-bigram table never sorts
    // in one task — 64 sub-bucket windows first, then a topK-bounded
    // final rank identical to the one-window form
    val localTop = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), pmod(xxhash64(col("w1"), col("w2")), lit(64L)))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))))
      .filter(col("rn") <= topK)
      .drop("rn")
    localTop
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))))
      .filter(col("rank") <= topK)
      .select(col("lang"), col("w1"), col("w2"), col("cb"),
        col("pmi"), col("rank"))
  }

  /**
   * q119: BM25 retrieval — rank documents against a query-term set with
   * the Okapi BM25 weight (Robertson et al.), the lexical-retrieval
   * baseline every RAG / data-curation stack keeps next to its dense
   * index. The query set here is derived from the corpus itself (the
   * `nQueries` highest-document-frequency tokens, ties by token — a
   * deterministic, engine-independent choice; a production caller passes
   * its own terms through [[bm25TopDocsOf]]).
   *
   * score(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl)),
   * idf = log10((N − df + 0.5)/(df + 0.5) + 1) — the +1 keeps idf
   * positive for df > N/2 (the Lucene convention). Spelled with identical
   * literal association + a 6-dp round on both engines; ranks order by
   * the ROUNDED score with doc_id tiebreak, so a 1-ulp libm divergence
   * cannot flap them.
   *
   * 100 TB posture: one corpus scan explodes (doc_id, token) with an
   * in-row length; df is a vocab-sized map-side-combined aggregate; the
   * query set (a handful of rows) broadcasts into a semi-join so ONLY
   * postings of query terms survive the scan — the per-term posting
   * lists are the only corpus-derived rows that shuffle, and the final
   * top-k window runs per term over those lists.
   */
  def bm25TopDocs(s: SparkSession, d: String, nQueries: Int = 5,
      topDocs: Int = 10): DataFrame = {
    val docs = documents(s, d).filter(col("text").isNotNull)
    // round 20 fold-once: the query-term selection and the scoring pass
    // share ONE pinned tokenize fold instead of re-scanning the corpus
    val fold = bm25Fold(docs)
    // orderBy+limit plans as a distributed TakeOrdered (per-partition
    // heaps), never a global sort of the vocabulary
    val queries = fold.filter(col("tok").isNotNull)
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(nQueries)
      .select(col("tok"), col("df"))
    bm25ScoreOf(fold, queries, topDocs, 1.2, 0.75)
  }

  /** The pinned per-(doc, token) BM25 fold: (doc_id, len, tok, tf), one
    * row per distinct token per document, plus one (tok NULL, len NULL)
    * sentinel row for a NULL-text document so the corpus-level n_docs /
    * avgdl stay derivable (the old spelling's separate corpus aggregate
    * counted those rows too). Requires doc_id to be unique (the corpus
    * primary key) — n_docs is recovered as the fold's distinct doc_id
    * count.
    *
    * Round 20 (guide §1.2 / §2.3, the q123 fold-once move): the old
    * spelling scanned and tokenized the corpus THREE times (df table,
    * posting explode, corpus length aggregate) and paid a separate
    * (doc, tok) aggregate exchange for tf; this fold is ONE tokenize
    * pass whose pinned output serves df (rows per tok — the fold is
    * distinct per (doc, tok), ≡ the old array_distinct-based count),
    * tf/len (the fold rows themselves), and n_docs/avgdl (a per-doc
    * rollup). */
  private def bm25Fold(docs: DataFrame): DataFrame =
    // LAZY pin (r20 A/B at sf0.1, min-of-3, same session): lazy 0.605 s
    // = the old three-scan spelling's 0.605 s; eager 0.640 s (the
    // blocking materialization barrier costs more than it saves here);
    // UNPINNED 0.820 s (the three consumer subtrees each recompute the
    // fold — exchange reuse does not cover it). Kept pinned-lazy: same
    // wall at sf0.1 and the corpus is tokenized ONCE instead of three
    // times, which is the 100 TB win.
    org.apache.spark.sql.GraftBridge.checkpointNoStats(
      bm25FoldPlan(docs), eager = false)

  /** The un-pinned [[bm25Fold]] plan — exposed for the plan-evidence dump
    * (the pin materializes to a LogicalRDD, hiding the fold's own shape
    * in consumer plans). */
  private[graft] def bm25FoldPlan(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(array(words(col("text")))).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("len"),
        explode_outer(col("ws")).as("tok"))
      .groupBy(col("doc_id"), col("len"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** [[bm25TopDocs]] against a caller-supplied (tok, df) query frame
    * (df must come from the same corpus the scores are computed over). */
  def bm25TopDocsOf(docs: DataFrame, queries: DataFrame, topDocs: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoreOf(bm25Fold(docs), queries, topDocs, k1, b)

  /** Scoring tier over a [[bm25Fold]] frame. */
  private def bm25ScoreOf(fold: DataFrame, queries: DataFrame, topDocs: Int,
      k1: Double, b: Double): DataFrame = {
    val corpus = fold.groupBy(col("doc_id")).agg(max(col("len")).as("len"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = fold.filter(col("tok").isNotNull)
      .join(broadcast(queries.select(col("tok"))), Seq("tok"), "left_semi")
      .select(col("doc_id"), col("tok"), col("tf"), col("len"))
    val scored = tf
      .join(broadcast(queries), Seq("tok"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log10((col("n_docs").cast("double") - col("df") + 0.5) /
          (col("df").cast("double") + 0.5) + 1))
      .withColumn("score", round(
        col("idf") * (col("tf").cast("double") * (k1 + 1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1 - b) +
              lit(b) * (col("len").cast("double") / col("avgdl")))), 6))
    // two-stage partial top-K (round-10 ADVICE): a stopword term's full
    // posting list never ranks in one task — sub-bucket windows by doc
    // hash, then a topDocs-bounded final rank identical to the one-window
    // form
    val localTop = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tok"), pmod(xxhash64(col("doc_id")), lit(64L)))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rn") <= topDocs)
      .drop("rn")
    localTop
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("tok"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= topDocs)
      .select(col("tok").as("term"), col("doc_id"), col("tf"),
        col("score"), col("rank"))
  }
}

package graft

import graft.analytics.{Dedup, Relational, TextStats}
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

  test("q98 boilerplate removal: hand-checked drop + ordered reassembly") {
    import spark.implicits._
    // spans of 2 words; "x y" occurs in two distinct docs -> boilerplate
    val docs = Seq(
      (1L, "x y a b x y"), // spans [x y][a b][x y] -> cleaned "a b"
      (2L, "x y c d"),     // spans [x y][c d]      -> cleaned "c d"
      (3L, "x y")          // spans [x y]           -> all dropped
    ).toDF("doc_id", "text")
    val out = TextStats.boilerplateRemovalOf(docs, spanWords = 2, dfThreshold = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_dropped", "kept_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, 2L), (2L, 2L, 1L, 2L), (3L, 1L, 1L, 0L)))
    // all-dropped doc: NULL cleaned hash; partially-kept docs: non-null
    val hashes = TextStats.boilerplateRemovalOf(docs, 2, 2)
      .orderBy("doc_id").select("cleaned_hash")
      .collect().map(r => Option(r.get(0)))
    assert(hashes(0).isDefined && hashes(1).isDefined && hashes(2).isEmpty)
  }

  test("q98 boilerplate removal: below-threshold spans survive; null text is one empty span") {
    import spark.implicits._
    val docs = Seq((1L, "p q r s"), (2L, null: String)).toDF("doc_id", "text")
    val out = TextStats.boilerplateRemovalOf(docs, spanWords = 2, dfThreshold = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_dropped", "kept_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // no span repeats across docs -> nothing dropped; null text splits to
    // the single empty span (kept, 0 tokens) on both engines
    assert(out == Seq((1L, 2L, 0L, 4L), (2L, 1L, 0L, 0L)))
  }

  test("q98 boilerplate removal: cleanse pass is broadcast, not a corpus shuffle") {
    val plan = TextStats.boilerplateRemoval(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "boilerplate set must reach the cleanse scan via broadcast")
  }

  test("q99 perplexity buckets: hand-checked bigram LM scores and buckets") {
    import spark.implicits._
    // lang en: docs "a b", "a c", "z". uni a:2 b:1 c:1 z:1, V=4; both
    // bigrams count 1. score = -log10((1+1)/(2+4)) = 0.477121 for both;
    // tie broken by doc_id; the 1-word doc has no bigrams -> 'none'
    val docs = Seq(
      (1L, "en", "a b"), (2L, "en", "a c"), (3L, "en", "z")
    ).toDF("doc_id", "lang", "text")
    val out = TextStats.perplexityBucketsOf(docs)
      .orderBy("bucket")
      .as[(String, String, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      ("en", "head", 1L, 2L, Some(0.477121), Some(0.477121)),
      ("en", "middle", 1L, 2L, Some(0.477121), Some(0.477121)),
      ("en", "none", 1L, 1L, None, None)))
  }

  test("q99 perplexity buckets: common bigrams score lower than rare ones") {
    import spark.implicits._
    // "a b" appears 3x, "a z" once: the a-z doc must land in a strictly
    // higher-perplexity bucket than the a-b docs
    val docs = (Seq.fill(3)("a b").zipWithIndex.map { case (t, i) => (i.toLong, "en", t) } :+
      (9L, "en", "a z")).toDF("doc_id", "lang", "text")
    val rows = TextStats.perplexityBucketsOf(docs)
      .as[(String, String, Long, Long, Option[Double], Option[Double])]
      .collect()
    val tail = rows.find(_._2 == "tail").get
    val head = rows.find(_._2 == "head").get
    assert(tail._5.get > head._6.get, "rare-bigram doc must score above every head doc")
  }

  test("q99 perplexity buckets: scoring scan carries no corpus-sized join (model is broadcast)") {
    val plan = TextStats.perplexityBuckets(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "per-lang LM maps must reach the scoring scan via broadcast")
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

  test("q100 BPE encoding: hand-checked token table on the tiny training corpus") {
    import spark.implicits._
    // q97's fixture + a word the cap/len-2 training never saw:
    //   train (len>=2): abab->3, abc->2, ab->1
    //     it1 (a,b): 2*3+2+1 = 9 -> ab ; it2 (ab,ab): 3 ; it3 (ab,c): 2
    //   encode ALL words: abab->[abab], abc->[abc], ab->[ab], x->[x]
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc") ++ Seq("x ab")).toDF("text")
    val out = TextStats.bpeEncodeOf(docs, nMerges = 3, vocabCap = 100, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("abab", 3L, 7L), ("abc", 2L, 7L), ("ab", 1L, 7L), ("x", 1L, 7L)))
  }

  test("q100 BPE encoding: replace-chain equals the greedy fold reference at sf0.001") {
    import spark.implicits._
    // the distributed replace-chain encoding must agree token-for-token
    // with a driver-side greedy left-to-right fold over the same merges
    val docs = analytics.Tables.documents(spark, d).select(col("text"))
    val merges = TextStats.bpeFitMerges(docs, nMerges = 8, vocabCap = 65536)
      .map { case (_, a, b, _, _) => (a, b) }
    def encodeRef(word: String): Seq[String] = {
      var syms = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toSeq
      for ((a, b) <- merges) {
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val wordFreq = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val ref = wordFreq.toSeq
      .flatMap { case (w, n) => encodeRef(w).map(t => (t, n)) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val refTotal = ref.values.sum
    val refTop = ref.toSeq.sortBy { case (t, n) => (-n, t) }.take(40)
      .map { case (t, n) => (t, n, refTotal) }
    val out = TextStats.bpeEncodeOf(docs, nMerges = 8, vocabCap = 65536, topK = 40)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == refTop)
  }

  test("q100 BPE encoding: greedy run merges and non-BMP code points survive the replace chain") {
    import spark.implicits._
    // merges learned: (a,a) -> aa ; (aa,a) -> aaa ; (aa,aa) -> aaaa
    //   encode: aaaa -> [aa,aa] -> (aa,a) no-op -> [aaaa] ; aaa -> [aaa]
    val docs = Seq("aaaa aaa").toDF("text")
    val out = TextStats.bpeEncodeOf(docs, nMerges = 5, vocabCap = 100, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("aaa", 1L, 2L), ("aaaa", 1L, 2L)))
    // non-BMP: merges over full code points, not UTF-16 halves
    val smile = new String(Character.toChars(0x1F600))
    val docs2 = Seq(s"$smile$smile x").toDF("text")
    val out2 = TextStats.bpeEncodeOf(docs2, nMerges = 1, vocabCap = 100, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out2 == Seq(("x", 1L, 2L), (smile + smile, 1L, 2L)))
  }

  test("q101 cross-source leakage: normalized matrix incl. a NULL-source shard") {
    import spark.implicits._
    // four exact copies across sources A, B, B, NULL: all 6 pairs are
    // near-dups at hamming 0; normalization keeps src_a <= src_b, NULL last
    val docs = Seq(
      (1L, "common shared text body", Some("A")),
      (2L, "common shared text body", Some("B")),
      (3L, "common shared text body", Some("B")),
      (4L, "common shared text body", None: Option[String]),
      (5L, "entirely different words here unrelated", Some("A"))
    ).toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceLeakageOf(docs, maxHamming = 6)
      .as[(Option[String], Option[String], Long, Long, Long, Int)]
      .collect().toSeq.sortBy(r => (r._1.getOrElse("~"), r._2.getOrElse("~")))
    assert(out == Seq(
      (Some("A"), Some("B"), 2L, 1L, 2L, 0),   // (1,2) (1,3)
      (Some("A"), None, 1L, 1L, 1L, 0),        // (1,4)
      (Some("B"), Some("B"), 1L, 1L, 1L, 0),   // (2,3)
      (Some("B"), None, 2L, 2L, 1L, 0)))       // (2,4) (3,4)
  }

  test("q101 plan: pair surface stays the banded equi-join (no cartesian)") {
    val plan = analytics.Dedup.crossSourceLeakage(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "cross-source matrix must ride the banded equi-join, not a pairwise scan")
  }
}

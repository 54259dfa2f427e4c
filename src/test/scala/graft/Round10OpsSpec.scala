package graft

import graft.analytics.{Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operator gates. */
class Round10OpsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  /** The engine's 60-bit md5 word hash (Dedup.mdHash60) in plain JVM
    * scalar form — an INDEPENDENT spelling of the same public definition,
    * so the DSIR pin below does not reuse the expression under test. */
  private def hash60(sv: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)

  private def md5Prefix32(sv: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("q123 DSIR: weight math is decimal-exact against a scalar replay") {
    // small enough to replay every gram by hand, rich enough to cover:
    // target (en) vs raw mass, a NULL-lang doc (raw-only evidence), a
    // NULL-text doc and an empty-text doc (score-0, still in the lottery)
    val docs = Seq(
      (1L, "en", "s0", "alpha beta alpha"),
      (2L, "fr", "s1", "alpha gamma"),
      (3L, null: String, "s0", "beta beta"),
      (4L, "en", "s1", null: String),
      (5L, "fr", null: String, "")).toDF("doc_id", "lang", "source", "text")
    val nB = 256

    // scalar replay of the published definition
    def grams(text: String): Seq[String] = {
      val ws = text.trim.split("\\s+", -1).toSeq
      ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val corpus = Seq(
      (1L, Option("en"), Option("alpha beta alpha")),
      (2L, Option("fr"), Option("alpha gamma")),
      (3L, None, Option("beta beta")),
      (4L, Option("en"), None),
      (5L, Option("fr"), Option("")))
    val stream = corpus.flatMap { case (id, lang, text) =>
      text.toSeq.flatMap(t => grams(t).map(g =>
        (id, lang.contains("en"), math.floorMod(hash60(g), nB.toLong))))
    }
    val tb = stream.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rb = stream.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tTot = tb.values.sum; val rTot = rb.values.sum
    val term: Map[Long, BigDecimal] = rb.keys.map { b =>
      b -> r6(math.log((tb.getOrElse(b, 0L) + 1.0) / (tTot + nB)) -
        math.log((rb(b) + 1.0) / (rTot + nB)))
    }.toMap
    val logw: Map[Long, BigDecimal] = corpus.map { case (id, _, _) =>
      id -> stream.filter(_._1 == id).map(s => term(s._3))
        .foldLeft(BigDecimal(0))(_ + _)
    }.toMap
    def gumbel(id: Long): BigDecimal = {
      val u = (math.floorMod(md5Prefix32(id.toString), 1000000L) + 0.5) / 1000000.0
      r6(-math.log(-math.log(u)))
    }
    val expected = corpus.map { case (id, _, _) =>
      (id, logw(id), logw(id) + gumbel(id))
    }.sortBy { case (id, _, k) => (-k, id) }
      .zipWithIndex.map { case ((id, w, k), i) =>
        (i + 1, id, w.setScale(6).toDouble, k.setScale(6).toDouble)
      }

    val got = TextStats.dsirSelectOf(docs, nBuckets = nB, keepN = 5)
      .select(col("rank"), col("doc_id"), col("logw"), col("sel_key"))
      .as[(Int, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got == expected,
      s"DSIR weight math diverged from the scalar replay:\n got $got\n exp $expected")
  }

  test("q123 DSIR: selection is ∝-weight under the Gumbel key (boundary sanity)") {
    // two clearly separated docs: one pure-target text repeated, one
    // pure-raw — the target-like doc must out-key the raw one by the
    // log-ratio gap (Gumbel noise is bounded here: |g| <= ~2.6 at the
    // md5 lottery's u range, while the engineered gap is > 10)
    val docs = (1L to 40L).map(i =>
      if (i % 2 == 0) (i, "en", "s", "tgtword " * 20)
      else (i, "xx", "s", "rawword " * 20))
      .map { case (i, l, s2, t) => (i, l, s2, t.trim) }
      .toDF("doc_id", "lang", "source", "text")
    val top = TextStats.dsirSelectOf(docs, nBuckets = 256, keepN = 20)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(top.forall(_ % 2 == 0),
      "every selected doc must come from the target-like half")
  }

  test("q124 fertility: char-level identity at nMerges=0 and a hand-computed merge") {
    // word mass: en {ab×2, cde}, fr {ab, x}, NULL-lang {yz}; a null-text
    // doc contributes nothing. The only repeated pair corpus-wide is
    // (a,b)×3, so nMerges=1 trains exactly that merge.
    val docs = Seq(
      (1L, "en", "ab ab cde"),
      (2L, "fr", "ab x"),
      (3L, null: String, "yz"),
      (4L, "en", null: String)).toDF("doc_id", "lang", "text")
    // nMerges=0: every token is one char — fertility = mean word length,
    // chars_per_token ≡ 1
    val flat = TextStats.bpeFertilityOf(docs, nMerges = 0, vocabCap = 1024)
      .select(col("lang"), col("n_words"), col("n_tokens"), col("fertility"),
        col("chars_per_token"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => (Option(r._1).getOrElse("∅"), r._2, r._3, r._4, r._5)).toSet
    assert(flat == Set(
      ("en", 3L, 7L, 2.333333, 1.0),
      ("fr", 2L, 3L, 1.5, 1.0),
      ("∅", 1L, 2L, 2.0, 1.0)), s"char-level fertility diverged: $flat")
    // one merge (a,b)→ab: "ab" becomes a single token everywhere
    val merged = TextStats.bpeFertilityOf(docs, nMerges = 1, vocabCap = 1024)
      .select(col("lang"), col("n_tokens"), col("fertility"), col("chars_per_token"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => (Option(r._1).getOrElse("∅"), r._2, r._3, r._4)).toSet
    assert(merged == Set(
      ("en", 5L, 1.666667, 1.4),
      ("fr", 2L, 1.0, 1.5),
      ("∅", 2L, 2.0, 1.0)), s"post-merge fertility diverged: $merged")
  }

  test("q125 entropy: decimal-exact against a scalar replay incl. hostile shapes") {
    // single-type doc (norm := 0), uniform docs, a non-dyadic 2/3-1/3
    // split, an empty-text doc (one "" token — the shared tokenizer's
    // published behavior), a null-text doc (excluded), a NULL-lang doc
    val docs = Seq(
      (1L, "en", "a a b b"),
      (2L, "en", "a a a a"),
      (3L, "fr", "a b c d"),
      (4L, "fr", "a a b"),
      (5L, null: String, "x y"),
      (6L, "en", ""),
      (7L, "fr", null: String)).toDF("doc_id", "lang", "text")
    def replay(ws: Seq[String]): (BigDecimal, BigDecimal) = {
      val counts = ws.groupBy(identity).view.mapValues(_.size).values.toSeq
      val n = counts.sum.toDouble
      val h = counts.map { c =>
        val p = c / n
        r6(-p * (math.log(p) / math.log(2.0)))
      }.foldLeft(BigDecimal(0))(_ + _)
      val norm = if (counts.size <= 1) BigDecimal(0)
        else r6(h.toDouble / (math.log(counts.size) / math.log(2.0)))
      (h, norm)
    }
    val corpus = Seq(
      ("en", Seq("a", "a", "b", "b")), ("en", Seq("a", "a", "a", "a")),
      ("fr", Seq("a", "b", "c", "d")), ("fr", Seq("a", "a", "b")),
      ("∅", Seq("x", "y")), ("en", Seq("")))
    val expected = corpus.map { case (l, ws) => (l, replay(ws)) }
      .groupBy(_._1).map { case (l, rows) =>
        val hs = rows.map(_._2._1); val norms = rows.map(_._2._2)
        (l, rows.size.toLong,
          r6(hs.sum.toDouble / rows.size).toDouble,
          r6(norms.sum.toDouble / rows.size).toDouble,
          hs.max.toDouble, hs.min.toDouble)
      }.toSet
    val got = TextStats.entropyProfileOf(docs)
      .select(col("lang"), col("n_docs"), col("avg_entropy"),
        col("avg_norm_entropy"), col("max_entropy"), col("min_entropy"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => (Option(r._1).getOrElse("∅"), r._2, r._3, r._4, r._5, r._6)).toSet
    assert(got == expected,
      s"entropy profile diverged from the scalar replay:\n got $got\n exp $expected")
  }

  test("q126 CMS: bucket math replays scalar CMS incl. forced collisions") {
    // width=2 forces collisions (4 distinct words into 2 buckets per
    // row), so the min-of-depth estimate and its overestimate are both
    // exercised; hostile shapes: null text (excluded), empty text (one
    // "" token), a multibyte word
    val docs = Seq(
      (1L, "a b a čX"),
      (2L, "b a a"),
      (3L, null: String),
      (4L, "")).toDF("doc_id", "text")
    val depth = 2; val width = 2
    val toks = Seq("a", "b", "a", "čX", "b", "a", "a", "")
    // row i's bucket = i-th 32-bit md5 slice mod width (one digest per
    // token — the engine's double-hashing spelling, replayed here)
    def bucket(i: Int, w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      math.floorMod(
        java.lang.Long.parseLong(hex.substring(i * 8, i * 8 + 8), 16),
        width.toLong)
    }
    val sketch: Map[(Int, Long), Long] = toks.flatMap(w =>
      (0 until depth).map(i => (i, bucket(i, w))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = exact.map { case (w, n) =>
      val est = (0 until depth).map(i => sketch((i, bucket(i, w)))).min
      (w, n, est, est - n)
    }.toSeq.sortBy { case (w, n, _, _) => (-n, w) }
    val got = TextStats.cmsHeavyHittersOf(docs, depth, width, k = 10)
      .select(col("word"), col("n_exact"), col("n_est"), col("overestimate"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected,
      s"CMS diverged from the scalar replay:\n got $got\n exp $expected")
    assert(got.exists(_._4 > 0), "width=2 must force at least one collision")
  }

  test("round-10 plans: scans prune to the consumed columns; sketch/model sides broadcast") {
    // q124 must read only (lang, text); q125 only (doc_id, lang, text);
    // q126 only (text) — a scan reading source/n_chars for these would
    // move dead bytes at 100 TB
    def readSchemas(plan: String): Seq[String] =
      "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    val p124 = TextStats.bpeFertility(spark, d).queryExecution.executedPlan.toString
    assert(readSchemas(p124).nonEmpty && readSchemas(p124).forall(s =>
      !s.contains("source") && !s.contains("n_chars") && !s.contains("doc_id")),
      s"q124 scan reads unconsumed columns:\n${readSchemas(p124)}")
    val p125 = TextStats.entropyProfile(spark, d).queryExecution.executedPlan.toString
    assert(readSchemas(p125).nonEmpty && readSchemas(p125).forall(s =>
      !s.contains("source") && !s.contains("n_chars")),
      s"q125 scan reads unconsumed columns:\n${readSchemas(p125)}")
    val p126 = TextStats.cmsHeavyHitters(spark, d).queryExecution.executedPlan.toString
    assert(readSchemas(p126).nonEmpty && readSchemas(p126).forall(_ == "text:string"),
      s"q126 scans must read text only:\n${readSchemas(p126)}")
    // the ≤ depth·width sketch joins the 20 candidate rows broadcast-side
    assert(p126.contains("BroadcastExchange"),
      s"q126 sketch join is not broadcast:\n$p126")
    // q123's model join must broadcast the nBuckets-row model, never
    // shuffle the exploded gram stream for it
    val p123 = TextStats.dsirSelect(spark, d).queryExecution.executedPlan.toString
    assert(p123.contains("BroadcastExchange"),
      s"q123 model join is not broadcast:\n$p123")
  }

  test("q127 agreement matrix equals the matrix of the collected q32/q35 surfaces") {
    import graft.analytics.Dedup
    // ground truth from the two independently-oracle-checked pair
    // surfaces, reduced driver-side — the subtraction/in-row spelling
    // under test must reproduce it cell for cell
    val mh = Dedup.minhashPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sh = Dedup.simhashPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val fps = Dedup.simhashFingerprints(spark, d)
      .select(col("doc_id"), col("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamOf(p: (Long, Long)): Long =
      java.lang.Long.bitCount(fps(p._1) ^ fps(p._2)).toLong
    def r6d(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mh-side cells score hamming from the fingerprints (the engine's
    // in-row arithmetic); simhash_only from the sh surface itself
    def cell(pairSet: Set[(Long, Long)], name: String) = {
      val pairs = pairSet.toSeq // Set.map would collapse equal scores
      val js = pairs.flatMap(mh.get).map(j =>
        BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val hs = pairs.map(hamOf)
      (name, pairs.size.toLong,
        if (js.isEmpty) None else Some(r6d(js.sum.toDouble / js.size)),
        if (hs.isEmpty) None else Some(r6d(hs.sum.toDouble / hs.size)))
    }
    val both = mh.keySet intersect sh.keySet
    val expected = Seq(
      cell(both, "both"),
      cell(mh.keySet diff sh.keySet, "minhash_only"),
      (("simhash_only"), (sh.keySet diff mh.keySet).size.toLong,
        None: Option[Double], {
          val hs = (sh.keySet diff mh.keySet).toSeq.map(sh)
          if (hs.isEmpty) None else Some(r6d(hs.sum.toDouble / hs.size))
        }))
    val got = Dedup.dedupMethodAgreement(spark, d)
      .select(col("agreement"), col("n_pairs"), col("avg_jaccard"), col("avg_hamming"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(got == expected,
      s"agreement matrix diverged:\n got $got\n exp $expected")
    // the 'both' cell's avg_hamming from the in-row test must also match
    // the mean over the true intersection (cell() above only uses sh's
    // hamming where present — same source, so this is covered by the
    // equality; keep a sanity floor that the matrix is non-degenerate)
    assert(got.map(_._2).sum > 0, "no pairs at sf0.001 — fixture changed?")
  }

  test("q121 routed negatives ⊆ label constraint and q122 recall bounds") {
    val routed = Similarity.ivfHardNegatives(spark, d)
    val emb = graft.analytics.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"))
    val joined = routed
      .join(emb.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
    assert(joined.filter(col("ql") === col("nl") || col("ql").isNull ||
      col("nl").isNull).isEmpty,
      "a routed hard negative must carry a known, different label")
    val rec = Similarity.ivfHardNegativeRecallStats(spark, d)
      .select(col("recall")).as[Double].collect()
    assert(rec.nonEmpty && rec.forall(r => r >= 0.0 && r <= 1.0))
    // full-probe routing must reproduce the brute-force miner exactly
    val full = Similarity.ivfHardNegatives(spark, d, nprobe = 8)
    val exact = Similarity.hardNegatives(spark, d)
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty,
      "nprobe = ncells must recover the exact hard-negative ranking")
  }
}

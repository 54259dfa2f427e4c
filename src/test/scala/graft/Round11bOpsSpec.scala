package graft

import graft.analytics.{Multimodal, Sampling, Similarity, TextStats}
import graft.functions.BloomContains
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 second-wave operator gates: q137 bitext margin mining, q138
  * Bloom decontamination, q139 UniMax waterfilling, q140 image funnel. */
class Round11bOpsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  /** Planted two-language embedding space: query 0 has one stand-out
    * parallel target (101) among distractors; query 20 is a hub whose
    * whole neighborhood looks alike; 40/106 are zero vectors. */
  private lazy val bitextDir: String = {
    val p = tempDir("bitext").toString
    val rows = Seq(
      // src side (even labels): 0 is the stand-out query; 20 is a hub whose
      // direction is densely populated on BOTH sides (6/8/10 mirror it)
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.2f, 0f, 0f), 0),
      (4L, Array(0.8f, 0f, 0.1f, 0f), 0),
      (6L, Array(0.09f, 1f, 0.06f, 0f), 0),
      (8L, Array(0.11f, 0.99f, 0.05f, 0f), 0),
      (10L, Array(0.1f, 0.98f, 0.04f, 0.01f), 2),
      (20L, Array(0.1f, 1f, 0.05f, 0f), 2),
      (40L, Array(0f, 0f, 0f, 0f), 0), // zero query: must vanish
      // tgt side (odd labels)
      (101L, Array(0.99f, 0.1f, 0f, 0f), 1), // parallel to query 0
      (102L, Array(0.1f, 1f, 0.05f, 0.01f), 1),
      (103L, Array(0.09f, 0.99f, 0.06f, 0f), 1),
      (104L, Array(0.11f, 1f, 0.04f, 0f), 1),
      (105L, Array(0.1f, 0.99f, 0.05f, 0f), 1),
      (106L, Array(0f, 0f, 0f, 0f), 1)) // zero target: never a neighbor
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/embeddings.parquet")
    p
  }

  test("q137: stand-out parallel pair accepted, hub query rejected, zero vectors vanish") {
    val out = Similarity.bitextMarginMining(spark, bitextDir)
      .select("src_id", "tgt_id", "cosine", "margin", "accepted")
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(0L, 20L),
      "exactly the two live strided queries mine a pair (zero query drops)")
    val (_, tgt0, cos0, margin0, acc0) = out(0L)
    assert(tgt0 == 101L, "query 0's rank-1 neighbor is the planted parallel")
    assert(cos0 > 0.95 && margin0 > 1.3 && acc0,
      s"planted pair must stand out from both neighborhoods (cos=$cos0 margin=$margin0)")
    val (_, _, _, margin20, acc20) = out(20L)
    assert(margin20 < 1.05 && !acc20,
      s"hub query's uniform neighborhood must hold margin near 1 (margin=$margin20)")
    assert(!out.values.exists(r => r._2 == 106L), "zero target never mined")
  }

  test("q137 margin is the documented ratio of its own rounded parts") {
    // re-derive margin from cosine and the two neighborhood averages by
    // recomputing the pass at k=4 over the planted space in scala
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q0 = Array(1f, 0f, 0f, 0f)
    val tgts = Seq(101L -> Array(0.99f, 0.1f, 0f, 0f), 102L -> Array(0.1f, 1f, 0.05f, 0.01f),
      103L -> Array(0.09f, 0.99f, 0.06f, 0f), 104L -> Array(0.11f, 1f, 0.04f, 0f),
      105L -> Array(0.1f, 0.99f, 0.05f, 0f))
    val srcs = Seq(Array(1f, 0f, 0f, 0f), Array(0.9f, 0.2f, 0f, 0f),
      Array(0.8f, 0f, 0.1f, 0f), Array(0.09f, 1f, 0.06f, 0f),
      Array(0.11f, 0.99f, 0.05f, 0f), Array(0.1f, 0.98f, 0.04f, 0.01f),
      Array(0.1f, 1f, 0.05f, 0f))
    val fwd = tgts.map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(4)
    val srcAvg = r6(fwd.map(_._2).sum / fwd.size)
    val best = fwd.head
    val tgtV = tgts.toMap.apply(best._1)
    val back = srcs.map(sv => cos(tgtV, sv)).sortBy(-_).take(4)
    val tgtAvg = r6(back.sum / back.size)
    val expect = r6(r6(best._2) / ((srcAvg + tgtAvg) / 2))
    val got = Similarity.bitextMarginMining(spark, bitextDir)
      .filter(col("src_id") === 0L).select("margin").as[Double].head()
    assert(math.abs(got - expect) < 2e-6,
      s"margin must be the ratio of rounded parts (got=$got expect=$expect)")
  }

  test("bloom filter: one-sided — every inserted key passes; false positives stay rare") {
    val keys = (1L to 1000L).map(_ * 0x9E37L)
    val bits = BloomContains.build(keys.iterator, BloomContains.sizeFor(keys.size.toLong))
    val inDf = keys.toDF("h")
    assert(inDf.filter(BloomContains.contains(col("h"), bits)).count() == 1000L,
      "no false negatives, ever")
    val outDf = (100000L to 110000L).map(_ * 31L + 7L).toDF("h")
    val fp = outDf.filter(BloomContains.contains(col("h"), bits)).count()
    assert(fp < 500L, s"false-positive rate out of family at 10 bits/key ($fp/10001)")
  }

  test("bloom filter: interpreted eval agrees with the codegen probe") {
    val keys = (1L to 64L).map(BloomContains.mix64)
    val bits = BloomContains.build(keys.iterator, 1024)
    val probes = (keys ++ (500L to 600L).map(_ * 13L)).distinct
    // interpreted reference: same probe math run driver-side
    def ref(h: Long): Boolean = {
      val h1 = BloomContains.mix64(h)
      val h2 = BloomContains.mix64(h + 0x9E3779B97F4A7C15L) | 1L
      (0 until 7).forall { j =>
        val idx = (h1 + j.toLong * h2) & 1023L
        (bits((idx >>> 6).toInt) & (1L << (idx & 63L).toInt)) != 0L
      }
    }
    val got = probes.toDF("h")
      .select(col("h"), BloomContains.contains(col("h"), bits).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    probes.foreach(h => assert(got(h) == ref(h), s"probe $h diverged"))
  }

  test("q138 equals the exact (bloom-free) contamination rollup") {
    val d = "/root/testdata/sf0.001"
    val got = TextStats.bloomDecontamination(spark, d)
      .as[(String, Long, Long, Double)].collect().toSet
    // exact reference: q85's accounting without any prefilter, same rollup
    val grams = TextStats.allGramHashes(spark, d, 8)
    val benchSel = col("doc_id") % 97 === 0 && col("doc_id") < 97000L
    val bench = grams.filter(benchSel).select(col("h")).distinct()
    val exact = grams.filter(!benchSel)
      .join(broadcast(bench).withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("hit_ratio",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
      .join(graft.analytics.Tables.documents(spark, d).select("doc_id", "source"), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hit_ratio") >= 0.2, 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contam_ratio",
        round(col("n_contaminated").cast("double") / col("n_docs"), 6))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == exact, "bloom prefilter must not change the exact answer")
    assert(got.nonEmpty)
  }

  test("q138 plan: bloom probe sits scan-side, no cartesian") {
    val plan = TextStats.bloomDecontamination(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"), "prefilter must survive into the physical plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q139: planted two-language waterfill — tiny lang capped at 3 epochs, big lang gets the rest") {
    val p = tempDir("unimax").toString
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "aa", "s1", 19L),
      (2L, Seq.fill(600)("w").mkString(" "), "bb", "s1", 1199L),
      (3L, Seq.fill(400)("w").mkString(" "), "bb", "s1", 799L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/documents.parquet")
    val out = Sampling.unimaxAllocation(spark, p)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // totals 1010, B = 505; caps: aa 30 (fits: 30*2 <= 505), bb 3000 (no)
    assert(out("aa") == (("aa", 10L, 30.0, 3.0)))
    assert(out("bb") == (("bb", 1000L, 475.0, 0.475)))
  }

  test("q139 laws on the real corpus: budget exhausted, caps respected, uncapped equal") {
    val rows = Sampling.unimaxAllocation(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_._2).sum.toDouble
    val allocSum = rows.map(_._3).sum
    assert(math.abs(allocSum - 0.5 * totalTokens) < 1e-3,
      s"waterfilling must spend the whole budget (got $allocSum of ${0.5 * totalTokens})")
    rows.foreach { case (lang, _, _, epochs) =>
      assert(epochs <= 3.0 + 1e-9, s"$lang over the epoch cap: $epochs")
    }
    val uncapped = rows.filter(_._4 < 3.0 - 1e-9).map(_._3)
    assert(uncapped.distinct.size <= 1,
      "every uncapped language takes the same equal share")
  }

  test("q141: planted shared 8-gram — exactly the overlapping span drops, reassembly checksum pinned") {
    val p = tempDir("surgical").toString
    val docs = Seq(
      // doc 0 is the benchmark (0 % 97 == 0); doc 1 embeds its 8-gram
      (0L, "a b c d e f g h x y", "en", "s1", 19L),
      (1L, "p q a b c d e f g h r s", "en", "s1", 23L),
      (2L, "u v w", "en", "s1", 5L),
      (3L, null.asInstanceOf[String], "en", "s1", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/documents.parquet")
    val out = TextStats.surgicalDecontamination(spark, p)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (src, nDocs, touched, before, removed, checksum) = out.head
    def h60(t: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)
    // doc 1: gram [a..h] hits at wpos 2 → tokens 2..9 covered → "p q r s";
    // doc 2 untouched; doc 3 (NULL text) absent
    assert((src, nDocs, touched, before, removed) == (("s1", 2L, 1L, 15L, 8L)))
    assert(checksum == h60("p q r s") % 1000000007L + h60("u v w") % 1000000007L)
  }

  test("q142/q143: probing every cell makes the routed miner identical to the exact one") {
    // 4-dim space → ≤ 8 hyperplane cells; nprobe=8 prunes nothing, so the
    // routed chain must reproduce the exhaustive chain bit-for-bit
    val audit = Similarity.bitextRoutingRecall(spark, bitextDir, nprobe = 8)
      .as[(Long, Long, Option[Long], Int, Option[Double])].collect()
    assert(audit.map(_._1).sorted.toSeq == Seq(0L, 20L))
    audit.foreach { case (srcId, exactTgt, routedTgt, hit, delta) =>
      assert(routedTgt.contains(exactTgt), s"query $srcId routed to a different pair")
      assert(hit == 1 && delta.contains(0.0),
        s"unpruned routing must be exact (query $srcId: hit=$hit delta=$delta)")
    }
  }

  test("q143 shape under real pruning: every exact query stays visible, hits are 0/1") {
    val rows = Similarity.bitextRoutingRecall(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Option[Long], Int, Option[Double])].collect()
    val exactN = Similarity.bitextMarginMining(spark, "/root/testdata/sf0.001").count()
    assert(rows.length.toLong == exactN, "left join must keep lost queries visible")
    assert(rows.forall(r => r._4 == 0 || r._4 == 1))
    rows.filter(_._3.isEmpty).foreach(r =>
      assert(r._4 == 0 && r._5.isEmpty, "a lost query has no hit and no delta"))
  }

  test("q144: kNN edges stay in-cell, ranks are dense, mutuality is symmetric") {
    val d = "/root/testdata/sf0.001"
    val edges = Similarity.knnGraph(spark, d)
      .as[(Long, Long, Double, Int, Boolean)].collect()
    assert(edges.nonEmpty)
    // dense ranks 1..deg per vector, neighbor ids distinct
    edges.groupBy(_._1).foreach { case (v, es) =>
      assert(es.map(_._4).sorted.toSeq == (1 to es.length),
        s"vector $v has gapped ranks")
      assert(es.map(_._2).distinct.length == es.length)
    }
    // mutual flag is exactly "reversed edge exists in the k-bounded table"
    val set = edges.map(e => (e._1, e._2)).toSet
    edges.foreach { case (v, n, _, _, m) =>
      assert(m == set.contains((n, v)), s"mutual flag wrong on ($v,$n)")
    }
    // zero/NULL vectors appear on neither side (the sf fixture has none,
    // so plant one: a vector alone in a cell with a zero-vector companion)
    val p = tempDir("knn").toString
    Seq((1L, Array(1f, 0f, 0f, 0f), 0), (2L, Array(0f, 0f, 0f, 0f), 0),
      (3L, Array(0.9f, 0.1f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/embeddings.parquet")
    val planted = Similarity.knnGraph(spark, p)
      .as[(Long, Long, Double, Int, Boolean)].collect()
    assert(planted.forall(e => e._1 != 2L && e._2 != 2L),
      "zero vector must be absent from the graph")
    // 1 and 3 share cell 6 (plane signs -,+,+ for both) and are mutual rank-1
    assert(planted.map(e => (e._1, e._2, e._4, e._5)).toSet ==
      Set((1L, 3L, 1, true), (3L, 1L, 1, true)))
  }

  test("q145: clusters match an independent union-find over the mutual edges; purity laws hold") {
    val d = "/root/testdata/sf0.001"
    val mutual = Similarity.knnGraph(spark, d)
      .filter(col("mutual") && col("vec_id") < col("nbr_id"))
      .select("vec_id", "nbr_id").as[(Long, Long)].collect()
    assert(mutual.nonEmpty)
    // independent union-find, components labeled by their minimum
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
      .groupBy(_._2).map { case (root, xs) => root -> xs.keys.toSet }
    val labels = graft.analytics.Tables.embeddings(spark, d)
      .filter(col("label").isNotNull)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val got = Similarity.knnClusterPurity(spark, d)
      .as[(Long, Long, Long, Int, Long, Double)].collect()
    // every evaluable component appears exactly once with the right size
    val evaluable = want.filter { case (_, members) => members.exists(labels.contains) }
    assert(got.map(_._1).toSet ==
      evaluable.map { case (_, ms) => ms.min }.toSet)
    got.foreach { case (cid, nVecs, nLabels, topLabel, topN, purity) =>
      val members = evaluable.values.find(_.min == cid).get.filter(labels.contains)
      assert(nVecs == members.size.toLong, s"cluster $cid size")
      val hist = members.toSeq.map(labels).groupBy(identity).view.mapValues(_.size)
      assert(nLabels == hist.size.toLong)
      val (wantLabel, wantN) = hist.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert((topLabel, topN) == ((wantLabel, wantN.toLong)), s"cluster $cid majority")
      assert(purity > 0.0 && purity <= 1.0 && topN <= nVecs)
    }
  }

  test("q146: agreement matrix reconciles exactly with the q88 and q91 tables") {
    val d = "/root/testdata/sf0.001"
    val m = TextStats.filterAgreement(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m.nonEmpty)
    // marginals: gopher-pass mass per source must equal q88's n_pass,
    // classifier-kept mass must equal q91's kept=true doc count
    val q88 = TextStats.gopherQuality(spark, d)
      .select("source", "n_pass").as[(String, Long)].collect().toMap
    val q91 = TextStats.classifierQualityStats(spark, d)
      .filter(col("kept")).select("source", "n_docs")
      .as[(String, Long)].collect().toMap
    m.foreach { case (src, (_, n, bp, co, go, bf, agr)) =>
      assert(bp + co + go + bf == n, s"$src: cells must partition the docs")
      assert(bp + go == q88(src), s"$src: gopher marginal diverges from q88")
      assert(bp + co == q91.getOrElse(src, 0L),
        s"$src: classifier marginal diverges from q91")
      assert(agr == BigDecimal((bp + bf).toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q147: chi2 re-derived independently; reference is the largest source; drift ranks as planted") {
    val d = "/root/testdata/sf0.001"
    val got = TextStats.sourceDriftChi2(spark, d)
      .as[(String, Long, Boolean, Double)].collect().map(r => r._1 -> r).toMap
    // independent recomputation from raw (source, n_tokens)
    val raw = graft.analytics.Tables.documents(spark, d)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).as("nt"))
      .as[(String, Int)].collect()
    val bins = raw.map { case (src, nt) => (src, math.min(math.ceil(nt / 16.0).toInt, 6)) }
    val byS = bins.groupBy(_._1)
    val totals = byS.view.mapValues(_.size.toLong).toMap
    val refSrc = totals.toSeq.sortBy { case (s2, n) => (-n, s2) }.head._1
    val refBins = byS(refSrc).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nRef = totals(refSrc)
    def r(x: Double, dp: Int) = BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
    totals.foreach { case (src, n) =>
      val hist = byS(src).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val chi2 = (0 to 6).map { bin =>
        val e = n.toDouble * ((refBins.getOrElse(bin, 0L) + 1).toDouble / (nRef + 7).toDouble)
        val o = hist.getOrElse(bin, 0L).toDouble
        r((o - e) * (o - e) / e, 12)
      }.sum
      val (gs, gn, gref, gchi) = got(src)
      assert(gn == n && gref == (src == refSrc), s"$src totals/ref flag")
      assert(math.abs(gchi - r(chi2.toDouble, 6).toDouble) < 1e-9,
        s"$src chi2: got $gchi want ${r(chi2.toDouble, 6)}")
    }
    // the reference scores (near-)minimal drift against itself
    val refChi = got(refSrc)._4
    assert(got.values.forall(_._4 >= 0.0) && refChi <= got.values.map(_._4).max)
  }

  test("q140: funnel counts re-derived from the generator formula; all docs bucketed once") {
    val d = "/root/testdata/sf0.001"
    val gotRows = Multimodal.imageFilterFunnel(spark, d)
      .as[(String, String, Long)].collect()
    val got = gotRows.toSet
    val expect = graft.analytics.Tables.documents(spark, d)
      .select("source", "n_chars").as[(String, Option[Long])].collect()
      .groupBy { case (src, nc) =>
        val verdict = nc match {
          case None => "no_payload"
          case Some(n) =>
            val (w, h) = Multimodal.imageDims(n)
            if (math.min(w, h) < 8) "too_small"
            else if (w > 3 * h || h > 3 * w) "bad_aspect"
            else "kept"
        }
        (src, verdict)
      }.map { case ((src, v), xs) => (src, v, xs.length.toLong) }.toSet
    assert(got == expect)
    assert(gotRows.map(_._3).sum ==
      graft.analytics.Tables.documents(spark, d).count())
  }
}

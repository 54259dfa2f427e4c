package graft

import graft.analytics.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operator gates. */
class Round11OpsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("q129: first occurrence survives, within-doc repeats drop, reassembly ordered") {
    // spanWords = 2 for readable planted spans. Doc 1 repeats "a b" twice
    // (within-doc dup), doc 2 repeats doc 1's spans (cross-doc dup) plus
    // its own unique tail, doc 3 is untouched, doc 4 is the hostile
    // empty-text shape.
    val docs = Seq(
      (1L, "a b c d a b"),
      (2L, "c d e f"),
      (3L, "g h"),
      (4L, "")).toDF("doc_id", "text")
    val rows = TextStats.paragraphDedupOf(docs, spanWords = 2)
      .select("doc_id", "n_paragraphs", "n_dropped", "kept_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: spans [a b][c d][a b] -> third drops (first "a b" survives)
    assert(rows(1L) == ((3L, 1L, 4L)))
    // doc 2: [c d] lost to doc 1's pos 1, [e f] unique
    assert(rows(2L) == ((2L, 1L, 2L)))
    assert(rows(3L) == ((1L, 0L, 2L)))
    // empty text: one empty span, globally unique here, 0 kept tokens
    assert(rows(4L) == ((1L, 0L, 0L)))
    // reassembly hash pins order: doc 1 cleaned text is "a b c d"
    val h = TextStats.paragraphDedupOf(docs, spanWords = 2)
      .filter(col("doc_id") === 1L).select("cleaned_hash").as[Long].head()
    val expect = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("a b c d".getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(h == expect, "cleaned_hash must pin the reassembled 'a b c d'")
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q131: frame energy pinned against scalar PCM math; frames split at the byte boundary") {
    import graft.analytics.Multimodal
    // "ab" -> bytes 97,98 -> centered -31,-30: sq_sum 1861, no crossing.
    // "a" + 0x80-ish multibyte char exercises the utf-8 path: "aé" is
    // bytes 97,195,169 -> centered -31,67,41 -> one crossing at (−31, 67).
    val media = Seq(
      (1L, "ab".getBytes("UTF-8")),
      (2L, "aé".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      (4L, null: Array[Byte])).toDF("doc_id", "payload")
    val rows = Multimodal.audioFrameFeaturesOf(media, frameBytes = 2)
      .select("doc_id", "frame_idx", "n_samples", "rms_energy", "n_zero_cross")
      .as[(Long, Long, Long, Option[Double], Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(rows((1L, 0L)) == ((2L, Some(r6(math.sqrt(1861.0 / 2))), 0L)))
    // doc 2 has 3 bytes -> frames [97,195] and [169]: crossings are
    // WITHIN-frame only (the zc window does not straddle the boundary)
    assert(rows((2L, 0L)) == ((2L, Some(r6(math.sqrt((31 * 31 + 67 * 67) / 2.0))), 1L)))
    assert(rows((2L, 1L)) == ((1L, Some(41.0), 0L)))
    // empty payload: one 0-sample frame, NULL rms; NULL payload: no frames
    assert(rows((3L, 0L)) == ((0L, None, 0L)))
    assert(!rows.keySet.exists(_._1 == 4L))
  }

  test("q132: chunk boundaries re-synchronize after an insertion (the CDC property)") {
    // doc 2 = doc 1 with ONE word prepended. Fixed-window chunking (q90)
    // would shift every downstream window and share ~nothing; CDC
    // boundaries depend only on local content, so after the first
    // boundary past the insertion the chunk streams realign.
    val ws = (0 until 400).map(i => s"w${i * 7 % 101}x$i")
    val docs = Seq((1L, ws.mkString(" ")),
      (2L, "inserted " + ws.mkString(" "))).toDF("doc_id", "text")
    val shared = TextStats.cdcChunkDedupOf(docs, divisor = 16)
      .filter(col("n_docs") === 2).count()
    assert(shared >= 5,
      s"a 1-word insertion must leave most CDC chunks shared (got $shared)")
    // control: within-doc repetition also surfaces (same chunk twice in
    // one doc counts as copies but one doc)
    val rep = (0 until 40).map(i => s"r${i % 20}").mkString(" ") // 2x cycle
    val one = Seq((9L, rep + " " + rep)).toDF("doc_id", "text")
    val dup = TextStats.cdcChunkDedupOf(one, divisor = 4)
      .filter(col("n_docs") === 1 && col("n_copies") >= 2).count()
    assert(dup >= 1, "within-doc repeated chunks must count as copies")
  }

  test("q133: the full-dimension tier is the identity (recall exactly 1.0)") {
    import graft.analytics.Similarity
    val d = "/root/testdata/sf0.001"
    val out = Similarity.mrlRecallStats(spark, d, tiers = Seq(64))
      .select("recall").as[Double].collect()
    assert(out.nonEmpty && out.forall(_ == 1.0),
      "truncating to the full 64 dims must reproduce the ground truth exactly")
    // and a genuine truncation degrades or matches, never exceeds 1.0
    val t8 = Similarity.mrlRecallStats(spark, d, tiers = Seq(8))
      .select("recall").as[Double].collect()
    assert(t8.nonEmpty && t8.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("q134: planted scripts classify into the right fractions; emoji stays unclassified") {
    val dir = TempDirs.tempDir("graft_q134").toString
    // "abгд一二 34" = 2 latin, 2 cyrillic, 2 cjk, 1 space, 2 digits, 9 chars
    // total; the emoji doc is 0 in every class (non-BMP, 2 chars with
    // the space); NULL text excluded from every average
    Seq((1L, "abгд一二 34", "xx", "s", 9L),
      (2L, "🙂 x", "xx", "s", 3L),
      (3L, null: String, "xx", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.scriptProfile(spark, dir).collect().head
    def f(name: String) = Option(r.getAs[Any](name)).map(_.asInstanceOf[Double])
    assert(r.getAs[Long]("n_docs") == 3L)
    def r6d(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // averages over the two non-null docs
    assert(f("avg_latin").contains(r6d((r6d(2.0 / 9) + r6d(1.0 / 3)) / 2)))
    assert(f("avg_cyrillic").contains(r6d(r6d(2.0 / 9) / 2)))
    assert(f("avg_cjk").contains(r6d(r6d(2.0 / 9) / 2)))
    assert(f("avg_digit").contains(r6d(r6d(2.0 / 9) / 2)))
    assert(f("avg_space").contains(r6d((r6d(1.0 / 9) + r6d(1.0 / 3)) / 2)))
  }

  test("q135: linear-counting bitmap is union-mergeable and one-sided below saturation") {
    val dir = TempDirs.tempDir("graft_q135").toString
    def write(rows: Seq[(Long, String)], path: String) =
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$path/documents.parquet")
    write(Seq((1L, "apple banana cherry")), dir)
    val r = TextStats.distinctSketchAudit(spark, dir).collect().head
    // 3 words into 4096 buckets: no collision for this planted set
    assert(r.getAs[Long]("n_exact") == 3L && r.getAs[Long]("n_set_bits") == 3L)
    // estimate >= set bits always (-m ln(1-k/m) >= k), and tiny here
    assert(r.getAs[Double]("n_est") >= 3.0 && r.getAs[Double]("n_est") < 3.01)
    // mergeability: the union corpus's bit set is the OR of the parts'
    val dirA = TempDirs.tempDir("graft_q135a").toString
    val dirB = TempDirs.tempDir("graft_q135b").toString
    val dirU = TempDirs.tempDir("graft_q135u").toString
    write(Seq((1L, "apple banana x1 x2")), dirA)
    write(Seq((2L, "banana cherry x3")), dirB)
    write(Seq((1L, "apple banana x1 x2"), (2L, "banana cherry x3")), dirU)
    def bits(p: String): Long = TextStats.distinctSketchAudit(spark, p)
      .select("n_set_bits").as[Long].head()
    // |bits(U)| counts the distinct union buckets: <= |A|+|B|, >= max
    assert(bits(dirU) <= bits(dirA) + bits(dirB) && bits(dirU) >= bits(dirA))
    assert(bits(dirU) == 6L, "5 distinct words + no collisions = 6? no: " +
      "apple banana cherry x1 x2 x3 = 6 distinct buckets")
  }

  test("q136: cluster-keyed assignment never straddles a cluster; doc-keyed leaks") {
    import graft.analytics.Sampling
    val out = Sampling.clusterAwareSplit(spark, "/root/testdata/sf0.001")
      .select("method", "split", "n_docs", "n_clusters")
      .as[(String, String, Long, Long)].collect()
    val byM = out.groupBy(_._1)
    val totalDocs = byM("by_doc").map(_._3).sum
    assert(byM("by_cluster").map(_._3).sum == totalDocs,
      "both methods must partition every document")
    // the leakage signature: cluster-keyed split counts each cluster in
    // EXACTLY one split, so the per-split cluster counts sum to the true
    // cluster total; doc-keyed counts straddling clusters once per split
    val clustersByCluster = byM("by_cluster").map(_._4).sum
    val clustersByDoc = byM("by_doc").map(_._4).sum
    assert(clustersByDoc >= clustersByCluster,
      s"doc-keyed cannot touch fewer clusters ($clustersByDoc < $clustersByCluster)")
    assert(clustersByDoc > clustersByCluster,
      "sf0.001 holds cross-split near-dup clusters; doc-keyed must leak some")
  }

  test("q129 plan: hash-keyed equi-joins only, no cartesian, span text never shuffles") {
    val plan = TextStats.paragraphDedup(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "paragraph dedup must stay equi-join shaped")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "paragraph dedup must not degrade to a nested-loop join")
  }

  test("round-11 plans: no cartesian product in any new query") {
    val d = "/root/testdata/sf0.001"
    Seq("q128_image_dhash_histogram", "q129_paragraph_dedup",
      "q130_image_dhash_clusters", "q131_audio_frame_energy",
      "q132_cdc_chunk_dedup", "q133_mrl_recall", "q134_script_profile",
      "q135_distinct_sketch", "q136_cluster_split_audit",
      "q137_bitext_margin", "q138_bloom_decontamination",
      "q139_unimax_mixture", "q140_image_filter_funnel",
      "q141_surgical_decontamination", "q142_ivf_bitext_margin",
      "q143_bitext_routing_recall", "q144_knn_graph",
      "q145_knn_cluster_purity", "q146_filter_agreement",
      "q147_source_drift_chi2").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q plan went cartesian")
    }
  }
}

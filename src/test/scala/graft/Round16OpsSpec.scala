package graft

import graft.analytics.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 hardening: the q158 prefix-eligibility df cap under hostile
  * boilerplate skew, and the min-shingle-width document filter. The
  * planted shapes are the two the friendly fixture can never show: a
  * corpus where every document is mostly one corpus-frequent boilerplate
  * block (the uncapped prefix filter fans out quadratically), and
  * empty/short documents (whose degenerate partial shingles previously
  * collapsed to one key and paired every empty doc with every other). */
class Round16OpsSpec extends AnyFunSuite with SparkSuite {

  /** 200 boilerplate-heavy docs: one unique lead word + the same 12-word
    * block, so 10 of each doc's 11 shingles are corpus-frequent
    * (df=200) and only 1 is rare — fewer eligible shingles than the
    * prefix length (the skipped-prefix case). Plus one genuine
    * containment pair (rare shared content) that must survive the cap,
    * and empty/short docs that must be excluded entirely. */
  private def hostileCorpus(n: Int = 200) = {
    import spark.implicits._
    val block = (1 to 12).map(k => s"c$k").mkString(" ")
    val boiler = (1L to n.toLong).map(i => (i, s"uniq$i $block"))
    // doc 500's 4 shingles all sit inside doc 501 (containment 1.0)
    // while 501's six-word tail pushes the union to 10+4-4 = 10 shingles
    // (jaccard 0.4 < 0.5): the asymmetric pair only containment sees
    val contained = Seq(
      (500L, "alpha beta gamma delta epsilon zeta"),
      (501L, "alpha beta gamma delta epsilon zeta t1 t2 t3 t4 t5 t6"))
    val shorts = Seq((900L, ""), (901L, ""), (902L, "one two"))
    (boiler ++ contained ++ shorts).toDF("doc_id", "text")
  }

  test("q158: df cap bounds candidate volume under boilerplate skew; recall survives") {
    val docs = hostileCorpus()
    // uncapped: every boilerplate doc has only 1 eligible... every doc's
    // 3-long prefix must include 2 frequent shingles -> ~n^2/2 candidates
    val uncapped = Dedup.containmentCandidates(docs, pct = 80,
      dfCap = Int.MaxValue).count()
    assert(uncapped >= 19900L,
      s"the uncapped prefix joins through the df=200 shingles: $uncapped")
    // capped: frequent shingles are prefix-ineligible, so candidate rows
    // collapse to the genuinely-rare-overlap pairs only
    val capped = Dedup.containmentCandidates(docs, pct = 80, dfCap = 32)
    val cappedRows = capped.collect()
    assert(cappedRows.length <= 5,
      s"capped candidates must stay bounded: ${cappedRows.toSeq}")
    assert(cappedRows.exists(r =>
      r.getLong(0) == 500L && r.getLong(1) == 501L),
      s"the rare-content containment pair must remain a candidate: ${cappedRows.toSeq}")
  }

  test("q158: pure-boilerplate overlap is excluded by declared semantics; rare pair verified") {
    val out = Dedup.containmentPairsFor(hostileCorpus(), pct = 80, dfCap = 32)
      .collect()
    // the only emitted pair is the planted subset pair, at containment 1.0
    assert(out.length == 1, s"exactly the planted pair: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 500L && r.getAs[Long]("doc_b") == 501L)
    assert(r.getAs[Double]("containment") == 1.0, s"full subset: $r")
    assert(r.getAs[Boolean]("jaccard_missed"),
      s"the asymmetric member: only containment sees the subset pair: $r")
  }

  test("q158: documents below the shingle width never shingle, never pair") {
    import spark.implicits._
    // two empty docs, a 2-word doc, a NULL doc, and one real pair: the
    // degenerate '' partial shingle must not exist, so the empties can't
    // pair with each other (previously containment 1.0, quadratic noise)
    val docs = Seq(
      (1L, Some("")), (2L, Some("")), (3L, Some("one two")),
      (4L, Option.empty[String]),
      (10L, Some("alpha beta gamma delta epsilon zeta")),
      (11L, Some("alpha beta gamma delta epsilon zeta tail tailb")))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairsFor(docs, pct = 80).collect()
    assert(out.length == 1 &&
      out.head.getAs[Long]("doc_a") == 10L &&
      out.head.getAs[Long]("doc_b") == 11L,
      s"only the real pair; no degenerate empty-doc pairs: ${out.toSeq}")
  }

  /** The cap is output-neutral on honest corpora: at sf0.001 the max
    * shingle df is far below ContainmentDfCap, so capped ≡ uncapped
    * bit-for-bit (the sf0.01 oracle gate and the sf1 pin hold the larger
    * fixtures to the same identity). */
  test("q158: cap is output-neutral on the friendly fixture") {
    val d = "/root/testdata/sf0.001"
    val capped = Dedup.containmentPairs(spark, d).collect()
      .map(_.toString).sorted.toSeq
    org.apache.spark.sql.GraftBridge.releaseTransientPins()
    val uncapped = Dedup.containmentPairs(spark, d,
      dfCap = Int.MaxValue).collect().map(_.toString).sorted.toSeq
    org.apache.spark.sql.GraftBridge.releaseTransientPins()
    assert(capped == uncapped, "dfCap must not touch honest-corpus output")
    assert(capped.nonEmpty, "the sf0.001 fixture has containment pairs")
  }

  /** Cluster {1,2,3} straddles two sources; copy i is valued 0.5^(i-1)
    * by cluster-global doc_id rank. web holds copies 1+2 (1.0+0.5), lab
    * copy 3 (0.25) plus a singleton (1.0) — every output cell is the
    * closed form. */
  test("q163: decay-valued effective data prices the i-th copy at 0.5^(i-1)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "web", 100L), (2L, "web", 50L),
      (3L, "lab", 80L), (4L, "lab", 10L))
      .toDF("doc_id", "source", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("doc_id", "cluster_id")
    val out = graft.analytics.Dedup.effectiveDataOf(docs, clusters)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val web = out("web"); val lab = out("lab")
    assert(web.getAs[Long]("n_docs") == 2 && web.getAs[Long]("n_repeat_docs") == 1)
    assert(web.getAs[Long]("eff_docs_hard") == 1)
    assert(math.abs(web.getAs[Double]("eff_docs_decay") - 1.5) < 1e-9)
    assert(math.abs(web.getAs[Double]("eff_chars_decay") - (100.0 + 25.0)) < 1e-9)
    assert(math.abs(web.getAs[Double]("repeat_value_share") - 0.333333) < 1e-6)
    assert(lab.getAs[Long]("eff_docs_hard") == 1, s"only the singleton is a keeper: $lab")
    assert(math.abs(lab.getAs[Double]("eff_docs_decay") - 1.25) < 1e-9)
    assert(math.abs(lab.getAs[Double]("eff_chars_decay") - (20.0 + 10.0)) < 1e-9)
    assert(math.abs(lab.getAs[Double]("repeat_value_share") - 0.2) < 1e-9)
  }

  /** Bench item 0 is planted verbatim in the corpus (top-1 cosine 1.0 ->
    * contaminated); bench 20 is orthogonal to every corpus vector
    * (top-1 0.0 below threshold); bench 40 has a NULL embedding and
    * must surface as unscored, never as a cosine-0 match. */
  test("q164: semantic contamination flags the planted paraphrase-space leak only") {
    import spark.implicits._
    val dir = tempDir("graft_semcon").toString
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    Seq(
      (0L, Some(v(1, 0, 0, 0)), Some(7L)),   // bench: planted leak
      (20L, Some(v(0, 0, 0, 1)), Some(7L)),  // bench: clean
      (40L, Option.empty[Array[Float]], Some(7L)), // bench: unscorable
      (1L, Some(v(1, 0, 0, 0)), Some(7L)),   // corpus: the leak source
      (2L, Some(v(0, 1, 0, 0)), Some(7L)),
      (3L, Some(v(0, 0, 1, 0)), Some(7L)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.analytics.Similarity.semanticContamination(spark, dir)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_bench") == 3 && r.getAs[Long]("n_scored") == 2,
      s"NULL-embedding bench row is unscored: $r")
    assert(r.getAs[Long]("n_contaminated") == 1, s"only the planted leak: $r")
    assert(r.getAs[Double]("max_top_cos") == 1.0, s"verbatim leak scores 1.0: $r")
  }

  /** Exactness envelope of the composed path: probing EVERY cell turns
    * IVF-ADC into plain ADC — outputs must match bit-for-bit (the PqSpec
    * m=1/k=n discipline applied to the routing half). The recall audit
    * stays in [0,1] and covers every ADC query. */
  test("q165/q166: probing all cells recovers plain ADC; recall audit is total and bounded") {
    import graft.analytics.{Similarity, Tables}
    val d = "/root/testdata/sf0.001"
    val allCells = Similarity.ivfAdcTopKOf(Tables.embeddings(spark, d),
      m = 4, k = 4, iters = 2, topk = 5, stride = 100,
      nprobe = 8, nplanes = 3).collect().map(_.toString).sorted.toSeq
    org.apache.spark.sql.GraftBridge.releaseTransientPins()
    val plain = Similarity.pqAdcTopK(spark, d)
      .collect().map(_.toString).sorted.toSeq
    org.apache.spark.sql.GraftBridge.releaseTransientPins()
    assert(allCells == plain,
      "nprobe = 2^nplanes must collapse the routing to a no-op")
    val rec = Similarity.ivfAdcRecallStats(spark, d).collect()
    org.apache.spark.sql.GraftBridge.releaseTransientPins()
    assert(rec.nonEmpty)
    assert(rec.forall { r =>
      val x = r.getAs[Double]("recall"); x >= 0.0 && x <= 1.0
    }, s"recall must be a fraction: ${rec.toSeq}")
  }
}

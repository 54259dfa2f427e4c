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
}

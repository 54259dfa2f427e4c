package graft

import graft.analytics.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Equivalence + scale-shape gate for the exact-dup-collapsed pair surface
 * behind q114 (hamming histogram) and q101 (cross-source leakage).
 *
 * The production spellings collapse identical texts by content hash BEFORE
 * banding and recover the member-level aggregates analytically from the
 * multiplicity table; the retained exhaustive spellings (which band every
 * member row) are the oracles here. The hostile fixture plants one text
 * duplicated 1000× across sources — the exact shape that makes the
 * exhaustive surface emit ~n²/2 candidate rows inside one band group —
 * and the spec pins both (a) row-identical output and (b) a candidate
 * surface that stays linear in duplicate mass.
 */
class PairSurfaceSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).sorted.toSeq

  /** Hostile corpus: 1 text × 1000 copies across 3 sources (incl. NULL),
    * a cluster of near-dup variants, null texts, a singleton per source. */
  private def hostile(nDup: Int): DataFrame = {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val variant = (v: Int) =>
      (0 until 40).map(i => if (i % 13 == v % 13) s"x${v}_$i" else s"w$i").mkString(" ")
    val dups = (0 until nDup).map(i =>
      (i.toLong, base, if (i % 3 == 0) null else s"src${i % 3}"))
    val variants = (0 until 8).map(v =>
      (10000L + v, variant(v), s"src${v % 4}"))
    val nulls = Seq((20000L, null: String, "src0"), (20001L, null: String, null: String))
    val singles = (0 until 3).map(i => (30000L + i, s"unique doc $i only", s"src$i"))
    (dups ++ variants ++ nulls ++ singles).toDF("doc_id", "text", "source")
  }

  test("q114 collapsed ≡ exhaustive on the sf0.001 corpus") {
    assert(rows(Dedup.hammingHistogram(spark, sf)) ==
      rows(Dedup.hammingHistogramExhaustive(spark, sf)))
  }

  test("q101 collapsed ≡ exhaustive on the sf0.001 corpus") {
    val docs = graft.analytics.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    assert(rows(Dedup.crossSourceLeakageOf(docs, 6)) ==
      rows(Dedup.crossSourceLeakageExhaustiveOf(docs, 6)))
  }

  test("q114 collapsed ≡ exhaustive on the 1000×-dup hostile corpus") {
    val docs = hostile(1000)
    val meta = Dedup.simhashMetaOf(docs.select(col("doc_id"), col("text")))
    assert(rows(Dedup.hammingHistogramOf(meta, 6)) ==
      rows(Dedup.hammingHistogramExhaustiveOf(meta, 6)))
  }

  test("q101 collapsed ≡ exhaustive on the 1000×-dup hostile corpus") {
    val docs = hostile(1000)
    assert(rows(Dedup.crossSourceLeakageOf(docs, 6)) ==
      rows(Dedup.crossSourceLeakageExhaustiveOf(docs, 6)))
  }

  test("in-join first-shared-band dedup ≡ distinct() on every corpus shape") {
    // bandPairsOnce keeps a pair only in its lowest shared band; the row
    // set must equal the classic distinct() spelling exactly — on the
    // real corpus AND the hostile duplicated one
    val corpora = Seq(
      Dedup.simhashMetaOf(graft.analytics.Tables
        .documents(spark, sf).select(col("doc_id"), col("text"))),
      Dedup.simhashMetaOf(hostile(200).select(col("doc_id"), col("text"))))
    for (meta <- corpora; maxH <- Seq(3, 6, 60)) {
      val fps = meta.select(col("doc_id"), col("simhash"))
      assert(rows(Dedup.bandPairsOnce(fps, maxH)) ==
        rows(Dedup.bandPairs(fps, maxH).distinct()),
        s"maxHamming=$maxH")
    }
  }

  test("candidate surface is linear in duplicate mass, not quadratic") {
    val docs = hostile(1000)
    val meta = Dedup.simhashMetaOf(docs.select(col("doc_id"), col("text")))
    // exhaustive: the 1000 identical fingerprints alone emit C(1000,2)
    // member pairs (×4 bands pre-distinct) inside one band group
    val exhaustive = Dedup.bandPairs(
      meta.select(col("doc_id"), col("simhash")), 6).count()
    assert(exhaustive >= 1000L * 999 / 2,
      s"hostile fixture must stress the old surface (got $exhaustive)")
    // collapsed: unique fingerprints only — 13 distinct texts here, so the
    // banded join emits at most C(13,2)·4 rows regardless of multiplicity
    val groups = meta.filter(col("h128").isNotNull)
      .groupBy(col("h128"))
      .agg(min(col("simhash")).as("simhash"), min(col("doc_id")).as("doc_id"))
    val collapsed = Dedup.bandPairs(
      groups.select(col("doc_id"), col("simhash")), 6).count()
    assert(collapsed <= 13L * 12 / 2 * 4,
      s"collapsed surface must be bounded by unique-text pairs (got $collapsed)")
  }
}

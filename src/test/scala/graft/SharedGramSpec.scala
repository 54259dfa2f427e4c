package graft

import graft.analytics.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q84/q85: exact-substring recall the sampled (winnowing) variant can't
  * guarantee, and n-gram-level contamination flagging. */
class SharedGramSpec extends AnyFunSuite with SparkSuite {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = TempDirs.tempDir("sharedgram").toString
    rows.map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q84: a verbatim k-word span is always caught; unrelated docs are not") {
    val span = (1 to 10).map(i => s"span$i").mkString(" ") // 10 words = 3 distinct 8-grams
    val d = writeDocs(Seq(
      1L -> s"alpha beta $span gamma delta",
      2L -> s"unrelated prefix words here $span and a suffix",
      3L -> "completely different content with no overlap at all whatsoever"))
    val pairs = TextStats.sharedGramPairs(spark, d, k = 8, minShared = 3)
      .select("doc_a", "doc_b", "n_shared").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      s"expected exactly the span-sharing pair, got ${pairs.mkString(",")}")
    assert(pairs.head.getLong(2) >= 3, "the 10-word span must yield >= 3 shared 8-grams")
  }

  test("winnowing pairs are contained in exhaustive gram pairs at equal k") {
    // winnow fingerprints are window-minima of the very gram hashes q84
    // joins on, so every winnow-detected pair must also be gram-detected —
    // the sampled/exhaustive family relationship, asserted on real data.
    // Caps are DISABLED on both sides: the two dfCaps act at different
    // granularities (winnow-selection frequency vs raw gram document
    // frequency), so the strict containment is a property of the uncapped
    // operators — a boilerplate gram can exceed the raw-df cap while its
    // winnow selections stay under the fp-df cap (see sharedGramPairs doc)
    val d = "/root/testdata/sf0.001"
    val winnow = TextStats.winnowPairs(spark, d, k = 3, w = 4, minShared = 1,
      dfCap = Int.MaxValue).select("doc_a", "doc_b")
    val exhaustive = TextStats.sharedGramPairs(spark, d, k = 3, minShared = 1,
      dfCap = Int.MaxValue).select("doc_a", "doc_b")
    assert(winnow.exceptAll(exhaustive).isEmpty,
      "winnowing found a pair the exhaustive gram join missed — hashing diverged")
  }

  test("q84 df cap: a boilerplate gram shared by hundreds of docs attests no pairs") {
    import spark.implicits._
    // 400 docs: unique bodies + ONE common 8-word boilerplate tail. Without
    // the df cap the tail's grams put 400 rows into one join key group —
    // ~80k candidate rows from a single gram (d²/2, the quadratic shape a
    // real corpus hits with "click here to accept the terms of" tails).
    // With the cap (df 400 > 128) the hot gram is dropped BEFORE the join.
    val boiler = (1 to 8).map(i => s"boiler$i").mkString(" ")
    val docs = (0 until 400).map(i =>
      (i.toLong, s"unique${i}a unique${i}b unique${i}c unique${i}d $boiler"))
      .toDF("doc_id", "text")
    val capped = TextStats.sharedGramPairsOf(docs, k = 8, minShared = 1, dfCap = 128)
    assert(capped.isEmpty,
      "pairs attested only by a >cap boilerplate gram must be dropped")
    // rare-gram recall is untouched: two docs sharing a RARE span still pair
    val withRare = docs.unionByName(Seq(
      (1000L, "rare1 rare2 rare3 rare4 rare5 rare6 rare7 rare8 tail9"),
      (1001L, "head0 rare1 rare2 rare3 rare4 rare5 rare6 rare7 rare8"))
      .toDF("doc_id", "text"))
    val pairs = TextStats.sharedGramPairsOf(withRare, k = 8, minShared = 1, dfCap = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1000L, 1001L)),
      s"expected only the rare-span pair, got ${pairs.mkString(",")}")
  }

  test("q85: a verbatim copy of a benchmark doc is flagged at ratio 1.0") {
    val body = (1 to 20).map(i => s"bench$i").mkString(" ")
    val d = writeDocs(Seq(
      0L -> body, // doc_id 0 ≡ 0 mod 97 → benchmark slice
      5L -> body, // verbatim copy → every gram hits
      7L -> "none of these words appear in the benchmark document at all today"))
    val out = TextStats.ngramContamination(spark, d, k = 8)
      .select("doc_id", "hit_ratio").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((5L, 1.0)),
      s"expected only the verbatim copy flagged at 1.0, got ${out.mkString(",")}")
  }
}

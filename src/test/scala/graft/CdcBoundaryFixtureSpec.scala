package graft

import graft.analytics.TextStats
import org.scalatest.funsuite.AnyFunSuite

/**
 * CDC boundary-convention fixture (round 20): the map-side array form of
 * [[graft.analytics.TextStats.cdcChunkOccurrencesOf]] must reproduce the
 * windowed reference spelling ROW FOR ROW on every planted boundary shape
 * — the q168-band-fixture precedent applied to the chunk family before
 * the rewrite was allowed to land. The planted corpus covers each
 * convention the scaladoc declares:
 *
 *  - NULL text (no rows), empty text (one chunk: md5(""), nw=1),
 *  - 1- and 2-word docs (no interior cut is possible),
 *  - a boundary at the LAST word (must not open an empty chunk),
 *  - divisor=1 (cut after EVERY word p >= 1: first chunk is 2 words,
 *    the rest singletons — the running-sum convention, not one-word-each),
 *  - divisor large (no cuts: one chunk per doc),
 *  - repeated words (identical bigram hashes, consecutive cuts).
 */
class CdcBoundaryFixtureSpec extends AnyFunSuite with SparkSuite {

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val planted = Seq(
    1L -> null.asInstanceOf[String],
    2L -> "",
    3L -> "solo",
    4L -> "two words",
    5L -> "the quick brown fox jumps over the lazy dog",
    6L -> ("rep rep rep rep rep rep rep rep"),
    7L -> (0 until 64).map(i => s"w$i").mkString(" "),
    8L -> "   padded   whitespace   text   here   ")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet

  test("map-side CDC chunks == windowed reference on every planted shape") {
    for (divisor <- Seq(1, 2, 4, 16, 1000000)) {
      val a = canon(TextStats.cdcChunkOccurrencesOf(docsDF(planted), divisor))
      val b = canon(TextStats.cdcChunkOccurrencesWindowed(docsDF(planted), divisor))
      assert(a == b,
        s"divisor=$divisor mismatch:\n only map-side: ${a -- b}\n only windowed: ${b -- a}")
    }
  }

  test("map-side CDC chunks == windowed reference on the sf0.001 corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val a = canon(TextStats.cdcChunkOccurrencesOf(docs, 16))
    val b = canon(TextStats.cdcChunkOccurrencesWindowed(docs, 16))
    assert(a == b, s"corpus mismatch: ${(a -- b).take(5)} / ${(b -- a).take(5)}")
  }

  test("declared conventions hold: empty text, no empty trailing chunk") {
    val occ = TextStats.cdcChunkOccurrencesOf(docsDF(planted), 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // NULL text: no rows at all
    assert(!occ.exists(_._1 == 1L))
    // empty text: exactly one chunk, nw=1, md5 of the empty string
    val empty = occ.filter(_._1 == 2L)
    assert(empty.length == 1 && empty.head._4 == 1L &&
      empty.head._3 == "d41d8cd98f00b204e9800998ecf8427e")
    // divisor=1: doc 5 (9 words) cuts after every word from pos 1 on;
    // chunk 0 carries words 0..1, chunks 1..7 one word each — and no
    // zero-width chunk exists anywhere
    val d5 = occ.filter(_._1 == 5L).sortBy(_._2)
    assert(d5.map(_._4).toSeq == Seq(2L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    assert(occ.forall(_._4 >= 1L), "zero-width chunk emitted")
  }
}

package graft

import graft.analytics.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Winnowing semantics (q78/q79): the shift-resistance guarantee — any
 * shared word run of length ≥ w+k-1 yields ≥1 identical fingerprint
 * regardless of position — plus planted near-dup recall and a
 * no-false-positive control on disjoint-vocabulary documents.
 */
class WinnowingSpec extends AnyFunSuite with SparkSuite {

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = TempDirs.tempDir("winnow").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def wordsOf(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("planted shifted near-dups are recalled; disjoint docs produce no pairs") {
    val core = wordsOf("shared", 30) // 30-word common run
    val docs = Seq(
      1L -> s"${wordsOf("alpha", 8)} $core ${wordsOf("beta", 5)}",
      // same core SHIFTED: different prefix length, different suffix —
      // whole-doc hashes (q42) can never match these
      2L -> s"${wordsOf("gamma", 3)} $core ${wordsOf("delta", 9)}",
      // controls: entirely disjoint vocabularies
      3L -> wordsOf("epsilon", 40),
      4L -> wordsOf("zeta", 40))
    val pairs = TextStats.winnowPairs(spark, corpusDir(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "shifted near-dup pair not recalled")
    assert(pairs.forall(p => p == ((1L, 2L))),
      s"false-positive pairs among disjoint docs: $pairs")
  }

  test("guarantee: a shared run of w+k-1 words yields >= 1 common fingerprint") {
    // k=3, w=4 → any 6-word shared run guarantees a common fingerprint:
    // the run contains 4 consecutive k-gram hashes = one full window, and
    // winnowing picks that window's minimum in both documents
    val run = wordsOf("run", 6)
    val docs = Seq(
      1L -> s"${wordsOf("pre", 11)} $run",
      2L -> s"$run ${wordsOf("post", 7)}")
    val fps = TextStats.winnowFingerprints(spark, corpusDir(docs))
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "no common fingerprint despite a w+k-1 shared run")
  }

  test("fingerprints are insensitive to a pure prefix shift (same suffix set)") {
    val body = wordsOf("body", 20)
    val docs = Seq(
      1L -> body,
      2L -> s"${wordsOf("shift", 4)} $body")
    val fps = TextStats.winnowFingerprints(spark, corpusDir(docs))
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
    // every fingerprint of the unshifted doc that comes from a window fully
    // inside the body must reappear in the shifted doc
    val common = byDoc(1L) intersect byDoc(2L)
    assert(common.size >= byDoc(1L).size - 1,
      s"prefix shift destroyed fingerprints: ${byDoc(1L).size} -> ${common.size} common")
  }
}

package graft

import graft.analytics.{Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 additions: q172 audio near-dup clusters (the q130 image
  * precedent on the q155 fingerprints) and the label-invariance
  * property that lets the streaming quality-keeper ledger serve batch
  * q153 off the maintained forest. The planted payloads drive shapes
  * the driver fixture can never pin down: a controlled Hamming-1 pair,
  * a band-collision pair the Hamming gate must REJECT, and a cluster
  * whose forest labels are deliberately not the component minimum. */
class Round18OpsSpec extends AnyFunSuite with SparkSuite {

  /** Frame f of the payload is 16 copies of one ASCII char whose
    * distance from 128 IS the frame's RMS — so the delta-sign
    * fingerprint is exact integer plumbing, no float edge. */
  private def frames(codes: Seq[Int]): String =
    codes.map(c => c.toChar.toString * 16).mkString

  private def audioCorpus() = {
    import spark.implicits._
    // rms(f) = 128 - code(f): decreasing codes => increasing energies
    val inc = frames((0 until 40).map(120 - _))
    // identical except frame 30 repeats frame 29's energy: bit 29 clears
    // => Hamming 1 vs `inc`, three of four bands still shared
    val near = frames((0 until 40).map(f => if (f == 30) 91 else 120 - f))
    // constant energy => fingerprint 0; so does the two-byte stub — they
    // pair at Hamming 0. BOTH also share the all-zero top band with
    // `inc` (bits 45-59 unset there too): a candidate pair the
    // Hamming<=6 gate must then reject (distance 39).
    val flat = frames(Seq.fill(40)(100))
    Seq(
      (1L, inc, "en", "web", inc.length.toLong),
      (2L, inc, "en", "web", inc.length.toLong),
      (3L, near, "en", "lab", near.length.toLong),
      (4L, flat, "en", "web", flat.length.toLong),
      (5L, "ab", "en", "lab", 2L),
      (6L, null: String, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def writeCorpus(name: String): String = {
    val dir = TempDirs.tempDir(name).toFile
    audioCorpus().write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  test("q172: exact + Hamming-1 audio payloads cluster; band collisions beyond the gate don't; null never clusters") {
    val d = writeCorpus("graft_r18_q172")
    val got = Multimodal.audioFpClusters(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L),
      s"expected {1,2,3} and {4,5} with min-id labels, got $got")
  }

  test("q172 is deterministic across runs") {
    val d = writeCorpus("graft_r18_q172b")
    val h1 = graft.tools.ResultHash.hashOf(Multimodal.audioFpClusters(spark, d))
    val h2 = graft.tools.ResultHash.hashOf(Multimodal.audioFpClusters(spark, d))
    assert(h1 == h2)
  }

  test("qualityKeepersOf is label-invariant: any component labeling serves the same policy table") {
    import spark.implicits._
    val docs = Seq(
      (10L, "web", 100L), (11L, "web", 110L), (12L, "lab", 120L),
      (2L, "web", 95L), (30L, "lab", 52L))
      .toDF("doc_id", "source", "n_chars")
    // one 4-member component under two labelings: the batch min label
    // (2) and a displaced forest label (11 — a root the streaming gate
    // can transiently carry); 30 stays unassigned (singleton, excluded)
    def clusters(lbl: Long) = Seq(
      (2L, lbl), (10L, lbl), (11L, lbl), (12L, lbl))
      .toDF("doc_id", "cluster_id")
    val a = Dedup.qualityKeepersOf(docs, clusters(2L))
      .collect().map(_.toString).sorted.toSeq
    val b = Dedup.qualityKeepersOf(docs, clusters(11L))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, s"labels must cancel: min=$a displaced=$b")
    // and the policy numbers are right: keeper is doc 12 (120 chars,
    // source lab), the min-id baseline is doc 2 (95 chars) — so the
    // keeper's source gains 120 and carries the baseline's 95
    val m = Dedup.qualityKeepersOf(docs, clusters(2L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m("lab") == ((120L, 95L, 25L)),
      s"keeper=12 (120 chars) vs min-id=2 (95 chars): $m")
  }
}

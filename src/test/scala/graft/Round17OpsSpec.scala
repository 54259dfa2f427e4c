package graft

import graft.analytics.{Quantization, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 additions: the q170 int8 retrieval honesty audit and the q171
  * SemDeDup cell-blocking recall audit. Planted shapes the driver fixture
  * can never show: a corpus whose top-k is provably quantization-immune
  * (q170's exactness envelope), and same-direction pairs that k-means
  * MUST co-assign (q171's can-never-miss envelope) next to borderline
  * pairs it legitimately may split. */
class Round17OpsSpec extends AnyFunSuite with SparkSuite {

  /** Axis-aligned 8-dim vectors: cosine is 1 within a direction group and
    * 0 across groups — int8 mid-rise error (≤ step/2 per element) cannot
    * reorder a 1-vs-0 margin, and k-means must co-assign equal-direction
    * vectors under ANY codebook (equal cosines, identical tie-break). */
  private def axisCorpus() = {
    import spark.implicits._
    def axis(i: Int, scale: Float): Seq[Float] =
      Seq.tabulate(8)(j => if (j == i) scale else 0f)
    // queries are vec_id % 100 == 0 / % 50 == 0: put one per direction
    // group at 0 and 100; group members at distinct scales (same
    // direction => cosine exactly 1 after normalization on both engines)
    val rows = Seq(
      (0L, axis(0, 1f), 0), (1L, axis(0, 2f), 0), (2L, axis(0, 3f), 0),
      (3L, axis(0, 4f), 0), (4L, axis(0, 5f), 0), (5L, axis(0, 6f), 0),
      (100L, axis(1, 1f), 1), (101L, axis(1, 2f), 1), (102L, axis(1, 3f), 1),
      (103L, axis(1, 4f), 1), (104L, axis(1, 5f), 1), (105L, axis(1, 6f), 1),
      (7L, axis(2, 1f), 2), (8L, axis(3, 1f), 2), (9L, axis(4, 1f), 2))
    rows.toDF("vec_id", "embedding", "label")
  }

  private def writeCorpus(name: String): String = {
    val dir = TempDirs.tempDir(name).toFile
    axisCorpus().write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    dir.getAbsolutePath
  }

  test("q170: dequantized rebuild reconstructs within step/2 and keeps axis top-k exact (recall 1.0)") {
    val d = writeCorpus("graft_r17_q170")
    // the rebuild: every vector present (no NULLs here), same width
    val dq = Quantization.dequantizedInt8(
      spark.read.parquet(s"$d/embeddings.parquet"))
    assert(dq.count() == 15)
    assert(dq.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
    // exactness envelope: a 1-vs-0 cosine margin is quantization-immune,
    // so int8 retrieval must reproduce the float top-k exactly
    val rec = Similarity.int8RecallStats(spark, d, k = 5, stride = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(rec.keySet == Set(0L, 100L))
    assert(rec.values.forall(_ == 1.0),
      s"axis-separated corpus must survive int8 bit-exactly: $rec")
  }

  test("q170 determinism: identical result hash across two runs") {
    val d = writeCorpus("graft_r17_q170b")
    val h1 = graft.tools.ResultHash.hashOf(Similarity.int8RecallStats(spark, d))
    val h2 = graft.tools.ResultHash.hashOf(Similarity.int8RecallStats(spark, d))
    assert(h1 == h2)
  }

  test("q171: same-direction pairs are always caught; the audit prices only genuine blocking loss") {
    val d = writeCorpus("graft_r17_q171")
    val out = Similarity.semanticBlockingRecall(spark, d,
      k = 3, iters = 2, threshold = 0.35, stride = 50)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // probes 0/100/... pair with their direction group at cosine exactly
    // 1 -> the 0.9+ band; equal-direction vectors co-assign under any
    // codebook (equal cosines to every centroid, identical tie-break),
    // so the blocked structure can NEVER split them: recall must be 1
    val (nTrue, nSame, recall) = out("0.9+")
    assert(nTrue == 10, s"two probes x five same-direction partners: $out")
    assert(nSame == 10 && recall == 1.0,
      s"equal-direction pairs must be co-assigned, got $out")
    // orthogonal directions (cos 0) never enter the truth set: the 0.9+
    // band holds ALL truth pairs, so every other band is truth-empty
    assert(out.values.map(_._1).sum == 10,
      s"truth pairs outside the 0.9+ band: $out")
  }

  test("frozen-codebook dequantization clamps BOTH sides to shippable uint8 codes") {
    import spark.implicits._
    // codebook frozen from a [0, 1] snapshot (mn=0, mx=1 on both dims)
    val snapshot = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val cb = Quantization.int8Codebook(snapshot)
    // an arrival OUTSIDE the frozen range on both sides: below mn must
    // clamp to code 0 (not floor to a negative, unshippable code), above
    // mx to code 255 — so the maintained table reconstructs exactly the
    // code-0 / code-255 mid-rise midpoints
    val arrival = Seq((3L, Seq(-5f, 7f))).toDF("vec_id", "embedding")
    val got = Quantization.dequantizedInt8Of(arrival, cb)
      .select(col("embedding")).as[Seq[Double]].head()
    val step = 1.0 / 256.0
    assert(math.abs(got.head - 0.5 * step) < 1e-12,
      s"below-mn arrival must reconstruct as the code-0 midpoint: $got")
    assert(math.abs(got(1) - 255.5 * step) < 1e-12,
      s"above-mx arrival must reconstruct as the code-255 midpoint: $got")
    // in-range batch path unchanged: snapshot reconstructs within range
    val batch = Quantization.dequantizedInt8Of(snapshot, cb)
      .select(col("embedding")).as[Seq[Double]].collect()
    assert(batch.flatten.forall(x => x >= 0.0 && x <= 1.0))
  }
}

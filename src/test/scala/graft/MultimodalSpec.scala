package graft

import graft.analytics.Multimodal
import org.apache.spark.sql.functions.{col, length}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: real PNG encode→decode round trip, byte-histogram
  * features, resize metadata math. */
class MultimodalSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("PNG round trip: javax.imageio decodes back the rendered dimensions") {
    // pure-function level
    val bytes = Multimodal.pngBytes(docId = 7, w = 33, h = 21)
    assert(bytes.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) // PNG magic
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 33 && img.getHeight == 21)
    // deterministic pixels: re-render is byte-identical
    assert(bytes.sameElements(Multimodal.pngBytes(docId = 7, w = 33, h = 21)))

    // pipeline level: decoded dims equal the n_chars formula for every doc
    import spark.implicits._
    val decoded = Multimodal.decodeMeta(spark, d)
      .as[Multimodal.DecodedMeta].collect()
    assert(decoded.nonEmpty)
    val nChars = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    decoded.foreach { m =>
      val (w, h) = Multimodal.imageDims(nChars(m.doc_id))
      assert(m.width.contains(w.toLong) && m.height.contains(h.toLong),
        s"doc ${m.doc_id}: got ${m.width}x${m.height}")
    }
  }

  test("byte histogram sums to payload length; entropy within [0, 4] bits") {
    import spark.implicits._
    val feats = Multimodal.featureVectors(spark, d).collect()
    assert(feats.nonEmpty)
    val lens = Multimodal.mediaTable(spark, d)
      .select(col("doc_id"), length(col("payload")).cast("long"))
      .as[(Long, Long)].collect().toMap
    feats.foreach { f =>
      assert(f.histogram.sum == lens(f.doc_id))
      assert(f.entropy_bits >= 0.0 && f.entropy_bits <= 4.0 + 1e-9) // 16 buckets = 4 bits max
    }
  }

  private def grayImg(w: Int, h: Int)(f: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("dHash: planted near-identical pair at Hamming 1; shift and resize invariance") {
    // monotone left-to-right gradient: every left sample < right sample,
    // so no gradient bit is ever set
    val base = grayImg(66, 12)((x, _) => x)
    assert(Multimodal.dhash60(base) == 0L)
    // near-identical variant: spike ONE grid sample (gx=3 → sx=18, gy=2 →
    // sy=4); only the (gx=3 > gx=4) comparison flips → Hamming exactly 1
    val spiked = grayImg(66, 12)((x, y) => if (x == 18 && y == 4) 255 else x)
    val hb = Multimodal.dhash60(base); val hs = Multimodal.dhash60(spiked)
    assert(java.lang.Long.bitCount(hb ^ hs) == 1,
      s"planted single-sample spike must cost exactly 1 bit (got ${java.lang.Long.bitCount(hb ^ hs)})")
    assert((hs >> (2 * 10 + 3) & 1L) == 1L, "the flipped bit is (row 2, c 3)")
    // uniform brightness shift preserves every gradient comparison
    val brighter = grayImg(66, 12)((x, _) => x + 30)
    assert(Multimodal.dhash60(brighter) == hb)
    // a half-size render of the same gradient hashes identically —
    // the resize robustness that makes dHash a near-dup key
    val small = grayImg(33, 6)((x, _) => x * 2)
    assert(Multimodal.dhash60(small) == hb)
  }

  test("q128 pipeline: fingerprint nullity tracks payload; banded plan stays cartesian-free") {
    import spark.implicits._
    val meta = Multimodal.dhashMeta(spark, d)
      .select(col("doc_id"), col("h128").isNull, col("simhash").isNull)
      .as[(Long, Boolean, Boolean)].collect()
    assert(meta.nonEmpty)
    meta.foreach { case (id, hNull, sNull) =>
      assert(hNull == sNull, s"doc $id: h128/simhash nullity diverged")
    }
    val plan = Multimodal.imageDhashHistogram(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "image near-dup surface must stay the banded equi-join")
  }

  test("resize preserves aspect and caps the long side") {
    assert(Multimodal.resizeBox(640, 480, 256) == ((256L, 192L)))
    assert(Multimodal.resizeBox(100, 50, 256) == ((100L, 50L))) // no upscale
    assert(Multimodal.resizeBox(0, 480, 256) == ((1L, 256L))) // degenerate dims clamp to 1
    val out = Multimodal.resizedMeta(spark, d, maxSide = 30)
    import spark.implicits._
    out.select("resized_w", "resized_h").as[(Long, Long)].collect().foreach {
      case (w, h) => assert(w <= 30 && h <= 30)
    }
  }
}

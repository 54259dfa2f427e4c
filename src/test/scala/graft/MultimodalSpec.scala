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

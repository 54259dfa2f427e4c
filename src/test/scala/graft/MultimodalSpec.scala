package graft

import graft.analytics.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: stub decode arithmetic, byte-histogram features,
  * resize metadata math. */
class MultimodalSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("decode stub is deterministic arithmetic over payload length") {
    assert(Multimodal.decodeStub(new Array[Byte](650)) == ((10L, 230L))) // 650*7 mod 480
    assert(Multimodal.decodeStub(Array.empty[Byte]) == ((0L, 0L)))
  }

  test("byte histogram sums to payload length; entropy within [0, 4] bits") {
    import spark.implicits._
    val feats = Multimodal.featureVectors(spark, d).collect()
    assert(feats.nonEmpty)
    val lens = Multimodal.decodeMeta(spark, d)
      .select("doc_id", "byte_len").as[(Long, Long)].collect().toMap
    feats.foreach { f =>
      assert(f.histogram.sum == lens(f.doc_id))
      assert(f.entropy_bits >= 0.0 && f.entropy_bits <= 4.0 + 1e-9) // 16 buckets = 4 bits max
    }
  }

  test("resize preserves aspect and caps the long side") {
    assert(Multimodal.resizeBox(640, 480, 256) == ((256L, 192L)))
    assert(Multimodal.resizeBox(100, 50, 256) == ((100L, 50L))) // no upscale
    assert(Multimodal.resizeBox(0, 480, 256) == ((1L, 256L))) // degenerate dims clamp to 1
    val out = Multimodal.resizedMeta(spark, d, maxSide = 100)
    import spark.implicits._
    out.select("resized_w", "resized_h").as[(Long, Long)].collect().foreach {
      case (w, h) => assert(w <= 100 && h <= 100)
    }
  }
}

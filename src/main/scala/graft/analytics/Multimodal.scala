package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with typed
 * metadata, processed in per-partition batches.
 *
 * The container ships no image/audio codecs, so `decodeStub` is a
 * clearly-marked DETERMINISTIC FAKE (metadata derived arithmetically from
 * the payload bytes). Everything around it — binary schema, partition-batch
 * iteration via `mapPartitions` on a typed Dataset, output schema — is the
 * real production shape: swap `decodeStub` for a JNI/codec call and nothing
 * else changes.
 *
 * 100 TB posture: decode is a narrow per-partition map (no shuffle); binary
 * payloads never hit the driver; partition sizing is governed by
 * `maxPartitionBytes` on the scan.
 */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedMeta(doc_id: Long, byte_len: Long, width: Long, height: Long)

  /** STUB — stands in for a real image decode. Deterministic so tests and
    * the DuckDB oracle can reproduce it from the payload length alone. */
  def decodeStub(payload: Array[Byte]): (Long, Long) = {
    val len = payload.length.toLong
    (len % 640, (len * 7) % 480)
  }

  /** Fake a media table from documents: utf-8 bytes of text = "image". */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"))

  /** The decode pipeline: typed partition-batch map over binary payloads. */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = mediaTable(s, d).as[MediaRow]
    media.mapPartitions { batch =>
      // batch-shaped: a real decoder would init its codec once here,
      // then stream the partition through it.
      batch.map { row =>
        val (w, h) = decodeStub(row.payload)
        DecodedMeta(row.doc_id, row.payload.length.toLong, w, h)
      }
    }.toDF()
  }

  final case class Feature(doc_id: Long, histogram: Array[Long], entropy_bits: Double)

  /**
   * Feature extraction over the raw bytes (honest computation, no codec):
   * 16-bucket byte histogram + Shannon entropy per payload, batched through
   * mapPartitions like a real embedding/feature model would be (model init
   * once per partition, stream the batch through).
   */
  def featureVectors(s: SparkSession, d: String): Dataset[Feature] = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow].mapPartitions { batch =>
      // a real extractor would load its model here, once per partition
      batch.map { row =>
        val hist = new Array[Long](16)
        row.payload.foreach(b => hist((b & 0xFF) >> 4) += 1)
        val n = row.payload.length.toDouble
        val entropy = hist.filter(_ > 0).map { c =>
          val p = c / n; -p * math.log(p) / math.log(2)
        }.sum
        Feature(row.doc_id, hist, entropy)
      }
    }
  }

  /** Query form of [[featureVectors]]: the histogram unrolled to 16 scalar
    * columns (h0..h15) so results are plainly sortable/hashable downstream
    * (and by the correctness gate), entropy rounded for stable compares. */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    val hCols = (0 until 16).map(i => col("histogram")(i).as(s"h$i"))
    featureVectors(s, d).toDF()
      .select(col("doc_id") +: hCols :+ round(col("entropy_bits"), 6).as("entropy_bits"): _*)
  }

  /** Resize stub: fit (width, height) into a target box preserving aspect
    * ratio — integer metadata math only; the pixel work is the codec's. */
  def resizeBox(width: Long, height: Long, maxSide: Long): (Long, Long) = {
    val side = math.max(math.max(width, height), 1L)
    if (side <= maxSide) (width, height)
    else (math.max(width * maxSide / side, 1L), math.max(height * maxSide / side, 1L))
  }

  /** Decode → resize metadata pipeline (stub decode, real plumbing). */
  def resizedMeta(s: SparkSession, d: String, maxSide: Long = 256): DataFrame = {
    import s.implicits._
    decodeMeta(s, d).as[DecodedMeta].map { m =>
      val (w, h) = resizeBox(m.width, m.height, maxSide)
      (m.doc_id, m.width, m.height, w, h)
    }.toDF("doc_id", "width", "height", "resized_w", "resized_h")
  }

  /** Frame-sampling shape: deterministic "frames" (offset markers) per media
    * item — the explode pattern a video pipeline uses, minus the codec. */
  def frameSample(s: SparkSession, d: String, everyBytes: Int = 256): DataFrame =
    mediaTable(s, d)
      .withColumn("n_frames",
        greatest((length(col("payload")) / everyBytes).cast("int"), lit(1)))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("frame_idx", "frame_no")))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_no") * everyBytes).as("byte_offset"))
}

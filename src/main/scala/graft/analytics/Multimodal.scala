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

package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with typed
 * metadata, processed in per-partition batches.
 *
 * The image path is REAL: [[pngMediaTable]] renders a deterministic PNG per
 * document (dimensions a pure function of `n_chars`) and [[decodeMeta]]
 * decodes it back with `javax.imageio` — a genuine encode→bytes→decode
 * round trip whose output the DuckDB oracle checks by recomputing the
 * dimension formula. Text-byte payloads ([[mediaTable]]) drive the
 * frame-sampling and feature-extraction shapes where the payload content
 * itself is the fixture.
 *
 * 100 TB posture: encode/decode are narrow per-partition maps (no shuffle,
 * codec initialized once per partition); binary payloads never hit the
 * driver; partition sizing is governed by `maxPartitionBytes` on the scan.
 */
object Multimodal {

  // ImageIO's default ImageInputStream is DISK-cached: every decode of an
  // in-memory payload creates (and deletes) a temp file under
  // java.io.tmpdir — pure overhead for ByteArrayInputStream sources, a
  // per-image file-op tax on every executor at scale, and a host-disk
  // sensitivity (round-15: q43 ran 3.6-10x its minimum in windows where
  // /tmp was slow, with low pass-to-pass spread — a sustained IO cost,
  // not a scheduler stall). Memory-cached streams remove the filesystem
  // from the decode path entirely. Set in each per-partition decoder
  // init (not object static init): classloading timing is the wrong
  // trigger for a JVM-global ImageIO mutation — on a real cluster the
  // executor JVMs never classload this object's statics at a predictable
  // point, and the per-partition init is where a real pipeline
  // configures its codec anyway.
  @inline private def initDecoder(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  // Option dims: a NULL-text document has no payload and decodes to a
  // (doc_id, NULL, NULL) ledger row — the same null-visibility discipline
  // as the q91 explode_outer ledger, and exactly what the oracle's
  // n_chars-formula replay produces for a NULL n_chars
  final case class DecodedMeta(doc_id: Long, width: Option[Long], height: Option[Long])

  /** Text-bytes media table: utf-8 bytes of text as an opaque payload —
    * the fixture for frame sampling (q44) and feature extraction (q59). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"))

  /** Deterministic image dimensions per document. Pure so the oracle can
    * recompute them from `n_chars` alone. */
  def imageDims(nChars: Long): (Int, Int) =
    ((1 + nChars % 64).toInt, (1 + (nChars * 7) % 48).toInt)

  /** Render one deterministic RGB PNG (pixel = f(doc_id, x, y)). */
  def pngBytes(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = (docId * 131 + x * 31 + y * 7).toInt & 0xFFFFFF
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w) // one bulk write, not w*h calls
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** PNG media table: one real PNG payload per document, rendered in
    * per-partition batches (encoder state initialized once per partition —
    * the production codec shape). */
  def pngMediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documentsSpread(s, d).select(col("doc_id"), col("n_chars"))
      .as[(Long, Option[Long])] // n_chars NULL for a NULL-text doc
      .mapPartitions { batch =>
        initDecoder() // ImageIO.write consults the same JVM-global cache
                      // toggle as read — a direct consumer of this table
                      // must not re-acquire disk-cached streams
        batch.map {
          case (id, Some(nChars)) =>
            val (w, h) = imageDims(nChars)
            MediaRow(id, pngBytes(id, w, h))
          case (id, None) => MediaRow(id, null) // no content, no payload
        }
      }
  }

  /** The decode pipeline: `javax.imageio` over real PNG payloads, batched
    * per partition. Emits honest decoded dimensions — if either the encode
    * or the decode were wrong, the oracle's recomputed formula would
    * mismatch. */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngMediaTable(s, d).mapPartitions { batch =>
      // decoder init once per partition (memory-cached streams, see above)
      initDecoder()
      batch.map { row =>
        if (row.payload == null) DecodedMeta(row.doc_id, None, None)
        else {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
          DecodedMeta(row.doc_id, Some(img.getWidth.toLong), Some(img.getHeight.toLong))
        }
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
        // NULL payload: null histogram but entropy 0.0 — the oracle's
        // CASE WHEN c > 0 folds null counts to 0.0 terms, so its sum is
        // 0.0 while the bucket columns stay NULL
        if (row.payload == null) Feature(row.doc_id, null, 0.0)
        else {
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
      (m.width, m.height) match {
        case (Some(w0), Some(h0)) =>
          val (w, h) = resizeBox(w0, h0, maxSide)
          (m.doc_id, m.width, m.height, Some(w), Some(h))
        case _ => (m.doc_id, None: Option[Long], None: Option[Long],
          None: Option[Long], None: Option[Long])
      }
    }.toDF("doc_id", "width", "height", "resized_w", "resized_h")
  }

  // ------------------------------------------------- image near-dup (q128)

  /** dHash grid geometry: 6 rows × 11 columns of nearest-neighbor gray
    * samples → 6×10 = 60 horizontal-gradient bits. 60 bits deliberately —
    * the fingerprint drops straight into the SimHash band machinery
    * ([[Dedup.SimhashBands]] 4×15-bit bands, [[Dedup.hammingHistogramOf]]
    * distinct-value banding), so the image near-dup surface inherits the
    * cartesian-free, duplicate-collapsed 100 TB posture for free. */
  val DhashRows = 6
  val DhashCols = 11

  /** Perceptual difference hash of one decoded image: sample gray
    * (integer mean of R,G,B) at the DhashRows×DhashCols nearest-neighbor
    * grid, set bit (row·10 + c) iff gray(c) > gray(c+1). Gradient-based,
    * so uniform brightness shifts and resizes preserve the hash — the
    * published dHash property that makes it a near-dup key rather than a
    * checksum. */
  def dhash60(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    var bits = 0L
    var gy = 0
    while (gy < DhashRows) {
      val sy = gy * h / DhashRows
      var prev = 0
      var gx = 0
      while (gx < DhashCols) {
        val sx = gx * w / DhashCols
        val v = img.getRGB(sx, sy)
        val gray = (((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)) / 3
        if (gx > 0 && prev > gray) bits |= 1L << (gy * 10 + (gx - 1))
        prev = gray
        gx += 1
      }
      gy += 1
    }
    bits
  }

  // h128 is the raw 16-byte md5 digest (binary, matching the
  // Dedup.simhashMetaOf contract) — internal join/group state only
  final case class DhashRow(doc_id: Long, h128: Option[Array[Byte]], simhash: Option[Long])

  /** Per-image fingerprint rows (doc_id, h128 = payload md5, dhash) —
    * the image analogue of [[Dedup.simhashMetaOf]]: a narrow per-partition
    * decode map (codec + digest initialized once per partition, payloads
    * never shuffle), emitting exactly the frame shape the banded pair
    * machinery consumes. NULL payload → NULL fingerprint (never pairs). */
  def dhashMeta(s: SparkSession, d: String): DataFrame =
    dhashMetaOf(pngMediaTable(s, d).toDF())

  /** [[dhashMeta]] over an arbitrary (doc_id, payload) frame — the form
    * the streaming image gate ([[graft.streaming.StreamingCorpus
    * .startImageClusterGate]]) fingerprints arriving batches with, and
    * the batch corpus path above. An undecodable payload keeps its exact
    * hash (byte-identical re-posts still collapse) but carries no
    * perceptual fingerprint — it can never NEAR-dup, the q74 null
    * guard's image analogue. */
  def dhashMetaOf(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        initDecoder()
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { row =>
          if (row.payload == null) DhashRow(row.doc_id, None, None)
          else {
            md.reset()
            val digest = md.digest(row.payload)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(row.payload))
            if (img == null) DhashRow(row.doc_id, Some(digest), None)
            else DhashRow(row.doc_id, Some(digest), Some(dhash60(img)))
          }
        }
      }.toDF()
  }

  /** Session-scoped memo of the decoded fingerprint table per corpus dir
    * — the [[Dedup.sharedClusterEdges]] discipline applied to the image
    * family: q128 (histogram) and q130 (clusters) both need exactly this
    * narrow (doc_id, h128, simhash) table, and the render+decode pass
    * over every payload is their dominant cost. Keyed by applicationId
    * so a restarted context never serves a stale RDD. */
  private val dhashMetaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  def dhashMetaShared(s: SparkSession, d: String): DataFrame = {
    val key = (s.sparkContext.applicationId, new java.io.File(d).getCanonicalPath)
    dhashMetaCache.computeIfAbsent(key,
      // session scope: shared across q128/q130 — must survive the first
      // consumer's releaseTransientPins
      _ => org.apache.spark.sql.GraftBridge.sessionPinned(
        org.apache.spark.sql.GraftBridge.checkpointNoStats(
          dhashMeta(s, d), eager = false)))
  }

  private[graft] def clearDhashMetaCache(): Unit = dhashMetaCache.clear()

  /**
   * q128: image perceptual-near-dup Hamming histogram — the multimodal
   * counterpart of the q114 text histogram: decode every image once,
   * dHash it, and count near-dup image pairs per Hamming distance over
   * the banded surface. Rides [[Dedup.hammingHistogramOf]] unchanged:
   * distinct-VALUE banding (images with identical hashes collapse before
   * the band join), in-join pair dedup, multiplicity algebra — no pair
   * row ever shuffles, no cartesian product. The fingerprint table is
   * the session-shared [[dhashMetaShared]] q130 also rides.
   */
  def imageDhashHistogram(s: SparkSession, d: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.hammingHistogramOf(dhashMetaShared(s, d), maxHamming)

  /**
   * q130: image near-dup clusters — the multimodal counterpart of q74:
   * the dHash pair graph ([[Dedup.simhashDupGraphFromMeta]] over
   * [[dhashMeta]]: exact-payload duplicates collapse before banding, a
   * no-op on unique renders but the required guard on real corpora where
   * 30–60% of images are byte-identical re-posts), contracted to
   * (doc_id, cluster_id) by the same O(log)-round star contraction.
   * An image-corpus release dedups on exactly this table.
   */
  def imageDhashClusters(s: SparkSession, d: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.duplicateClusters(
      Dedup.simhashDupGraphFromMeta(dhashMetaShared(s, d), maxHamming))

  final case class AudioFrame(doc_id: Long, frame_idx: Long, n_samples: Long,
    sq_sum: Long, n_zero_cross: Long)

  /**
   * q131: audio-style frame features — per-frame RMS energy and
   * zero-crossing count over the payload bytes read as centered 8-bit
   * PCM samples (byte − 128). The exact per-frame computation a
   * VAD / silence-trimming pass runs before an audio corpus is chunked;
   * here the payload is the deterministic text-byte fixture, so every
   * value is oracle-replayable (the q59 hex-decode discipline).
   *
   * Determinism across engines: the squared sum is EXACT integer
   * arithmetic (≤ frameBytes·128² per frame — no overflow, no float
   * accumulation order), and only the final sqrt/divide runs in double,
   * rounded to 6 dp. NULL payloads carry no frames (the q44 convention);
   * an empty payload keeps one 0-sample frame with NULL rms.
   *
   * 100 TB posture: a pure per-partition flatMap — no shuffle anywhere;
   * frames inherit the scan's partitioning.
   */
  def audioFrameFeatures(s: SparkSession, d: String,
      frameBytes: Int = 256): DataFrame =
    audioFrameFeaturesOf(mediaTable(s, d), frameBytes)

  /** [[audioFrameFeatures]] over an arbitrary (doc_id, payload) frame. */
  def audioFrameFeaturesOf(media: DataFrame, frameBytes: Int): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRow]
      .filter((r: MediaRow) => r.payload != null)
      .mapPartitions { batch =>
        batch.flatMap { row =>
          val b = row.payload
          val nFrames = math.max((b.length + frameBytes - 1) / frameBytes, 1)
          (0 until nFrames).iterator.map { f =>
            val start = f * frameBytes
            val end = math.min(start + frameBytes, b.length)
            var sq = 0L; var zc = 0L
            var i = start
            while (i < end) {
              val s0 = (b(i) & 0xFF) - 128
              sq += s0.toLong * s0
              if (i + 1 < end) {
                val s1 = (b(i + 1) & 0xFF) - 128
                if ((s0 < 0) != (s1 < 0)) zc += 1
              }
              i += 1
            }
            AudioFrame(row.doc_id, f.toLong, (end - start).toLong, sq, zc)
          }
        }
      }.toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_samples"),
        when(col("n_samples") > 0,
          round(sqrt(col("sq_sum").cast("double") / col("n_samples")), 6))
          .as("rms_energy"),
        col("n_zero_cross"))
  }

  /**
   * q152: VAD-style segmentation over the q131 frame features — the
   * run-length pass a speech pipeline runs right after frame scoring
   * (and the reason q131 exists): a frame flags as "speech" when its
   * rounded RMS energy reaches `threshold`, maximal runs of same-flag
   * consecutive frames become segments (gaps-and-islands on the frame
   * index), and the per-source ledger tallies frames, segments and the
   * longest speech run — the numbers that drive silence trimming and
   * chunk sizing for an audio training corpus.
   *
   * Determinism: the flag compares the 6-dp-ROUNDED q131 energy, so both
   * engines branch on the identical value; island grouping is integer
   * arithmetic on the frame index. Docs with a NULL payload carry no
   * frames (q131's convention) and are absent from the ledger; an empty
   * payload's single 0-sample frame has NULL energy ⇒ one silence
   * segment.
   *
   * 100 TB posture: frame features are a per-partition flatMap (no
   * shuffle carries a payload); the island window shuffles only
   * (doc_id, frame_idx, speech, seg keys) — group size = one document's
   * frame count, bounded by media length; everything after is map-side
   * combined aggregation.
   */
  def vadSegments(s: SparkSession, d: String, frameBytes: Int = 256,
      threshold: Double = 45.0): DataFrame =
    vadSegmentsOf(Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text")), frameBytes, threshold)

  /** [[vadSegments]] over an arbitrary (doc_id, source, text) frame. */
  def vadSegmentsOf(docs: DataFrame, frameBytes: Int,
      threshold: Double): DataFrame = {
    val frames = audioFrameFeaturesOf(
        docs.select(col("doc_id"), col("text").cast("binary").as("payload")),
        frameBytes)
      .withColumn("speech",
        col("rms_energy").isNotNull && col("rms_energy") >= threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("speech")).orderBy(col("frame_idx"))
    val perDoc = frames
      .withColumn("grp", col("frame_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("speech"), col("grp"))
      .agg(count(lit(1)).as("seg_len"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("seg_len")).as("d_frames"),
        sum(when(col("speech"), col("seg_len")).otherwise(0L))
          .as("d_speech_frames"),
        count(lit(1)).as("d_segments"),
        sum(when(col("speech"), 1L).otherwise(0L)).as("d_speech_segments"),
        coalesce(max(when(col("speech"), col("seg_len"))), lit(0L))
          .as("d_max_speech_run"))
    perDoc
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("d_frames")).as("n_frames"),
        sum(col("d_speech_frames")).as("n_speech_frames"),
        sum(col("d_segments")).as("n_segments"),
        sum(col("d_speech_segments")).as("n_speech_segments"),
        max(col("d_max_speech_run")).as("max_speech_run"))
  }

  /**
   * q155: audio perceptual fingerprints + near-dup histogram — the
   * audio member of the near-dup matrix (text simhash q114, image dHash
   * q128): a 59-bit chromaprint-style delta-sign fingerprint (bit b set
   * iff the 6-dp-rounded RMS energy RISES from frame b to frame b+1 over
   * 16-byte frames — the energy-contour signature that survives volume
   * scaling), banded through the IDENTICAL 4×15-bit machinery
   * ([[graft.analytics.Dedup.hammingHistogramOf]]: distinct-VALUE
   * collapse, in-join pair dedup, multiplicity algebra — no pair row
   * ever shuffles). Two recordings of the same content share the
   * contour, so they land at low Hamming distance.
   *
   * Determinism: both engines compare the same ROUNDED energies; frames
   * past bit 58 don't contribute; a doc with one frame (or monotone
   * non-rising contour) fingerprints as 0 — the short-media zero-bias
   * the distinct-value collapse exists to absorb.
   *
   * 100 TB posture: frame features are a per-partition flatMap; the
   * delta window and the fingerprint fold shuffle (doc_id, frame_idx,
   * rms) narrow rows keyed by doc_id — group size = one media item's
   * frame count — and the histogram tail is the q114/q128 stream-free
   * shape.
   */
  def audioFingerprints(s: SparkSession, d: String,
      frameBytes: Int = 16): DataFrame =
    // NOT spread (r19 A/B): the fixture payloads are ~300 bytes, so the
    // single-pass fold is under the fan-out's per-task fixed cost
    // (q155 1.11 s -> 1.85 s, q172 1.32 s -> 2.01 s with spread); a real
    // audio corpus arrives wide anyway, where spread is the identity
    audioFingerprintsOf(Tables.documents(s, d), frameBytes)

  /** [[audioFingerprints]] over an arbitrary (doc_id, text) frame.
    *
    * ONE per-partition pass (the [[dhashMetaOf]] pattern): a media item's
    * frames are consecutive bytes of one payload, so the content hash,
    * the per-frame energies AND the delta-sign fold all come out of the
    * scan task directly — no frame row ever exists, let alone shuffles
    * (the declarative spelling shuffled ~frameCount rows per item into a
    * lag window: 16× the q131 row count, measured 2.5 s vs ~0.5 s at
    * sf0.1). Rounding parity: the fold rounds each RMS exactly as
    * Spark's `round(_, 6)` (BigDecimal HALF_UP on the double), pinned by
    * [[audioFingerprintsDeclarative]] equality in Round14OpsSpec. */
  def audioFingerprintsOf(docsIn: DataFrame, frameBytes: Int): DataFrame = {
    val s = docsIn.sparkSession
    import s.implicits._
    docsIn.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { batch =>
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { row =>
          if (row.payload == null)
            (row.doc_id, None: Option[Array[Byte]], None: Option[Long])
          else {
            md.reset()
            val digest = md.digest(row.payload)
            val b = row.payload
            val nFrames = math.max((b.length + frameBytes - 1) / frameBytes, 1)
            var fp = 0L
            var prev = 0.0
            var prevNull = true
            var f = 0
            while (f < nFrames) {
              val start = f * frameBytes
              val end = math.min(start + frameBytes, b.length)
              val isNull = end == start
              var rms = 0.0
              if (!isNull) {
                var sq = 0L
                var i = start
                while (i < end) {
                  val s0 = (b(i) & 0xFF) - 128; sq += s0.toLong * s0; i += 1
                }
                rms = java.math.BigDecimal
                  .valueOf(math.sqrt(sq.toDouble / (end - start)))
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              }
              if (f >= 1 && f <= 59 && !prevNull && !isNull && rms > prev)
                fp |= 1L << (f - 1)
              prev = rms; prevNull = isNull
              f += 1
            }
            (row.doc_id, Some(digest), Some(fp))
          }
        }
      }.toDF("doc_id", "h128", "simhash")
  }

  /** Builtin-only spelling of [[audioFingerprintsOf]] (frames → lag
    * window → bit fold) — value-identical, kept as the cross-check
    * oracle for the single-pass fold (equality asserted in
    * Round14OpsSpec), exactly the [[Dedup.simhashFromHashesDeclarative]]
    * discipline. */
  private[graft] def audioFingerprintsDeclarative(docsIn: DataFrame,
      frameBytes: Int): DataFrame = {
    val docs = docsIn.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      unhex(md5(col("text").cast("binary"))).as("h128"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val fps = audioFrameFeaturesOf(
        docs.select(col("doc_id"), col("payload")), frameBytes)
      .withColumn("prev", lag(col("rms_energy"), 1).over(wl))
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(when(
          col("frame_idx").between(1, 59) && col("prev").isNotNull &&
            col("rms_energy").isNotNull && col("rms_energy") > col("prev"),
          expr("shiftleft(cast(1 as bigint), cast(frame_idx - 1 as int))"))
          .otherwise(0L)), lit(0L)).as("simhash"))
    docs.select(col("doc_id"), col("h128")).join(fps, Seq("doc_id"))
  }

  /** q155's served observable: the near-dup Hamming histogram over the
    * audio fingerprints — q128's tail verbatim on the new modality. */
  def audioFpHistogram(s: SparkSession, d: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.hammingHistogramOf(audioFingerprints(s, d), maxHamming)

  /**
   * q172: audio perceptual near-dup clusters — the q130 image precedent
   * on the q155 fingerprints, closing the modality matrix's last cluster
   * cell (text q74 / image q130 / audio here): exact-payload duplicates
   * collapse by content hash before banding
   * ([[Dedup.simhashDupGraphFromMeta]]), the banded Hamming pair graph
   * contracts to (doc_id, cluster_id) by the same O(log)-round star
   * contraction. An audio-corpus release dedups on exactly this table.
   *
   * 100 TB posture: inherits the fingerprint scan's single
   * per-partition pass (no frame row ever exists) and the contraction's
   * rounds-bounded cost — only (doc_id, h128, simhash) rows ever
   * shuffle; payloads never move.
   */
  def audioFpClusters(s: SparkSession, d: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.duplicateClusters(
      Dedup.simhashDupGraphFromMeta(audioFingerprints(s, d), maxHamming))

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

  /**
   * q140: image admission funnel (the LAION-style pre-filter): every image
   * is decoded (real `javax.imageio` pass over the PNG payload, honest
   * dimensions) and sorted into the first rejection bucket it hits —
   * missing payload → `no_payload`, short side under `minSide` →
   * `too_small`, aspect ratio beyond `maxAspect`:1 → `bad_aspect` — else
   * `kept`; reported as per-source bucket counts, the dashboard a
   * multimodal ingest reads before spending embedding compute.
   *
   * Scale shape: decode runs batched per partition inside the scan task
   * (no shuffle carries a payload), verdicts are integer column math, and
   * only (source, verdict) pairs reach the final map-side-combined
   * aggregate. The oracle re-derives dimensions from the generator formula
   * — if either the encode or the decode lied, the funnel counts diverge.
   */
  def imageFilterFunnel(s: SparkSession, d: String, minSide: Int = 8,
      maxAspect: Int = 3): DataFrame =
    decodeMeta(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("verdict",
        when(col("width").isNull, "no_payload")
          .when(least(col("width"), col("height")) < minSide, "too_small")
          .when(col("width") > col("height") * maxAspect ||
            col("height") > col("width") * maxAspect, "bad_aspect")
          .otherwise("kept"))
      .groupBy(col("source"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"))
}

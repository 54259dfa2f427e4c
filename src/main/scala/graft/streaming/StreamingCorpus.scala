package graft.streaming

import graft.analytics.{Sampling, Similarity, TextStats}
import graft.ingest.{BucketedMerge, Merge}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * The training-data pipeline run INCREMENTALLY: documents land as parquet
 * files and each micro-batch applies the same operators as the batch
 * queries — token-window chunking (q80, [[Sampling.chunkDocumentsOf]]) and
 * exact-dedup survivorship (q31 semantics) — merging into two bucketed
 * tables that converge to the batch results on the same corpus, whatever
 * the file arrival order.
 *
 * Convergence argument (the piece streaming adds over the batch queries):
 *  - chunks are keyed `(doc_id, chunk_idx)`; a chunk's content is a pure
 *    function of its document, so re-delivery under any batch id merges to
 *    the identical row (idempotent replay);
 *  - survivors are keyed by the 128-bit content hash with `-doc_id` as the
 *    merge sequence: "newest wins" under a negated id IS "lowest doc_id
 *    wins", so late arrival of an earlier duplicate correctly displaces a
 *    higher-id survivor — order-independence comes from the same
 *    `(pk, seq)` machinery the warehouse merge uses ([[Merge.dedupLatest]]
 *    + [[BucketedMerge.mergeInto]]'s seq-aware path), not from assuming
 *    in-order delivery.
 * The corpus contract is append-only: a doc_id's text never changes
 * (re-delivery is fine; revision is not — a shrunken revision would strand
 * its highest chunk_idx rows), matching the reference's download-once
 * landing layout.
 *
 * 100 TB posture: per micro-batch, chunking is a generator + narrow maps
 * (zero shuffle), the survivor dedup shuffles only the batch by content
 * hash (never the corpus), and both merges rewrite only affected buckets.
 * The corpus-wide tables never re-shuffle on ingest.
 */
object StreamingCorpus {

  /** Chunk + survivor columns derived per batch; pure so the spec can
    * assert streaming output == the batch operator on the same data. */
  def survivorsOf(batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Merge.dedupLatest(
      batch
        .withColumn("text_md5", md5(col("text").cast("binary")))
        .withColumn("_keep_rank", -col("doc_id")),
      Seq("text_md5"), "_keep_rank")
      .select(col("text_md5"), col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("_keep_rank"))

  /** Start the continuous corpus prep of documents landing in
    * `landingDir` (parquet, `schema`) into bucketed `chunksPath` and
    * `survivorsPath`. Caller owns the returned query's lifecycle. */
  def start(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      chunksPath: String,
      survivorsPath: String,
      checkpointDir: String,
      chunkTokens: Int = 128,
      overlap: Int = 32,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow(),
      fpsPath: Option[String] = None,
      accountingPath: Option[String] = None,
      minTokens: Int = 10,
      maxTokens: Int = 1000,
      landingFormat: String = "parquet"): StreamingQuery = {
    require(accountingPath.isEmpty || fpsPath.nonEmpty,
      "accountingPath requires fpsPath: the q86 accounting is replayed from " +
        "the incrementally-maintained fingerprint table")
    // landingFormat "json" accepts the JSONL shards corpora actually ship
    // in (see ingest/JsonlReader — explicit schema, no inference) with
    // the identical downstream pipeline
    val src = spark.readStream.schema(schema)
    (if (landingFormat == "json") src.json(landingDir)
     else src.parquet(landingDir))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // chunks: content is a function of the doc, so the batch id only
        // serves replay idempotence through the seq-aware merge. The
        // pre-merge dedup matters on the TABLE-CREATION path: mergeInto's
        // contract requires a per-PK-unique batch (later batches dedup
        // contested∪challengers inside applyIncrementalSeq, but the first
        // batch is written as-is), and the corpus contract explicitly
        // allows the same doc to be re-delivered within one micro-batch.
        val chunks = Merge.dedupLatest(
          Sampling.chunkDocumentsOf(batch, chunkTokens, overlap)
            .withColumn("_dump_seq", lit(batchId)),
          Seq("doc_id", "chunk_idx"), "_dump_seq")
        BucketedMerge.mergeInto(spark, chunksPath, chunks,
          Seq("doc_id", "chunk_idx"), nBuckets, seqCol = Some("_dump_seq"))
        // survivors: lowest doc_id per content hash, across all batches
        BucketedMerge.mergeInto(spark, survivorsPath, survivorsOf(batch),
          Seq("text_md5"), nBuckets, seqCol = Some("_keep_rank"))
        // dedup fingerprints: the per-doc state the q86 composite needs —
        // fingerprinting happens ONCE on arrival; downstream (graph,
        // contraction, accounting) never re-reads document text
        fpsPath.foreach { fp =>
          val fps = Merge.dedupLatest(
            graft.analytics.Dedup.simhashMetaOf(batch)
              .withColumn("_dump_seq", lit(batchId)),
            Seq("doc_id"), "_dump_seq")
          BucketedMerge.mergeInto(spark, fp, fps,
            Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
          // the continuously-maintained q86 output: recomputed from the
          // incremental state after every batch (3 rows — trivially cheap
          // to overwrite; the expensive per-doc work above is incremental)
          accountingPath.foreach { ap =>
            splitAccounting(spark, fp, chunksPath, minTokens, maxTokens)
              .write.mode("overwrite").parquet(ap)
          }
        }
      }
      .start()
  }

  /**
   * The q86 training-assembly accounting ([[Sampling.trainingPipeline]]'s
   * output) REPLAYED over the incrementally-maintained state tables
   * instead of the raw corpus: near-dup cluster losers from the
   * fingerprint table's dup graph, survivorship and the token-count
   * quality gate, then per-split chunk accounting from the chunk table.
   *
   * Equivalence to the batch composite: the exact-first dup graph is a
   * pure function of (doc_id, h128, simhash); the batch pipeline's
   * post-anti-join survivorship window keeps at most one doc per text
   * group (every other same-text member is a contraction loser by
   * construction), so dropping losers IS the survivorship; and a doc's
   * token count equals the end of its last chunk (stride covers the final
   * token), so the quality gate needs no text either. Asserted
   * stream ≡ [[Sampling.trainingPipeline]] in StreamingCorpusSpec under
   * shuffled arrival.
   *
   * 100 TB posture: the only non-incremental work here is the contraction
   * over the near-dup GRAPH (fingerprint-sized rows, never text) and a
   * re-aggregate of the chunk table — the per-document heavy lifting
   * (fingerprinting, chunking) stays per-batch.
   */
  def splitAccounting(spark: SparkSession, fpsPath: String,
      chunksPath: String, minTokens: Int, maxTokens: Int): org.apache.spark.sql.DataFrame = {
    import graft.analytics.{Dedup, Sampling}
    val fps = BucketedMerge.read(spark, fpsPath)
      .select(col("doc_id"), col("h128"), col("simhash"))
    val losers = Dedup.duplicateClusterEdges(Dedup.simhashDupGraphFromMeta(fps))._1
      .select(col("src").as("doc_id"))
    val chunks = BucketedMerge.read(spark, chunksPath)
      .select(col("doc_id"), col("chunk_start"), col("chunk_len"))
    val nTokens = chunks.groupBy(col("doc_id"))
      .agg(max(col("chunk_start") + col("chunk_len")).as("n_tokens"))
    val kept = fps.select(col("doc_id"))
      .join(losers, Seq("doc_id"), "left_anti")
      .join(nTokens, Seq("doc_id"))
      .filter(col("n_tokens").between(minTokens, maxTokens))
      .select(col("doc_id"))
    chunks.join(kept, Seq("doc_id"), "left_semi")
      .groupBy(Sampling.splitName(col("doc_id")).as("split"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len").cast("long")).as("total_chunk_tokens"))
  }

  /**
   * Incremental ANN index maintenance: embeddings landing in `landingDir`
   * are assigned to a FROZEN centroid codebook (`cents`, e.g. the output
   * of [[Similarity.centroids]] over a [[Similarity.kmeansCells]] training
   * run on the bootstrap corpus) and merged into the bucketed cell index.
   * Freezing the codebook is what makes maintenance incremental — cell
   * ids stay stable as vectors arrive, so the index equals the batch
   * assignment of the full corpus regardless of arrival order (replay
   * idempotent via the seq-aware merge; assignment is deterministic,
   * [[Similarity.assignCells]]). Retraining the codebook is a batch event
   * that rebuilds the index — the standard IVF operating model.
   *
   * 100 TB posture: per micro-batch the new vectors score against k
   * broadcast centroids map-side and merge into only their affected
   * buckets; the existing index is never rescored or reshuffled.
   */
  def startCellIndex(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      cents: org.apache.spark.sql.DataFrame,
      cellsPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val assigned = Similarity.assignCells(batch, cents)
          .select(col("vec_id"), col("cell"), col("label"))
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, cellsPath, assigned,
          Seq("vec_id"), nBuckets, seqCol = Some("_dump_seq"))
      }
      .start()
  }

  /**
   * Incremental PQ code index — the streaming counterpart of q102/q106's
   * compressed-corpus representation: arriving embeddings are encoded to
   * m code bytes against a FROZEN broadcast codebook
   * ([[Similarity.pqEncode]] — codebook refresh is a batch training
   * event, like the k-means centroids and classifier weights) and merged
   * into the bucketed code table keyed (vec_id, sub). Encoding is a pure
   * function of (vector, codebook), so the table equals the batch encode
   * of the same corpus under any arrival order or replay; the ADC search
   * (q106) then serves directly from this table.
   */
  def startPqIndex(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      codebook: org.apache.spark.sql.DataFrame,
      m: Int,
      dsub: Int,
      codesPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val codes = Similarity.pqEncode(batch, codebook, m, dsub)
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, codesPath, codes,
          Seq("vec_id", "sub"), nBuckets, seqCol = Some("_dump_seq"))
      }
      .start()
  }

  /**
   * Online composed IVF-ADC serving gate — the streaming counterpart of
   * q165, composing the two frozen-model index maintainers this file
   * already proves out separately ([[startPqIndex]]'s code table;
   * [[startCellIndex]]'s cell assignment — here by the frozen
   * hyperplanes, a PURE function of the vector): each arriving embedding
   * is (1) PQ-encoded against the frozen ASSIGNMENT codebook
   * ([[graft.analytics.Similarity.IvfAdcIndexModel]] — encoding against
   * it reproduces training-final codes exactly), (2) cell-assigned by
   * the frozen planes, and (3) kept raw iff stride-eligible (queries
   * stay full-precision in ADC; the corpus exists only as code bytes).
   * All three states are pure functions of (vector, frozen model), so
   * they equal the batch index of the delivered corpus under any arrival
   * order, re-delivery or crash-window replay; the served ledger
   * ([[ivfAdcLedger]]) then runs the BATCH serving function
   * ([[graft.analytics.Similarity.ivfAdcServeOf]] — the same code path
   * q165 executes) over the maintained state, so gate ≡ batch is
   * equality of inputs, not a parallel re-implementation
   * (StreamingCorpusSpec asserts ≡ batch q165 output on the snapshot
   * corpus).
   *
   * 100 TB posture: per micro-batch the arrivals score against m·k
   * broadcast assignment centroids and merge into only their affected
   * buckets; the query state grows at 1/stride of the corpus; serving
   * cost is q165's — bounded by routed cell mass, never corpus-sized.
   */
  def startIvfAdcIndex(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      model: Similarity.IvfAdcIndexModel,
      codesPath: String,
      cellsPath: String,
      queriesPath: String,
      checkpointDir: String,
      stride: Long = 100,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        ivfAdcStep(spark, batch, model, codesPath, cellsPath, queriesPath,
          batchId, stride, nBuckets)
      }
      .start()
  }

  /** One batch step of [[startIvfAdcIndex]] — factored out so the spec
    * can replay a crashed attempt directly. Each of the three merges is
    * key-idempotent and the rows are pure functions of (vector, frozen
    * model), so a crash between merges re-runs to the same state. */
  def ivfAdcStep(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      model: Similarity.IvfAdcIndexModel,
      codesPath: String,
      cellsPath: String,
      queriesPath: String,
      batchId: Long,
      stride: Long = 100,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    val codes = Similarity.pqEncode(batch, model.assignCodebook,
        model.m, model.dsub)
      .withColumn("_dump_seq", lit(batchId))
    BucketedMerge.mergeInto(spark, codesPath, codes,
      Seq("vec_id", "sub"), nBuckets, seqCol = Some("_dump_seq"))
    val cells = batch.select(col("vec_id"),
        Similarity.lshBucketCol(col("embedding"), model.nplanes, model.dim)
          .as("cell"))
      .withColumn("_dump_seq", lit(batchId))
    BucketedMerge.mergeInto(spark, cellsPath, cells,
      Seq("vec_id"), nBuckets, seqCol = Some("_dump_seq"))
    val qs = batch
      .filter(pmod(col("vec_id"), lit(stride)) === 0 &&
        col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .withColumn("_dump_seq", lit(batchId))
    BucketedMerge.mergeInto(spark, queriesPath, qs,
      Seq("vec_id"), nBuckets, seqCol = Some("_dump_seq"))
  }

  /**
   * Incremental int8 serving index — the streaming counterpart of
   * q170's approximate tier: arriving embeddings are encoded AND
   * reconstructed against a FROZEN per-dim (mn, mx) codebook
   * ([[graft.analytics.Quantization.int8Codebook]] over the bootstrap
   * snapshot — codebook refresh is a batch training event, the
   * startPqIndex discipline) and merged into the bucketed dequantized
   * table keyed vec_id. Encode+reconstruct is a pure function of
   * (vector, codebook), so the table equals the batch rebuild of the
   * same corpus under any arrival order or replay, and
   * [[int8TopKLedger]] — the SAME ranking code path batch q170 uses
   * ([[graft.analytics.Similarity.int8TopKOf]]) — serves ≡ batch
   * (StreamingCorpusSpec, out-of-order + re-delivery + crash window).
   *
   * 100 TB posture: per micro-batch one explode + one ≤ dim-row
   * broadcast join + a vec_id-keyed idempotent merge; the index is
   * never rescored.
   */
  def startInt8Index(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      codebook: org.apache.spark.sql.DataFrame,
      dqPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        org.apache.spark.sql.GraftBridge.releasingPins {
          val dq = graft.analytics.Quantization
            .dequantizedInt8Of(batch, codebook)
            .withColumn("_dump_seq", lit(batchId))
          BucketedMerge.mergeInto(spark, dqPath, dq,
            Seq("vec_id"), nBuckets, seqCol = Some("_dump_seq"))
        }
      }
      .start()
  }

  /** The served int8 top-k ranking over the maintained dequantized
    * index — column-equal to batch q170's approximate tier when the
    * codebook was frozen from the corpus the stream delivered.
    * Empty-typed before the first non-empty merge. */
  def int8TopKLedger(spark: SparkSession, dqPath: String,
      k: Int = 5, stride: Long = 100): org.apache.spark.sql.DataFrame = {
    val dq =
      if (BucketedMerge.hasData(spark, dqPath))
        BucketedMerge.read(spark, dqPath)
          .select(col("vec_id"), col("embedding"))
      else spark.range(0).select(col("id").as("vec_id"),
        lit(null).cast("array<double>").as("embedding"))
    Similarity.int8TopKOf(dq, k, stride)
  }

  /** The served q165 table from the gate's state — the batch serving
    * function over the maintained (codes, cells, queries) index, so it
    * is column-equal to batch [[graft.analytics.Similarity.ivfAdcTopK]]
    * when the model was frozen from the corpus the stream delivered.
    * Empty-typed before the first non-empty merge (the
    * [[semanticContaminationLedger]] guard). */
  def ivfAdcLedger(
      spark: SparkSession,
      codesPath: String,
      cellsPath: String,
      queriesPath: String,
      model: Similarity.IvfAdcIndexModel,
      topk: Int = 5,
      nprobe: Int = 4): org.apache.spark.sql.DataFrame = {
    val codes =
      if (BucketedMerge.hasData(spark, codesPath))
        BucketedMerge.read(spark, codesPath)
          .select(col("vec_id"), col("sub"), col("code"))
      else spark.range(0).select(col("id").as("vec_id"),
        col("id").as("sub"), col("id").as("code"))
    val cells =
      if (BucketedMerge.hasData(spark, cellsPath))
        BucketedMerge.read(spark, cellsPath)
          .select(col("vec_id"), col("cell"))
      else spark.range(0).select(col("id").as("vec_id"), col("id").as("cell"))
    val queries =
      if (BucketedMerge.hasData(spark, queriesPath))
        BucketedMerge.read(spark, queriesPath)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      else spark.range(0).select(col("id").as("query_id"),
        lit(null).cast("array<float>").as("q_emb"))
    val slices = array((0 until model.m).map(i =>
      slice(col("q_emb"), i * model.dsub + 1, model.dsub)): _*)
    val qsub = queries
      .select(col("query_id"), posexplode(slices).as(Seq("sub", "se")))
      .withColumn("sub", col("sub").cast("long"))
    Similarity.ivfAdcServeOf(codes, cells, queries, qsub,
      model.adcCodebook, model.cents, topk, nprobe)
  }

  /**
   * Online SEMANTIC dedup gate — the streaming counterpart of q87
   * (SemDeDup), completing the streaming dedup family (exact + simhash in
   * [[start]], n-gram contamination below, semantic here): arriving
   * embeddings are assigned to a FROZEN codebook cell, merged into the
   * cell index, and swept against their cell's members; any vector within
   * `threshold` cosine of a LOWER-id member merges into the quarantine
   * table. The dup rule (∃ u < v, same cell, cos ≥ t) is a pure function
   * of the final corpus — every qualifying pair is examined in the batch
   * where its LATER element arrives, so quarantine equals the batch sweep
   * under any arrival order, replay, or out-of-order delivery (a
   * late-arriving low id retroactively quarantines an already-indexed
   * higher id — asserted in StreamingCorpusSpec).
   *
   * 100 TB posture: per batch only the batch's AFFECTED cells are swept
   * (cell-semi-join against the index — the unaffected index is read but
   * never pair-joined; a cell-partitioned index layout would prune the
   * read too, traded here for the vec_id-keyed merge's idempotence), and
   * the codebook stays broadcast-sized. Quarantine re-merges are
   * idempotent per vec_id.
   */
  def startSemanticGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      cents: org.apache.spark.sql.DataFrame,
      indexPath: String,
      quarantinePath: String,
      checkpointDir: String,
      threshold: Double = 0.35,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val assigned = Similarity.assignCells(batch, cents)
          .select(col("vec_id"), col("cell"), col("embedding"))
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, indexPath, assigned,
          Seq("vec_id"), nBuckets, seqCol = Some("_dump_seq"))
        val affected = assigned.select(col("cell")).distinct()
        val members = BucketedMerge.read(spark, indexPath)
          .join(broadcast(affected), Seq("cell"), "left_semi")
          .select(col("cell"), col("vec_id"), col("embedding"))
        val dropped = Similarity.semanticPairs(members, threshold)
          .select(col("vec_b").as("vec_id"), col("cell"))
          .distinct()
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, quarantinePath, dropped,
          Seq("vec_id"), nBuckets, seqCol = Some("_dump_seq"))
      }
      .start()
  }

  /**
   * Continuously-maintained cross-source leakage matrix — the streaming
   * counterpart of q101: documents land as files, each batch is
   * fingerprinted ONCE on arrival ([[graft.analytics.Dedup.simhashMetaOf]]
   * + the source column — per-doc tokenize/hash work, the expensive part)
   * and merged into the bucketed fingerprint table keyed by doc_id
   * (replay and out-of-order delivery dedup idempotently via the
   * seq-aware merge), then the per-source-pair matrix is recomputed from
   * that table with the exact-dup-collapsed
   * [[graft.analytics.Dedup.crossSourceLeakageFromMeta]].
   *
   * Why recompute rather than delta-update the matrix: the cells carry
   * DISTINCT-document counts per side, which are not mergeable from pair
   * deltas without keeping the full per-cell membership anyway — the
   * fingerprint table IS that state, in its minimal form (the q86
   * accounting discipline). The recompute touches only narrow
   * (doc_id, h128, simhash, source) rows — document text is never
   * re-read — and the collapsed surface keeps the banded join linear in
   * duplicate mass, so the per-batch cost is fingerprint-table-sized,
   * not corpus-sized.
   *
   * Output ≡ batch [[graft.analytics.Dedup.crossSourceLeakageOf]] over
   * the full corpus, asserted under shuffled arrival + replay in
   * StreamingCorpusSpec.
   */
  def startLeakageGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      fpsPath: String,
      matrixPath: String,
      checkpointDir: String,
      maxHamming: Int = 6,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val fps = Merge.dedupLatest(
          graft.analytics.Dedup
            .simhashMetaOf(batch.select(col("doc_id"), col("text")))
            .join(batch.select(col("doc_id"), col("source")), "doc_id")
            .withColumn("_dump_seq", lit(batchId)),
          Seq("doc_id"), "_dump_seq")
        BucketedMerge.mergeInto(spark, fpsPath, fps,
          Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
        if (BucketedMerge.hasData(spark, fpsPath))
          graft.analytics.Dedup.crossSourceLeakageFromMeta(
              BucketedMerge.read(spark, fpsPath)
                .select(col("doc_id"), col("h128"), col("simhash"),
                  col("source")),
              maxHamming)
            .write.mode("overwrite").parquet(matrixPath)
      }
      .start()
  }

  /**
   * Continuously-maintained source-similarity sketches — the streaming
   * counterpart of q115, and the payoff of the union sketch's merge
   * algebra: each batch collapses to its |sources|·numPerm batch-local
   * minima ([[graft.analytics.Dedup.sourceSketchRowsOf]]), which merge
   * into the sketch table keyed (source, p) under "lowest value wins"
   * (seq = −mn through the same seq-aware merge every gate uses — min is
   * associative/commutative/idempotent, so the table converges to the
   * batch sketch of the full corpus under any delivery order or replay).
   * The matrix recomputes from the |sources|·numPerm-row table per batch
   * — trivially cheap. Documents are tokenized/hashed exactly once, on
   * arrival; state is sketch-sized, never corpus-sized (the DECLARED
   * bound, smallest of any gate).
   */
  def startSketchGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      sketchPath: String,
      matrixPath: String,
      checkpointDir: String,
      numPerm: Int = 16,
      nBuckets: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // pk columns must be non-null (the seq-merge splits on equi-joins,
        // where a NULL key matches nothing and would duplicate the row) —
        // a NULL source keys under the injective 'n:'/'s:' encoding
        val rows = graft.analytics.Dedup.sourceSketchRowsOf(batch, numPerm)
          .withColumn("_src_key", when(col("source").isNull, lit("n:"))
            .otherwise(concat(lit("s:"), col("source"))))
          .withColumn("_keep_rank", -col("mn"))
        BucketedMerge.mergeInto(spark, sketchPath, rows,
          Seq("_src_key", "p"), nBuckets, seqCol = Some("_keep_rank"))
        if (BucketedMerge.hasData(spark, sketchPath))
          graft.analytics.Dedup.sketchMatrixOf(
              BucketedMerge.read(spark, sketchPath)
                .select(col("source"), col("p"), col("mn")),
              numPerm)
            .write.mode("overwrite").parquet(matrixPath)
      }
      .start()
  }

  /**
   * Incrementally-maintained duplicate clusters — the streaming
   * counterpart of q74, closing the one re-contract-from-scratch consumer
   * the round-9 audit left: instead of re-running the star contraction
   * over the whole fingerprint graph per batch, the gate maintains the
   * contraction's own FIXPOINT — a star forest (doc_id → root=component
   * minimum, child > root) — across batches, and re-contracts only the
   * components the batch touches.
   *
   * Per micro-batch:
   *  1. fingerprint arriving docs once ([[graft.analytics.Dedup
   *     .simhashMetaOf]] — the only pass over text);
   *  2. derive the batch's NEW edges from PRE-merge state, all
   *     batch-bounded: member → rep exact edges, displaced-rep → new-rep
   *     edges (a late-arriving lower id re-roots its text group), and
   *     near-dup band edges from the asymmetric
   *     [[graft.analytics.Dedup.bandProbe]] of the batch's reps against
   *     the logical post-merge rep view (4 narrow band rows per
   *     fingerprint — never text, never the full pair surface);
   *  3. merge state in crash-safe order — forest first, THEN the rep
   *     table (h128 → lowest doc_id seen; "lowest wins" is associative/
   *     commutative/idempotent). Edges derive only from the rep table, so
   *     a retry of a partially-applied batch (forest merged, rep merge
   *     lost) re-reads the original old_rep, re-derives the identical
   *     edge set, and every edge no-ops in root space through the
   *     already-merged forest — replay-equivalent under crashes anywhere
   *     in the batch, not just whole-batch re-delivery;
   *  4. map the new edges' endpoints into ROOT space through the current
   *     forest (a root stands for its whole component), contract ONLY
   *     that touched-root graph ([[graft.analytics.Dedup
   *     .duplicateClusterEdges]] — its cost is touched-component-sized),
   *     and merge the resulting root moves back: children of a moved root
   *     re-point directly (star shape is preserved — no chains ever
   *     form), and the contracted nodes' own rows upsert by doc_id.
   *
   * Equivalence to batch [[graft.analytics.Dedup.duplicateClusters]] over
   * the full corpus (asserted under out-of-order arrival + replay in
   * StreamingCorpusSpec): the forest's components always equal the
   * components of every edge seen so far with root = component minimum —
   * new edges connect exactly the doc pairs the batch graph would
   * (exact edges chain members through current-or-displaced reps to the
   * same component; band edges connect the same distinct fingerprints,
   * and a band edge recorded against a LATER-displaced rep keeps its
   * component through the displaced-rep edge), and the touched-subgraph
   * contraction takes each merged component to the minimum over its
   * touched roots — each of which was already its old component's
   * minimum.
   *
   * Per-batch cost is bounded by batch size + touched-component count,
   * not corpus size — the per-batch `statsPath` row (n_root_edges,
   * n_forest_updates) is the deterministic observable: a batch touching
   * no existing cluster records 0 root edges no matter how large the
   * accumulated corpus is.
   */
  def startClusterGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      repPath: String,
      forestPath: String,
      checkpointDir: String,
      statsPath: Option[String] = None,
      maxHamming: Int = 6,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainClusterForest(spark, batch, repPath, forestPath, batchId,
          statsPath, maxHamming, nBuckets)
      }
      .start()
  }

  /** One batch step of [[startClusterGate]] — factored out so the spec can
    * drive it directly and so a batch backfill can reuse it. */
  def maintainClusterForest(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      repPath: String,
      forestPath: String,
      batchId: Long,
      statsPath: Option[String] = None,
      maxHamming: Int = 6,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    import graft.analytics.Dedup
    // one text pass: fingerprints, in-batch re-delivery collapsed; docs
    // with NULL text never pair (q74 semantics) and stay out of the state
    val meta = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      Merge.dedupLatest(
        Dedup.simhashMetaOf(batch.select(col("doc_id"), col("text")))
          .withColumn("_dump_seq", lit(batchId)),
        Seq("doc_id"), "_dump_seq")
        .filter(col("h128").isNotNull)
        .select(col("doc_id"), col("h128"), col("simhash")),
      eager = false)
    maintainClusterForestFromMeta(spark, meta, repPath, forestPath, batchId,
      statsPath, maxHamming, nBuckets)
  }

  /** The fingerprint-agnostic core of [[maintainClusterForest]]: one batch
    * step over an already-fingerprinted, in-batch-deduped, null-filtered
    * (doc_id, h128, simhash) frame (caller checkpoints it). The text gate
    * derives `meta` from text simhash, the image gate
    * ([[maintainImageClusterForest]]) from dHash over payloads — the
    * forest/rep state machine and its crash-replay ordering are identical. */
  def maintainClusterForestFromMeta(
      spark: SparkSession,
      meta: org.apache.spark.sql.DataFrame,
      repPath: String,
      forestPath: String,
      batchId: Long,
      statsPath: Option[String] = None,
      maxHamming: Int = 6,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    import graft.analytics.Dedup
    val batchMin = meta.groupBy(col("h128"))
      .agg(min(col("doc_id")).as("bmin"), min(col("simhash")).as("simhash"))
    val repExists = BucketedMerge.hasData(spark, repPath)
    val joined =
      (if (repExists)
        batchMin.join(
          BucketedMerge.read(spark, repPath)
            .select(col("h128"), col("rep").as("old_rep")),
          Seq("h128"), "left")
      else batchMin.withColumn("old_rep", lit(null).cast("long")))
        .withColumn("new_rep", least(col("bmin"), col("old_rep")))
    // every edge derivation and the (later) rep merge read `joined` —
    // truncate so the batch is fingerprinted and rep-joined once
    val j = org.apache.spark.sql.GraftBridge.checkpointNoStats(joined, eager = false)
    val memberE = meta.join(j.select(col("h128"), col("new_rep")), "h128")
      .filter(col("doc_id") =!= col("new_rep"))
      .select(col("doc_id").as("doc_a"), col("new_rep").as("doc_b"))
    val displacedE = j
      .filter(col("old_rep").isNotNull && col("old_rep") =!= col("new_rep"))
      .select(col("old_rep").as("doc_a"), col("new_rep").as("doc_b"))
    // band edges probe the LOGICAL post-merge rep view (stored reps with
    // the batch's rows swapped in), so batch-internal near-dup pairs
    // surface too — without mutating the rep table first. CRASH-REPLAY
    // SAFETY hinges on this ordering: all edges derive from PRE-merge
    // state, the forest merge lands before the rep merge, so a retry of a
    // partially-applied batch (forest merged, rep not) still sees the
    // original old_rep, re-derives the identical edge set, and every edge
    // maps to a same-root no-op through the already-merged forest.
    val updatedReps =
      (if (repExists)
        BucketedMerge.read(spark, repPath)
          .select(col("h128"), col("rep"), col("simhash"))
          .join(j.select(col("h128")), Seq("h128"), "left_anti")
          .unionByName(j.select(col("h128"), col("new_rep").as("rep"), col("simhash")))
      else j.select(col("h128"), col("new_rep").as("rep"), col("simhash")))
    val bandE = Dedup.bandProbe(
      j.select(col("new_rep").as("doc_id"), col("simhash")),
      updatedReps.select(col("rep").as("doc_id"), col("simhash")),
      maxHamming)
    val newE = memberE.unionByName(displacedE).unionByName(bandE)
    val forestExists = BucketedMerge.hasData(spark, forestPath)
    val forest =
      if (forestExists) BucketedMerge.read(spark, forestPath)
        .select(col("doc_id"), col("root"))
      else spark.range(0).select(col("id").as("doc_id"), col("id").as("root"))
    val eRoots = newE
      .join(forest.select(col("doc_id").as("doc_a"), col("root").as("ra")),
        Seq("doc_a"), "left")
      .join(forest.select(col("doc_id").as("doc_b"), col("root").as("rb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("ra"), col("doc_a")).as("doc_a"),
        coalesce(col("rb"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    // touched-root contraction: nodes are current roots + new docs only
    val (contracted, _) = Dedup.duplicateClusterEdges(eRoots)
    val moved = forest
      .join(contracted.select(col("src").as("root"), col("dst").as("new_root")),
        Seq("root"))
      .select(col("doc_id"), col("new_root").as("root"))
    val updates = moved
      .unionByName(contracted.select(col("src").as("doc_id"), col("dst").as("root")))
      .withColumn("_dump_seq", lit(batchId))
    // observability counts run BEFORE the merge: `updates` reads the
    // pre-merge forest files, which the merge's bucket renames replace —
    // counting afterwards would chase deleted files (`contracted` is a
    // materialized checkpoint, so the recount is just the forest join)
    val stats = statsPath.map(_ => (eRoots.count(), updates.count()))
    // forest BEFORE rep table (see the crash-replay note above): the rep
    // merge is the only step that would change a retry's derived edges,
    // so it must be the LAST state mutation of the batch
    BucketedMerge.mergeInto(spark, forestPath, updates,
      Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
    BucketedMerge.mergeInto(spark, repPath,
      j.select(col("h128"), col("new_rep").as("rep"), col("simhash"),
        (-col("new_rep")).as("_keep_rank")),
      Seq("h128"), nBuckets, seqCol = Some("_keep_rank"))
    statsPath.foreach { sp =>
      import spark.implicits._
      val (nEdges, nUpd) = stats.get
      Seq((batchId, nEdges, nUpd))
        .toDF("batch_id", "n_root_edges", "n_forest_updates")
        .write.mode("append").parquet(sp)
    }
  }

  /**
   * Online image near-dup gate — the streaming counterpart of the q128 /
   * q130 image family: arriving (doc_id, payload) batches are decoded and
   * dHash-fingerprinted ONCE ([[graft.analytics.Multimodal.dhashMetaOf]]
   * — payloads never enter state, never shuffle past the scan), then:
   *
   *  1. the batch's (doc_id, h128, simhash) rows upsert into the
   *     incremental FINGERPRINT table at `fpPath` — content-derived and
   *     keyed by doc_id, so re-delivery and crash replay are idempotent
   *     by construction. Every fingerprint consumer reads this table;
   *     [[graft.analytics.Dedup.hammingHistogramOf]] over it IS the q128
   *     histogram of the corpus seen so far.
   *  2. the same rows (minus null fingerprints: an absent payload never
   *     pairs — q74's null guard) drive one
   *     [[maintainClusterForestFromMeta]] step: the identical rep/forest
   *     state machine, crash-replay ordering and touched-component cost
   *     bound as the text cluster gate, so
   *     [[clustersFromForest]] ≡ batch q130
   *     ([[graft.analytics.Multimodal.imageDhashClusters]]' contraction)
   *     over the corpus seen so far.
   *
   * Equivalence to batch q128 + q130 is asserted under out-of-order
   * arrival, re-delivery and a simulated crash window in
   * StreamingCorpusSpec.
   */
  def startImageClusterGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      fpPath: String,
      repPath: String,
      forestPath: String,
      checkpointDir: String,
      statsPath: Option[String] = None,
      maxHamming: Int = 6,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainImageClusterForest(spark, batch, fpPath, repPath, forestPath,
          batchId, statsPath, maxHamming, nBuckets)
      }
      .start()
  }

  /** One batch step of [[startImageClusterGate]] — factored out so the
    * spec can drive it directly (crash windows included). */
  def maintainImageClusterForest(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      fpPath: String,
      repPath: String,
      forestPath: String,
      batchId: Long,
      statsPath: Option[String] = None,
      maxHamming: Int = 6,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    // one decode pass: dHash fingerprints, in-batch re-delivery collapsed
    val metaAll = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      Merge.dedupLatest(
        graft.analytics.Multimodal.dhashMetaOf(
          batch.select(col("doc_id"), col("payload")))
          .withColumn("_dump_seq", lit(batchId)),
        Seq("doc_id"), "_dump_seq")
        .select(col("doc_id"), col("h128"), col("simhash")),
      eager = false)
    // fingerprint ledger first: idempotent (content-derived, doc_id-keyed),
    // so it is safe on either side of a crash window; null-fingerprint
    // rows stay VISIBLE here (the q91 ledger discipline) even though they
    // never enter the pair state
    BucketedMerge.mergeInto(spark, fpPath,
      metaAll.withColumn("_dump_seq", lit(batchId)),
      Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
    maintainClusterForestFromMeta(spark,
      metaAll.filter(col("h128").isNotNull),
      repPath, forestPath, batchId, statsPath, maxHamming, nBuckets)
  }

  /**
   * Online paragraph-dedup gate — the streaming counterpart of q129's
   * survivorship decision: the gate maintains which paragraph occurrence
   * (doc_id, pos) is the canonical FIRST copy of each distinct span, and
   * the per-document drop ledger, across batches.
   *
   * State (all text-free, the declared bounds):
   *  - KEEPER table (sh → (doc_id, pos, n_toks)): one row per distinct
   *    span hash. "Lexicographic min (doc_id, pos)" is associative,
   *    commutative and idempotent, so it converges to the batch q129
   *    keeper under any delivery order or replay; a late-arriving lower
   *    occurrence DISPLACES the stored keeper.
   *  - DROPS ledger ((doc_id, pos) → n_toks): one row per dropped
   *    occurrence — the duplicate mass. Monotone: the keeper only ever
   *    decreases, so a dropped occurrence can never become a keeper
   *    again, and re-derived rows upsert idempotently.
   *  - DOCS table (doc_id → n_paragraphs, total_tokens): per-doc totals,
   *    idempotent overwrite.
   *
   * CRASH-REPLAY SAFETY (the [[maintainClusterForest]] discipline): all
   * of a batch's drop rows derive from PRE-merge keeper state, and the
   * drops merge lands BEFORE the keeper merge — a retry of a partially-
   * applied batch re-reads the original keepers, re-derives the
   * identical drop set, and upserts it idempotently. The keeper merge is
   * the last state mutation, exactly because it is the only one that
   * would change a retry's derivation.
   *
   * Served output ([[paragraphLedger]]): (doc_id, n_paragraphs,
   * n_dropped, kept_tokens) ≡ batch [[graft.analytics.TextStats
   * .paragraphDedup]] on those columns (asserted under out-of-order
   * arrival + replay + a simulated crash window in StreamingCorpusSpec).
   * The reassembled cleaned TEXT is deliberately not served — text never
   * enters gate state; a consumer holding the documents applies the
   * drop ledger locally (the in-row filter batch q129 uses).
   */
  def startParagraphGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      keeperPath: String,
      dropsPath: String,
      docsPath: String,
      checkpointDir: String,
      spanWords: Int = 8,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainParagraphState(spark, batch, keeperPath, dropsPath, docsPath,
          batchId, spanWords, nBuckets)
      }
      .start()
  }

  /** One batch step of [[startParagraphGate]] — factored out so the spec
    * can replay a crashed attempt directly. */
  def maintainParagraphState(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      keeperPath: String,
      dropsPath: String,
      docsPath: String,
      batchId: Long,
      spanWords: Int = 8,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    import graft.analytics.TextStats
    // one text pass; in-batch re-delivery collapses on (doc_id, pos)
    val occ = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      Merge.dedupLatest(
        TextStats.paragraphOccurrencesOf(
          batch.select(col("doc_id"), col("text")), spanWords)
          .withColumn("_dump_seq", lit(batchId)),
        Seq("doc_id", "pos"), "_dump_seq")
        .select(col("doc_id"), col("pos"), col("sh"), col("n_toks")),
      eager = false)
    // per-doc totals: replay rewrites identical rows (idempotent)
    BucketedMerge.mergeInto(spark, docsPath,
      occ.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_paragraphs"),
          sum(col("n_toks")).as("total_tokens"))
        .withColumn("_dump_seq", lit(batchId)),
      Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
    // keeper election against PRE-merge state
    val bmin = occ.groupBy(col("sh"))
      .agg(min(struct(col("doc_id").as("d"), col("pos").as("p"),
        col("n_toks").as("t"))).as("bk"))
    val keeperExists = BucketedMerge.hasData(spark, keeperPath)
    val okType = "struct<d:bigint,p:int,t:bigint>"
    val j = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      (if (keeperExists)
        bmin.join(
          BucketedMerge.read(spark, keeperPath)
            .select(col("sh"), struct(col("kd").as("d"), col("kp").as("p"),
              col("kt").as("t")).as("ok")),
          Seq("sh"), "left")
      else bmin.withColumn("ok", lit(null).cast(okType)))
        .withColumn("wk", when(col("ok").isNull || col("bk") < col("ok"),
          col("bk")).otherwise(col("ok"))),
      eager = false)
    val batchLosers = occ.join(j.select(col("sh"), col("wk")), "sh")
      .filter(!(col("doc_id") === col("wk.d") && col("pos") === col("wk.p")))
      .select(col("doc_id"), col("pos"), col("n_toks"))
    val displaced = j
      .filter(col("ok").isNotNull &&
        !(col("ok.d") === col("wk.d") && col("ok.p") === col("wk.p")))
      .select(col("ok.d").as("doc_id"), col("ok.p").as("pos"),
        col("ok.t").as("n_toks"))
    // drops BEFORE keepers (see the crash-replay note in the scaladoc)
    BucketedMerge.mergeInto(spark, dropsPath,
      batchLosers.unionByName(displaced).withColumn("_dump_seq", lit(batchId)),
      Seq("doc_id", "pos"), nBuckets, seqCol = Some("_dump_seq"))
    // keep-min-lexicographic via a struct rank: dedupLatest keeps the MAX
    // _keep_rank, and max of (-d, -p) is the lexicographic min (d, p)
    BucketedMerge.mergeInto(spark, keeperPath,
      j.select(col("sh"), col("wk.d").as("kd"), col("wk.p").as("kp"),
        col("wk.t").as("kt"),
        struct((-col("wk.d")).as("rd"), (-col("wk.p")).as("rp")).as("_keep_rank")),
      Seq("sh"), nBuckets, seqCol = Some("_keep_rank"))
  }

  /** The served survivorship ledger from the gate's state — column-equal
    * to batch q129 on (doc_id, n_paragraphs, n_dropped, kept_tokens). */
  def paragraphLedger(spark: SparkSession, docsPath: String,
      dropsPath: String): org.apache.spark.sql.DataFrame = {
    val docs = BucketedMerge.read(spark, docsPath)
      .select(col("doc_id"), col("n_paragraphs"), col("total_tokens"))
    val drops =
      if (BucketedMerge.hasData(spark, dropsPath))
        BucketedMerge.read(spark, dropsPath)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("nd"), sum(col("n_toks")).as("dt"))
      else docs.sparkSession.range(0)
        .select(col("id").as("doc_id"), lit(0L).as("nd"), lit(0L).as("dt"))
    docs.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paragraphs"),
        coalesce(col("nd"), lit(0L)).as("n_dropped"),
        (col("total_tokens") - coalesce(col("dt"), lit(0L))).as("kept_tokens"))
  }

  /**
   * Online distinct-vocabulary sketch gate — streaming q135: the bitmap
   * state IS the distinct (lang, bucket) table, and set union is the one
   * merge that is idempotent, commutative and associative outright — so
   * unlike the CMS gate (whose counts need batchId-keyed deltas to stay
   * exactly-once) this gate needs NO replay bookkeeping: re-delivered,
   * out-of-order or crash-replayed batches upsert the same rows. Served
   * table: per-language set-bit count and the linear-counting estimate
   * (−m·ln(z/m)); ≡ batch [[graft.analytics.TextStats
   * .distinctSketchAudit]] on (lang, n_set_bits, n_est) by construction
   * (asserted under replay + out-of-order in StreamingCorpusSpec). The
   * exact tier is deliberately absent here — the sketch exists for the
   * regime where the exact distinct is unaffordable.
   *
   * State bound: ≤ m rows per language, forever.
   */
  def startDistinctSketchGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      bitsPath: String,
      servedPath: String,
      checkpointDir: String,
      m: Int = 4096,
      nBuckets: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import graft.analytics.TextStats
        BucketedMerge.mergeInto(spark, bitsPath,
          TextStats.vocabBuckets(batch, m), Seq("lang", "b"), nBuckets)
        if (BucketedMerge.hasData(spark, bitsPath))
          BucketedMerge.read(spark, bitsPath)
            .groupBy(col("lang")).agg(count(lit(1)).as("n_set_bits"))
            .select(col("lang"), col("n_set_bits"),
              TextStats.linearCountEstimate(m).as("n_est"))
            .write.mode("overwrite").parquet(servedPath)
      }
      .start()
  }

  /** The cluster table ((doc_id, cluster_id), one row per member incl.
    * the root — [[graft.analytics.Dedup.duplicateClusters]]'s exact
    * output shape) from the gate's forest state. */
  def clustersFromForest(forest: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    forest.select(col("doc_id"), col("root").as("cluster_id"))
      .unionByName(forest.select(col("root").as("doc_id"), col("root").as("cluster_id"))
        .distinct())

  /**
   * Continuously-maintained sequential funnel — the streaming counterpart
   * of q109: events land as files, the FUNNEL-TYPED subset is compacted
   * into a bucketed state table (keyed event_id, so replay and
   * out-of-order delivery dedup to set union — associative, hence
   * arrival-order independent), and the strict-order funnel accounting
   * is recomputed from that state after every batch. A late-arriving
   * early event retroactively rewrites downstream steps (a newly
   * unlocked earlier click re-qualifies later purchases), which no
   * per-step running-min state could express — retention of the typed
   * subset is the price of exact funnel semantics, and it is the
   * DECLARED state bound: funnel-step events only, never the full
   * stream.
   *
   * Output ≡ [[graft.analytics.Relational.eventFunnelOf]] over the full
   * corpus, asserted under shuffled arrival + replay in
   * StreamingCorpusSpec.
   */
  def startFunnel(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      steps: Seq[String],
      statePath: String,
      funnelPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val relevant = Merge.dedupLatest(
          batch.filter(col("event_type").isin(steps: _*))
            .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
            .withColumn("_dump_seq", lit(batchId)),
          Seq("event_id"), "_dump_seq")
        BucketedMerge.mergeInto(spark, statePath, relevant,
          Seq("event_id"), nBuckets, seqCol = Some("_dump_seq"))
        // a funnel-empty first wave leaves a zero-partition state dataset
        // (no parquet footers); recomputing over it would crash schema
        // inference — skip until funnel-typed events actually land
        if (BucketedMerge.hasData(spark, statePath))
          graft.analytics.Relational.eventFunnelOf(
              BucketedMerge.read(spark, statePath), steps)
            .write.mode("overwrite").parquet(funnelPath)
      }
      .start()
  }

  /**
   * Online per-source cap gate — the streaming counterpart of q103's
   * RefinedWeb domain-cap discipline: the kept table always holds, per
   * source, the `cap` documents with the LOWEST md5-lottery keys seen so
   * far ([[Sampling.sourceCapSelect]]). Keeping the cap-lowest keys is
   * associative and commutative over arrival, so the table converges to
   * the batch selection of the full corpus under any delivery order or
   * replay — a late-arriving lower-key document retroactively EVICTS the
   * highest kept key of its source (the admission analogue of the
   * semantic gate's retroactive quarantine).
   *
   * 100 TB posture: state is |sources|·cap rows by construction; each
   * batch re-ranks only its AFFECTED sources (null-safe semi-join) and
   * dynamic partition overwrite rewrites only those sources' partitions.
   * Caveat: `source` round-trips through a partition directory, so
   * all-numeric source names would come back re-typed by partition
   * inference — fixture and warehouse sources are alphanumeric.
   */
  def startSourceCapGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      cap: Int,
      keptPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.select(col("doc_id"), col("source"), col("n_chars"))
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(keptPath), spark.sparkContext.hadoopConfiguration)
        val target = new org.apache.hadoop.fs.Path(keptPath)
        val candidates =
          if (fs.exists(target)) {
            val affected = b.select(col("source").as("asrc")).distinct()
            spark.read.parquet(keptPath)
              .join(broadcast(affected), col("source") <=> col("asrc"), "left_semi")
              .unionByName(b)
          } else b
        // bounded (|affected sources| x cap after ranking): localCheckpoint
        // breaks the read-then-overwrite cycle on the kept table
        val kept = Sampling.sourceCapSelect(
          candidates.dropDuplicates("source", "doc_id"), cap)
          .localCheckpoint(true)
        kept.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("source").parquet(keptPath)
      }
      .start()
  }

  /**
   * Online URL-dedup gate — the streaming counterpart of q148
   * ([[Sampling.urlDedupStats]]): arriving documents canonicalize their
   * URL ([[Sampling.urlRaw]] → [[Sampling.urlCanonical]], the same
   * narrow column maps as batch) and the gate maintains, per canonical
   * URL, which document is the lottery keeper.
   *
   * State (both pure idempotent merges — no pre-merge read, so ANY crash
   * window or replay order re-merges identical or dominated rows):
   *  - DOCS ledger (doc_id → source, n_chars, url): a pure function of
   *    the document, idempotent overwrite;
   *  - KEEPER table (url → (kmk, kd)): the q103/q148 lottery minimum
   *    (md5(doc_id), doc_id) per URL. Keep-lowest is associative,
   *    commutative and idempotent; the merge rank encodes it EXACTLY:
   *    `_keep_rank = (translate(mk, hex, reversed-hex), -doc_id)` — the
   *    per-digit hex complement reverses lexicographic order 1:1, so
   *    keep-MAX rank is keep-MIN (md5, doc_id) with no precision caveat.
   *    A late-arriving lower-lottery document retroactively displaces
   *    the stored keeper (the source-cap gate's eviction semantics).
   *
   * Served output ([[urlLedger]]): per-source (n_docs, n_urls,
   * n_dup_removed, kept_chars, kept_checksum) ≡ batch q148 on the same
   * corpus (asserted under out-of-order arrival + replay + a crash
   * window in StreamingCorpusSpec).
   *
   * 100 TB posture: state is one narrow row per doc + one per distinct
   * URL (never text); each batch shuffles once per merge on bucket-
   * pruned keys; serving joins docs⋈keepers on the URL hash.
   */
  def startUrlDedupGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      docsPath: String,
      keeperPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainUrlDedupState(spark, batch, docsPath, keeperPath, batchId,
          nBuckets)
      }
      .start()
  }

  /** One batch step of [[startUrlDedupGate]] — factored out so the spec
    * can replay a crashed attempt directly. */
  def maintainUrlDedupState(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      docsPath: String,
      keeperPath: String,
      batchId: Long,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    val b = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      Merge.dedupLatest(
        batch.select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("_dump_seq", lit(batchId)),
        Seq("doc_id"), "_dump_seq")
        .withColumn("url",
          Sampling.urlCanonical(Sampling.urlRaw(col("doc_id"), col("source"))))
        .withColumn("mk", md5(col("doc_id").cast("string").cast("binary"))),
      eager = false)
    BucketedMerge.mergeInto(spark, docsPath,
      b.select(col("doc_id"), col("source"), col("n_chars"), col("url"),
        lit(batchId).as("_dump_seq")),
      Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
    val bmin = b.groupBy(col("url"))
      .agg(min(struct(col("mk"), col("doc_id").as("d"))).as("bk"))
    BucketedMerge.mergeInto(spark, keeperPath,
      bmin.select(col("url"), col("bk.mk").as("kmk"), col("bk.d").as("kd"),
        struct(
          translate(col("bk.mk"),
            "0123456789abcdef", "fedcba9876543210").as("rm"),
          (-col("bk.d")).as("rd")).as("_keep_rank")),
      Seq("url"), nBuckets, seqCol = Some("_keep_rank"))
  }

  /** The served q148 ledger from the gate's state — column-equal to batch
    * [[Sampling.urlDedupStats]] on the same corpus. */
  def urlLedger(spark: SparkSession, docsPath: String,
      keeperPath: String): org.apache.spark.sql.DataFrame =
    BucketedMerge.read(spark, docsPath)
      .select(col("doc_id"), col("source"), col("n_chars"), col("url"))
      .join(BucketedMerge.read(spark, keeperPath)
        .select(col("url"), col("kd")), Seq("url"))
      .withColumn("kept", col("doc_id") === col("kd"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_urls"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dup_removed"),
        coalesce(sum(when(col("kept"), col("n_chars"))), lit(0L))
          .as("kept_chars"),
        coalesce(sum(when(col("kept"), col("doc_id"))), lit(0L))
          .as("kept_checksum"))

  /**
   * Online Moore–Lewis gate — the streaming counterpart of q156:
   * arriving documents score against a FROZEN model bundle (built once
   * by [[graft.analytics.TextStats.mooreLewisModels]] from the corpus
   * snapshot — the q123 DSIR-gate frozen-model discipline) and the
   * per-doc score rows merge keyed by doc_id. A score is a pure function
   * of (content, models), so the served ledger ([[mooreLewisLedger]])
   * equals batch q156 over the same corpus under out-of-order arrival,
   * re-delivery and crash-window replay; asserted in
   * StreamingCorpusSpec.
   *
   * 100 TB posture: the model bundle is ≤ 4·cap + 1 rows and broadcasts;
   * per batch, one bigram pass + four broadcast joins + a doc-keyed
   * idempotent merge — per-batch work bounded by batch size.
   */
  def startMooreLewisGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      models: org.apache.spark.sql.DataFrame,
      scoresPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        mooreLewisStep(spark, batch, models, scoresPath, batchId, nBuckets)
      }
      .start()
  }

  /** One batch step of [[startMooreLewisGate]] — factored out so the spec
    * can replay a crashed attempt directly. */
  def mooreLewisStep(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      models: org.apache.spark.sql.DataFrame,
      scoresPath: String,
      batchId: Long,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    val scored = TextStats
      .mooreLewisScoreOf(batch.dropDuplicates(Seq("doc_id")), models)
      .withColumn("_dump_seq", lit(batchId))
    BucketedMerge.mergeInto(spark, scoresPath, scored,
      Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
  }

  /** The served q156 ledger from the gate's score table — column-equal
    * to batch [[graft.analytics.TextStats.mooreLewis]] when the models
    * were frozen from the same corpus the stream delivered. */
  def mooreLewisLedger(spark: SparkSession,
      scoresPath: String): org.apache.spark.sql.DataFrame =
    TextStats.mooreLewisLedgerOf(
      BucketedMerge.read(spark, scoresPath)
        .select(col("doc_id"), col("source"), col("nw"), col("score"),
          col("is_ref")))

  /**
   * Online domain-reweighting gate — the streaming counterpart of q157
   * (DoReMi-lite): arriving documents score against a FROZEN general
   * bigram model ([[graft.analytics.TextStats.domainModels]], built once
   * from the corpus snapshot — the q123/q156 frozen-model discipline),
   * and the per-doc (n_bigrams, exact-decimal term_sum) rows merge keyed
   * by doc_id. The served ledger ([[domainReweightLedger]]) rebuilds the
   * per-source difficulty table from exact decimal sums and re-runs the
   * SAME driver-side mirror-descent loop over the |domains|-row table —
   * column-equal to batch q157 under out-of-order arrival, re-delivery
   * and crash-window replay (asserted in StreamingCorpusSpec).
   *
   * 100 TB posture: the model is ≤ 2·cap+1 broadcast rows; per batch,
   * one bigram pass + three broadcast joins + a doc-keyed idempotent
   * merge — per-batch work bounded by batch size; the MW loop stays
   * driver-side over ≤ |domains| rows at serve time.
   */
  def startDomainReweightGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      models: org.apache.spark.sql.DataFrame,
      scoresPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        domainReweightStep(spark, batch, models, scoresPath, batchId, nBuckets)
      }
      .start()
  }

  /** One batch step of [[startDomainReweightGate]] — factored out so the
    * spec can replay a crashed attempt directly. */
  def domainReweightStep(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      models: org.apache.spark.sql.DataFrame,
      scoresPath: String,
      batchId: Long,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    val scored = TextStats.domainScoreOf(
      batch.select(col("doc_id"), col("source"), col("text"))
        .dropDuplicates(Seq("doc_id")), models)
      .withColumn("_dump_seq", lit(batchId))
    BucketedMerge.mergeInto(spark, scoresPath, scored,
      Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
  }

  /** The served q157 table from the gate's score state — column-equal to
    * batch [[graft.analytics.TextStats.domainReweight]] when the model
    * was frozen from the same corpus the stream delivered. Guarded like
    * [[semanticContaminationLedger]]: before the first non-empty merge
    * (or after an all-empty first batch, which writes bookkeeping but no
    * parquet footers) the state dir has no readable data — serve the
    * empty typed table instead of throwing schema inference at it. */
  def domainReweightLedger(spark: SparkSession, scoresPath: String,
      rounds: Int = 3, eta: Double = 1.0): org.apache.spark.sql.DataFrame = {
    val scored =
      if (BucketedMerge.hasData(spark, scoresPath))
        BucketedMerge.read(spark, scoresPath)
          .select(col("doc_id"), col("source"), col("n_bigrams"),
            col("term_sum"))
      else
        spark.range(0).select(col("id").as("doc_id"),
          lit("").as("source"), col("id").as("n_bigrams"),
          lit(null).cast("decimal(38,6)").as("term_sum"))
    TextStats.domainReweightFromScores(scored, rounds, eta)
  }

  /**
   * Online semantic-contamination gate — the streaming counterpart of
   * q164: the benchmark set is FROZEN from the corpus snapshot
   * ([[buildSemanticBench]] — the q123/q156 frozen-model discipline),
   * and each batch scores its non-bench arrivals against the broadcast
   * bench, merging ONE row per bench item keyed by bench_id with the
   * running-max cosine (seqCol = the raw cosine: max is associative,
   * commutative and idempotent, so the state is arrival-order,
   * re-delivery and crash-replay independent BY ALGEBRA — no batchId
   * bookkeeping exists at all, the q135 distinct-sketch discipline for
   * a max instead of a set union). The served ledger
   * ([[semanticContaminationLedger]]) left-joins the frozen bench onto
   * the state and rebuilds q164's per-label table — column-equal to
   * batch under any replay; asserted in StreamingCorpusSpec.
   *
   * 100 TB posture: the bench is stride-bounded and broadcast; per
   * batch one map-side scoring pass and a ≤ |bench| row merge; state
   * is ≤ |bench| rows forever.
   */
  def startSemanticContaminationGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      bench: org.apache.spark.sql.DataFrame,
      statePath: String,
      checkpointDir: String,
      stride: Long = graft.analytics.Similarity.SemanticBenchStride,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        semanticContaminationStep(spark, batch, bench, statePath, stride,
          nBuckets)
      }
      .start()
  }

  /** The frozen bench bundle for [[startSemanticContaminationGate]]:
    * (bench_id, label, b_emb) rows by the q137/q164 stride convention. */
  def buildSemanticBench(corpus: org.apache.spark.sql.DataFrame,
      stride: Long = graft.analytics.Similarity.SemanticBenchStride)
      : org.apache.spark.sql.DataFrame =
    corpus.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("bench_id"), col("label"),
        col("embedding").as("b_emb"))

  /** One batch step of [[startSemanticContaminationGate]] — factored out
    * so the spec can replay a crashed attempt directly. */
  def semanticContaminationStep(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      bench: org.apache.spark.sql.DataFrame,
      statePath: String,
      stride: Long = graft.analytics.Similarity.SemanticBenchStride,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    val arrivals = batch.select(col("vec_id"), col("embedding"))
      .dropDuplicates(Seq("vec_id"))
      .filter(pmod(col("vec_id"), lit(stride)) =!= 0 &&
        col("embedding").isNotNull)
    val scored = arrivals
      .join(broadcast(bench.filter(col("b_emb").isNotNull)
        .select(col("bench_id"), col("b_emb"))))
      .withColumn("cosine",
        graft.analytics.Similarity.cosineNative(col("b_emb"), col("embedding")))
      .filter(col("cosine").isNotNull)
      .groupBy(col("bench_id"))
      .agg(max(col("cosine")).as("top_raw"))
    BucketedMerge.mergeInto(spark, statePath, scored,
      Seq("bench_id"), nBuckets, seqCol = Some("top_raw"))
  }

  /** The served q164 table from the gate's running-max state —
    * column-equal to batch
    * [[graft.analytics.Similarity.semanticContamination]] when the bench
    * was frozen from the corpus the stream delivered. */
  def semanticContaminationLedger(
      spark: SparkSession,
      bench: org.apache.spark.sql.DataFrame,
      statePath: String,
      threshold: Double =
        graft.analytics.Similarity.SemanticContaminationThreshold)
      : org.apache.spark.sql.DataFrame = {
    val state =
      if (BucketedMerge.hasData(spark, statePath))
        BucketedMerge.read(spark, statePath)
          .select(col("bench_id"), round(col("top_raw"), 6).as("top_cos"))
      else
        spark.range(0).select(col("id").as("bench_id"),
          col("id").cast("double").as("top_cos"))
    bench.select(col("bench_id"), col("label"))
      .join(state, Seq("bench_id"), "left")
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_bench"),
        count(col("top_cos")).as("n_scored"),
        sum(when(col("top_cos") >= threshold, 1).otherwise(0)).cast("long")
          .as("n_contaminated"),
        when(count(col("top_cos")) > 0,
          round(sum(col("top_cos").cast("decimal(18,6)")).cast("double") /
            count(col("top_cos")), 6)).as("avg_top_cos"),
        max(col("top_cos")).as("max_top_cos"))
  }

  /**
   * Online soft-dedup reweighting gate — the streaming counterpart of
   * q159: per batch, (1) the incremental cluster forest absorbs the
   * arrivals ([[maintainClusterForest]] — the q74 gate's state machine,
   * batch-bounded and crash-replay-safe) and (2) the narrow
   * (doc_id, source, n_chars) rows merge keyed by doc_id. The q159
   * weights are a PURE FUNCTION of (docs state, cluster components):
   * [[softDedupLedger]] serves batch
   * [[graft.analytics.Dedup.softDedupWeightsOf]] over the maintained
   * state, so the ledger equals batch q159 over the delivered corpus
   * under out-of-order arrival, re-delivery and crash-window replay —
   * cluster labels cancel inside the 1/cluster-size weights (only
   * component membership enters the output), so even root displacement
   * by a late-arriving lower id cannot move a number.
   *
   * 100 TB posture: inherits the cluster gate's batch-bounded cost (the
   * only text pass is the arrival fingerprinting); the docs state is
   * three narrow columns; the served aggregate shuffles (source,
   * cluster_id, n_chars) only.
   */
  def startSoftDedupGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      repPath: String,
      forestPath: String,
      docsPath: String,
      checkpointDir: String,
      maxHamming: Int = 6,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        softDedupStep(spark, batch, repPath, forestPath, docsPath, batchId,
          maxHamming, nBuckets)
      }
      .start()
  }

  /** One batch step of [[startSoftDedupGate]] — factored out so the spec
    * can replay a crashed attempt directly. Docs-state merge first, then
    * the forest: both are idempotent under replay (doc-keyed upsert /
    * the cluster gate's crash-safe ordering), so a crash between the two
    * re-runs to the same state. */
  def softDedupStep(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      repPath: String,
      forestPath: String,
      docsPath: String,
      batchId: Long,
      maxHamming: Int = 6,
      nBuckets: Int = 32): Unit = {
    val b = Merge.dedupLatest(
      batch.select(col("doc_id"), col("source"), col("n_chars"), col("text"))
        .withColumn("_dump_seq", lit(batchId)),
      Seq("doc_id"), "_dump_seq")
    org.apache.spark.sql.GraftBridge.releasingPins {
      BucketedMerge.mergeInto(spark, docsPath,
        b.select(col("doc_id"), col("source"), col("n_chars"),
          lit(batchId).as("_dump_seq")),
        Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
    }
    maintainClusterForest(spark, b.select(col("doc_id"), col("text")),
      repPath, forestPath, batchId, None, maxHamming, nBuckets)
  }

  /** The maintained (doc_id, cluster_id) view of the gate's forest —
    * empty-typed when no forest exists yet. */
  private def servedClustersView(spark: SparkSession,
      forestPath: String): org.apache.spark.sql.DataFrame =
    if (BucketedMerge.hasData(spark, forestPath))
      clustersFromForest(BucketedMerge.read(spark, forestPath)
        .select(col("doc_id"), col("root")))
    else
      spark.range(0).select(col("id").as("doc_id"), col("id").as("cluster_id"))

  /** The maintained (doc_id, source, n_chars) docs state — empty-typed
    * when no merge has landed data yet (the [[servedClustersView]] /
    * [[semanticContaminationLedger]] guard: an all-empty first batch
    * writes bookkeeping but no parquet footers, and serving must not
    * throw schema inference at that). */
  private def servedDocsView(spark: SparkSession,
      docsPath: String): org.apache.spark.sql.DataFrame =
    if (BucketedMerge.hasData(spark, docsPath))
      BucketedMerge.read(spark, docsPath)
        .select(col("doc_id"), col("source"), col("n_chars"))
    else
      spark.range(0).select(col("id").as("doc_id"), lit("").as("source"),
        col("id").as("n_chars"))

  /** The served q159 ledger from the gate's state — column-equal to
    * batch [[graft.analytics.Dedup.softDedupWeights]] over the same
    * delivered corpus. */
  def softDedupLedger(spark: SparkSession, docsPath: String,
      forestPath: String): org.apache.spark.sql.DataFrame =
    graft.analytics.Dedup.softDedupWeightsOf(
      servedDocsView(spark, docsPath),
      servedClustersView(spark, forestPath))

  /** The served q163 effective-data audit from the SAME gate state —
    * q163 is the same pure-function family as q159 (docs state ×
    * cluster components; the decay rank is deterministic within a
    * component), so the one soft-dedup gate serves both ledgers and
    * both are ≡ batch under any replay. */
  def effectiveDataLedger(spark: SparkSession, docsPath: String,
      forestPath: String): org.apache.spark.sql.DataFrame =
    graft.analytics.Dedup.effectiveDataOf(
      servedDocsView(spark, docsPath),
      servedClustersView(spark, forestPath))

  /** The served q153 quality-keeper policy from the SAME gate state —
    * the third duplicate policy the one soft-dedup gate can price
    * online (1/n weights = q159, decay-valued repeats = q163, best-
    * member keeping = this). [[graft.analytics.Dedup.qualityKeepersOf]]
    * is membership-only — the min-id baseline is the doc_id-minimal
    * MEMBER, never the forest label — so root displacement by a
    * late-arriving lower id cannot move a number and the ledger is
    * ≡ batch q153 under out-of-order arrival, re-delivery and
    * crash-window replay. */
  def qualityKeeperLedger(spark: SparkSession, docsPath: String,
      forestPath: String): org.apache.spark.sql.DataFrame =
    graft.analytics.Dedup.qualityKeepersOf(
      servedDocsView(spark, docsPath),
      servedClustersView(spark, forestPath))

  /**
   * Online admission gate — the streaming counterpart of batch q151
   * ([[graft.analytics.Dedup.incrementalDedup]]): documents landing in
   * `landingDir` are gated against a PINNED existing-corpus index (built
   * by [[buildAdmissionIndex]] from the current snapshot) and receive one
   * of three verdicts: `exact` (content hash present in the index),
   * `near` (not exact, but its simhash is banded-near some index
   * fingerprint — ≥1 shared 15-bit band AND Hamming ≤ `maxHamming`, the
   * q35/q74 predicate), or `admitted`. A verdict is a pure function of
   * (document content, index) — independent of arrival order, batching
   * and re-delivery — so the verdict ledger equals the batch q151 gate on
   * the same snapshot split under ANY replay; StreamingCorpusSpec asserts
   * ≡ batch under out-of-order arrival, in-batch re-delivery and a
   * crash-window replay.
   *
   * 100 TB posture: per batch, text reduces to (h128, simhash) inside
   * the scan and never enters state; the exact gate is an equi-join of
   * the batch's narrow rows against the index on the 128-bit hash; the
   * near gate collapses the batch to distinct fingerprint VALUES and
   * probes the index's fingerprints through the banded LEFT SEMI
   * ([[graft.analytics.Dedup.bandNearValues]] — no pair stream); verdict
   * rows merge keyed by doc_id, so a re-delivered or crash-replayed
   * batch overwrites itself with identical rows.
   */
  def startAdmissionGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexPath: String,
      ledgerPath: String,
      checkpointDir: String,
      maxHamming: Int = 6,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        admitBatch(spark, batch, indexPath, ledgerPath, batchId, maxHamming,
          nBuckets)
      }
      .start()
  }

  /** Build (or extend) the pinned corpus index for [[startAdmissionGate]]:
    * one (h128, simhash) row per DISTINCT content hash of the existing
    * snapshot (equal text ⇒ equal fingerprint, so the group min is the
    * fingerprint; NULL-text rows carry no entry — they can never
    * collide). Keyed by h128, so a rebuilt or extended snapshot merges
    * idempotently. */
  def buildAdmissionIndex(
      spark: SparkSession,
      corpus: org.apache.spark.sql.DataFrame,
      indexPath: String,
      nBuckets: Int = 32): Unit = {
    import graft.analytics.Dedup
    BucketedMerge.mergeInto(spark, indexPath,
      Dedup.simhashMetaOf(corpus.select(col("doc_id"), col("text")))
        .filter(col("h128").isNotNull)
        .groupBy(col("h128"))
        .agg(min(col("simhash")).as("simhash"))
        .withColumn("_dump_seq", lit(0L)),
      Seq("h128"), nBuckets, seqCol = Some("_dump_seq"))
  }

  /** One batch step of [[startAdmissionGate]] — factored out so the spec
    * can replay a crashed attempt directly. */
  def admitBatch(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      indexPath: String,
      ledgerPath: String,
      batchId: Long,
      maxHamming: Int = 6,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    import graft.analytics.Dedup
    // one text pass: in-batch re-delivery collapsed, then content hash +
    // fingerprint; both gate branches read the pinned narrow rows
    val b = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      Merge.dedupLatest(
        batch.select(col("doc_id"), col("source"), col("text"))
          .withColumn("_dump_seq", lit(batchId)),
        Seq("doc_id"), "_dump_seq")
        .withColumn("h128", unhex(md5(col("text").cast("binary"))))
        .withColumn("simhash", Dedup.simhash(col("text")))
        .select(col("doc_id"), col("source"), col("h128"), col("simhash")),
      eager = false)
    val index =
      if (BucketedMerge.hasData(spark, indexPath))
        BucketedMerge.read(spark, indexPath).select(col("h128"), col("simhash"))
      else // empty index: everything admits (h128 is binary — see simhashMetaOf)
        spark.range(0).select(col("id").cast("string").cast("binary").as("h128"),
          col("id").as("simhash"))
    val nearFp = Dedup.bandNearValues(
        b.filter(col("simhash").isNotNull).select(col("simhash")).distinct(),
        index.select(col("simhash")).filter(col("simhash").isNotNull).distinct(),
        maxHamming)
      .withColumn("near_flag", lit(true))
    val verdicts = b
      .join(index.select(col("h128")).withColumn("exact_flag", lit(true)),
        Seq("h128"), "left")
      .join(nearFp, Seq("simhash"), "left")
      .withColumn("verdict",
        when(coalesce(col("exact_flag"), lit(false)), "exact")
          .when(coalesce(col("near_flag"), lit(false)), "near")
          .otherwise("admitted"))
      .select(col("doc_id"), col("source"), col("verdict"),
        lit(batchId).as("_dump_seq"))
    BucketedMerge.mergeInto(spark, ledgerPath, verdicts, Seq("doc_id"),
      nBuckets, seqCol = Some("_dump_seq"))
  }

  /**
   * Online CONTAINMENT gate — the streaming twin of q158 and the
   * asymmetric sibling of [[startAdmissionGate]]: arriving documents are
   * probed against a FROZEN corpus shingle index, and a doc whose
   * word-3-gram shingle set has Broder containment
   * |A∩B| / min(|A|,|B|) ≥ pct/100 with ANY indexed document is flagged
   * `contained` (a quote/subset of known content — the pairs the
   * simhash-banded near gate structurally misses). Verdicts are pure
   * functions of (content, pinned index), so the merged ledger equals
   * the one-shot batch probe under out-of-order arrival, re-delivery
   * and crash-window replay.
   *
   * 100 TB posture: the index holds narrow (corpus_id, gh, sz) longs
   * bucketed by gh, so each batch's probe is one hash equi-join keyed by
   * the arrival's shingle hashes — per-batch cost = Σ df over the
   * batch's shingles, never corpus-sized; the (arrival, corpus_id)
   * match-count groups are bounded by shared-shingle mass.
   */
  def startContainmentGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexPath: String,
      ledgerPath: String,
      checkpointDir: String,
      pct: Int = 80,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        containmentStep(spark, batch, indexPath, ledgerPath, batchId, pct,
          nBuckets)
      }
      .start()
  }

  /** Build (or idempotently extend) the frozen shingle index for
    * [[startContainmentGate]]: one (corpus_id, gh, sz) row per distinct
    * shingle hash of each corpus document, sz denormalized onto every
    * row so the probe needs no second table. Keyed by (corpus_id, gh). */
  def buildContainmentIndex(
      spark: SparkSession,
      corpus: org.apache.spark.sql.DataFrame,
      indexPath: String,
      nBuckets: Int = 32): Unit = {
    import graft.analytics.Dedup
    // same min-words filter as batch q158: a document with fewer words
    // than the shingle width carries no full shingle — indexing its
    // degenerate partial shingle would flag every short arrival
    // 'contained' against it
    val toks = corpus
      .select(col("doc_id").as("corpus_id"),
        split(trim(col("text")), "\\s+").as("ws"))
      .filter(size(col("ws")) >= Dedup.ContainmentShingleN)
      .select(col("corpus_id"),
        explode(array_distinct(transform(
          Dedup.ngramsFromWords(col("ws"), Dedup.ContainmentShingleN),
          g => Dedup.shingleHash(g)))).as("gh"))
    val szs = toks.groupBy("corpus_id").agg(count(lit(1)).as("sz"))
    BucketedMerge.mergeInto(spark, indexPath,
      toks.join(szs, "corpus_id").withColumn("_dump_seq", lit(0L)),
      Seq("corpus_id", "gh"), nBuckets, seqCol = Some("_dump_seq"))
  }

  /** One batch step of [[startContainmentGate]] — factored out so the
    * spec can replay a crashed attempt directly. */
  def containmentStep(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      indexPath: String,
      ledgerPath: String,
      batchId: Long,
      pct: Int = 80,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    val index =
      if (BucketedMerge.hasData(spark, indexPath))
        BucketedMerge.read(spark, indexPath)
          .select(col("corpus_id"), col("gh"), col("sz"))
      else // empty index: everything admits
        spark.range(0).select(col("id").as("corpus_id"), col("id").as("gh"),
          col("id").as("sz"))
    val b = Merge.dedupLatest(
      batch.select(col("doc_id"), col("source"), col("text"))
        .withColumn("_dump_seq", lit(batchId)),
      Seq("doc_id"), "_dump_seq")
    val verdicts = containmentVerdictsOf(b, index, pct)
      .withColumn("_dump_seq", lit(batchId))
    BucketedMerge.mergeInto(spark, ledgerPath, verdicts, Seq("doc_id"),
      nBuckets, seqCol = Some("_dump_seq"))
  }

  /** The probe itself, shared by the gate and the spec's batch twin:
    * per arrival (doc_id, source, text), verdict `contained` iff some
    * indexed doc reaches the containment gate with it. Pure function of
    * (arrivals, index) — the replay-safety root. */
  def containmentVerdictsOf(
      arrivals: org.apache.spark.sql.DataFrame,
      index: org.apache.spark.sql.DataFrame,
      pct: Int = 80): org.apache.spark.sql.DataFrame = {
    import graft.analytics.Dedup
    // min-words filter ≡ batch q158 and the index build: a short arrival
    // has no full shingle, probes nothing, and is admitted below via the
    // left join (its degenerate partial shingle previously matched any
    // indexed empty document at containment 1.0)
    val arrToks = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      arrivals
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
        .filter(size(col("ws")) >= Dedup.ContainmentShingleN)
        .select(col("doc_id"),
          explode(array_distinct(transform(
            Dedup.ngramsFromWords(col("ws"), Dedup.ContainmentShingleN),
            g => Dedup.shingleHash(g)))).as("gh")),
      eager = false)
    val arrSz = arrToks.groupBy("doc_id").agg(count(lit(1)).as("sz_a"))
    val hits = arrToks.join(index, "gh")
      .groupBy(col("doc_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_common"), max(col("sz")).as("sz_c"))
      .join(arrSz, "doc_id")
      .filter(col("n_common") * 100 >= least(col("sz_a"), col("sz_c")) * pct)
      .select(col("doc_id")).distinct()
      .withColumn("contained_flag", lit(true))
    arrivals.select(col("doc_id"), col("source"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(coalesce(col("contained_flag"), lit(false)), "contained")
          .otherwise("admitted"))
      .select(col("doc_id"), col("source"), col("verdict"))
  }

  /** The served containment ledger from the gate's verdict table. */
  def containmentLedger(spark: SparkSession,
      ledgerPath: String): org.apache.spark.sql.DataFrame =
    BucketedMerge.read(spark, ledgerPath)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_incoming"),
        sum(when(col("verdict") === "contained", 1L).otherwise(0L))
          .as("n_contained"),
        sum(when(col("verdict") === "admitted", 1L).otherwise(0L))
          .as("n_admitted"),
        sum(when(col("verdict") === "admitted", col("doc_id")).otherwise(0L))
          .as("admitted_checksum"))

  /** The served q151 ledger from the gate's verdict table — column-equal
    * to batch [[graft.analytics.Dedup.incrementalDedup]] when the index
    * holds the batch query's existing-snapshot side and the stream
    * delivered its incoming side. */
  def admissionLedger(spark: SparkSession,
      ledgerPath: String): org.apache.spark.sql.DataFrame =
    BucketedMerge.read(spark, ledgerPath)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_incoming"),
        sum(when(col("verdict") === "exact", 1L).otherwise(0L))
          .as("n_exact_dup"),
        sum(when(col("verdict") === "near", 1L).otherwise(0L))
          .as("n_near_dup"),
        sum(when(col("verdict") === "admitted", 1L).otherwise(0L))
          .as("n_admitted"),
        sum(when(col("verdict") === "admitted", col("doc_id")).otherwise(0L))
          .as("admitted_checksum"))

  /**
   * Online decontamination gate: documents landing in `landingDir` are
   * scored against a FROZEN benchmark k-gram set (`benchGrams`, one `h`
   * column — e.g. [[TextStats.allGramHashesOf]] over the eval suite) and
   * docs whose distinct-gram hit ratio reaches `flagThreshold` merge into
   * the quarantine table at `flaggedPath`. The q85 semantics applied
   * per micro-batch: scoring is a pure function of (doc, bench set), so
   * the quarantine table equals the batch scoring of the full corpus
   * under any arrival order or replay.
   *
   * 100 TB posture: the bench gram set is eval-sized (broadcast); each
   * batch's grams shuffle once on doc_id for the gram windows and once
   * for the per-doc aggregate; the already-quarantined table is never
   * rescanned.
   */
  def startContaminationGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      benchGrams: org.apache.spark.sql.DataFrame,
      flaggedPath: String,
      checkpointDir: String,
      k: Int = 8,
      flagThreshold: Double = 0.5,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val flagged = scoreContamination(batch, benchGrams, k, flagThreshold)
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, flaggedPath, flagged,
          Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
      }
      .start()
  }

  /**
   * Online SURGICAL decontamination gate — the streaming counterpart of
   * q141 ([[graft.analytics.TextStats.surgicalDecontamination]]): arriving
   * documents are scored against the frozen benchmark k-gram set and their
   * per-document ledger rows (doc_id, source, n_tokens, n_kept, cleaned_h
   * — TEXT-FREE, the cleaned text leaves the plan as its hash) merge into
   * the bucketed ledger at `ledgerPath`. The ledger row is a pure function
   * of (doc text, bench set), so re-delivery and replay merge the
   * identical row (keep-latest on `_dump_seq` is a no-op overwrite) and
   * the maintained ledger equals the batch ledger of the full corpus
   * under any arrival order; the q141 per-source table is then
   * [[graft.analytics.TextStats.surgicalRollupOf]] over the ledger.
   *
   * 100 TB posture: per batch one doc_id-partitioned window pass over the
   * batch's tokens (grams, coverage and reassembly share the sort), the
   * eval-sized bench set broadcast, ledger rows narrow and bucket-pruned
   * on merge; no state ever holds text.
   */
  def startSurgicalGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      benchGrams: org.apache.spark.sql.DataFrame,
      ledgerPath: String,
      checkpointDir: String,
      k: Int = 8,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val ledger = TextStats.surgicalLedgerOf(batch, benchGrams, k)
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, ledgerPath, ledger,
          Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
      }
      .start()
  }

  /** The gate's scoring step — pure so the spec can equate stream and
    * batch: per doc, distinct-gram hit ratio against the bench set. */
  def scoreContamination(docs: org.apache.spark.sql.DataFrame,
      benchGrams: org.apache.spark.sql.DataFrame,
      k: Int, flagThreshold: Double): org.apache.spark.sql.DataFrame =
    TextStats.allGramHashesOf(docs, k)
      .join(broadcast(benchGrams.select(col("h"))).withColumn("hit", lit(1)),
        Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("hit_ratio",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
      .filter(col("hit_ratio") >= flagThreshold)

  /**
   * Online DSIR gate — the streaming counterpart of q123 ([[graft
   * .analytics.TextStats.dsirSelectOf]]): arriving documents are scored
   * against a FROZEN hashed-n-gram importance model (`model` — the
   * (b, term) frame a batch [[graft.analytics.TextStats.dsirModelOf]]
   * training run produced; model refresh is a batch event, like the ANN
   * codebook and the classifier weights) and their (logw, sel_key) rows
   * merge into the bucketed score table. Scoring is a pure per-document
   * function of the frozen model, so the table equals the batch scoring
   * of the full corpus under any arrival order or replay; the top-`keepN`
   * selection is then a deterministic function OF that narrow table,
   * recomputed per batch (the q86 accounting discipline — a global
   * weighted sample cannot be admitted row-by-row, because a late
   * high-weight arrival must evict the current weakest selectee, which
   * only the maintained key table can express).
   *
   * 100 TB posture: per batch, explode → nBuckets-row broadcast model
   * join → per-doc decimal sum; the score table holds 3 narrow columns
   * per doc, text is never re-read, and the selection recompute is a
   * TakeOrdered over that table.
   */
  def startDsirGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      model: org.apache.spark.sql.DataFrame,
      scoresPath: String,
      selectedPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      featureBuckets: Int = 256,
      keepN: Int = 100,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val scored = TextStats
          .dsirKeyedOf(batch.dropDuplicates(Seq("doc_id")), model, featureBuckets)
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, scoresPath, scored,
          Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
        if (BucketedMerge.hasData(spark, scoresPath))
          TextStats.dsirTopOf(
              BucketedMerge.read(spark, scoresPath)
                .select(col("doc_id"), col("source"), col("logw"), col("sel_key")),
              keepN)
            .write.mode("overwrite").parquet(selectedPath)
      }
      .start()
  }

  /**
   * Online count-min-sketch gate — the streaming counterpart of q126
   * ([[graft.analytics.TextStats.cmsHeavyHitters]]'s sketch tier): the
   * depth×width bucket-count table is THE canonical delta-mergeable
   * stream sketch (counts add; addition is associative + commutative),
   * so each batch contributes one fixed-size delta and the maintained
   * table equals the batch sketch of everything ingested — under any
   * arrival order. Replay safety is NOT free for counts (re-delivery
   * would double-add), so the gate anti-joins arrivals against the
   * ingested-id table first (the narrow doc_id-keyed state every other
   * gate already maintains) and only NEW docs' tokens enter the delta.
   *
   * Exactly-once under crash-replay: a failed `foreachBatch` attempt may
   * have already merged PART of its state before the SAME batchId re-runs,
   * so plain "add the delta" would double-count. Both state writes are
   * therefore idempotent upserts: the id table keeps the EARLIEST batch
   * that saw each doc (lowest-wins seq merge), the batch's fresh set is
   * derived as "not seen by any batch with a LOWER id" (a replayed
   * attempt filters out its own earlier rows and recomputes the identical
   * set), and the delta lands keyed (batch_id, i, b) — a re-run overwrites
   * its own rows instead of adding them. The served sketch is the
   * (i, b)-sum over the delta table ([[cmsSketch]]).
   *
   * 100 TB posture: per batch, one token pass over NEW docs map-side
   * combined into ≤ depth·width delta rows, one keyed anti-join against
   * the id table, and a tiny-table upsert — per-batch work is bounded by
   * batch size; the delta table holds ≤ depth·width rows per batch.
   * Estimates for any candidate word list are served from [[cmsSketch]]
   * via [[graft.analytics.TextStats.cmsEstimatesOf]] without touching
   * the corpus. With `hhPath` set, the gate also maintains the classic
   * CMS φ-heavy-hitter candidate table (threshold-filtered estimates at
   * each word's arrivals, keep-max by word): any word whose TRUE count
   * reaches `hhThreshold` is guaranteed present — see
   * [[maintainCmsState]].
   */
  def startCmsGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      seenPath: String,
      deltasPath: String,
      checkpointDir: String,
      depth: Int = 4,
      width: Int = 1024,
      nBuckets: Int = 8,
      hhPath: Option[String] = None,
      hhThreshold: Long = 0L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // threshold 0 admits every distinct word (n_est >= 0 always holds),
    // making the heavy-hitter state vocab-sized and voiding the
    // 'threshold-bounded, never vocab-sized' contract
    require(hhPath.isEmpty || hhThreshold > 0L,
      "hhPath requires hhThreshold > 0 — a zero threshold admits the whole vocab")
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainCmsState(spark, batch, batchId, seenPath, deltasPath,
          depth, width, nBuckets, hhPath, hhThreshold)
      }
      .start()
  }

  /** One batch step of [[startCmsGate]] — factored out so the spec can
    * replay a CRASHED attempt (same batchId, partially-landed state)
    * directly and assert both upserts converge instead of double-adding. */
  def maintainCmsState(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      batchId: Long,
      seenPath: String,
      deltasPath: String,
      depth: Int = 4,
      width: Int = 1024,
      nBuckets: Int = 8,
      hhPath: Option[String] = None,
      hhThreshold: Long = 0L): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    require(hhPath.isEmpty || hhThreshold > 0L,
      "hhPath requires hhThreshold > 0 — a zero threshold admits the whole vocab")
    val arrivals = batch.dropDuplicates(Seq("doc_id"))
      .select(col("doc_id"), col("text"))
    val fresh = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      if (BucketedMerge.hasData(spark, seenPath))
        arrivals.join(
          BucketedMerge.read(spark, seenPath)
            .filter(col("first_batch") < batchId).select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      else arrivals,
      eager = false)
    BucketedMerge.mergeInto(spark, seenPath,
      fresh.select(col("doc_id"), lit(batchId).as("first_batch"),
        (-lit(batchId)).as("_keep_rank")),
      Seq("doc_id"), nBuckets, seqCol = Some("_keep_rank"))
    val freshToks = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      fresh.select(explode(graft.analytics.TextStats.words(col("text")))
        .as("w")),
      eager = false)
    val delta = graft.analytics.TextStats.cmsSketchOf(freshToks, depth, width)
    BucketedMerge.mergeInto(spark, deltasPath,
      delta.select(lit(batchId).as("batch_id"), col("i"), col("b"), col("c")),
      Seq("batch_id", "i", "b"), nBuckets = 1)
    // φ-heavy-hitter candidates (Cormode & Muthukrishnan's CMS+candidate
    // construction): after the batch's delta lands, re-estimate the
    // batch's DISTINCT words against the updated sketch and keep those at
    // or above the threshold, keep-max upsert by word. One-sided like the
    // sketch itself: a word's estimate at its LAST arrival already counts
    // every one of its occurrences, so any word whose TRUE count reaches
    // the threshold is guaranteed present (no false negatives); entries
    // are words whose estimate crossed the threshold at some arrival.
    // Replay-safe: a re-run re-estimates against a sketch that is a
    // superset of the crashed attempt's, and max(est) only grows. State
    // is threshold-bounded (≤ total-token-mass / threshold candidates),
    // never vocab-sized.
    hhPath.foreach { hp =>
      val est = graft.analytics.TextStats.cmsEstimatesOf(
        cmsSketch(spark, deltasPath),
        freshToks.select(col("w").as("word")).distinct(),
        depth, width)
        .filter(col("n_est") >= hhThreshold)
      BucketedMerge.mergeInto(spark, hp,
        est.select(col("word"), col("n_est"),
          col("n_est").as("_keep_rank")),
        Seq("word"), nBuckets, seqCol = Some("_keep_rank"))
    }
  }

  /** The served CMS state of [[startCmsGate]]: the (i, b)-summed delta
    * table — ≡ the batch [[graft.analytics.TextStats.cmsSketchOf]] of
    * every distinct ingested doc. */
  def cmsSketch(spark: SparkSession, deltasPath: String): org.apache.spark.sql.DataFrame =
    BucketedMerge.read(spark, deltasPath)
      .groupBy(col("i"), col("b")).agg(sum(col("c")).as("c"))

  /**
   * Online CDC chunk-dedup gate — the streaming counterpart of batch
   * q132 ([[graft.analytics.TextStats.cdcChunkDedup]]): arriving
   * documents chunk by the content-defined gear criterion and their
   * chunk rows merge keyed (doc_id, chunk_id). A document's chunk rows
   * are a PURE function of its text (CDC boundaries are content-local —
   * that is the point of CDC), so the maintained table — and the served
   * duplicate-mass ledger over it — equals batch q132 over the distinct
   * ingested docs under out-of-order arrival, re-delivery and
   * crash-window replay; asserted in StreamingCorpusSpec.
   *
   * 100 TB posture: per batch, one explode + one doc-keyed window pass
   * over BATCH rows only (chunking never re-reads the corpus), then a
   * (doc_id, chunk_id)-keyed idempotent merge — a re-delivered or
   * crash-replayed batch overwrites itself with identical rows. The
   * served ledger is a hash-keyed aggregate of the narrow chunk table.
   */
  def startCdcChunkGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      chunksPath: String,
      checkpointDir: String,
      divisor: Int = 16,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainCdcChunkState(spark, batch, chunksPath, batchId, divisor,
          nBuckets)
      }
      .start()
  }

  /** One batch step of [[startCdcChunkGate]] — factored out so the spec
    * can replay a crashed attempt directly. */
  def maintainCdcChunkState(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      chunksPath: String,
      batchId: Long,
      divisor: Int = 16,
      nBuckets: Int = 32): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    import graft.analytics.TextStats
    // one text pass; in-batch re-delivery collapses on (doc_id, chunk_id)
    val occ = Merge.dedupLatest(
      TextStats.cdcChunkOccurrencesOf(
        batch.select(col("doc_id"), col("text")), divisor)
        .withColumn("_dump_seq", lit(batchId)),
      Seq("doc_id", "chunk_id"), "_dump_seq")
    BucketedMerge.mergeInto(spark, chunksPath,
      occ.select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        col("nw"), col("_dump_seq")),
      Seq("doc_id", "chunk_id"), nBuckets, seqCol = Some("_dump_seq"))
  }

  /** The served q132 ledger over the gate's chunk table — ≡ batch
    * [[graft.analytics.TextStats.cdcChunkDedup]] of the distinct
    * ingested docs. */
  def cdcChunkLedger(spark: SparkSession,
      chunksPath: String): org.apache.spark.sql.DataFrame =
    graft.analytics.TextStats.cdcChunkLedgerOf(
      BucketedMerge.read(spark, chunksPath)
        .select(col("doc_id"), col("chunk_md5"), col("nw")))

  /**
   * Online BPE corpus-encoding gate — the streaming counterpart of batch
   * q100 ([[graft.analytics.TextStats.bpeEncode]]): arriving documents'
   * words enter a word-frequency delta table against a FROZEN merge list
   * (driver-fit once by [[graft.analytics.TextStats.bpeFitMerges]] from
   * the corpus snapshot — the q123/q156 frozen-model discipline; a
   * tokenizer refresh is a batch event), and the served ledger encodes
   * the summed word table through the same rank-ordered replace chain as
   * batch q100. Counts add, so replay safety follows the CMS gate's
   * discipline verbatim: arrivals anti-join the seen-id table (earliest
   * batch wins), and each batch's delta lands keyed (batch_id, word) —
   * a crash-replayed attempt overwrites its own rows instead of adding.
   *
   * 100 TB posture: per batch, one token pass over NEW docs map-side
   * combined into a batch-vocab-sized delta; the encode chain runs only
   * in the served ledger, once per DISTINCT word of the accumulated
   * vocab — the corpus is never re-scanned.
   */
  def startBpeEncodeGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      merges: Seq[(Int, String, String, String, Long)],
      seenPath: String,
      deltasPath: String,
      checkpointDir: String,
      nBuckets: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        maintainBpeWordState(spark, batch, batchId, seenPath, deltasPath,
          nBuckets)
      }
      .start()
  }

  /** One batch step of [[startBpeEncodeGate]] — factored out so the spec
    * can replay a crashed attempt (same batchId, partially-landed state)
    * directly. The merge list plays no part in STATE maintenance (only
    * the served ledger encodes), so the state stays valid across
    * tokenizer refreshes. */
  def maintainBpeWordState(
      spark: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      batchId: Long,
      seenPath: String,
      deltasPath: String,
      nBuckets: Int = 8): Unit = org.apache.spark.sql.GraftBridge.releasingPins {
    val arrivals = batch.dropDuplicates(Seq("doc_id"))
      .select(col("doc_id"), col("text"))
    val fresh = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      if (BucketedMerge.hasData(spark, seenPath))
        arrivals.join(
          BucketedMerge.read(spark, seenPath)
            .filter(col("first_batch") < batchId).select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      else arrivals,
      eager = false)
    BucketedMerge.mergeInto(spark, seenPath,
      fresh.select(col("doc_id"), lit(batchId).as("first_batch"),
        (-lit(batchId)).as("_keep_rank")),
      Seq("doc_id"), nBuckets, seqCol = Some("_keep_rank"))
    // the q100 word filter verbatim (len >= 1): empty-split artifacts
    // carry no symbols and never enter the frequency table
    val delta = fresh
      .select(explode(graft.analytics.TextStats.words(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    BucketedMerge.mergeInto(spark, deltasPath,
      delta.select(lit(batchId).as("batch_id"), col("word"), col("n")),
      Seq("batch_id", "word"), nBuckets)
  }

  /** The served q100 ledger: sum the word deltas, encode each distinct
    * word through the frozen merges, roll up — column-equal to batch
    * [[graft.analytics.TextStats.bpeEncode]] when the merges were fit on
    * the corpus the stream delivered. */
  def bpeEncodeLedger(spark: SparkSession, deltasPath: String,
      merges: Seq[(Int, String, String, String, Long)],
      topK: Int = 40): org.apache.spark.sql.DataFrame =
    graft.analytics.TextStats.bpeEncodeWordFreq(
      BucketedMerge.read(spark, deltasPath)
        .groupBy(col("word")).agg(sum(col("n")).as("n")),
      merges, topK)

  /**
   * Online quality-classifier gate — the streaming counterpart of the
   * q91 batch filter ([[graft.analytics.TextStats
   * .classifierQualityStatsOf]]), completing the pattern that every
   * batch filter family here has a streaming form: documents landing in
   * `landingDir` are scored against a FROZEN weight model (`weights` —
   * the (b, wt) frame from a batch
   * [[graft.analytics.TextStats.classifierWeights]] training run; model
   * refresh is a batch event, exactly like the ANN codebook in
   * [[startCellIndex]]) and rejected documents (score ≤ 0 that also lose
   * the md5 lottery) are quarantined. Scoring is a pure per-document
   * function of the frozen model, so the quarantine table equals the
   * batch filter's dropped set under any arrival order and replay
   * (seq-aware bucket merge).
   *
   * 100 TB posture: per micro-batch, explode → nBuckets-row broadcast
   * model join → per-doc map-side partial aggregate; the already-accepted
   * corpus is never rescored and only affected quarantine buckets
   * rewrite.
   */
  def startClassifierGate(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      weights: org.apache.spark.sql.DataFrame,
      quarantinePath: String,
      checkpointDir: String,
      featureBuckets: Int = 256,
      lotteryMod: Int = 10,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the corpus contract allows re-delivery, including twice within
        // ONE micro-batch; a doc's rows are identical by contract, but
        // scoring a doubled doc would double its stored score — dedup
        // first (the chunk path does the same via dedupLatest)
        val dropped = TextStats
          .classifierScores(batch.dropDuplicates(Seq("doc_id")),
            weights, featureBuckets, lotteryMod)
          .filter(!col("kept"))
          .select(col("doc_id"), col("source"), col("score"))
          .withColumn("_dump_seq", lit(batchId))
        BucketedMerge.mergeInto(spark, quarantinePath, dropped,
          Seq("doc_id"), nBuckets, seqCol = Some("_dump_seq"))
      }
      .start()
  }
}

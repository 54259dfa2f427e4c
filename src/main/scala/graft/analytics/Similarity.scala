package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over the `embeddings` fixture
 * (vec_id, embedding: array<float>, label).
 *
 * Two tiers (the task's required shape):
 *  - brute force: exact cosine top-k — the correctness baseline;
 *  - IVF: coarse quantization into `label`-seeded cells; queries probe only
 *    the nearest `nprobe` cells — the 100 TB scale path, where the full
 *    corpus is partitioned by cell and a query touches O(nprobe/ncells) of
 *    the data instead of all of it.
 *
 * Vector math is computed in double with sequential left-to-right
 * summation (reproducible across engines): the float×float hot path uses
 * the native codegen'd [[graft.functions.CosineSimilarity]] expression,
 * everything else higher-order array expressions (`zip_with` +
 * `aggregate`). No UDFs, no collect.
 */
object Similarity {

  import Tables._

  /** Σ aᵢ·bᵢ in double, sequential. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Higher-order-function cosine: works on any numeric element type
    * (used for float-vs-double centroid routing). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine for corpus scans (float or double element
    * arrays per side) — numerically identical to [[cosine]] (same order,
    * same formula, floats widened to double exactly like cast("double")),
    * ~one fused loop per row instead of interpreted lambdas; see
    * [[graft.functions.CosineSimilarity]]. The n x k assignment scoring
    * (assignCells) is the hot path this buys back: at k=80 on the 10x
    * soak it is ~5x the whole-pipeline wall when interpreted. */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

  /**
   * Exact cosine top-k: query set (vec_id ≡ 0 mod stride) broadcast against
   * the corpus, scored per partition, per-query top-k via window.
   * At scale: the corpus never shuffles — scoring is map-side; only the
   * (tiny) scored-pairs stream shuffles for the top-k.
   */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5, stride: Long = 100): DataFrame =
    topKOf(embeddings(s, d), k, stride)

  /** q164 defaults — interpolated into the q164 oracle SQL (SparkEntry)
    * so the engines cannot silently desync on them. */
  val SemanticBenchStride: Long = 20L
  val SemanticContaminationThreshold: Double = 0.3

  /**
   * q164: SEMANTIC benchmark-contamination audit — the embedding-space
   * member of the decontamination family (q66/q85 n-gram overlap, q138
   * Bloom prefilter, q141 surgical spans): verbatim-overlap gates miss
   * paraphrased or translated benchmark leakage, so this one flags each
   * benchmark item whose nearest NON-benchmark corpus neighbor is
   * suspiciously close in embedding space (the contamination mode
   * documented for paraphrased eval sets — embedding similarity search
   * is the standard detector). Bench membership is the q137 stride
   * convention (vec_id ≡ 0 mod stride). Per label: bench size, scored
   * count, contaminated count (top-1 cosine ≥ threshold) and the 6-dp
   * disciplined mean/max top-1 cosine.
   *
   * Determinism: top-1 keeps only the max cosine VALUE (no id
   * tie-break needed), rounded to 6 dp before the decimal-summed mean;
   * NULL/zero-norm embeddings score NULL (the q87 cosine guard) and
   * surface as unscored bench rows, never as cosine-0 matches.
   *
   * 100 TB shape: the bench set is stride-bounded and BROADCAST; the
   * corpus is scanned once, scored map-side inside codegen, and only
   * (bench_id, partial max) rows shuffle — no corpus pair stream, no
   * index. The per-label rollup is |labels| rows.
   */
  def semanticContamination(s: SparkSession, d: String,
      stride: Long = SemanticBenchStride,
      threshold: Double = SemanticContaminationThreshold): DataFrame = {
    val e = embeddings(s, d)
    val bench = e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("bench_id"), col("embedding").as("b_emb"),
        col("label"))
    val corpus = e
      .filter(col("vec_id") % stride =!= 0 && col("embedding").isNotNull)
      .select(col("embedding").as("c_emb"))
    val top1 = corpus
      .join(broadcast(bench.filter(col("b_emb").isNotNull)
        .select(col("bench_id"), col("b_emb"))))
      .withColumn("cosine", cosineNative(col("b_emb"), col("c_emb")))
      .filter(col("cosine").isNotNull)
      .groupBy(col("bench_id"))
      .agg(round(max(col("cosine")), 6).as("top_cos"))
    bench.join(top1, Seq("bench_id"), "left")
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

  /** The brute-force scoring core over an arbitrary (vec_id, embedding)
    * frame — shared by [[bruteForceTopK]] and the q133 truncation tiers. */
  private def topKOf(emb: DataFrame, k: Int, stride: Long): DataFrame = {
    val queries = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = corpus.join(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("q_emb"), col("c_emb")))
    boundedTopK(scored, k)
  }

  /**
   * q133: Matryoshka-truncation recall audit — recall@k of top-k search
   * over PREFIX-truncated embeddings vs the full-dimension ground truth,
   * per truncation tier. The table an operator reads before shipping
   * MRL-style truncated vectors (Kusupati et al. 2022) to cut index cost
   * — the memory/recall trade made measurable, joining the q107/q110/
   * q122 approximation-honesty suite.
   *
   * 100 TB shape: each tier is the [[bruteForceTopK]] scoring core over
   * a NARROWER in-row slice (no extra scan state; the slice is free at
   * the scan), stride-bounded broadcast queries, bounded-heap top-k —
   * per-tier cost strictly below the full-dim pass it audits.
   */
  def mrlRecallStats(s: SparkSession, d: String, k: Int = 5,
      stride: Long = 100, tiers: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val exact = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      bruteForceTopK(s, d, k, stride)
        .select(col("query_id"), col("neighbor_id")),
      eager = false)
    val exactQ = exact.select(col("query_id")).distinct()
    tiers.map { dims =>
      val emb = embeddings(s, d).select(col("vec_id"),
        slice(col("embedding"), 1, dims).as("embedding"))
      val hits = topKOf(emb, k, stride)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      exactQ.join(hits, Seq("query_id"), "left")
        .select(lit(dims).as("trunc_dims"), col("query_id"),
          coalesce(col("h"), lit(0L)).as("n_hits"),
          round(coalesce(col("h"), lit(0L)).cast("double") / k, 6).as("recall"))
    }.reduce(_ unionByName _)
  }

  /**
   * q170: int8-quantization retrieval honesty audit — recall@k of cosine
   * top-k over the DEQUANTIZED int8 corpus
   * ([[Quantization.dequantizedInt8]] — q77's per-dim codebook and
   * mid-rise reconstruction, i.e. exactly what a serving tier that
   * shipped the 4×-smaller codes would rank with) against the float
   * exact ground truth. Completes the approximation-honesty matrix:
   * PQ has q107, IVF q110, MRL truncation q133, the composed IVF-ADC
   * path q166 — int8 (q77) was the one audited representation without a
   * retrieval-loss number next to its storage win.
   *
   * Both rankings share the deterministic conventions (identical
   * dequantization arithmetic on both engines, sequential-order cosine,
   * id tie-breaks, NULL cosines excluded), so the intersection — and the
   * hash-checked recall — is engine-independent. 100 TB shape: the
   * rebuild is corpus-linear ([[Quantization.dequantizedInt8]]); both
   * rankings are the brute-force pattern (stride-bounded broadcast
   * queries, map-side scoring, bounded-heap top-k) — the ground-truth
   * tier is the declared audit cost, q107's standing.
   */
  def int8RecallStats(s: SparkSession, d: String, k: Int = 5,
      stride: Long = 100): DataFrame = {
    val exact = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      bruteForceTopK(s, d, k, stride)
        .select(col("query_id"), col("neighbor_id")),
      eager = false)
    val exactQ = exact.select(col("query_id")).distinct()
    // pin the rebuild: the corpus and query sides of the int8 ranking
    // both derive from it, and without the checkpoint the explode +
    // codebook join + re-aggregate run once per side (q165's code-frame
    // discipline)
    val dq = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      Quantization.dequantizedInt8(embeddings(s, d)), eager = false)
    val hits = topKOf(dq, k, stride)
      .select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
    exactQ.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double") / k, 6).as("recall"))
  }

  /**
   * q171: SemDeDup cell-blocking recall audit — the sampling-honesty
   * discipline (q168's shape) applied to q87's blocking structure.
   * SemDeDup only compares vectors sharing a k-means cell, so a
   * duplicate pair split across cells is invisible to it — the
   * documented blocking loss every blocked-dedup writeup concedes. This
   * audit prices it: ground truth = every pair involving a strided
   * probe vector with cosine ≥ threshold (the q107 "sample the query
   * set" convention applied to pair endpoints — per-probe cost is one
   * broadcast scan, never all-pairs); caught = the pair co-resides in a
   * q87 cell. Banded by the true cosine, because a blocked-apart 0.95
   * pair is a real dedup miss while a blocked 0.4 pair is noise — the
   * table shows WHERE the loss lives instead of asserting it's fine.
   *
   * 100 TB shape: probes broadcast (stride-bounded); truth scoring is
   * map-side against the corpus scan; cell assignments join back by
   * vec_id equi-keys; the rollup is ≤ 3 rows.
   */
  def semanticBlockingRecall(s: SparkSession, d: String, k: Int = 8,
      iters: Int = 2, threshold: Double = 0.35,
      stride: Long = 50): DataFrame = {
    val emb = embeddings(s, d)
    val cells = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      trainedCells(emb, k, iters, 1).select(col("vec_id"), col("cell")),
      eager = false)
    val live = emb.filter(col("embedding").isNotNull)
    val probes = live.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val truth = live
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .join(broadcast(probes))
      .filter(col("p_id") =!= col("c_id"))
      // rounded compare key, the q87/q83 convention: a 1-ulp cosine
      // divergence cannot flip the threshold or the band
      .withColumn("cos", round(cosineNative(col("p_emb"), col("c_emb")), 12))
      .filter(col("cos") >= threshold)
      // probe↔probe pairs appear once per direction with the IDENTICAL
      // rounded cosine (multiplication commutes elementwise, sums run in
      // the same order) — canonicalize and collapse
      .select(least(col("p_id"), col("c_id")).as("vec_a"),
        greatest(col("p_id"), col("c_id")).as("vec_b"), col("cos"))
      .dropDuplicates(Seq("vec_a", "vec_b"))
    truth
      .join(cells.select(col("vec_id").as("vec_a"), col("cell").as("cell_a")), Seq("vec_a"))
      .join(cells.select(col("vec_id").as("vec_b"), col("cell").as("cell_b")), Seq("vec_b"))
      .withColumn("band",
        when(col("cos") >= 0.9, "0.9+")
          .when(col("cos") >= 0.6, "0.6-0.9")
          .otherwise("t-0.6"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_true_pairs"),
        sum(when(col("cell_a") === col("cell_b"), 1).otherwise(0)).cast("long")
          .as("n_same_cell"))
      .withColumn("recall",
        round(col("n_same_cell").cast("double") / col("n_true_pairs"), 6))
  }

  /** The int8 serving ranking over an explicit dequantized table — the
    * q170 approximate side factored over state so the streaming int8
    * index ([[graft.streaming.StreamingCorpus.startInt8Index]]) serves
    * the SAME code path batch q170 ranks with. */
  def int8TopKOf(dq: DataFrame, k: Int = 5, stride: Long = 100): DataFrame =
    topKOf(dq, k, stride)

  /** Per-query top-k via the bounded-heap aggregate: partial k-heaps build
    * map-side, only k rows per partition per query shuffle — vs a window
    * sort of EVERY scored row. Output identical to the window form
    * (score desc, id asc), verified bitwise in SimilaritySpec. */
  private def boundedTopK(scored: DataFrame, k: Int): DataFrame =
    // undefined cosine (zero-magnitude side) is no evidence of similarity
    // — excluded from the candidate set on both engine and oracle side
    scored.filter(col("cosine").isNotNull).groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopK.topK(k)(col("cosine"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        round(col("s.score"), 6).as("cosine"), (col("idx") + 1).as("rn"))

  /**
   * q120: hard-negative mining — for each query vector, the top-k most
   * similar vectors carrying a DIFFERENT label (contrastive-training's
   * hard negatives: the closest points the model must learn to push
   * away, per DPR / Contriever practice). Rides the brute-force scoring
   * shape; an at-scale caller composes the same label filter onto
   * [[ivfTopK]]'s cell-pruned candidates.
   *
   * NULL labels never qualify as negatives of anything (unknown label ≠
   * known-different) and NULL-label queries are excluded — a mining pass
   * must not fabricate training signal from unlabeled rows.
   */
  def hardNegatives(s: SparkSession, d: String, k: Int = 5,
      stride: Long = 100): DataFrame = {
    val emb = embeddings(s, d).filter(col("label").isNotNull)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"), col("label").as("c_label"))
    val scored = corpus.join(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("c_label") =!= col("q_label"))
      .withColumn("cosine", cosineNative(col("q_emb"), col("c_emb")))
    boundedTopK(scored, k)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine"), col("rn"))
  }

  /**
   * q110: recall@k of the IVF index against the brute-force cosine
   * ground truth — q107's sibling for the cosine tier, closing the loop
   * on approximation honesty: every ANN path in the engine (PQ/ADC and
   * IVF) now ships with a distributed accuracy audit. Both rankings are
   * deterministic (6-dp rounding, id tie-breaks), so the intersection
   * hashes identically across engines; zero-overlap queries stay in the
   * output via the left join. IVF recall < 1 exactly when a true
   * neighbor lives in an unprobed cell — the documented trade the audit
   * quantifies per query.
   */
  def ivfRecallStats(s: SparkSession, d: String, k: Int = 5,
      nprobe: Int = 4, stride: Long = 100, nplanes: Int = 3): DataFrame = {
    val ivf = ivfTopK(s, d, k, nprobe, stride, nplanes)
      .select(col("query_id"), col("neighbor_id"))
    val exact = bruteForceTopK(s, d, k, stride)
      .select(col("query_id"), col("neighbor_id"))
    val hits = ivf.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double") / k, 6).as("recall"))
  }

  /**
   * q121: IVF-ROUTED hard-negative mining — q120's semantics served
   * through the cell-pruned index instead of the brute-force scan, the
   * spelling a 100 TB miner actually runs: the labeled corpus is
   * hyperplane-celled exactly as [[ivfTopK]], each query routes to its
   * `nprobe` nearest centroids, and only those cells are scanned for
   * different-label neighbors. Cells and centroids are built over the
   * LABELED corpus only (unlabeled rows can never be negatives, so
   * indexing them would only dilute the probes). Approximate by the same
   * trade as every IVF path: a hard negative living in an unprobed cell
   * is missed — which is exactly what [[ivfHardNegativeRecallStats]]
   * (q122) quantifies per query against the q120 ground truth.
   *
   * 100 TB shape: centroids are 2^nplanes broadcast rows; the stride-
   * bounded query set broadcasts against only the probed cells'
   * partitions; per-query cost is nprobe/ncells of the labeled corpus,
   * independent of total corpus growth, and the bounded-heap top-k keeps
   * the shuffle at k rows per query per partition.
   */
  def ivfHardNegatives(s: SparkSession, d: String, k: Int = 5,
      nprobe: Int = 4, stride: Long = 100, nplanes: Int = 3): DataFrame = {
    val lab = embeddings(s, d).filter(col("label").isNotNull)
    val dim = embeddingDim(embeddings(s, d))
    val emb = lab.withColumn("cell", lshBucketCol(col("embedding"), nplanes, dim))
    val cents = centroids(emb)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val routed = queries.join(broadcast(cents))
      .withColumn("c_cos", cosineNative(col("q_emb"), col("centroid")))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("c_cos").desc, col("cell"))
    val probes = routed.withColumn("pr", row_number().over(wr))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_label"), col("cell"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"), col("label").as("c_label"), col("cell"))
    val scored = corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("c_label") =!= col("q_label"))
      .withColumn("cosine", cosineNative(col("q_emb"), col("c_emb")))
    boundedTopK(scored, k)
  }

  /**
   * q122: recall@k of the routed miner (q121) against the brute-force
   * hard-negative ground truth (q120) — the same approximation-honesty
   * audit every ANN tier ships (q107 for PQ, q110 for IVF): per query,
   * how many of the true top-k hard negatives the cell-pruned scan found.
   * Ground-truth queries with no routed hits stay in the output via the
   * left join.
   */
  def ivfHardNegativeRecallStats(s: SparkSession, d: String, k: Int = 5,
      nprobe: Int = 4, stride: Long = 100, nplanes: Int = 3): DataFrame = {
    val routed = ivfHardNegatives(s, d, k, nprobe, stride, nplanes)
      .select(col("query_id"), col("neighbor_id"))
    val exact = hardNegatives(s, d, k, stride)
      .select(col("query_id"), col("neighbor_id"))
    val hits = routed.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double") / k, 6).as("recall"))
  }

  /** Centroid per IVF cell: element-wise mean of member embeddings in
    * exploded (cell, dim, value) form — one shuffle keyed by (cell, dim),
    * then reassembled into an ordered array per cell. The frame must carry
    * a `cell` column (see [[ivfTopK]]).
    *
    * The mean is DECIMAL-summed (decimal addition is order-independent)
    * then divided as a double: a plain `avg(double)` depends on summation
    * order, and since q37 is value-oracle-checked, a routing comparison
    * between two cells whose cosines differ by ~1e-16 would otherwise
    * flip between engines/partitionings. DECIMAL(28,15) holds 13 integer
    * digits, so unit-scale and raw-feature embeddings alike are safe from
    * cast overflow. Parity caveat: 15 fractional digits rounds the double
    * (binary floats generally need more decimal digits to round-trip), so
    * cross-engine equality rests on Spark and DuckDB applying the SAME
    * double→decimal cast rounding — empirically true and pinned by the
    * q37 value oracle, not exact "by construction". */
  def centroids(emb: DataFrame): DataFrame = {
    // explode to (cell, dim_idx, value) — one shuffle keyed by (cell, dim).
    val exploded = emb.select(col("cell"),
      posexplode(col("embedding")).as(Seq("dim", "v")))
    exploded.groupBy(col("cell"), col("dim"))
      .agg((sum(col("v").cast("decimal(28,15)")).cast("double") /
        count(col("v"))).as("mean_v"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean_v")))).as("pairs"))
      .select(col("cell"), transform(col("pairs"), p => p.getField("mean_v")).as("centroid"))
  }

  /**
   * IVF-style ANN: partition the corpus into cells, compute centroids,
   * route each query to its `nprobe` nearest centroids, and scan only those
   * cells. Approximate: recall < 1 when the true neighbor lives in an
   * unprobed cell — the standard IVF trade.
   *
   * Cells are hyperplane sign buckets ([[lshBucketCol]]) — derived from the
   * embedding geometry itself (a map-side expression, no trained model, no
   * extra shuffle), so directionally-similar vectors co-locate. On real
   * clustered corpora this is where k-means cells would slot in; the
   * routing/probing machinery is independent of the cell function.
   * Correctness envelope (SketchBoundsSpec/SimilaritySpec): nprobe = ncells
   * reproduces the exact brute-force result bitwise; smaller nprobe trades
   * recall for scanning only ~nprobe/ncells of the corpus.
   */
  def ivfTopK(s: SparkSession, d: String, k: Int = 5, nprobe: Int = 4,
      stride: Long = 100, nplanes: Int = 3): DataFrame = {
    val dim = embeddingDim(embeddings(s, d))
    val emb = embeddings(s, d)
      .withColumn("cell", lshBucketCol(col("embedding"), nplanes, dim))
    val cents = centroids(emb) // (cell, centroid) — tiny, broadcast
    val queries = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // route: per query, nprobe nearest cells by centroid cosine
    val routed = queries.join(broadcast(cents))
      .withColumn("c_cos", cosineNative(col("q_emb"), col("centroid")))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("c_cos").desc, col("cell"))
    val probes = routed.withColumn("pr", row_number().over(wr))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell"))
    // scan only probed cells: join on cell co-partitions corpus and probes
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"), col("cell"))
    val scored = corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("q_emb"), col("c_emb")))
    boundedTopK(scored, k)
  }

  /**
   * Hyperplane coefficient in [-0.5, 0.5) from the 32-bit md5 prefix of
   * "plane_dim". Bit-identical to the DuckDB form
   * `(('0x'||substr(md5(p||'_'||i),1,8))::BIGINT % 1000000)/1000000.0-0.5`,
   * so LSH bucket assignments are fully oracle-checkable.
   */
  def planeCoef(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${p}_$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1000000L)
      .toDouble / 1000000.0 - 0.5
  }

  /**
   * Random-hyperplane LSH bucketing: sign bits of projections onto
   * `nplanes` pseudo-random hyperplanes (no stored model). The (plane, dim)
   * coefficient matrix is row-independent, so it is computed ONCE on the
   * driver and shipped as literal arrays — the per-row work is just the
   * `nplanes` fused dot products (an earlier inline-hash form recomputed
   * md5 per row per element and cost 2-4s per query at sf0.1).
   * `dim` is the (fixed) embedding width. Docs in the same bucket are
   * cosine-similar candidates.
   */
  def lshBucketCol(embCol: Column, nplanes: Int, dim: Int): Column =
    graft.functions.HyperplaneSignature.signature(embCol, coefMatrix(nplanes, dim))

  /** The literal (plane, dim) coefficient matrix [[lshBucketCol]] ships to
    * executors; also the spec's reference for the HOF parity check. */
  def coefMatrix(nplanes: Int, dim: Int): Vector[Vector[Double]] =
    Vector.tabulate(nplanes)(p => Vector.tabulate(dim)(i => planeCoef(p, i)))

  /** The pre-round-6 higher-order-function spelling of [[lshBucketCol]] —
    * kept as the bitwise parity reference (HyperplaneSignatureSpec): the
    * native fused pass accumulates each plane's projection in the same
    * element order, so signatures are identical; interpreted per-element
    * lambdas × nplanes made this the banding scans' hot path. */
  def lshBucketColHof(embCol: Column, nplanes: Int, dim: Int): Column = {
    val sig = (0 until nplanes).map { p =>
      val coefs = array((0 until dim).map(i => lit(planeCoef(p, i))): _*)
      val proj = aggregate(
        zip_with(embCol, coefs, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }
    sig.reduce(_ + _)
  }

  /** (resolved input files) → embedding width: the probe is a driver
    * round-trip (head() job), and the width of a file-backed table never
    * changes mid-session — cache it so each query invocation doesn't
    * re-run a 1-row Spark job just to size the literal coefficient
    * arrays. Keyed by the scan's resolved file set: plan strings don't
    * include paths (two warehouses with the same schema stringify
    * identically) and hashes can collide — either would silently size
    * the arrays wrong. Frames with no input files (in-memory test
    * fixtures) skip the cache and just probe: correctness over a saved
    * 1-row job. */
  private val dimCache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** The embedding width — one (cached per file set) head() probe, used
    * to size the literal coefficient arrays. */
  def embeddingDim(emb: DataFrame): Int = {
    // first NON-NULL row: a NULL-vector row sorting first must not NPE
    // the probe, and a degenerate corpus (empty / all-NULL) degrades to
    // width 0 rather than throwing — every consumer then produces the
    // zero-row / bucket-0 shape the oracle's NULL-width SQL does
    def probe(): Int = emb.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val files = emb.inputFiles
    if (files.isEmpty) probe()
    else dimCache.computeIfAbsent(files.sorted.mkString(","), _ => Int.box(probe()))
  }

  def lshBuckets(emb: DataFrame, nplanes: Int = 8): DataFrame =
    emb.select(col("vec_id"), col("label"),
      lshBucketCol(col("embedding"), nplanes, embeddingDim(emb)).as("bucket"))

  /** Bucket histogram — the observable artifact of LSH bucketing. */
  def lshBucketStats(s: SparkSession, d: String): DataFrame =
    lshBuckets(embeddings(s, d))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), countDistinct(col("label")).as("n_labels"))

  /**
   * Lloyd k-means over the embedding corpus — the trained-cells
   * counterpart of [[ivfTopK]]'s hyperplane cells (on a real clustered
   * corpus this is how IVF cells are fit; the routing/probing machinery is
   * shared). Deterministic and fully oracle-checkable BY CONSTRUCTION:
   *  - init: cell = vec_id % k (stable, engine-independent);
   *  - centroids: the decimal-summed [[centroids]] (order-independent);
   *  - assignment: argmax cosine with the comparison key ROUNDED to 12 dp
   *    and ties broken by lowest cell — a 1-ulp double divergence between
   *    engines cannot flip an assignment unless two cells are genuinely
   *    equidistant, which rounding + the tie-break resolves identically.
   * A FIXED iteration count (no convergence probe) keeps the plan static:
   * `iters` chained broadcast-join + aggregate rounds, no driver loop
   * state. 100 TB posture: per iteration the corpus is scored map-side
   * against k broadcast centroids, and the argmax is a `min(struct)`
   * aggregate — the ×k scored stream collapses back to one row per vector
   * in the map-side partials (no window sort of the corpus); the centroid
   * aggregates shuffle k×dim rows, independent of corpus size.
   */
  def kmeansCells(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    var assigned = emb.withColumn("cell", pmod(col("vec_id"), lit(k.toLong)))
    (1 to iters).foreach { _ =>
      assigned = assignCells(assigned.drop("cell"), centroids(assigned))
    }
    assigned
  }

  /**
   * Assign each vector its argmax-cosine cell from `cents`
   * (cell, centroid) — one Lloyd assignment step, shared by the training
   * loop and the incremental index-maintenance path
   * ([[graft.streaming.StreamingCorpus]]: new embeddings scored against a
   * FROZEN codebook). Deterministic: 12-dp-rounded keys, ties to lowest
   * cell. The argmax is a lexicographic `min(struct)` — the ×k scored
   * stream collapses in map-side partials, no window sort; label and
   * embedding ride along (identical across a vector's k candidate rows,
   * so they never decide the compare).
   */
  def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    emb
      .join(broadcast(cents.select(col("cell").as("c_cell"), col("centroid"))))
      // undefined cosine (zero-magnitude vector OR centroid) loses to any
      // real score: -2 < cos ∈ [-1,1], matching the oracle's NULLS-LAST
      // DESC ordering; an all-undefined row still ties deterministically
      // to the lowest cell
      .withColumn("c_cos",
        coalesce(round(cosineNative(col("embedding"), col("centroid")), 12),
          lit(-2.0d)))
      .groupBy(col("vec_id"))
      .agg(min(struct((-col("c_cos")).as("neg"), col("c_cell").as("cell"),
        col("label").as("label"), col("embedding").as("embedding"))).as("b"))
      .select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.label").as("label"), col("b.cell").as("cell"))

  /**
   * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication"): cluster the embedding
   * corpus with k-means, then within each cluster drop every vector whose
   * cosine to a LOWER-id member reaches `threshold` — semantic near-dups
   * that text-level dedup (shingles, simhash) cannot see. The keep-lowest
   * rule replaces the paper's greedy order-dependent sweep with the same
   * deterministic survivor convention as the exact/near-dup family
   * (q30/q81), so output is schedule- and engine-independent.
   *
   * Observable: per-cell member count, duplicate-pair count, dropped-vector
   * count and id checksum — value-oracle-checked against a full SQL replay
   * of both k-means iterations AND the pair sweep (q87).
   *
   * 100 TB posture: pair generation is an equi-join on `cell` — never
   * all-pairs across the corpus. Within-cell quadratic cost is the
   * algorithm's declared knob: k scales with the corpus (k ≈ n/target
   * cell size) so cell population stays bounded; the cells frame is
   * lazily checkpointed so the two k-means rounds run once, not once per
   * consumer branch. The demo threshold is low (fixture embeddings are
   * near-orthogonal, max within-cell cosine ≈ 0.47); on a real embedding
   * corpus the published operating point is ~0.95+ where the same plan
   * prunes far harder.
   */
  def semdedupStats(s: SparkSession, d: String, k: Int = 8, iters: Int = 2,
      threshold: Double = 0.35): DataFrame =
    semdedupStatsOf(embeddings(s, d), k, iters, threshold)

  /** [[semdedupStats]] over an arbitrary (vec_id, embedding, label) frame.
    *
    * `trainSampleMod` > 1 is the 100 TB training knob: Lloyd iterations run
    * on the deterministic 1/mod md5-bucket sample of the corpus (the
    * FAISS/IVF convention — codebooks are fit on a sample, never the full
    * collection) and only the single assignment pass touches every vector.
    * Identical vectors co-assign under ANY codebook (equal cosines, equal
    * tie-break), so duplicate detection is sample-independent; the default
    * mod=1 trains on everything, which is what the q87 oracle replays.
    * Pass mod>1 only for corpus-scale frames: a sample that misses every
    * vector would leave the codebook (and the assignment) empty.
    */
  def semdedupStatsOf(emb: DataFrame, k: Int, iters: Int,
      threshold: Double, trainSampleMod: Int = 1): DataFrame = {
    val cells = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      trainedCells(emb, k, iters, trainSampleMod)
        .select(col("cell"), col("vec_id"), col("embedding")), eager = false)
    val pairs = semanticPairs(cells, threshold)
    // ONE aggregate over the quadratic pair stream: feeding the dropped
    // stats from a second `pairs` branch would re-run the whole cosine
    // sweep (only the join-input exchanges are reused). A vector lives in
    // exactly one cell, so DISTINCT vec_b within the cell group is the
    // dropped set and its sum the checksum.
    cells.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .join(pairs.groupBy(col("cell")).agg(
          count(lit(1)).as("n_dup_pairs"),
          countDistinct(col("vec_b")).as("n_dropped"),
          sum_distinct(col("vec_b")).as("dropped_checksum")),
        Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("dropped_checksum"), lit(0L)).as("dropped_checksum"))
  }

  /** Cell assignment with the FAISS/IVF training convention shared by
    * [[semdedupStatsOf]] and [[protoPruneStatsOf]]: `trainSampleMod` > 1
    * fits the Lloyd codebook on the deterministic 1/mod md5-bucket sample
    * and only the single assignment pass touches every vector; mod = 1
    * trains on the full frame (what the q87/q92 oracles replay). */
  private def trainedCells(emb: DataFrame, k: Int, iters: Int,
      trainSampleMod: Int): DataFrame =
    if (trainSampleMod <= 1) kmeansCells(emb, k, iters)
    else {
      val sample = emb.filter(
        Sampling.idBucket(col("vec_id"), trainSampleMod.toLong) === 0)
      assignCells(emb, centroids(kmeansCells(sample, k, iters)))
    }

  /** Within-cell semantic near-dup pairs over a (cell, vec_id, embedding)
    * frame — the pure pair sweep shared by [[semdedupStatsOf]] and the
    * streaming semantic gate ([[graft.streaming.StreamingCorpus]]): an
    * equi-join on cell, 12-dp-rounded native cosine at `threshold`,
    * canonical vec_a < vec_b orientation. Order-independent by
    * construction, so stream and batch agree under any arrival order. */
  def semanticPairs(cells: DataFrame, threshold: Double): DataFrame = {
    val a = cells.select(col("cell"), col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val b = cells.select(col("cell"), col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      // rounded compare key, q83 convention: a 1-ulp cross-engine cosine
      // divergence cannot flip the threshold test
      .withColumn("cos", round(cosineNative(col("e_a"), col("e_b")), 12))
      .filter(col("cos") >= threshold)
      .select(col("cell"), col("vec_a"), col("vec_b"))
  }

  /**
   * q83: the k-means observable — per-cell membership count and a
   * decimal-exact member checksum (Σ over members of the vec's element
   * sum), plus the distinct labels landing in the cell. Checksums are
   * decimal-summed so the value is partition-order-independent; per-vec
   * element sums are sequential doubles (identical in both engines).
   */
  def kmeansCellStats(s: SparkSession, d: String, k: Int = 8, iters: Int = 2): DataFrame =
    kmeansCells(embeddings(s, d), k, iters)
      .withColumn("vec_sum",
        aggregate(col("embedding"), lit(0.0), (acc, v) => acc + v.cast("double")))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_members"),
        round(sum(col("vec_sum").cast("decimal(28,15)")).cast("double"), 6)
          .as("member_checksum"),
        countDistinct(col("label")).as("n_labels"))

  /**
   * D4-style prototype pruning (Tirumala et al. 2023, "D4: Improving LLM
   * Pretraining via Document De-Duplication and Diversification") — the
   * diversification half of the D4 recipe, composing with [[semdedupStats]]
   * (its deduplication half) over the same k-means codebook: rank each
   * cell's members by cosine to their OWN cell centroid and drop the most
   * prototypical `pruneNum/pruneDen` fraction. Points nearest the cluster
   * center are the most redundant with their neighbors, so pruning them
   * trades the least diversity for the most volume.
   *
   * Deterministic / oracle-exact: the prototype cosine is 12-dp-rounded
   * (q83's convention — a 1-ulp cross-engine divergence cannot reorder a
   * rank unless two members are genuinely equidistant, which the vec_id
   * tie-break resolves identically); the prune count is
   * floor(n_cell·pruneNum/pruneDen) in identical arithmetic both engines.
   *
   * 100 TB posture: the per-cell window is the declared knob shared with
   * SemDeDup — k scales with the corpus so cell population stays bounded
   * and no window partition grows with corpus size; centroids are a k-row
   * broadcast; the cells frame is lazily checkpointed so the two Lloyd
   * rounds run once across the centroid/score branches, not once per
   * consumer.
   */
  def protoPruneStats(s: SparkSession, d: String, k: Int = 8, iters: Int = 2,
      pruneNum: Int = 1, pruneDen: Int = 4): DataFrame =
    protoPruneStatsOf(embeddings(s, d), k, iters, pruneNum, pruneDen)

  /**
   * The full D4 recipe in ONE plan (Tirumala et al. 2023): SemDeDup's
   * within-cell semantic drop (keep-lowest, [[semanticPairs]]) followed by
   * prototype pruning of the SURVIVORS against centroids RECOMPUTED over
   * the survivor set — dedup first so near-duplicate mass cannot drag the
   * prototype ranking, which is the paper's stated ordering. Per-cell
   * accounting: original members, semantic drops, prototype prunes, kept
   * count and kept id checksum.
   *
   * Composite invariants (vs running the stages alone): the semantic
   * dropped set equals q87's; the prune count is floor(survivors·num/den).
   * The cells frame is lazily checkpointed so k-means runs once across
   * the pair sweep, the survivor anti-join, and the centroid recompute.
   */
  def d4PipelineStats(s: SparkSession, d: String, k: Int = 8, iters: Int = 2,
      threshold: Double = 0.35, pruneNum: Int = 1, pruneDen: Int = 4): DataFrame =
    d4PipelineStatsOf(embeddings(s, d), k, iters, threshold, pruneNum, pruneDen)

  /** [[d4PipelineStats]] over an arbitrary (vec_id, embedding, label)
    * frame. */
  def d4PipelineStatsOf(emb: DataFrame, k: Int, iters: Int,
      threshold: Double, pruneNum: Int, pruneDen: Int,
      trainSampleMod: Int = 1): DataFrame = {
    val cells = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      trainedCells(emb, k, iters, trainSampleMod)
        .select(col("cell"), col("vec_id"), col("embedding")),
      eager = false)
    val dropped = semanticPairs(cells, threshold)
      .select(col("vec_b").as("vec_id")).distinct()
    val survivors = cells.join(dropped, Seq("vec_id"), "left_anti")
    val byCell = Window.partitionBy(col("cell"))
    val flagged = survivors
      .join(broadcast(centroids(survivors)), Seq("cell"))
      .withColumn("pcos",
        round(cosineNative(col("embedding"), col("centroid")), 12))
      .withColumn("rk", row_number().over(
        byCell.orderBy(col("pcos").desc, col("vec_id"))))
      .withColumn("n_surv", count(lit(1)).over(byCell))
      .withColumn("pruned",
        col("rk") <= floor(col("n_surv") * lit(pruneNum) / lit(pruneDen.toDouble)))
    cells.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .join(flagged.groupBy(col("cell")).agg(
          count(lit(1)).as("n_survivors"),
          sum(when(col("pruned"), 1L).otherwise(0L)).as("n_proto_pruned"),
          coalesce(sum(when(!col("pruned"), col("vec_id"))), lit(0L))
            .as("kept_checksum")),
        // inner: keep-lowest guarantees every cell retains its lowest
        // member, so no cell vanishes from the survivor side
        Seq("cell"))
      .select(col("cell"), col("n_members"),
        (col("n_members") - col("n_survivors")).as("n_sem_dropped"),
        col("n_proto_pruned"),
        (col("n_survivors") - col("n_proto_pruned")).as("n_kept"),
        col("kept_checksum"))
  }

  /** [[protoPruneStats]] over an arbitrary (vec_id, embedding, label)
    * frame. `trainSampleMod` is the shared [[trainedCells]] scale knob. */
  def protoPruneStatsOf(emb: DataFrame, k: Int, iters: Int,
      pruneNum: Int, pruneDen: Int, trainSampleMod: Int = 1): DataFrame = {
    val cells = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      trainedCells(emb, k, iters, trainSampleMod)
        .select(col("cell"), col("vec_id"), col("embedding")),
      eager = false)
    val byCell = Window.partitionBy(col("cell"))
    cells
      .join(broadcast(centroids(cells)), Seq("cell"))
      .withColumn("pcos",
        round(cosineNative(col("embedding"), col("centroid")), 12))
      .withColumn("rk", row_number().over(
        byCell.orderBy(col("pcos").desc, col("vec_id"))))
      .withColumn("n_cell", count(lit(1)).over(byCell))
      .withColumn("pruned",
        col("rk") <= floor(col("n_cell") * lit(pruneNum) / lit(pruneDen.toDouble)))
      .groupBy(col("cell")).agg(
        count(lit(1)).as("n_members"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
        coalesce(sum(when(col("pruned"), col("vec_id"))), lit(0L))
          .as("pruned_checksum"),
        round(coalesce(sum(when(!col("pruned"),
            col("pcos").cast("decimal(28,15)"))), lit(0)).cast("double"), 6)
          .as("kept_cos_sum"))
  }

  // ---------------------------------------------------------------------
  // Product quantization (Jégou et al. 2011, "Product Quantization for
  // Nearest Neighbor Search") — the FAISS-scale vector representation.

  /** Native codegen'd squared L2 distance — the PQ training/assignment hot
    * path; see [[graft.functions.SquaredL2Distance]]. */
  def squaredL2Native(a: Column, b: Column): Column =
    graft.functions.SquaredL2Distance.squaredL2(a, b)

  /**
   * q102: Product-quantization codebook training. Each vector is split
   * into `m` subvectors; each subspace gets its own tiny k-means (k
   * codes, L2 metric — PQ is Euclidean, unlike the cosine IVF family),
   * so a vector compresses to m code bytes and asymmetric distances
   * become m table lookups. This is how a 100 TB embedding corpus
   * actually ships to an ANN serving tier: 64 float dims (256 B) → 4
   * codes (4 B) at the demo setting.
   *
   * Spark-first shape — ALL subspaces train in the SAME jobs: subvectors
   * live as (vec_id, sub, se) rows from one narrow `posexplode` map, so
   * each Lloyd iteration is ONE centroid aggregate keyed (sub, code,
   * dim) shuffling m·k·dsub rows (independent of corpus size) plus ONE
   * broadcast-join assignment scoring m·k candidates map-side — never a
   * per-subspace job loop, never a corpus-sized window. The argmin is a
   * lexicographic `min(struct)` collapsing in map-side partials.
   *
   * Deterministic / oracle-exact by the q83 conventions: init code =
   * vec_id % k; decimal-summed centroid means; 12-dp-rounded distance
   * compare keys; ties to lowest code. Subspace width is ceil(maxdim/m)
   * measured from the DATA (one scalar aggregate — the oracle replays
   * the same `max(len)` subquery), so ragged or narrow hostile fixtures
   * split identically on both engines. NULL embeddings yield NULL
   * subvectors which lose the argmin to any real candidate (sentinel
   * key) and fall out of distortion sums on both sides.
   *
   * Observable (q102): per (sub, code) — member count, decimal-summed
   * distortion (Σ of the final rounded squared distances), member id
   * checksum.
   */
  def pqStats(s: SparkSession, d: String, m: Int = 4, k: Int = 4,
      iters: Int = 2): DataFrame =
    pqStatsOf(embeddings(s, d), m, k, iters)

  /** [[pqStats]] over an arbitrary (vec_id, embedding) frame. */
  def pqStatsOf(emb: DataFrame, m: Int, k: Int, iters: Int,
      trainSampleMod: Int = 1): DataFrame =
    pqModel(emb, m, k, iters, trainSampleMod)
      .groupBy(col("sub"), col("code")).agg(
      count(lit(1)).as("n_members"),
      round(coalesce(sum(col("dist_raw").cast("decimal(28,15)")), lit(0))
        .cast("double"), 6).as("distortion"),
      sum(col("vec_id")).as("id_checksum"))

  /** The trained PQ code frame (vec_id, sub, se, code, dist_raw) after
    * `iters` joint-subspace Lloyd rounds — the shared core of the q102
    * observable and the q106 ADC search.
    *
    * `trainSampleMod` > 1 is the shared FAISS-convention scale knob
    * (same as [[trainedCells]]): each Lloyd round re-derives its input
    * through the plan, so training on the full frame re-scans the
    * corpus once per round — fine at fixture scale (and what the q102/
    * q106/q107 oracles replay at mod = 1), but at 100 TB the codebook is
    * fit on the deterministic 1/mod md5-bucket sample and only the ONE
    * closing assignment pass touches every vector. */
  /** max(size(embedding)) control-plane scalar, cached per input file set
    * (the [[embeddingDim]] / [[Tables.spread]] probe-cache discipline —
    * r19): every PQ-family query needs this ONE scalar before it can even
    * build its plan, and without the cache each of q102/q106/q107/q165/
    * q166 paid its own blocking aggregate job for a value that cannot
    * change mid-session. None = degenerate corpus (no rows, or every
    * embedding NULL) — the caller degrades to the empty typed frame,
    * mirroring the oracle's NULL-width collapse. In-memory frames (specs,
    * streaming state) have no file set and probe directly, uncached.
    *
    * INVARIANT (r20 ADVICE): the cache keys on the frame's inputFiles
    * alone, so every file-backed frame passed to a PQ-family `*Of` entry
    * must have the SAME max embedding width as the raw scan of those
    * files — a NULL-filter is fine (max ignores NULLs), but a caller
    * passing a genuinely narrowed subset (row-filtered to short vectors,
    * or width-transformed) would train with whichever frame probed
    * first. All current callers satisfy this; a future narrowed-subset
    * caller must probe uncached (strip the file set, e.g. via
    * localCheckpoint) or fold a plan digest into the key. The key also
    * carries no mtimes — rewriting a parquet in-session would serve the
    * stale width; Bench/Verify restart the JVM per run, so this is a
    * documented session-scope assumption, not an observable today. */
  private val maxDimCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Int]]()
  private def maxEmbeddingDim(emb: DataFrame): Option[Int] = {
    def probe(): Option[Int] = {
      val row = emb.agg(max(size(col("embedding")))).head()
      if (row.isNullAt(0)) None else Some(row.getInt(0))
    }
    val files = emb.inputFiles
    if (files.isEmpty) probe()
    else maxDimCache.computeIfAbsent(files.sorted.mkString(","), _ => probe())
  }

  private def pqModel(emb: DataFrame, m: Int, k: Int, iters: Int,
      trainSampleMod: Int = 1): DataFrame = {
    val widthOpt = maxEmbeddingDim(emb)
    val maxDim = widthOpt.getOrElse(0)
    val degenerate = widthOpt.isEmpty
    val dsub = math.max((maxDim + m - 1) / m, 1)
    val slices = array((0 until m).map(i =>
      slice(col("embedding"), i * dsub + 1, dsub)): _*)
    def subvecs(e: DataFrame) =
      e.select(col("vec_id"), posexplode(slices).as(Seq("sub", "se")))
        .withColumn("sub", col("sub").cast("long"))
    def lloyd(sv0: DataFrame): DataFrame = {
      var assigned = sv0.withColumn("code", pmod(col("vec_id"), lit(k.toLong)))
        .withColumn("dist_raw", lit(null).cast("double"))
      (1 to iters).foreach { _ =>
        assigned = pqAssign(assigned.drop("code", "dist_raw"),
          pqCentroids(assigned))
      }
      assigned
    }
    if (degenerate)
      subvecs(emb.limit(0))
        .withColumn("code", pmod(col("vec_id"), lit(k.toLong)))
        .withColumn("dist_raw", lit(null).cast("double"))
    else if (trainSampleMod <= 1) lloyd(subvecs(emb))
    else {
      val sample = emb.filter(
        Sampling.idBucket(col("vec_id"), trainSampleMod.toLong) === 0)
      pqAssign(subvecs(emb), pqCentroids(lloyd(subvecs(sample))))
    }
  }

  /**
   * q106: ADC (asymmetric distance computation) top-k search over the
   * PQ-compressed corpus — the serving-side half of the FAISS IVF-PQ
   * recipe: the corpus exists only as m code bytes per vector; a query
   * precomputes its distance to every (sub, code) centroid (an m·k
   * lookup table) and any corpus vector's approximate distance is the
   * sum of m table entries. The codebook is the post-Lloyd centroid
   * update over the final codes (train `iters` rounds, then one
   * closing update — the textbook sequence).
   *
   * 100 TB posture: the code frame is lazily checkpointed so the Lloyd
   * rounds run once across the codebook and scoring branches; the
   * distance table (queries × m·k rows) broadcasts; scoring is a
   * map-side equi-join on (sub, code) whose per-(query, vec) partial
   * sums collapse map-side; the per-query top-k is the bounded-heap
   * aggregate (k rows per partition shuffle, never a corpus sort).
   * NULL embeddings drop from both the corpus and the query set — a
   * code assigned by the sentinel tie-break is bookkeeping, not
   * geometry, so it must not fabricate neighbors.
   */
  def pqAdcTopK(s: SparkSession, d: String, m: Int = 4, k: Int = 4,
      iters: Int = 2, topk: Int = 5, stride: Long = 100): DataFrame =
    pqAdcTopKOf(embeddings(s, d), m, k, iters, topk, stride)

  /** [[pqAdcTopK]] over an arbitrary (vec_id, embedding) frame. */
  def pqAdcTopKOf(emb: DataFrame, m: Int, k: Int, iters: Int,
      topk: Int, stride: Long, trainSampleMod: Int = 1): DataFrame = {
    val codes = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      pqModel(emb, m, k, iters, trainSampleMod).filter(col("se").isNotNull)
        .select(col("vec_id"), col("sub"), col("se"), col("code")),
      eager = false)
    val codebook = pqCentroids(codes) // closing centroid update, m·k rows
    val queries = codes.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("sub"), col("se"))
    val dtab = queries.join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("c_code").as("code"),
        round(squaredL2Native(col("se"), col("centroid")), 12).as("qd"))
    val scored = codes.select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
      .join(broadcast(dtab), Seq("sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("qd").cast("decimal(28,15)")).cast("double"), 6)
        .as("adc_dist"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopK.topK(topk)(
        -col("adc_dist"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        round(-col("s.score"), 6).as("adc_dist"), (col("idx") + 1).as("rn"))
  }

  /** Encode vectors against a FROZEN PQ codebook (sub, c_code, centroid)
    * — the incremental-indexing path ([[graft.streaming.StreamingCorpus]]
    * `startPqIndex`): new embeddings become m code bytes with the exact
    * argmin/tie-break of training-time assignment, so stream and batch
    * codes agree under any arrival order. `m`/`dsub` are the frozen
    * model's config (a codebook ships with its slicing). NULL embeddings
    * are excluded — a sentinel code is bookkeeping, not geometry. */
  def pqEncode(emb: DataFrame, codebook: DataFrame, m: Int, dsub: Int): DataFrame = {
    val slices = array((0 until m).map(i =>
      slice(col("embedding"), i * dsub + 1, dsub)): _*)
    val sv = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), posexplode(slices).as(Seq("sub", "se")))
      .withColumn("sub", col("sub").cast("long"))
    pqAssign(sv, codebook).select(col("vec_id"), col("sub"), col("code"))
  }

  /** The trained ADC codebook: `iters` Lloyd rounds then the closing
    * centroid update over the final codes — q106's model, exposed for
    * freezing into the streaming index. */
  def pqCodebook(emb: DataFrame, m: Int, k: Int, iters: Int,
      trainSampleMod: Int = 1): DataFrame =
    pqCentroids(pqModel(emb, m, k, iters, trainSampleMod)
      .filter(col("se").isNotNull))

  /**
   * q107: recall@k of the ADC (PQ-compressed) search against the exact
   * L2 ground truth, measured distributedly — the accuracy observable
   * every production ANN deployment tracks next to its latency. Per
   * query: hits (|ADC top-k ∩ exact top-k|) and recall = hits/k.
   *
   * Both rankings share the deterministic conventions (12-dp-rounded
   * distances, id tie-breaks), so the intersection — and therefore the
   * hash-checked recall — is engine-independent even at tie boundaries.
   *
   * 100 TB posture: the exact side is the brute-force pattern (corpus
   * never shuffles — queries broadcast, scoring map-side, bounded-heap
   * top-k); the ADC side is q106's lookup join; the final intersection
   * joins two |Q|·k-row streams. Computing ground truth on EVERY query
   * is a fixture-scale luxury — at corpus scale the stride knob samples
   * the query set, which is exactly how recall is audited in practice.
   *
   * Expect LOW recall on the demo fixture: near-orthogonal random
   * vectors are PQ's worst case (no cluster structure to compress), and
   * the demo m=4/k=4 codebook is 16 cells of resolution where FAISS
   * production uses k=256 per subspace. The m=1/k=n exactness envelope
   * (PqSpec: recall ≡ 1.0) pins that the machinery is correct; the
   * audited number is the honest operating point of the chosen knobs.
   */
  def pqRecallStats(s: SparkSession, d: String, m: Int = 4, k: Int = 4,
      iters: Int = 2, topk: Int = 5, stride: Long = 100): DataFrame =
    pqRecallStatsOf(embeddings(s, d), m, k, iters, topk, stride)

  /** [[pqRecallStats]] over an arbitrary (vec_id, embedding) frame. */
  def pqRecallStatsOf(emb: DataFrame, m: Int, k: Int, iters: Int,
      topk: Int, stride: Long, trainSampleMod: Int = 1): DataFrame = {
    val live = emb.filter(col("embedding").isNotNull)
    val adc = pqAdcTopKOf(live, m, k, iters, topk, stride, trainSampleMod)
      .select(col("query_id"), col("neighbor_id"))
    val queries = live.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exact = live
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", round(squaredL2Native(col("q_emb"), col("c_emb")), 12))
      .groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopK.topK(topk)(
        -col("d2"), col("neighbor_id")).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("neighbor_id"))
    val hits = adc.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
    // left join from the query list: a zero-overlap query must report
    // recall 0, not vanish from the audit
    adc.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double") / topk, 6).as("recall"))
  }

  /**
   * q165: IVF-ADC top-k search — the FULL FAISS IVFPQ serving recipe in
   * one plan, composing the two halves the engine already audits
   * separately: IVF routing (q37/q110's hyperplane cells + centroid
   * probe) prunes the candidate set to `nprobe` cells, and ADC (q106's
   * distance-table lookup join) scores ONLY those cells' PQ codes. This
   * is the spelling a production retriever actually runs at 100 TB:
   * per-query cost = (nprobe/ncells)·corpus code rows, the corpus
   * exists as m code bytes per vector, and no full-precision vector is
   * touched after indexing.
   *
   * 100 TB shape: centroids are 2^nplanes broadcast rows; the probe
   * table (|Q|·nprobe rows) and the distance table (|Q|·m·k rows)
   * broadcast; candidate restriction is a hash equi-join on `cell`,
   * scoring a map-side equi-join on (query, sub, code); per-query
   * partial sums collapse map-side and the bounded-heap top-k keeps the
   * shuffle at k rows per partition — no corpus sort, no pair stream
   * beyond the probed-cell candidates.
   *
   * Approximate by exactly the two documented trades (a neighbor in an
   * unprobed cell; PQ quantization error) — [[ivfAdcRecallStats]]
   * (q166) prices their composition per query; probing ALL cells
   * recovers plain ADC bit-for-bit (the exactness envelope pinned in
   * PqSpec's q165 sibling test).
   */
  def ivfAdcTopK(s: SparkSession, d: String, m: Int = 4, k: Int = 4,
      iters: Int = 2, topk: Int = 5, stride: Long = 100,
      nprobe: Int = 4, nplanes: Int = 3): DataFrame =
    ivfAdcTopKOf(embeddings(s, d), m, k, iters, topk, stride, nprobe, nplanes)

  /** [[ivfAdcTopK]] over an arbitrary (vec_id, embedding) frame.
    * `trainSampleMod` is the shared FAISS-convention scale knob (see
    * [[pqModel]]): at 100x the codebook trains on the deterministic
    * 1/mod sample and only the closing assignment touches every vector. */
  def ivfAdcTopKOf(emb: DataFrame, m: Int, k: Int, iters: Int,
      topk: Int, stride: Long, nprobe: Int, nplanes: Int,
      trainSampleMod: Int = 1): DataFrame = {
    val dim = embeddingDim(emb)
    // IVF side: cells + centroids over the full frame (NULL embeddings
    // land in cell 0 but carry no codes, so they can never score)
    val celled = emb.withColumn("cell", lshBucketCol(col("embedding"), nplanes, dim))
    val cents = centroids(celled)
    val queries = celled.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // ADC side: q106's pinned code frame + closing codebook + distance
    // table, restricted to the probed cells before any scoring work
    val codes = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      pqModel(emb, m, k, iters, trainSampleMod).filter(col("se").isNotNull)
        .select(col("vec_id"), col("sub"), col("se"), col("code")),
      eager = false)
    val codebook = pqCentroids(codes)
    val qsub = codes.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("sub"), col("se"))
    ivfAdcServeOf(
      codes.select(col("vec_id"), col("sub"), col("code")),
      celled.select(col("vec_id"), col("cell")),
      queries, qsub, codebook, cents, topk, nprobe)
  }

  /**
   * The SERVING half of q165, factored over explicit index state — what
   * a production retriever runs per query batch once the index exists:
   * route each query to its `nprobe` best cells against the (frozen)
   * routing centroids, broadcast its m·k ADC distance table, score only
   * the probed cells' code rows, bounded-heap top-k. Batch
   * [[ivfAdcTopKOf]] is train + THIS; the streaming composed gate
   * ([[graft.streaming.StreamingCorpus.startIvfAdcIndex]]) maintains
   * (codes, cells, queries) incrementally against a frozen
   * [[IvfAdcIndexModel]] and serves THIS over its state — so gate ≡
   * batch is equality of inputs, not a parallel re-implementation.
   *
   * Inputs: `codes` (vec_id, sub, code) — the PQ-compressed corpus;
   * `cells` (vec_id, cell) — the IVF assignment; `queries`
   * (query_id, q_emb) and `qsub` (query_id, sub, se) — the query set's
   * raw vectors and subvectors (queries stay full-precision in ADC —
   * only the corpus is compressed); `codebook`/`cents` — the trained
   * model. A NULL-embedding query row may appear in `queries` (it routes
   * but has no `qsub` rows) and contributes no output, matching the
   * trained batch spelling.
   */
  def ivfAdcServeOf(codes: DataFrame, cells: DataFrame, queries: DataFrame,
      qsub: DataFrame, codebook: DataFrame, cents: DataFrame,
      topk: Int, nprobe: Int): DataFrame = {
    val routed = queries.join(broadcast(cents))
      .withColumn("c_cos", cosineNative(col("q_emb"), col("centroid")))
    val probes = routed.withColumn("pr", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("c_cos").desc, col("cell"))))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("cell"))
    val dtab = qsub.join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("c_code").as("code"),
        round(squaredL2Native(col("se"), col("centroid")), 12).as("qd"))
    val cellOf = cells.select(col("vec_id").as("neighbor_id"), col("cell"))
    val scored = codes
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
      .join(cellOf, Seq("neighbor_id"))
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(dtab), Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("qd").cast("decimal(28,15)")).cast("double"), 6)
        .as("adc_dist"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopK.topK(topk)(
        -col("adc_dist"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        round(-col("s.score"), 6).as("adc_dist"), (col("idx") + 1).as("rn"))
  }

  /**
   * The frozen model bundle for the online composed IVF-ADC gate —
   * everything [[ivfAdcServeOf]] and incremental indexing need, trained
   * once from a corpus snapshot (the q123/q156/startPqIndex frozen-model
   * discipline; retraining is a batch event that rebuilds the index).
   *
   * `assignCodebook` is the codebook the FINAL [[pqModel]] assignment
   * scored against (the centroids after iters−1 Lloyd rounds):
   * [[pqEncode]] against it reproduces a training vector's
   * training-final code EXACTLY, which is what makes the incrementally
   * maintained code table equal batch q165's — encoding against the
   * closing `adcCodebook` would re-assign boundary vectors.
   * `adcCodebook` is the closing centroid update (what distance tables
   * are built from, the textbook ADC convention); `cents` the IVF
   * routing centroids over the snapshot; `dsub`/`dim` the frozen
   * slicing/plane geometry (a codebook ships with its slicing).
   */
  final case class IvfAdcIndexModel(
      assignCodebook: DataFrame, adcCodebook: DataFrame, cents: DataFrame,
      m: Int, dsub: Int, nplanes: Int, dim: Int)

  /** Train an [[IvfAdcIndexModel]] from a corpus snapshot. */
  def ivfAdcFreeze(emb: DataFrame, m: Int = 4, k: Int = 4, iters: Int = 2,
      nplanes: Int = 3): IvfAdcIndexModel = {
    val dim = embeddingDim(emb)
    val celled = emb.withColumn("cell",
      lshBucketCol(col("embedding"), nplanes, dim))
    val maxDim = maxEmbeddingDim(emb).getOrElse(0)
    val dsub = math.max((maxDim + m - 1) / m, 1)
    IvfAdcIndexModel(
      pqAssignCodebook(emb, m, k, iters, dsub),
      pqCodebook(emb, m, k, iters),
      centroids(celled), m, dsub, nplanes, dim)
  }

  /** The codebook [[pqModel]]'s FINAL assignment pass scored against —
    * iters−1 Lloyd rounds from the deterministic init, then the centroid
    * update. Encoding the training corpus against it with [[pqEncode]]
    * reproduces the training-final codes bit-for-bit (same argmin, same
    * sentinel tie-break). */
  private def pqAssignCodebook(emb: DataFrame, m: Int, k: Int, iters: Int,
      dsub: Int): DataFrame = {
    val slices = array((0 until m).map(i =>
      slice(col("embedding"), i * dsub + 1, dsub)): _*)
    val sv = emb.select(col("vec_id"), posexplode(slices).as(Seq("sub", "se")))
      .withColumn("sub", col("sub").cast("long"))
    var assigned = sv.withColumn("code", pmod(col("vec_id"), lit(k.toLong)))
    (1 until iters).foreach { _ =>
      assigned = pqAssign(assigned.drop("code"), pqCentroids(assigned))
        .drop("dist_raw")
    }
    pqCentroids(assigned)
  }

  /**
   * q166: recall@k of the composed IVF-ADC search against the exact L2
   * ground truth — the q107/q110/q122 approximation-honesty discipline
   * applied to the COMPOSITION: routing loss × quantization loss is not
   * the product of the two audited separately (a PQ-misranked neighbor
   * can hide routing luck and vice versa), so the production spelling
   * gets its own per-query audit.
   */
  def ivfAdcRecallStats(s: SparkSession, d: String, m: Int = 4, k: Int = 4,
      iters: Int = 2, topk: Int = 5, stride: Long = 100,
      nprobe: Int = 4, nplanes: Int = 3, trainSampleMod: Int = 1): DataFrame = {
    val emb = embeddings(s, d)
    val approx = ivfAdcTopKOf(emb, m, k, iters, topk, stride, nprobe, nplanes,
      trainSampleMod)
      .select(col("query_id"), col("neighbor_id"))
    val live = emb.filter(col("embedding").isNotNull)
    val queries = live.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exact = live
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", round(squaredL2Native(col("q_emb"), col("c_emb")), 12))
      .groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopK.topK(topk)(
        -col("d2"), col("neighbor_id")).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("neighbor_id"))
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
    approx.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double") / topk, 6).as("recall"))
  }

  /**
   * q108: embedding isotropy / collapse dashboard. Per label: vector
   * count, mean cosine to the GLOBAL centroid, mean norm. A healthy
   * embedding space is near-isotropic (mean centroid-cosine ≈ 0 for
   * centered spaces); representation collapse — the classic failure of
   * a degenerating encoder — shows up as the mean cosine drifting
   * toward 1 and the norm spread shrinking. Cheap enough to run as a
   * standing audit next to the ANN indexes at any corpus size.
   *
   * Shape: global centroid = one decimal-summed element-mean aggregate
   * (dim rows), broadcast back as a single row; per-vector cosine/norm
   * are map-side; the per-label aggregate is map-side-combined. Zero
   * vectors have undefined cosine (NULL, the engine-wide convention —
   * DuckDB's NULL-on-division-by-zero matches) and drop from the cosine
   * mean but keep their norm contribution.
   */
  def isotropyStats(s: SparkSession, d: String): DataFrame =
    isotropyStatsOf(embeddings(s, d))

  /** [[isotropyStats]] over an arbitrary (vec_id, embedding, label)
    * frame. */
  def isotropyStatsOf(emb: DataFrame): DataFrame = {
    val live = emb.filter(col("embedding").isNotNull)
    val gc = live
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg((sum(col("v").cast("decimal(28,15)")).cast("double") /
        count(col("v"))).as("mean_v"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean_v")))).as("pairs"))
      .select(transform(col("pairs"), p => p.getField("mean_v")).as("centroid"))
    live.join(broadcast(gc))
      .withColumn("cos", round(cosineNative(col("embedding"), col("centroid")), 12))
      .withColumn("nrm", round(norm(col("embedding")), 12))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("cos").cast("decimal(28,15)")).cast("double") /
          count(col("cos")), 6).as("avg_cos_centroid"),
        round(sum(col("nrm").cast("decimal(28,15)")).cast("double") /
          count(col("nrm")), 6).as("avg_norm"))
  }

  /** Per-(sub, code) centroid: decimal-summed element means over the
    * exploded (sub, code, dim, v) stream — m·k·dsub aggregate rows total,
    * independent of corpus size. NULL/empty subvectors contribute no
    * element rows (posexplode of NULL is empty), matching the oracle's
    * unnest. */
  private def pqCentroids(sv: DataFrame): DataFrame =
    sv.select(col("sub"), col("code"), posexplode(col("se")).as(Seq("dim", "v")))
      .groupBy(col("sub"), col("code"), col("dim"))
      .agg((sum(col("v").cast("decimal(28,15)")).cast("double") /
        count(col("v"))).as("mean_v"))
      .groupBy(col("sub"), col("code"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean_v")))).as("pairs"))
      .select(col("sub"), col("code").as("c_code"),
        transform(col("pairs"), p => p.getField("mean_v")).as("centroid"))

  /** One PQ assignment step: m·k broadcast centroids scored map-side with
    * the native squared-L2, argmin per (vec_id, sub) as a `min(struct)`
    * collapsing in map-side partials. A NULL subvector scores NULL and
    * takes the sentinel compare key (loses to any real distance, ties to
    * the lowest code) — the oracle's `NULLS LAST, code` ordering. */
  private def pqAssign(sv: DataFrame, cents: DataFrame): DataFrame =
    sv.join(broadcast(cents), Seq("sub"))
      .withColumn("c_dist", round(squaredL2Native(col("se"), col("centroid")), 12))
      .withColumn("c_key", coalesce(col("c_dist"), lit(Double.MaxValue)))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("c_key").as("key"), col("c_code").as("code"),
        col("c_dist").as("dist"), col("se").as("se"))).as("b"))
      .select(col("vec_id"), col("sub"), col("b.se").as("se"),
        col("b.code").as("code"), col("b.dist").as("dist_raw"))

  /** Mean of a BoundedTopK result's scores, summed IN RANK ORDER (array
    * fold, not an unordered aggregate) so both engines add the same floats
    * in the same sequence — the determinism rule the margin ratio needs. */
  private def orderedTopAvg(top: Column): Column =
    aggregate(top, lit(0.0), (acc, e) => acc + e.getField("score")) / size(top)

  /**
   * q137: margin-based bitext mining (Artetxe & Schwenk 2019; the CCMatrix
   * selection rule). Sides are the odd/even `label` halves of the
   * embedding space standing in for two languages. For each strided source
   * vector: its top-k cosine neighbors on the target side; the candidate
   * pair is the rank-1 neighbor, scored by the RATIO margin
   * `cos(x,y) / ((avgTopK(x) + avgTopK(y)) / 2)` — a pair only counts as
   * parallel when it stands out from BOTH endpoints' neighborhoods, which
   * kills the hub vectors that plain cosine thresholds mis-mine.
   *
   * Scale shape: both scoring passes are bounded broadcasts against a
   * one-direction scan — the strided query set forward, the (≤ k·queries)
   * candidate set backward; the corpus side never shuffles, per-endpoint
   * state is a k-heap. At 100 TB the same two passes route through the IVF
   * cells (q37/q121's machinery) instead of the full scan; this is the
   * exact-scoring form the routed variant is audited against, like
   * q110/q122. Margin math runs on 6-dp-rounded cosines and rank-ordered
   * top-k sums, so the accept verdict is engine-exact.
   */
  def bitextMarginMining(s: SparkSession, d: String, k: Int = 4,
      stride: Long = 20, accept: Double = 1.05): DataFrame = {
    val emb = embeddings(s, d)
      .filter(col("label").isNotNull && col("embedding").isNotNull)
    val srcSide = emb.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding").as("s_emb"))
    val tgtSide = emb.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("embedding").as("t_emb"))
    val queries = srcSide.filter(col("src_id") % stride === 0)

    val fwd = tgtSide.join(broadcast(queries))
      .withColumn("cosine", cosineNative(col("s_emb"), col("t_emb")))
      .filter(col("cosine").isNotNull)
      .groupBy(col("src_id"))
      .agg(graft.functions.BoundedTopK.topK(k)(col("cosine"), col("tgt_id")).as("top"))
      .withColumn("src_avg", round(orderedTopAvg(col("top")), 6))

    // every forward neighbor needs its own-neighborhood average: ≤ k·|queries|
    // candidates, re-armed with their vectors and broadcast over the source scan
    val cands = fwd.select(explode(col("top.id")).as("tgt_id")).distinct()
      .join(tgtSide, Seq("tgt_id"))
    val back = srcSide.join(broadcast(cands))
      .withColumn("cosine", cosineNative(col("t_emb"), col("s_emb")))
      .filter(col("cosine").isNotNull)
      .groupBy(col("tgt_id"))
      .agg(graft.functions.BoundedTopK.topK(k)(col("cosine"), col("src_id")).as("btop"))
      .select(col("tgt_id"), round(orderedTopAvg(col("btop")), 6).as("tgt_avg"))

    fwd.select(col("src_id"), col("src_avg"),
        col("top")(0).getField("id").as("tgt_id"),
        round(col("top")(0).getField("score"), 6).as("cosine"))
      .join(broadcast(back), Seq("tgt_id")) // candidate-sized by construction
      .withColumn("margin",
        round(col("cosine") / ((col("src_avg") + col("tgt_avg")) / 2), 6))
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"),
        (col("margin") >= accept).as("accepted"))
  }

  /**
   * q142: the ROUTED spelling of [[bitextMarginMining]] — the form a
   * 100 TB miner actually runs (the q121 discipline): each side is
   * cell-indexed by the hyperplane signature, queries route to their
   * `nprobe` nearest TARGET-side centroids, forward candidates route back
   * to SOURCE-side centroids, and both scoring passes scan only probed
   * cells via the cell equi-join — per-query cost bounded by cell mass,
   * never corpus mass. Same margin algebra as the exact pass; q143 audits
   * what the pruning costs.
   */
  def ivfBitextMarginMining(s: SparkSession, d: String, k: Int = 4,
      stride: Long = 20, nprobe: Int = 2, nplanes: Int = 3,
      accept: Double = 1.05): DataFrame = {
    val base = embeddings(s, d)
      .filter(col("label").isNotNull && col("embedding").isNotNull)
    val dim = embeddingDim(embeddings(s, d))
    val emb = base.withColumn("cell", lshBucketCol(col("embedding"), nplanes, dim))
    val srcSide = emb.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding").as("s_emb"), col("cell"))
    val tgtSide = emb.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("embedding").as("t_emb"), col("cell"))
    // per-side centroid tables: ≤ 2^nplanes rows each, broadcast
    val tgtCents = centroids(tgtSide.select(col("cell"), col("t_emb").as("embedding")))
    val srcCents = centroids(srcSide.select(col("cell"), col("s_emb").as("embedding")))

    val queries = srcSide.filter(col("src_id") % stride === 0)
      .select(col("src_id"), col("s_emb"))
    val wf = Window.partitionBy(col("src_id")).orderBy(col("c_cos").desc, col("cell"))
    val fProbes = queries.join(broadcast(tgtCents))
      .withColumn("c_cos", cosineNative(col("s_emb"), col("centroid")))
      .withColumn("pr", row_number().over(wf))
      .filter(col("pr") <= nprobe)
      .select(col("src_id"), col("s_emb"), col("cell"))
    val fwd = tgtSide.join(broadcast(fProbes), Seq("cell"))
      .withColumn("cosine", cosineNative(col("s_emb"), col("t_emb")))
      .filter(col("cosine").isNotNull)
      .groupBy(col("src_id"))
      .agg(graft.functions.BoundedTopK.topK(k)(col("cosine"), col("tgt_id")).as("top"))
      .withColumn("src_avg", round(orderedTopAvg(col("top")), 6))

    val cands = fwd.select(explode(col("top.id")).as("tgt_id")).distinct()
      .join(tgtSide, Seq("tgt_id"))
      .select(col("tgt_id"), col("t_emb"))
    val wb = Window.partitionBy(col("tgt_id")).orderBy(col("c_cos").desc, col("cell"))
    val bProbes = cands.join(broadcast(srcCents))
      .withColumn("c_cos", cosineNative(col("t_emb"), col("centroid")))
      .withColumn("pr", row_number().over(wb))
      .filter(col("pr") <= nprobe)
      .select(col("tgt_id"), col("t_emb"), col("cell"))
    val back = srcSide.join(broadcast(bProbes), Seq("cell"))
      .withColumn("cosine", cosineNative(col("t_emb"), col("s_emb")))
      .filter(col("cosine").isNotNull)
      .groupBy(col("tgt_id"))
      .agg(graft.functions.BoundedTopK.topK(k)(col("cosine"), col("src_id")).as("btop"))
      .select(col("tgt_id"), round(orderedTopAvg(col("btop")), 6).as("tgt_avg"))

    fwd.select(col("src_id"), col("src_avg"),
        col("top")(0).getField("id").as("tgt_id"),
        round(col("top")(0).getField("score"), 6).as("cosine"))
      .join(broadcast(back), Seq("tgt_id")) // candidate-sized by construction
      .withColumn("margin",
        round(col("cosine") / ((col("src_avg") + col("tgt_avg")) / 2), 6))
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"),
        (col("margin") >= accept).as("accepted"))
  }

  /**
   * q144: blocked kNN-graph construction — every vector's top-k cosine
   * neighbors WITHIN ITS HYPERPLANE CELL, plus the mutual-edge flag (the
   * reciprocal-kNN signal graph-clustering and SemDeDup-style pipelines
   * consume). The published blocked/LSH kNN-graph recipe: exact kNN is
   * corpus-quadratic, so candidates are restricted to the cell block and
   * the join is a cell-keyed equi-join — per-cell quadratic, never
   * corpus-quadratic; at 100 TB the cell count scales with `nplanes`
   * (≈ log2(corpus / target cell size)), keeping blocks bounded. The
   * symmetry pass (mutual flag) is a self-equi-join of the k-bounded edge
   * table on the reversed pair — edge-table-sized, not corpus-sized.
   *
   * Zero/NULL vectors have no defined cosine to anything and appear in
   * the graph neither as sources nor as neighbors.
   */
  def knnGraph(s: SparkSession, d: String, k: Int = 5,
      nplanes: Int = 3): DataFrame = {
    val base = embeddings(s, d).filter(col("embedding").isNotNull)
    val dim = embeddingDim(embeddings(s, d))
    val emb = base.withColumn("cell", lshBucketCol(col("embedding"), nplanes, dim))
    val left = emb.select(col("vec_id"), col("embedding").as("q_emb"), col("cell"))
    val right = emb.select(col("vec_id").as("nbr_id"),
      col("embedding").as("c_emb"), col("cell"))
    val scored = left.join(right, Seq("cell"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("cosine", cosineNative(col("q_emb"), col("c_emb")))
      .filter(col("cosine").isNotNull)
    val topk = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      scored.groupBy(col("vec_id"))
        .agg(graft.functions.BoundedTopK.topK(k)(col("cosine"), col("nbr_id")).as("top"))
        .select(col("vec_id"), posexplode(col("top")).as(Seq("idx", "e")))
        .select(col("vec_id"), col("e.id").as("nbr_id"),
          round(col("e.score"), 6).as("cosine"), (col("idx") + 1).as("rn")),
      eager = false)
    val reverse = topk.select(col("nbr_id").as("vec_id"),
      col("vec_id").as("nbr_id"), lit(1).as("rev"))
    topk.join(reverse, Seq("vec_id", "nbr_id"), "left")
      .select(col("vec_id"), col("nbr_id"), col("cosine"), col("rn"),
        col("rev").isNotNull.as("mutual"))
  }

  /**
   * q145: semantic clusters over the MUTUAL kNN graph (q144's reciprocal
   * edges) — connected components via the q74 star contraction, evaluated
   * by label purity: per cluster, its labeled-member count, distinct
   * labels, majority label and purity. The standard external-validation
   * table for embedding-space clustering (does the geometry rediscover
   * the labels?); unlabeled vectors ride the graph but cannot vote, so
   * stats cover labeled members (a cluster of only unlabeled members is
   * not evaluable and drops).
   *
   * Scale: mutual edges are k-bounded (≤ k·|corpus| rows), the
   * contraction is rounds-bounded (q74's machinery unchanged), per-label
   * aggregates are map-side; nothing corpus-quadratic anywhere.
   */
  def knnClusterPurity(s: SparkSession, d: String, k: Int = 5,
      nplanes: Int = 3): DataFrame = {
    val pairs = knnGraph(s, d, k, nplanes)
      .filter(col("mutual") && col("vec_id") < col("nbr_id"))
      .select(col("vec_id").as("doc_a"), col("nbr_id").as("doc_b"))
    val clusters = Dedup.duplicateClusters(pairs) // (doc_id, cluster_id)
    // (cluster, label) histogram feeds BOTH the majority window and the
    // totals — pin it so the contraction upstream runs once, not twice
    val perLabel = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      clusters
        .join(embeddings(s, d)
          .filter(col("label").isNotNull)
          .select(col("vec_id").as("doc_id"), col("label")), Seq("doc_id"))
        .groupBy(col("cluster_id"), col("label"))
        .agg(count(lit(1)).as("n")),
      eager = false)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n").desc, col("label"))
    val top = perLabel.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("label").as("top_label"),
        col("n").as("top_n"))
    perLabel.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_labels"), sum(col("n")).as("n_vecs"))
      .join(top, Seq("cluster_id"))
      .select(col("cluster_id"), col("n_vecs"), col("n_labels"),
        col("top_label"), col("top_n"),
        round(col("top_n").cast("double") / col("n_vecs"), 6).as("purity"))
  }

  /**
   * q143: routing-honesty audit for the bitext miner — per exact-side
   * query, did the cell-pruned pass (q142) mine the SAME pair the
   * exhaustive pass (q137) mined, and at what margin shift? The
   * q110/q122/q107 discipline applied to pair mining: every approximate
   * tier ships the table that says what the approximation costs. A query
   * the routed pass lost entirely (all probed cells empty) stays visible
   * with pair_hit 0.
   */
  def bitextRoutingRecall(s: SparkSession, d: String, k: Int = 4,
      stride: Long = 20, nprobe: Int = 2): DataFrame = {
    val exact = bitextMarginMining(s, d, k, stride)
      .select(col("src_id"), col("tgt_id").as("exact_tgt"),
        col("margin").as("exact_margin"))
    val routed = ivfBitextMarginMining(s, d, k, stride, nprobe)
      .select(col("src_id"), col("tgt_id").as("routed_tgt"),
        col("margin").as("routed_margin"))
    exact.join(routed, Seq("src_id"), "left")
      .select(col("src_id"), col("exact_tgt"), col("routed_tgt"),
        coalesce((col("routed_tgt") === col("exact_tgt")).cast("int"), lit(0))
          .as("pair_hit"),
        round(col("routed_margin") - col("exact_margin"), 6).as("margin_delta"))
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dataset-assembly operators for training-data pipelines: deterministic
 * train/val/test splitting, sequence-length binning, and train-vs-benchmark
 * contamination detection. All pure column expressions over the `documents`
 * fixture — no sampling RNG state, no UDFs, nothing driver-side.
 *
 * Determinism: split assignment hashes the stable doc id through the same
 * md5-hex-prefix trick as [[Dedup.mdHash60]], so (a) assignment is stable
 * across runs/engines — re-shuffling the corpus can never move a document
 * between train and test — and (b) the DuckDB oracle reproduces every
 * query bit-for-bit.
 *
 * 100 TB posture: split/bin are map-side column adds (zero shuffle until
 * the final tiny aggregate); contamination joins shuffle on a 128-bit
 * content hash, never the document body.
 */
object Sampling {

  /** Stable per-doc bucket in [0, `mod`) from the md5 of the id — THE
    * deterministic-lottery idiom shared by splits (mod 100), mixture
    * thresholds (mod 1e6, [[temperatureMixture]]) and the classifier
    * re-admission lottery ([[TextStats.classifierScores]]); one
    * definition so a hash-family swap cannot fork the convention. */
  def idBucket(idCol: Column, mod: Long): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % mod

  /** Stable per-doc bucket in [0, 100) from the md5 of the id. */
  def splitBucket(idCol: Column): Column = idBucket(idCol, 100L)

  /** 80/10/10 split assignment. */
  def splitName(idCol: Column): Column = {
    val b = splitBucket(idCol)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** Per-split document and token totals — the sanity dashboard of any
    * corpus split (and proof the assignment fractions hold). */
  def datasetSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split", splitName(col("doc_id")))
      .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))

  /**
   * q136: leakage-free split audit — near-duplicates must land in the
   * SAME train/val/test split, or evaluation leaks training data (the
   * published split-contamination failure: a near-copy of a training
   * document scoring as "held out"). Assignment keyed by the q74
   * duplicate-CLUSTER id puts every member of a cluster in one split;
   * keyed by doc id it splits clusters apart. The audit reports, per
   * (method, split), the document count and the count of distinct
   * clusters touching the split: summed over splits, `by_cluster` equals
   * the total cluster count exactly, while `by_doc` exceeds it by the
   * number of straddling clusters — the leakage, visible in the table.
   *
   * Rides [[graft.analytics.Dedup.sharedClusterEdges]] (the session-
   * shared contraction fixpoint) — singletons and roots key by their own
   * doc id; the audit itself is two narrow aggregates.
   */
  def clusterAwareSplit(s: SparkSession, d: String): DataFrame = {
    val edges = graft.analytics.Dedup.sharedClusterEdges(s, d)._1
    val assigned = Tables.documents(s, d).select(col("doc_id"))
      .join(edges.select(col("src").as("doc_id"), col("dst").as("cid")),
        Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cid"), col("doc_id")))
      .select(col("doc_id"), col("cluster_id"),
        splitName(col("doc_id")).as("by_doc"),
        splitName(col("cluster_id")).as("by_cluster"))
    def byMethod(method: String, key: String) =
      assigned.groupBy(col(key).as("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .select(lit(method).as("method"), col("split"),
          col("n_docs"), col("n_clusters"))
    byMethod("by_doc", "by_doc").unionByName(byMethod("by_cluster", "by_cluster"))
  }

  /** Sequence-length histogram: docs bucketed by token count in steps of
    * `binTokens`, capped at `maxBin` (the overflow bin) — the shape that
    * drives context-length packing decisions. */
  def lengthBins(s: SparkSession, d: String,
      binTokens: Int = 16, maxBin: Int = 6): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      .withColumn("bin",
        least(ceil(col("n_tokens") / binTokens.toDouble), lit(maxBin)).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /**
   * Sequence packing: assign documents to fixed-token-budget context
   * windows — doc d goes to pack `floor(running_tokens_before_d / budget)`
   * within its language, in stable doc_id order. One window pass, no
   * shuffle beyond the partition-by; deterministic, so shards can be packed
   * independently and reproducibly. Emits per-pack fill stats (the
   * padding-waste dashboard of a pretraining data loader).
   */
  def sequencePacking(s: SparkSession, d: String, budget: Int = 2048): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      .withColumn("before", coalesce(sum(col("n_tokens")).over(w), lit(0)))
      .withColumn("pack_id", floor(col("before") / budget).cast("int"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("pack_tokens"))
  }

  /**
   * q150: padded-batch waste audit — the fine-tuning/inference twin of
   * [[sequencePacking]] (which concatenates; here every sequence in a
   * batch pads to the batch maximum, the standard collate_fn). For batch
   * size `batch`, compares the two canonical batching disciplines over
   * the same corpus: `arrival` (stable doc_id order — what a naive
   * loader does) vs `sorted` (length-then-id order — length-bucketed
   * batching), emitting per-language batch counts, real vs padded token
   * slots, and the waste fraction. Sorting contiguous equal-size groups
   * minimizes the sum of per-batch maxima, so the delta between the two
   * rows IS the padding win length-bucketing buys — the number this
   * audit exists to surface.
   *
   * Determinism: both orders are total (doc_id tiebreak), so batch
   * membership — hence every output cell — is engine-reproducible.
   * NULL/absent text counts as an EMPTY sequence that still occupies a
   * batch slot (coalesce to 0 tokens): a real loader pads the row, it
   * doesn't skip it.
   *
   * 100 TB posture: the window shuffles only (lang, doc_id, n_tokens) —
   * three narrow columns, never text. Batching is inherently sequential
   * within its stream, so the partition key is the batching domain: here
   * the language, in a sharded pipeline (lang, shard) — each window sees
   * one shard's rows, bounded by shard sizing, and the audit stays
   * embarrassingly parallel across shards. Both strategies' aggregates
   * are map-side partial over the batch rows.
   */
  def paddingWaste(s: SparkSession, d: String, batch: Int = 32): DataFrame =
    paddingWasteOf(Tables.documents(s, d), batch)

  /**
   * q162: Neyman-allocation stratified sampling (Neyman 1934) — the
   * sampling-THEORY member of the assembly family: when drawing a fixed
   * eval/calibration budget from a stratified corpus, the
   * variance-optimal allocation draws from stratum h in proportion to
   * N_h·S_h (stratum size × within-stratum length spread) — not
   * uniformly (q64's splits), not capped (q103), not quality-first
   * (q154): a high-variance stratum needs more probe mass for the same
   * estimator error on any length-correlated metric. Per source: size,
   * length stddev, the Neyman allocation of `budget`, and the
   * md5-lottery winners' count/token/id checksums — the drawn set
   * itself, engine-reproducible.
   *
   * Determinism discipline: S_h is the population stddev rounded to
   * 6 dp from EXACT integer moment sums (Σx as BIGINT; Σx² accumulated
   * as DECIMAL(38,0) so the Spark side cannot wrap 64-bit silently while
   * the oracle's HUGEINT-summed CAST AS BIGINT raises — both engines
   * stay exact or fail loudly together); the weight N_h·S_h is
   * re-rounded; the weight total is an exact DECIMAL(38,12) sum; the
   * allocation least(floor(budget·w_h / total), N_h) divides two
   * identically-derived doubles and is capped at the stratum size (a
   * high-variance stratum cannot be allocated more docs than it has —
   * the drawn set realizes the emitted n_alloc exactly); the lottery is
   * the suite's md5-of-id ordering with doc_id tiebreak — no stage can
   * fork on summation order or ties. Floor allocation plus stratum
   * exhaustion can undershoot the budget (the largest-remainder /
   * re-allocation top-up is a policy choice left to the caller).
   *
   * 100 TB shape: one narrow moment aggregate per stratum, one
   * |strata|-row broadcast allocation table, one per-stratum rank window
   * for the lottery (at corpus scale the q103 two-phase histogram bounds
   * the window to the winning key range). NULL source is its own
   * stratum: the allocation join is null-safe on BOTH engines
   * (`<=>` / IS NOT DISTINCT FROM).
   */
  /** Default q162 eval budget — interpolated into the q162 oracle SQL
    * (SparkEntry) so the two engines cannot silently desync on it. */
  val NeymanBudget: Long = 500L

  def neymanSample(s: SparkSession, d: String, budget: Long = NeymanBudget): DataFrame =
    neymanSampleOf(Tables.documents(s, d), budget)

  /** [[neymanSample]] over an arbitrary (source, doc_id, text) frame. */
  def neymanSampleOf(docs: DataFrame, budget: Long): DataFrame = {
    val base = docs.select(col("source"), col("doc_id"),
      coalesce(TextStats.tokenCount(col("text")), lit(0)).cast("long").as("x"))
    val stats = base.groupBy(col("source"))
      .agg(count(lit(1)).as("sn"),
        sum(col("x")).as("sx"),
        // x*x fits a long (token counts are < 2^31); the SUM is where
        // 64-bit wraps on an extreme corpus — accumulate decimal(38,0)
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sx2"))
      .withColumn("len_stddev", round(
        sqrt(greatest(
          col("sx2").cast("double") / col("sn") -
            (col("sx").cast("double") / col("sn")) *
            (col("sx").cast("double") / col("sn")),
          lit(0.0))), 6))
      .withColumn("w", round(col("sn") * col("len_stddev"), 6))
    val total = stats.agg(
      sum(col("w").cast("decimal(38,12)")).cast("double").as("wtot"))
    val alloc = stats.crossJoin(broadcast(total))
      .withColumn("n_alloc",
        when(col("wtot") > 0,
          least(floor(lit(budget) * col("w") / col("wtot")), col("sn"))
            .cast("long"))
          .otherwise(0L))
      .select(col("source").as("asrc"), col("len_stddev"), col("n_alloc"))
    val ranked = base.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("source")).orderBy(
        md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))))
    ranked.join(broadcast(alloc), col("source") <=> col("asrc"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("len_stddev")).as("len_stddev"),
        max(col("n_alloc")).as("n_alloc"),
        sum(when(col("rn") <= col("n_alloc"), 1).otherwise(0))
          .cast("long").as("n_selected"),
        sum(when(col("rn") <= col("n_alloc"), col("x")).otherwise(0L))
          .cast("long").as("selected_tokens"),
        sum(when(col("rn") <= col("n_alloc"), col("doc_id")).otherwise(0L))
          .cast("long").as("selected_checksum"))
  }

  /** [[paddingWaste]] over an arbitrary (lang, doc_id, text) frame. */
  def paddingWasteOf(docs: DataFrame, batch: Int): DataFrame = {
    val base = docs.select(col("lang"), col("doc_id"),
      coalesce(TextStats.tokenCount(col("text")), lit(0)).as("n_tokens"))
    def strat(name: String, ord: Seq[Column]): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(ord: _*)
      base.withColumn("rn", row_number().over(w))
        .withColumn("batch_id", ((col("rn") - 1) / batch).cast("long"))
        .groupBy(col("lang"), col("batch_id"))
        .agg(count(lit(1)).as("n_rows"), max(col("n_tokens")).as("mx"),
          sum(col("n_tokens").cast("long")).as("real_t"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("n_rows")).cast("long").as("n_docs"),
          sum(col("real_t")).cast("long").as("real_tokens"),
          sum(col("n_rows") * col("mx") - col("real_t")).cast("long")
            .as("padded_slots"))
        .withColumn("strategy", lit(name))
    }
    strat("arrival", Seq(col("doc_id")))
      .unionByName(strat("sorted", Seq(col("n_tokens"), col("doc_id"))))
      .withColumn("waste_pct",
        when(col("real_tokens") + col("padded_slots") === 0, lit(0.0))
          .otherwise(round(col("padded_slots").cast("double") /
            (col("real_tokens") + col("padded_slots")), 6)))
      .select(col("strategy"), col("lang"), col("n_batches"), col("n_docs"),
        col("real_tokens"), col("padded_slots"), col("waste_pct"))
  }

  /**
   * q154: quality-first selection under a token budget — the
   * FineWeb-Edu-style assembly step: within each language, admit
   * documents in quality order (Gopher rules passed, 4 → 0, from
   * [[TextStats.gopherDocFlags]]' exact q88 spellings) until the token
   * budget fills, with the md5 id lottery (then doc_id) breaking ties so
   * equal-quality admission is deterministic and engine-reproducible. A
   * document is admitted iff the tokens BEFORE it in that order are
   * under the budget (so the budget may overshoot by at most one
   * document — the standard greedy cut). Emits the per-language ledger:
   * selected counts/tokens, the lowest quality score admitted (the
   * discovered threshold), and the selection checksum.
   *
   * 100 TB posture: scoring is one narrow map-side pass; the cumulative
   * window shuffles (lang, doc_id, n_tokens, score) — four narrow
   * columns — keyed by the selection domain (language here, (lang,
   * shard) in a sharded pipeline, bounding each sort). At full corpus
   * scale the same ledger comes from the q103 two-phase discipline:
   * aggregate the per-(lang, score) token histogram first (tiny), derive
   * each language's admission threshold from it, and only the boundary
   * score tier enters a rank window.
   */
  def budgetSelection(s: SparkSession, d: String,
      budgetTokens: Long = 5000): DataFrame =
    budgetSelectionOf(Tables.documents(s, d), budgetTokens)

  /** [[budgetSelection]] over an arbitrary (doc_id, lang, source, text)
    * frame. */
  def budgetSelectionOf(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val flags = TextStats.gopherDocFlags(
      docs.select(col("doc_id"), col("source"), col("text")))
    val scored = docs
      .select(col("doc_id"), col("lang"),
        coalesce(TextStats.tokenCount(col("text")), lit(0)).as("n_tokens"))
      .join(flags.select(col("doc_id"),
        (lit(4) - col("f_words") - col("f_mean_len") - col("f_stop") -
          col("f_alpha")).cast("long").as("score")), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("score").desc,
        md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    scored
      .withColumn("before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("selected", col("before") < budgetTokens)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("selected"), col("n_tokens")).otherwise(0L))
          .cast("long").as("selected_tokens"),
        min(when(col("selected"), col("score"))).as("min_score_admitted"),
        sum(when(col("selected"), col("doc_id")).otherwise(0L))
          .as("selected_checksum"))
  }

  /**
   * Stratified sample: a per-language `rate`-fraction sample keyed on the
   * md5 split bucket (same derivation as [[splitBucket]]) — deterministic,
   * engine-reproducible, and stable under corpus growth (a doc's
   * membership never changes as others arrive). Returns per-language
   * sampled counts vs totals.
   */
  def stratifiedSample(s: SparkSession, d: String, ratePct: Int = 10): DataFrame =
    Tables.documents(s, d)
      .withColumn("sampled", (splitBucket(col("doc_id")) < ratePct).cast("int"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("sampled")).cast("long").as("n_sampled"))

  /**
   * Chunk-level exact dedup — the sequence-level member of the dedup
   * family: after token-window chunking (q80), identical spans that
   * survive DOCUMENT-level dedup (boilerplate headers, licence blocks,
   * quoted passages shared by otherwise-distinct documents) still collide
   * at the chunk hash, and a training pipeline drops the copies so the
   * model never sees the same sequence twice (the sequence-granularity
   * complement of Lee et al.'s substring dedup). Keeps the lexicographic
   * first instance (doc_id, chunk_idx) per chunk hash; emits the per-doc
   * kept/dropped ledger.
   *
   * 100 TB posture: the window shuffles only (doc_id, chunk_idx,
   * chunk_hash) — chunk text is reduced to its 60-bit hash inside the
   * chunker's narrow map and never moves. The hash is uniform, so
   * partitions balance; a pathological hash group (one span repeated
   * millions of times) is bounded by the corpus' copy count of ONE span —
   * rows collapse in the per-doc map-side partial right after.
   */
  def chunkDedup(s: SparkSession, d: String,
      chunkTokens: Int = 128, overlap: Int = 32): DataFrame =
    chunkDedupOf(chunkDocuments(s, d, chunkTokens, overlap))

  /** [[chunkDedup]] over an arbitrary chunked (doc_id, chunk_idx,
    * chunk_hash) frame ([[chunkDocumentsOf]] output shape). */
  def chunkDedupOf(chunks: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .select(col("doc_id"), col("chunk_idx"), col("chunk_hash"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /**
   * Temperature-weighted mixture sampling — the multilingual / multi-source
   * rebalancing step of a pretraining mix (the exponentiated-smoothing
   * α = 0.5 of XLM/mBERT; the Pile's per-source epochs are the same idea):
   * group weight ∝ √n normalized across groups, so low-resource languages
   * are upsampled relative to their raw share, then each group keeps a
   * deterministic md5-bucket fraction sized to `budgetDocs` total expected
   * documents. Emits per-language raw count, normalized weight, kept count
   * and kept tokens.
   *
   * Determinism/parity: the weight denominator (Σ √n over groups) is
   * decimal-summed (order-independent), weights and keep-probabilities are
   * 12-dp-rounded before the integer bucket threshold is floored — the
   * same convention as the k-means compare keys — and membership hashes
   * doc_id through [[splitBucket]]'s md5 derivation at 1e-6 granularity,
   * so a document's fate never changes as the corpus grows or reshuffles.
   *
   * 100 TB posture: two corpus scans — a count-by-group scan (column-pruned
   * to `lang`, map-side combined into one row per group) and the keep pass
   * with the per-group thresholds BROADCAST back (the group table is
   * bounded by language/source cardinality, never corpus-sized). No
   * corpus shuffle at all: both aggregates combine map-side on the tiny
   * group key.
   */
  def temperatureMixture(s: SparkSession, d: String, budgetDocs: Long = 250): DataFrame =
    temperatureMixtureOf(Tables.documents(s, d), budgetDocs)

  /** [[temperatureMixture]] over an arbitrary (lang, doc_id, text) frame. */
  def temperatureMixtureOf(documents: DataFrame, budgetDocs: Long): DataFrame = {
    val docs = documents
      .select(col("lang"), col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    // group-cardinality rows; materialized once (eager local checkpoint) so
    // the two consumers below — threshold broadcast and output weights —
    // share ONE column-pruned count scan instead of re-aggregating the
    // corpus each (visible as twin lang-only scans in the explain)
    val langStats = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("sq", sqrt(col("n_docs")))
      .withColumn("denom",
        sum(col("sq").cast("decimal(28,15)")).over(all).cast("double"))
      .withColumn("weight", round(col("sq") / col("denom"), 12))
      .withColumn("thresh",
        floor(least(lit(1.0),
          round(lit(budgetDocs) * col("weight") / col("n_docs"), 12)) * 1000000))
      .select(col("lang"), col("n_docs"), col("weight"), col("thresh")),
      eager = true)
    val kept = docs
      .join(broadcast(langStats.select(col("lang"), col("thresh"))), "lang")
      .withColumn("kept",
        (idBucket(col("doc_id"), 1000000L) < col("thresh")).cast("int"))
      .groupBy(col("lang"))
      .agg(
        sum(col("kept")).cast("long").as("n_kept"),
        sum((col("kept") * col("n_tokens")).cast("long")).as("kept_tokens"))
    langStats
      .select(col("lang"), col("n_docs"), round(col("weight"), 6).as("weight"))
      .join(kept, "lang")
  }

  /**
   * Contamination check: corpus documents whose word-set Jaccard against
   * any "benchmark" document (doc_id ≡ 0 mod `benchStride`, standing in for
   * an eval set) reaches `threshold` — the near-match decontamination gate
   * (exact copies are the j = 1.0 special case). Emits per-source
   * contaminated counts.
   *
   * Scale shape: an eval set is small by definition and additionally
   * hard-capped by id range (`maxBench`), so the benchmark side is an O(1)
   * broadcast and scoring is map-side over the corpus — the corpus never
   * shuffles. (For corpus-vs-corpus near-dup at scale, use the banded LSH
   * join in [[Dedup.embeddingNearDups]]/[[Dedup.minhashPairs]] instead.)
   */
  def contamination(s: SparkSession, d: String, benchStride: Long = 97,
      threshold: Double = 0.8, maxBench: Long = 1000): DataFrame = {
    val docs = Tables.documentsSpread(s, d) // map-side word-set scoring is the cost
    def wordSet(c: Column): Column = array_distinct(split(trim(c), "\\s+"))
    val bench = docs
      .filter(col("doc_id") % benchStride === 0 && col("doc_id") < benchStride * maxBench)
      .select(col("doc_id").as("bench_id"), wordSet(col("text")).as("wb"))
    // size prefilter: jaccard >= t implies |wd|/|wb| ∈ [t, 1/t], so pairs
    // outside that ratio can be discarded before the set intersection —
    // output-identical, and it prunes most of the bounded cross product.
    // Round 15: the ratio window rides a LOG-BUCKET EQUI-KEY — two sizes
    // within ratio 1/t have ⌊ln·/ln(1/t)⌋ buckets differing by ≤ 1, so
    // each bench row lands in its bucket ± 1 (3 broadcast rows) and the
    // join is a broadcast HASH join on bk instead of a nested-loop over
    // every (doc, bench) pair evaluating the size predicate; the exact
    // ratio check re-applies after the match, so the output is identical.
    val invLog = math.log(1.0 / threshold)
    def bucket(sz: Column): Column =
      floor(log(sz.cast("double")) / invLog).cast("long")
    val bench3 = bench
      .withColumn("nb", size(col("wb")))
      .withColumn("bk", explode(array(
        bucket(col("nb")) - 1, bucket(col("nb")), bucket(col("nb")) + 1)))
    docs
      .select(col("doc_id"), col("source"), wordSet(col("text")).as("wd"))
      .withColumn("nd", size(col("wd")))
      .withColumn("bk", bucket(col("nd")))
      .join(broadcast(bench3), Seq("bk"))
      .filter(col("nd").cast("double") >= col("nb") * threshold &&
        col("nb").cast("double") >= col("nd") * threshold)
      .filter(col("doc_id") =!= col("bench_id"))
      .withColumn("jac",
        size(array_intersect(col("wd"), col("wb"))).cast("double") /
          size(array_union(col("wd"), col("wb"))))
      .filter(col("jac") >= threshold)
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_contaminated"),
        countDistinct(col("bench_id")).as("n_bench_hit"))
  }

  /**
   * Token-window document chunking — the training-sample assembly step:
   * each document becomes ⌈tokens/stride⌉ overlapping chunks of up to
   * `chunkTokens` tokens (stride = chunkTokens - overlap), each carrying
   * its position and a content hash for downstream sample-level dedup.
   * One generator + narrow maps — zero shuffles, whatever the corpus
   * size; chunk hashes are md5-prefix longs so the whole op is
   * value-oracle-checked.
   */
  def chunkDocuments(s: SparkSession, d: String,
      chunkTokens: Int = 128, overlap: Int = 32): DataFrame =
    // zero-shuffle plan: slicing work parallelizes only via the scan
    chunkDocumentsOf(Tables.documentsSpread(s, d), chunkTokens, overlap)

  /** [[chunkDocuments]] over an arbitrary (doc_id, text) frame — the form
    * the streaming path applies per micro-batch ([[graft.streaming.StreamingCorpus]]). */
  def chunkDocumentsOf(docs: DataFrame,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap ($overlap) must be in [0, chunkTokens=$chunkTokens): " +
        "a non-positive stride cannot advance through the document")
    val stride = chunkTokens - overlap
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .withColumn("n_tokens", size(col("ws")))
      .select(col("doc_id"), col("ws"), col("n_tokens"),
        explode(sequence(lit(0), greatest(col("n_tokens") - 1, lit(0)),
          lit(stride))).as("chunk_start"))
      .withColumn("chunk_len",
        least(lit(chunkTokens), col("n_tokens") - col("chunk_start")).cast("int"))
      .withColumn("chunk_text",
        array_join(slice(col("ws"), col("chunk_start") + 1, col("chunk_len")), " "))
      .select(
        col("doc_id"),
        (col("chunk_start") / stride).cast("int").as("chunk_idx"),
        col("chunk_start").cast("int").as("chunk_start"),
        col("chunk_len"),
        Dedup.mdHash60(col("chunk_text")).as("chunk_hash"))
  }

  /**
   * End-to-end dedup application — the step every pair/cluster query
   * feeds: SimHash near-dup clusters ([[Dedup.simhashClusters]]) reduce to
   * per-cluster survivors (min doc_id), and the corpus view drops every
   * non-survivor member. Anti-join on doc_id: the cluster table is
   * near-dup-sized (tiny vs the corpus), the corpus never reshuffles.
   */
  /**
   * The full training-data assembly as ONE plan — the composite every
   * other query is a stage of: near-dup cluster losers dropped (q81
   * semantics, full-corpus simhash contraction), exact-dedup survivorship
   * among the remainder (q31), token-count quality gate, token-window
   * chunking (q80), split assignment (q64), per-split sample accounting.
   *
   * Plan shape at 100 TB: the contraction works on the (tiny) dup graph;
   * the corpus itself flows through one anti-join, one content-hash
   * window, then NARROW stages (quality filter, chunk generator, split
   * label) straight into a map-side-combined aggregate — after the
   * survivorship window the corpus is never reshuffled.
   */
  def trainingPipeline(s: SparkSession, d: String,
      minTokens: Int = 10, maxTokens: Int = 1000,
      chunkTokens: Int = 128, overlap: Int = 32): DataFrame = {
    // exact-first graph: identical texts collapse before banding, so a
    // duplicate-heavy corpus can't blow the band join up quadratically;
    // the contraction is the session-shared fixpoint (Dedup
    // .sharedClusterEdges) q74/q81/q118 also ride
    val losers = Dedup.sharedClusterEdges(s, d)._1
      .select(col("src").as("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val kept = Tables.documents(s, d)
      .join(losers, Seq("doc_id"), "left_anti")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      .filter(col("n_tokens").between(minTokens, maxTokens))
      .select(col("doc_id"), col("text"))
    chunkDocumentsOf(kept, chunkTokens, overlap)
      .groupBy(splitName(col("doc_id")).as("split"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len").cast("long")).as("total_chunk_tokens"))
  }

  def dedupApply(s: SparkSession, d: String): DataFrame = {
    // the contraction's (child > root) edges ARE the losers — one row per
    // non-survivor member, no roots union to build and filter back out;
    // exact-first graph (see Dedup.simhashDupGraph) keeps the band join
    // linear on duplicate-heavy corpora, and the contraction itself is
    // the session-shared fixpoint (Dedup.sharedClusterEdges)
    val losers = Dedup.sharedClusterEdges(s, d)._1
      .select(col("src").as("doc_id"))
    Tables.documents(s, d)
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /**
   * Training-shard export accounting — the pipeline's "last mile": a
   * released corpus ships as N shard files whose assignment is a GLOBAL
   * deterministic shuffle (every public corpus release — Pile, RedPajama,
   * Dolma — does this so sequential readers see source- and
   * time-decorrelated documents). Shard = [[idBucket]](doc_id, nShards)
   * (uniform md5 buckets ⇒ balanced shards, stable under corpus growth
   * and across engines); within-shard order = the md5 hex of the id (the
   * deterministic shuffle order [[writeTrainingShards]] sorts by).
   * first/last doc in shard order are the order-sensitive observables
   * that pin the shuffle order itself, not just the partition.
   *
   * 100 TB posture: ONE shuffle keyed by uniform hash buckets; the sort
   * is within-partition only (no global orderBy — nothing ever
   * single-threads); the writer streams each shard independently.
   */
  def trainingShardStats(s: SparkSession, d: String, nShards: Int = 16): DataFrame =
    trainingShardStatsOf(Tables.documents(s, d), nShards)

  /** [[trainingShardStats]] over an arbitrary (doc_id, text) frame. */
  def trainingShardStatsOf(docs: DataFrame, nShards: Int): DataFrame =
    docs
      .withColumn("shard", idBucket(col("doc_id"), nShards.toLong))
      .withColumn("ord", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        min_by(col("doc_id"), col("ord")).as("first_doc"),
        max_by(col("doc_id"), col("ord")).as("last_doc"))

  /** Materialize the shards: repartition BY the shard key (each output
    * task owns whole shards), sort within partitions by the deterministic
    * shuffle order, write one directory per shard. The read-back contract
    * — every row in shard=k has idBucket(doc_id) = k, file order = `ord`
    * order — is pinned in SamplingSpec. */
  def writeTrainingShards(docs: DataFrame, nShards: Int, outPath: String): Unit =
    docs
      .withColumn("shard", idBucket(col("doc_id"), nShards.toLong))
      .withColumn("ord", md5(col("doc_id").cast("string").cast("binary")))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)

  /**
   * Repeat-factor (epoch-aware) mixing — the UPSAMPLING counterpart of
   * [[temperatureMixture]]'s downsampling: when the budget calls for more
   * tokens of a group than exist, the group is repeated whole `repeats`
   * times plus a deterministic md5-bucket fraction of its documents once
   * more (data-constrained scaling à la Muennighoff et al. 2023 — up to
   * ~4 epochs of repeated data is near-as-good as fresh). Budget here:
   * equalize every language to the LARGEST language's token count.
   *
   * Determinism (q89's conventions exactly): the only division is one
   * IEEE double ratio per language, 12-dp-rounded before the floored
   * integer threshold, so both engines compute identical repeats and
   * identical residual membership; everything after is exact integer
   * arithmetic.
   */
  def repeatFactorMixture(s: SparkSession, d: String): DataFrame =
    repeatFactorMixtureOf(Tables.documents(s, d))

  /** [[repeatFactorMixture]] over an arbitrary (doc_id, text, lang)
    * frame. */
  def repeatFactorMixtureOf(docs: DataFrame): DataFrame = {
    val withTok = docs.select(col("doc_id"), col("lang"),
      TextStats.tokenCount(col("text")).cast("long").as("n_tokens"))
    val stats = withTok.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
    val budget = stats.agg(max(col("lang_tokens")).as("budget_tokens"))
    // repeats = floor(budget/T); residual fraction at 1e-6 granularity.
    // One job up front (the plan is lang-count rows) so the corpus pass
    // below joins against a literal-sized broadcast, scans once.
    val plan = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      stats.crossJoin(broadcast(budget))
        .withColumn("ratio",
          round(col("budget_tokens").cast("double") / col("lang_tokens"), 12))
        .withColumn("repeats", floor(col("ratio")).cast("long"))
        .withColumn("residual_thresh",
          floor(round(col("ratio") - col("repeats"), 12) * 1000000).cast("long")),
      eager = true)
    withTok
      .join(broadcast(plan.select(col("lang"), col("repeats"),
        col("residual_thresh"))), Seq("lang"))
      .withColumn("extra",
        (idBucket(col("doc_id"), 1000000L) < col("residual_thresh")).cast("long"))
      .groupBy(col("lang"), col("repeats"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("lang_tokens"),
        sum(col("extra")).as("n_extra_docs"),
        (sum(col("n_tokens") * col("repeats")) +
          sum(col("extra") * col("n_tokens"))).as("planned_tokens"))
      .select(col("lang"), col("n_docs"), col("lang_tokens"), col("repeats"),
        col("n_extra_docs"), col("planned_tokens"))
  }

  /**
   * q103: per-source document caps (the RefinedWeb/C4 "domain cap"
   * discipline — no single site may dominate the corpus): each source
   * keeps at most `cap` documents, chosen by the deterministic md5
   * lottery (the [[idBucket]] hash family), everything else drops.
   *
   * 100 TB posture — the window only ever sees over-cap sources: the
   * per-source counts aggregate first (narrow rows, map-side partials),
   * broadcasts back (null-safe, so a NULL-source shard caps too), and
   * documents of under-cap sources take a zero-shuffle map-side path —
   * only rows of sources actually above the cap are ranked. On a web
   * corpus where most domains are small and a few are huge, the ranked
   * fraction is the skewed tail, not the corpus; the md5-priority sort
   * key also spreads each over-cap source's rank partition evenly (no
   * value clustering), which is what AQE skew splitting wants.
   *
   * Observable: per source — total docs, kept, dropped, kept char mass,
   * kept id checksum. The oracle replays the plain one-window spelling;
   * the two-phase plan must produce identical values (the lottery is
   * engine-independent), which is exactly what the gate checks.
   */
  def sourceCapStats(s: SparkSession, d: String, cap: Int = 15): DataFrame =
    sourceCapStatsOf(Tables.documents(s, d), cap)

  /** The cap-selection rule itself — per source, the `cap` rows with the
    * lowest (md5(doc_id), doc_id) lottery keys. Keeping the lowest `cap`
    * keys is associative and commutative over row arrival, which is what
    * makes the streaming gate ([[graft.streaming.StreamingCorpus]]
    * `startSourceCapGate`) converge to this batch selection under any
    * delivery order; q103's two-phase stats plan reproduces its
    * aggregates. */
  def sourceCapSelect(docs: DataFrame, cap: Int): DataFrame =
    docs.withColumn("_mk", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("_mk"), col("doc_id"))))
      .filter(col("_rn") <= cap).drop("_rn", "_mk")

  /** [[sourceCapStats]] over an arbitrary (doc_id, source, n_chars)
    * frame. */
  def sourceCapStatsOf(docs: DataFrame, cap: Int): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val counts = base.groupBy(col("source")).agg(count(lit(1)).as("src_n"))
      .select(col("source").as("c_source"), col("src_n"))
    val withN = base.join(broadcast(counts),
      col("source") <=> col("c_source")).drop("c_source")
    val pass = withN.filter(col("src_n") <= cap)
      .withColumn("kept", lit(true))
    val ranked = withN.filter(col("src_n") > cap)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string").cast("binary")),
            col("doc_id"))))
      .withColumn("kept", col("rn") <= cap)
      .drop("rn")
    pass.unionByName(ranked)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"),
        coalesce(sum(when(col("kept"), col("n_chars"))), lit(0L))
          .as("kept_chars"),
        coalesce(sum(when(col("kept"), col("doc_id"))), lit(0L))
          .as("kept_checksum"))
  }

  /**
   * q139: UniMax language-budget allocation (Chung et al. 2023) — the
   * published multilingual mixing rule: give every language an equal share
   * of the token budget UNLESS that share exceeds `epochCap` epochs of the
   * language's corpus, in which case the language is capped and its unused
   * share waterfalls to the rest. Computed in closed form: sort languages
   * by ascending cap; a language is capped exactly when its cap fits under
   * the running waterlevel `(B − prefix)/(remaining)`, and every uncapped
   * language splits the remainder equally.
   *
   * Scale + determinism shape: the per-language token census is the only
   * corpus-sized pass (map-side partial sums); the waterfilling runs over
   * a LANGUAGE-COUNT-sized frame — the unpartitioned windows the plan
   * shows touch tens of rows, not the corpus. All arithmetic is products
   * and ordered sums of exactly-representable integers-in-double (token
   * counts × epochCap), so the cap verdicts and equal-share divisions are
   * bit-identical across engines with no decimal crutch.
   */
  def unimaxAllocation(s: SparkSession, d: String, epochCap: Double = 3.0,
      budgetFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLang = Tables.documents(s, d)
      .withColumn("n_toks", TextStats.tokenCount(col("text")))
      .groupBy(col("lang"))
      .agg(coalesce(sum(col("n_toks").cast("long")), lit(0L)).as("n_tokens"))
    val ord = Window.orderBy(col("cap").asc, col("lang").asc_nulls_last)
    val all = Window.partitionBy()
    perLang
      .withColumn("cap", col("n_tokens").cast("double") * epochCap)
      .withColumn("i", row_number().over(ord))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("prefix", coalesce(
        sum(col("cap")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("b",
        sum(col("n_tokens").cast("double")).over(all) * budgetFrac)
      .withColumn("flag",
        col("cap") * (col("n") - col("i") + 1) <= col("b") - col("prefix"))
      .withColumn("capsum",
        sum(when(col("flag"), col("cap")).otherwise(0.0)).over(all))
      .withColumn("t", sum(when(col("flag"), 1L).otherwise(0L)).over(all))
      .withColumn("alloc", when(col("flag"), col("cap"))
        .otherwise((col("b") - col("capsum")) / (col("n") - col("t"))))
      .select(col("lang"), col("n_tokens"),
        round(col("alloc"), 6).as("alloc_tokens"),
        round(when(col("n_tokens") > 0, col("alloc") / col("n_tokens"))
          .otherwise(0.0), 6).as("epochs"))
  }

  // -------------------------------------------- URL / domain filtering

  /**
   * Deterministic per-document URL column (the q82 planted-marker
   * discipline): the fixture corpus carries no URLs, so a raw URL is
   * derived from (doc_id, source) with every messy shape a real crawl
   * emits — http/https schemes, upper-cased hosts, an explicit default
   * port, tracking-only query strings, fragments, trailing slashes —
   * and the path slot folds doc_id mod 7, so documents of one source
   * genuinely collide on the same page (the duplicate mass URL dedup
   * exists to remove). Identical in both engines: pure integer mod +
   * string concat.
   */
  def urlRaw(idCol: Column, sourceCol: Column): Column = concat(
    when(idCol % 2 === 0, "https://").otherwise("http://"),
    when(idCol % 3 === 0,
      upper(concat(lit("www."), coalesce(sourceCol, lit("nosrc")),
        lit(".example.com"))))
      .otherwise(concat(lit("www."), coalesce(sourceCol, lit("nosrc")),
        lit(".example.com"))),
    when(idCol % 5 === 0, ":443").otherwise(""),
    concat(lit("/p"), (idCol % 7).cast("string")),
    when(idCol % 11 === 0, "/").otherwise(""),
    when(idCol % 4 === 0, "?utm_source=feed&utm_campaign=c9")
      .when(idCol % 4 === 1, concat(lit("?ref=r"), (idCol % 3).cast("string")))
      .otherwise(""),
    when(idCol % 6 === 0, "#sec").otherwise(""))

  /**
   * URL canonicalization — the published crawl-dedup normalizer
   * (C4 / RefinedWeb discipline): lowercase, drop the fragment, drop
   * TRACKING-ONLY query strings (`?utm_...`; a non-tracking query like
   * `?ref=` is content-addressing and stays), drop the default :443
   * port, drop the scheme and a leading `www.`, drop one trailing slash.
   * The `:443` strip is ANCHORED to the authority component (`^([^/]+)`)
   * so a path or query that happens to contain `:443/` survives intact —
   * an unanchored strip would corrupt `host/a:443/b` on real crawl input.
   * (Since the scheme is dropped first, `http://x:443/` and
   * `https://x:443/` both collapse to `x/` — intended: URL dedup wants
   * the scheme-insensitive page identity.) Regex parity: patterns
   * restricted to syntax Java regex and RE2 interpret identically (no
   * lookaround; the single `$1`/`\1` group reference is the one
   * replacement feature both engines share), so the DuckDB oracle
   * reproduces every canonical form bit-for-bit.
   */
  def urlCanonical(u: Column): Column = {
    val lowered = lower(u)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "\\?utm_[a-z0-9_=&]*$", "")
    val noScheme = regexp_replace(noUtm, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noPort = regexp_replace(noWww, "^([^/]+):443(/|$)", "$1$2")
    regexp_replace(noPort, "/$", "")
  }

  /** Registrable domain of a canonical URL: everything before the first
    * `/` (ports and schemes are already normalized away). */
  def urlDomain(canon: Column): Column = regexp_extract(canon, "^([^/?]+)", 1)

  /**
   * q148: URL-level dedup (the C4/RefinedWeb first pass — one document
   * per canonical URL): raw URLs canonicalize, every canonical URL keeps
   * exactly one document by the deterministic md5 lottery (the q103 key:
   * lowest (md5(doc_id), doc_id)), and the per-source ledger reports the
   * removed duplicate mass.
   *
   * 100 TB posture: canonicalization is a chain of narrow codegen'd
   * string maps inside the scan; the keeper window shuffles on the
   * canonical-URL hash where group size = that URL's duplicate
   * multiplicity (bounded, AQE skew-split handles hot URLs) — never a
   * corpus-sized partition; the ledger is a map-side-combined per-source
   * aggregate of (bool, long) columns.
   */
  def urlDedupStats(s: SparkSession, d: String): DataFrame =
    urlDedupStatsOf(Tables.documents(s, d))

  /** [[urlDedupStats]] over an arbitrary (doc_id, source, n_chars)
    * frame. */
  def urlDedupStatsOf(docs: DataFrame): DataFrame =
    urlSurvivorsOf(docs)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_urls"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dup_removed"),
        coalesce(sum(when(col("kept"), col("n_chars"))), lit(0L))
          .as("kept_chars"),
        coalesce(sum(when(col("kept"), col("doc_id"))), lit(0L))
          .as("kept_checksum"))

  /** The URL-dedup decision table: one row per document with its
    * canonical `url` and the `kept` verdict (lottery-min per URL) — the
    * shared base of q148's ledger and q149's domain pipeline. */
  def urlSurvivorsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("url", urlCanonical(urlRaw(col("doc_id"), col("source"))))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("url"))
          .orderBy(md5(col("doc_id").cast("string").cast("binary")),
            col("doc_id"))))
      .withColumn("kept", col("_rn") === 1)
      .drop("_rn")

  /**
   * q149: domain blocklist + per-domain caps over the URL-dedup
   * survivors — the rest of the published crawl-filter funnel: the
   * domain extracts from the canonical URL, blocklisted domains drop
   * wholesale, and every surviving domain keeps at most `cap` documents
   * by the same md5 lottery (the q103 rule verbatim — q149 REUSES
   * [[sourceCapStatsOf]] keyed by domain, so the two-phase plan and its
   * oracle-proven selection are shared, not re-spelled).
   *
   * The blocklist is represented honestly as a TABLE the plan joins
   * (broadcast — a real blocklist is thousands of rows, never
   * corpus-sized); membership is the deterministic md5 lottery over the
   * domain so both engines derive the identical list with no fixture
   * file.
   */
  def domainCapStats(s: SparkSession, d: String, cap: Int = 5,
      blockMod: Int = 7): DataFrame =
    domainCapStatsOf(Tables.documents(s, d), cap, blockMod)

  /** [[domainCapStats]] over an arbitrary (doc_id, source, n_chars)
    * frame. */
  def domainCapStatsOf(docs: DataFrame, cap: Int, blockMod: Int): DataFrame = {
    // the survivor table feeds FIVE consumers (blocklist distinct, the
    // flag join, and the cap plan's count/pass/ranked branches) — pin the
    // narrow (doc_id, domain, n_chars) rows once or every consumer
    // re-runs the scan + keeper window (observed as 5 duplicate window
    // subtrees in the formatted plan)
    val survivors = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      urlSurvivorsOf(docs).filter(col("kept"))
        .withColumn("domain", urlDomain(col("url")))
        .select(col("doc_id"), col("domain"), col("n_chars")),
      eager = false)
    val blocklist = survivors.select(col("domain")).distinct()
      .filter(Dedup.mdHash60(col("domain")) % blockMod === 0)
      .withColumn("blocked_flag", lit(true))
    val flagged = survivors.join(broadcast(blocklist), Seq("domain"), "left")
      .withColumn("blocked", coalesce(col("blocked_flag"), lit(false)))
    val capped = sourceCapStatsOf(
      flagged.filter(!col("blocked"))
        .select(col("doc_id"), col("domain").as("source"), col("n_chars")),
      cap)
      .select(col("source").as("domain"), col("n_docs").as("n_urls"),
        lit(false).as("blocked"), col("n_kept"), col("n_dropped"),
        col("kept_chars"), col("kept_checksum"))
    val blockedStats = flagged.filter(col("blocked"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), lit(true).as("blocked"),
        lit(0L).as("n_kept"), count(lit(1)).as("n_dropped"),
        lit(0L).as("kept_chars"), lit(0L).as("kept_checksum"))
    capped.unionByName(blockedStats)
  }
}

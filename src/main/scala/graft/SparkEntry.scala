package graft

import graft.analytics._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract (see /root/repo/SURVEY.md §7): one entry per implemented
 * operator from SURVEY §2 + the north-star extensions; for each, equivalent
 * DuckDB SQL where the op is SQL-expressible (others get rows-only checks).
 *
 * Column-name + type parity rules between `queries` and `oracleSql` are
 * documented on [[graft.analytics.Relational]].
 */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational surface (SURVEY §2 capability table)
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_revenue_band" -> (Relational.q02RevenueBand _),
    "q03_segment_revenue" -> (Relational.q03SegmentRevenue _),
    "q04_order_priority" -> (Relational.q04OrderPriority _),
    "q05_nation_revenue" -> (Relational.q05NationRevenue _),
    "q06_region_customers" -> (Relational.q06RegionCustomers _),
    "q07_exists_customers" -> (Relational.q07ExistsCustomers _),
    "q08_anti_customers" -> (Relational.q08AntiCustomers _),
    "q09_top_orders_per_customer" -> (Relational.q09TopOrdersPerCustomer _),
    "q10_running_total" -> (Relational.q10RunningTotal _),
    "q11_order_gaps" -> (Relational.q11OrderGaps _),
    "q12_rollup_lineitem" -> (Relational.q12RollupLineitem _),
    "q13_cube_orders" -> (Relational.q13CubeOrders _),
    "q14_distinct_stats" -> (Relational.q14DistinctStats _),
    "q15_union_custkeys" -> (Relational.q15Union _),
    "q16_intersect_custkeys" -> (Relational.q16Intersect _),
    "q17_except_custkeys" -> (Relational.q17Except _),
    "q18_top_orders" -> (Relational.q18TopOrders _),
    "q19_having_big_customers" -> (Relational.q19HavingBigCustomers _),
    "q20_conditional_agg" -> (Relational.q20ConditionalAgg _),
    "q21_string_funcs" -> (Relational.q21StringFuncs _),
    "q22_monthly_orders" -> (Relational.q22MonthlyOrders _),
    "q23_json_extract" -> (Relational.q23JsonExtract _),
    "q24_hourly_events" -> (Relational.q24HourlyEvents _),
    "q25_sessionize" -> (Relational.q25Sessionize _),
    // the reference's load semantics as queries (ops I-3, F-1..F-5, SC-4)
    "q26_merge_upsert" -> (Relational.q26MergeUpsert _),
    "q27_dump_filters" -> (Relational.q27DumpFilters _),
    "q28_filename_parse" -> (Relational.q28FileNameParse _),
    "q29_historical_refresh" -> (Relational.q29HistoricalRefresh _),
    // dedup family
    "q30_dedup_exact_groups" -> (Dedup.exactGroups _),
    "q31_dedup_exact_survivors" -> (Dedup.exactSurvivors _),
    "q32_minhash_lsh_pairs" -> ((s: SparkSession, d: String) => Dedup.minhashPairs(s, d)),
    "q33_word_jaccard_pairs" -> ((s: SparkSession, d: String) => Dedup.wordJaccardPairs(s, d)),
    "q34_simhash_fingerprints" -> (Dedup.simhashFingerprints _),
    "q35_simhash_pairs" -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    // similarity search
    "q36_cosine_topk" -> ((s: SparkSession, d: String) => Similarity.bruteForceTopK(s, d)),
    "q37_ivf_topk" -> ((s: SparkSession, d: String) => Similarity.ivfTopK(s, d)),
    "q38_lsh_bucket_stats" -> (Similarity.lshBucketStats _),
    // text analysis
    "q39_token_totals" -> (TextStats.tokenTotals _),
    "q40_quality_profile" -> (TextStats.qualityProfile _),
    "q41_langid_confusion" -> ((s: SparkSession, d: String) => TextStats.langIdConfusion(s, d)),
    "q42_fingerprints" -> (TextStats.fingerprints _),
    // multimodal plumbing
    "q43_multimodal_decode" -> (Multimodal.decodeMeta _),
    "q44_frame_sample" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    // order statistics, sketches, pivot
    "q45_percentiles" -> (Relational.q45Percentiles _),
    "q46_approx_distinct" -> (Relational.q46ApproxDistinct _),
    "q47_pivot" -> (Relational.q47Pivot _),
    // composed operators: as-of join, grouping sets, range frames, salting
    "q48_asof_join" -> (Relational.q48AsofJoin _),
    "q49_grouping_sets" -> (Relational.q49GroupingSets _),
    "q50_trailing_spend" -> (Relational.q50TrailingSpend _),
    "q51_salted_agg" -> (Relational.q51SaltedAgg _),
    "q52_heavy_hitters" -> ((s: SparkSession, d: String) => TextStats.heavyHitters(s, d)),
    "q53_sliding_windows" -> (Relational.q53SlidingWindows _),
    "q54_distinct_flags" -> (Relational.q54DistinctFlags _),
    "q55_customer_order_dist" -> (Relational.q55CustomerOrderDist _),
    "q56_supplier_reconcile" -> (Relational.q56SupplierReconcile _),
    "q57_corpus_prep" -> ((s: SparkSession, d: String) => TextStats.corpusPrep(s, d)),
    "q58_embedding_neardup" -> ((s: SparkSession, d: String) => Dedup.embeddingNearDups(s, d)),
    "q59_multimodal_features" -> (Multimodal.extractFeatures _),
    "q60_rank_suite" -> (Relational.q60RankSuite _),
    "q61_date_parts" -> (Relational.q61DateParts _),
    "q62_scalar_suite" -> (Relational.q62ScalarSuite _),
    "q63_percentile_approx" -> ((s: SparkSession, d: String) => Relational.q63PercentileApprox(s, d)),
    // dataset assembly: deterministic split / length bins / contamination
    "q64_dataset_split" -> (Sampling.datasetSplit _),
    "q65_length_bins" -> ((s: SparkSession, d: String) => Sampling.lengthBins(s, d)),
    "q66_contamination" -> ((s: SparkSession, d: String) => Sampling.contamination(s, d)),
    "q67_interval_join" -> (Relational.q67IntervalJoin _),
    "q68_sequence_packing" -> ((s: SparkSession, d: String) => Sampling.sequencePacking(s, d)),
    "q69_stratified_sample" -> ((s: SparkSession, d: String) => Sampling.stratifiedSample(s, d)),
    "q70_repetition" -> ((s: SparkSession, d: String) => TextStats.repetitionProfile(s, d)),
    "q71_anomaly" -> (Relational.q71Anomaly _),
    "q72_trade_flows" -> (Relational.q72TradeFlows _),
    "q73_percentiles_sorted" -> (Relational.q73PercentilesSorted _),
    "q74_dup_clusters" -> (Dedup.simhashClusters _),
    // round 3: n-gram Jaccard, IDF-style rarity, embedding quantization
    "q75_char_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.charNgramJaccardPairs(s, d)),
    "q76_token_rarity" -> ((s: SparkSession, d: String) => TextStats.tokenRarity(s, d)),
    "q77_embedding_quant" -> (Quantization.int8QuantStats _),
    "q78_winnow_fingerprints" -> ((s: SparkSession, d: String) => TextStats.winnowFingerprints(s, d)),
    "q79_winnow_pairs" -> ((s: SparkSession, d: String) => TextStats.winnowPairs(s, d)),
    "q80_chunking" -> ((s: SparkSession, d: String) => Sampling.chunkDocuments(s, d)),
    "q81_dedup_apply" -> (Sampling.dedupApply _),
    "q82_pii_redaction" -> (TextStats.piiRedactionProfile _),
    "q83_kmeans_cells" -> ((s: SparkSession, d: String) => Similarity.kmeansCellStats(s, d)),
    "q84_shared_gram_pairs" -> ((s: SparkSession, d: String) => TextStats.sharedGramPairs(s, d)),
    "q85_ngram_contamination" -> ((s: SparkSession, d: String) => TextStats.ngramContamination(s, d)),
    "q86_training_pipeline" -> ((s: SparkSession, d: String) => Sampling.trainingPipeline(s, d)),
    // round 6: semantic dedup over k-means cells, Gopher quality rules,
    // temperature-weighted mixture sampling
    "q87_semdedup" -> ((s: SparkSession, d: String) => Similarity.semdedupStats(s, d)),
    "q88_gopher_quality" -> ((s: SparkSession, d: String) => TextStats.gopherQuality(s, d)),
    "q89_temperature_mixture" -> ((s: SparkSession, d: String) => Sampling.temperatureMixture(s, d)),
    "q90_chunk_dedup" -> ((s: SparkSession, d: String) => Sampling.chunkDedup(s, d)),
    // classifier-based quality filter (GPT-3/fastText family) and
    // D4-style prototype pruning (the diversification half of D4)
    "q91_classifier_filter" -> ((s: SparkSession, d: String) => TextStats.classifierQualityStats(s, d)),
    "q92_proto_prune" -> ((s: SparkSession, d: String) => Similarity.protoPruneStats(s, d)),
    // shard export accounting (the release "last mile") and repeat-factor
    // (epoch-aware) upsampling — q89's data-constrained counterpart
    "q93_training_shards" -> ((s: SparkSession, d: String) => Sampling.trainingShardStats(s, d)),
    "q94_repeat_mixture" -> ((s: SparkSession, d: String) => Sampling.repeatFactorMixture(s, d)),
    // BPE tokenizer-training merge selection over the word-frequency table
    "q95_bpe_pairs" -> ((s: SparkSession, d: String) => TextStats.bpePairCounts(s, d)),
    // the full D4 recipe in one DAG: SemDeDup drop -> survivor re-centroid
    // -> prototype prune -> per-cell accounting
    "q96_d4_pipeline" -> ((s: SparkSession, d: String) => Similarity.d4PipelineStats(s, d)),
    // full iterated BPE training: distributed word-table agg + bounded
    // driver merge loop; oracle replays all 8 iterations in unrolled SQL
    "q97_bpe_train" -> ((s: SparkSession, d: String) => TextStats.bpeTrain(s, d)),
    // C4/RefinedWeb boilerplate span removal: corpus-frequent spans dropped
    // from EVERY document, cleaned text reassembled in order (hash-pinned)
    "q98_boilerplate_removal" -> ((s: SparkSession, d: String) => TextStats.boilerplateRemoval(s, d)),
    // CCNet-style LM quality bucketing: per-lang bigram model (add-one
    // smoothing), per-doc avg -log10 P, head/middle/tail terciles
    "q99_perplexity_buckets" -> ((s: SparkSession, d: String) => TextStats.perplexityBuckets(s, d)),
    // BPE ENCODING — apply q97's learned merges to the corpus via the
    // word-frequency table: top-40 token frequencies + total token count
    "q100_bpe_encode" -> ((s: SparkSession, d: String) => TextStats.bpeEncode(s, d)),
    // cross-source duplication (leakage) matrix over the exhaustive
    // simhash near-dup pair surface
    "q101_cross_source_leakage" -> ((s: SparkSession, d: String) => Dedup.crossSourceLeakage(s, d)),
    // product-quantization codebooks (Jégou et al. 2011) — the FAISS-scale
    // compressed vector representation: per-subspace L2 k-means, all
    // subspaces trained in the same jobs
    "q102_pq_codebooks" -> ((s: SparkSession, d: String) => Similarity.pqStats(s, d)),
    // RefinedWeb/C4 per-source (domain) caps: md5-lottery keep-at-most-N
    // per source; the window only ever sees over-cap sources
    "q103_source_caps" -> ((s: SparkSession, d: String) => Sampling.sourceCapStats(s, d)),
    // encoding-quality (mojibake) dashboard: control/replacement/non-ASCII
    // char mass + whitespace-run artifacts, one narrow pass
    "q104_encoding_quality" -> ((s: SparkSession, d: String) => TextStats.encodingQuality(s, d)),
    // Zipf slope + type-token ratio per source — the distribution-shift
    // alarm over the vocab table, never the corpus
    "q105_zipf_diversity" -> ((s: SparkSession, d: String) => TextStats.zipfDiversity(s, d)),
    // ADC top-k over the PQ-compressed corpus (FAISS IVF-PQ serving path):
    // broadcast query distance tables, map-side (sub, code) lookups
    "q106_pq_adc_topk" -> ((s: SparkSession, d: String) => Similarity.pqAdcTopK(s, d)),
    // recall@k of the compressed (ADC) search vs exact L2 ground truth —
    // the accuracy audit every ANN deployment runs next to its latency
    "q107_pq_recall" -> ((s: SparkSession, d: String) => Similarity.pqRecallStats(s, d)),
    // embedding isotropy / collapse dashboard: per-label mean cosine to
    // the global centroid + mean norm — the standing embedding-health
    // audit next to the ANN indexes
    "q108_embedding_isotropy" -> ((s: SparkSession, d: String) => Similarity.isotropyStats(s, d)),
    // strict-order sequential funnel over the event stream: chained
    // per-user min-aggregates, no window over events
    "q109_event_funnel" -> ((s: SparkSession, d: String) => Relational.eventFunnel(s, d)),
    // IVF recall@k vs brute-force ground truth — q107's sibling, so every
    // ANN tier ships with a distributed accuracy audit
    "q110_ivf_recall" -> ((s: SparkSession, d: String) => Similarity.ivfRecallStats(s, d)),
    "q121_ivf_hard_negatives" -> ((s: SparkSession, d: String) =>
      Similarity.ivfHardNegatives(s, d)),
    "q122_hard_negative_recall" -> ((s: SparkSession, d: String) =>
      Similarity.ivfHardNegativeRecallStats(s, d)),
    "q123_dsir_resample" -> ((s: SparkSession, d: String) =>
      TextStats.dsirSelect(s, d)),
    "q124_tokenizer_fertility" -> ((s: SparkSession, d: String) =>
      TextStats.bpeFertility(s, d)),
    "q125_entropy_profile" -> ((s: SparkSession, d: String) =>
      TextStats.entropyProfile(s, d)),
    "q126_cms_heavy_hitters" -> ((s: SparkSession, d: String) =>
      TextStats.cmsHeavyHitters(s, d)),
    "q127_dedup_agreement" -> ((s: SparkSession, d: String) =>
      Dedup.dedupMethodAgreement(s, d)),
    // image perceptual-near-dup (dHash over real decoded PNGs) histogram
    "q128_image_dhash_histogram" -> ((s: SparkSession, d: String) =>
      Multimodal.imageDhashHistogram(s, d)),
    // paragraph-level exact dedup with first-occurrence survivorship
    "q129_paragraph_dedup" -> ((s: SparkSession, d: String) =>
      TextStats.paragraphDedup(s, d)),
    // image near-dup clusters: the q74 contraction over the dHash graph
    "q130_image_dhash_clusters" -> ((s: SparkSession, d: String) =>
      Multimodal.imageDhashClusters(s, d)),
    // audio-style per-frame RMS energy + zero crossings (VAD shape)
    "q131_audio_frame_energy" -> ((s: SparkSession, d: String) =>
      Multimodal.audioFrameFeatures(s, d)),
    // VAD segmentation over the q131 frames (gaps-and-islands run lengths)
    "q152_vad_segments" -> ((s: SparkSession, d: String) =>
      Multimodal.vadSegments(s, d)),
    // keep-the-best dedup policy over the q74 clusters (vs min-id baseline)
    "q153_quality_keepers" -> ((s: SparkSession, d: String) =>
      Dedup.qualityKeepers(s, d)),
    // quality-first selection under a per-language token budget
    "q154_budget_selection" -> ((s: SparkSession, d: String) =>
      Sampling.budgetSelection(s, d)),
    // audio delta-sign fingerprints banded into the q114/q128 histogram
    "q155_audio_fp_histogram" -> ((s: SparkSession, d: String) =>
      Multimodal.audioFpHistogram(s, d)),
    // audio near-dup clusters: q155 fingerprints through the q74
    // contraction — the q130 image precedent on the audio modality
    "q172_audio_fp_clusters" -> ((s: SparkSession, d: String) =>
      Multimodal.audioFpClusters(s, d)),
    // Moore-Lewis cross-entropy-difference selection vs the largest source
    "q156_moore_lewis" -> ((s: SparkSession, d: String) =>
      TextStats.mooreLewis(s, d)),
    // DoReMi-lite multiplicative-weights domain mixture from bigram NLL
    "q157_domain_reweight" -> ((s: SparkSession, d: String) =>
      TextStats.domainReweight(s, d)),
    // Broder containment pairs via prefix-filtered set-similarity join
    "q158_containment_pairs" -> ((s: SparkSession, d: String) =>
      Dedup.containmentPairs(s, d)),
    // soft-dedup 1/cluster-size reweighting over the q74 clusters
    "q159_soft_dedup" -> ((s: SparkSession, d: String) =>
      Dedup.softDedupWeights(s, d)),
    // longest verbatim shared token span per pair (memorization audit)
    "q160_longest_shared_span" -> ((s: SparkSession, d: String) =>
      TextStats.longestSharedSpans(s, d)),
    // k-anonymity / l-diversity release audit over user profiles
    "q161_k_anonymity" -> ((s: SparkSession, d: String) =>
      Relational.kAnonymityAudit(s, d)),
    // Neyman variance-optimal stratified sampling allocation + draw
    "q162_neyman_sample" -> ((s: SparkSession, d: String) =>
      Sampling.neymanSample(s, d)),
    // data-constrained effective-dataset audit (decay-valued repeats)
    "q163_effective_data" -> ((s: SparkSession, d: String) =>
      Dedup.effectiveData(s, d)),
    // embedding-space benchmark contamination (paraphrase leakage)
    "q164_semantic_contamination" -> ((s: SparkSession, d: String) =>
      Similarity.semanticContamination(s, d)),
    // composed IVF routing + ADC scoring — the production FAISS recipe
    "q165_ivf_adc_topk" -> ((s: SparkSession, d: String) =>
      Similarity.ivfAdcTopK(s, d)),
    // q85 contamination flags crossed with the q64 split (release audit)
    "q167_contaminated_split" -> ((s: SparkSession, d: String) =>
      TextStats.contaminatedSplitAudit(s, d)),
    // winnow-vs-exhaustive recall per overlap band (sampling honesty)
    "q168_winnow_recall" -> ((s: SparkSession, d: String) =>
      TextStats.winnowRecallStats(s, d)),
    // transitive-chaining overreach of the q74 components, per size band
    "q169_cluster_chain_audit" -> ((s: SparkSession, d: String) =>
      Dedup.clusterChainAudit(s, d)),
    // per-query recall of the composed IVF-ADC path vs exact L2 truth
    "q166_ivf_adc_recall" -> ((s: SparkSession, d: String) =>
      Similarity.ivfAdcRecallStats(s, d)),
    // int8-dequantized retrieval recall vs float exact truth (q77 audit)
    "q170_int8_recall" -> ((s: SparkSession, d: String) =>
      Similarity.int8RecallStats(s, d)),
    // SemDeDup cell-blocking recall per cosine band (q87 audit)
    "q171_semdedup_blocking_recall" -> ((s: SparkSession, d: String) =>
      Similarity.semanticBlockingRecall(s, d)),
    // content-defined chunking (gear-criterion boundaries) dup mass
    "q132_cdc_chunk_dedup" -> ((s: SparkSession, d: String) =>
      TextStats.cdcChunkDedup(s, d)),
    // Matryoshka-truncation recall@k vs full-dim ground truth
    "q133_mrl_recall" -> ((s: SparkSession, d: String) =>
      Similarity.mrlRecallStats(s, d)),
    // per-language script/character-class profile (mC4/CCNet signal)
    "q134_script_profile" -> ((s: SparkSession, d: String) =>
      TextStats.scriptProfile(s, d)),
    // linear-counting distinct-vocab sketch + honesty audit
    "q135_distinct_sketch" -> ((s: SparkSession, d: String) =>
      TextStats.distinctSketchAudit(s, d)),
    // leakage-free (cluster-keyed) split audit vs naive doc-keyed
    "q136_cluster_split_audit" -> ((s: SparkSession, d: String) =>
      Sampling.clusterAwareSplit(s, d)),
    // margin-based bitext mining (ratio margin, both-endpoint top-k avgs)
    "q137_bitext_margin" -> ((s: SparkSession, d: String) =>
      Similarity.bitextMarginMining(s, d)),
    // Bloom-prefiltered decontamination rollup (exact confirm join)
    "q138_bloom_decontamination" -> ((s: SparkSession, d: String) =>
      TextStats.bloomDecontamination(s, d)),
    // UniMax language-budget waterfilling (closed-form, engine-exact)
    "q139_unimax_mixture" -> ((s: SparkSession, d: String) =>
      Sampling.unimaxAllocation(s, d)),
    // LAION-style image admission funnel over real decoded dimensions
    "q140_image_filter_funnel" -> ((s: SparkSession, d: String) =>
      Multimodal.imageFilterFunnel(s, d)),
    // span-level surgical decontamination (remove the overlap, keep the doc)
    "q141_surgical_decontamination" -> ((s: SparkSession, d: String) =>
      TextStats.surgicalDecontamination(s, d)),
    // the routed (cell-pruned) bitext miner — q137 at index cost
    "q142_ivf_bitext_margin" -> ((s: SparkSession, d: String) =>
      Similarity.ivfBitextMarginMining(s, d)),
    // routing-honesty audit: routed pair vs exact pair per query
    "q143_bitext_routing_recall" -> ((s: SparkSession, d: String) =>
      Similarity.bitextRoutingRecall(s, d)),
    // blocked kNN graph with reciprocal-edge flag (cell-bounded quadratic)
    "q144_knn_graph" -> ((s: SparkSession, d: String) =>
      Similarity.knnGraph(s, d)),
    // semantic clusters over the mutual-kNN graph, label-purity audited
    "q145_knn_cluster_purity" -> ((s: SparkSession, d: String) =>
      Similarity.knnClusterPurity(s, d)),
    // learned-vs-heuristic quality-filter agreement matrix per source
    "q146_filter_agreement" -> ((s: SparkSession, d: String) =>
      TextStats.filterAgreement(s, d)),
    // per-source length-distribution drift vs the reference source
    "q147_source_drift_chi2" -> ((s: SparkSession, d: String) =>
      TextStats.sourceDriftChi2(s, d)),
    // URL-level dedup (canonicalize, one doc per canonical URL)
    "q148_url_dedup" -> ((s: SparkSession, d: String) =>
      Sampling.urlDedupStats(s, d)),
    // domain blocklist + per-domain caps over the URL-dedup survivors
    "q149_domain_caps" -> ((s: SparkSession, d: String) =>
      Sampling.domainCapStats(s, d)),
    // padded-batch waste: arrival-order vs length-bucketed batching
    "q150_padding_waste" -> ((s: SparkSession, d: String) =>
      Sampling.paddingWaste(s, d)),
    // incoming-batch admission against the existing corpus (exact + banded
    // near-dup gates) — the cross-snapshot member of the dedup family
    "q151_incremental_dedup" -> ((s: SparkSession, d: String) =>
      Dedup.incrementalDedup(s, d)),
    // MinHash estimator calibration over the full banded candidate set —
    // the dedup member of the approximation-honesty suite
    "q111_minhash_calibration" -> ((s: SparkSession, d: String) => Dedup.minhashCalibration(s, d)),
    // join-key skew audit: the pre-shuffle diagnostic that decides between
    // plain shuffle, AQE skew split, and salting
    "q112_skew_profile" -> ((s: SparkSession, d: String) => Relational.skewProfile(s, d)),
    // cohort retention matrix: distinct (user, hour) activity collapsed
    // map-side before any join; matrix is |cohorts| x |offsets| rows
    "q113_cohort_retention" -> ((s: SparkSession, d: String) => Relational.cohortRetention(s, d)),
    // hamming histogram of the near-dup pair surface: the dial that sets
    // the simhash threshold
    "q114_hamming_histogram" -> ((s: SparkSession, d: String) => Dedup.hammingHistogram(s, d)),
    // source-level similarity via mergeable MinHash union sketches
    "q115_source_sketch_similarity" -> ((s: SparkSession, d: String) =>
      Dedup.sourceSketchSimilarity(s, d)),
    // top-PMI bigram collocations per language (Church-Hanks floor)
    "q116_pmi_collocations" -> ((s: SparkSession, d: String) =>
      TextStats.pmiCollocations(s, d)),
    // dump-to-dump snapshot diff (added/removed/changed/unchanged per source)
    "q117_snapshot_diff" -> ((s: SparkSession, d: String) =>
      Relational.snapshotDiff(s, d)),
    // duplicate-cluster size histogram over the q74 contraction
    "q118_cluster_size_histogram" -> ((s: SparkSession, d: String) =>
      Dedup.clusterSizeHistogram(s, d)),
    // Okapi BM25 retrieval against the top-df query terms
    "q119_bm25_topdocs" -> ((s: SparkSession, d: String) =>
      TextStats.bm25TopDocs(s, d)),
    // contrastive hard negatives: nearest different-label vectors
    "q120_hard_negatives" -> ((s: SparkSession, d: String) =>
      Similarity.hardNegatives(s, d)))

  private val tokens = "regexp_split_to_array(trim(text), '\\s+')"

  // Shared q148/q149 CTEs: raw planted URL -> canonical form -> per-URL
  // keeper rank (the DuckDB replay of Sampling.urlRaw / urlCanonical /
  // urlSurvivorsOf)
  private val urlCte =
    """WITH u AS (
      | SELECT doc_id, source, n_chars,
      |  CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END ||
      |  CASE WHEN doc_id % 3 = 0
      |   THEN upper('www.' || coalesce(source, 'nosrc') || '.example.com')
      |   ELSE 'www.' || coalesce(source, 'nosrc') || '.example.com' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
      |  '/p' || CAST(doc_id % 7 AS VARCHAR) ||
      |  CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END ||
      |  CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_campaign=c9'
      |   WHEN doc_id % 4 = 1 THEN '?ref=r' || CAST(doc_id % 3 AS VARCHAR)
      |   ELSE '' END ||
      |  CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END AS raw
      | FROM documents),
      |c AS (
      | SELECT doc_id, source, n_chars,
      |  regexp_replace(
      |   regexp_replace(
      |    regexp_replace(
      |     regexp_replace(
      |      regexp_replace(
       |      regexp_replace(lower(raw), '#.*$', ''),
      |      '\?utm_[a-z0-9_=&]*$', ''),
      |     '^https?://', ''),
      |    '^www\.', ''),
      |   '^([^/]+):443(/|$)', '\1\2'),
      |  '/$', '') AS url
      | FROM u),
      |urn AS (
      | SELECT doc_id, source, n_chars, url,
      |  row_number() OVER (PARTITION BY url
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      | FROM c)
      |""".stripMargin

  /** The full IVF pipeline as a reusable CTE chain ending at `r`
    * (query_id, neighbor_id, cosine, rn): md5-derived hyperplane cells
    * (as q38), per-cell centroids, top-nprobe routing with (c_cos, cell)
    * tie-break, probed-cell scan, exact ranking — every stage integer- or
    * fixed-order-arithmetic deterministic, so the "approximate" ANN
    * output is exactly reproducible wrt its own definition. Shared by
    * the q37 observable and the q110 recall audit. */
  private val ivfCte: String =
    """WITH v AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cells AS (
        | SELECT vec_id, e,
        |  CAST(list_sum(list_transform(range(0,3), p ->
        |   CASE WHEN list_sum(list_transform(range(1, len(e)+1),
        |     i -> e[i] * (((('0x' || substring(md5(CAST(p AS VARCHAR) || '_' ||
        |            CAST(i-1 AS VARCHAR)),1,8))::BIGINT % 1000000)/1000000.0) - 0.5)))
        |     >= 0 THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS cell
        | FROM v),
        |cent AS (
        | SELECT cell, dim,
        |  CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
        | FROM (
        |   SELECT cell, unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x
        |   FROM cells) t
        | GROUP BY cell, dim),
        |ca AS (SELECT cell, list(mean_v ORDER BY dim) AS c0 FROM cent GROUP BY cell),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM cells WHERE vec_id % 100 = 0),
        |routed AS (
        | SELECT query_id, qe, cell,
        |  list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*c0[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(c0)+1), i -> c0[i]*c0[i])))) AS c_cos
        | FROM q CROSS JOIN ca),
        |probes AS (
        | SELECT query_id, qe, cell FROM (
        |  SELECT query_id, qe, cell,
        |   row_number() OVER (PARTITION BY query_id ORDER BY c_cos DESC, cell) AS pr
        |  FROM routed) t WHERE pr <= 4),
        |s AS (
        | SELECT p.query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1, len(p.qe)+1), i -> p.qe[i]*c.e[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(p.qe)+1), i -> p.qe[i]*p.qe[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(c.e)+1), i -> c.e[i]*c.e[i])))) AS cosine
        | FROM probes p JOIN cells c ON c.cell = p.cell
        | WHERE p.query_id <> c.vec_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        | FROM s WHERE cosine IS NOT NULL)""".stripMargin


  /** The q121/q122 IVF replay over the LABELED corpus: identical cell /
    * centroid / routing machinery to [[ivfCte]], but cells and centroids
    * index only labeled vectors (unlabeled rows can never be negatives)
    * and the probed-cell scan keeps different-label neighbors only. */
  private val ivfLabCte: String =
    """WITH v AS (
        | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        | FROM embeddings WHERE label IS NOT NULL),
        |cells AS (
        | SELECT vec_id, label, e,
        |  CAST(list_sum(list_transform(range(0,3), p ->
        |   CASE WHEN list_sum(list_transform(range(1, len(e)+1),
        |     i -> e[i] * (((('0x' || substring(md5(CAST(p AS VARCHAR) || '_' ||
        |            CAST(i-1 AS VARCHAR)),1,8))::BIGINT % 1000000)/1000000.0) - 0.5)))
        |     >= 0 THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS cell
        | FROM v),
        |cent AS (
        | SELECT cell, dim,
        |  CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
        | FROM (
        |   SELECT cell, unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x
        |   FROM cells) t
        | GROUP BY cell, dim),
        |ca AS (SELECT cell, list(mean_v ORDER BY dim) AS c0 FROM cent GROUP BY cell),
        |q AS (SELECT vec_id AS query_id, label AS ql, e AS qe
        | FROM cells WHERE vec_id % 100 = 0),
        |routed AS (
        | SELECT query_id, ql, qe, cell,
        |  list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*c0[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(c0)+1), i -> c0[i]*c0[i])))) AS c_cos
        | FROM q CROSS JOIN ca),
        |probes AS (
        | SELECT query_id, ql, qe, cell FROM (
        |  SELECT query_id, ql, qe, cell,
        |   row_number() OVER (PARTITION BY query_id ORDER BY c_cos DESC, cell) AS pr
        |  FROM routed) t WHERE pr <= 4),
        |s AS (
        | SELECT p.query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1, len(p.qe)+1), i -> p.qe[i]*c.e[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(p.qe)+1), i -> p.qe[i]*p.qe[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(c.e)+1), i -> c.e[i]*c.e[i])))) AS cosine
        | FROM probes p JOIN cells c ON c.cell = p.cell
        | WHERE p.query_id <> c.vec_id AND c.label <> p.ql),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        | FROM s WHERE cosine IS NOT NULL)""".stripMargin

  private val percentilesSql =
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.25),6) AS price_p25,
      | round(quantile_cont(l_extendedprice, 0.5),6) AS price_p50,
      | round(quantile_cont(l_extendedprice, 0.75),6) AS price_p75,
      | round(quantile_cont(l_quantity, 0.5),6) AS qty_p50,
      | count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Shared simhash fingerprint derivation (see q34 comment). */
  /** The q131/q152 audio-frame CTE chain ending at `fe` (doc_id,
    * frame_idx, n_samples, rms_energy, n_zero_cross): payload bytes via
    * hex, 256-byte frames, centered samples, exact-integer squared sums,
    * 6-dp-rounded RMS — one definition so the two oracles cannot
    * desynchronize. */
  private val audioFrameCte: String =
    """WITH hx AS (
      | SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
      | FROM documents WHERE text IS NOT NULL),
      |fr AS (
      | SELECT doc_id, n, h,
      |  CAST(unnest(range(0, greatest(CAST(ceil(n / 256.0) AS BIGINT), 1)))
      |   AS BIGINT) AS frame_idx
      | FROM hx),
      |sm AS (
      | SELECT doc_id, frame_idx,
      |  list_transform(range(CAST(frame_idx*256 AS INTEGER),
      |                       CAST(least(frame_idx*256 + 256, n) AS INTEGER)),
      |    i -> ('0x' || substring(h, CAST(i*2+1 AS INTEGER), 2))::INTEGER - 128)
      |   AS s
      | FROM fr),
      |fe AS (
      | SELECT doc_id, frame_idx, CAST(len(s) AS BIGINT) AS n_samples,
      |  CASE WHEN len(s) > 0 THEN
      |   round(sqrt(CAST(list_sum(list_transform(s, x -> x*x)) AS DOUBLE)
      |     / len(s)), 6) END AS rms_energy,
      |  CAST(coalesce(len(list_filter(range(0, len(s)-1),
      |    i -> (s[CAST(i+1 AS INTEGER)] < 0) <> (s[CAST(i+2 AS INTEGER)] < 0))),
      |   0) AS BIGINT) AS n_zero_cross
      | FROM sm)""".stripMargin

  private def simhashFpCte(prefix: String = "WITH") =
    s"""$prefix w AS (
       | SELECT doc_id, list_transform(list_distinct($tokens),
       |   w -> ('0x' || substring(md5(w),1,15))::BIGINT) AS whs
       | FROM documents),
       |fp AS (
       | SELECT doc_id,
       |  -- null text => null fingerprint (engine parity): without the
       |  -- guard the CASE's ELSE turns the null word list into simhash 0,
       |  -- a VALID fingerprint that would band null docs together
       |  CAST(CASE WHEN whs IS NULL THEN NULL ELSE
       |   list_sum(list_transform(range(0,60), b ->
       |    CASE WHEN 2*len(list_filter(whs, h -> ((h >> b) & 1) = 1)) > len(whs)
       |         THEN (1::BIGINT << b) ELSE 0 END)) END AS BIGINT) AS simhash
       | FROM w)""".stripMargin

  /** The q35/q74 candidate-pair predicate: ≥1 shared 15-bit band AND
    * Hamming ≤ 6 — single source so the two oracles cannot desynchronize. */
  private val simhashPairPredicate =
    """(((a.simhash >> 0) & 32767) = ((b.simhash >> 0) & 32767)
      |    OR ((a.simhash >> 15) & 32767) = ((b.simhash >> 15) & 32767)
      |    OR ((a.simhash >> 30) & 32767) = ((b.simhash >> 30) & 32767)
      |    OR ((a.simhash >> 45) & 32767) = ((b.simhash >> 45) & 32767))
      |  AND bit_count(xor(a.simhash, b.simhash)) <= 6""".stripMargin

  /** q74's oracle: the q35 pair graph, closed into connected components by
    * a recursive CTE (component id = min reachable doc_id — the same
    * fixpoint the Spark label propagation converges to). */
  /** The q155/q172 audio fingerprint chain: 16-byte frames via the q131
    * hex-decode discipline, delta-sign fingerprint on the 6-dp-rounded
    * RMS energies — ends at `fp(doc_id, simhash)`. One source so the
    * histogram and cluster oracles cannot desynchronize. */
  private def audioFpCte(prefix: String = "WITH"): String =
    s"""$prefix hx AS (
      | SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
      | FROM documents WHERE text IS NOT NULL),
      |fr AS (
      | SELECT doc_id, n, h,
      |  CAST(unnest(range(0, greatest(CAST(ceil(n / 16.0) AS BIGINT), 1)))
      |   AS BIGINT) AS frame_idx
      | FROM hx),
      |sm AS (
      | SELECT doc_id, frame_idx,
      |  list_transform(range(CAST(frame_idx*16 AS INTEGER),
      |                       CAST(least(frame_idx*16 + 16, n) AS INTEGER)),
      |    i -> ('0x' || substring(h, CAST(i*2+1 AS INTEGER), 2))::INTEGER - 128)
      |   AS s
      | FROM fr),
      |fe AS (
      | SELECT doc_id, frame_idx,
      |  CASE WHEN len(s) > 0 THEN
      |   round(sqrt(CAST(list_sum(list_transform(s, x -> x*x)) AS DOUBLE)
      |     / len(s)), 6) END AS rms_energy
      | FROM sm),
      |dl AS (
      | SELECT doc_id, frame_idx, rms_energy,
      |  lag(rms_energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
      | FROM fe),
      |fp AS (
      | SELECT doc_id,
      |  CAST(coalesce(sum(CASE WHEN frame_idx BETWEEN 1 AND 59
      |    AND prev IS NOT NULL AND rms_energy IS NOT NULL
      |    AND rms_energy > prev
      |   THEN (1::BIGINT << CAST(frame_idx - 1 AS INTEGER)) ELSE 0 END), 0)
      |   AS BIGINT) AS simhash
      | FROM dl GROUP BY doc_id)""".stripMargin

  private def dupClustersCte: String =
    simhashFpCte("WITH RECURSIVE") +
      s""",
        |p AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        | WHERE $simhashPairPredicate),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |      UNION SELECT doc_b AS src, doc_a AS dst FROM p),
        |reach AS (
        | SELECT src AS node, src AS lbl FROM (SELECT DISTINCT src FROM e) t
        | UNION
        | SELECT e.src AS node, r.lbl FROM e JOIN reach r ON r.node = e.dst),
        |clusters AS (
        | SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)""".stripMargin

  private def dupClustersOracle: String =
    dupClustersCte + "\nSELECT doc_id, cluster_id FROM clusters"

  /** q136 oracle: the q74 recursive-CTE clusters, singletons keyed by
    * their own id, and the q64 split arithmetic applied to both keys. */
  private def clusterSplitAuditSql: String = {
    def sp(key: String) =
      s"""CASE
         |   WHEN ('0x' || substring(md5(CAST($key AS VARCHAR)),1,8))::BIGINT % 100 < 80 THEN 'train'
         |   WHEN ('0x' || substring(md5(CAST($key AS VARCHAR)),1,8))::BIGINT % 100 < 90 THEN 'val'
         |   ELSE 'test' END""".stripMargin
    dupClustersCte +
      s""",
        |a AS (
        | SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        | FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
        |sp AS (
        | SELECT doc_id, cluster_id,
        |  ${sp("doc_id")} AS by_doc,
        |  ${sp("cluster_id")} AS by_cluster
        | FROM a)
        |SELECT 'by_doc' AS method, by_doc AS split,
        | count(*) AS n_docs, count(DISTINCT cluster_id) AS n_clusters
        |FROM sp GROUP BY 2
        |UNION ALL
        |SELECT 'by_cluster', by_cluster,
        | count(*), count(DISTINCT cluster_id)
        |FROM sp GROUP BY 2""".stripMargin
  }

  /** q32's oracle, generated so the permutation constants come from the
    * same md5 derivation the Spark side uses (Dedup.minhashA/minhashB) —
    * the full MinHash+LSH pipeline is integer arithmetic over md5 prefixes,
    * reproducible bit-for-bit in DuckDB. */
  private def minhashCte(numPerm: Int = 16, bands: Int = 4): String = {
    val P = analytics.Dedup.MinhashP
    val rows = numPerm / bands
    val sigExprs = (0 until numPerm).map(p =>
      s"list_min(list_transform(nh, h -> (h*${analytics.Dedup.minhashA(p)} + " +
        s"${analytics.Dedup.minhashB(p)}) % $P)) AS s$p").mkString(",\n  ")
    val sigCols = (0 until numPerm).map("s" + _).mkString(", ")
    val bandExprs = (0 until bands).map { k =>
      val terms = (0 until rows).map(r => s"s${k * rows + r}")
      terms.tail.foldLeft(terms.head)((acc, t) => s"($acc*31 + $t)") + s" AS band_$k"
    }.mkString(",\n  ")
    s"""WITH d AS (
       | SELECT doc_id, $tokens AS ws FROM documents),
       |n AS (
       | SELECT doc_id, ws,
       |  list_distinct(list_transform(range(0, greatest(len(ws)-3, 0)+1),
       |   i -> concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]))) AS ngrams
       | FROM d),
       |h AS (
       | SELECT doc_id, ws,
       |  list_transform(ngrams, g -> ('0x' || substring(md5(g),1,8))::BIGINT % $P) AS nh
       | FROM n),
       |s AS (
       | SELECT doc_id, ws,
       |  $sigExprs
       | FROM h),
       |b AS (
       | SELECT doc_id, ws, $sigCols,
       |  $bandExprs
       | FROM s)""".stripMargin
  }

  /** q115's oracle: the per-source UNION sketch computed directly (min
    * over every shingle hash of the source per permutation) — validating
    * the engine's mergeable min-of-doc-signatures spelling against the
    * definition it claims to implement. Permutation constants come from
    * the same md5 derivation as q32's. */
  private def sourceSketchOracle(numPerm: Int = 16): String = {
    val P = analytics.Dedup.MinhashP
    val permVals = (0 until numPerm).map(p =>
      s"($p, ${analytics.Dedup.minhashA(p)}, ${analytics.Dedup.minhashB(p)})")
      .mkString(", ")
    s"""WITH d AS (
       | SELECT source, $tokens AS ws FROM documents WHERE text IS NOT NULL),
       |n AS (
       | SELECT source, list_distinct(list_transform(range(0, greatest(len(ws)-3, 0)+1),
       |  i -> concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]))) AS ngrams FROM d),
       |h AS (
       | SELECT source,
       |  unnest(list_transform(ngrams, g -> ('0x' || substring(md5(g),1,8))::BIGINT % $P)) AS h0
       | FROM n),
       |sk AS (
       | SELECT source, pp.p AS p, min((h.h0 * pp.a + pp.b) % $P) AS mn
       | FROM h CROSS JOIN (VALUES $permVals) AS pp(p, a, b)
       | GROUP BY 1, 2),
       |pr AS (
       | SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       | FROM sk a JOIN sk b ON a.p = b.p
       | WHERE a.source IS NOT NULL AND (b.source IS NULL OR a.source < b.source)
       | GROUP BY 1, 2)
       |SELECT src_a, src_b, n_match,
       | round(n_match / $numPerm.0, 6) AS est_jaccard FROM pr""".stripMargin
  }

  private def minhashBandMatch(numPerm: Int = 16, bands: Int = 4): String =
    (0 until bands).map(k => s"a.band_$k = b2.band_$k").mkString(" OR ")

  private def minhashOracle(numPerm: Int = 16, bands: Int = 4): String =
    minhashCte(numPerm, bands) +
      s""",
       |cand AS (
       | SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |  CAST(len(list_intersect(list_distinct(a.ws), list_distinct(b2.ws))) AS DOUBLE) /
       |   len(list_distinct(list_concat(a.ws, b2.ws))) AS jac
       | FROM b a JOIN b b2 ON a.doc_id < b2.doc_id
       | WHERE ${minhashBandMatch(numPerm, bands)})
       |SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM cand WHERE jac >= 0.5""".stripMargin

  /** q111: every banded candidate pair with the signature estimate
    * (matching components / numPerm), exact Jaccard, and abs error —
    * no threshold, the calibration wants the false positives too. */
  private def minhashCalibrationOracle(numPerm: Int = 16, bands: Int = 4): String = {
    val matchSum = (0 until numPerm)
      .map(p => s"(CASE WHEN a.s$p = b2.s$p THEN 1 ELSE 0 END)").mkString(" + ")
    minhashCte(numPerm, bands) +
      s""",
       |cand AS (
       | SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |  $matchSum AS n_match,
       |  CAST(len(list_intersect(list_distinct(a.ws), list_distinct(b2.ws))) AS DOUBLE) /
       |   len(list_distinct(list_concat(a.ws, b2.ws))) AS jac
       | FROM b a JOIN b b2 ON a.doc_id < b2.doc_id
       | WHERE ${minhashBandMatch(numPerm, bands)})
       |SELECT doc_a, doc_b, CAST(n_match AS INTEGER) AS n_match,
       | round(n_match / $numPerm.0, 6) AS est_jaccard,
       | round(jac, 6) AS exact_jaccard,
       | round(abs(round(n_match / $numPerm.0, 6) - round(jac, 6)), 6) AS abs_err
       |FROM cand""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))),2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))),2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))),2) AS DOUBLE) AS sum_charge,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,9))) AS DOUBLE)/count(l_quantity),6) AS avg_qty, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,9))) AS DOUBLE)/count(l_extendedprice),6) AS avg_price,
        | round(CAST(sum(CAST(l_discount AS DECIMAL(18,9))) AS DOUBLE)/count(l_discount),6) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_band" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))),2) AS DOUBLE) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_segment_revenue" ->
      """SELECT c_mktsegment, CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))),2) AS DOUBLE) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey=o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q05_nation_revenue" ->
      """SELECT r_name, n_name, CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))),2) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        | JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q06_region_customers" ->
      """SELECT r_name, count(*) AS n_customers, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,9))) AS DOUBLE)/count(c_acctbal),6) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q07_exists_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
    "q08_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
    "q09_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 2""".stripMargin,
    "q10_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS DOUBLE) AS running_total
        |FROM orders""".stripMargin,
    "q11_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(date_diff('day',
        |   lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |   o_orderdate) AS INTEGER) AS days_since_prev
        |FROM orders""".stripMargin,
    "q12_rollup_lineitem" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q13_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))),2) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q14_distinct_stats" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows FROM lineitem""".stripMargin,
    "q15_union_custkeys" ->
      """SELECT o_custkey AS custkey FROM orders
        |UNION SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""".stripMargin,
    "q16_intersect_custkeys" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""".stripMargin,
    "q17_except_custkeys" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
        |EXCEPT SELECT o_custkey AS custkey FROM orders""".stripMargin,
    "q18_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_having_big_customers" ->
      """SELECT o_custkey, count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))),2) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 10""".stripMargin,
    "q20_conditional_agg" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        | CAST(round(sum(CAST(CASE WHEN l_returnflag='R' THEN l_extendedprice ELSE 0 END AS DECIMAL(18,6))),2) AS DOUBLE) AS returned_value,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q21_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name,1,8) AS name_prefix,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | -- || not concat(): Spark's concat propagates NULL (any NULL arg
        | -- nulls the result) while DuckDB's concat SKIPS NULLs; the SQL-
        | -- standard || operator is NULL-propagating in both engines
        | (p_brand || '#' || p_type) AS brand_type
        |FROM part""".stripMargin,
    "q22_monthly_orders" ->
      """SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))),2) AS DOUBLE) AS total
        |FROM orders GROUP BY date_trunc('month', o_orderdate)""".stripMargin,
    "q23_json_extract" ->
      """SELECT event_type,
        | -- json_valid guard + TRY_CAST: DuckDB errors on malformed JSON
        | -- and non-numeric values where Spark's get_json_object/try_cast
        | -- yield NULL
        | CAST(sum(TRY_CAST(CASE WHEN json_valid(props)
        |   THEN json_extract_string(props,'$.k') END AS BIGINT)) AS BIGINT) AS k_sum,
        | count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q24_hourly_events" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
        | count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(18,6))),2) AS DOUBLE) AS value_sum
        |FROM events GROUP BY CAST(date_trunc('hour', ts) AS TIMESTAMP), event_type""".stripMargin,
    "q25_sessionize" ->
      """WITH g AS (
        | SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 1 HOUR
        |       THEN 1 ELSE 0 END AS new_s
        | FROM events),
        |s AS (SELECT user_id, ts, value,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        | FROM g)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start, count(*) AS n_events,
        | CAST(round(sum(CAST(value AS DECIMAL(18,6))),2) AS DOUBLE) AS value_sum
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q26_merge_upsert" ->
      """WITH d1 AS (SELECT o_orderkey, o_totalprice, 1 AS src_seq FROM orders),
        |d2 AS (SELECT o_orderkey, o_totalprice + 100000.0 AS o_totalprice, 2 AS src_seq
        |       FROM orders WHERE o_orderkey % 10 = 0),
        |u AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src_seq DESC) AS rn FROM u)
        |SELECT o_orderkey, o_totalprice, src_seq FROM r WHERE rn = 1""".stripMargin,
    "q27_dump_filters" ->
      """SELECT dump_id, sequence, schema_version FROM (VALUES
        | ('d1', CAST(1 AS BIGINT), true,  '2024-01-01T00:00:00Z', 'v2'),
        | ('d2', CAST(2 AS BIGINT), false, '2024-01-02T00:00:00Z', 'v2'),
        | ('d3', CAST(3 AS BIGINT), true,  '2024-01-03T00:00:00Z', 'v1'),
        | ('d4', CAST(4 AS BIGINT), true,  '2024-01-04T00:00:00Z', 'v2'),
        | ('d5', CAST(5 AS BIGINT), true,  '2024-01-05T00:00:00Z', 'v2'))
        | AS t(dump_id, sequence, finished, created_at, schema_version)
        |WHERE finished AND dump_id NOT IN ('d1') AND schema_version = 'v2'""".stripMargin,
    "q28_filename_parse" ->
      """SELECT file_name,
        | regexp_extract(file_name, '^([a-z_0-9]+)-([0-9]+)-([0-9a-f]+)\.(gz)$', 1) AS table_name,
        | regexp_extract(file_name, '^([a-z_0-9]+)-([0-9]+)-([0-9a-f]+)\.(gz)$', 2) AS shard_part,
        | regexp_extract(file_name, '^([a-z_0-9]+)-([0-9]+)-([0-9a-f]+)\.(gz)$', 3) AS hash_part,
        | regexp_extract(file_name, '^([a-z_0-9]+)-([0-9]+)-([0-9a-f]+)\.(gz)$', 4) AS extension
        |FROM (VALUES ('user_dim-00000-abc123ef.gz'),('assignment_fact-00017-0099ffee.gz'),
        | ('requests-00001-deadbeef.gz'),('noDashFile.gz'),('too-many-dash-parts.gz')) AS t(file_name)""".stripMargin,
    "q29_historical_refresh" ->
      """SELECT dump_id, bool_and(regexp_matches(filename, '^requests.*?$')) AS is_historical
        |FROM (VALUES ('dumpA','requests-00000-aa.gz'),('dumpA','requests-00001-bb.gz'),
        | ('dumpB','requests-00000-cc.gz'),('dumpB','user_dim-00000-dd.gz')) AS t(dump_id, filename)
        |GROUP BY dump_id""".stripMargin,
    "q30_dedup_exact_groups" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q31_dedup_exact_survivors" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        | SELECT doc_id, lang, source, n_chars,
        |  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        | FROM documents) t WHERE rn = 1""".stripMargin,
    "q32_minhash_lsh_pairs" -> minhashOracle(),
    "q111_minhash_calibration" -> minhashCalibrationOracle(),
    "q114_hamming_histogram" ->
      (simhashFpCte() +
        s""",
          |hp AS (
          | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          | WHERE $simhashPairPredicate)
          |SELECT hamming, count(*) AS n_pairs,
          | count(DISTINCT doc_a) AS n_docs_a, count(DISTINCT doc_b) AS n_docs_b
          |FROM hp GROUP BY hamming""".stripMargin),
    "q115_source_sketch_similarity" -> sourceSketchOracle(),
    "q116_pmi_collocations" ->
      s"""WITH dd AS (
        | SELECT lang, w, coalesce(len(w), 0) AS nw FROM
        |  (SELECT lang, $tokens AS w FROM documents WHERE lang IS NOT NULL) t0),
        |uc AS (SELECT lang, tok, count(*) AS cu
        | FROM (SELECT lang, unnest(w) AS tok FROM dd) t GROUP BY 1, 2),
        |nu AS (SELECT lang, CAST(sum(cu) AS BIGINT) AS nu FROM uc GROUP BY 1),
        |bg AS (SELECT lang, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT)+1] AS w2
        | FROM (SELECT lang, w, unnest(range(1, nw)) AS i FROM dd WHERE nw >= 2) t),
        |bc AS (SELECT lang, w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2, 3),
        |nb AS (SELECT lang, CAST(sum(cb) AS BIGINT) AS nb FROM bc GROUP BY 1),
        |sc AS (SELECT bc.lang, bc.w1, bc.w2, bc.cb,
        |  round(log10((CAST(bc.cb AS DOUBLE) * nu.nu * nu.nu) /
        |    (CAST(nb.nb AS DOUBLE) * u1.cu * u2.cu)), 6) AS pmi
        | FROM bc
        | JOIN uc u1 ON bc.lang = u1.lang AND bc.w1 = u1.tok
        | JOIN uc u2 ON bc.lang = u2.lang AND bc.w2 = u2.tok
        | JOIN nu ON bc.lang = nu.lang
        | JOIN nb ON bc.lang = nb.lang
        | WHERE bc.cb >= 3),
        |rk AS (SELECT lang, w1, w2, cb, pmi,
        |  row_number() OVER (PARTITION BY lang ORDER BY pmi DESC, w1, w2) AS rk
        | FROM sc)
        |SELECT lang, w1, w2, CAST(cb AS BIGINT) AS cb, pmi,
        | CAST(rk AS INTEGER) AS rank
        |FROM rk WHERE rk <= 20""".stripMargin,
    "q117_snapshot_diff" ->
      """WITH olds AS (
        | SELECT doc_id, source,
        |  CASE WHEN doc_id % 23 = 5 THEN md5('rev0:' || coalesce(text, '∅'))
        |       ELSE md5(text) END AS h_old
        | FROM documents WHERE doc_id % 17 <> 3),
        |news AS (
        | SELECT doc_id, source AS source_new, md5(text) AS h_new
        | FROM documents WHERE doc_id % 19 <> 7),
        |j AS (
        | SELECT coalesce(o.source, n.source_new) AS source,
        |  o.doc_id AS od, n.doc_id AS nd, o.h_old, n.h_new
        | FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id)
        |SELECT source,
        | CAST(sum(CASE WHEN od IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        | CAST(sum(CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        | CAST(sum(CASE WHEN od IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        | CAST(sum(CASE WHEN nd IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        | CAST(sum(CASE WHEN od IS NOT NULL AND nd IS NOT NULL
        |   AND h_old IS DISTINCT FROM h_new THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        | CAST(sum(CASE WHEN od IS NOT NULL AND nd IS NOT NULL
        |   AND h_old IS NOT DISTINCT FROM h_new THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM j GROUP BY source""".stripMargin,
    "q118_cluster_size_histogram" ->
      (dupClustersCte +
        """,
          |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1),
          |h AS (SELECT cluster_size, count(*) AS n_clusters,
          |  CAST(sum(cluster_size) AS BIGINT) AS n_docs FROM sz GROUP BY 1),
          |tot AS (SELECT (SELECT count(*) FROM documents) -
          |  (SELECT count(*) FROM clusters) AS singles)
          |SELECT cluster_size, n_clusters, n_docs FROM h
          |UNION ALL
          |SELECT CAST(1 AS BIGINT), singles, singles FROM tot WHERE singles > 0""".stripMargin),
    "q119_bm25_topdocs" ->
      s"""WITH dl AS (
        | SELECT doc_id, w, len(w) AS len FROM
        |  (SELECT doc_id, $tokens AS w FROM documents WHERE text IS NOT NULL) t0),
        |dfx AS (SELECT tok, count(*) AS df
        | FROM (SELECT doc_id, unnest(list_distinct(w)) AS tok FROM dl) t GROUP BY 1),
        |q AS (SELECT tok, df FROM dfx ORDER BY df DESC, tok LIMIT 5),
        |c AS (SELECT count(*) AS n_docs, CAST(sum(len) AS DOUBLE)/count(*) AS avgdl FROM dl),
        |tfx AS (SELECT e.doc_id, e.tok, count(*) AS tf, min(e.len) AS len
        | FROM (SELECT doc_id, len, unnest(w) AS tok FROM dl) e
        | JOIN q ON e.tok = q.tok GROUP BY 1, 2),
        |sc AS (SELECT tfx.tok, tfx.doc_id, tfx.tf,
        |  round(log10((CAST(c.n_docs AS DOUBLE) - q.df + 0.5) /
        |     (CAST(q.df AS DOUBLE) + 0.5) + 1) *
        |   (CAST(tfx.tf AS DOUBLE) * (1.2 + 1)) /
        |   (CAST(tfx.tf AS DOUBLE) +
        |    1.2 * (1 - 0.75 + 0.75 * (CAST(tfx.len AS DOUBLE) / c.avgdl))), 6) AS score
        | FROM tfx JOIN q ON tfx.tok = q.tok CROSS JOIN c),
        |rk AS (SELECT tok AS term, doc_id, tf, score,
        |  row_number() OVER (PARTITION BY tok ORDER BY score DESC, doc_id) AS rk2
        | FROM sc)
        |SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, score,
        | CAST(rk2 AS INTEGER) AS rank
        |FROM rk WHERE rk2 <= 10""".stripMargin,
    "q120_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe, label AS ql
        |  FROM embeddings WHERE vec_id % 100 = 0 AND label IS NOT NULL),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce, label AS cl
        |  FROM embeddings WHERE label IS NOT NULL),
        |s AS (SELECT query_id, neighbor_id,
        |  list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*ce[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(ce)+1), i -> ce[i]*ce[i])))) AS cosine
        | FROM q CROSS JOIN c WHERE query_id <> neighbor_id AND cl <> ql),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        | FROM s WHERE cosine IS NOT NULL)
        |SELECT query_id, neighbor_id, round(cosine,6) AS cosine, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 5""".stripMargin,
    "q113_cohort_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events),
        |c AS (SELECT user_id, min(h) AS cohort_h FROM e GROUP BY user_id),
        |a AS (SELECT e.user_id, e.h, c.cohort_h FROM e JOIN c ON e.user_id = c.user_id),
        |m AS (SELECT cohort_h,
        |  CAST((epoch_us(h) - epoch_us(cohort_h)) / 3600000000 AS BIGINT) AS offset_h,
        |  count(DISTINCT user_id) AS n_active FROM a GROUP BY 1, 2),
        |sz AS (SELECT cohort_h, count(*) AS cohort_size FROM c GROUP BY cohort_h)
        |SELECT m.cohort_h AS cohort_h, offset_h, CAST(n_active AS BIGINT) AS n_active,
        | CAST(cohort_size AS BIGINT) AS cohort_size,
        | round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM m JOIN sz ON m.cohort_h = sz.cohort_h""".stripMargin,
    "q112_skew_profile" ->
      """SELECT 'lineitem' AS table_name, 'l_orderkey' AS column_name,
        | CAST(sum(f) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(max(f) AS BIGINT) AS max_freq,
        | round(CAST(max(f) AS DOUBLE) * count(*) / CAST(sum(f) AS DOUBLE), 6) AS skew_ratio,
        | substr(max(lpad(CAST(f AS VARCHAR), 20, '0') || '|' || key), 22) AS top_key
        |FROM (SELECT coalesce(CAST(l_orderkey AS VARCHAR), '<NULL>') AS key, count(*) AS f
        |      FROM lineitem GROUP BY 1) t_lineitem_l_orderkey
        |UNION ALL
        |SELECT 'lineitem' AS table_name, 'l_partkey' AS column_name,
        | CAST(sum(f) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(max(f) AS BIGINT) AS max_freq,
        | round(CAST(max(f) AS DOUBLE) * count(*) / CAST(sum(f) AS DOUBLE), 6) AS skew_ratio,
        | substr(max(lpad(CAST(f AS VARCHAR), 20, '0') || '|' || key), 22) AS top_key
        |FROM (SELECT coalesce(CAST(l_partkey AS VARCHAR), '<NULL>') AS key, count(*) AS f
        |      FROM lineitem GROUP BY 1) t_lineitem_l_partkey
        |UNION ALL
        |SELECT 'lineitem' AS table_name, 'l_suppkey' AS column_name,
        | CAST(sum(f) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(max(f) AS BIGINT) AS max_freq,
        | round(CAST(max(f) AS DOUBLE) * count(*) / CAST(sum(f) AS DOUBLE), 6) AS skew_ratio,
        | substr(max(lpad(CAST(f AS VARCHAR), 20, '0') || '|' || key), 22) AS top_key
        |FROM (SELECT coalesce(CAST(l_suppkey AS VARCHAR), '<NULL>') AS key, count(*) AS f
        |      FROM lineitem GROUP BY 1) t_lineitem_l_suppkey
        |UNION ALL
        |SELECT 'orders' AS table_name, 'o_custkey' AS column_name,
        | CAST(sum(f) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(max(f) AS BIGINT) AS max_freq,
        | round(CAST(max(f) AS DOUBLE) * count(*) / CAST(sum(f) AS DOUBLE), 6) AS skew_ratio,
        | substr(max(lpad(CAST(f AS VARCHAR), 20, '0') || '|' || key), 22) AS top_key
        |FROM (SELECT coalesce(CAST(o_custkey AS VARCHAR), '<NULL>') AS key, count(*) AS f
        |      FROM orders GROUP BY 1) t_orders_o_custkey
        |UNION ALL
        |SELECT 'events' AS table_name, 'user_id' AS column_name,
        | CAST(sum(f) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(max(f) AS BIGINT) AS max_freq,
        | round(CAST(max(f) AS DOUBLE) * count(*) / CAST(sum(f) AS DOUBLE), 6) AS skew_ratio,
        | substr(max(lpad(CAST(f AS VARCHAR), 20, '0') || '|' || key), 22) AS top_key
        |FROM (SELECT coalesce(CAST(user_id AS VARCHAR), '<NULL>') AS key, count(*) AS f
        |      FROM events GROUP BY 1) t_events_user_id
        |UNION ALL
        |SELECT 'documents' AS table_name, 'source' AS column_name,
        | CAST(sum(f) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(max(f) AS BIGINT) AS max_freq,
        | round(CAST(max(f) AS DOUBLE) * count(*) / CAST(sum(f) AS DOUBLE), 6) AS skew_ratio,
        | substr(max(lpad(CAST(f AS VARCHAR), 20, '0') || '|' || key), 22) AS top_key
        |FROM (SELECT coalesce(CAST(source AS VARCHAR), '<NULL>') AS key, count(*) AS f
        |      FROM documents GROUP BY 1) t_documents_source
        |UNION ALL
        |SELECT 'documents' AS table_name, 'lang' AS column_name,
        | CAST(sum(f) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(max(f) AS BIGINT) AS max_freq,
        | round(CAST(max(f) AS DOUBLE) * count(*) / CAST(sum(f) AS DOUBLE), 6) AS skew_ratio,
        | substr(max(lpad(CAST(f AS VARCHAR), 20, '0') || '|' || key), 22) AS top_key
        |FROM (SELECT coalesce(CAST(lang AS VARCHAR), '<NULL>') AS key, count(*) AS f
        |      FROM documents GROUP BY 1) t_documents_lang""".stripMargin,
    "q74_dup_clusters" -> dupClustersOracle,
    "q33_word_jaccard_pairs" ->
      s"""WITH l AS (SELECT doc_id AS doc_a, lang, list_distinct($tokens) AS wa
        |  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 50000),
        |r AS (SELECT doc_id AS doc_b, lang, list_distinct($tokens) AS wb FROM documents),
        |j AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(wa, wb)) AS DOUBLE) /
        |   len(list_distinct(list_concat(wa, wb))) AS jac
        | FROM l JOIN r USING (lang) WHERE doc_a < doc_b)
        |SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM j WHERE jac >= 0.1""".stripMargin,
    // simhash parity: word hash = 60-bit md5 hex prefix, computed
    // bit-identically by Spark (conv(substr(md5,1,15),16,10)) and DuckDB
    // (('0x'||substr(md5,1,15))::BIGINT); fingerprint bit b = majority vote.
    "q34_simhash_fingerprints" ->
      (simhashFpCte() +
        """
          |SELECT doc_id, simhash,
          | (simhash >> 0) & 32767 AS band_0,
          | (simhash >> 15) & 32767 AS band_1,
          | (simhash >> 30) & 32767 AS band_2,
          | (simhash >> 45) & 32767 AS band_3
          |FROM fp""".stripMargin),
    "q35_simhash_pairs" ->
      (simhashFpCte() +
        s"""
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           | CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
           |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
           |WHERE $simhashPairPredicate""".stripMargin),
    // hyperplane coefficients from the 32-bit md5 prefix of "plane_dim" —
    // same cross-engine determinism trick as q34/q35.
    "q38_lsh_bucket_stats" ->
      """WITH v AS (
        | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |b AS (
        | -- null vector => null bucket (engine parity; ragged rows are
        | -- out of the fixed-dim embeddings contract)
        | SELECT vec_id, label,
        |  CAST(CASE WHEN e IS NULL THEN NULL ELSE
        |   list_sum(list_transform(range(0,8), p ->
        |   CASE WHEN list_sum(list_transform(range(1, len(e)+1),
        |     i -> e[i] * (((('0x' || substring(md5(CAST(p AS VARCHAR) || '_' ||
        |            CAST(i-1 AS VARCHAR)),1,8))::BIGINT % 1000000)/1000000.0) - 0.5)))
        |     >= 0 THEN (1::BIGINT << p) ELSE 0 END)) END AS BIGINT) AS bucket
        | FROM v)
        |SELECT bucket, count(*) AS n_vectors, count(DISTINCT label) AS n_labels
        |FROM b GROUP BY bucket""".stripMargin,
    // the full IVF pipeline replayed in SQL: md5-derived hyperplane cells
    // (as q38), per-cell centroids, top-nprobe routing with (c_cos, cell)
    // tie-break, probed-cell scan, exact top-k — every stage is integer- or
    // fixed-order-arithmetic deterministic, so the "approximate" ANN output
    // is exactly reproducible wrt its own definition
    "q37_ivf_topk" ->
      (ivfCte +
        """
          |SELECT query_id, neighbor_id, round(cosine,6) AS cosine, CAST(rn AS INTEGER) AS rn
          |FROM r WHERE rn <= 5""".stripMargin),
    // the IVF ranking intersected with the brute-force ranking per query
    // — approximation honesty for the cosine index (q107's sibling)
    "q110_ivf_recall" ->
      (ivfCte +
        """,
          |ivfr AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5),
          |bs AS (SELECT q2.query_id, c.vec_id AS neighbor_id,
          |  list_sum(list_transform(range(1, len(q2.qe)+1), i -> q2.qe[i]*c.e[i])) /
          |   (sqrt(list_sum(list_transform(range(1, len(q2.qe)+1), i -> q2.qe[i]*q2.qe[i]))) *
          |    sqrt(list_sum(list_transform(range(1, len(c.e)+1), i -> c.e[i]*c.e[i])))) AS cosine
          | FROM (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 0) q2
          | CROSS JOIN v c WHERE q2.query_id <> c.vec_id),
          |br AS (SELECT query_id, neighbor_id FROM (
          | SELECT query_id, neighbor_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
          | FROM bs WHERE cosine IS NOT NULL) t WHERE rn <= 5),
          |hits AS (SELECT b.query_id, count(*) AS h
          | FROM ivfr i JOIN br b
          |   ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
          | GROUP BY b.query_id)
          |SELECT q3.query_id, CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
          | round(CAST(coalesce(h, 0) AS DOUBLE) / 5, 6) AS recall
          |FROM (SELECT DISTINCT query_id FROM br) q3
          |LEFT JOIN hits ON q3.query_id = hits.query_id""".stripMargin),
    // DSIR importance resampling: hashed unigram+bigram models (60-bit md5
    // hash folded to 256 buckets — the q91 feature spelling), add-one
    // smoothed log importance ratio per doc (per-gram terms rounded then
    // DECIMAL-summed — the q99 discipline), deterministic Gumbel-top-k
    // selection keyed by the md5 id lottery
    "q123_dsir_resample" ->
      s"""WITH w AS (SELECT doc_id, lang, source, $tokens AS ws FROM documents),
        |g AS (
        | SELECT doc_id, lang, unnest(ws) AS g FROM w
        | UNION ALL
        | SELECT doc_id, lang, unnest(list_transform(range(1, len(ws)),
        |   i -> ws[i] || ' ' || ws[i+1])) AS g
        | FROM w WHERE len(ws) >= 2),
        |gb AS (SELECT doc_id, lang,
        |  ('0x' || substring(md5(g),1,15))::BIGINT % 256 AS b FROM g),
        |cnt AS (SELECT b,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tb,
        |  CAST(count(*) AS BIGINT) AS rb
        | FROM gb GROUP BY b),
        |tot AS (SELECT CAST(sum(tb) AS BIGINT) AS t_tot,
        |  CAST(sum(rb) AS BIGINT) AS r_tot FROM cnt),
        |m AS (SELECT b,
        |  CAST(round(ln((tb + 1.0) / (t_tot + 256.0)) -
        |             ln((rb + 1.0) / (r_tot + 256.0)), 6) AS DECIMAL(18,6)) AS term
        | FROM cnt CROSS JOIN tot),
        |sc AS (SELECT gb.doc_id,
        |  sum(CAST(m.term AS DECIMAL(28,6))) AS logw
        | FROM gb JOIN m ON gb.b = m.b GROUP BY gb.doc_id),
        |keyed AS (SELECT d.doc_id, d.source,
        |  coalesce(sc.logw, CAST(0 AS DECIMAL(28,6))) AS logw,
        |  coalesce(sc.logw, CAST(0 AS DECIMAL(28,6))) +
        |   CAST(round(-ln(-ln(((('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT
        |     % 1000000) + 0.5) / 1000000.0)), 6) AS DECIMAL(18,6)) AS sel_key
        | FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
        |r AS (SELECT doc_id, source, logw, sel_key,
        |  row_number() OVER (ORDER BY sel_key DESC, doc_id) AS rank
        | FROM keyed)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id, source,
        | round(CAST(logw AS DOUBLE), 6) AS logw,
        | round(CAST(sel_key AS DOUBLE), 6) AS sel_key
        |FROM r WHERE rank <= 100""".stripMargin,
    // the routed hard-negative miner: the q37 IVF replay over the labeled
    // corpus with the different-label filter in the probed-cell scan
    "q121_ivf_hard_negatives" ->
      (ivfLabCte +
        """
          |SELECT query_id, neighbor_id, round(cosine,6) AS cosine, CAST(rn AS INTEGER) AS rn
          |FROM r WHERE rn <= 5""".stripMargin),
    // approximation honesty for the routed miner: recall@k vs the q120
    // brute-force hard-negative ground truth (q110's exact shape)
    "q122_hard_negative_recall" ->
      (ivfLabCte +
        """,
          |ivfr AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5),
          |bs AS (SELECT q2.query_id, c.vec_id AS neighbor_id,
          |  list_sum(list_transform(range(1, len(q2.qe)+1), i -> q2.qe[i]*c.e[i])) /
          |   (sqrt(list_sum(list_transform(range(1, len(q2.qe)+1), i -> q2.qe[i]*q2.qe[i]))) *
          |    sqrt(list_sum(list_transform(range(1, len(c.e)+1), i -> c.e[i]*c.e[i])))) AS cosine
          | FROM (SELECT vec_id AS query_id, label AS ql, e AS qe
          |        FROM v WHERE vec_id % 100 = 0) q2
          | CROSS JOIN v c WHERE q2.query_id <> c.vec_id AND c.label <> q2.ql),
          |br AS (SELECT query_id, neighbor_id FROM (
          | SELECT query_id, neighbor_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
          | FROM bs WHERE cosine IS NOT NULL) t WHERE rn <= 5),
          |hits AS (SELECT b.query_id, count(*) AS h
          | FROM ivfr i JOIN br b
          |   ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
          | GROUP BY b.query_id)
          |SELECT q3.query_id, CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
          | round(CAST(coalesce(h, 0) AS DOUBLE) / 5, 6) AS recall
          |FROM (SELECT DISTINCT query_id FROM br) q3
          |LEFT JOIN hits ON q3.query_id = hits.query_id""".stripMargin),
    "q36_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id % 100 = 0),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |  list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*ce[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(ce)+1), i -> ce[i]*ce[i])))) AS cosine
        | FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        | FROM s WHERE cosine IS NOT NULL)
        |SELECT query_id, neighbor_id, round(cosine,6) AS cosine, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 5""".stripMargin,
    "q39_token_totals" ->
      s"""SELECT source, CAST(sum(len($tokens)) AS BIGINT) AS total_tokens,
        | CAST(sum(CAST(ceil(n_chars/4.0) AS BIGINT)) AS BIGINT) AS est_bpe_tokens,
        | count(*) AS n_docs
        |FROM documents GROUP BY source""".stripMargin,
    "q40_quality_profile" ->
      s"""SELECT lang, round(avg(n_chars),6) AS avg_chars,
        | round(avg(len($tokens)),6) AS avg_tokens,
        | round(avg(CAST(n_chars AS DOUBLE)/len($tokens)),6) AS avg_token_len,
        | count(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,
    "q41_langid_confusion" ->
      s"""SELECT lang,
        | CASE WHEN CAST(len(list_filter($tokens,
        |   w -> w IN ('the','a','and','of','to','in','is','for'))) AS DOUBLE) /
        |   len($tokens) > 0.02 THEN 'en' ELSE 'other' END AS predicted_lang,
        | count(*) AS n_docs
        |FROM documents GROUP BY lang, predicted_lang""".stripMargin,
    "q42_fingerprints" ->
      s"""SELECT doc_id,
        | list_reduce(list_transform($tokens, w -> CAST(ascii(w)+length(w) AS BIGINT)),
        |   (acc, x) -> (acc*31+x) % 1000000007) AS fingerprint,
        | CAST(len($tokens) AS INTEGER) AS n_tokens
        |FROM documents""".stripMargin,
    // the Spark side renders a real PNG per doc and decodes it with
    // javax.imageio; dimensions are a pure function of n_chars, so the
    // oracle checks the whole encode→bytes→decode round trip.
    "q43_multimodal_decode" ->
      """SELECT doc_id,
        | CAST(1 + n_chars % 64 AS BIGINT) AS width,
        | CAST(1 + (n_chars * 7) % 48 AS BIGINT) AS height
        |FROM documents""".stripMargin,
    "q44_frame_sample" ->
      """SELECT doc_id, CAST(t.f AS INTEGER) AS frame_idx, CAST(t.f*256 AS INTEGER) AS byte_offset
        |FROM documents,
        | UNNEST(range(0, greatest(octet_length(encode(text))//256, 1))) AS t(f)""".stripMargin,
    "q45_percentiles" -> percentilesSql,
    // sort-based exact percentiles: same oracle as q45 — proving the
    // buffer-free formulation is value-identical to the builtin
    "q73_percentiles_sorted" -> percentilesSql,
    // sketch gates: the oracle replays the EXACT side and asserts the
    // sketch-bound flags TRUE — the sketch (HLL registers / KLL rank
    // guarantee) is computed and judged Spark-side in the query itself,
    // so an out-of-bound sketch surfaces as a driver hash mismatch
    "q46_approx_distinct" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | count(*) AS n_rows, TRUE AS bound_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q63_percentile_approx" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS qty_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q47_pivot" ->
      """SELECT o_orderpriority,
        | CAST(round(sum(CAST(CASE WHEN o_orderstatus='F' THEN o_totalprice END AS DECIMAL(18,6))),2) AS DOUBLE) AS F,
        | CAST(round(sum(CAST(CASE WHEN o_orderstatus='O' THEN o_totalprice END AS DECIMAL(18,6))),2) AS DOUBLE) AS O,
        | CAST(round(sum(CAST(CASE WHEN o_orderstatus='P' THEN o_totalprice END AS DECIMAL(18,6))),2) AS DOUBLE) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q48_asof_join" ->
      """WITH o AS (
        | SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
        | FROM orders GROUP BY o_custkey, o_orderdate),
        |e AS (SELECT event_id, user_id, ts FROM events)
        |SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
        |FROM e ASOF LEFT JOIN o
        | ON e.user_id = o.user_id AND e.ts >= o.o_orderdate""".stripMargin,
    "q49_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q50_trailing_spend" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate
        |   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW),2) AS DOUBLE) AS trailing_30d
        |FROM orders""".stripMargin,
    "q51_salted_agg" ->
      """SELECT l_suppkey, sum(l_quantity) AS sum_l_quantity, count(*) AS n_rows
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q52_heavy_hitters" ->
      s"""SELECT t.w AS word, count(*) AS n
        |FROM documents, UNNEST($tokens) AS t(w)
        |GROUP BY t.w ORDER BY n DESC, word LIMIT 20""".stripMargin,
    // each event belongs to exactly 4 sliding (1h size, 15m slide) windows:
    // starts floor(t,15m) - k*15m for k=0..3; make_timestamp keeps it naive
    "q53_sliding_windows" ->
      """SELECT make_timestamp((CAST(floor(epoch(ts)/900) AS BIGINT)*900 - t.k*900)*1000000)
        |   AS bucket, event_type, count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(18,6))),2) AS DOUBLE) AS value_sum
        |FROM events, UNNEST([0,1,2,3]) AS t(k)
        |GROUP BY bucket, event_type""".stripMargin,
    "q54_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q55_customer_order_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "q56_supplier_reconcile" ->
      """SELECT coalesce(s_suppkey, l_suppkey) AS suppkey,
        | (s_suppkey IS NOT NULL) AS in_supplier,
        | (l_suppkey IS NOT NULL) AS in_lineitem
        |FROM supplier FULL OUTER JOIN (SELECT DISTINCT l_suppkey FROM lineitem) t
        | ON s_suppkey = l_suppkey""".stripMargin,
    "q57_corpus_prep" ->
      s"""WITH filtered AS (
        | SELECT doc_id, source, text, len($tokens) AS n_tokens
        | FROM documents
        | WHERE lang = 'en' AND len($tokens) BETWEEN 10 AND 1000),
        |deduped AS (
        | SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM filtered) x WHERE rn = 1)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM deduped GROUP BY source""".stripMargin,
    // banded LSH near-dup: candidates share ≥1 of 4 four-bit bands of a
    // 16-plane sign signature (md5-derived coefficients — engine-
    // reproducible, same trick as q38), then exact cosine verify.
    "q58_embedding_neardup" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |bk AS (
        | -- null vector => null bucket (engine parity, as q38)
        | SELECT vec_id, e,
        |  CAST(CASE WHEN e IS NULL THEN NULL ELSE
        |   list_sum(list_transform(range(0,16), p ->
        |   CASE WHEN list_sum(list_transform(range(1, len(e)+1),
        |     i -> e[i] * (((('0x' || substring(md5(CAST(p AS VARCHAR) || '_' ||
        |            CAST(i-1 AS VARCHAR)),1,8))::BIGINT % 1000000)/1000000.0) - 0.5)))
        |     >= 0 THEN (1::BIGINT << p) ELSE 0 END)) END AS BIGINT) AS bucket
        | FROM v),
        |cand AS (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.e AS ea, b.e AS eb
        | FROM bk a JOIN bk b ON a.vec_id < b.vec_id
        | WHERE a.vec_id % 50 = 0
        |   AND (((a.bucket >>  0) & 15) = ((b.bucket >>  0) & 15)
        |     OR ((a.bucket >>  4) & 15) = ((b.bucket >>  4) & 15)
        |     OR ((a.bucket >>  8) & 15) = ((b.bucket >>  8) & 15)
        |     OR ((a.bucket >> 12) & 15) = ((b.bucket >> 12) & 15))),
        |s AS (SELECT vec_a, vec_b,
        |  list_sum(list_transform(range(1, len(ea)+1), i -> ea[i]*eb[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(ea)+1), i -> ea[i]*ea[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(eb)+1), i -> eb[i]*eb[i])))) AS cosine
        | FROM cand)
        |SELECT vec_a, vec_b, round(cosine,6) AS cosine FROM s WHERE cosine >= 0.25""".stripMargin,
    // high nibble of byte i = hex digit at position 2i+1 of the uppercase hex
    // encoding; bucket counts + Shannon entropy via ln(p)/ln(2) to match the
    // Spark-side double arithmetic exactly.
    "q59_multimodal_features" ->
      """WITH hx AS (
        | SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
        | FROM documents),
        |nib AS (
        | SELECT doc_id, n,
        |  list_transform(range(0, CAST(n AS INTEGER)),
        |    i -> substring(h, CAST(i*2+1 AS INTEGER), 1)) AS hs
        | FROM hx),
        |cnt AS (
        | SELECT doc_id, n,
        |  list_transform(['0','1','2','3','4','5','6','7','8','9','A','B','C','D','E','F'],
        |    d -> len(list_filter(hs, c -> c = d))) AS counts
        | FROM nib)
        |SELECT doc_id,
        | CAST(counts[1] AS BIGINT) AS h0,  CAST(counts[2] AS BIGINT) AS h1,
        | CAST(counts[3] AS BIGINT) AS h2,  CAST(counts[4] AS BIGINT) AS h3,
        | CAST(counts[5] AS BIGINT) AS h4,  CAST(counts[6] AS BIGINT) AS h5,
        | CAST(counts[7] AS BIGINT) AS h6,  CAST(counts[8] AS BIGINT) AS h7,
        | CAST(counts[9] AS BIGINT) AS h8,  CAST(counts[10] AS BIGINT) AS h9,
        | CAST(counts[11] AS BIGINT) AS h10, CAST(counts[12] AS BIGINT) AS h11,
        | CAST(counts[13] AS BIGINT) AS h12, CAST(counts[14] AS BIGINT) AS h13,
        | CAST(counts[15] AS BIGINT) AS h14, CAST(counts[16] AS BIGINT) AS h15,
        | round(list_sum(list_transform(counts,
        |   c -> CASE WHEN c > 0
        |        THEN -(CAST(c AS DOUBLE)/n) * ln(CAST(c AS DOUBLE)/n) / ln(2)
        |        ELSE 0.0 END)), 6) AS entropy_bits
        |FROM cnt""".stripMargin,
    "q60_rank_suite" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(rank() OVER w AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        | round(percent_rank() OVER w, 6) AS prnk,
        | round(cume_dist() OVER w, 6) AS cdist,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "q61_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        | CAST(month(o_orderdate) AS INTEGER) AS mon,
        | CAST(EXTRACT(dow FROM o_orderdate)+1 AS INTEGER) AS dow,
        | count(*) AS n_orders
        |FROM orders GROUP BY yr, qtr, mon, dow""".stripMargin,
    // split bucket = md5-hex-prefix of the id string — same engine-
    // reproducible derivation as the simhash word hash.
    "q64_dataset_split" ->
      s"""WITH a AS (
        | SELECT CASE
        |   WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < 80 THEN 'train'
        |   WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < 90 THEN 'val'
        |   ELSE 'test' END AS split,
        |  CAST(len($tokens) AS INTEGER) AS n_tokens
        | FROM documents)
        |SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM a GROUP BY split""".stripMargin,
    "q65_length_bins" ->
      s"""WITH a AS (
        | SELECT CAST(least(ceil(len($tokens) / 16.0), 6) AS INTEGER) AS bin,
        |  CAST(len($tokens) AS INTEGER) AS n_tokens
        | FROM documents)
        |SELECT bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
        |FROM a GROUP BY bin""".stripMargin,
    "q66_contamination" ->
      s"""WITH b AS (
        | SELECT doc_id AS bench_id, list_distinct($tokens) AS wb
        | FROM documents WHERE doc_id % 97 = 0 AND doc_id < 97000),
        |d AS (SELECT doc_id, source, list_distinct($tokens) AS wd FROM documents),
        |j AS (
        | SELECT d.doc_id, d.source, b.bench_id,
        |  CAST(len(list_intersect(wd, wb)) AS DOUBLE) /
        |   len(list_distinct(list_concat(wd, wb))) AS jac
        | FROM d, b WHERE d.doc_id <> b.bench_id)
        |SELECT source, count(DISTINCT doc_id) AS n_contaminated,
        | count(DISTINCT bench_id) AS n_bench_hit
        |FROM j WHERE jac >= 0.8 GROUP BY source""".stripMargin,
    "q68_sequence_packing" ->
      s"""WITH a AS (
        | SELECT lang, doc_id, CAST(len($tokens) AS INTEGER) AS n_tokens FROM documents),
        |b AS (
        | SELECT lang, n_tokens,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        | FROM a)
        |SELECT lang, CAST(floor(before / 2048.0) AS INTEGER) AS pack_id,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM b GROUP BY lang, pack_id""".stripMargin,
    "q69_stratified_sample" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
        |   % 100 < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang""".stripMargin,
    "q70_repetition" ->
      s"""WITH a AS (
        | SELECT doc_id, $tokens AS ws FROM documents),
        |n AS (
        | SELECT doc_id,
        |  list_transform(range(0, greatest(len(ws)-3, 0)+1),
        |    i -> concat_ws(' ', ws[i+1], ws[i+2], ws[i+3])) AS ng
        | FROM a)
        |SELECT doc_id, CAST(len(ng) AS INTEGER) AS n_ngrams,
        | round(1.0 - CAST(len(list_distinct(ng)) AS DOUBLE)/greatest(len(ng),1), 6)
        |   AS rep_ratio,
        | round(1.0 - CAST(len(list_distinct(ng)) AS DOUBLE)/greatest(len(ng),1), 6) > 0.02
        |   AS is_repetitive
        |FROM n""".stripMargin,
    "q71_anomaly" ->
      """WITH h AS (
        | SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |s AS (
        | SELECT bucket, event_type, n,
        |  avg(n) OVER (PARTITION BY event_type) AS mu,
        |  stddev_samp(n) OVER (PARTITION BY event_type) AS sd
        | FROM h)
        |SELECT bucket, event_type, n, round((n - mu)/sd, 6) AS z,
        | abs(round((n - mu)/sd, 6)) > 3 AS is_anomaly
        |FROM s WHERE sd > 0""".stripMargin,
    "q72_trade_flows" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))), 2)
        |   AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY cust_nation, supp_nation, yr""".stripMargin,
    "q67_interval_join" ->
      """SELECT e.event_id, e.user_id,
        | count(o.o_orderdate) AS n_recent_orders,
        | round(coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0), 2) AS recent_spend
        |FROM events e LEFT JOIN orders o
        | ON o.o_custkey = e.user_id
        | AND o.o_orderdate <= e.ts
        | AND o.o_orderdate >= e.ts - INTERVAL 30 DAY
        |GROUP BY e.event_id, e.user_id""".stripMargin,
    "q62_scalar_suite" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_quantity - 25) AS qty_dev,
        | -- domain guard: DuckDB ERRORS on sqrt(negative) where Spark
        | -- silently yields NaN; undefined input => NULL on both sides
        | CASE WHEN l_extendedprice >= 0
        |      THEN round(sqrt(l_extendedprice), 6) END AS price_sqrt,
        | round(pow(l_discount + 1.0, 2), 6) AS disc_sq,
        | CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
        | greatest(l_tax, l_discount) AS max_rate,
        | coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
        |FROM lineitem""".stripMargin,
    // 1-based substr positions; texts shorter than n yield one truncated
    // shingle — identical convention to Dedup.charShingles. Shingles are
    // hashed to 60-bit longs exactly as Dedup.charShingleHashes does
    // (15-hex md5 prefix), so both engines intersect identical long sets.
    "q75_char_ngram_jaccard" ->
      """WITH l AS (SELECT doc_id AS doc_a, lang,
        |  list_distinct(list_transform(
        |   list_distinct(list_transform(range(1, greatest(len(text)-4, 1)+1),
        |    i -> substr(text, CAST(i AS INT), 5))),
        |   g -> CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT))) AS ga
        |  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 50000),
        |r AS (SELECT doc_id AS doc_b, lang,
        |  list_distinct(list_transform(
        |   list_distinct(list_transform(range(1, greatest(len(text)-4, 1)+1),
        |    i -> substr(text, CAST(i AS INT), 5))),
        |   g -> CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT))) AS gb
        |  FROM documents),
        |j AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(ga, gb)) AS DOUBLE) /
        |   len(list_distinct(list_concat(ga, gb))) AS jac
        | FROM l JOIN r USING (lang) WHERE doc_a < doc_b)
        |SELECT doc_a, doc_b, round(jac, 6) AS jaccard
        |FROM j WHERE jac >= 0.2""".stripMargin,
    "q76_token_rarity" ->
      s"""WITH dt AS (SELECT doc_id, unnest(list_distinct($tokens)) AS tok
        |  FROM documents),
        |df AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(df) AS BIGINT) AS sum_df,
        | round(CAST(sum(df) AS DOUBLE) / count(*), 6) AS avg_df,
        | CAST(sum(CASE WHEN df * 4 < n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |FROM dt JOIN df USING (tok) CROSS JOIN n
        |GROUP BY doc_id""".stripMargin,
    // every per-element step is one IEEE double op in the same order as the
    // Spark side, so codes match bit-for-bit; errors are rounded per element
    // and summed as DECIMAL (order-independent) — see Quantization scaladoc
    "q77_embedding_quant" ->
      """WITH e AS (SELECT vec_id,
        |  CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS dim,
        |  CAST(unnest(embedding) AS DOUBLE) AS x
        | FROM embeddings),
        |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim),
        |q AS (SELECT vec_id, x, mn, mx,
        |  CASE WHEN mx = mn THEN 0
        |   ELSE CAST(least(255, floor((x - mn) / (mx - mn) * 256.0)) AS BIGINT)
        |  END AS code
        | FROM e JOIN st USING (dim)),
        |err AS (SELECT vec_id, code,
        |  CASE WHEN mx = mn THEN CAST(0 AS DECIMAL(18,9))
        |   ELSE CAST(round(abs(x - (mn + (code + 0.5) * ((mx - mn) / 256.0))), 9)
        |     AS DECIMAL(18,9))
        |  END AS e9
        | FROM q)
        |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
        | min(code) AS code_min, max(code) AS code_max,
        | round(CAST(sum(e9) AS DOUBLE), 6) AS sum_abs_err,
        | round(CAST(max(e9) AS DOUBLE), 6) AS max_abs_err
        |FROM err GROUP BY vec_id""".stripMargin,
    // winnowing: positional k-grams (list slices clamp like concat_ws drops
    // out-of-range NULLs), 15-hex md5 hashes, per-window minima — all
    // integer-exact, mirroring TextStats.winnowFingerprints stage by stage
    "q78_winnow_fingerprints" -> winnowFpSql,
    // same df-cap predicate as the engine (TextStats.dfCapped): keys
    // shared by > 128 docs are dropped before the pair join
    "q79_winnow_pairs" ->
      (winnowFpCte +
        """,
          |fpk AS (SELECT doc_id, fp FROM fp
          |  QUALIFY count(*) OVER (PARTITION BY fp) <= 128)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
          |FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
          |GROUP BY doc_a, doc_b HAVING count(*) >= 2""".stripMargin),
    // q168: the q79 winnow pairs + the exhaustive shared-6-gram ground
    // truth (the theorem's w+k-1 granularity) banded by overlap
    "q168_winnow_recall" ->
      (winnowFpCte +
        """,
          |fpk AS (SELECT doc_id, fp FROM fp
          |  QUALIFY count(*) OVER (PARTITION BY fp) <= 128),
          |wp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          | FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
          | GROUP BY 1, 2 HAVING count(*) >= 2),
          |g6 AS (SELECT doc_id, list_transform(range(0, greatest(len(w)-6,0)+1),
          |  i -> array_to_string(w[CAST(i+1 AS INT):CAST(i+6 AS INT)], ' ')) AS grams
          | FROM ws),
          |f6 AS (SELECT DISTINCT doc_id,
          |  CAST(('0x' || substring(md5(g2), 1, 15)) AS BIGINT) AS h
          | FROM (SELECT doc_id, unnest(grams) AS g2 FROM g6) t
          | WHERE g2 IS NOT NULL),
          |f6k AS (SELECT doc_id, h FROM f6
          |  QUALIFY count(*) OVER (PARTITION BY h) <= 128),
          |tp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |  count(*) AS n_shared
          | FROM f6k a JOIN f6k b ON a.h = b.h AND a.doc_id < b.doc_id
          | GROUP BY 1, 2 HAVING count(*) >= 1),
          |jj AS (SELECT tp.n_shared,
          |  CASE WHEN wp.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
          | FROM tp LEFT JOIN wp
          |   ON tp.doc_a = wp.doc_a AND tp.doc_b = wp.doc_b)
          |SELECT CASE WHEN n_shared >= 5 THEN '5+'
          |  WHEN n_shared >= 2 THEN '2-4' ELSE '1' END AS band,
          | count(*) AS n_true_pairs,
          | CAST(sum(hit) AS BIGINT) AS n_caught,
          | round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS recall
          |FROM jj GROUP BY 1""".stripMargin),
    // chunk boundaries/hashes are pure integer+md5 arithmetic; slices clamp
    // identically (Spark slice length vs DuckDB [a:b] both truncate at end)
    "q80_chunking" ->
      s"""WITH ws AS (SELECT doc_id, $tokens AS w FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n_tokens,
        |  CAST(unnest(range(0, greatest(len(w), 1), 96)) AS INT) AS chunk_start
        | FROM ws),
        |x AS (SELECT doc_id, chunk_start,
        |  CAST(least(128, n_tokens - chunk_start) AS INT) AS chunk_len,
        |  array_to_string(w[chunk_start+1:chunk_start+least(128, n_tokens - chunk_start)], ' ') AS chunk_text
        | FROM c)
        |SELECT doc_id, CAST(chunk_start / 96 AS INT) AS chunk_idx,
        | chunk_start, chunk_len,
        | CAST(('0x' || substring(md5(chunk_text), 1, 15)) AS BIGINT) AS chunk_hash
        |FROM x""".stripMargin,
    "q81_dedup_apply" ->
      (dupClustersCte +
        """
          |SELECT d.doc_id, d.lang, d.source, d.n_chars
          |FROM documents d
          |WHERE d.doc_id NOT IN
          |  (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)""".stripMargin),
    // PII markers are planted doc_id-derived (identical arithmetic in both
    // engines); patterns use only Java-regex/RE2-common syntax; DuckDB's
    // regexp_replace needs the 'g' flag to match Spark's replace-all
    "q82_pii_redaction" ->
      """WITH t AS (
        | SELECT source,
        |  text ||
        |   CASE WHEN doc_id % 7 = 0
        |        THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |        ELSE '' END ||
        |   CASE WHEN doc_id % 11 = 0
        |        THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |        ELSE '' END AS text2
        | FROM documents),
        |r AS (
        | SELECT source, text2,
        |  regexp_replace(
        |    regexp_replace(text2, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS redacted
        | FROM t)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN regexp_matches(text2, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
        | CAST(sum(CASE WHEN regexp_matches(text2, '([0-9]{1,3}\.){3}[0-9]{1,3}')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_ip,
        | CAST(sum(length(text2) - length(redacted)) AS BIGINT) AS chars_removed
        |FROM r GROUP BY source""".stripMargin,
    // Lloyd k-means unrolled: init cell = vec_id % 8, two (centroid →
    // argmax-cosine) rounds — centroids decimal-summed, the assignment key
    // rounded to 12 dp with ties to lowest cell, exactly as the engine
    "q83_kmeans_cells" ->
      (kmeansCte +
        """
          |SELECT cell, count(*) AS n_members,
          | round(CAST(sum(CAST(list_sum(e) AS DECIMAL(28,15))) AS DOUBLE), 6) AS member_checksum,
          | count(DISTINCT label) AS n_labels
          |FROM a2 GROUP BY cell""".stripMargin),
    // every positional 8-gram hash (distinct per doc), self-joined — the
    // same md5-prefix hashing as the winnow CTE, minus the min-window
    // same df-cap predicate as the engine (TextStats.dfCapped)
    "q84_shared_gram_pairs" ->
      (allGramCte(8) +
        """,
          |fpk AS (SELECT doc_id, h FROM fp
          |  QUALIFY count(*) OVER (PARTITION BY h) <= 128)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
          |FROM fpk a JOIN fpk b ON a.h = b.h AND a.doc_id < b.doc_id
          |GROUP BY doc_a, doc_b HAVING count(*) >= 3""".stripMargin),
    // q160: q84's gram CTE kept positional (no distinct), diagonal
    // gaps-and-islands runs, all-integer outputs; k / dfCap / minSpan
    // interpolated from the TextStats constants so the engines cannot
    // silently desync
    "q160_longest_shared_span" ->
      (s"""WITH ws AS (SELECT doc_id, $tokens AS w FROM documents),
        |gp AS (
        | SELECT doc_id, CAST(t.i AS BIGINT) AS wpos,
        |  CAST(('0x' || substring(md5(
        |    array_to_string(w[CAST(t.i+1 AS INT):CAST(t.i+${analytics.TextStats.SpanGramK} AS INT)], ' ')
        |   ), 1, 15)) AS BIGINT) AS h
        | FROM ws, UNNEST(range(0, greatest(len(w)-${analytics.TextStats.SpanGramK}, 0)+1)) t(i)),
        |okh AS (
        | SELECT h FROM (
        |  SELECT h, count(DISTINCT doc_id) AS df FROM gp GROUP BY h) x
        | WHERE df <= ${analytics.TextStats.SpanDfCap}),
        |cp AS (SELECT gp.doc_id, gp.wpos, gp.h FROM gp JOIN okh USING (h)),
        |m AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  a.wpos AS pos_a, b.wpos AS pos_b
        | FROM cp a JOIN cp b ON a.h = b.h AND a.doc_id < b.doc_id),
        |isl AS (
        | SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a,
        |  pos_a - row_number() OVER (
        |   PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS grp
        | FROM m),
        |runs AS (
        | SELECT doc_a, doc_b, diag, grp, count(*) AS run
        | FROM isl GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b,
        | CAST(max(run) + ${analytics.TextStats.SpanGramK - 1} AS BIGINT) AS longest_span,
        | CAST(count(*) AS BIGINT) AS n_runs,
        | CAST(sum(run) AS BIGINT) AS n_aligned_grams
        |FROM runs GROUP BY doc_a, doc_b
        |HAVING max(run) + ${analytics.TextStats.SpanGramK - 1}
        |  >= ${analytics.TextStats.SpanMinLen}""".stripMargin),
    // q162: exact integer moments -> rounded stddev -> decimal-summed
    // weight total -> floor allocation capped at stratum size -> md5
    // lottery draw; the allocation join is null-safe (NULL source is its
    // own stratum); budget interpolated from Sampling.NeymanBudget
    "q162_neyman_sample" ->
      s"""WITH base AS (
        | SELECT source, doc_id, coalesce(len($tokens), 0) AS x
        | FROM documents),
        |st AS (
        | SELECT source, count(*) AS sn, CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(x*x) AS BIGINT) AS sx2
        | FROM base GROUP BY 1),
        |s2 AS (
        | SELECT source, sn,
        |  round(sqrt(greatest(CAST(sx2 AS DOUBLE)/sn
        |    - (CAST(sx AS DOUBLE)/sn)*(CAST(sx AS DOUBLE)/sn), 0)), 6)
        |   AS len_stddev
        | FROM st),
        |s3 AS (SELECT source, sn, len_stddev,
        |  round(sn * len_stddev, 6) AS w FROM s2),
        |tot AS (SELECT CAST(sum(CAST(w AS DECIMAL(38,12))) AS DOUBLE)
        |  AS wtot FROM s3),
        |al AS (
        | SELECT source, len_stddev,
        |  CASE WHEN (SELECT wtot FROM tot) > 0
        |   THEN least(CAST(floor(${analytics.Sampling.NeymanBudget} * w
        |     / (SELECT wtot FROM tot)) AS BIGINT), sn)
        |   ELSE 0 END AS n_alloc
        | FROM s3),
        |rk AS (
        | SELECT source, doc_id, x,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM base),
        |fl AS (
        | SELECT r.source, r.doc_id, r.x, r.rn, a.n_alloc, a.len_stddev
        | FROM rk r JOIN al a ON r.source IS NOT DISTINCT FROM a.source)
        |SELECT source, count(*) AS n_docs,
        | max(len_stddev) AS len_stddev,
        | CAST(max(n_alloc) AS BIGINT) AS n_alloc,
        | CAST(sum(CASE WHEN rn <= n_alloc THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_selected,
        | CAST(sum(CASE WHEN rn <= n_alloc THEN x ELSE 0 END) AS BIGINT)
        |   AS selected_tokens,
        | CAST(sum(CASE WHEN rn <= n_alloc THEN doc_id ELSE 0 END) AS BIGINT)
        |   AS selected_checksum
        |FROM fl GROUP BY source""".stripMargin,
    // q161: profile + dominant-type window + class aggregate, all
    // integer/string bands; ASC NULLS LAST explicit on both engines
    "q161_k_anonymity" ->
      """WITH ue AS (
        | SELECT user_id, event_type, ts FROM events WHERE user_id IS NOT NULL),
        |put AS (
        | SELECT user_id, event_type, count(*) AS cnt FROM ue GROUP BY 1, 2),
        |dom AS (
        | SELECT user_id, event_type AS dominant_type FROM (
        |  SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY cnt DESC, event_type ASC NULLS LAST) AS rn
        |  FROM put) x WHERE rn = 1),
        |prof AS (
        | SELECT user_id, count(*) AS n_events, min(ts) AS first_ts,
        |  max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS sens
        | FROM ue GROUP BY 1),
        |p2 AS (
        | SELECT p.user_id, d.dominant_type,
        |  CASE WHEN n_events >= 64 THEN '>=64'
        |       WHEN n_events >= 16 THEN '16-63'
        |       WHEN n_events >= 4 THEN '4-15' ELSE '1-3' END AS activity_band,
        |  hour(first_ts) // 6 AS hour_band, sens
        | FROM prof p JOIN dom d USING (user_id))
        |SELECT dominant_type, activity_band,
        | CAST(hour_band AS BIGINT) AS hour_band,
        | CAST(count(*) AS BIGINT) AS k_users,
        | CAST(count(DISTINCT sens) AS BIGINT) AS l_sensitive,
        | (count(*) < 5 OR count(DISTINCT sens) < 2) AS risky
        |FROM p2 GROUP BY 1, 2, 3""".stripMargin,
    "q85_ngram_contamination" ->
      (allGramCte(8) +
        """,
          |bench AS (SELECT DISTINCT h FROM fp WHERE doc_id % 97 = 0 AND doc_id < 97000),
          |x AS (
          | SELECT f.doc_id, count(*) AS n_grams,
          |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          | FROM fp f LEFT JOIN bench b ON f.h = b.h
          | WHERE f.doc_id % 97 <> 0
          | GROUP BY f.doc_id)
          |SELECT doc_id, n_grams, n_hit,
          | round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS hit_ratio
          |FROM x WHERE round(CAST(n_hit AS DOUBLE) / n_grams, 6) >= 0.5""".stripMargin),
    // q167: q85's bench/flag CTEs verbatim + q64's split CASE, rolled up
    // per split (the release-leakage table)
    "q167_contaminated_split" ->
      (allGramCte(8) +
        s""",
          |bench AS (SELECT DISTINCT h FROM fp WHERE doc_id % 97 = 0 AND doc_id < 97000),
          |x AS (
          | SELECT f.doc_id, count(*) AS n_grams,
          |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          | FROM fp f LEFT JOIN bench b ON f.h = b.h
          | WHERE f.doc_id % 97 <> 0
          | GROUP BY f.doc_id),
          |fl AS (SELECT doc_id FROM x
          | WHERE round(CAST(n_hit AS DOUBLE) / n_grams, 6) >= 0.5),
          |dd AS (
          | SELECT doc_id,
          |  CASE
          |   WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < 80 THEN 'train'
          |   WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < 90 THEN 'val'
          |   ELSE 'test' END AS split,
          |  CAST(len($tokens) AS INTEGER) AS n_tokens
          | FROM documents WHERE doc_id % 97 <> 0),
          |j AS (
          | SELECT dd.split, dd.n_tokens,
          |  CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END AS flag
          | FROM dd LEFT JOIN fl USING (doc_id))
          |SELECT split, count(*) AS n_docs,
          | CAST(sum(flag) AS BIGINT) AS n_contaminated,
          | CAST(coalesce(sum(CASE WHEN flag = 1 THEN n_tokens END), 0)
          |   AS BIGINT) AS contaminated_tokens,
          | round(CAST(sum(flag) AS DOUBLE) / count(*), 6)
          |   AS contamination_rate
          |FROM j GROUP BY split""".stripMargin),
    // the whole assembly replayed: cluster losers (q81's recursive CTE) →
    // exact-dedup window among the remainder → quality band → chunk
    // generation (q80 shape) → q64's split label → per-split accounting
    "q86_training_pipeline" ->
      (dupClustersCte +
        s""",
          |kept AS (
          | SELECT d.doc_id, d.text FROM documents d
          | WHERE d.doc_id NOT IN
          |   (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)),
          |sv AS (
          | SELECT doc_id, text FROM (
          |  SELECT doc_id, text,
          |   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          |  FROM kept) t WHERE rn = 1),
          |q2 AS (
          | SELECT doc_id, $tokens AS w FROM sv
          | WHERE len($tokens) BETWEEN 10 AND 1000),
          |c AS (
          | SELECT doc_id, w, len(w) AS n_tokens,
          |  CAST(unnest(range(0, greatest(len(w), 1), 96)) AS INT) AS chunk_start
          | FROM q2),
          |x AS (
          | SELECT doc_id,
          |  CAST(least(128, n_tokens - chunk_start) AS INT) AS chunk_len
          | FROM c)
          |SELECT CASE
          |  WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < 80 THEN 'train'
          |  WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < 90 THEN 'val'
          |  ELSE 'test' END AS split,
          | count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
          | CAST(sum(chunk_len) AS BIGINT) AS total_chunk_tokens
          |FROM x GROUP BY 1""".stripMargin),
    // SemDeDup replayed: the q83 k-means CTE, then the within-cell pair
    // sweep at the same 12-dp-rounded cosine threshold and keep-lowest rule
    "q87_semdedup" ->
      (kmeansCte +
        """
          |, pairs AS (
          | SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
          |  round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])) /
          |   (sqrt(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*a.e[i]))) *
          |    sqrt(list_sum(list_transform(range(1, len(b.e)+1), i -> b.e[i]*b.e[i])))), 12) AS cos
          | FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
          |hit AS (SELECT cell, vec_a, vec_b FROM pairs WHERE cos >= 0.35),
          |mem AS (SELECT cell, count(*) AS n_members FROM a2 GROUP BY cell),
          |pa AS (SELECT cell, count(*) AS n_dup_pairs FROM hit GROUP BY cell),
          |da AS (SELECT cell, count(*) AS n_dropped,
          |  CAST(sum(vec_b) AS BIGINT) AS dropped_checksum
          | FROM (SELECT DISTINCT cell, vec_b FROM hit) t GROUP BY cell)
          |SELECT m.cell, m.n_members,
          | coalesce(pa.n_dup_pairs, 0) AS n_dup_pairs,
          | coalesce(da.n_dropped, 0) AS n_dropped,
          | coalesce(da.dropped_checksum, 0) AS dropped_checksum
          |FROM mem m LEFT JOIN pa USING (cell) LEFT JOIN da USING (cell)""".stripMargin),
    "q88_gopher_quality" ->
      s"""WITH t AS (
        | SELECT source, $tokens AS ws FROM documents),
        |f AS (
        | SELECT source, coalesce(len(ws), 0) AS nw,
        |  round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws), 6) AS mean_len,
        |  round(CAST(len(list_filter(ws, w -> w IN ('the','a','of','to','and','in'))) AS DOUBLE) / len(ws), 6) AS stop_frac,
        |  round(CAST(len(list_filter(ws, w -> regexp_matches(w, '^[a-z]+$$'))) AS DOUBLE) / len(ws), 6) AS alpha_frac
        | FROM t),
        |g AS (
        | SELECT source,
        |  CASE WHEN nw < 20 OR nw > 90 THEN 1 ELSE 0 END AS f_words,
        |  CASE WHEN mean_len < 4.0 OR mean_len > 5.0 THEN 1 ELSE 0 END AS f_mean_len,
        |  CASE WHEN stop_frac < 0.02 THEN 1 ELSE 0 END AS f_stop,
        |  CASE WHEN alpha_frac < 0.8 THEN 1 ELSE 0 END AS f_alpha
        | FROM f)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(f_words) AS BIGINT) AS n_fail_words,
        | CAST(sum(f_mean_len) AS BIGINT) AS n_fail_mean_len,
        | CAST(sum(f_stop) AS BIGINT) AS n_fail_stopword,
        | CAST(sum(f_alpha) AS BIGINT) AS n_fail_alpha,
        | CAST(sum(CASE WHEN f_words + f_mean_len + f_stop + f_alpha = 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM g GROUP BY source""".stripMargin,
    // √n-weighted mixture: decimal-summed denominator, 12-dp-rounded
    // weight/probability, floored integer bucket threshold — identical
    // operation order to Sampling.temperatureMixture
    "q89_temperature_mixture" ->
      s"""WITH ls AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |w AS (
        | SELECT lang, n_docs,
        |  round(sqrt(n_docs) /
        |   CAST((SELECT sum(CAST(sqrt(n_docs) AS DECIMAL(28,15))) FROM ls) AS DOUBLE), 12) AS weight
        | FROM ls),
        |w2 AS (
        | SELECT lang, n_docs, weight,
        |  CAST(floor(least(1.0, round(250 * weight / n_docs, 12)) * 1000000) AS BIGINT) AS thresh
        | FROM w),
        |k AS (
        | SELECT d.lang,
        |  CASE WHEN ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT % 1000000 < w2.thresh
        |       THEN 1 ELSE 0 END AS kept,
        |  len($tokens) AS n_tokens
        | FROM documents d JOIN w2 ON d.lang = w2.lang),
        |ka AS (
        | SELECT lang, CAST(sum(kept) AS BIGINT) AS n_kept,
        |  CAST(sum(kept * n_tokens) AS BIGINT) AS kept_tokens
        | FROM k GROUP BY lang)
        |SELECT w2.lang, w2.n_docs, round(w2.weight, 6) AS weight,
        | ka.n_kept, ka.kept_tokens
        |FROM w2 JOIN ka USING (lang)""".stripMargin,
    // q80's chunk CTE, then keep the lexicographic-first (doc_id,
    // chunk_idx) instance per chunk hash — same window rule as the engine
    "q90_chunk_dedup" ->
      s"""WITH ws AS (SELECT doc_id, $tokens AS w FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n_tokens,
        |  CAST(unnest(range(0, greatest(len(w), 1), 96)) AS INT) AS chunk_start
        | FROM ws),
        |x AS (SELECT doc_id, chunk_start,
        |  CAST(least(128, n_tokens - chunk_start) AS INT) AS chunk_len,
        |  array_to_string(w[chunk_start+1:chunk_start+least(128, n_tokens - chunk_start)], ' ') AS chunk_text
        | FROM c),
        |h AS (SELECT doc_id, CAST(chunk_start / 96 AS INT) AS chunk_idx,
        |  ('0x' || substring(md5(chunk_text), 1, 15))::BIGINT AS chunk_hash
        | FROM x),
        |r AS (SELECT doc_id,
        |  row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) AS rn
        | FROM h)
        |SELECT doc_id, count(*) AS n_chunks,
        | CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM r GROUP BY doc_id""".stripMargin,
    // hashed bag-of-tokens linear classifier: integer count-difference
    // weights (pos_b*N - neg_b*P — no libm), md5 feature buckets, md5
    // lottery re-inclusion — identical arithmetic to the engine
    "q91_classifier_filter" ->
      s"""WITH tb AS (
        | SELECT doc_id, source, (lang = 'en') AS pos,
        |  ('0x' || substring(md5(w), 1, 15))::BIGINT % 256 AS b
        | FROM (SELECT doc_id, source, lang, unnest($tokens) AS w FROM documents) t),
        |counts AS (
        | SELECT b,
        |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos_b,
        |  CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS neg_b
        | FROM tb GROUP BY b),
        |w AS (
        | SELECT b,
        |  CAST(pos_b AS DECIMAL(38,0)) * (SELECT CAST(sum(neg_b) AS BIGINT) FROM counts)
        |   - CAST(neg_b AS DECIMAL(38,0)) * (SELECT CAST(sum(pos_b) AS BIGINT) FROM counts) AS wt
        | FROM counts),
        |sc AS (
        | SELECT t.doc_id, t.source,
        |  sum(coalesce(w.wt, CAST(0 AS DECIMAL(38,0)))) AS score
        | FROM tb t LEFT JOIN w USING (b) GROUP BY t.doc_id, t.source),
        |sc2 AS (
        | -- join on the PK only: USING (doc_id, source) would fail to
        | -- match a NULL source (NULL = NULL is not true) and wrongly
        | -- zero that doc's score; source rides along from documents
        | SELECT d.doc_id, d.source,
        |  coalesce(sc.score, CAST(0 AS DECIMAL(38,0))) AS score
        | FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |k AS (
        | SELECT source, score,
        |  (score > 0 OR
        |   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10 = 0) AS kept
        | FROM sc2)
        |SELECT source, kept, count(*) AS n_docs,
        | CAST(CAST(sum(score) AS DECIMAL(38,0)) AS DOUBLE) AS sum_score
        |FROM k GROUP BY source, kept""".stripMargin,
    // D4 prototype pruning replayed: the q83 k-means CTE, a THIRD centroid
    // pass over the final assignment, 12-dp-rounded cosine-to-centroid,
    // per-cell rank (pcos desc, vec_id) and floor(n/4) prune count
    "q92_proto_prune" ->
      (kmeansCte +
        """
          |, cent3 AS (
          | SELECT cell, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
          | FROM (SELECT cell, unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x FROM a2) t
          | GROUP BY cell, dim),
          |ca3 AS (SELECT cell AS c_cell, list(mean_v ORDER BY dim) AS c0 FROM cent3 GROUP BY cell),
          |p AS (
          | SELECT a.cell, a.vec_id,
          |  round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*c0[i])) /
          |   (sqrt(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*a.e[i]))) *
          |    sqrt(list_sum(list_transform(range(1, len(c0)+1), i -> c0[i]*c0[i])))), 12) AS pcos
          | FROM a2 a JOIN ca3 ON a.cell = ca3.c_cell),
          |r AS (
          | SELECT cell, vec_id, pcos,
          |  row_number() OVER (PARTITION BY cell ORDER BY pcos DESC, vec_id) AS rk,
          |  count(*) OVER (PARTITION BY cell) AS n_cell
          | FROM p),
          |f AS (
          | SELECT cell, vec_id, pcos,
          |  CASE WHEN rk <= floor(n_cell * 1 / 4.0) THEN 1 ELSE 0 END AS pruned
          | FROM r)
          |SELECT cell, count(*) AS n_members,
          | CAST(sum(pruned) AS BIGINT) AS n_pruned,
          | CAST(coalesce(sum(CASE WHEN pruned = 1 THEN vec_id END), 0) AS BIGINT) AS pruned_checksum,
          | round(CAST(coalesce(sum(CASE WHEN pruned = 0 THEN CAST(pcos AS DECIMAL(28,15)) END), 0) AS DOUBLE), 6) AS kept_cos_sum
          |FROM f GROUP BY cell""".stripMargin),
    // md5 shard buckets + md5-hex within-shard order; arg_min/arg_max pin
    // the deterministic shuffle order, not just the partition
    "q93_training_shards" ->
      s"""WITH t AS (
        | SELECT doc_id,
        |  ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 16 AS shard,
        |  md5(CAST(doc_id AS VARCHAR)) AS ord,
        |  len($tokens) AS n_tokens
        | FROM documents)
        |SELECT shard, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | arg_min(doc_id, ord) AS first_doc,
        | arg_max(doc_id, ord) AS last_doc
        |FROM t GROUP BY shard""".stripMargin,
    // one 12-dp-rounded double ratio per language, floored repeats and
    // floored 1e-6 residual threshold — q89's determinism conventions
    "q94_repeat_mixture" ->
      s"""WITH wt AS (
        | SELECT doc_id, lang, len($tokens) AS n_tokens FROM documents),
        |ls AS (
        | SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
        | FROM wt GROUP BY lang),
        |p2 AS (
        | SELECT lang, lang_tokens,
        |  CAST(floor(round(CAST((SELECT max(lang_tokens) FROM ls) AS DOUBLE) / lang_tokens, 12)) AS BIGINT) AS repeats,
        |  CAST(floor(round(round(CAST((SELECT max(lang_tokens) FROM ls) AS DOUBLE) / lang_tokens, 12)
        |    - floor(round(CAST((SELECT max(lang_tokens) FROM ls) AS DOUBLE) / lang_tokens, 12)), 12) * 1000000) AS BIGINT) AS residual_thresh
        | FROM ls),
        |x AS (
        | SELECT w.lang, w.n_tokens, p2.repeats,
        |  CASE WHEN ('0x' || substring(md5(CAST(w.doc_id AS VARCHAR)),1,8))::BIGINT % 1000000 < p2.residual_thresh
        |       THEN 1 ELSE 0 END AS extra
        | FROM wt w JOIN p2 USING (lang))
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS lang_tokens, repeats,
        | CAST(sum(extra) AS BIGINT) AS n_extra_docs,
        | CAST(sum(n_tokens * repeats) + sum(extra * n_tokens) AS BIGINT) AS planned_tokens
        |FROM x GROUP BY lang, repeats""".stripMargin,
    // BPE merge selection replayed: corpus → word-frequency table →
    // weighted adjacent char pairs → deterministic (count desc, pair) top-k
    "q95_bpe_pairs" ->
      s"""WITH wc AS (
        | SELECT w AS word, count(*) AS n
        | FROM (SELECT unnest($tokens) AS w FROM documents) t
        | WHERE length(w) >= 2 GROUP BY w),
        |p AS (
        | SELECT substring(word, CAST(i AS INT), 2) AS pair, n
        | FROM (SELECT word, n, unnest(range(1, length(word))) AS i FROM wc) t)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences
        |FROM p GROUP BY pair
        |ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,
    // D4 replayed end to end: q87's pair sweep names the semantic drops,
    // survivors get a FOURTH centroid pass, then q92's rank/prune logic
    // over the survivor set
    "q96_d4_pipeline" ->
      (kmeansCte +
        """
          |, pairs AS (
          | SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
          |  round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])) /
          |   (sqrt(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*a.e[i]))) *
          |    sqrt(list_sum(list_transform(range(1, len(b.e)+1), i -> b.e[i]*b.e[i])))), 12) AS cos
          | FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
          |dropped AS (SELECT DISTINCT vec_b AS vec_id FROM pairs WHERE cos >= 0.35),
          |surv AS (
          | SELECT a.* FROM a2 a WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)),
          |cent4 AS (
          | SELECT cell, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
          | FROM (SELECT cell, unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x FROM surv) t
          | GROUP BY cell, dim),
          |ca4 AS (SELECT cell AS c_cell, list(mean_v ORDER BY dim) AS c0 FROM cent4 GROUP BY cell),
          |p AS (
          | SELECT s.cell, s.vec_id,
          |  round(list_sum(list_transform(range(1, len(s.e)+1), i -> s.e[i]*c0[i])) /
          |   (sqrt(list_sum(list_transform(range(1, len(s.e)+1), i -> s.e[i]*s.e[i]))) *
          |    sqrt(list_sum(list_transform(range(1, len(c0)+1), i -> c0[i]*c0[i])))), 12) AS pcos
          | FROM surv s JOIN ca4 ON s.cell = ca4.c_cell),
          |r AS (
          | SELECT cell, vec_id, pcos,
          |  row_number() OVER (PARTITION BY cell ORDER BY pcos DESC, vec_id) AS rk,
          |  count(*) OVER (PARTITION BY cell) AS n_surv
          | FROM p),
          |f AS (
          | SELECT cell, vec_id,
          |  CASE WHEN rk <= floor(n_surv * 1 / 4.0) THEN 1 ELSE 0 END AS pruned
          | FROM r),
          |fa AS (
          | SELECT cell, count(*) AS n_survivors,
          |  CAST(sum(pruned) AS BIGINT) AS n_proto_pruned,
          |  CAST(coalesce(sum(CASE WHEN pruned = 0 THEN vec_id END), 0) AS BIGINT) AS kept_checksum
          | FROM f GROUP BY cell),
          |mem AS (SELECT cell, count(*) AS n_members FROM a2 GROUP BY cell)
          |SELECT m.cell, m.n_members,
          | m.n_members - fa.n_survivors AS n_sem_dropped,
          | fa.n_proto_pruned,
          | fa.n_survivors - fa.n_proto_pruned AS n_kept,
          | fa.kept_checksum
          |FROM mem m JOIN fa USING (cell)""".stripMargin),
    // full iterated BPE training replayed: all 8 merge rounds unrolled —
    // per round, pair counts over the evolving word-symbol table, the
    // (count desc, pair asc) top pair, and the greedy left-to-right
    // rewrite (for an (a,a) pair inside a run of a's, the even offsets —
    // the only overlap case; a!=b matches are never adjacent)
    "q97_bpe_train" -> bpeTrainSql(8, 65536),
    // boilerplate span removal: 8-word non-overlapping spans, a span in
    // >= 2 distinct docs is dropped from ALL docs; cleaned text reassembled
    // in span order and 60-bit-hashed (pins reassembly, not just the drop
    // set). NULL/empty text yields the one empty span both engines' split
    // semantics produce; all-dropped => NULL cleaned => NULL hash
    "q98_boilerplate_removal" ->
      """WITH ws AS (
        | SELECT doc_id, regexp_split_to_array(trim(coalesce(text,'')), '\s+') AS w
        | FROM documents),
        |c AS (SELECT doc_id, w, CAST(unnest(range(0, greatest(len(w),1), 8)) AS INT) AS s
        | FROM ws),
        |h AS (SELECT doc_id, s, span,
        |  CAST(('0x' || substring(md5(span), 1, 15)) AS BIGINT) AS sh
        | FROM (SELECT doc_id, s, array_to_string(w[s+1:s+8], ' ') AS span FROM c) t),
        |bp AS (SELECT sh FROM h GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
        |k AS (
        | SELECT h.doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN bp.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  string_agg(CASE WHEN bp.sh IS NULL THEN span END, ' ' ORDER BY s) AS cleaned
        | FROM h LEFT JOIN bp USING (sh) GROUP BY h.doc_id)
        |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans, n_dropped,
        | CASE WHEN cleaned IS NULL OR cleaned = '' THEN 0
        |      ELSE CAST(len(regexp_split_to_array(cleaned, '\s+')) AS BIGINT)
        | END AS kept_tokens,
        | CAST(('0x' || substring(md5(cleaned), 1, 15)) AS BIGINT) AS cleaned_hash
        |FROM k""".stripMargin,
    // CCNet LM bucketing: per-lang bigram counts with add-one smoothing
    // over the observed vocab; per-bigram -log10 P rounded to 6 dp and
    // summed as DECIMAL (order-independent, matching the engine's in-row
    // array-order sum); terciles over non-null scores only, <2-word docs
    // land in bucket 'none' so the per-lang tally partitions the corpus
    "q99_perplexity_buckets" ->
      s"""WITH ws AS (SELECT doc_id, lang, $tokens AS w FROM documents),
        |dd AS (SELECT doc_id, lang, w, coalesce(len(w), 0) AS nw FROM ws),
        |uc AS (SELECT lang, w1, cu FROM (
        |  SELECT lang, w1, count(*) AS cu,
        |   row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, w1) AS rn
        |  FROM (SELECT lang, unnest(w) AS w1 FROM dd) t GROUP BY 1, 2) c
        | WHERE rn <= ${graft.analytics.TextStats.PerplexityVocabCap}),
        |vv AS (SELECT lang, count(*) AS v FROM uc GROUP BY 1),
        |bg AS (SELECT doc_id, lang, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT)+1] AS w2
        | FROM (SELECT doc_id, lang, w, unnest(range(1, nw)) AS i FROM dd WHERE nw >= 2) t),
        |bc AS (SELECT lang, w1, w2, cb FROM (
        |  SELECT lang, w1, w2, count(*) AS cb,
        |   row_number() OVER (PARTITION BY lang
        |     ORDER BY count(*) DESC, w1 || ' ' || w2) AS rn
        |  FROM bg GROUP BY 1, 2, 3) c
        | WHERE rn <= ${graft.analytics.TextStats.PerplexityVocabCap}),
        |terms AS (
        | SELECT g.doc_id, g.lang,
        |  CAST(round(-log10((coalesce(bc.cb, 0) + 1.0) / (coalesce(uc.cu, 0) + vv.v)), 6)
        |   AS DECIMAL(18,6)) AS term
        | FROM bg g
        | LEFT JOIN bc ON g.lang = bc.lang AND g.w1 = bc.w1 AND g.w2 = bc.w2
        | LEFT JOIN uc ON g.lang = uc.lang AND g.w1 = uc.w1
        | JOIN vv ON g.lang = vv.lang),
        |sc AS (SELECT doc_id, lang,
        |  round(CAST(sum(term) AS DOUBLE) / count(*), 6) AS score
        | FROM terms GROUP BY 1, 2),
        |al AS (SELECT dd.doc_id, dd.lang, dd.nw, sc.score
        | FROM dd LEFT JOIN sc ON dd.doc_id = sc.doc_id AND dd.lang = sc.lang),
        |nn AS (SELECT doc_id, lang, nw, score,
        |  ntile(3) OVER (PARTITION BY lang ORDER BY score, doc_id) AS t
        | FROM al WHERE score IS NOT NULL),
        |bk AS (
        | SELECT lang, nw, score,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        | FROM nn
        | UNION ALL
        | SELECT lang, nw, NULL, 'none' FROM al WHERE score IS NULL)
        |SELECT lang, bucket, count(*) AS n_docs,
        | CAST(sum(nw) AS BIGINT) AS n_tokens,
        | round(min(score), 6) AS min_score, round(max(score), 6) AS max_score
        |FROM bk GROUP BY 1, 2""".stripMargin,
    "q100_bpe_encode" -> bpeEncodeSql(8, 65536, 40),
    "q124_tokenizer_fertility" -> bpeFertilitySql(8, 65536),
    "q126_cms_heavy_hitters" -> cmsSql(4, 1024, 20),
    "q127_dedup_agreement" -> dedupAgreementSql(),
    "q128_image_dhash_histogram" -> imageDhashSql(),
    "q130_image_dhash_clusters" -> imageDhashClustersSql(),
    // q131: bytes via the q59 hex-decode discipline; integer-exact square
    // sums, double only at the final rounded sqrt
    "q131_audio_frame_energy" ->
      (audioFrameCte +
        "\nSELECT doc_id, frame_idx, n_samples, rms_energy, n_zero_cross FROM fe"),
    // q152: the q131 frame CTE + gaps-and-islands on the frame index; the
    // speech flag compares the 6-dp-ROUNDED energy so both engines branch
    // on the identical value
    "q152_vad_segments" ->
      (audioFrameCte +
        """,
          |fl AS (SELECT doc_id, frame_idx,
          |  (rms_energy IS NOT NULL AND rms_energy >= 45.0) AS speech FROM fe),
          |isl AS (SELECT doc_id, speech,
          |  frame_idx - row_number() OVER (PARTITION BY doc_id, speech
          |    ORDER BY frame_idx) AS grp
          | FROM fl),
          |seg AS (SELECT doc_id, speech, grp, count(*) AS seg_len
          | FROM isl GROUP BY 1, 2, 3),
          |pd AS (SELECT doc_id,
          |  CAST(sum(seg_len) AS BIGINT) AS d_frames,
          |  CAST(sum(CASE WHEN speech THEN seg_len ELSE 0 END) AS BIGINT)
          |    AS d_speech_frames,
          |  CAST(count(*) AS BIGINT) AS d_segments,
          |  CAST(sum(CASE WHEN speech THEN 1 ELSE 0 END) AS BIGINT)
          |    AS d_speech_segments,
          |  CAST(coalesce(max(CASE WHEN speech THEN seg_len END), 0) AS BIGINT)
          |    AS d_max_run
          | FROM seg GROUP BY doc_id)
          |SELECT d.source, count(*) AS n_docs,
          | CAST(sum(d_frames) AS BIGINT) AS n_frames,
          | CAST(sum(d_speech_frames) AS BIGINT) AS n_speech_frames,
          | CAST(sum(d_segments) AS BIGINT) AS n_segments,
          | CAST(sum(d_speech_segments) AS BIGINT) AS n_speech_segments,
          | CAST(max(d_max_run) AS BIGINT) AS max_speech_run
          |FROM pd JOIN documents d ON d.doc_id = pd.doc_id
          |GROUP BY d.source""".stripMargin),
    // q153: the q74 recursive-component CTE + chars-desc keeper window;
    // the min-id baseline's chars come from the member row where
    // doc_id = cluster_id (the contraction's component minimum)
    "q153_quality_keepers" ->
      (dupClustersCte +
        """,
          |m AS (SELECT c.doc_id, c.cluster_id, d.source, d.n_chars
          | FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
          |sz AS (SELECT cluster_id, count(*) AS csize FROM m GROUP BY 1),
          |k AS (SELECT m.*, row_number() OVER (PARTITION BY cluster_id
          |   ORDER BY n_chars DESC NULLS LAST, doc_id) AS rn FROM m),
          |rc AS (SELECT cluster_id, n_chars AS root_chars FROM m
          | WHERE doc_id = cluster_id)
          |SELECT k.source, count(*) AS n_clusters_led,
          | CAST(sum(sz.csize) AS BIGINT) AS n_members,
          | CAST(coalesce(sum(k.n_chars), 0) AS BIGINT) AS kept_chars,
          | CAST(coalesce(sum(rc.root_chars), 0) AS BIGINT) AS minid_kept_chars,
          | CAST(coalesce(sum(k.n_chars), 0) - coalesce(sum(rc.root_chars), 0)
          |   AS BIGINT) AS chars_gain
          |FROM k JOIN sz USING (cluster_id) JOIN rc USING (cluster_id)
          |WHERE k.rn = 1 GROUP BY k.source""".stripMargin),
    // q154: the q88 rule spellings replayed per doc (score = rules
    // passed), then the greedy budget cut as a cumulative window in the
    // same (score desc, md5 lottery, doc_id) total order as the engine
    "q154_budget_selection" ->
      s"""WITH t AS (
        | SELECT doc_id, lang, $tokens AS ws FROM documents),
        |f AS (
        | SELECT doc_id, lang, coalesce(len(ws), 0) AS nw,
        |  round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws), 6) AS mean_len,
        |  round(CAST(len(list_filter(ws, w -> w IN ('the','a','of','to','and','in'))) AS DOUBLE) / len(ws), 6) AS stop_frac,
        |  round(CAST(len(list_filter(ws, w -> regexp_matches(w, '^[a-z]+$$'))) AS DOUBLE) / len(ws), 6) AS alpha_frac
        | FROM t),
        |g AS (
        | SELECT doc_id, lang, nw AS n_tokens,
        |  CAST(4
        |   - (CASE WHEN nw < 20 OR nw > 90 THEN 1 ELSE 0 END)
        |   - (CASE WHEN mean_len < 4.0 OR mean_len > 5.0 THEN 1 ELSE 0 END)
        |   - (CASE WHEN stop_frac < 0.02 THEN 1 ELSE 0 END)
        |   - (CASE WHEN alpha_frac < 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS score
        | FROM f),
        |o AS (
        | SELECT doc_id, lang, n_tokens, score,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |    ORDER BY score DESC, md5(CAST(doc_id AS VARCHAR)), doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        | FROM g)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN before < 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
        | CAST(sum(CASE WHEN before < 5000 THEN n_tokens ELSE 0 END) AS BIGINT) AS selected_tokens,
        | CAST(min(CASE WHEN before < 5000 THEN score END) AS BIGINT) AS min_score_admitted,
        | CAST(sum(CASE WHEN before < 5000 THEN doc_id ELSE 0 END) AS BIGINT) AS selected_checksum
        |FROM o GROUP BY lang""".stripMargin,
    // q155: the shared audio fingerprint CTE ([[audioFpCte]]), then the
    // q114/q128 brute pair-join histogram tail over the fingerprints
    "q155_audio_fp_histogram" ->
      (audioFpCte() +
        s""",
          |hp AS (
          | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          | WHERE $simhashPairPredicate)
          |SELECT hamming, count(*) AS n_pairs,
          | count(DISTINCT doc_a) AS n_docs_a, count(DISTINCT doc_b) AS n_docs_b
          |FROM hp GROUP BY hamming""".stripMargin),
    // q172: the same fingerprint CTE contracted by the q74 reach/clusters
    // chain (the q130 image-cluster oracle's exact shape on the audio
    // modality); exact-payload dups have equal fingerprints, so the
    // pairs-only component graph equals the engine's h128-collapsed one
    "q172_audio_fp_clusters" ->
      (audioFpCte("WITH RECURSIVE") +
        s""",
          |p AS (
          | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          | WHERE $simhashPairPredicate),
          |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
          |      UNION SELECT doc_b AS src, doc_a AS dst FROM p),
          |reach AS (
          | SELECT src AS node, src AS lbl FROM (SELECT DISTINCT src FROM e) t
          | UNION
          | SELECT e.src AS node, r.lbl FROM e JOIN reach r ON r.node = e.dst),
          |clusters AS (
          | SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
          |SELECT doc_id, cluster_id FROM clusters""".stripMargin),
    // q156: q99's modeling conventions under TWO models from one combined
    // count table (general count + in-domain count via the q147 largest-
    // source pick); per-model top-K caps, add-one smoothing over each
    // capped vocabulary, 6-dp decimal term sums; v = 0 guards to NULL
    "q156_moore_lewis" ->
      s"""WITH ws AS (SELECT doc_id, source, $tokens AS w FROM documents),
        |dd AS (SELECT doc_id, source, w, coalesce(len(w), 0) AS nw FROM ws),
        |st AS (SELECT source, count(*) AS n_docs FROM dd GROUP BY source),
        |rf AS (SELECT source AS ref_source FROM (
        |  SELECT source, row_number() OVER
        |    (ORDER BY n_docs DESC, source ASC NULLS LAST) AS rn
        |  FROM st) t WHERE rn = 1),
        |fl AS (SELECT dd.doc_id, dd.w, dd.nw,
        |  CASE WHEN dd.source IS NOT DISTINCT FROM rf.ref_source
        |   THEN 1 ELSE 0 END AS is_tgt
        | FROM dd CROSS JOIN rf),
        |uc0 AS (SELECT w1, count(*) AS cu_g,
        |  CAST(sum(is_tgt) AS BIGINT) AS cu_t
        | FROM (SELECT is_tgt, unnest(w) AS w1 FROM fl) t GROUP BY w1),
        |ucg AS (SELECT w1, cu_g FROM (
        |  SELECT w1, cu_g, row_number() OVER (ORDER BY cu_g DESC, w1) AS rn
        |  FROM uc0 WHERE cu_g > 0) t WHERE rn <= ${graft.analytics.TextStats.PerplexityVocabCap}),
        |uct AS (SELECT w1, cu_t FROM (
        |  SELECT w1, cu_t, row_number() OVER (ORDER BY cu_t DESC, w1) AS rn
        |  FROM uc0 WHERE cu_t > 0) t WHERE rn <= ${graft.analytics.TextStats.PerplexityVocabCap}),
        |bg0 AS (SELECT doc_id, is_tgt, w[CAST(i AS INT)] AS w1,
        |  w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] AS b
        | FROM (SELECT doc_id, is_tgt, w, unnest(range(1, nw)) AS i
        |       FROM fl WHERE nw >= 2) t),
        |bc0 AS (SELECT b, count(*) AS cb_g, CAST(sum(is_tgt) AS BIGINT) AS cb_t
        | FROM bg0 GROUP BY b),
        |bcg AS (SELECT b, cb_g FROM (
        |  SELECT b, cb_g, row_number() OVER (ORDER BY cb_g DESC, b) AS rn
        |  FROM bc0 WHERE cb_g > 0) t WHERE rn <= ${graft.analytics.TextStats.PerplexityVocabCap}),
        |bct AS (SELECT b, cb_t FROM (
        |  SELECT b, cb_t, row_number() OVER (ORDER BY cb_t DESC, b) AS rn
        |  FROM bc0 WHERE cb_t > 0) t WHERE rn <= ${graft.analytics.TextStats.PerplexityVocabCap}),
        |vg AS (SELECT count(*) AS v_g FROM ucg),
        |vt AS (SELECT count(*) AS v_t FROM uct),
        |tm AS (
        | SELECT g.doc_id,
        |  CAST(CASE WHEN vg.v_g > 0 THEN
        |   round(-log10((coalesce(bcg.cb_g, 0) + 1.0) /
        |     (coalesce(ucg.cu_g, 0) + vg.v_g)), 6) END
        |   AS DECIMAL(18,6)) AS term_g,
        |  CAST(CASE WHEN vt.v_t > 0 THEN
        |   round(-log10((coalesce(bct.cb_t, 0) + 1.0) /
        |     (coalesce(uct.cu_t, 0) + vt.v_t)), 6) END
        |   AS DECIMAL(18,6)) AS term_t
        | FROM bg0 g
        | LEFT JOIN bcg USING (b) LEFT JOIN bct USING (b)
        | LEFT JOIN ucg ON g.w1 = ucg.w1 LEFT JOIN uct ON g.w1 = uct.w1
        | CROSS JOIN vg CROSS JOIN vt),
        |sc AS (SELECT doc_id,
        |  round(CAST(sum(term_g) AS DOUBLE) / count(*) -
        |        CAST(sum(term_t) AS DOUBLE) / count(*), 6) AS score
        | FROM tm GROUP BY doc_id),
        |al AS (SELECT dd.doc_id, dd.source, dd.nw, sc.score
        | FROM dd LEFT JOIN sc USING (doc_id))
        |SELECT al.source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN score IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_scored,
        | CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_selected,
        | CAST(sum(CASE WHEN score > 0 THEN nw ELSE 0 END) AS BIGINT)
        |   AS selected_tokens,
        | CASE WHEN count(score) > 0 THEN
        |   round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
        |     / count(score), 6) END AS avg_score,
        | max(CASE WHEN al.source IS NOT DISTINCT FROM rf.ref_source
        |   THEN 1 ELSE 0 END) = 1 AS is_ref
        |FROM al CROSS JOIN rf GROUP BY al.source""".stripMargin,
    "q157_domain_reweight" -> domainReweightSql(),
    // q158: the prefix-filter candidate join replayed relationally —
    // q32's shingle + md5-hash spelling, identical eligible-only
    // (df-capped) rarest-first rank, identical min-words filter, integer
    // thresholds; pct / dfCap / shingle width interpolated from the
    // Dedup constants so the engines cannot silently desync
    "q158_containment_pairs" ->
      s"""WITH d AS (SELECT doc_id, $tokens AS ws FROM documents),
        |n AS (
        | SELECT doc_id,
        |  list_distinct(list_transform(
        |   range(0, greatest(len(ws)-${analytics.Dedup.ContainmentShingleN}, 0)+1),
        |   i -> concat_ws(' ', ${(1 to analytics.Dedup.ContainmentShingleN)
                .map(k => s"ws[i+$k]").mkString(", ")}))) AS ngrams
        | FROM d WHERE len(ws) >= ${analytics.Dedup.ContainmentShingleN}),
        |toks AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(ngrams,
        |  g -> ('0x' || substring(md5(g),1,8))::BIGINT
        |        % ${analytics.Dedup.MinhashP}))) AS gh
        | FROM n),
        |szs AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
        |dfreq AS (SELECT gh, count(*) AS df FROM toks GROUP BY 1),
        |pre AS (
        | SELECT doc_id, gh FROM (
        |  SELECT t.doc_id, t.gh,
        |   row_number() OVER (PARTITION BY t.doc_id
        |     ORDER BY f.df, t.gh) AS rk,
        |   s.sz
        |  FROM toks t JOIN dfreq f USING (gh) JOIN szs s USING (doc_id)
        |  WHERE f.df <= ${analytics.Dedup.ContainmentDfCap}) r
        | WHERE rk <= (sz * ${100 - analytics.Dedup.ContainmentPct}) // 100 + 1),
        |cand AS (
        | SELECT DISTINCT least(p.doc_id, t.doc_id) AS doc_a,
        |        greatest(p.doc_id, t.doc_id) AS doc_b
        | FROM pre p JOIN toks t ON p.gh = t.gh AND p.doc_id <> t.doc_id),
        |inter AS (
        | SELECT c.doc_a, c.doc_b, count(*) AS n_common
        | FROM cand c
        | JOIN toks ta ON ta.doc_id = c.doc_a
        | JOIN toks tb ON tb.doc_id = c.doc_b AND tb.gh = ta.gh
        | GROUP BY 1, 2)
        |SELECT i.doc_a, i.doc_b, CAST(i.n_common AS BIGINT) AS n_common,
        | CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
        | round(CAST(i.n_common AS DOUBLE) / least(sa.sz, sb.sz), 6)
        |   AS containment,
        | round(CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common), 6)
        |   AS jaccard,
        | (i.n_common * 3 < sa.sz + sb.sz) AS jaccard_missed
        |FROM inter i
        |JOIN szs sa ON sa.doc_id = i.doc_a
        |JOIN szs sb ON sb.doc_id = i.doc_b
        |WHERE i.n_common * 100
        |  >= least(sa.sz, sb.sz) * ${analytics.Dedup.ContainmentPct}""".stripMargin,
    // q169: the q74 recursive-component CTE + within-cluster pairwise
    // re-test against the shared q35/q74 direct predicate
    "q169_cluster_chain_audit" ->
      (dupClustersCte +
        s""",
          |mm AS (
          | SELECT c.doc_id, c.cluster_id, f.simhash, md5(d.text) AS th
          | FROM clusters c
          | JOIN fp f ON f.doc_id = c.doc_id
          | JOIN documents d ON d.doc_id = c.doc_id),
          |cs AS (SELECT cluster_id, count(*) AS csize FROM mm GROUP BY 1),
          |m2 AS (SELECT mm.*, cs.csize FROM mm JOIN cs USING (cluster_id)
          | WHERE cs.csize BETWEEN 2 AND 64),
          |ppx AS (
          | SELECT a.cluster_id, a.csize,
          |  CASE WHEN (a.th IS NOT NULL AND a.th = b.th)
          |   OR ((((a.simhash >> 0) & 32767) = ((b.simhash >> 0) & 32767)
          |     OR ((a.simhash >> 15) & 32767) = ((b.simhash >> 15) & 32767)
          |     OR ((a.simhash >> 30) & 32767) = ((b.simhash >> 30) & 32767)
          |     OR ((a.simhash >> 45) & 32767) = ((b.simhash >> 45) & 32767))
          |    AND bit_count(xor(a.simhash, b.simhash)) <= 6)
          |  THEN 1 ELSE 0 END AS direct
          | FROM m2 a JOIN m2 b
          |   ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id),
          |pc AS (
          | SELECT cluster_id, csize, count(*) AS tot,
          |  CAST(sum(direct) AS BIGINT) AS dir,
          |  round(CAST(sum(direct) AS DOUBLE) / count(*), 6) AS density
          | FROM ppx GROUP BY 1, 2)
          |SELECT CASE WHEN csize >= 5 THEN '5+'
          |  WHEN csize >= 3 THEN '3-4' ELSE '2' END AS band,
          | count(*) AS n_clusters,
          | CAST(sum(CASE WHEN density < 1 THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_chained,
          | round(CAST(sum(CAST(density AS DECIMAL(18,6))) AS DOUBLE)
          |   / count(*), 6) AS avg_density,
          | min(density) AS min_density
          |FROM pc GROUP BY 1""".stripMargin),
    // q159: the q74 recursive-component CTE + the suite's decimal
    // quantization for the 1/cluster-size weighted sums
    "q159_soft_dedup" ->
      (dupClustersCte +
        s""",
          |asg AS (
          | SELECT d.doc_id, d.source, d.n_chars,
          |  coalesce(c.cluster_id, d.doc_id) AS cluster_id
          | FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
          |cs AS (SELECT cluster_id, count(*) AS csize FROM asg GROUP BY 1),
          |j AS (SELECT a.source, a.n_chars, c.csize
          |      FROM asg a JOIN cs c USING (cluster_id))
          |SELECT source, count(*) AS n_docs,
          | CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_clustered,
          | round(CAST(sum(CAST(round(CAST(1 AS DOUBLE) / csize, 12)
          |   AS DECIMAL(38,12))) AS DOUBLE), 6) AS eff_docs,
          | CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS total_chars,
          | round(coalesce(CAST(sum(CAST(round(
          |   n_chars * (CAST(1 AS DOUBLE) / csize), 12)
          |   AS DECIMAL(38,12))) AS DOUBLE), 0), 6) AS eff_chars,
          | round(CAST(1 AS DOUBLE)
          |   - round(CAST(sum(CAST(round(CAST(1 AS DOUBLE) / csize, 12)
          |       AS DECIMAL(38,12))) AS DOUBLE), 6) / count(*), 6)
          |   AS mass_removed
          |FROM j GROUP BY source""".stripMargin),
    // q163: the q74 recursive-component CTE + cluster-global doc_id rank,
    // dyadic power(0.5, rk-1) valued per row (exact in both engines'
    // doubles), DECIMAL(38,12) quantized sums, share from the two
    // already-rounded outputs
    "q163_effective_data" ->
      (dupClustersCte +
        s""",
          |asg AS (
          | SELECT d.doc_id, d.source, d.n_chars,
          |  coalesce(c.cluster_id, d.doc_id) AS cluster_id
          | FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
          |rkd AS (
          | SELECT source, n_chars,
          |  row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id) AS rk
          | FROM asg),
          |vals AS (
          | SELECT source, rk,
          |  CAST(round(power(0.5, rk - 1), 12) AS DECIMAL(38,12)) AS v,
          |  CAST(round(n_chars * power(0.5, rk - 1), 12)
          |    AS DECIMAL(38,12)) AS vc
          | FROM rkd),
          |agg AS (
          | SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_repeat_docs,
          |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS eff_docs_hard,
          |  round(CAST(sum(v) AS DOUBLE), 6) AS eff_docs_decay,
          |  round(coalesce(CAST(sum(vc) AS DOUBLE), 0), 6)
          |    AS eff_chars_decay
          | FROM vals GROUP BY source)
          |SELECT source, n_docs, n_repeat_docs, eff_docs_hard,
          | eff_docs_decay, eff_chars_decay,
          | round((eff_docs_decay - eff_docs_hard) / eff_docs_decay, 6)
          |   AS repeat_value_share
          |FROM agg""".stripMargin),
    // q164: stride-bounded bench CROSS the non-bench corpus (the q137
    // cross-join spelling the oracle can afford at sf0.01), top-1 max
    // rounded before the decimal-summed mean; stride + threshold
    // interpolated from the Similarity constants
    "q164_semantic_contamination" ->
      s"""WITH e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        | FROM embeddings),
        |b AS (SELECT vec_id AS bench_id, v AS bv, label FROM e
        |      WHERE vec_id % ${analytics.Similarity.SemanticBenchStride} = 0),
        |c AS (SELECT v AS cv FROM e
        |      WHERE vec_id % ${analytics.Similarity.SemanticBenchStride} <> 0
        |        AND v IS NOT NULL),
        |sc AS (
        | SELECT b.bench_id, ${cosListSql("b.bv", "c.cv")} AS cosine
        | FROM b CROSS JOIN c WHERE b.bv IS NOT NULL),
        |t1 AS (
        | SELECT bench_id, round(max(cosine), 6) AS top_cos
        | FROM sc WHERE cosine IS NOT NULL GROUP BY 1),
        |j AS (
        | SELECT b.bench_id, b.label, t.top_cos
        | FROM b LEFT JOIN t1 t USING (bench_id))
        |SELECT label, count(*) AS n_bench,
        | CAST(count(top_cos) AS BIGINT) AS n_scored,
        | CAST(sum(CASE WHEN top_cos >=
        |   ${analytics.Similarity.SemanticContaminationThreshold}
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        | CASE WHEN count(top_cos) > 0 THEN
        |  round(CAST(sum(CAST(top_cos AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(top_cos), 6) END AS avg_top_cos,
        | max(top_cos) AS max_top_cos
        |FROM j GROUP BY label""".stripMargin,
    // q132: the same lag-window boundary bit + running-sum chunk id, then
    // chunk hashes grouped for the duplicate mass
    "q132_cdc_chunk_dedup" ->
      s"""WITH dd AS (SELECT doc_id, $tokens AS w FROM documents),
        |wr AS (SELECT doc_id, CAST(t.i AS INTEGER) AS i,
        |        w[CAST(t.i AS INTEGER)+1] AS word
        |       FROM dd, UNNEST(range(0, coalesce(len(w),0))) t(i)),
        |g AS (SELECT doc_id, i, word,
        |  lag(word) OVER (PARTITION BY doc_id ORDER BY i) AS pw FROM wr),
        |b AS (SELECT doc_id, i, word,
        |  CASE WHEN pw IS NOT NULL AND
        |    ('0x' || substring(md5(pw || ' ' || word), 1, 15))::BIGINT % 16 = 0
        |  THEN 1 ELSE 0 END AS bb FROM g),
        |c AS (SELECT doc_id, i, word,
        |  coalesce(sum(bb) OVER (PARTITION BY doc_id ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        | FROM b),
        |ch AS (SELECT doc_id, chunk_id,
        |  md5(string_agg(word, ' ' ORDER BY i)) AS chunk_md5,
        |  count(*) AS nw FROM c GROUP BY 1, 2)
        |SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_copies,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | CAST(min(nw) AS BIGINT) AS n_words
        |FROM ch GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
    "q133_mrl_recall" -> mrlRecallSql(),
    // q134: same explicit \x{...} ranges (RE2 ≡ Java on explicit ranges),
    // 'g' flag for replace-all, 6-dp-rounded per-doc fracs DECIMAL-summed
    "q134_script_profile" ->
      """WITH f AS (
        | SELECT lang,
        |  CASE WHEN length(text) > 0 THEN CAST(round(CAST(length(text) -
        |   length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
        |   / length(text), 6) AS DECIMAL(18,6)) END AS latin,
        |  CASE WHEN length(text) > 0 THEN CAST(round(CAST(length(text) -
        |   length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')) AS DOUBLE)
        |   / length(text), 6) AS DECIMAL(18,6)) END AS cyrillic,
        |  CASE WHEN length(text) > 0 THEN CAST(round(CAST(length(text) -
        |   length(regexp_replace(text, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS DOUBLE)
        |   / length(text), 6) AS DECIMAL(18,6)) END AS cjk,
        |  CASE WHEN length(text) > 0 THEN CAST(round(CAST(length(text) -
        |   length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |   / length(text), 6) AS DECIMAL(18,6)) END AS digit,
        |  CASE WHEN length(text) > 0 THEN CAST(round(CAST(length(text) -
        |   length(regexp_replace(text, '[ ' || chr(9) || chr(10) || chr(13) ||
        |     chr(12) || ']', '', 'g')) AS DOUBLE)
        |   / length(text), 6) AS DECIMAL(18,6)) END AS space
        | FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | CASE WHEN count(latin) > 0
        |  THEN round(CAST(sum(latin) AS DOUBLE) / count(latin), 6) END AS avg_latin,
        | CASE WHEN count(cyrillic) > 0
        |  THEN round(CAST(sum(cyrillic) AS DOUBLE) / count(cyrillic), 6) END AS avg_cyrillic,
        | CASE WHEN count(cjk) > 0
        |  THEN round(CAST(sum(cjk) AS DOUBLE) / count(cjk), 6) END AS avg_cjk,
        | CASE WHEN count(digit) > 0
        |  THEN round(CAST(sum(digit) AS DOUBLE) / count(digit), 6) END AS avg_digit,
        | CASE WHEN count(space) > 0
        |  THEN round(CAST(sum(space) AS DOUBLE) / count(space), 6) END AS avg_space
        |FROM f GROUP BY lang""".stripMargin,
    // q135: the bitmap replayed as a DISTINCT (lang, bucket) count —
    // exact integer state, so the estimate is bit-for-bit checkable
    "q135_distinct_sketch" ->
      s"""WITH tok AS (
        | SELECT lang, unnest($tokens) AS w FROM documents WHERE lang IS NOT NULL),
        |bk AS (SELECT DISTINCT lang,
        |  ('0x' || substring(md5(w), 1, 15))::BIGINT % 4096 AS b FROM tok),
        |sb AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_set_bits FROM bk GROUP BY 1),
        |ex AS (SELECT lang, CAST(count(DISTINCT w) AS BIGINT) AS n_exact FROM tok GROUP BY 1)
        |SELECT lang, n_exact, n_set_bits,
        | round(-4096.0 * ln((4096.0 - n_set_bits) / 4096.0), 6) AS n_est,
        | round(abs(-4096.0 * ln((4096.0 - n_set_bits) / 4096.0) - n_exact)
        |   / n_exact, 6) AS rel_err
        |FROM ex JOIN sb USING (lang)""".stripMargin,
    "q136_cluster_split_audit" -> clusterSplitAuditSql,
    // q137: the same two bounded scoring passes, spelled as cross joins the
    // oracle can afford at sf0.01; top-k averages summed IN RANK ORDER
    // (list(... ORDER BY rn) then list_sum) to match the engine's array fold
    "q137_bitext_margin" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL),
        |src AS (SELECT vec_id AS src_id, v FROM e WHERE label % 2 = 0),
        |tgt AS (SELECT vec_id AS tgt_id, v FROM e WHERE label % 2 = 1),
        |q AS (SELECT src_id, v FROM src WHERE src_id % 20 = 0),
        |fs AS (SELECT q.src_id, t.tgt_id, ${cosListSql("q.v", "t.v")} AS cosine
        | FROM q CROSS JOIN tgt t),
        |fr AS (SELECT src_id, tgt_id, cosine,
        |  row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, tgt_id) AS rn
        | FROM fs WHERE cosine IS NOT NULL),
        |ft AS (SELECT * FROM fr WHERE rn <= 4),
        |sa AS (SELECT src_id,
        |  round(list_sum(list(cosine ORDER BY rn)) / count(*), 6) AS src_avg
        | FROM ft GROUP BY src_id),
        |cd AS (SELECT tg.tgt_id, tg.v
        | FROM (SELECT DISTINCT tgt_id FROM ft) c JOIN tgt tg USING (tgt_id)),
        |bs AS (SELECT cd.tgt_id, s.src_id, ${cosListSql("cd.v", "s.v")} AS cosine
        | FROM cd CROSS JOIN src s),
        |br AS (SELECT tgt_id, src_id, cosine,
        |  row_number() OVER (PARTITION BY tgt_id ORDER BY cosine DESC, src_id) AS rn
        | FROM bs WHERE cosine IS NOT NULL),
        |ba AS (SELECT tgt_id,
        |  round(list_sum(list(cosine ORDER BY rn)) / count(*), 6) AS tgt_avg
        | FROM br WHERE rn <= 4 GROUP BY tgt_id),
        |best AS (SELECT src_id, tgt_id, round(cosine, 6) AS cosine
        | FROM ft WHERE rn = 1)
        |SELECT b.src_id, b.tgt_id, b.cosine,
        | round(b.cosine / ((sa.src_avg + ba.tgt_avg) / 2), 6) AS margin,
        | (round(b.cosine / ((sa.src_avg + ba.tgt_avg) / 2), 6) >= 1.05) AS accepted
        |FROM best b JOIN sa USING (src_id) JOIN ba USING (tgt_id)""".stripMargin,
    // q138: the EXACT contamination accounting (no Bloom — the prefilter is
    // one-sided and confirm-joined, so the engine result equals this)
    "q138_bloom_decontamination" ->
      (allGramCte(8) +
        """,
          |bench AS (SELECT DISTINCT h FROM fp WHERE doc_id % 97 = 0 AND doc_id < 97000),
          |x AS (
          | SELECT f.doc_id, count(*) AS n_grams,
          |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          | FROM fp f LEFT JOIN bench b ON f.h = b.h
          | WHERE f.doc_id % 97 <> 0
          | GROUP BY f.doc_id),
          |pd AS (SELECT doc_id,
          |  round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS hit_ratio FROM x)
          |SELECT d.source, count(*) AS n_docs,
          | CAST(sum(CASE WHEN pd.hit_ratio >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_contaminated,
          | round(CAST(sum(CASE WHEN pd.hit_ratio >= 0.2 THEN 1 ELSE 0 END) AS DOUBLE)
          |   / count(*), 6) AS contam_ratio
          |FROM pd JOIN documents d USING (doc_id)
          |GROUP BY d.source""".stripMargin),
    // q139: the waterfilling recurrence in its closed form — capped iff the
    // cap fits under the running waterlevel, remainder split equally
    "q139_unimax_mixture" ->
      s"""WITH pl AS (SELECT lang,
        |  CAST(coalesce(sum(len($tokens)), 0) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_tokens,
        |  CAST(n_tokens AS DOUBLE) * 3.0 AS cap,
        |  row_number() OVER (ORDER BY CAST(n_tokens AS DOUBLE) * 3.0 ASC,
        |    lang ASC NULLS LAST) AS i,
        |  count(*) OVER () AS n,
        |  coalesce(sum(CAST(n_tokens AS DOUBLE) * 3.0) OVER (
        |    ORDER BY CAST(n_tokens AS DOUBLE) * 3.0 ASC, lang ASC NULLS LAST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS prefix,
        |  sum(CAST(n_tokens AS DOUBLE)) OVER () * 0.5 AS b
        | FROM pl),
        |f AS (SELECT *, (cap * (n - i + 1) <= b - prefix) AS flag FROM w),
        |g AS (SELECT *,
        |  sum(CASE WHEN flag THEN cap ELSE 0.0 END) OVER () AS capsum,
        |  sum(CASE WHEN flag THEN 1 ELSE 0 END) OVER () AS t FROM f)
        |SELECT lang, n_tokens,
        | round(CASE WHEN flag THEN cap ELSE (b - capsum) / (n - t) END, 6)
        |   AS alloc_tokens,
        | round(CASE WHEN n_tokens > 0 THEN
        |   (CASE WHEN flag THEN cap ELSE (b - capsum) / (n - t) END) / n_tokens
        |   ELSE 0.0 END, 6) AS epochs
        |FROM g""".stripMargin,
    // q141: positional gram replay — token covered iff any of the previous
    // k-1 grams (or its own) hits the bench set; cleaned text re-assembled
    // with string_agg ORDER BY and checksum-pinned (reassembly itself gated)
    "q141_surgical_decontamination" ->
      (allGramCte(8) +
        s""",
          |bench AS (SELECT DISTINCT h FROM fp WHERE doc_id % 97 = 0 AND doc_id < 97000),
          |cw AS (SELECT doc_id, source, $tokens AS w FROM documents
          | WHERE doc_id % 97 <> 0 AND text IS NOT NULL),
          |tp AS (SELECT doc_id, source, w,
          |  CAST(unnest(range(0, len(w))) AS INT) AS wpos FROM cw),
          |tt AS (SELECT doc_id, source, wpos, w[wpos+1] AS word,
          |  CASE WHEN wpos < greatest(len(w)-8,0)+1 THEN
          |   ('0x' || substring(md5(array_to_string(w[wpos+1:wpos+8], ' ')),1,15))::BIGINT
          |  END AS h
          | FROM tp),
          |hh AS (SELECT t.doc_id, t.source, t.wpos, t.word,
          |  CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS ghit
          | FROM tt t LEFT JOIN bench b ON t.h = b.h),
          |cv AS (SELECT *, max(ghit) OVER (PARTITION BY doc_id ORDER BY wpos
          |  ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) = 1 AS covered FROM hh),
          |pd AS (SELECT doc_id, source, count(*) AS n_tokens,
          |  CAST(sum(CASE WHEN NOT covered THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |  coalesce(string_agg(CASE WHEN NOT covered THEN word END, ' '
          |    ORDER BY wpos), '') AS cleaned
          | FROM cv GROUP BY doc_id, source)
          |SELECT source, count(*) AS n_docs,
          | CAST(sum(CASE WHEN n_kept < n_tokens THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_docs_touched,
          | CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
          | CAST(sum(n_tokens - n_kept) AS BIGINT) AS tokens_removed,
          | CAST(sum((('0x' || substring(md5(cleaned),1,15))::BIGINT) % 1000000007)
          |   AS BIGINT) AS cleaned_checksum
          |FROM pd GROUP BY source""".stripMargin),
    // q142: the routed chain replayed (cells, per-side centroids, nprobe=2)
    "q142_ivf_bitext_margin" ->
      (bitextBaseCte + bitextChainCtes("r", routed = true) +
        """
          |SELECT src_id, tgt_id, cosine, margin, (margin >= 1.05) AS accepted
          |FROM rres""".stripMargin),
    // q143: both chains in one WITH; routed pair vs exact pair per query
    "q143_bitext_routing_recall" ->
      (bitextBaseCte + bitextChainCtes("x", routed = false) +
        bitextChainCtes("r", routed = true) +
        """
          |SELECT x.src_id, x.tgt_id AS exact_tgt, r.tgt_id AS routed_tgt,
          | CASE WHEN r.tgt_id IS NULL THEN 0
          |      WHEN r.tgt_id = x.tgt_id THEN 1 ELSE 0 END AS pair_hit,
          | round(r.margin - x.margin, 6) AS margin_delta
          |FROM xres x LEFT JOIN rres r USING (src_id)""".stripMargin),
    // q144: cell self-join + per-vector top-k + reversed-pair left join
    "q144_knn_graph" ->
      (knnGraphCte("WITH") +
        """
          |SELECT a.vec_id, a.nbr_id, a.cosine, a.rn,
          | (b.vec_id IS NOT NULL) AS mutual
          |FROM t a LEFT JOIN t b ON b.vec_id = a.nbr_id AND b.nbr_id = a.vec_id""".stripMargin),
    // q145: mutual edges → recursive components (q74 oracle discipline) →
    // per-cluster label histogram → majority/purity
    "q145_knn_cluster_purity" ->
      (knnGraphCte("WITH RECURSIVE") +
        """,
          |m AS (SELECT a.vec_id AS doc_a, a.nbr_id AS doc_b
          | FROM t a JOIN t b ON b.vec_id = a.nbr_id AND b.nbr_id = a.vec_id
          | WHERE a.vec_id < a.nbr_id),
          |e2 AS (SELECT doc_a AS src, doc_b AS dst FROM m
          |       UNION SELECT doc_b AS src, doc_a AS dst FROM m),
          |reach AS (
          | SELECT src AS node, src AS lbl FROM (SELECT DISTINCT src FROM e2) z
          | UNION
          | SELECT e2.src AS node, r2.lbl FROM e2 JOIN reach r2 ON r2.node = e2.dst),
          |clusters AS (
          | SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
          |pl AS (SELECT c.cluster_id, em.label, count(*) AS n
          | FROM clusters c JOIN embeddings em ON em.vec_id = c.doc_id
          | WHERE em.label IS NOT NULL GROUP BY c.cluster_id, em.label),
          |tp AS (SELECT cluster_id, label AS top_label, n AS top_n FROM (
          |  SELECT cluster_id, label, n,
          |   row_number() OVER (PARTITION BY cluster_id ORDER BY n DESC, label) AS rn
          |  FROM pl) z WHERE rn = 1)
          |SELECT g.cluster_id, g.n_vecs, g.n_labels, tp.top_label,
          | CAST(tp.top_n AS BIGINT) AS top_n,
          | round(CAST(tp.top_n AS DOUBLE) / g.n_vecs, 6) AS purity
          |FROM (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_labels,
          |       CAST(sum(n) AS BIGINT) AS n_vecs FROM pl GROUP BY cluster_id) g
          |JOIN tp USING (cluster_id)""".stripMargin),
    // q146: q91's per-doc kept chain joined with q88's per-doc rule pass —
    // both verdicts in their exact established spellings
    "q146_filter_agreement" ->
      s"""WITH tb AS (
        | SELECT doc_id, source, (lang = 'en') AS pos,
        |  ('0x' || substring(md5(w), 1, 15))::BIGINT % 256 AS b
        | FROM (SELECT doc_id, source, lang, unnest($tokens) AS w FROM documents) t),
        |counts AS (
        | SELECT b,
        |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos_b,
        |  CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS neg_b
        | FROM tb GROUP BY b),
        |w AS (
        | SELECT b,
        |  CAST(pos_b AS DECIMAL(38,0)) * (SELECT CAST(sum(neg_b) AS BIGINT) FROM counts)
        |   - CAST(neg_b AS DECIMAL(38,0)) * (SELECT CAST(sum(pos_b) AS BIGINT) FROM counts) AS wt
        | FROM counts),
        |sc AS (
        | SELECT t.doc_id, sum(coalesce(w.wt, CAST(0 AS DECIMAL(38,0)))) AS score
        | FROM tb t LEFT JOIN w USING (b) GROUP BY t.doc_id),
        |k AS (
        | SELECT d.doc_id,
        |  (coalesce(sc.score, CAST(0 AS DECIMAL(38,0))) > 0 OR
        |   ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT % 10 = 0) AS kept
        | FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |gt AS (SELECT doc_id, source, $tokens AS ws FROM documents),
        |gf AS (
        | SELECT doc_id, source, coalesce(len(ws), 0) AS nw,
        |  round(CAST(list_sum(list_transform(ws, w2 -> length(w2))) AS DOUBLE) / len(ws), 6) AS mean_len,
        |  round(CAST(len(list_filter(ws, w2 -> w2 IN ('the','a','of','to','and','in'))) AS DOUBLE) / len(ws), 6) AS stop_frac,
        |  round(CAST(len(list_filter(ws, w2 -> regexp_matches(w2, '^[a-z]+$$'))) AS DOUBLE) / len(ws), 6) AS alpha_frac
        | FROM gt),
        |gg AS (
        | SELECT doc_id, source,
        |  (CASE WHEN nw < 20 OR nw > 90 THEN 1 ELSE 0 END
        |   + CASE WHEN mean_len < 4.0 OR mean_len > 5.0 THEN 1 ELSE 0 END
        |   + CASE WHEN stop_frac < 0.02 THEN 1 ELSE 0 END
        |   + CASE WHEN alpha_frac < 0.8 THEN 1 ELSE 0 END) = 0 AS gpass
        | FROM gf)
        |SELECT gg.source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN k.kept AND gg.gpass THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pass,
        | CAST(sum(CASE WHEN k.kept AND NOT gg.gpass THEN 1 ELSE 0 END) AS BIGINT) AS n_clf_only,
        | CAST(sum(CASE WHEN NOT k.kept AND gg.gpass THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_only,
        | CAST(sum(CASE WHEN NOT k.kept AND NOT gg.gpass THEN 1 ELSE 0 END) AS BIGINT) AS n_both_fail,
        | round(CAST(sum(CASE WHEN k.kept = gg.gpass THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*), 6) AS agreement
        |FROM gg JOIN k USING (doc_id) GROUP BY gg.source""".stripMargin,
    // q147: q65's bin rule, largest source as reference, Laplace-smoothed
    // expectations, 12-dp decimal-summed chi-square terms (order-free)
    "q147_source_drift_chi2" ->
      s"""WITH b AS (
        | SELECT source,
        |  CAST(least(ceil(len($tokens) / 16.0), 6) AS INT) AS bin
        | FROM documents),
        |bc AS (SELECT source, bin, count(*) AS o FROM b GROUP BY source, bin),
        |st AS (SELECT source, CAST(sum(o) AS BIGINT) AS n_docs FROM bc GROUP BY source),
        |rf AS (SELECT source AS ref_source, n_docs AS n_ref FROM (
        |  SELECT source, n_docs,
        |   row_number() OVER (ORDER BY n_docs DESC, source ASC NULLS LAST) AS rn
        |  FROM st) t WHERE rn = 1),
        |rb AS (SELECT bc.bin, bc.o AS ref_o FROM bc JOIN rf
        |  ON bc.source IS NOT DISTINCT FROM rf.ref_source),
        |ab AS (SELECT CAST(unnest(range(0, 7)) AS INT) AS bin),
        |gx AS (
        | SELECT st.source, ab.bin, st.n_docs, coalesce(bc.o, 0) AS o
        | FROM st CROSS JOIN ab
        | LEFT JOIN bc ON bc.source IS NOT DISTINCT FROM st.source AND bc.bin = ab.bin),
        |g2 AS (
        | SELECT g.source, g.n_docs,
        |  CAST(g.n_docs AS DOUBLE) *
        |   (CAST(coalesce(rb.ref_o, 0) + 1 AS DOUBLE) /
        |    CAST((SELECT n_ref FROM rf) + 7 AS DOUBLE)) AS e,
        |  CAST(g.o AS DOUBLE) AS od
        | FROM gx g LEFT JOIN rb ON rb.bin = g.bin)
        |SELECT source, max(n_docs) AS n_docs,
        | (max(CASE WHEN source IS NOT DISTINCT FROM (SELECT ref_source FROM rf)
        |   THEN 1 ELSE 0 END) = 1) AS is_ref,
        | round(CAST(sum(CAST(round((od - e) * (od - e) / e, 12)
        |   AS DECIMAL(38,12))) AS DOUBLE), 6) AS chi2
        |FROM g2 GROUP BY source""".stripMargin,
    // q148/q149: the planted-URL CTEs replay urlRaw + urlCanonical exactly
    // (anchored single-match regexes both engines interpret identically,
    // incl. the authority-anchored :443 strip with its $1/\1 group
    // reference); keeper/cap lotteries are the q103 md5 key verbatim
    "q148_url_dedup" ->
      (urlCte +
        """SELECT source, count(*) AS n_docs,
          | CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
          | CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_removed,
          | CAST(coalesce(sum(CASE WHEN rn = 1 THEN n_chars END), 0) AS BIGINT) AS kept_chars,
          | CAST(coalesce(sum(CASE WHEN rn = 1 THEN doc_id END), 0) AS BIGINT) AS kept_checksum
          |FROM urn GROUP BY source""".stripMargin),
    "q149_domain_caps" ->
      (urlCte +
        """, surv AS (SELECT doc_id, n_chars, url FROM urn WHERE rn = 1),
          |sd AS (SELECT doc_id, n_chars, url,
          |  regexp_extract(url, '^([^/?]+)', 1) AS domain FROM surv),
          |bl AS (SELECT DISTINCT domain FROM sd
          |  WHERE ('0x' || substr(md5(domain), 1, 15))::BIGINT % 7 = 0),
          |fl AS (SELECT sd.doc_id, sd.n_chars, sd.domain,
          |  (bl.domain IS NOT NULL) AS blocked
          | FROM sd LEFT JOIN bl ON sd.domain = bl.domain),
          |rk AS (SELECT doc_id, n_chars, domain,
          |  row_number() OVER (PARTITION BY domain
          |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS krn
          | FROM fl WHERE NOT blocked)
          |SELECT domain, count(*) AS n_urls, false AS blocked,
          | CAST(sum(CASE WHEN krn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          | CAST(sum(CASE WHEN krn > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
          | CAST(coalesce(sum(CASE WHEN krn <= 5 THEN n_chars END), 0) AS BIGINT) AS kept_chars,
          | CAST(coalesce(sum(CASE WHEN krn <= 5 THEN doc_id END), 0) AS BIGINT) AS kept_checksum
          |FROM rk GROUP BY domain
          |UNION ALL
          |SELECT domain, count(*) AS n_urls, true AS blocked,
          | CAST(0 AS BIGINT) AS n_kept,
          | CAST(count(*) AS BIGINT) AS n_dropped,
          | CAST(0 AS BIGINT) AS kept_chars, CAST(0 AS BIGINT) AS kept_checksum
          |FROM fl WHERE blocked GROUP BY domain""".stripMargin),
    // q150: both batching disciplines replayed with the same total orders
    // (doc_id / length-then-id); NULL text is an empty sequence that still
    // occupies a slot (coalesce to 0), and the all-empty language guards
    // its waste ratio against 0/0 in both engines
    "q150_padding_waste" ->
      s"""WITH base AS (
        | SELECT lang, doc_id, coalesce(len($tokens), 0) AS n_tokens
        | FROM documents),
        |a AS (SELECT lang, n_tokens,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn FROM base),
        |s AS (SELECT lang, n_tokens,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn
        | FROM base),
        |ab AS (SELECT lang, CAST(floor((rn - 1) / 32.0) AS BIGINT) AS batch_id,
        |  count(*) AS c, max(n_tokens) AS mx, CAST(sum(n_tokens) AS BIGINT) AS st
        | FROM a GROUP BY 1, 2),
        |sb AS (SELECT lang, CAST(floor((rn - 1) / 32.0) AS BIGINT) AS batch_id,
        |  count(*) AS c, max(n_tokens) AS mx, CAST(sum(n_tokens) AS BIGINT) AS st
        | FROM s GROUP BY 1, 2),
        |au AS (SELECT 'arrival' AS strategy, lang,
        |  CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(sum(st) AS BIGINT) AS real_tokens,
        |  CAST(sum(c * mx - st) AS BIGINT) AS padded_slots FROM ab GROUP BY lang),
        |su AS (SELECT 'sorted' AS strategy, lang,
        |  CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(sum(st) AS BIGINT) AS real_tokens,
        |  CAST(sum(c * mx - st) AS BIGINT) AS padded_slots FROM sb GROUP BY lang),
        |u AS (SELECT * FROM au UNION ALL SELECT * FROM su)
        |SELECT strategy, lang, n_batches, n_docs, real_tokens, padded_slots,
        | CASE WHEN real_tokens + padded_slots = 0 THEN 0.0
        |  ELSE round(CAST(padded_slots AS DOUBLE) / (real_tokens + padded_slots), 6)
        |  END AS waste_pct
        |FROM u""".stripMargin,
    // q151: the q34 fingerprint CTE + the q35/q74 band-and-Hamming
    // predicate, replayed as incoming-vs-corpus admission; NULL
    // hash/fingerprint rows admit (NULL never equi-joins in either engine)
    "q151_incremental_dedup" ->
      (simhashFpCte() +
        s""",
          |base AS (
          | SELECT d.doc_id, d.source, md5(d.text) AS h128, fp.simhash,
          |  (d.doc_id % 3 = 0) AS incoming
          | FROM documents d JOIN fp ON fp.doc_id = d.doc_id),
          |ch AS (SELECT DISTINCT h128 FROM base
          | WHERE NOT incoming AND h128 IS NOT NULL),
          |cfp AS (SELECT DISTINCT simhash FROM base
          | WHERE NOT incoming AND simhash IS NOT NULL),
          |ifp AS (SELECT DISTINCT simhash FROM base
          | WHERE incoming AND simhash IS NOT NULL),
          |nf AS (SELECT DISTINCT a.simhash FROM ifp a JOIN cfp b
          | ON $simhashPairPredicate),
          |inc AS (SELECT i.doc_id, i.source,
          |  (e.h128 IS NOT NULL) AS is_exact,
          |  (n.simhash IS NOT NULL) AS has_near
          | FROM base i
          | LEFT JOIN ch e ON i.h128 = e.h128
          | LEFT JOIN nf n ON i.simhash = n.simhash
          | WHERE i.incoming)
          |SELECT source, count(*) AS n_incoming,
          | CAST(sum(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_exact_dup,
          | CAST(sum(CASE WHEN NOT is_exact AND has_near THEN 1 ELSE 0 END)
          |   AS BIGINT) AS n_near_dup,
          | CAST(sum(CASE WHEN NOT is_exact AND NOT has_near THEN 1 ELSE 0 END)
          |   AS BIGINT) AS n_admitted,
          | CAST(sum(CASE WHEN NOT is_exact AND NOT has_near THEN doc_id
          |   ELSE 0 END) AS BIGINT) AS admitted_checksum
          |FROM inc GROUP BY source""".stripMargin),
    // q140: dimensions re-derived from the generator formula (q43's oracle
    // discipline) — the funnel diverges if encode or decode lied
    "q140_image_filter_funnel" ->
      """SELECT source,
        | CASE WHEN n_chars IS NULL THEN 'no_payload'
        |  WHEN least(1 + n_chars % 64, 1 + (n_chars * 7) % 48) < 8 THEN 'too_small'
        |  WHEN (1 + n_chars % 64) > 3 * (1 + (n_chars * 7) % 48)
        |    OR (1 + (n_chars * 7) % 48) > 3 * (1 + n_chars % 64) THEN 'bad_aspect'
        |  ELSE 'kept' END AS verdict,
        | count(*) AS n_docs
        |FROM documents GROUP BY source, verdict""".stripMargin,
    // q129: the q98 span CTEs with first-occurrence (doc_id, pos)
    // survivorship instead of the df-threshold drop set
    "q129_paragraph_dedup" ->
      """WITH ws AS (
        | SELECT doc_id, regexp_split_to_array(trim(coalesce(text,'')), '\s+') AS w
        | FROM documents),
        |c AS (SELECT doc_id, w, CAST(unnest(range(0, greatest(len(w),1), 8)) AS INT) AS s
        | FROM ws),
        |h AS (SELECT doc_id, s, span,
        |  CAST(('0x' || substring(md5(span), 1, 15)) AS BIGINT) AS sh
        | FROM (SELECT doc_id, s, array_to_string(w[s+1:s+8], ' ') AS span FROM c) t),
        |r AS (SELECT doc_id, s, span,
        |  row_number() OVER (PARTITION BY sh ORDER BY doc_id, s) AS rn FROM h),
        |k AS (
        | SELECT doc_id, count(*) AS n_paragraphs,
        |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY s) AS cleaned
        | FROM r GROUP BY doc_id)
        |SELECT doc_id, CAST(n_paragraphs AS BIGINT) AS n_paragraphs, n_dropped,
        | CASE WHEN cleaned IS NULL OR cleaned = '' THEN 0
        |      ELSE CAST(len(regexp_split_to_array(cleaned, '\s+')) AS BIGINT)
        | END AS kept_tokens,
        | CAST(('0x' || substring(md5(cleaned), 1, 15)) AS BIGINT) AS cleaned_hash
        |FROM k""".stripMargin,
    // per-(doc, word) entropy terms rounded 6 dp then DECIMAL-summed (the
    // q99 discipline); norm_entropy rounds per doc before the per-lang
    // decimal average, so aggregation order cannot fork the engines
    "q125_entropy_profile" ->
      s"""WITH wc AS (
        | SELECT doc_id, lang, w, count(*) AS c
        | FROM (SELECT doc_id, lang, unnest($tokens) AS w FROM documents) t
        | GROUP BY doc_id, lang, w),
        |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS types FROM wc GROUP BY doc_id),
        |pd AS (
        | SELECT wc.doc_id, wc.lang, tot.types,
        |  sum(CAST(round(-(CAST(wc.c AS DOUBLE) / tot.n) *
        |    log2(CAST(wc.c AS DOUBLE) / tot.n), 6) AS DECIMAL(28,6))) AS h
        | FROM wc JOIN tot ON wc.doc_id = tot.doc_id
        | GROUP BY wc.doc_id, wc.lang, tot.types),
        |pn AS (
        | SELECT doc_id, lang, h,
        |  CASE WHEN types <= 1 THEN CAST(0 AS DECIMAL(18,6))
        |       ELSE CAST(round(CAST(h AS DOUBLE) / log2(CAST(types AS DOUBLE)), 6)
        |            AS DECIMAL(18,6)) END AS norm_h
        | FROM pd)
        |SELECT lang,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | round(CAST(sum(h) AS DOUBLE) / count(*), 6) AS avg_entropy,
        | round(CAST(sum(CAST(norm_h AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS avg_norm_entropy,
        | round(CAST(max(h) AS DOUBLE), 6) AS max_entropy,
        | round(CAST(min(h) AS DOUBLE), 6) AS min_entropy
        |FROM pn GROUP BY lang""".stripMargin,
    // cross-source leakage: the q35 pair surface joined to sources,
    // normalized to src_a <= src_b (NULL last) by the same explicit CASE
    // the engine spells
    "q101_cross_source_leakage" ->
      (simhashFpCte() +
        s""",
          |p AS (
          | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          | WHERE $simhashPairPredicate),
          |js AS (
          | SELECT p.hamming,
          |  CASE WHEN db.source IS NOT NULL AND (da.source IS NULL OR da.source > db.source)
          |       THEN db.source ELSE da.source END AS src_a,
          |  CASE WHEN db.source IS NOT NULL AND (da.source IS NULL OR da.source > db.source)
          |       THEN da.source ELSE db.source END AS src_b,
          |  CASE WHEN db.source IS NOT NULL AND (da.source IS NULL OR da.source > db.source)
          |       THEN p.doc_b ELSE p.doc_a END AS da,
          |  CASE WHEN db.source IS NOT NULL AND (da.source IS NULL OR da.source > db.source)
          |       THEN p.doc_a ELSE p.doc_b END AS db
          | FROM p JOIN documents da ON p.doc_a = da.doc_id
          |        JOIN documents db ON p.doc_b = db.doc_id)
          |SELECT src_a, src_b, count(*) AS n_pairs,
          | count(DISTINCT da) AS n_docs_a, count(DISTINCT db) AS n_docs_b,
          | min(hamming) AS min_hamming
          |FROM js GROUP BY 1, 2""".stripMargin),
    "q102_pq_codebooks" ->
      (pqCte(4, 4) +
        """
          |SELECT sub, code, count(*) AS n_members,
          | round(CAST(coalesce(sum(CAST(d AS DECIMAL(28,15))), 0) AS DOUBLE), 6) AS distortion,
          | CAST(sum(vec_id) AS BIGINT) AS id_checksum
          |FROM pa2 GROUP BY sub, code""".stripMargin),
    // the one-window semantic spelling; the engine's two-phase plan
    // (under-cap sources never shuffle) must reproduce it exactly
    "q103_source_caps" ->
      """WITH r AS (
        | SELECT doc_id, source, n_chars,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM documents)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN rn > 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        | CAST(coalesce(sum(CASE WHEN rn <= 15 THEN n_chars END), 0) AS BIGINT) AS kept_chars,
        | CAST(coalesce(sum(CASE WHEN rn <= 15 THEN doc_id END), 0) AS BIGINT) AS kept_checksum
        |FROM r GROUP BY source""".stripMargin,
    "q104_encoding_quality" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        | CAST(coalesce(sum(length(text) -
        |   length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'))), 0) AS BIGINT) AS ctrl_chars,
        | CAST(coalesce(sum(length(text) -
        |   length(regexp_replace(text, '\x{FFFD}', '', 'g'))), 0) AS BIGINT) AS repl_chars,
        | CAST(coalesce(sum(length(text) -
        |   length(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))), 0) AS BIGINT) AS non_ascii,
        | CAST(coalesce(sum(len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]{2,}')) - 1), 0) AS BIGINT) AS ws_runs
        |FROM documents GROUP BY source""".stripMargin,
    "q105_zipf_diversity" ->
      s"""WITH t AS (SELECT source, unnest($tokens) AS tok FROM documents),
        |tt AS (SELECT source, tok FROM t WHERE length(tok) > 0),
        |f AS (SELECT source, tok, count(*) AS freq FROM tt GROUP BY source, tok),
        |tot AS (SELECT source, CAST(sum(freq) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types FROM f GROUP BY source),
        |r AS (SELECT source, tok, freq,
        |  row_number() OVER (PARTITION BY source ORDER BY freq DESC, tok) AS rn FROM f),
        |xy AS (SELECT source, round(log10(CAST(rn AS DOUBLE)), 12) AS x,
        |  round(log10(CAST(freq AS DOUBLE)), 12) AS y FROM r WHERE rn <= 100),
        |m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(x*x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        | FROM xy GROUP BY source)
        |SELECT tot.source AS source, n_tokens, n_types,
        | round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
        | round(CASE WHEN n*sxx - sx*sx <> 0
        |   THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END, 6) AS zipf_slope
        |FROM tot JOIN m ON tot.source IS NOT DISTINCT FROM m.source""".stripMargin,
    // PQ train (both Lloyd rounds) + the closing centroid update over the
    // final codes = the ADC codebook; the window replay of the engine's
    // bounded-heap top-k (adc ASC, id tie-break)
    "q106_pq_adc_topk" ->
      (pqCte(4, 4) +
        """,
          |pqc AS (SELECT vec_id, sub, se, code FROM pa2 WHERE se IS NOT NULL),
          |pb3 AS (SELECT sub, code AS c_code, list(mean_v ORDER BY dim) AS c0 FROM (
          |  SELECT sub, code, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
          |  FROM (SELECT sub, code, unnest(range(1, len(se)+1)) AS dim, unnest(se) AS x FROM pqc) t
          |  GROUP BY sub, code, dim) tt GROUP BY sub, code),
          |pqq AS (SELECT vec_id AS query_id, sub, se FROM pqc WHERE vec_id % 100 = 0),
          |dtab AS (SELECT q.query_id, q.sub, b.c_code AS code,
          |  round(coalesce(list_sum(list_transform(range(1, least(len(q.se), len(b.c0))+1),
          |    i -> (q.se[i]-b.c0[i])*(q.se[i]-b.c0[i]))), 0), 12) AS qd
          | FROM pqq q JOIN pb3 b ON q.sub = b.sub),
          |sc AS (SELECT d.query_id, c.vec_id AS neighbor_id,
          |  round(CAST(sum(CAST(qd AS DECIMAL(28,15))) AS DOUBLE), 6) AS adc_dist
          | FROM pqc c JOIN dtab d ON c.sub = d.sub AND c.code = d.code
          | WHERE d.query_id <> c.vec_id
          | GROUP BY d.query_id, c.vec_id)
          |SELECT query_id, neighbor_id, adc_dist, rn FROM (
          | SELECT query_id, neighbor_id, adc_dist,
          |  row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rn
          | FROM sc) t WHERE rn <= 5""".stripMargin),
    // q106's ADC ranking intersected with the exact-L2 ranking, per query
    "q107_pq_recall" ->
      (pqCte(4, 4) +
        """,
          |pqc AS (SELECT vec_id, sub, se, code FROM pa2 WHERE se IS NOT NULL),
          |pb3 AS (SELECT sub, code AS c_code, list(mean_v ORDER BY dim) AS c0 FROM (
          |  SELECT sub, code, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
          |  FROM (SELECT sub, code, unnest(range(1, len(se)+1)) AS dim, unnest(se) AS x FROM pqc) t
          |  GROUP BY sub, code, dim) tt GROUP BY sub, code),
          |pqq AS (SELECT vec_id AS query_id, sub, se FROM pqc WHERE vec_id % 100 = 0),
          |dtab AS (SELECT q.query_id, q.sub, b.c_code AS code,
          |  round(coalesce(list_sum(list_transform(range(1, least(len(q.se), len(b.c0))+1),
          |    i -> (q.se[i]-b.c0[i])*(q.se[i]-b.c0[i]))), 0), 12) AS qd
          | FROM pqq q JOIN pb3 b ON q.sub = b.sub),
          |sc AS (SELECT d.query_id, c.vec_id AS neighbor_id,
          |  round(CAST(sum(CAST(qd AS DECIMAL(28,15))) AS DOUBLE), 6) AS adc_dist
          | FROM pqc c JOIN dtab d ON c.sub = d.sub AND c.code = d.code
          | WHERE d.query_id <> c.vec_id
          | GROUP BY d.query_id, c.vec_id),
          |adcr AS (SELECT query_id, neighbor_id FROM (
          | SELECT query_id, neighbor_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rn
          | FROM sc) t WHERE rn <= 5),
          |vv AS (SELECT vec_id, e FROM v WHERE e IS NOT NULL),
          |exq AS (SELECT vec_id AS query_id, e AS qe FROM vv WHERE vec_id % 100 = 0),
          |exs AS (SELECT exq.query_id, c.vec_id AS neighbor_id,
          |  round(coalesce(list_sum(list_transform(range(1, least(len(c.e), len(exq.qe))+1),
          |    i -> (c.e[i]-exq.qe[i])*(c.e[i]-exq.qe[i]))), 0), 12) AS d2
          | FROM vv c CROSS JOIN exq WHERE c.vec_id <> exq.query_id),
          |exr AS (SELECT query_id, neighbor_id FROM (
          | SELECT query_id, neighbor_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, neighbor_id) AS rn
          | FROM exs) t WHERE rn <= 5),
          |hits AS (SELECT a.query_id, count(*) AS h
          | FROM adcr a JOIN exr e
          |   ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
          | GROUP BY a.query_id)
          |SELECT q.query_id, CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
          | round(CAST(coalesce(h, 0) AS DOUBLE) / 5, 6) AS recall
          |FROM (SELECT DISTINCT query_id FROM adcr) q
          |LEFT JOIN hits ON q.query_id = hits.query_id""".stripMargin),
    // q165: pqCte's codes + the ivfCte routing replayed over the same
    // base — candidates restricted to probed cells BEFORE the ADC sum
    "q165_ivf_adc_topk" ->
      (ivfAdcCte +
        """
          |SELECT query_id, neighbor_id, adc_dist, rn FROM (
          | SELECT query_id, neighbor_id, adc_dist,
          |  row_number() OVER (PARTITION BY query_id
          |    ORDER BY adc_dist ASC, neighbor_id) AS rn
          | FROM iasc) t WHERE rn <= 5""".stripMargin),
    // q166: q165's ranking intersected with the exact-L2 ranking — the
    // q107 tail over the composed path
    "q166_ivf_adc_recall" ->
      (ivfAdcCte +
        """,
          |adcr AS (SELECT query_id, neighbor_id FROM (
          | SELECT query_id, neighbor_id,
          |  row_number() OVER (PARTITION BY query_id
          |    ORDER BY adc_dist ASC, neighbor_id) AS rn
          | FROM iasc) t WHERE rn <= 5),
          |vv AS (SELECT vec_id, e FROM v WHERE e IS NOT NULL),
          |exq AS (SELECT vec_id AS query_id, e AS qe FROM vv WHERE vec_id % 100 = 0),
          |exs AS (SELECT exq.query_id, c.vec_id AS neighbor_id,
          |  round(coalesce(list_sum(list_transform(range(1, least(len(c.e), len(exq.qe))+1),
          |    i -> (c.e[i]-exq.qe[i])*(c.e[i]-exq.qe[i]))), 0), 12) AS d2
          | FROM vv c CROSS JOIN exq WHERE c.vec_id <> exq.query_id),
          |exr AS (SELECT query_id, neighbor_id FROM (
          | SELECT query_id, neighbor_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, neighbor_id) AS rn
          | FROM exs) t WHERE rn <= 5),
          |hits AS (SELECT a.query_id, count(*) AS h
          | FROM adcr a JOIN exr e
          |   ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
          | GROUP BY a.query_id)
          |SELECT q.query_id, CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
          | round(CAST(coalesce(h, 0) AS DOUBLE) / 5, 6) AS recall
          |FROM (SELECT DISTINCT query_id FROM adcr) q
          |LEFT JOIN hits ON q.query_id = hits.query_id""".stripMargin),
    // q170: the q77 codebook + mid-rise reconstruction rebuilt into
    // vectors, ranked with the q36 machinery on both representations —
    // identical dequantization arithmetic, rank ties to lowest id
    "q170_int8_recall" ->
      s"""WITH e AS (SELECT vec_id,
        |  CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS dim,
        |  CAST(unnest(embedding) AS DOUBLE) AS x
        | FROM embeddings),
        |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim),
        |qz AS (SELECT vec_id, dim, mn, mx,
        |  CASE WHEN mx = mn THEN 0
        |   ELSE CAST(least(255, floor((x - mn) / (mx - mn) * 256.0)) AS BIGINT)
        |  END AS code
        | FROM e JOIN st USING (dim)),
        |dq AS (SELECT vec_id,
        |  list(CASE WHEN mx = mn THEN mn
        |   ELSE mn + (code + 0.5) * ((mx - mn) / 256.0) END ORDER BY dim) AS e
        | FROM qz GROUP BY vec_id),
        |aq AS (SELECT vec_id AS query_id, e AS qe FROM dq WHERE vec_id % 100 = 0),
        |asc_ AS (SELECT query_id, c.vec_id AS neighbor_id,
        |  ${cosListSql("qe", "c.e")} AS cosine
        | FROM aq CROSS JOIN dq c WHERE c.vec_id <> query_id),
        |ar AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM asc_ WHERE cosine IS NOT NULL) t WHERE rn <= 5),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |xq AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 0),
        |xs AS (SELECT query_id, c.vec_id AS neighbor_id,
        |  ${cosListSql("qe", "c.e")} AS cosine
        | FROM xq CROSS JOIN v c WHERE c.vec_id <> query_id),
        |xr AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM xs WHERE cosine IS NOT NULL) t WHERE rn <= 5),
        |hits AS (SELECT a.query_id, count(*) AS h
        | FROM ar a JOIN xr x
        |   ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
        | GROUP BY a.query_id)
        |SELECT q.query_id, CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
        | round(CAST(coalesce(h, 0) AS DOUBLE) / 5, 6) AS recall
        |FROM (SELECT DISTINCT query_id FROM xr) q
        |LEFT JOIN hits ON q.query_id = hits.query_id""".stripMargin,
    // q171: the q87 cell assignment (kmeansCte's a2) + strided-probe
    // exact pair truth, banded by the 12-dp rounded cosine
    "q171_semdedup_blocking_recall" ->
      (kmeansCte +
        s""",
          |vv AS (SELECT vec_id, e FROM v WHERE e IS NOT NULL),
          |pr AS (SELECT vec_id AS p_id, e AS pe FROM vv WHERE vec_id % 50 = 0),
          |ts AS (SELECT p_id, c.vec_id AS c_id,
          |  round(${cosListSql("pe", "c.e")}, 12) AS cos
          | FROM pr CROSS JOIN vv c WHERE c.vec_id <> p_id),
          |tp AS (SELECT DISTINCT least(p_id, c_id) AS vec_a,
          |  greatest(p_id, c_id) AS vec_b, cos
          | FROM ts WHERE cos >= 0.35),
          |tc AS (SELECT tp.cos, ca.cell AS cell_a, cb.cell AS cell_b
          | FROM tp JOIN a2 ca ON tp.vec_a = ca.vec_id
          |  JOIN a2 cb ON tp.vec_b = cb.vec_id),
          |bd AS (SELECT
          |  CASE WHEN cos >= 0.9 THEN '0.9+'
          |   WHEN cos >= 0.6 THEN '0.6-0.9' ELSE 't-0.6' END AS band,
          |  CASE WHEN cell_a = cell_b THEN 1 ELSE 0 END AS same_cell
          | FROM tc)
          |SELECT band, count(*) AS n_true_pairs,
          | CAST(sum(same_cell) AS BIGINT) AS n_same_cell,
          | round(CAST(sum(same_cell) AS DOUBLE) / count(*), 6) AS recall
          |FROM bd GROUP BY band""".stripMargin),
    // cosine over the common prefix (the engine computes dot and both
    // norms over min(len)); zero-magnitude division -> NULL on both sides
    "q108_embedding_isotropy" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |g AS (SELECT dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
        | FROM (SELECT unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x FROM v) t
        | GROUP BY dim),
        |gc AS (SELECT list(mean_v ORDER BY dim) AS c0 FROM g),
        |sc AS (SELECT label,
        |  round(list_sum(list_transform(range(1, least(len(e), len(c0))+1), i -> e[i]*c0[i])) /
        |   (sqrt(list_sum(list_transform(range(1, least(len(e), len(c0))+1), i -> e[i]*e[i]))) *
        |    sqrt(list_sum(list_transform(range(1, least(len(e), len(c0))+1), i -> c0[i]*c0[i])))), 12) AS cos,
        |  round(sqrt(coalesce(list_sum(list_transform(e, x -> x*x)), 0)), 12) AS nrm
        | FROM v CROSS JOIN gc)
        |SELECT label, count(*) AS n_vecs,
        | round(CAST(sum(CAST(cos AS DECIMAL(28,15))) AS DOUBLE) / count(cos), 6) AS avg_cos_centroid,
        | round(CAST(sum(CAST(nrm AS DECIMAL(28,15))) AS DOUBLE) / count(nrm), 6) AS avg_norm
        |FROM sc GROUP BY label""".stripMargin,
    // chained per-user min-aggregates; ts compared at MICRO precision on
    // both sides (the engine's events table is micros)
    "q109_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |f2 AS (SELECT e.user_id, min(e.ts) AS t2, max(f1.t1) AS t1
        | FROM e JOIN f1 ON e.user_id = f1.user_id
        | WHERE e.event_type = 'click' AND e.ts > f1.t1 GROUP BY e.user_id),
        |f3 AS (SELECT e.user_id, min(e.ts) AS t3, max(f2.t1) AS t1
        | FROM e JOIN f2 ON e.user_id = f2.user_id
        | WHERE e.event_type = 'purchase' AND e.ts > f2.t2 GROUP BY e.user_id),
        |base AS (SELECT count(*) AS base_n FROM f1),
        |r AS (
        | SELECT '1_view' AS step, count(*) AS n_users,
        |  round(CAST(sum(CAST(round((epoch_us(t1) - epoch_us(t1)) / 1000000.0, 12) AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS avg_secs
        | FROM f1
        | UNION ALL
        | SELECT '2_click', count(*),
        |  round(CAST(sum(CAST(round((epoch_us(t2) - epoch_us(t1)) / 1000000.0, 12) AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
        | FROM f2
        | UNION ALL
        | SELECT '3_purchase', count(*),
        |  round(CAST(sum(CAST(round((epoch_us(t3) - epoch_us(t1)) / 1000000.0, 12) AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
        | FROM f3)
        |SELECT step, CAST(n_users AS BIGINT) AS n_users,
        | round(CASE WHEN base_n > 0 THEN CAST(n_users AS DOUBLE) / base_n END, 6) AS conv_from_first,
        | avg_secs
        |FROM r CROSS JOIN base""".stripMargin)

  /** DuckDB replay of the full iterated BPE training loop (q97): the word-
    * frequency table (capped like the engine's driver collect), the initial
    * per-character symbol split, then `nMerges` UNROLLED iterations — pair
    * counts over the evolving symbol table, deterministic top pair, greedy
    * left-to-right rewrite. The rewrite's only overlap case is a pair
    * (a,a) inside a run of a's (an a≠b match can never be adjacent to
    * another), where greedy = merge the even offsets within each maximal
    * run of matches: `is_m AND (i − run_start) % 2 = 0`, with runs found
    * by the classic gaps-and-islands `i − row_number()` trick. A position
    * is dropped from the next table iff its predecessor merged
    * (`lag(m)`); a merged position emits `syms[i] || syms[i+1]`.
    *
    * The chained CTEs MUST be `MATERIALIZED`: each round references its
    * predecessor 2× (pair count + rewrite) and the round's top-pair 2×,
    * and DuckDB inlines plain CTEs per reference — the unrolled 8-round
    * chain then expands exponentially (observed: minutes, vs 0.6 s
    * materialized). */
  private def bpeTrainSql(nMerges: Int, vocabCap: Int): String = {
    val rows = (1 to nMerges).map { k =>
      s"SELECT CAST($k AS INT) AS merge_rank, a, b, cnt FROM t$k"
    }.mkString("\n UNION ALL ")
    s"""${bpeTrainCtes(nMerges, vocabCap)}
      |SELECT merge_rank, a AS l_sym, b AS r_sym, a || b AS merged,
      | cnt AS n_occurrences
      |FROM ($rows)""".stripMargin
  }

  /** The unrolled BPE-training CTE chain (see [[bpeTrainSql]]) without the
    * final projection — reused by q100's encoding oracle, whose replace
    * chain needs the per-round top-pair tables t1..tN. */
  private def bpeTrainCtes(nMerges: Int, vocabCap: Int): String = {
    val head =
      s"""WITH wc AS MATERIALIZED (
        | SELECT w AS word, count(*) AS n
        | FROM (SELECT unnest($tokens) AS w FROM documents) t
        | WHERE len(w) >= 2 GROUP BY w
        | ORDER BY n DESC, word LIMIT $vocabCap),
        |s0 AS MATERIALIZED (
        | SELECT word, n, list_transform(range(1, len(word)+1),
        |   i -> substring(word, CAST(i AS INT), 1)) AS syms
        | FROM wc)""".stripMargin
    val iters = (1 to nMerges).map { k =>
      val prev = s"s${k - 1}"
      s""",p$k AS MATERIALIZED (
        | SELECT s.syms[CAST(t.i AS INT)] AS a, s.syms[CAST(t.i AS INT)+1] AS b,
        |  CAST(sum(s.n) AS BIGINT) AS cnt
        | FROM $prev s, unnest(range(1, len(s.syms))) AS t(i)
        | GROUP BY 1, 2),
        |t$k AS MATERIALIZED (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
        |x$k AS (
        | SELECT s.word, s.n, s.syms, CAST(t.i AS INT) AS i,
        |  (CAST(t.i AS INT) < len(s.syms)
        |   AND s.syms[CAST(t.i AS INT)] = (SELECT a FROM t$k)
        |   AND s.syms[CAST(t.i AS INT)+1] = (SELECT b FROM t$k)) AS is_m
        | FROM $prev s, unnest(range(1, len(s.syms)+1)) AS t(i)),
        |y$k AS (
        | SELECT *, CASE WHEN is_m THEN
        |   i - CAST(row_number() OVER (PARTITION BY word, is_m ORDER BY i) AS INT)
        |  END AS grp
        | FROM x$k),
        |z$k AS (
        | SELECT *, is_m AND ((i - min(i) OVER (PARTITION BY word, grp)) % 2 = 0) AS m
        | FROM y$k),
        |w$k AS (
        | SELECT *, lag(m) OVER (PARTITION BY word ORDER BY i) AS pm FROM z$k),
        |s$k AS MATERIALIZED (
        | SELECT word, max(n) AS n,
        |  list(CASE WHEN m THEN syms[i] || syms[i+1] ELSE syms[i] END ORDER BY i) AS syms
        | FROM w$k WHERE NOT coalesce(pm, FALSE)
        | GROUP BY word)""".stripMargin
    }.mkString
    s"$head$iters"
  }

  /** DuckDB replay of BPE encoding (q100): train the merges via
    * [[bpeTrainCtes]], then encode every corpus word (len ≥ 1, uncapped —
    * merges APPLY to everything, the cap is a training concern) through
    * the delimited-string replace chain. Each symbol is wrapped
    * `\n sym \n` so replace's literal left-to-right non-overlapping scan
    * is exactly the greedy BPE rewrite (wrappers own their delimiters —
    * adjacent matches never share a byte; validated against a fold
    * reference incl. non-BMP and (a,a)-run cases). An exhausted round's
    * empty t-table coalesces to a tab pattern (unmatchable: words are
    * whitespace-split) — a no-op, matching the engine's shorter merge
    * list. */
  /** q128 oracle: the dHash fingerprints replayed from the PURE pixel and
    * dimension formulas (the q43 discipline — the engine decodes REAL
    * PNGs, so if either the encode or the decode drifted from the
    * formula, the hashes and hence this histogram would mismatch), then
    * the q114 banded-pair histogram over them via the shared
    * [[simhashPairPredicate]]. `% 16777216` is double-wrapped so negative
    * ids reduce to the same low-24-bits the JVM's toInt & 0xFFFFFF keeps. */
  /** The dHash fingerprint CTE chain (dims → grid → gray → fp), shared by
    * the q128 histogram and q130 cluster oracles. `prefix` lets the
    * recursive consumer start the chain with WITH RECURSIVE. */
  private def dhashFpCte(prefix: String = "WITH"): String =
    s"""$prefix dims AS (
       | SELECT doc_id, (1 + n_chars % 64) AS w, (1 + (n_chars * 7) % 48) AS h
       | FROM documents WHERE n_chars IS NOT NULL),
       |grid AS (
       | SELECT doc_id, gy, gx, ((gx * w) // 11) AS sx, ((gy * h) // 6) AS sy
       | FROM dims, (SELECT unnest(range(6)) AS gy) ys,
       |            (SELECT unnest(range(11)) AS gx) xs),
       |gray AS (
       | SELECT doc_id, gy, gx,
       |  ((((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3) AS g
       | FROM (SELECT doc_id, gy, gx,
       |        ((doc_id * 131 + sx * 31 + sy * 7) % 16777216 + 16777216)
       |          % 16777216 AS v
       |       FROM grid) t),
       |fp AS (
       | SELECT g1.doc_id,
       |  CAST(coalesce(sum(CASE WHEN g1.g > g2.g
       |    THEN (1::BIGINT << CAST(g1.gy * 10 + g1.gx AS INTEGER))
       |    ELSE 0 END), 0) AS BIGINT) AS simhash
       | FROM gray g1 JOIN gray g2
       |   ON g1.doc_id = g2.doc_id AND g1.gy = g2.gy AND g2.gx = g1.gx + 1
       | GROUP BY 1)""".stripMargin

  /** q128 oracle: the q114 banded-pair histogram over the replayed dHash
    * fingerprints. */
  private def imageDhashSql(): String =
    dhashFpCte() +
      s""",
       |hp AS (
       | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       | WHERE $simhashPairPredicate)
       |SELECT hamming, count(*) AS n_pairs,
       | count(DISTINCT doc_a) AS n_docs_a, count(DISTINCT doc_b) AS n_docs_b
       |FROM hp GROUP BY hamming""".stripMargin

  /** q130 oracle: recursive-CTE connected components (the q74 oracle's
    * reach/clusters chain) over the replayed dHash pair graph. */
  private def imageDhashClustersSql(): String =
    dhashFpCte("WITH RECURSIVE") +
      s""",
        |p AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        | WHERE $simhashPairPredicate),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |      UNION SELECT doc_b AS src, doc_a AS dst FROM p),
        |reach AS (
        | SELECT src AS node, src AS lbl FROM (SELECT DISTINCT src FROM e) t
        | UNION
        | SELECT e.src AS node, r.lbl FROM e JOIN reach r ON r.node = e.dst),
        |clusters AS (
        | SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id FROM clusters""".stripMargin

  /** q133 oracle: per truncation tier, the q36 top-k CTE over the first
    * `dims` components, recall-joined against the full-dimension top-k. */
  private def mrlRecallSql(k: Int = 5, stride: Long = 100,
      tiers: Seq[Int] = Seq(8, 16, 32)): String = {
    def cos(n: String) =
      s"""list_sum(list_transform(range(1, $n), i -> qe[i]*ce[i])) /
         |   (sqrt(list_sum(list_transform(range(1, $n), i -> qe[i]*qe[i]))) *
         |    sqrt(list_sum(list_transform(range(1, $n), i -> ce[i]*ce[i]))))""".stripMargin
    def topk(tag: String, n: String) =
      s"""s$tag AS (SELECT query_id, neighbor_id, ${cos(n)} AS cosine
         | FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
         |t$tag AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |   row_number() OVER (PARTITION BY query_id
         |     ORDER BY cosine DESC, neighbor_id) AS rn
         |  FROM s$tag WHERE cosine IS NOT NULL) t WHERE rn <= $k)""".stripMargin
    val tierCtes = tiers.map(dm => topk(s"$dm", s"${dm + 1}") +
      s""",
         |h$dm AS (SELECT query_id, count(*) AS h
         | FROM t$dm JOIN tfull USING (query_id, neighbor_id) GROUP BY 1),
         |r$dm AS (SELECT $dm AS trunc_dims, eq.query_id,
         |  CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
         |  round(CAST(coalesce(h, 0) AS DOUBLE) / $k, 6) AS recall
         | FROM eq LEFT JOIN h$dm USING (query_id))""".stripMargin)
      .mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id % $stride = 0),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
       |  FROM embeddings),
       |${topk("full", "len(qe)+1")},
       |eq AS (SELECT DISTINCT query_id FROM tfull),
       |$tierCtes
       |${tiers.map(dm => s"SELECT * FROM r$dm").mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** q127 oracle: both pair surfaces replayed from their own CTE chains
    * (the q32 cand CTE and the q35 predicate — single sources, so the
    * oracles cannot desynchronize), the SimHash membership of each
    * MinHash pair recomputed from the joined fingerprints, and the
    * simhash_only cell recovered by the same subtraction the engine
    * performs against the (q114-equivalent) SimHash totals. */
  /** q157 oracle: the q156 general-model CTEs (capped counts, add-one
    * smoothing, -log10, 6-dp decimal terms) aggregated per SOURCE, then
    * the multiplicative-weights rounds UNROLLED (the q97 BPE-train
    * discipline): each round quantizes the unnormalized weight to
    * DECIMAL(28,12) — absorbing cross-engine exp() ulp noise — sums the
    * decimals exactly, and re-rounds the normalized weight to 6 dp,
    * mirroring the Spark driver's BigDecimal arithmetic spelling. */
  private def domainReweightSql(rounds: Int = 3, eta: Double = 1.0): String = {
    val cap = graft.analytics.TextStats.PerplexityVocabCap
    val iter = (1 to rounds).map { r =>
      val prev = if (r == 1) "w0" else s"w${r - 1}"
      s"""u$r AS (SELECT source, nll,
         |  CAST(w * exp($eta * (nll - mn)) AS DECIMAL(28,12)) AS u
         | FROM $prev CROSS JOIN mnk),
         |w$r AS (SELECT source, nll,
         |  round(CAST(u AS DOUBLE) /
         |    CAST((SELECT sum(u) FROM u$r) AS DOUBLE), 6) AS w FROM u$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ws AS (SELECT doc_id, source, $tokens AS w FROM documents),
      |dd AS (SELECT doc_id, source, w, coalesce(len(w), 0) AS nw FROM ws),
      |uc0 AS (SELECT w1, count(*) AS cu_g
      | FROM (SELECT unnest(w) AS w1 FROM dd) t GROUP BY w1),
      |ucg AS (SELECT w1, cu_g FROM (
      |  SELECT w1, cu_g, row_number() OVER (ORDER BY cu_g DESC, w1) AS rn
      |  FROM uc0 WHERE cu_g > 0) t WHERE rn <= $cap),
      |bg0 AS (SELECT source, w[CAST(i AS INT)] AS w1,
      |  w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] AS b
      | FROM (SELECT source, w, unnest(range(1, nw)) AS i
      |       FROM dd WHERE nw >= 2) t),
      |bc0 AS (SELECT b, count(*) AS cb_g FROM bg0 GROUP BY b),
      |bcg AS (SELECT b, cb_g FROM (
      |  SELECT b, cb_g, row_number() OVER (ORDER BY cb_g DESC, b) AS rn
      |  FROM bc0 WHERE cb_g > 0) t WHERE rn <= $cap),
      |vg AS (SELECT count(*) AS v_g FROM ucg),
      |tm AS (
      | SELECT g.source,
      |  CAST(CASE WHEN vg.v_g > 0 THEN
      |   round(-log10((coalesce(bcg.cb_g, 0) + 1.0) /
      |     (coalesce(ucg.cu_g, 0) + vg.v_g)), 6) END
      |   AS DECIMAL(18,6)) AS term_g
      | FROM bg0 g
      | LEFT JOIN bcg USING (b) LEFT JOIN ucg ON g.w1 = ucg.w1
      | CROSS JOIN vg),
      |nl AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(CAST(sum(term_g) AS DOUBLE) / count(*), 6) AS nll
      | FROM tm GROUP BY source),
      |act AS (SELECT source, nll FROM nl WHERE nll IS NOT NULL),
      |mnk AS (SELECT count(*) AS k, min(nll) AS mn FROM act),
      |w0 AS (SELECT source, nll, round(1.0 / k, 6) AS w
      | FROM act CROSS JOIN mnk),
      |$iter,
      |ct AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      | FROM documents GROUP BY source)
      |SELECT ct.source, ct.n_docs, nl.n_bigrams, nl.nll,
      | w$rounds.w AS weight
      |FROM ct
      |LEFT JOIN nl ON ct.source IS NOT DISTINCT FROM nl.source
      |LEFT JOIN w$rounds ON ct.source IS NOT DISTINCT FROM w$rounds.source"""
      .stripMargin
  }

  private def dedupAgreementSql(numPerm: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxHamming: Int = 6): String = {
    // the `sh` CTE reuses simhashPairPredicate, which hardcodes Hamming
    // <= 6 — a different bound would silently desynchronize the
    // simhash_only subtraction from the mhc membership gate
    require(maxHamming == 6,
      s"dedupAgreementSql is pinned to maxHamming=6 (got $maxHamming)")
    val sharedBand = (0 until 4).map(k =>
      s"((sa >> ${k * 15}) & 32767) = ((sb >> ${k * 15}) & 32767)")
      .mkString("(", " OR ", ")")
    minhashCte(numPerm, bands) + "," + simhashFpCte("") +
      s""",
       |cand AS (
       | SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |  CAST(len(list_intersect(list_distinct(a.ws), list_distinct(b2.ws))) AS DOUBLE) /
       |   len(list_distinct(list_concat(a.ws, b2.ws))) AS jac
       | FROM b a JOIN b b2 ON a.doc_id < b2.doc_id
       | WHERE ${minhashBandMatch(numPerm, bands)}),
       |mh AS (SELECT doc_a, doc_b, round(jac, 6) AS jaccard
       |       FROM cand WHERE jac >= $threshold),
       |mhs AS (
       | SELECT mh.jaccard, fa.simhash AS sa, fb.simhash AS sb,
       |  bit_count(xor(fa.simhash, fb.simhash)) AS ham
       | FROM mh JOIN fp fa ON mh.doc_a = fa.doc_id
       |         JOIN fp fb ON mh.doc_b = fb.doc_id),
       |mhc AS (
       | SELECT jaccard, ham, ($sharedBand AND ham <= $maxHamming) AS in_sh
       | FROM mhs),
       |agg1 AS (
       | SELECT
       |  coalesce(CAST(sum(CASE WHEN in_sh THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_both,
       |  sum(CASE WHEN in_sh THEN CAST(jaccard AS DECIMAL(18,6)) END) AS jsum_both,
       |  coalesce(CAST(sum(CASE WHEN in_sh THEN ham END) AS BIGINT), 0) AS hsum_both,
       |  coalesce(CAST(sum(CASE WHEN NOT in_sh THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_mo,
       |  sum(CASE WHEN NOT in_sh THEN CAST(jaccard AS DECIMAL(18,6)) END) AS jsum_mo,
       |  coalesce(CAST(sum(CASE WHEN NOT in_sh THEN ham END) AS BIGINT), 0) AS hsum_mo
       | FROM mhc),
       |sh AS (
       | SELECT coalesce(CAST(count(*) AS BIGINT), 0) AS n_sh,
       |  coalesce(CAST(sum(bit_count(xor(a.simhash, b.simhash))) AS BIGINT), 0) AS hsum_sh
       | FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       | WHERE $simhashPairPredicate)
       |SELECT * FROM (
       | SELECT 'both' AS agreement, n_both AS n_pairs,
       |  CASE WHEN n_both > 0 THEN round(CAST(jsum_both AS DOUBLE) / n_both, 6) END AS avg_jaccard,
       |  CASE WHEN n_both > 0 THEN round(CAST(hsum_both AS DOUBLE) / n_both, 6) END AS avg_hamming
       | FROM agg1, sh
       | UNION ALL
       | SELECT 'minhash_only', n_mo,
       |  CASE WHEN n_mo > 0 THEN round(CAST(jsum_mo AS DOUBLE) / n_mo, 6) END,
       |  CASE WHEN n_mo > 0 THEN round(CAST(hsum_mo AS DOUBLE) / n_mo, 6) END
       | FROM agg1, sh
       | UNION ALL
       | SELECT 'simhash_only', n_sh - n_both,
       |  CAST(NULL AS DOUBLE),
       |  CASE WHEN n_sh - n_both > 0
       |       THEN round(CAST(hsum_sh - hsum_both AS DOUBLE) / (n_sh - n_both), 6) END
       | FROM agg1, sh)
       |ORDER BY agreement""".stripMargin
  }

  /** q126 oracle: the count-min sketch replayed bucket-for-bucket — row
    * i's hash is the i-th 32-bit slice of md5(word) (the engine's
    * one-digest double-hashing), min-of-depth estimate, and overestimate
    * against the exact top-k counts. */
  private def cmsSql(depth: Int, width: Int, k: Int): String = {
    val rows = (0 until depth).mkString(", ")
    def bucket(w: String, i: String) =
      s"('0x' || substring(md5($w), $i*8+1, 8))::BIGINT % $width"
    s"""WITH toks AS (SELECT t.w AS w FROM documents, UNNEST($tokens) AS t(w)),
      |sk AS (
      | SELECT u.i AS i, ${bucket("w", "u.i")} AS b, CAST(count(*) AS BIGINT) AS c
      | FROM toks, UNNEST([$rows]) AS u(i)
      | GROUP BY 1, 2),
      |top AS (
      | SELECT w AS word, CAST(count(*) AS BIGINT) AS n_exact
      | FROM toks GROUP BY w ORDER BY n_exact DESC, word LIMIT $k),
      |wb AS (
      | SELECT top.word, top.n_exact, u.i AS i, ${bucket("top.word", "u.i")} AS b
      | FROM top, UNNEST([$rows]) AS u(i))
      |SELECT wb.word, wb.n_exact, min(sk.c) AS n_est,
      | min(sk.c) - wb.n_exact AS overestimate
      |FROM wb JOIN sk ON sk.i = wb.i AND sk.b = wb.b
      |GROUP BY wb.word, wb.n_exact
      |ORDER BY wb.n_exact DESC, wb.word""".stripMargin
  }

  /** q124 oracle: the q100 encode replay keyed by (lang, word), rolled up
    * to per-language fertility/compression ratios. */
  private def bpeFertilitySql(nMerges: Int, vocabCap: Int): String = {
    val delimited =
      "list_aggregate(list_transform(range(1, len(word)+1), " +
        "i -> chr(10) || word[CAST(i AS INT)] || chr(10)), 'string_agg', '')"
    val encoded = (1 to nMerges).foldLeft(delimited) { (acc, k) =>
      val patt = s"(SELECT chr(10) || a || chr(10) || chr(10) || b || chr(10) FROM t$k)"
      val repl = s"(SELECT chr(10) || a || b || chr(10) FROM t$k)"
      s"replace($acc, coalesce($patt, chr(9)), coalesce($repl, chr(9)))"
    }
    s"""${bpeTrainCtes(nMerges, vocabCap)},
      |wall AS MATERIALIZED (
      | SELECT lang, w AS word, count(*) AS n
      | FROM (SELECT lang, unnest($tokens) AS w FROM documents) t
      | WHERE len(w) >= 1 GROUP BY lang, w),
      |enc AS MATERIALIZED (
      | SELECT lang, n,
      |  CAST(len(list_filter(string_split($encoded, chr(10)), x -> x <> '')) AS BIGINT) AS n_toks,
      |  CAST(len(word) AS BIGINT) AS n_chars
      | FROM wall)
      |SELECT lang,
      | CAST(sum(n) AS BIGINT) AS n_words,
      | CAST(sum(n * n_toks) AS BIGINT) AS n_tokens,
      | round(CAST(sum(n * n_toks) AS DOUBLE) / sum(n), 6) AS fertility,
      | round(CAST(sum(n * n_chars) AS DOUBLE) / sum(n * n_toks), 6) AS chars_per_token
      |FROM enc GROUP BY lang""".stripMargin
  }

  private def bpeEncodeSql(nMerges: Int, vocabCap: Int, topK: Int): String = {
    val delimited =
      "list_aggregate(list_transform(range(1, len(word)+1), " +
        "i -> chr(10) || word[CAST(i AS INT)] || chr(10)), 'string_agg', '')"
    val encoded = (1 to nMerges).foldLeft(delimited) { (acc, k) =>
      val patt = s"(SELECT chr(10) || a || chr(10) || chr(10) || b || chr(10) FROM t$k)"
      val repl = s"(SELECT chr(10) || a || b || chr(10) FROM t$k)"
      s"replace($acc, coalesce($patt, chr(9)), coalesce($repl, chr(9)))"
    }
    s"""${bpeTrainCtes(nMerges, vocabCap)},
      |wall AS MATERIALIZED (
      | SELECT w AS word, count(*) AS n
      | FROM (SELECT unnest($tokens) AS w FROM documents) t
      | WHERE len(w) >= 1 GROUP BY w),
      |enc AS MATERIALIZED (
      | SELECT n, $encoded AS es FROM wall),
      |tok AS MATERIALIZED (
      | SELECT t.tk AS token, CAST(sum(e.n) AS BIGINT) AS n_occurrences
      | FROM enc e, unnest(list_filter(string_split(e.es, chr(10)),
      |   x -> x <> '')) AS t(tk)
      | GROUP BY 1)
      |SELECT token, n_occurrences,
      | (SELECT CAST(sum(n_occurrences) AS BIGINT) FROM tok) AS total_tokens
      |FROM tok ORDER BY n_occurrences DESC, token LIMIT $topK""".stripMargin
  }

  /** DuckDB replay of the two Lloyd k-means iterations (shared by q83 and
    * q87): init cell = vec_id % 8, decimal-summed centroids, 12-dp-rounded
    * argmax-cosine assignment with ties to lowest cell. Ends with
    * `a2(vec_id, label, e, cell)` — the final assignment. */
  /** Unrolled 2-iteration product-quantization replay: every subspace's
    * Lloyd loop in one pass keyed (sub, code), subspace width from the
    * same `ceil(max(len)/m)` data probe the engine uses, L2 distances
    * rounded 12 dp, argmin ties `NULLS LAST, code` (= the engine's
    * sentinel-key `min(struct)`). */
  private def pqCte(m: Int, k: Int): String = {
    def step(src: String, cN: String, bN: String, sN: String, aN: String) =
      s"""$cN AS (SELECT sub, code, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
         | FROM (SELECT sub, code, unnest(range(1, len(se)+1)) AS dim, unnest(se) AS x FROM $src) t
         | GROUP BY sub, code, dim),
         |$bN AS (SELECT sub, code AS c_code, list(mean_v ORDER BY dim) AS c0 FROM $cN GROUP BY sub, code),
         |$sN AS (SELECT a.vec_id, a.sub, a.se, b.c_code,
         |  CASE WHEN a.se IS NULL THEN NULL ELSE
         |   round(coalesce(list_sum(list_transform(range(1, least(len(a.se), len(b.c0))+1),
         |     i -> (a.se[i]-b.c0[i])*(a.se[i]-b.c0[i]))), 0), 12) END AS d
         | FROM $src a JOIN $bN b ON a.sub = b.sub),
         |$aN AS (SELECT vec_id, sub, se, c_code AS code, d FROM (
         |  SELECT vec_id, sub, se, c_code, d,
         |   row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC NULLS LAST, c_code) AS rn
         |  FROM $sN) t WHERE rn = 1)""".stripMargin
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |dsw AS (SELECT CAST(ceil(max(len(e)) / $m.0) AS INT) AS w FROM v),
       |sv AS (SELECT vec_id, sub, e[CAST(sub*w+1 AS INT):CAST(sub*w+w AS INT)] AS se
       | FROM v CROSS JOIN dsw CROSS JOIN (SELECT unnest(range(0, $m)) AS sub) subs),
       |pa0 AS (SELECT vec_id, sub, se, vec_id % $k AS code FROM sv),
       |${step("pa0", "pc1", "pb1", "ps1", "pa1")},
       |${step("pa1", "pc2", "pb2", "ps2", "pa2")}""".stripMargin
  }

  /** q165/q166 shared oracle base: pqCte's trained codes + closing
    * codebook + query distance tables, with the ivfCte hyperplane-cell
    * routing replayed over the same `v` base, and the ADC candidate set
    * restricted to each query's probed cells (the engine's join order). */
  private def ivfAdcCte: String =
    pqCte(4, 4) +
      """,
        |pqc AS (SELECT vec_id, sub, se, code FROM pa2 WHERE se IS NOT NULL),
        |pb3 AS (SELECT sub, code AS c_code, list(mean_v ORDER BY dim) AS c0 FROM (
        |  SELECT sub, code, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
        |  FROM (SELECT sub, code, unnest(range(1, len(se)+1)) AS dim, unnest(se) AS x FROM pqc) t
        |  GROUP BY sub, code, dim) tt GROUP BY sub, code),
        |icell AS (
        | SELECT vec_id, e,
        |  CAST(list_sum(list_transform(range(0,3), p ->
        |   CASE WHEN list_sum(list_transform(range(1, len(e)+1),
        |     i -> e[i] * (((('0x' || substring(md5(CAST(p AS VARCHAR) || '_' ||
        |            CAST(i-1 AS VARCHAR)),1,8))::BIGINT % 1000000)/1000000.0) - 0.5)))
        |     >= 0 THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS cell
        | FROM v),
        |icent AS (
        | SELECT cell, dim,
        |  CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
        | FROM (
        |   SELECT cell, unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x
        |   FROM icell) t
        | GROUP BY cell, dim),
        |ica AS (SELECT cell, list(mean_v ORDER BY dim) AS c0 FROM icent GROUP BY cell),
        |iq AS (SELECT vec_id AS query_id, e AS qe FROM icell WHERE vec_id % 100 = 0),
        |irouted AS (
        | SELECT query_id, cell,
        |  list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*c0[i])) /
        |   (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]*qe[i]))) *
        |    sqrt(list_sum(list_transform(range(1, len(c0)+1), i -> c0[i]*c0[i])))) AS c_cos
        | FROM iq CROSS JOIN ica),
        |iprobes AS (
        | SELECT query_id, cell FROM (
        |  SELECT query_id, cell,
        |   row_number() OVER (PARTITION BY query_id ORDER BY c_cos DESC, cell) AS pr
        |  FROM irouted) t WHERE pr <= 4),
        |pqq AS (SELECT vec_id AS query_id, sub, se FROM pqc WHERE vec_id % 100 = 0),
        |dtab AS (SELECT q.query_id, q.sub, b.c_code AS code,
        |  round(coalesce(list_sum(list_transform(range(1, least(len(q.se), len(b.c0))+1),
        |    i -> (q.se[i]-b.c0[i])*(q.se[i]-b.c0[i]))), 0), 12) AS qd
        | FROM pqq q JOIN pb3 b ON q.sub = b.sub),
        |iasc AS (SELECT d.query_id, c.vec_id AS neighbor_id,
        |  round(CAST(sum(CAST(qd AS DECIMAL(28,15))) AS DOUBLE), 6) AS adc_dist
        | FROM pqc c
        | JOIN icell nc ON nc.vec_id = c.vec_id
        | JOIN iprobes p ON p.cell = nc.cell
        | JOIN dtab d ON d.query_id = p.query_id
        |   AND d.sub = c.sub AND d.code = c.code
        | WHERE d.query_id <> c.vec_id
        | GROUP BY d.query_id, c.vec_id)""".stripMargin

  private def kmeansCte: String =
    """WITH v AS (
      | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |a0 AS (SELECT vec_id, label, e, vec_id % 8 AS cell FROM v),
      |cent1 AS (
      | SELECT cell, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
      | FROM (SELECT cell, unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x FROM a0) t
      | GROUP BY cell, dim),
      |ca1 AS (SELECT cell AS c_cell, list(mean_v ORDER BY dim) AS c0 FROM cent1 GROUP BY cell),
      |s1 AS (
      | SELECT vec_id, label, e, c_cell,
      |  round(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*c0[i])) /
      |   (sqrt(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*e[i]))) *
      |    sqrt(list_sum(list_transform(range(1, len(c0)+1), i -> c0[i]*c0[i])))), 12) AS c_cos
      | FROM a0 CROSS JOIN ca1),
      |a1 AS (SELECT vec_id, label, e, c_cell AS cell FROM (
      |  SELECT vec_id, label, e, c_cell, c_cos,
      |   row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_cell) AS rn
      |  FROM s1) t WHERE rn = 1),
      |cent2 AS (
      | SELECT cell, dim, CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
      | FROM (SELECT cell, unnest(range(1, len(e)+1)) AS dim, unnest(e) AS x FROM a1) t
      | GROUP BY cell, dim),
      |ca2 AS (SELECT cell AS c_cell, list(mean_v ORDER BY dim) AS c0 FROM cent2 GROUP BY cell),
      |s2 AS (
      | SELECT vec_id, label, e, c_cell,
      |  round(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*c0[i])) /
      |   (sqrt(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*e[i]))) *
      |    sqrt(list_sum(list_transform(range(1, len(c0)+1), i -> c0[i]*c0[i])))), 12) AS c_cos
      | FROM a1 CROSS JOIN ca2),
      |a2 AS (SELECT vec_id, label, e, c_cell AS cell FROM (
      |  SELECT vec_id, label, e, c_cell, c_cos,
      |   row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_cell) AS rn
      |  FROM s2) t WHERE rn = 1)""".stripMargin

  /** CTE `fp(doc_id, h)`: distinct positional word k-gram hashes per doc —
    * the exhaustive sibling of [[winnowFpCte]] (no min-window sampling). */
  /** The q144 kNN-graph CTE chain (cells → in-cell scoring → per-vector
    * top-k table `t`), shared by the q144 and q145 oracles. */
  private def knnGraphCte(withKw: String): String =
    s"""$withKw v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |cells AS (
      | SELECT vec_id, e,
      |  CAST(list_sum(list_transform(range(0,3), p ->
      |   CASE WHEN list_sum(list_transform(range(1, len(e)+1),
      |     i -> e[i] * (((('0x' || substring(md5(CAST(p AS VARCHAR) || '_' ||
      |            CAST(i-1 AS VARCHAR)),1,8))::BIGINT % 1000000)/1000000.0) - 0.5)))
      |     >= 0 THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS cell
      | FROM v),
      |s AS (SELECT a.vec_id, b.vec_id AS nbr_id, ${cosListSql("a.e", "b.e")} AS cosine
      | FROM cells a JOIN cells b ON b.cell = a.cell AND b.vec_id <> a.vec_id),
      |r AS (SELECT vec_id, nbr_id, cosine,
      |  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id) AS rn
      | FROM s WHERE cosine IS NOT NULL),
      |t AS (SELECT vec_id, nbr_id, round(cosine, 6) AS cosine,
      |  CAST(rn AS INTEGER) AS rn FROM r WHERE rn <= 5)""".stripMargin

  /** Shared base CTEs for the bitext-mining oracles (q142/q143): the
    * labeled odd/even halves with the ivfCte hyperplane cell attached. */
  private val bitextBaseCte: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      |  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL),
      |cl AS (SELECT vec_id, v, label,
      |  CAST(list_sum(list_transform(range(0,3), p ->
      |   CASE WHEN list_sum(list_transform(range(1, len(v)+1),
      |     i -> v[i] * (((('0x' || substring(md5(CAST(p AS VARCHAR) || '_' ||
      |            CAST(i-1 AS VARCHAR)),1,8))::BIGINT % 1000000)/1000000.0) - 0.5)))
      |     >= 0 THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS cell
      | FROM e),
      |bsrc AS (SELECT vec_id AS src_id, v, cell FROM cl WHERE label % 2 = 0),
      |btgt AS (SELECT vec_id AS tgt_id, v, cell FROM cl WHERE label % 2 = 1),
      |bq AS (SELECT src_id, v, cell FROM bsrc WHERE src_id % 20 = 0)""".stripMargin

  /** One bitext margin chain (forward top-k → rank-ordered averages →
    * backward top-k → margin), CTE names prefixed by `p` so the exact and
    * routed chains coexist in one WITH (q143). `routed = true` inserts the
    * per-side centroid tables and nprobe=2 cell pruning before each
    * scoring pass — the q142 plan's oracle replay. */
  private def bitextChainCtes(p: String, routed: Boolean): String = {
    val fwdScore =
      if (!routed)
        s""",${p}fs AS (SELECT q.src_id, t.tgt_id, ${cosListSql("q.v", "t.v")} AS cosine
          | FROM bq q CROSS JOIN btgt t)""".stripMargin
      else
        s""",${p}tc AS (SELECT cell, dim,
          |  CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
          | FROM (SELECT cell, unnest(range(1, len(v)+1)) AS dim, unnest(v) AS x
          |   FROM btgt) t GROUP BY cell, dim),
          |${p}tca AS (SELECT cell, list(mean_v ORDER BY dim) AS c0 FROM ${p}tc GROUP BY cell),
          |${p}sc AS (SELECT cell, dim,
          |  CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) / count(x) AS mean_v
          | FROM (SELECT cell, unnest(range(1, len(v)+1)) AS dim, unnest(v) AS x
          |   FROM bsrc) t GROUP BY cell, dim),
          |${p}sca AS (SELECT cell, list(mean_v ORDER BY dim) AS c0 FROM ${p}sc GROUP BY cell),
          |${p}fr0 AS (SELECT q.src_id, q.v, a.cell, ${cosListSql("q.v", "a.c0")} AS c_cos
          | FROM bq q CROSS JOIN ${p}tca a),
          |${p}fp AS (SELECT src_id, v, cell FROM (
          |  SELECT src_id, v, cell,
          |   row_number() OVER (PARTITION BY src_id ORDER BY c_cos DESC, cell) AS pr
          |  FROM ${p}fr0) t WHERE pr <= 2),
          |${p}fs AS (SELECT q.src_id, t.tgt_id, ${cosListSql("q.v", "t.v")} AS cosine
          | FROM ${p}fp q JOIN btgt t ON t.cell = q.cell)""".stripMargin
    val backScore =
      if (!routed)
        s""",${p}bs AS (SELECT c.tgt_id, s.src_id, ${cosListSql("c.v", "s.v")} AS cosine
          | FROM ${p}cd c CROSS JOIN bsrc s)""".stripMargin
      else
        s""",${p}br0 AS (SELECT c.tgt_id, c.v, a.cell, ${cosListSql("c.v", "a.c0")} AS c_cos
          | FROM ${p}cd c CROSS JOIN ${p}sca a),
          |${p}bp AS (SELECT tgt_id, v, cell FROM (
          |  SELECT tgt_id, v, cell,
          |   row_number() OVER (PARTITION BY tgt_id ORDER BY c_cos DESC, cell) AS pr
          |  FROM ${p}br0) t WHERE pr <= 2),
          |${p}bs AS (SELECT c.tgt_id, s.src_id, ${cosListSql("c.v", "s.v")} AS cosine
          | FROM ${p}bp c JOIN bsrc s ON s.cell = c.cell)""".stripMargin
    fwdScore +
      s""",
        |${p}fr AS (SELECT src_id, tgt_id, cosine,
        |  row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, tgt_id) AS rn
        | FROM ${p}fs WHERE cosine IS NOT NULL),
        |${p}ft AS (SELECT * FROM ${p}fr WHERE rn <= 4),
        |${p}sa AS (SELECT src_id,
        |  round(list_sum(list(cosine ORDER BY rn)) / count(*), 6) AS src_avg
        | FROM ${p}ft GROUP BY src_id),
        |${p}cd AS (SELECT tg.tgt_id, tg.v
        | FROM (SELECT DISTINCT tgt_id FROM ${p}ft) c JOIN btgt tg USING (tgt_id))""".stripMargin +
      backScore +
      s""",
        |${p}br AS (SELECT tgt_id, src_id, cosine,
        |  row_number() OVER (PARTITION BY tgt_id ORDER BY cosine DESC, src_id) AS rn
        | FROM ${p}bs WHERE cosine IS NOT NULL),
        |${p}ba AS (SELECT tgt_id,
        |  round(list_sum(list(cosine ORDER BY rn)) / count(*), 6) AS tgt_avg
        | FROM ${p}br WHERE rn <= 4 GROUP BY tgt_id),
        |${p}best AS (SELECT src_id, tgt_id, round(cosine, 6) AS cosine
        | FROM ${p}ft WHERE rn = 1),
        |${p}res AS (SELECT b.src_id, b.tgt_id, b.cosine,
        |  round(b.cosine / ((sa.src_avg + ba.tgt_avg) / 2), 6) AS margin
        | FROM ${p}best b JOIN ${p}sa sa USING (src_id) JOIN ${p}ba ba USING (tgt_id))""".stripMargin
  }

  /** DuckDB cosine over two DOUBLE[] expressions — q36's formula verbatim
    * (same dot/norm accumulation order as the native expression). */
  private def cosListSql(qe: String, ce: String): String =
    s"""list_sum(list_transform(range(1, len($qe)+1), i -> $qe[i]*$ce[i])) /
       |   (sqrt(list_sum(list_transform(range(1, len($qe)+1), i -> $qe[i]*$qe[i]))) *
       |    sqrt(list_sum(list_transform(range(1, len($ce)+1), i -> $ce[i]*$ce[i]))))""".stripMargin

  private def allGramCte(k: Int): String =
    s"""WITH ws AS (SELECT doc_id, $tokens AS w FROM documents),
      |g AS (SELECT doc_id, list_transform(range(0, greatest(len(w)-$k,0)+1),
      |  i -> array_to_string(w[CAST(i+1 AS INT):CAST(i+$k AS INT)], ' ')) AS grams
      | FROM ws),
      |fp AS (SELECT DISTINCT doc_id,
      |  CAST(('0x' || substring(md5(g2), 1, 15)) AS BIGINT) AS h
      | FROM (SELECT doc_id, unnest(grams) AS g2 FROM g) t
      | WHERE g2 IS NOT NULL)""".stripMargin

  private val winnowFpCte: String =
    s"""WITH ws AS (SELECT doc_id, $tokens AS w FROM documents),
      |g AS (SELECT doc_id, list_transform(range(0, greatest(len(w)-3,0)+1),
      |  i -> array_to_string(w[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' ')) AS grams
      | FROM ws),
      |h AS (SELECT doc_id, list_transform(grams,
      |  s2 -> CAST(('0x' || substring(md5(s2), 1, 15)) AS BIGINT)) AS hs FROM g),
      |m AS (SELECT doc_id, list_distinct(list_transform(
      |  range(0, greatest(len(hs)-4,0)+1),
      |  p -> list_aggregate(hs[CAST(p+1 AS INT):CAST(p+4 AS INT)], 'min'))) AS fps
      | FROM h),
      |fp AS (SELECT doc_id, unnest(fps) AS fp FROM m)""".stripMargin

  private val winnowFpSql: String =
    winnowFpCte + "\nSELECT doc_id, fp FROM fp"
}

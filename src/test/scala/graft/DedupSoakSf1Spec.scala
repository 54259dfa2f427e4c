package graft

import graft.analytics.{Dedup, Sampling, Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * 10× (sf1-scale) soak of the dedup family — the operators whose scale
 * story otherwise rests on design argument + sf0.1 measurements.
 *
 * Fixture: 10 shards, each a word-renamed copy of sf0.1's `documents`
 * (every token prefixed with a shard namespace, ids offset by shard).
 * Renaming every token keeps the WITHIN-shard duplicate/near-dup structure
 * bit-identical to sf0.1 while making shards mutually unrelated — so the
 * 10× corpus has the same cluster-size distribution as sf0.1, just 10×
 * the volume: the honest "same workload, more of it" scaling shape (a
 * naive 10× copy would instead square the within-cluster pair counts).
 *
 * Assertions: the star contraction's round count must stay logarithmic
 * (shard-local clusters ⇒ sf1 rounds == sf0.1 rounds, allowing +2 slack),
 * and each operator's min-of-2 wall must grow ≲ linearly (generous 6×
 * headroom over the 10× data ratio — this host stalls for seconds at a
 * time; the recorded times in the test output are the real artifact).
 * Generated data is cached under target/ across runs.
 */
class DedupSoakSf1Spec extends AnyFunSuite with SparkSuite {

  private val sf01 = "/root/testdata/sf0.1"
  private val soakDir = "target/soak_sf1"

  private def ensureSf1(): Unit =
    graft.tools.SoakFixtures.ensureSf1(spark, sf01, soakDir)

  private def minOf2(f: => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  test("dedup family at 10x: linear-ish wall growth, logarithmic contraction rounds") {
    ensureSf1()
    val ops: Seq[(String, String => Long)] = Seq(
      "q32_minhash" -> (d => Dedup.minhashPairs(spark, d).count()),
      "q35_simhash_pairs" -> (d => Dedup.simhashPairs(spark, d).count()),
      "q78_winnow_fps" -> (d => TextStats.winnowFingerprints(spark, d).count()),
      "q79_winnow_pairs" -> (d => TextStats.winnowPairs(spark, d).count()),
      // clear the session-shared contraction memo so the soak times the
      // real work, not a cache hit from a previous run on the same dir
      "q81_dedup_apply" -> (d => {
        Dedup.clearSharedClusterEdges()
        Sampling.dedupApply(spark, d).count()
      }),
      "q84_shared_grams" -> (d => TextStats.sharedGramPairs(spark, d).count()),
      // incremental admission (round 14): one PINNED fingerprint pass +
      // h128 window + value-collapsed band LEFT SEMI — wall must track
      // corpus size, never candidate-pair mass
      "q151_incremental" -> (d => Dedup.incrementalDedup(spark, d).count()),
      // quality keepers (round 14) ride the shared contraction; clear the
      // memo so the soak times the fixpoint + keeper window, not a cache
      "q153_quality_keepers" -> (d => {
        Dedup.clearSharedClusterEdges()
        Dedup.qualityKeepers(spark, d).count()
      }),
      // audio fingerprints (round 14): per-partition fold + the collapsed
      // histogram; observable = total banded pair mass (monotone in the
      // corpus where distinct-hamming row count is not)
      "q155_audio_fp" -> (d => graft.analytics.Multimodal
        .audioFpHistogram(spark, d)
        .agg(sum(col("n_pairs"))).head().getLong(0)),
      // image near-dup: per-partition PNG encode+decode+dHash, then the
      // collapsed q114 histogram machinery over the 60-bit fingerprints
      "q128_image_dhash" -> (d => graft.analytics.Multimodal
        .imageDhashHistogram(spark, d).count()),
      // paragraph dedup: narrow (doc_id, pos, hash) shuffle + in-row
      // reassembly — wall must track corpus size, not span-pair count
      "q129_paragraph_dedup" -> (d => TextStats.paragraphDedup(spark, d).count()),
      "q85_ngram_contam" -> (d => TextStats.ngramContamination(spark, d).count()),
      // classifier filter: two clean corpus scans (train, score) against a
      // FIXED-size broadcast model — the per-row cost is the observable
      "q91_classifier" -> (d => TextStats.classifierQualityStats(spark, d).count()))

    ops.foreach { case (name, op) =>
      val (t01, n01) = minOf2(op(sf01))
      val (t1, n1) = minOf2(op(soakDir))
      info(f"$name: sf0.1 $t01%.1fs ($n01 rows) -> sf1 $t1%.1fs ($n1 rows), ratio ${t1 / t01}%.1fx")
      assert(n1 >= n01, s"$name: 10x corpus produced fewer rows than sf0.1")
      assert(t1 <= t01 * 60 + 30,
        f"$name: super-linear blowup — sf0.1 $t01%.1fs vs sf1 $t1%.1fs (10x data, 60x+30s budget)")
    }

    // ANN family: per-QUERY cost is the scale observable (brute/IVF work
    // is |Q| x scanned-corpus, so the query stride scales with the corpus
    // to hold |Q| fixed; bucket/cell/quant ops are corpus-linear as-is)
    val annOps: Seq[(String, (String, Long) => Long)] = Seq(
      "q36_brute_topk" -> ((d, st) => Similarity.bruteForceTopK(spark, d, stride = st).count()),
      "q37_ivf_topk" -> ((d, st) => Similarity.ivfTopK(spark, d, stride = st).count()),
      "q38_lsh_buckets" -> ((d, _) => Similarity.lshBucketStats(spark, d).count()),
      "q83_kmeans" -> ((d, _) => Similarity.kmeansCellStats(spark, d).count()),
      // SemDeDup's declared scale knobs: k grows with the corpus so cell
      // population (the quadratic term) stays constant, and Lloyd training
      // runs on the 1/4 md5 sample (FAISS convention) so only the single
      // assignment pass is corpus x k
      "q87_semdedup" -> ((d, _) => {
        val big = d != sf01
        Similarity.semdedupStatsOf(
          graft.analytics.Tables.embeddings(spark, d),
          k = if (big) 80 else 8, iters = 2, threshold = 0.35,
          trainSampleMod = if (big) 4 else 1).count()
      }),
      // D4 prototype pruning: same codebook knobs as q87 (k grows with the
      // corpus so the per-cell window stays bounded; sample-trained Lloyd)
      "q92_proto_prune" -> ((d, _) => {
        val big = d != sf01
        Similarity.protoPruneStatsOf(
          graft.analytics.Tables.embeddings(spark, d),
          k = if (big) 80 else 8, iters = 2, pruneNum = 1, pruneDen = 4,
          trainSampleMod = if (big) 4 else 1).count()
      }),
      // the full D4 composite: one shared codebook, sweep + re-centroid +
      // prune — the scale knobs compose because every stage is per-cell
      "q96_d4_pipeline" -> ((d, _) => {
        val big = d != sf01
        Similarity.d4PipelineStatsOf(
          graft.analytics.Tables.embeddings(spark, d),
          k = if (big) 80 else 8, iters = 2, threshold = 0.35,
          pruneNum = 1, pruneDen = 4,
          trainSampleMod = if (big) 4 else 1).count()
      }),
      // PQ training is corpus-linear with a FIXED m*k codebook (unlike the
      // cell ops, PQ's k does not scale with the corpus — compression
      // quality is per-subspace, not per-cell-population); at 10x the
      // codebook trains on the 1/4 md5 sample (FAISS convention, shared
      // trainSampleMod knob) so only the closing assignment is corpus-wide
      "q102_pq_codebooks" -> ((d, _) => {
        val big = d != sf01
        Similarity.pqStatsOf(
          graft.analytics.Tables.embeddings(spark, d), 4, 4, 2,
          trainSampleMod = if (big) 4 else 1).count()
      }),
      // ADC: |Q| held fixed via the stride (per-query cost is the scale
      // observable, same convention as brute/IVF)
      "q106_pq_adc" -> ((d, st) => {
        val big = d != sf01
        Similarity.pqAdcTopKOf(
          graft.analytics.Tables.embeddings(spark, d), 4, 4, 2, 5, st,
          trainSampleMod = if (big) 4 else 1).count()
      }))
    annOps.foreach { case (name, op) =>
      val (t01, n01) = minOf2(op(sf01, 100))
      val (t1, n1) = minOf2(op(soakDir, 1000))
      info(f"$name: sf0.1 $t01%.1fs ($n01 rows) -> sf1 $t1%.1fs ($n1 rows), ratio ${t1 / t01}%.1fx")
      assert(t1 <= t01 * 60 + 30,
        f"$name: super-linear blowup — sf0.1 $t01%.1fs vs sf1 $t1%.1fs")
    }

    // q74: contraction rounds are the scale observable — shard-local
    // clusters mean the 10x corpus must converge in the same O(log) rounds.
    // localFinishMaxEdges = 0 pins the LOOP's bound: the single-task
    // endgame would otherwise zero the small side's rounds and make the
    // comparison vacuous (endgame ≡ loop is ClusterSoakSpec's job).
    val (_, r01) = Dedup.duplicateClusterEdges(
      Dedup.simhashDupGraph(spark, sf01), localFinishMaxEdges = 0L)
    val t0 = System.nanoTime()
    val (edges1, r1) = Dedup.duplicateClusterEdges(
      Dedup.simhashDupGraph(spark, soakDir), localFinishMaxEdges = 0L)
    val n1 = edges1.count()
    info(f"q74: sf0.1 rounds=$r01 -> sf1 rounds=$r1 (${(System.nanoTime() - t0) / 1e9}%.1fs, $n1 member edges)")
    assert(r1 <= r01 + 2,
      s"contraction rounds grew from $r01 to $r1 at 10x — not logarithmic in cluster size")
  }
}

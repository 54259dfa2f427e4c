package graft

import graft.tools.{ResultHash, SoakFixtures}
import org.scalatest.funsuite.AnyFunSuite

/**
 * sf1 (10×) oracle-hash pins for the heaviest query families — the
 * round-13 gap: all 156 driver hashes are sf0.01, and the sf0.1/sf10
 * soaks pin timings and row counts, NOT result values, so a
 * scale-dependent collapse/overflow bug (the DuckDB
 * null-skipping-aggregate class) had nowhere it would be caught.
 *
 * Each constant below was produced by `graft.tools.Sf1HashPin` over the
 * shared 10× fixture ([[graft.tools.SoakFixtures]]) in a run whose
 * Spark↔DuckDB parity ON THAT FIXTURE was first confirmed through
 * `graft.Verify` + `tools/compare_oracle.py` (round-15 log) — so the pin
 * freezes the two engines' AGREED answer at 10× scale, not just Spark's.
 * The fixture itself is deterministic (shard-renamed sf0.1), so the
 * hashes are stable across hosts and sessions.
 *
 * If a pin breaks: either the query's semantics changed deliberately
 * (re-run Sf1HashPin + the compare gate on target/soak_sf1 and re-pin),
 * or a scale-dependent bug just surfaced — exactly what this suite is
 * for. Slow suite: ~1–2 min on a warm fixture.
 */
class Sf1HashPinSpec extends AnyFunSuite with SparkSuite {

  // name -> sha256 of the sorted-canonical result (ResultHash.hashOf).
  // As of round 18, EVERY pin in this file is DuckDB-validated at the
  // FULL sf1 fixture (50k docs / 20k vectors). The former ceiling — the
  // recursive-CTE family (q74/q127/q145/q159/q163/q169, whose oracles'
  // transitive-closure `reach` spelling stops terminating around 10k
  // docs; round 17 could only cross-validate a 5,000-doc slice at
  // ~20 min/query) — was lifted by tools/iterative_cc_oracle.py: the
  // SAME oracle SQL with only the reach/clusters block re-spelled as
  // iterative min-label propagation (+ pointer jumping) over a temp
  // edge table, and the OR-of-band nested-loop pair stages re-spelled
  // as UNION-ALL band hash equi-joins — mathematically identical, and
  // the driver-faithful compare (compare_oracle.canon, both parquet
  // bridges) is unchanged. Round-18 run, one fresh process per query:
  // q74 3.0s / q159 2.7s / q163 2.9s / q169 3.9s / q127 10.5s /
  // q145 75s (and unpinned q130 11.7s), each 1 ok 0 bad at 50k.
  private val pinned: Map[String, String] = Map(
    "q74_dup_clusters" -> "613326d650411f9139b2a95ccd205eb9a0421c5d577e7793739ee505bd761935",
    "q84_shared_gram_pairs" -> "174b1efd3553d741a3195da0f1afbde093d4316cac8e8a9eadc53962fe8661fd",
    "q99_perplexity_buckets" -> "de20b87175b62bce6f3542f43d1742508cb5d77aac6b7bbfa57b6acee62cc571",
    "q101_cross_source_leakage" -> "f91816b0c68742f2d50161fe4a78008001b63eaa54034417de0a22257b083a85",
    "q123_dsir_resample" -> "f1f4360611cf355f36b367a13c4bef92520bc7095d27fcf0c1268b7f7b6c7edb",
    "q127_dedup_agreement" -> "b0c3aadbfc21b954c8d5075aacec1de35e7d56d6c7b7715d5d754c4ee30e7350",
    "q129_paragraph_dedup" -> "74eb102efc1af486695e3a422d3689f0a452231c90c4b8e33946e8a8ef0d2452",
    "q138_bloom_decontamination" -> "7a24c52ad24b9b04e3d254c2e7b896a7383e25a8e2a4f2f166242065e6be805e",
    "q148_url_dedup" -> "8dea37c022d1d5c21bfae572256fdd8cc7b06c2b473267c192246cd5958ff864",
    "q151_incremental_dedup" -> "495f296abffe750a2a7edf2322e47efe6683182f332c237daa4e3f8515e7a3e4",
    "q156_moore_lewis" -> "a4400df4fe9a6c8769b20a40ebb054d5706091bdeac3913a6e7decd3fb56b5d4",
    // round-15 additions: q158 DuckDB-validated on target/soak_sf1
    // (2560 pairs, 1 ok 0 bad); q159 rides the q74 recursive-component
    // CTE — 50k-validated round 18 via the iterative re-spelling
    "q158_containment_pairs" -> "a96facba0385b9397a5d1959a021f52043428dd94932480c12278bb0347d278a",
    "q159_soft_dedup" -> "121d05c2df90809eb08cbbea17a1ad202c3a4264526fd3021a2fc760872e210f",
    // q160 DuckDB-validated on target/soak_sf1 (2460 pairs, 1 ok 0 bad)
    "q160_longest_shared_span" -> "855c48f94cea67f77d8f9399da507f10543bb5150ae0a07c9f22af51baea3792",
    // round-16 tier (every remaining >1 s driver query): q126/q157/q162
    // DuckDB-validated on target/soak_sf1 (3 ok, 0 bad — round-16 log).
    // q106/q107/q144 were carried as Spark-invariant under a round-16
    // "oracle O(n²) does not terminate" claim that did NOT reproduce:
    // round 17 re-probed all four — q106 2.5 s, q107 7.1 s, q144 66 s in
    // DuckDB at sf1 — and the driver-faithful compare_oracle gate then
    // CONFIRMED these pinned values cross-engine (round-17 log), closing
    // the round-17 ADVICE item without moving a constant. q145's oracle
    // (the last genuinely non-terminating one) was 50k-validated round
    // 18 via the iterative re-spelling (75 s, 1 ok 0 bad).
    "q106_pq_adc_topk" -> "5db7ba959433d0fff4efae1a26719a5e6e5e59594fede6968f86f87eccdf9301",
    "q107_pq_recall" -> "d056df101c12d7a64e3480e66ff65932e74fe998dae7607d529d2ea70308dde2",
    "q126_cms_heavy_hitters" -> "9de58acf0754d139a28546e0f66e157a3c1ec479a6c8ab7aa2f250bc69423c1a",
    "q144_knn_graph" -> "861d5bc5d39a906c4ff309974b8728d548bde688a72c8438c7a76cc6a3ad3ddd",
    "q145_knn_cluster_purity" -> "d81395ce6c633ebc53fb715c4cad7f547909412bedcf5c75d596a75bcb3564bb",
    "q157_domain_reweight" -> "78aab01fa164e05a60884d621208bbcfe9ccd87e48c988fa61961f12e2185f2b",
    "q162_neyman_sample" -> "ecfdd0c02c1116e86d6f6e9e646496c1471d4d90c12b57a03860bfb3d6ab7d6a",
    // round-17 tier: the q163–q169 audit members. q164/q165/q166/q167/
    // q168 DuckDB-validated on target/soak_sf1 through the
    // driver-faithful compare (round-17 log); q163/q169 ride the q74
    // recursive-component CTE and were 50k-validated round 18 via the
    // iterative re-spelling (2.9 s / 3.9 s, 1 ok 0 bad each — the 5k
    // slice ceiling is history)
    "q163_effective_data" -> "f70f6f8f53fd441cc37d704a9c71121dc3ecc90b7057e7821f2b3c5f91e7e2c3",
    "q164_semantic_contamination" -> "2d5afb442b99a69dd01f1983600681d38b06bbaf104585710c908d8c979b6c28",
    "q165_ivf_adc_topk" -> "4bbd9d74f4530c334979666d44c7ba4ecac64cd570113a6289c9ca8552ff78dd",
    "q166_ivf_adc_recall" -> "a297e8e3962a3d1a45365c2895e57cbda0b6c82aa9406f672782798fb2b85d41",
    "q167_contaminated_split" -> "48bd205414e10fabf7a5feed6f5c8dab87d2821b2caa3f75ae721c4324c33f54",
    "q168_winnow_recall" -> "0303037a060d91f6ea7dbd39fb10bc436eb147e8e8cf51520a52fe17b2680500",
    "q169_cluster_chain_audit" -> "bc851bbaf73779fce05bacb501e36e164f8029cf7d8ba24ae26a1083db0b1631",
    // round-17 second wave: both DuckDB-validated on target/soak_sf1
    // (per-query fresh-process compare, 1 ok 0 bad each — round-17 log)
    "q170_int8_recall" -> "2aa6793144b4a61c52067ffc1d7050ae1527cbc9ceec1f8b9cd4603841a949dd",
    "q171_semdedup_blocking_recall" -> "06a00aa7fbebd8a2c9cab0554d9b1b014d5f2f0df221ab3f06452524af8541a0",
    // round-18: the audio cluster cell — DuckDB-validated at the FULL
    // 50k sf1 fixture via tools/iterative_cc_oracle.py (25 s, 128M sym
    // edges — every doc clusters on this fixture — 1 ok 0 bad)
    "q172_audio_fp_clusters" -> "3ab81e5f52cc84876e90a704143857a7e81352dc78571cea12fa27047e9170bd")

  test("sf1 result hashes match the pinned Spark<->DuckDB agreed values") {
    SoakFixtures.ensureSf1(spark)
    graft.analytics.Dedup.clearSharedClusterEdges()
    val bad = ResultHash.Sf1PinnedQueries.flatMap { name =>
      val h = ResultHash.hashOf(SparkEntry.queries(name)(spark, SoakFixtures.Sf1Dir))
      org.apache.spark.sql.GraftBridge.releaseTransientPins()
      pinned.get(name) match {
        case Some(exp) if exp == h => None
        case Some(exp) => Some(s"$name: hash $h != pinned $exp")
        case None => Some(s"$name: NO PIN (got $h)")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Sweeping structural plan gate over the WHOLE query surface — the
 * per-operator plan asserts (PairSurfaceSpec, SamplingSpec, Round*Ops)
 * generalized: no query may ever plan a CartesianProduct, and
 * BroadcastNestedLoopJoin may appear only where the round-15 PlanAudit
 * found it — the deliberate 1-row-aggregate cross joins (corpus totals,
 * vocabulary sizes v_g/v_t, thresholds, stride probes) that broadcast a
 * single row by construction. A new query that introduces a BNLJ, or an
 * edit that grows an existing query's BNLJ count, trips this gate and
 * must either fix the plan or justify a new allowlist entry here.
 *
 * Built at sf0.001 — plan SHAPE is scale-independent for this surface
 * (no AQE decision here flips a join strategy the other way: the
 * allowlisted BNLJs are literal crossJoin(broadcast(1-row-agg)) sites).
 */
class PlanGateSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  /** query -> max BroadcastNestedLoopJoin sites (round-15 PlanAudit). */
  private val bnljAllowed: Map[String, Int] = Map(
    "q36_cosine_topk" -> 1, "q37_ivf_topk" -> 1, "q76_token_rarity" -> 1,
    "q83_kmeans_cells" -> 3, "q98_boilerplate_removal" -> 1,
    "q100_bpe_encode" -> 1, "q107_pq_recall" -> 1,
    "q108_embedding_isotropy" -> 1, "q109_event_funnel" -> 1,
    "q110_ivf_recall" -> 3, "q118_cluster_size_histogram" -> 1,
    "q119_bm25_topdocs" -> 1, "q120_hard_negatives" -> 1,
    "q121_ivf_hard_negatives" -> 1, "q122_hard_negative_recall" -> 3,
    "q123_dsir_resample" -> 1, "q133_mrl_recall" -> 3,
    "q137_bitext_margin" -> 3, "q142_ivf_bitext_margin" -> 3,
    "q143_bitext_routing_recall" -> 6, "q147_source_drift_chi2" -> 2,
    "q156_moore_lewis" -> 3, "q157_domain_reweight" -> 1,
    // the 1-row decimal weight total broadcast into the allocation
    "q162_neyman_sample" -> 1,
    // the stride-bounded broadcast bench set scored against the corpus
    // scan (the q36/q120 keyless-broadcast shape)
    "q164_semantic_contamination" -> 1,
    // the 2^nplanes-row centroid table broadcast into query routing
    // (q37's shape); q166 adds the exact side's broadcast query set and
    // ground-truth pass (the q107/q110 precedent)
    "q165_ivf_adc_topk" -> 1, "q166_ivf_adc_recall" -> 3,
    // round-17 audits: each runs the q36/q107 stride-bounded
    // broadcast-query brute-force pattern once (the exact tier reuses
    // the SAME broadcast exchange on q170; q171's kmeans stays equi-keyed)
    "q170_int8_recall" -> 1, "q171_semdedup_blocking_recall" -> 1)

  test("no query plans a CartesianProduct; BNLJ only at audited 1-row-broadcast sites") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val res =
        try {
          val plan = fn(spark, d).queryExecution.executedPlan.toString
          val cart = plan.contains("CartesianProduct")
          val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
          val cap = bnljAllowed.getOrElse(name, 0)
          if (cart) Some(s"$name: CartesianProduct in the plan")
          else if (bnlj > cap)
            Some(s"$name: $bnlj BroadcastNestedLoopJoin sites (allowed $cap)")
          else None
        } catch {
          case e: Throwable => Some(s"$name: plan build failed: ${e.getMessage}")
        }
      org.apache.spark.sql.GraftBridge.releaseTransientPins()
      res
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}

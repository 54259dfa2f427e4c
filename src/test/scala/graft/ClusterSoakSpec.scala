package graft

import graft.analytics.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Adversarial-topology soak for the min-contraction connected components
 * (q74's engine). The production fixture's duplicate graphs are
 * clique-heavy — every clique collapses to its min in one contraction
 * round, which is the algorithm's BEST case. The worst case is a long
 * CHAIN: min-contraction with path halving resolves an L-node path in
 * O(log L) rounds, and this spec pins that bound (plus correctness) on
 * chains far longer than anything the fixture produces, so a 100× corpus
 * with pathological near-dup topology can't silently blow past maxIter.
 */
class ClusterSoakSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def chainEdges(nChains: Int, len: Int) = {
    // chain c: nodes c*len .. c*len+len-1 linked consecutively
    (0 until nChains).flatMap { c =>
      val base = c.toLong * len
      (0 until len - 1).map(i => (base + i, base + i + 1))
    }.toDF("doc_a", "doc_b")
  }

  test("long chains: correct components, logarithmic round count") {
    val nChains = 4
    val len = 1024 // path of 1024 nodes; min-contraction + halving ⇒ O(log L)
    // localFinishMaxEdges = 0: this test pins the LOOP's round bound, so
    // the single-task endgame (which would resolve these few thousand
    // edges in one job with zero rounds) is disabled
    val (df, rounds) = Dedup.duplicateClustersWithRounds(
      chainEdges(nChains, len), localFinishMaxEdges = 0L)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == nChains * len, "every chained node gets a cluster row")
    out.foreach { case (node, cluster) =>
      assert(cluster == (node / len) * len,
        s"node $node: cluster $cluster != chain min ${(node / len) * len}")
    }
    assert(rounds <= 12, s"1024-node chain needed $rounds rounds (log2 = 10)")
  }

  test("near-logarithmic growth: quadrupling the chain adds a few rounds, not 4x") {
    val (_, r64) = Dedup.duplicateClustersWithRounds(
      chainEdges(1, 64), localFinishMaxEdges = 0L)
    val (_, r256) = Dedup.duplicateClustersWithRounds(
      chainEdges(1, 256), localFinishMaxEdges = 0L)
    assert(r256 <= r64 + 4,
      s"4x chain cost ${r256 - r64} extra rounds over $r64 — not logarithmic")
  }

  test("null-text docs never pair as exact duplicates (window nulls-group hazard)") {
    import spark.implicits._
    // PARTITION BY groups nulls together, unlike an equi-join where null
    // keys never match: without the guard, docs 7/8/9 would all become
    // "copies" of 7 and dedupApply would silently drop two of them
    val docs = Seq(
      (1L, Option("real text one")), (2L, Option("real text one")),
      (7L, Option.empty[String]), (8L, Option.empty[String]),
      (9L, Option.empty[String])).toDF("doc_id", "text")
    val edges = graft.analytics.Dedup.simhashDupGraphOf(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(edges == Set((2L, 1L)),
      s"only the real exact pair may edge; null texts must stay unpaired: $edges")
  }

  test("multi-parent initial state is NOT a fixpoint: (5,1),(5,2) → {1,2,5}") {
    // Regression: edges (5,1),(5,2) satisfy "no node is both child and
    // parent" — the INCOMPLETE star-forest test that convergence once
    // used — while doc 5 has two parents, so the true component {1,2,5}
    // is still uncontracted. The corrected predicate also requires every
    // child to have exactly one parent, forcing another round here.
    val (df, rounds) = Dedup.duplicateClustersWithRounds(
      Seq((5L, 1L), (5L, 2L)).toDF("doc_a", "doc_b"), localFinishMaxEdges = 0L)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rounds >= 1, "a multi-parent state must trigger at least one round")
    assert(out == Set((1L, 1L), (2L, 1L), (5L, 1L)),
      s"expected the single component {1,2,5} rooted at 1, got $out")
  }

  test("planted exact duplicates: candidate edges stay linear, components exact") {
    // A text duplicated n times puts n identical fingerprints into each of
    // its 4 band groups, so banding the FULL corpus emits ~4·n²/2 candidate
    // rows (~2M here) inside single key groups — the quadratic blowup a
    // 30–60%-duplicate web corpus hits. The exact-first graph
    // (simhashDupGraphOf) must stay linear: n−1 member→rep edges plus
    // rep-level pairs among distinct texts only.
    val n = 1000
    val copies = (0 until n).map(i =>
      (1000L + i, "the quick brown fox jumps over the lazy dog again and again"))
    // background ids ABOVE the planted block so the planted component's
    // minimum (= its cluster root) is 1000 even if a background doc is a
    // chance near-dup of the copy text
    val background = (0 until 200).map(i =>
      (100000L + i, s"unique background document number $i carrying words " +
        s"alpha${i * 7} beta${i * 13} gamma${i * 29} delta${i * 31}"))
    val docs = (copies ++ background).toDF("doc_id", "text")
    val graph = Dedup.simhashDupGraphOf(docs)
    val rows = graph.count()
    assert(rows < 5L * (n + 200),
      s"dup-graph rows $rows not linear in corpus size — exact-first collapse broken")
    val clusters = Dedup.duplicateClusters(graph)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until n).foreach { i =>
      assert(clusters(1000L + i) == 1000L,
        s"copy ${1000 + i} not in the planted cluster rooted at 1000")
    }
  }

  test("single-task endgame ≡ loop fixpoint on chains, cliques and multi-parent states") {
    // The default path resolves any remnant under LocalFinishMaxEdgesDefault
    // in one union-find task; its output must be IDENTICAL (same member →
    // component-min rows, zero loop rounds) to the pure-loop fixpoint on
    // every adversarial topology this suite pins.
    val graphs = Seq(
      chainEdges(4, 257),                                   // long paths
      Seq((5L, 1L), (5L, 2L)).toDF("doc_a", "doc_b"),       // multi-parent
      (0 until 30).flatMap { c =>
        val ids = (0 until 5).map(i => 900L + c * 5 + i)
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toDF("doc_a", "doc_b"))                             // cliques
    graphs.foreach { g =>
      val (viaLoop, _) = Dedup.duplicateClustersWithRounds(g, localFinishMaxEdges = 0L)
      val (viaFinish, rounds) = Dedup.duplicateClustersWithRounds(g)
      assert(rounds == 0, s"endgame should bypass all loop rounds, ran $rounds")
      val a = viaLoop.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = viaFinish.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b, s"endgame fixpoint diverges from loop: ${a.diff(b)} vs ${b.diff(a)}")
    }
  }

  test("mixed topology: cliques + chains + singleton pairs in one graph") {
    val cliques = (0 until 50).flatMap { c =>
      val ids = (0 until 6).map(i => 100000L + c * 6 + i)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }
    val chains = (0 until 20).flatMap { c =>
      val base = 200000L + c * 64
      (0 until 63).map(i => (base + i, base + i + 1))
    }
    val pairs = (0 until 100).map(i => (300000L + 2 * i, 300001L + 2 * i))
    val edges = (cliques ++ chains ++ pairs).toDF("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every component's members agree on the component minimum
    assert(clusters(100003L) == 100000L)
    assert(clusters(200063L) == 200000L) // full chain drains to its head
    assert(clusters(300001L) == 300000L)
    assert(clusters.size == 50 * 6 + 20 * 64 + 200)
  }
}

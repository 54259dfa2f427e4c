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
    val (df, rounds) = Dedup.duplicateClustersWithRounds(chainEdges(nChains, len))
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == nChains * len, "every chained node gets a cluster row")
    out.foreach { case (node, cluster) =>
      assert(cluster == (node / len) * len,
        s"node $node: cluster $cluster != chain min ${(node / len) * len}")
    }
    assert(rounds <= 12, s"1024-node chain needed $rounds rounds (log2 = 10)")
  }

  test("near-logarithmic growth: quadrupling the chain adds a few rounds, not 4x") {
    val (_, r64) = Dedup.duplicateClustersWithRounds(chainEdges(1, 64))
    val (_, r256) = Dedup.duplicateClustersWithRounds(chainEdges(1, 256))
    assert(r256 <= r64 + 4,
      s"4x chain cost ${r256 - r64} extra rounds over $r64 — not logarithmic")
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

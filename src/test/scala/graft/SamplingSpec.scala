package graft

import graft.analytics.Sampling
import org.scalatest.funsuite.AnyFunSuite

/** Dataset-assembly ops: stable hash-based splitting, length bins,
  * contamination gating. Value-exactness is the driver oracle's job
  * (q64-q66); these assert the semantic invariants. */
class SamplingSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.01"

  test("split is deterministic and close to the declared 80/10/10 fractions") {
    import spark.implicits._
    def splits() = Sampling.datasetSplit(spark, d)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val a = splits()
    assert(a == splits()) // rerun-stable: no RNG state anywhere
    val total = a.values.sum.toDouble
    assert(a.keySet == Set("train", "val", "test"))
    assert(a("train") / total > 0.7 && a("train") / total < 0.9)
    assert(a("val") / total > 0.04 && a("val") / total < 0.16)
    assert(a("test") / total > 0.04 && a("test") / total < 0.16)
  }

  test("length bins partition the corpus exactly") {
    import spark.implicits._
    val bins = Sampling.lengthBins(spark, d)
      .as[(Int, Long, Long, Int, Int)].collect()
    assert(bins.map(_._1).forall(b => b >= 1 && b <= 6))
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(bins.map(_._2).sum == nDocs) // every doc in exactly one bin
    bins.foreach { case (bin, _, _, minT, maxT) =>
      if (bin < 6) assert(maxT <= bin * 16 && minT > (bin - 1) * 16)
    }
  }

  test("sequence packing: contiguous pack ids, token totals conserved") {
    import spark.implicits._
    val packs = Sampling.sequencePacking(spark, d)
      .as[(String, Int, Long, Long)].collect()
    val byLang = packs.groupBy(_._1)
    byLang.foreach { case (lang, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids.head == 0 && ids.toSeq == (0 until ids.length), s"$lang ids: ${ids.toSeq}")
    }
    val totalPacked = packs.map(_._4).sum
    val totalTokens = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("size(split(trim(text), '\\\\s+'))").as[Int].collect().map(_.toLong).sum
    assert(totalPacked == totalTokens) // every token lands in exactly one pack
  }

  test("stratified sample hits roughly the declared rate in every language") {
    import spark.implicits._
    Sampling.stratifiedSample(spark, d)
      .as[(String, Long, Long)].collect().foreach { case (lang, n, sampled) =>
        val rate = sampled.toDouble / n
        assert(rate > 0.02 && rate < 0.25, s"$lang: $sampled/$n") // 10% ± slop at 100-doc strata
      }
  }

  test("contamination excludes self-pairs and is rerun-stable") {
    import spark.implicits._
    def run() = Sampling.contamination(spark, d)
      .as[(String, Long, Long)].collect().toSet
    val r = run()
    assert(r == run())
    assert(r.nonEmpty) // the fixture's shared-vocab docs do collide at 0.8
    // a doc can match at most the full bench set
    val benchSize = spark.read.parquet(s"$d/documents.parquet")
      .filter("doc_id % 97 = 0").count()
    r.foreach { case (_, _, nBench) => assert(nBench <= benchSize) }
  }
}

package graft

import graft.analytics.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * 100× (sf10-scale) soak of the exact-dedup family — the in-suite half of
 * the two-orders-of-magnitude point that pins the linearity claim where
 * the bench target actually lives. The full contraction (q74 dup graph +
 * star loop) at sf10 runs minutes of wall and lives in the
 * `graft.tools.Soak100` main instead; its measured multiplier and round
 * counts are recorded in COVERAGE.md's soak table. Here we keep what the
 * default suite can afford on every run:
 *
 *  - exact-dedup (q30 family) at 100×: it shuffles only (md5(text),
 *    doc_id) — never the corpus body — so wall must grow ≲ linearly and
 *    the group count must scale EXACTLY 100× on the shard-renamed
 *    fixture (any deviation means cross-shard hash collisions or a
 *    nondeterministic grouping key);
 *  - the sf10 fixture build itself (100 token-namespaced shards of
 *    sf0.1's documents, ids offset by shard — the DedupSoakSf1Spec shape
 *    at 100×, ~500k docs / ~150 MB text, cached under target/ and shared
 *    with Soak100).
 */
class ContractionSoakSf10Spec extends AnyFunSuite with SparkSuite {

  private val sf01 = "/root/testdata/sf0.1"
  private val soakDir = "target/soak_sf10"

  private def ensureSf10(): Unit = {
    val marker = new java.io.File(s"$soakDir/documents.parquet/_SUCCESS")
    if (!marker.exists()) {
      val base = spark.read.parquet(s"$sf01/documents.parquet")
      // 100 branches of one 5k-row frame; each branch a narrow map — one
      // job, no shuffle until the final repartition write
      val shards = (0 until 100).map { k =>
        base.select(
          (col("doc_id") + lit(k * 5000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"t${k}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      shards.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$soakDir/documents.parquet")
    }
  }

  private def minOf2(f: => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  test("exact dedup at 100x: linear-ish wall, exact 100x group scaling") {
    ensureSf10()
    val (te01, ne01) = minOf2(Dedup.exactGroups(spark, sf01).count())
    val (te10, ne10) = minOf2(Dedup.exactGroups(spark, soakDir).count())
    info(f"exact_groups: sf0.1 $te01%.1fs ($ne01 rows) -> sf10 $te10%.1fs ($ne10 rows), ratio ${te10 / te01}%.1fx (100x data)")
    assert(ne10 == ne01 * 100,
      s"shard-renamed corpus must scale groups exactly 100x: $ne01 -> $ne10")
    assert(te10 <= te01 * 300 + 60,
      f"exact dedup super-linear at 100x: $te01%.1fs -> $te10%.1fs")
  }

  test("paragraph dedup at 100x: the narrow occurrence shuffle stays linear-ish") {
    ensureSf10()
    import graft.analytics.TextStats
    val (tp01, np01) = minOf2(TextStats.paragraphDedup(spark, sf01).count())
    val (tp10, np10) = minOf2(TextStats.paragraphDedup(spark, soakDir).count())
    info(f"q129_paragraph_dedup: sf0.1 $tp01%.1fs ($np01 rows) -> sf10 $tp10%.1fs ($np10 rows), ratio ${tp10 / tp01}%.1fx (100x data)")
    assert(np10 == np01 * 100, "one row per doc: exact 100x row scaling")
    assert(tp10 <= tp01 * 300 + 60,
      f"paragraph dedup super-linear at 100x: $tp01%.1fs -> $tp10%.1fs")

    // q132 CDC: the word explode + lag/cumsum windows are the linear
    // part; the duplicate-mass output scales with within-shard structure
    val (tc01, nc01) = minOf2(TextStats.cdcChunkDedup(spark, sf01).count())
    val (tc10, nc10) = minOf2(TextStats.cdcChunkDedup(spark, soakDir).count())
    info(f"q132_cdc_chunks: sf0.1 $tc01%.1fs ($nc01 rows) -> sf10 $tc10%.1fs ($nc10 rows), ratio ${tc10 / tc01}%.1fx (100x data)")
    assert(nc10 >= nc01, "100x corpus cannot hold less duplicate chunk mass")
    assert(tc10 <= tc01 * 300 + 60,
      f"CDC chunking super-linear at 100x: $tc01%.1fs -> $tc10%.1fs")
  }

  test("round-8 profile family at 100x: source caps and encoding quality stay linear-ish") {
    ensureSf10()
    // q103: at 500k docs every source is far over the cap, so this is the
    // two-phase plan's WORST case (the whole corpus enters the rank
    // window) — exactly the shape that must stay linear; the md5 sort key
    // spreads each source's partition evenly so no task hot-spots.
    val (tc01, nc01) = minOf2(
      graft.analytics.Sampling.sourceCapStats(spark, sf01).count())
    val (tc10, nc10) = minOf2(
      graft.analytics.Sampling.sourceCapStats(spark, soakDir).count())
    info(f"q103_source_caps: sf0.1 $tc01%.1fs ($nc01 rows) -> sf10 $tc10%.1fs ($nc10 rows), ratio ${tc10 / tc01}%.1fx (100x data)")
    assert(nc10 == nc01, "shards share sources, so the per-source row count is fixed")
    assert(tc10 <= tc01 * 300 + 60,
      f"source caps super-linear at 100x: $tc01%.1fs -> $tc10%.1fs")

    // q104: one narrow regex pass — the purest corpus-linear op this
    // round; 100x char mass must cost ~100x, never more
    val (tq01, _) = minOf2(
      graft.analytics.TextStats.encodingQuality(spark, sf01).count())
    val (tq10, _) = minOf2(
      graft.analytics.TextStats.encodingQuality(spark, soakDir).count())
    info(f"q104_encoding_quality: sf0.1 $tq01%.1fs -> sf10 $tq10%.1fs, ratio ${tq10 / tq01}%.1fx (100x data)")
    assert(tq10 <= tq01 * 300 + 60,
      f"encoding quality super-linear at 100x: $tq01%.1fs -> $tq10%.1fs")
  }
}

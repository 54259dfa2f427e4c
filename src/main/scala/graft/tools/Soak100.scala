package graft.tools

import graft.analytics.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev probe: the 100× (sf10) soak of the contraction family — the single
 * two-orders-of-magnitude point backing the linearity claim (COVERAGE.md
 * soak table). Builds the 100-shard token-namespaced copy of sf0.1's
 * `documents` (the DedupSoakSf1Spec fixture shape at 100×, ~500k docs)
 * under target/soak_sf10, then times sf0.1 vs sf10 for exact-dedup and
 * the full q74 contraction (dup graph + star loop), printing wall,
 * row/edge counts, round counts and the wall multiplier. The in-suite
 * ContractionSoakSf10Spec asserts the cheap invariants (exact 100× row
 * scaling, constant rounds) on every `sbt test`; this main is the
 * full-wall measurement, too heavy for the default suite.
 */
object Soak100 {
  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val soakDir = "target/soak_sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val marker = new java.io.File(s"$soakDir/documents.parquet/_SUCCESS")
    if (!marker.exists()) {
      val t0 = System.nanoTime()
      val base = spark.read.parquet(s"$sf01/documents.parquet")
      val shards = (0 until 100).map { k =>
        base.select(
          (col("doc_id") + lit(k * 5000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"t${k}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      shards.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$soakDir/documents.parquet")
      println(f"[fixture] built 100-shard sf10 in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    def timed[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] wall=$dt%.1fs")
      (r, dt)
    }

    val passes = sys.env.getOrElse("SPARK_GRAFT_SOAK_PASSES", "2").toInt
    (1 to passes).foreach { pass =>
      println(s"--- pass $pass")
      val (ne01, te01) = timed("exact_groups sf0.1")(Dedup.exactGroups(spark, sf01).count())
      val (ne10, te10) = timed("exact_groups sf10")(Dedup.exactGroups(spark, soakDir).count())
      println(f"[exact_groups] rows $ne01 -> $ne10 (x${ne10.toDouble / ne01}%.0f), wall x${te10 / te01}%.1f on 100x data")

      val ((n01, r01), t01) = timed("q74 sf0.1") {
        val (e, r) = Dedup.duplicateClusterEdges(Dedup.simhashDupGraph(spark, sf01))
        (e.count(), r)
      }
      val ((n10, r10), t10) = timed("q74 sf10") {
        val (e, r) = Dedup.duplicateClusterEdges(Dedup.simhashDupGraph(spark, soakDir))
        (e.count(), r)
      }
      println(f"[q74] edges $n01 -> $n10 (x${n10.toDouble / n01}%.0f), rounds $r01 -> $r10, wall x${t10 / t01}%.1f on 100x data")
    }
    spark.stop()
  }
}

package graft.tools

import graft.analytics.{Dedup, Relational, TextStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: round-9 additions at sf0.1 vs the sf10 (100x) fixture. */
object Q101Probe {
  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val sf10 = "target/soak_sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] $dt%.1fs -> $r rows"); dt
    }
    def pair(tag: String)(f: String => Long): Unit = {
      val a = timed(s"$tag sf0.1")(f(sf01))
      val b = timed(s"$tag sf10")(f(sf10))
      println(f"[$tag] x${b / a}%.1f on 100x data")
    }
    pair("q115 sketches")(d => Dedup.sourceSketchSimilarity(spark, d).count())
    pair("q117 snapshot diff")(d => Relational.snapshotDiff(spark, d).count())
    pair("q119 bm25")(d => TextStats.bm25TopDocs(spark, d).count())
    pair("q116 pmi")(d => TextStats.pmiCollocations(spark, d).count())
    spark.stop()
  }
}

package graft.tools

import graft.analytics.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q101/q114 wall at the sf10 soak fixture. */
object Q101Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/soak_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.1fs -> $r"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    timed("q114 sf10")(Dedup.hammingHistogram(spark, d).count())
    timed("q101 sf10")(Dedup.crossSourceLeakageOf(docs, 6).count())
    spark.stop()
  }
}

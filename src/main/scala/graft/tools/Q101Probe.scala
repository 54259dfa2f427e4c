package graft.tools

import graft.analytics.{Dedup, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q115 explode-barrier variants at sf0.1. */
object Q101Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.1fs -> $r"); r
    }
    def sigs = Tables.documentsSpread(spark, d)
      .filter(col("text").isNotNull)
      .withColumn("ws", split(trim(col("text")), "\\s+"))
      .withColumn("ngrams", Dedup.ngramsFromWords(col("ws")))
      .withColumn("nh", transform(col("ngrams"), g => Dedup.shingleHash(g)))
      .select(col("source"), Dedup.minhashSignature(col("nh"), 16).as("sig"))
    // A: current (explode directly)
    val a = sigs.select(col("source"), posexplode(col("sig")).as(Seq("p", "mn")))
      .groupBy(col("source"), col("p")).agg(min(col("mn")).as("mn"))
    timed("A explode direct")(a.count())
    // B: repartition barrier between sig and explode
    val b = sigs.repartition(32)
      .select(col("source"), posexplode(col("sig")).as(Seq("p", "mn")))
      .groupBy(col("source"), col("p")).agg(min(col("mn")).as("mn"))
    timed("B barrier")(b.count())
    // C: per-perm min aggregate, no row-level explode at all
    val cCols = sigs.select(Seq(col("source")) ++
      (0 until 16).map(p => get(col("sig"), lit(p)).as(s"s$p")): _*)
    val cAgg = cCols.groupBy(col("source")).agg(
      min(col("s0")).as("s0"),
      (1 until 16).map(p => min(col(s"s$p")).as(s"s$p")): _*)
    val c = cAgg.select(col("source"), posexplode(array(
        (0 until 16).map(p => col(s"s$p")): _*)).as(Seq("p", "mn")))
    timed("C per-perm agg")(c.count())
    timed("A again")(a.count())
    spark.stop()
  }
}

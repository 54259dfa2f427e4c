package graft.tools
import graft.analytics.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: q101 stage decomposition at sf10 (svalue collapse). */
object Q101Stage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] $dt%.1fs -> $r"); dt
    }
    val d = "target/soak_sf10"
    def docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    def meta = docs.select(col("doc_id"),
      unhex(md5(col("text").cast("binary"))).as("h128"),
      Dedup.simhash(col("text")).as("simhash"),
      col("source"))
    (1 to 3).foreach { p =>
      println(s"--- pass $p")
      timed("1 fingerprint pass")(meta.count())
      val hh = when(col("simhash").isNull, col("h128"))
      val groups = meta.filter(col("h128").isNotNull)
        .groupBy(col("simhash"), hh.as("hh"), col("source"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("smin"), max(col("doc_id")).as("smax"))
        .groupBy(col("simhash"), col("hh"))
        .agg(min(col("smin")).as("g"),
          collect_list(struct(col("source"), col("n"), col("smin"), col("smax"))).as("srcs"))
      timed("2 groups agg")(groups.count())
      val pairs = Dedup.bandPairsOnce(
        groups.select(col("g").as("doc_id"), col("simhash"), col("srcs")), 6, carry = Seq("srcs"))
      timed("3 banded pairs")(pairs.count())
      timed("4 full q101")(Dedup.crossSourceLeakageOf(docs, 6).count())
    }
    spark.stop()
  }
}

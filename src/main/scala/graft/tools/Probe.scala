package graft.tools

import graft.analytics._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only timing probe for the MinHash pipeline stages (not part of the
  * library surface; used to attribute bench time to stages). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
    }

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    time("docs_wordcount") {
      docs.select(avg(size(split(col("text"), "\\s+")))).collect()(0).getDouble(0).toLong
    }
    val sig = docs
      .withColumn("ws", split(trim(col("text")), "\\s+"))
      .withColumn("ngrams", Dedup.ngramsFromWords(col("ws")))
      .withColumn("nh", transform(col("ngrams"), g => Dedup.shingleHash(g)))
      .withColumn("sig", Dedup.minhashSignature(col("nh"), 16))
    time("signatures")(sig.select(sum(size(col("sig")))).collect()(0).getLong(0) / 16)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map(b => Dedup.bandKey(col("sig"), b, 4)): _*))
        .as(Seq("band_id", "band_hash")))
    time("banded")(banded.count())
    val a = banded.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b"))
    val cand = a.join(b, Seq("band_id", "band_hash")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    time("candidates")(cand.count())
    time("verify")(Dedup.verifyJaccard(cand, Tables.documents(spark, sfDir), 0.5).count())
    spark.stop()
  }
}

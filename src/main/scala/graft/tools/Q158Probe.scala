package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.analytics.Dedup

/** Attribution probe for the round-16 q158 soak ratio: times the CURRENT
  * df-capped spelling against a reconstruction of the round-15 spelling
  * (inline shingles, no min-words filter, no df cap) in one JVM on the
  * same fixture, alternating passes so JIT/page-cache warmth cannot favor
  * either. Usage: runMain graft.tools.Q158Probe [dir] [passes] */
object Q158Probe {
  private def words(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")

  /** The round-15 spelling, verbatim shape. */
  def oldPairs(docsDF: DataFrame, pct: Int): DataFrame = {
    val toks = org.apache.spark.sql.GraftBridge.checkpointNoStats(
      docsDF.select(col("doc_id"),
        explode(array_distinct(
          transform(Dedup.shingles(col("text")), g => Dedup.shingleHash(g)))).as("gh")),
      eager = false)
    val szs = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dfreq = toks.groupBy("gh").agg(count(lit(1)).as("df"))
    val prefix = toks.join(dfreq, "gh").join(szs, "doc_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gh"))))
      .filter(col("rk") <= expr(s"(sz * ${100 - pct}) DIV 100 + 1"))
      .select(col("doc_id").as("pd"), col("gh"))
    val cand = prefix
      .join(toks.select(col("doc_id").as("td"), col("gh")), "gh")
      .filter(col("pd") =!= col("td"))
      .select(least(col("pd"), col("td")).as("doc_a"),
        greatest(col("pd"), col("td")).as("doc_b"))
      .distinct()
    val inter = cand
      .join(toks.select(col("doc_id").as("doc_a"), col("gh")), Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("gh")), Seq("doc_b", "gh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(szs.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(szs.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .filter(col("n_common") * 100 >= least(col("sz_a"), col("sz_b")) * pct)
      .select(col("doc_a"), col("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/soak_sf10"
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.analytics.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      org.apache.spark.sql.GraftBridge.releaseTransientPins()
    }
    (1 to passes).foreach { p =>
      timed(s"pass$p old")(oldPairs(docs, 80).count())
      timed(s"pass$p new")(Dedup.containmentPairsFor(docs, 80).count())
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** r20 plan-evidence dump: formatted plans for the queries touched this
  * round PLUS the fold-builder frames whose structure lives inside a
  * checkpoint pin (invisible — a LogicalRDD — in the consumer plan).
  * Args: sfDir outDir suffix [queryNames...] (default: the r20 set). */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    def dump(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val txt = try df.queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"ERROR: ${e.getMessage}\n" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
    }
    val defaults = Seq("q132_cdc_chunk_dedup", "q125_entropy_profile",
      "q119_bm25_topdocs", "q112_skew_profile",
      "q46_approx_distinct", "q101_cross_source_leakage",
      "q158_containment_pairs", "q90_chunk_dedup")
    val qs = if (args.length > 3) args.drop(3).toSeq else defaults
    qs.foreach(n => dump(n, SparkEntry.queries(n)(spark, sfDir)))
    // pin-internal fold builder (consumer plans show it as a LogicalRDD):
    if (args.length <= 3)
      dump("q119_bm25_fold", graft.analytics.TextStats.bm25FoldPlan(
        graft.analytics.Tables.documents(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("text").isNotNull)))
    println(s"wrote $outDir (*_$suffix.txt)")
    spark.stop()
  }
}

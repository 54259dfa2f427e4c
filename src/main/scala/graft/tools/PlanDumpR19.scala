package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** r19 plan-evidence dump: formatted plans for the touched queries PLUS the
  * model-builder frames whose capping/scoring structure lives inside a
  * checkpoint pin (invisible in the consumer plan). Args: sfDir outDir suffix */
object PlanDumpR19 {
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
    val qs = Seq("q78_winnow_fingerprints", "q79_winnow_pairs",
      "q84_shared_gram_pairs", "q85_ngram_contamination",
      "q98_boilerplate_removal", "q99_perplexity_buckets",
      "q123_dsir_resample", "q126_cms_heavy_hitters",
      "q129_paragraph_dedup", "q138_bloom_decontamination",
      "q141_surgical_decontamination", "q156_moore_lewis",
      "q157_domain_reweight", "q158_containment_pairs",
      "q160_longest_shared_span", "q167_contaminated_split",
      "q168_winnow_recall")
    qs.foreach(n => dump(n, SparkEntry.queries(n)(spark, sfDir)))
    // pin-internal builders (the consumer plans show them as LogicalRDD):
    dump("q156_models_bundle",
      graft.analytics.TextStats.mooreLewisModels(spark, sfDir))
    dump("q157_models_bundle",
      graft.analytics.TextStats.domainModels(spark, sfDir))
    println(s"wrote $outDir (*_$suffix.txt)")
    spark.stop()
  }
}

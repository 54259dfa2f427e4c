package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: formatted plans of the round-6 queries — scan pruning
  * (ReadSchema), broadcast placement, codegen span check. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = sys.env.getOrElse("QUERIES", "q87_semdedup,q88_gopher_quality,q89_temperature_mixture,q90_chunk_dedup")
      .split(",").toSeq
    qs.foreach { q =>
      println(s"===== $q")
      graft.SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: CPU cost of money-sum spellings over events at sf0.1. */
object DecProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.analytics.Tables.events(spark, d)
    def timed(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), c.as("v"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }
      println(f"[$tag] min=${runs.min}%.2f spread=${runs.max-runs.min}%.2f")
    }
    timed("double_sum")(sum(col("value")))
    timed("dec18_6")(round(sum(col("value").cast("decimal(18,6)")), 2).cast("double"))
    timed("dec12_2")(round(sum(col("value").cast("decimal(12,2)")), 2).cast("double"))
    timed("dec8_2")(round(sum(col("value").cast("decimal(8,2)")), 2).cast("double"))
    timed("long_micros")(round(sum((col("value").cast("decimal(18,6)") * 1000000).cast("long"))/1e6, 2))
    spark.stop()
  }
}

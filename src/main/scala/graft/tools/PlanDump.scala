package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    args.foreach { q =>
      println(s"===== $q")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.treeString.take(9000))
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: does q84's self-join reuse the gram-build exchange? */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val inputRecords = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        inputRecords.addAndGet(s.stageInfo.taskMetrics.inputMetrics.recordsRead)
    })
    val df = graft.analytics.TextStats.sharedGramPairs(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println("AQE=" + sys.env.getOrElse("AQE", "true") +
      " REUSE_IN_PLAN=" + (p.contains("ReusedExchange") || p.contains("TableCacheQueryStage")) +
      " INPUT_RECORDS=" + inputRecords.get)
    spark.stop()
  }
}

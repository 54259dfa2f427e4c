package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: build every SparkEntry query's executed plan and report
  * structural scale-killers — CartesianProduct anywhere, and
  * BroadcastNestedLoopJoin sites (legitimate only for 1-row-aggregate
  * cross joins). The findings freeze into PlanGateSpec. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        if (cart || bnlj > 0)
          println(s"[planaudit] $name cartesian=$cart bnlj=$bnlj")
        org.apache.spark.sql.GraftBridge.releaseTransientPins()
      } catch {
        case e: Throwable =>
          println(s"[planaudit] $name PLAN BUILD FAILED: ${e.getMessage}")
      }
    }
    println("[planaudit] done")
    spark.stop()
  }
}

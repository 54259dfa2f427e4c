package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe: job-count + phase timing for the q74 contraction pipeline. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.get("SPARK_GRAFT_SF_DIR")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def timed[T](tag: String)(f: => T): T = {
      val j0 = jobs.get; val t0 = System.nanoTime()
      val r = f
      println(f"[$tag] wall=${(System.nanoTime()-t0)/1e9}%.2f jobs=${jobs.get-j0}")
      r
    }
    sfDir match {
      case Some(d) =>
        (1 to 2).foreach { pass =>
          println(s"--- pass $pass")
          val pairs = timed("dup_graph_count") {
            val p = graft.analytics.Dedup.simhashDupGraph(spark, d)
            p.write.format("noop").mode("overwrite").save(); p
          }
          val (edges, rounds) = timed("edge_loop") {
            graft.analytics.Dedup.duplicateClusterEdges(pairs)
          }
          println(s"rounds=$rounds")
          timed("members_write") {
            import org.apache.spark.sql.functions.col
            edges.select(col("src").as("doc_id"), col("dst").as("cluster_id"))
              .unionByName(edges.select(col("dst").as("doc_id"), col("dst").as("cluster_id")).distinct())
              .write.format("noop").mode("overwrite").save()
          }
        }
      case None =>
        val edges = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
        jobs.set(0)
        val t0 = System.nanoTime()
        val (df, rounds) = graft.analytics.Dedup.duplicateClustersWithRounds(edges)
        df.write.format("noop").mode("overwrite").save()
        println(f"JOBS=${jobs.get} ROUNDS=$rounds WALL=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}

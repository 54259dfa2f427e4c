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
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val jobs = new AtomicInteger(0)
    val trace = sys.env.contains("SPARK_GRAFT_JOB_TRACE")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(j.jobId, System.nanoTime())
        if (trace) println(s"  [job ${j.jobId}] stages=${j.stageInfos.size} " +
          j.stageInfos.map(si => s"${si.stageId}:${si.name.takeWhile(_ != '\n').take(60)}").mkString(" | "))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.get(j.jobId)
        if (trace && t0 != 0L)
          println(f"  [job ${j.jobId} END] wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        if (trace && sys.env.contains("SPARK_GRAFT_STAGE_TRACE"))
          println(f"    [stage ${si.stageId}] tasks=${si.numTasks} " +
            f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%.2f " +
            si.name.takeWhile(_ != '\n').take(50))
      }
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
          // the PRODUCT pipeline (what Verify/Bench actually run): the pair
          // graph is computed inside the loop's initial probe job(s), not
          // as a separate materialization — the phases above double-count
          // it through lineage recompute for diagnosis
          timed("q74_pipeline_composed") {
            graft.analytics.Dedup.simhashClusters(spark, d)
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

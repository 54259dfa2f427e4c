package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._

/** Dev probe: phase/job breakdown for q130 (image dHash clusters) and
  * q145 (mutual-kNN purity) — the two most expensive bench queries,
  * both dominated by the star-contraction loop on small graphs. */
object ClusterCost {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val trace = sys.env.contains("SPARK_GRAFT_JOB_TRACE")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(j.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.get(j.jobId)
        if (trace && t0 != 0L)
          println(f"  [job ${j.jobId} END] wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        if (trace)
          println(f"    [stage ${si.stageId}] tasks=${si.numTasks} " +
            f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%.2f " +
            si.name.takeWhile(_ != '\n').take(50))
      }
    })
    def timed[T](tag: String)(f: => T): T = {
      val j0 = jobs.get; val t0 = System.nanoTime()
      val r = f
      println(f"[$tag] wall=${(System.nanoTime() - t0) / 1e9}%.2f jobs=${jobs.get - j0}")
      r
    }
    // session warmup
    spark.range(0, 4000000, 1, 32).selectExpr("id % 97 as k", "id as v")
      .groupBy("k").agg(sum("v")).write.format("noop").mode("overwrite").save()
    timed("dhash_meta_shared") {
      graft.analytics.Multimodal.dhashMetaShared(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 3).foreach { pass =>
      println(s"--- q130 pass $pass")
      val meta = graft.analytics.Multimodal.dhashMetaShared(spark, d)
      val pairs = timed("  dhash_pair_graph") {
        val p = graft.analytics.Dedup.simhashDupGraphFromMeta(meta, 6)
        p.write.format("noop").mode("overwrite").save(); p
      }
      val (edges, rounds) = timed("  edge_loop") {
        graft.analytics.Dedup.duplicateClusterEdges(pairs)
      }
      timed("  members_out") {
        val members = edges.select(col("src").as("doc_id"), col("dst").as("cluster_id"))
        val roots = edges.select(col("dst").as("doc_id"), col("dst").as("cluster_id")).distinct()
        members.unionByName(roots).write.format("noop").mode("overwrite").save()
      }
      println(s"  rounds=$rounds")
    }
    (1 to 3).foreach { pass =>
      println(s"--- q145 pass $pass")
      val pairs = timed("  mutual_knn_pairs") {
        val p = graft.analytics.Similarity.knnGraph(spark, d, 5, 3)
          .filter(col("mutual") && col("vec_id") < col("nbr_id"))
          .select(col("vec_id").as("doc_a"), col("nbr_id").as("doc_b"))
        p.write.format("noop").mode("overwrite").save(); p
      }
      timed("  full_q145") {
        graft.analytics.Similarity.knnClusterPurity(spark, d, 5, 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

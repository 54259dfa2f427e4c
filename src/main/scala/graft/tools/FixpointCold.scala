package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: replicate graft.Bench's warmup sequence in a CLEAN JVM and
  * time the shared fixpoints exactly as the bench's trust-mode line does,
  * with a per-job trace — attributes the cold fixpoint wall (codegen vs
  * parquet machinery vs data) without running the whole battery. */
object FixpointCold {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.get(j.jobId)
        if (t0 != 0L)
          println(f"  [job ${j.jobId}] wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    })
    def timed[T](tag: String)(f: => T): T = {
      val j0 = jobs.get; val t0 = System.nanoTime()
      val r = f
      println(f"[$tag] wall=${(System.nanoTime() - t0) / 1e9}%.2f jobs=${jobs.get - j0}")
      r
    }
    timed("warm_neutral") {
      spark.range(0, 4000000, 1, 32).selectExpr("id % 97 as k", "id as v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("warm_contraction_codegen") {
      val partsB = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions",
        math.min(partsB.toInt, 8).toString)
      try {
        val warmDocs = spark.range(0, 200).selectExpr("id as doc_id",
          "concat('w', id % 7, ' w', id % 11, ' w', id % 13, ' t', id % 29) as text")
        graft.analytics.Dedup.duplicateClusterEdges(
          graft.analytics.Dedup.simhashDupGraphOf(warmDocs))._1
          .write.format("noop").mode("overwrite").save()
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", partsB)
      }
    }
    org.apache.spark.sql.GraftBridge.releaseTransientPins()
    timed("fixpoint_shared_cluster_edges") {
      graft.analytics.Dedup.sharedClusterEdges(spark, sfDir)._1
        .write.format("noop").mode("overwrite").save()
    }
    timed("fixpoint_dhash_meta") {
      graft.analytics.Multimodal.dhashMetaShared(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

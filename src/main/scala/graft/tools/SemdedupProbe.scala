package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: q87 SemDeDup end-to-end cost under different reuse
  * structures for the cells frame (lazy/eager checkpoint, cache, none),
  * at an arbitrary SPARK_GRAFT_SF_DIR (default the sf1 soak fixture). */
object SemdedupProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/soak_sf1")
    val k = sys.env.getOrElse("SEMDEDUP_K", "80").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.{Similarity, Tables}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def timed[T](tag: String)(f: => T): T = {
      val j0 = jobs.get; val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2fs jobs=${jobs.get - j0}"); r
    }
    val emb = Tables.embeddings(spark, d)

    def sweep(cells: DataFrame): Long = {
      val a = cells.select(col("cell"), col("vec_id").as("vec_a"), col("embedding").as("e_a"))
      val b = cells.select(col("cell"), col("vec_id").as("vec_b"), col("embedding").as("e_b"))
      val pairs = a.join(b, Seq("cell")).filter(col("vec_a") < col("vec_b"))
        .withColumn("cos", round(Similarity.cosineNative(col("e_a"), col("e_b")), 12))
        .filter(col("cos") >= 0.35)
        .select(col("cell"), col("vec_a"), col("vec_b"))
      val dropped = pairs.select(col("cell"), col("vec_b")).distinct()
      cells.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
        .join(pairs.groupBy(col("cell")).agg(count(lit(1)).as("n_dup_pairs")), Seq("cell"), "left")
        .join(dropped.groupBy(col("cell")).agg(count(lit(1)).as("n_dropped")), Seq("cell"), "left")
        .count()
    }
    def assigned(): DataFrame = Similarity.kmeansCells(emb, k, 2)
      .select(col("cell"), col("vec_id"), col("embedding"))

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val cells = timed("materialize")(
        org.apache.spark.sql.GraftBridge.checkpointNoStats(assigned(), eager = true))
      timed("members_only")(cells.groupBy(col("cell")).agg(count(lit(1))).count())
      val a = cells.select(col("cell"), col("vec_id").as("vec_a"), col("embedding").as("e_a"))
      val b = cells.select(col("cell"), col("vec_id").as("vec_b"), col("embedding").as("e_b"))
      val pairs = a.join(b, Seq("cell")).filter(col("vec_a") < col("vec_b"))
        .withColumn("cos", round(Similarity.cosineNative(col("e_a"), col("e_b")), 12))
        .filter(col("cos") >= 0.35)
        .select(col("cell"), col("vec_a"), col("vec_b"))
      timed("pairs_only")(pairs.count())
      timed("pairs_agg_only")(pairs.groupBy(col("cell")).agg(count(lit(1))).count())
      timed("dropped_only")(pairs.select(col("cell"), col("vec_b")).distinct().count())
      timed("full_sweep")(sweep(cells))
    }
    spark.stop()
  }
}

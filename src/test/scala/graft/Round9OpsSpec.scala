package graft

import graft.analytics.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator gates. */
class Round9OpsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).sorted.toSeq

  test("q99 vocab cap: capped ≡ uncapped when the vocabulary fits the cap") {
    val docs = graft.analytics.Tables.documents(spark, d)
    assert(rows(TextStats.perplexityBucketsOf(docs)) ==
      rows(TextStats.perplexityBucketsOf(docs, vocabCap = Int.MaxValue)))
  }

  test("q99 vocab cap: out-of-vocabulary grams fall to the smoothing floor") {
    // cap=1 on "a a a b a": uni keeps a(cu=4), V=1; bi keeps "a a"(cb=2).
    // terms: aa -log10(3/5)=0.221849 (x2), ab (cb->0) -log10(1/5)=0.698970,
    // ba (w1 b uncapped -> cu->0) -log10(1/1)=0. score = 1.142668/4
    val docs = Seq((1L, "en", "a a a b a")).toDF("doc_id", "lang", "text")
    val out = TextStats.perplexityBucketsOf(docs, vocabCap = 1)
      .as[(String, String, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out == Seq(("en", "head", 1L, 5L, Some(0.285667), Some(0.285667))))
  }

  test("PQ family degrades to empty results on a degenerate corpus (no crash)") {
    import graft.analytics.Similarity
    val empty = Seq.empty[(Long, Array[Float], String)]
      .toDF("vec_id", "embedding", "label")
    val allNull = Seq((1L, null: Array[Float], "a"), (2L, null: Array[Float], "b"))
      .toDF("vec_id", "embedding", "label")
    for (emb <- Seq(empty, allNull)) {
      assert(Similarity.pqStatsOf(emb, 2, 2, 1).count() == 0)
      assert(Similarity.pqAdcTopKOf(emb, 2, 2, 1, 3, 1L).count() == 0)
      assert(Similarity.pqRecallStatsOf(emb, 2, 2, 1, 3, 1L).count() == 0)
    }
  }

  test("q112 skew profile reads each table once (struct-explode, not per-column scans)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import java.util.concurrent.atomic.AtomicLong
    val read = new AtomicLong(0)
    val l = new SparkListener {
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        read.addAndGet(st.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
    val tables = Seq("lineitem", "orders", "events", "documents")
    val totalRows = tables.map(t =>
      spark.read.parquet(s"$d/$t.parquet").count()).sum
    spark.sparkContext.addSparkListener(l)
    try {
      graft.analytics.Relational.skewProfile(spark, d)
        .write.format("noop").mode("overwrite").save()
      // listener events drain asynchronously; a short settle is enough at
      // fixture scale
      Thread.sleep(2000)
      // old spelling read lineitem 3x + documents 2x (~2.2x total);
      // the one-scan form reads each table exactly once
      assert(read.get() <= (totalRows * 1.2).toLong,
        s"expected ~one scan per table (${totalRows} rows), read ${read.get()}")
      assert(read.get() >= totalRows,
        "every profiled table must still be fully scanned")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("q112 skew ratio survives cardinalities that overflow 64-bit products") {
    // max_freq * n_distinct > Long.MaxValue must not wrap: 2^33 copies of
    // one key would need petabyte fixtures, so pin the formula instead on
    // a frame aggregated the same way with hand-set stats via the public
    // surface: a corpus of k distinct keys each appearing once except one
    // hot key — ratio = max_freq * k / n. The double formula is exact
    // here AND monotone at wrap-scale (the old long product flipped sign).
    import spark.implicits._
    val n = 1000
    val docs = (0 until n).map(i =>
      (i.toLong, "t", "en", if (i < 500) "hot" else s"s$i", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("graft_skew").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, 1L, 1L)).toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, new java.sql.Timestamp(0L), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.analytics.Relational.skewProfile(spark, dir)
      .filter(col("table_name") === "documents" && col("column_name") === "source")
      .select("max_freq", "n_distinct", "skew_ratio")
      .as[(Long, Long, Double)].collect().head
    assert(r._1 == 500L && r._2 == 501L)
    assert(math.abs(r._3 - 500.0 * 501 / n) < 1e-6)
  }

  test("q99 vocab cap: model broadcast stays bounded and the plan keeps the broadcast joins") {
    val plan = TextStats.perplexityBucketsOf(
        graft.analytics.Tables.documents(spark, d), vocabCap = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "capped LM tables must still reach the scoring scan via broadcast")
  }
}

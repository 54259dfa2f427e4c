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
      // listener events drain asynchronously; poll until the counter has
      // fully caught up AND stayed stable, instead of a fixed sleep that
      // a loaded listener bus can outlast (round-10 ADVICE)
      var last = -1L; var stable = 0; var waited = 0
      while (stable < 3 && waited < 300) {
        Thread.sleep(100); waited += 1
        val cur = read.get()
        if (cur == last && cur >= totalRows) stable += 1
        else { stable = 0; last = cur }
      }
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

  test("q115 source sketches: identical sources estimate 1.0, disjoint 0.0") {
    import graft.analytics.Dedup
    val textA = (0 until 40).map(i => s"a$i").mkString(" ")
    val textB = (0 until 40).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      ("s1", textA), ("s2", textA),           // same shingle set
      ("s3", textB),                          // disjoint from s1/s2
      ("s4", null: String)                    // null text: no shingles
    ).toDF("source", "text")
    val out = Dedup.sourceSketchSimilarityOf(docs, 16)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSet
    assert(out.contains(("s1", "s2", 1.0)), s"identical sources must match all positions: $out")
    assert(out.contains(("s1", "s3", 0.0)) && out.contains(("s2", "s3", 0.0)))
    assert(!out.exists(t => t._1 == "s4" || t._2 == "s4"),
      "a source with no shingles carries no sketch")
  }

  test("q115 source sketches are arrival-order and partition independent (mergeable min)") {
    import graft.analytics.Dedup
    val mk = (p: String, n: Int) => (0 until n).map(i => s"${p}w${i % 7} x$i").mkString(" ")
    val docs = Seq(("u", mk("m", 30)), ("u", mk("n", 25)), ("v", mk("m", 30)),
      ("v", mk("q", 12)), ("w", mk("n", 25)))
      .toDF("source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Dedup.sourceSketchSimilarityOf(df, 16)
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val base = rows(docs)
    assert(base == rows(docs.repartition(7)), "partitioning must not move the sketch")
    assert(base == rows(docs.orderBy(col("text").desc)), "doc order must not move the sketch")
    assert(base.nonEmpty)
  }

  test("q116 PMI: hand-checked collocation scores and ranks") {
    import graft.analytics.TextStats
    // en corpus: "a b" x3, "a c" x3 as separate docs. uni: a:6 b:3 c:3,
    // NU=12; bigrams: (a,b):3 (a,c):3, NB=6.
    // pmi(a,b) = log10(3*12*12/(6*6*3)) = log10(4) = 0.60206
    val docs = (Seq.fill(3)("a b") ++ Seq.fill(3)("a c")).zipWithIndex
      .map { case (t, i) => (i.toLong, "en", t) }.toDF("doc_id", "lang", "text")
    val out = TextStats.pmiCollocationsOf(docs, topK = 10, minCount = 3)
      .orderBy("rank")
      .as[(String, String, String, Long, Double, Int)].collect().toSeq
    assert(out == Seq(
      ("en", "a", "b", 3L, 0.60206, 1),
      ("en", "a", "c", 3L, 0.60206, 2)))
  }

  test("q117 snapshot diff: hand-checked classification on planted ids") {
    import graft.analytics.Relational
    // ids: 3 (added: absent old), 7 (removed: absent new), 5 (changed:
    // revised old hash), 1 (unchanged), plus a null-text doc 28 (changed:
    // 28%23=5 revises the old hash while the new side hashes NULL; 28%17=11
    // and 28%19=9 keep it present in both snapshots)
    val docs = Seq(
      (1L, "stable", "en", "s", 6L),
      (3L, "added later", "en", "s", 11L),
      (5L, "revised", "en", "s", 7L),
      (7L, "deleted", "en", "s", 7L),
      (28L, null: String, "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("graft_snap").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Relational.snapshotDiff(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // old snapshot: {1, 5(rev), 7, 46(rev)}; new: {1, 3, 5, 46}
    assert(r == (("s", 4L, 4L, 1L, 1L, 2L, 1L)),
      s"expected (s,4,4,1,1,2,1) got $r")
  }

  test("q118 cluster histogram: exact-dup groups and singletons land in the right bins") {
    import graft.analytics.Dedup
    val t1 = (0 until 30).map(i => s"c$i").mkString(" ")
    val t2 = (0 until 30).map(i => s"d$i").mkString(" ")
    val docs = (Seq.fill(4)(t1) ++ Seq.fill(2)(t2) ++ Seq("alpha beta gamma", "delta epsilon zeta"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("graft_csh").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.clusterSizeHistogram(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    // one 4-cluster, one 2-cluster; the two lone docs are singletons —
    // unless their texts band together, which distinct vocab prevents
    assert(out == Set((4L, 1L, 4L), (2L, 1L, 2L), (1L, 2L, 2L)), s"got $out")
  }

  test("q119 BM25: hand-checked scores with uniform doc length") {
    import graft.analytics.TextStats
    // all docs len 3 == avgdl so len/avgdl = 1.0 exactly; idf(x) =
    // log10((3-2+0.5)/(2+0.5)+1) = log10(1.6); denom = tf + k1
    val docs = Seq((1L, "x x y"), (2L, "x z w"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val queries = Seq(("x", 2L), ("z", 2L)).toDF("tok", "df")
    val out = TextStats.bm25TopDocsOf(docs, queries, topDocs = 10)
      .orderBy("term", "rank")
      .as[(String, Long, Long, Double, Int)].collect().toSeq
    assert(out == Seq(
      ("x", 1L, 2L, 0.280665, 1), ("x", 2L, 1L, 0.20412, 2),
      ("z", 3L, 3L, 0.32076, 1), ("z", 2L, 1L, 0.20412, 2)))
  }

  test("q120 hard negatives: same-label and null-label rows never qualify") {
    import graft.analytics.Similarity
    val emb = Seq(
      (0L, Array(1f, 0f), "a"),          // the query (0 % 100 == 0)
      (1L, Array(1f, 0f), "a"),          // same label: excluded
      (2L, Array(0.9f, 0.1f), "b"),      // hard negative, rank 1
      (3L, Array(0f, 1f), "b"),          // orthogonal, rank 2
      (4L, Array(1f, 0f), null: String), // unlabeled: excluded
      (100L, Array(1f, 1f), null: String) // unlabeled query: excluded
    ).toDF("vec_id", "embedding", "label")
    val dir = tempDir("graft_hneg").toString
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.hardNegatives(spark, dir, k = 5, stride = 100)
      .orderBy("query_id", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._4)) == Seq((0L, 2L, 1), (0L, 3L, 2)),
      s"got $out")
  }

  test("round-9 plans: broadcast/semi-join shapes, no cartesian products") {
    import graft.analytics.{Relational, Similarity, TextStats}
    val p119 = TextStats.bm25TopDocs(spark, d).queryExecution.executedPlan.toString
    assert(!p119.contains("CartesianProduct"), "q119 must not go cartesian")
    assert(p119.contains("BroadcastExchange"),
      "q119's query terms and corpus scalars must broadcast")
    val p117 = Relational.snapshotDiff(spark, d).queryExecution.executedPlan.toString
    assert(!p117.contains("CartesianProduct"))
    assert(p117.contains("md5"), "q117 must join on content hashes, not text")
    val p120 = Similarity.hardNegatives(spark, d).queryExecution.executedPlan.toString
    assert(p120.contains("BroadcastExchange"), "q120's query set must broadcast")
    val p115 = graft.analytics.Dedup.sourceSketchSimilarity(spark, d)
      .queryExecution.executedPlan.toString
    assert(!p115.contains("CartesianProduct"))
  }

  test("q99 vocab cap: model broadcast stays bounded and the plan keeps the broadcast joins") {
    val plan = TextStats.perplexityBucketsOf(
        graft.analytics.Tables.documents(spark, d), vocabCap = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "capped LM tables must still reach the scoring scan via broadcast")
  }
}

package graft

import java.io.File

import graft.analytics.{Sampling, Similarity}
import graft.ingest.BucketedMerge
import graft.streaming.StreamingCorpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The LLM operators run INCREMENTALLY: documents arriving as a file stream
 * pass through chunking (q80) and exact-dedup survivorship (q31) per
 * micro-batch, and the streamed tables must equal the batch queries run
 * over the same corpus in one shot — including under out-of-order
 * delivery and replay.
 */
class StreamingCorpusSpec extends AnyFunSuite with SparkSuite {

  private def doc(id: Long, words: Int, tag: String): (Long, String, String, String, Long) = {
    val text = (0 until words).map(w => s"w${(id * 31 + w * 7) % 11}_$tag").mkString(" ")
    (id, text, if (id % 3 == 0) "en" else "other", s"src${id % 2}", text.length.toLong)
  }

  private def docsDF(rows: Seq[(Long, String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Land `df` as ONE parquet file directly in `landing` (the stream
    * source lists plain files, not nested write directories). */
  private def land(df: DataFrame, landing: File, name: String): Unit = {
    val stage = new File(landing.getParentFile, s"stage_$name")
    df.coalesce(1).write.parquet(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
  }

  test("streamed chunks and survivors equal the batch operators, under replay and late dups") {
    val root = TempDirs.tempDir("graft_scorpus").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val chunksPath = s"$root/wh/chunks"
    val survivorsPath = s"$root/wh/survivors"

    // wave 1: docs 10-19, plus doc 20 duplicating doc 12's text exactly
    val base = (10L to 19L).map(i => doc(i, 40 + (i % 5).toInt * 17, s"t${i % 4}"))
    val w1 = base :+ base(2).copy(_1 = 20L)
    // wave 2 arrives LATER but carries LOWER ids, incl. doc 6 duplicating
    // doc 12's text — the late-arriving lower id must take the survivorship
    val w2 = (1L to 5L).map(i => doc(i, 30 + (i % 3).toInt * 23, s"t${i % 4}")) :+
      base(2).copy(_1 = 6L)

    val schema = docsDF(w1).schema
    land(docsDF(w1), landing, "wave1")

    def drain(): Unit = {
      val q = StreamingCorpus.start(spark, landing.getAbsolutePath, schema,
        chunksPath, survivorsPath, s"$root/chk", chunkTokens = 16, overlap = 4,
        nBuckets = 8)
      q.awaitTermination()
    }
    drain()

    // wave 2 lands in a separate micro-batch
    land(docsDF(w2), landing, "wave2")
    drain()

    val corpus = docsDF(w1 ++ w2)

    // chunks converge to the batch operator over the whole corpus
    val streamedChunks = BucketedMerge.read(spark, chunksPath).drop("_dump_seq")
    val batchChunks = Sampling.chunkDocumentsOf(corpus, chunkTokens = 16, overlap = 4)
    assert(streamedChunks.count() == batchChunks.count())
    assert(streamedChunks.exceptAll(batchChunks).isEmpty &&
      batchChunks.exceptAll(streamedChunks).isEmpty,
      "streamed chunks diverge from the batch chunking")

    // survivors converge to q31 semantics (lowest doc_id per exact text)
    val streamedSurv = BucketedMerge.read(spark, survivorsPath)
      .select("doc_id", "lang", "source", "n_chars")
    val batchSurv = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
      corpus.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "n_chars")
    }
    assert(streamedSurv.exceptAll(batchSurv).isEmpty &&
      batchSurv.exceptAll(streamedSurv).isEmpty,
      "streamed survivors diverge from batch exact-dedup survivorship")
    // the late lower-id duplicate displaced the earlier survivor: the text
    // shared by docs {12, 20, 6} must survive as doc 6 alone
    val dupText = base(2)._2
    val survivorOfDup = streamedSurv
      .join(corpus.filter(col("text") === dupText).select("doc_id"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(survivorOfDup == Seq(6L),
      s"expected late-arriving doc 6 to take survivorship, got $survivorOfDup")

    // replay wave 1 under a new file name: tables must not change
    val chunksBefore = streamedChunks.collect().map(_.toString).sorted.toSeq
    land(docsDF(w1), landing, "wave1_replay")
    drain()
    val chunksAfter = BucketedMerge.read(spark, chunksPath).drop("_dump_seq")
      .collect().map(_.toString).sorted.toSeq
    assert(chunksAfter == chunksBefore, "replay changed the chunks table")
    assert(BucketedMerge.read(spark, survivorsPath)
      .select("doc_id", "lang", "source", "n_chars")
      .exceptAll(batchSurv).isEmpty, "replay changed the survivors table")
  }

  test("q86 accounting is continuously maintained and equals the batch composite") {
    val root = TempDirs.tempDir("graft_sacct").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val chunksPath = s"$root/wh/chunks"
    val survivorsPath = s"$root/wh/surv"
    val fpsPath = s"$root/wh/fps"
    val acctPath = s"$root/wh/acct"

    // shuffled arrival: high ids first; wave 2 brings LOWER ids, an exact
    // duplicate of a wave-1 text (survivorship must move to id 8), and a
    // 2-token doc the quality gate must drop on both paths
    val w1 = (50L to 69L).map(i => doc(i, 20 + (i % 7).toInt * 13, s"t${i % 5}"))
    val w2 = (1L to 7L).map(i => doc(i, 15 + (i % 4).toInt * 9, s"t${i % 5}")) ++
      Seq(w1(5).copy(_1 = 8L), (9L, "tiny doc", "en", "src0", 8L))

    val schema = docsDF(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.start(spark, landing.getAbsolutePath, schema,
        chunksPath, survivorsPath, s"$root/chk", nBuckets = 8,
        fpsPath = Some(fpsPath), accountingPath = Some(acctPath))
      q.awaitTermination()
    }
    land(docsDF(w1), landing, "wave1")
    drain()
    // maintained already after the first wave, not only at the end
    assert(spark.read.parquet(acctPath).count() > 0,
      "accounting table absent after the first micro-batch")

    land(docsDF(w2), landing, "wave2")
    drain()

    // batch composite over the identical corpus in one shot
    val corpusDir = new File(root, "corpus")
    docsDF(w1 ++ w2).write.parquet(s"${corpusDir.getAbsolutePath}/documents.parquet")
    val batch = Sampling.trainingPipeline(spark, corpusDir.getAbsolutePath)
    val streamed = spark.read.parquet(acctPath)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"stream=${streamed.collect().mkString(",")} batch=${batch.collect().mkString(",")}")
  }

  test("streamed contamination gate equals batch scoring under replay") {
    import graft.analytics.TextStats
    val root = TempDirs.tempDir("graft_sgate").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val flaggedPath = s"$root/wh/flagged"

    // frozen bench set: one doc whose grams define contamination
    val benchBody = (1 to 30).map(i => s"bench$i").mkString(" ")
    val benchGrams = TextStats.allGramHashesOf(
      docsDF(Seq((0L, benchBody, "en", "src0", benchBody.length.toLong))), k = 8).cache()
    benchGrams.count()

    // wave 1: a verbatim copy (flagged) and a clean doc; wave 2: a half
    // copy (first 15 bench words + fresh tail — ratio < 0.5, not flagged)
    val w1 = Seq(
      doc(11L, 40, "w1a").copy(_2 = benchBody),
      doc(12L, 40, "w1b"))
    val halfCopy = (1 to 15).map(i => s"bench$i").mkString(" ") + " " +
      (1 to 15).map(i => s"fresh$i").mkString(" ")
    val w2 = Seq(doc(21L, 40, "w2a").copy(_2 = halfCopy))

    def drain(): Unit = {
      val q = StreamingCorpus.startContaminationGate(spark, landing.getAbsolutePath,
        docsDF(w1).schema, benchGrams, flaggedPath, s"$root/chk", k = 8, nBuckets = 8)
      q.awaitTermination()
    }
    land(docsDF(w1), landing, "wave1"); drain()
    land(docsDF(w2), landing, "wave2"); drain()
    // replay wave 1 under a new name: quarantine must not change
    land(docsDF(w1), landing, "wave1_replay"); drain()

    val streamed = BucketedMerge.read(spark, flaggedPath)
      .select("doc_id", "n_grams", "n_hit", "hit_ratio")
    val batch = StreamingCorpus.scoreContamination(
      docsDF(w1 ++ w2), benchGrams, k = 8, flagThreshold = 0.5)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed quarantine diverges from batch scoring")
    val ids = streamed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(11L), s"expected only the verbatim copy flagged, got $ids")
    benchGrams.unpersist()
  }

  test("streamed surgical-decontamination ledger equals batch, under out-of-order + replay") {
    import graft.analytics.TextStats
    val root = TempDirs.tempDir("graft_surgical").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val ledgerPath = s"$root/wh/ledger"

    // frozen bench set: the gram universe of one 30-word doc
    val benchBody = (1 to 30).map(i => s"bench$i").mkString(" ")
    val benchGrams = TextStats.allGramHashesOf(
      docsDF(Seq((0L, benchBody, "en", "src0", benchBody.length.toLong))), k = 8).cache()
    benchGrams.count()

    // w1: doc embedding a bench 8-gram mid-text (span removed) + clean doc;
    // w2 (out of order, lower ids): a verbatim copy (fully removed)
    val spanned = "pre1 pre2 " + (1 to 8).map(i => s"bench$i").mkString(" ") +
      " post1 post2 post3"
    val w1 = Seq(
      doc(11L, 0, "x").copy(_2 = spanned),
      doc(12L, 12, "clean"))
    val w2 = Seq(doc(5L, 0, "y").copy(_2 = benchBody))

    def drain(): Unit = {
      val q = StreamingCorpus.startSurgicalGate(spark, landing.getAbsolutePath,
        docsDF(w1).schema, benchGrams, ledgerPath, s"$root/chk", k = 8, nBuckets = 8)
      q.awaitTermination()
    }
    land(docsDF(w1), landing, "wave1"); drain()
    land(docsDF(w2), landing, "wave2"); drain()
    land(docsDF(w1), landing, "wave1_replay"); drain() // re-delivery: no-op

    val cols = Seq("doc_id", "source", "n_tokens", "n_kept", "cleaned_h")
    val streamed = graft.ingest.BucketedMerge.read(spark, ledgerPath)
      .select(cols.head, cols.tail: _*)
    val batch = TextStats.surgicalLedgerOf(docsDF(w1 ++ w2), benchGrams, k = 8)
      .select(cols.head, cols.tail: _*)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "maintained ledger diverges from the batch ledger")

    // the q141 table is a deterministic readback of the ledger
    val rollS = TextStats.surgicalRollupOf(streamed)
    val rollB = TextStats.surgicalRollupOf(batch)
    assert(rollS.exceptAll(rollB).isEmpty && rollB.exceptAll(rollS).isEmpty)

    // planted semantics: span removal kept "pre1 pre2 post1 post2 post3";
    // the verbatim copy lost everything; the clean doc is untouched
    val byId = streamed.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    assert(byId(11L) == ((13L, 5L)), s"span doc: ${byId(11L)}")
    assert(byId(5L)._2 == 0L, "verbatim copy must lose every token")
    assert(byId(12L)._1 == byId(12L)._2, "clean doc must keep every token")
    benchGrams.unpersist()
  }

  test("streamed cell index against a frozen codebook equals the batch assignment") {
    val root = TempDirs.tempDir("graft_scells").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val cellsPath = s"$root/wh/cells"

    // frozen codebook: trained on the bootstrap wave only
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val wave1 = all.filter(col("vec_id") < 250)
    val wave2 = all.filter(col("vec_id") >= 250)
    val cents = Similarity.centroids(
      Similarity.kmeansCells(wave1, k = 4, iters = 1)).cache()
    cents.count()

    def landEmb(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      df.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    def drain(): Unit = {
      val q = StreamingCorpus.startCellIndex(spark, landing.getAbsolutePath,
        all.schema, cents, cellsPath, s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    landEmb(wave1, "wave1"); drain()
    landEmb(wave2, "wave2"); drain()

    val streamed = BucketedMerge.read(spark, cellsPath).select("vec_id", "cell")
    val batch = Similarity.assignCells(all, cents).select("vec_id", "cell")
    assert(streamed.count() == all.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "incremental cell index diverges from the batch assignment")
    cents.unpersist()
  }

  test("streamed funnel equals the batch funnel; a late early event rewrites downstream steps") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_sfunnel").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val statePath = s"$root/wh/fstate"
    val funnelPath = s"$root/wh/funnel"

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: click(10) + purchase(30) arrive FIRST; the view(0) that
    // unlocks them arrives in wave 2 — conversion appears retroactively.
    // user 2: view(0) then purchase(5) BEFORE any click — never converts.
    // wave 2 replays user 2's view (event_id 20) to pin idempotence.
    val w1 = Seq(
      (10L, ts(10), 1L, "click", 0.0, "{}"),
      (11L, ts(30), 1L, "purchase", 0.0, "{}"),
      (20L, ts(0), 2L, "view", 0.0, "{}"),
      (21L, ts(5), 2L, "purchase", 0.0, "{}"))
    val w2 = Seq(
      (12L, ts(0), 1L, "view", 0.0, "{}"),
      (20L, ts(0), 2L, "view", 0.0, "{}"),
      (22L, ts(20), 2L, "click", 0.0, "{}"))
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val all = df((w1 ++ w2).distinct)

    def landE(d0: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      d0.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    val steps = Seq("view", "click", "purchase")
    def drain(): Unit = {
      val q = StreamingCorpus.startFunnel(spark, landing.getAbsolutePath,
        all.schema, steps, statePath, funnelPath, s"$root/chk", nBuckets = 4)
      q.awaitTermination()
    }
    landE(df(w1), "wave1"); drain()
    val mid = spark.read.parquet(funnelPath)
      .filter(col("step") === "3_purchase").select("n_users").as[Long].head()
    assert(mid == 0L, "no view has arrived yet, so nothing can have converted")

    landE(df(w2), "wave2"); drain()
    val streamed = spark.read.parquet(funnelPath)
      .select("step", "n_users", "conv_from_first", "avg_secs")
    val batch = graft.analytics.Relational.eventFunnelOf(all, steps)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed funnel diverges from the batch funnel on the same corpus")
    val purch = streamed.filter(col("step") === "3_purchase")
      .select("n_users").as[Long].head()
    assert(purch == 1L, "the late view must retroactively convert user 1 (and only user 1)")
  }

  test("streamed leakage matrix equals batch q101 under replay and out-of-order arrival") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_sleak").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val fpsPath = s"$root/wh/leak_fps"
    val matrixPath = s"$root/wh/leak_matrix"
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    def variant(v: Int) = (0 until 30)
      .map(i => if (i % 11 == v % 11) s"x${v}_$i" else s"w$i").mkString(" ")
    // exact dups of one text across three sources (incl. NULL), near-dup
    // variants, unique docs — the full q101 cell taxonomy. Wave 2 arrives
    // OUT OF ORDER (lower ids later) and REPLAYS doc 3.
    val w1 = Seq(
      (10L, base, "srcA"), (11L, base, "srcB"), (12L, base, null: String),
      (20L, variant(1), "srcA"), (30L, "unique one", "srcB"))
    val w2 = Seq(
      (3L, base, "srcB"), (4L, variant(2), "srcB"), (5L, "another unique", null: String),
      (3L, base, "srcB")) // replay
    val all = (w1 ++ w2).distinct.toDF("doc_id", "text", "source")
    def land(rows: Seq[(Long, String, String)], name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      rows.toDF("doc_id", "text", "source").coalesce(1)
        .write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    def drain(): Unit = {
      val q = StreamingCorpus.startLeakageGate(spark, landing.getAbsolutePath,
        all.schema, fpsPath, matrixPath, s"$root/chk", maxHamming = 6, nBuckets = 4)
      q.awaitTermination()
    }
    land(w1, "wave1"); drain()
    land(w2, "wave2"); drain()
    val streamed = spark.read.parquet(matrixPath)
    val batch = graft.analytics.Dedup.crossSourceLeakageOf(all, 6)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed leakage matrix diverges from batch q101 on the same corpus")
    // sanity: the cross-source exact dup must be visible
    val ab = streamed.filter(col("src_a") === "srcA" && col("src_b") === "srcB")
      .select("min_hamming").as[Int].collect()
    assert(ab.sameElements(Array(0)), "srcA x srcB exact dup must pin min_hamming 0")
  }

  test("incrementally-maintained clusters equal batch q74 under replay, out-of-order arrival and root displacement") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_sclust").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val repPath = s"$root/wh/clust_rep"
    val forestPath = s"$root/wh/clust_forest"
    val statsPath = s"$root/wh/clust_stats"
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    def variant(v: Int) = (0 until 30)
      .map(i => if (i % 11 == v % 11) s"x${v}_$i" else s"w$i").mkString(" ")
    // wave 1: exact-dup group {10,11,12} on `base`, near-dup variants
    // 20/21, uniques. wave 2 arrives OUT OF ORDER (doc 2 < every wave-1
    // id) with base's exact text — it must DISPLACE root 10 and re-point
    // 11/12/near-dups — plus a replayed doc and a near-dup of base.
    // wave 3 is all-unique: the batch-boundedness probe.
    val w1 = Seq((10L, base), (11L, base), (12L, base),
      (20L, variant(1)), (21L, variant(2)), (30L, "nothing like it at all"))
    // hostile shapes ride along: NULL text (must never pair — q74's
    // null-fingerprint guard) and empty text (a real, pairable hash)
    val w2 = Seq((2L, base), (4L, variant(3)), (2L, base),
      (31L, "also entirely different text"), (32L, null: String),
      (33L, ""), (34L, ""))
    val w3 = Seq((40L, "unique forty text"), (41L, "unique forty one text"),
      (42L, null: String))
    def dfOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startClusterGate(spark, landing.getAbsolutePath,
        schema, repPath, forestPath, s"$root/chk", Some(statsPath), nBuckets = 4)
      q.awaitTermination()
    }
    def assertEqBatch(soFar: Seq[(Long, String)], tag: String): Unit = {
      val streamed = StreamingCorpus.clustersFromForest(
        BucketedMerge.read(spark, forestPath).select(col("doc_id"), col("root")))
      val batch = graft.analytics.Dedup.duplicateClusters(
        graft.analytics.Dedup.simhashDupGraphOf(dfOf(soFar)))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"$tag: incremental clusters diverge from batch duplicateClusters")
    }
    land(dfOf(w1), landing, "wave1"); drain(); assertEqBatch(w1, "wave1")
    land(dfOf(w2), landing, "wave2"); drain(); assertEqBatch(w1 ++ w2, "wave2")
    // the displaced root: doc 2 now roots base's whole group
    val f2 = BucketedMerge.read(spark, forestPath)
      .select(col("doc_id"), col("root")).as[(Long, Long)].collect().toMap
    assert(f2(10L) == 2L && f2(11L) == 2L && f2(12L) == 2L,
      "the late-arriving lower id must displace the root of the exact group")
    // star shape: no child is ever a root (no chains), and child > root
    assert(f2.keySet.intersect(f2.values.toSet).isEmpty, "forest must stay a star")
    assert(f2.forall { case (c, r) => c > r }, "canonical child > root orientation")
    land(dfOf(w3), landing, "wave3"); drain(); assertEqBatch(w1 ++ w2 ++ w3, "wave3")
    // batch-boundedness, deterministically observable: the all-unique
    // wave contracts NOTHING (0 root edges, 0 forest updates) no matter
    // how many clusters the accumulated corpus holds
    val stats = spark.read.parquet(statsPath)
      .orderBy(col("batch_id").desc).limit(1)
      .select(col("n_root_edges"), col("n_forest_updates"))
      .as[(Long, Long)].head()
    assert(stats == ((0L, 0L)),
      s"an all-unique batch must not touch the forest (got $stats)")
  }

  test("streamed DSIR selection equals batch q123 under replay and out-of-order arrival") {
    import graft.analytics.TextStats
    import spark.implicits._
    val root = TempDirs.tempDir("graft_sdsir").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val scoresPath = s"$root/wh/dsir_scores"
    val selectedPath = s"$root/wh/dsir_selected"
    // target-like (en-gram-heavy) and raw-like texts; wave 2 arrives out
    // of order (lower ids), REPLAYS doc 11, and carries a high-weight doc
    // that must EVICT a wave-1 selectee from the top-k. Hostile shapes
    // ride along (null text, empty text, null lang/source).
    def doc(id: Long, lang: String, src: String, t: String) = (id, t, lang, src, 0L)
    val w1 = Seq(
      doc(10L, "en", "s0", "alpha beta gamma alpha beta"),
      doc(11L, "fr", "s1", "rawone rawtwo rawthree"),
      doc(12L, "en", "s0", "alpha beta alpha beta alpha"),
      doc(13L, null, "s1", "rawone rawtwo"))
    val w2 = Seq(
      doc(2L, "en", "s0", Seq.fill(10)("alpha beta gamma").mkString(" ")),
      doc(11L, "fr", "s1", "rawone rawtwo rawthree"), // replay
      doc(3L, "fr", null, null),
      doc(4L, "en", "s1", ""))
    val schema = docsDF(w1).schema
    // the FROZEN model trains on the full corpus (the batch event), the
    // gate then scores arrivals against it incrementally
    val all = docsDF(w1 ++ w2.filterNot(_._1 == 11L))
    val model = TextStats.dsirModelOf(all).localCheckpoint(true)
    def drain(): Unit = {
      val q = StreamingCorpus.startDsirGate(spark, landing.getAbsolutePath,
        schema, model, scoresPath, selectedPath, s"$root/chk",
        nBuckets = 4, featureBuckets = 256, keepN = 3)
      q.awaitTermination()
    }
    land(docsDF(w1), landing, "wave1"); drain()
    val midTop = spark.read.parquet(selectedPath)
      .select(col("doc_id")).as[Long].collect().toSet
    land(docsDF(w2), landing, "wave2"); drain()
    val streamed = spark.read.parquet(selectedPath)
      .select(col("rank"), col("doc_id"), col("source"), col("logw"), col("sel_key"))
    val batch = TextStats.dsirTopOf(TextStats.dsirKeyedOf(all, model), keepN = 3)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed DSIR selection diverges from the batch selection on the same corpus")
    val endTop = streamed.select(col("doc_id")).as[Long].collect().toSet
    assert(endTop != midTop,
      "a late high-weight arrival must reshape the selection (eviction)")
    // the maintained score table equals batch scoring of the full corpus
    val sTab = BucketedMerge.read(spark, scoresPath)
      .select(col("doc_id"), col("source"), col("logw"), col("sel_key"))
    val bTab = TextStats.dsirKeyedOf(all, model)
    assert(sTab.exceptAll(bTab).isEmpty && bTab.exceptAll(sTab).isEmpty,
      "streamed DSIR score table diverges from batch scoring")
  }

  test("streamed CMS sketch equals batch q126 sketch under replay and out-of-order arrival") {
    import graft.analytics.TextStats
    import spark.implicits._
    val root = TempDirs.tempDir("graft_scms").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val seenPath = s"$root/wh/cms_seen"
    val deltasPath = s"$root/wh/cms_deltas"
    // wave 2 REPLAYS doc 11 verbatim and re-delivers doc 12's id with
    // different text (first wins — the id is the identity); hostile
    // shapes: null text (no tokens, still marked seen), empty text (one
    // "" token), multibyte tokens, whitespace runs
    def doc(id: Long, t: String) = (id, t, "en", "s0", 0L)
    val w1 = Seq(
      doc(10L, "alpha beta alpha"),
      doc(11L, "beta   beta\tgamma"),
      doc(12L, "čolö 😀 alpha"),
      doc(13L, null))
    val w2 = Seq(
      doc(2L, "alpha alpha alpha delta"),
      doc(11L, "beta   beta\tgamma"), // replay
      doc(12L, "DIFFERENT text"),     // late re-delivery, must not count
      doc(4L, ""))
    val schema = docsDF(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startCmsGate(spark, landing.getAbsolutePath,
        schema, seenPath, deltasPath, s"$root/chk", depth = 4, width = 64)
      q.awaitTermination()
    }
    land(docsDF(w1), landing, "wave1"); drain()
    land(docsDF(w2), landing, "wave2"); drain()
    val streamed = StreamingCorpus.cmsSketch(spark, deltasPath)
    val batchToks = docsDF(w1 ++ w2.filterNot(d => Seq(11L, 12L).contains(d._1)))
      .select(explode(TextStats.words(col("text"))).as("w"))
    val batchSketch = TextStats.cmsSketchOf(batchToks, depth = 4, width = 64)
    assert(streamed.exceptAll(batchSketch).isEmpty &&
      batchSketch.exceptAll(streamed).isEmpty,
      "streamed CMS sketch diverges from the batch sketch of distinct ingested docs")
    // served estimates can only OVERESTIMATE the exact counts
    val exact = batchToks.groupBy(col("w").as("word"))
      .agg(count(lit(1)).as("n_exact"))
    val est = TextStats.cmsEstimatesOf(streamed, exact, depth = 4, width = 64)
    assert(est.filter(col("n_est") < col("n_exact")).isEmpty,
      "a CMS estimate underestimated an exact count")
  }

  test("CMS heavy-hitter candidates: a true-heavy word can never be missed") {
    import graft.analytics.TextStats
    val root = TempDirs.tempDir("graft_scmshh").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val seenPath = s"$root/wh/seen"
    val deltasPath = s"$root/wh/deltas"
    val hhPath = s"$root/wh/hh"
    // "alpha" reaches the threshold only across waves (3 + 3); "rare"
    // stays below it; wave 2 replays doc 11
    def doc(id: Long, t: String) = (id, t, "en", "s0", 0L)
    val w1 = Seq(doc(10L, "alpha alpha alpha rare"), doc(11L, "beta beta"))
    val w2 = Seq(doc(12L, "alpha alpha alpha beta"), doc(11L, "beta beta"))
    val schema = docsDF(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startCmsGate(spark, landing.getAbsolutePath,
        schema, seenPath, deltasPath, s"$root/chk", depth = 4, width = 1024,
        hhPath = Some(hhPath), hhThreshold = 5L)
      q.awaitTermination()
    }
    land(docsDF(w1), landing, "wave1"); drain()
    land(docsDF(w2), landing, "wave2"); drain()
    val hh = spark.read.parquet(hhPath)
      .select(col("word"), col("n_est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docsDF(w1 ++ w2.filterNot(_._1 == 11L))
      .select(explode(TextStats.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the no-false-negative guarantee: every true-heavy word is present
    exact.filter(_._2 >= 5L).keys.foreach { w =>
      assert(hh.contains(w), s"true-heavy word '$w' missing from $hh")
    }
    // every entry's estimate is at or above threshold AND its true count
    hh.foreach { case (w, est) =>
      assert(est >= 5L && est >= exact.getOrElse(w, 0L),
        s"entry ($w, $est) violates the one-sided contract (exact=${exact.get(w)})")
    }
  }

  test("CMS gate is exactly-once under crash-replay of a partially-landed batch") {
    import graft.analytics.TextStats
    import graft.ingest.BucketedMerge
    val root = TempDirs.tempDir("graft_scmscrash").toFile
    val seenPath = s"$root/wh/seen"
    val deltasPath = s"$root/wh/deltas"
    val b0 = docsDF(Seq((1L, "alpha beta", "en", "s", 0L),
      (2L, "beta beta", "en", "s", 0L)))
    val b1 = docsDF(Seq((2L, "beta beta", "en", "s", 0L), // cross-batch dup
      (3L, "alpha gamma gamma", "en", "s", 0L)))
    StreamingCorpus.maintainCmsState(spark, b0, 0L, seenPath, deltasPath,
      depth = 4, width = 64)
    // CRASH WINDOW: attempt 1 of batch 1 merges the SEEN table and dies
    // before its delta lands — replay must still count batch 1 exactly once
    BucketedMerge.mergeInto(spark, seenPath,
      b1.dropDuplicates(Seq("doc_id")).select(col("doc_id"),
        lit(1L).as("first_batch"), lit(-1L).as("_keep_rank")),
      Seq("doc_id"), 8, seqCol = Some("_keep_rank"))
    StreamingCorpus.maintainCmsState(spark, b1, 1L, seenPath, deltasPath,
      depth = 4, width = 64)
    // and a full re-run of the same batchId (crash AFTER both writes)
    StreamingCorpus.maintainCmsState(spark, b1, 1L, seenPath, deltasPath,
      depth = 4, width = 64)
    val streamed = StreamingCorpus.cmsSketch(spark, deltasPath)
    val batchSketch = TextStats.cmsSketchOf(
      docsDF(Seq((1L, "alpha beta", "en", "s", 0L),
        (2L, "beta beta", "en", "s", 0L),
        (3L, "alpha gamma gamma", "en", "s", 0L)))
        .select(explode(TextStats.words(col("text"))).as("w")),
      depth = 4, width = 64)
    assert(streamed.exceptAll(batchSketch).isEmpty &&
      batchSketch.exceptAll(streamed).isEmpty,
      "crash-replay double-counted or dropped a batch")
  }

  test("paragraph gate equals batch q129 under out-of-order arrival, replay and a crash window") {
    import spark.implicits._
    import graft.analytics.TextStats
    import graft.ingest.BucketedMerge
    val root = TempDirs.tempDir("graft_spara").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val keeperPath = s"$root/wh/keepers"
    val dropsPath = s"$root/wh/drops"
    val docsPath = s"$root/wh/docs"
    // spanWords = 2. Wave 1: doc 10 repeats "a b" within itself, doc 20
    // shares "c d" with it. Wave 2 arrives OUT OF ORDER: doc 2 < 10
    // carries "a b" — it must DISPLACE doc 10's keeper retroactively —
    // plus a replayed doc 20 and the hostile NULL/empty-text shapes.
    val w1 = Seq((10L, "a b c d a b"), (20L, "c d e f"), (30L, "g h"))
    val w2 = Seq((2L, "a b"), (20L, "c d e f"),
      (32L, null: String), (33L, ""))
    def dfOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startParagraphGate(spark, landing.getAbsolutePath,
        schema, keeperPath, dropsPath, docsPath, s"$root/chk",
        spanWords = 2, nBuckets = 4)
      q.awaitTermination()
    }
    val cols = Seq("doc_id", "n_paragraphs", "n_dropped", "kept_tokens")
    def assertEqBatch(soFar: Seq[(Long, String)], tag: String): Unit = {
      val streamed = StreamingCorpus.paragraphLedger(spark, docsPath, dropsPath)
        .select(cols.map(col): _*)
      val batch = TextStats.paragraphDedupOf(dfOf(soFar.distinct), spanWords = 2)
        .select(cols.map(col): _*)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"$tag: streamed ledger diverges from batch q129")
    }
    land(dfOf(w1), landing, "wave1"); drain(); assertEqBatch(w1, "wave1")
    land(dfOf(w2), landing, "wave2"); drain(); assertEqBatch(w1 ++ w2, "wave2")
    // the displacement is visible: doc 10's "a b" at pos 0 is now a loser
    val ledger = StreamingCorpus.paragraphLedger(spark, docsPath, dropsPath)
      .select(cols.map(col): _*)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(ledger(10L) == ((10L, 3L, 2L, 2L)),
      s"doc 10 must lose both 'a b' spans to doc 2 (got ${ledger(10L)})")
    assert(ledger(2L) == ((2L, 1L, 0L, 2L)), "doc 2 keeps the displaced span")
    // CRASH WINDOW: batch 2's drops merge lands, the keeper merge dies.
    // Simulated by snapshotting keepers, running fully, restoring keepers.
    def copyDir(src: String, dst: String): Unit = {
      import java.nio.file.{Files, Paths, Path => JPath}
      val s = Paths.get(src); val d0 = Paths.get(dst)
      val it = Files.walk(s).iterator()
      while (it.hasNext) {
        val p: JPath = it.next()
        val t = d0.resolve(s.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def deleteDir(p: String): Unit = {
      import java.nio.file.{Files, Paths, Path => JPath}
      if (Files.exists(Paths.get(p))) {
        val it = Files.walk(Paths.get(p)).sorted(
          java.util.Comparator.reverseOrder[JPath]()).iterator()
        while (it.hasNext) Files.delete(it.next())
      }
    }
    // doc 1 displaces the "c d" keeper (held by doc 10 at pos 1)
    val w3 = Seq((1L, "c d"))
    val snap = s"$root/wh/keepers_snap"
    copyDir(keeperPath, snap)
    StreamingCorpus.maintainParagraphState(spark, dfOf(w3), keeperPath,
      dropsPath, docsPath, 7L, spanWords = 2, nBuckets = 4)
    deleteDir(keeperPath); copyDir(snap, keeperPath)
    // retry with the same batchId, then a full re-run (crash after both)
    StreamingCorpus.maintainParagraphState(spark, dfOf(w3), keeperPath,
      dropsPath, docsPath, 7L, spanWords = 2, nBuckets = 4)
    StreamingCorpus.maintainParagraphState(spark, dfOf(w3), keeperPath,
      dropsPath, docsPath, 7L, spanWords = 2, nBuckets = 4)
    assertEqBatch(w1 ++ w2 ++ w3, "crash-replayed wave3")
    val keepers = BucketedMerge.read(spark, keeperPath)
      .select(col("kd")).as[Long].collect().toSet
    assert(keepers.contains(1L), "doc 1 must hold the displaced 'c d' keeper")
  }

  test("distinct-sketch gate equals batch q135 under replay and out-of-order arrival") {
    import graft.analytics.TextStats
    import spark.implicits._
    val root = TempDirs.tempDir("graft_sdsk").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val bitsPath = s"$root/wh/bits"
    val servedPath = s"$root/wh/served"
    // wave 2 arrives out of order (lower ids), REPLAYS doc 11 verbatim,
    // and carries the hostile shapes (null text, null lang, empty text)
    val w1 = Seq((10L, "apple banana cherry", "en", "s", 0L),
      (11L, "banana dog", "en", "s", 0L),
      (12L, "un deux", "fr", "s", 0L))
    val w2 = Seq((2L, "apple egg", "en", "s", 0L),
      (11L, "banana dog", "en", "s", 0L),
      (3L, null: String, "en", "s", 0L),
      (4L, "orphan", null: String, "s", 0L),
      (5L, "", "fr", "s", 0L))
    def dfOf(rows: Seq[(Long, String, String, String, Long)]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startDistinctSketchGate(spark,
        landing.getAbsolutePath, schema, bitsPath, servedPath,
        s"$root/chk", m = 4096, nBuckets = 4)
      q.awaitTermination()
    }
    def assertEqBatch(soFar: Seq[(Long, String, String, String, Long)], tag: String): Unit = {
      val batchDir = TempDirs.tempDir(s"graft_sdsk_b").toString
      dfOf(soFar.distinct).write.mode("overwrite")
        .parquet(s"$batchDir/documents.parquet")
      val batch = TextStats.distinctSketchAudit(spark, batchDir)
        .select(col("lang"), col("n_set_bits"), col("n_est"))
      val streamed = spark.read.parquet(servedPath)
        .select(col("lang"), col("n_set_bits"), col("n_est"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"$tag: streamed sketch diverges from batch q135")
    }
    land(dfOf(w1), landing, "wave1"); drain(); assertEqBatch(w1, "wave1")
    land(dfOf(w2), landing, "wave2"); drain(); assertEqBatch(w1 ++ w2, "wave2")
    // bound: the bits table can never exceed m rows per language
    val perLang = graft.ingest.BucketedMerge.read(spark, bitsPath)
      .groupBy(col("lang")).count().select("count").as[Long].collect()
    assert(perLang.forall(_ <= 4096L))
  }

  test("cluster gate converges under crash-replay of a partially-merged batch") {
    import spark.implicits._
    import graft.ingest.BucketedMerge
    val root = TempDirs.tempDir("graft_sclustcrash").toFile
    val repPath = s"$root/wh/rep"
    val forestPath = s"$root/wh/forest"
    val base = (0 until 30).map(i => s"c$i").mkString(" ")
    def dfOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    // wave 1 seeds an exact-dup group rooted at 10; wave 2's doc 2 must
    // DISPLACE that root — the exact shape the partial-merge window can
    // permanently disconnect if edges ever derive from post-merge reps
    val w1 = Seq((10L, base), (11L, base), (12L, base),
      (30L, "nothing like it at all"))
    val w2 = Seq((2L, base), (31L, "also entirely different text"))
    def copyDir(src: String, dst: String): Unit = {
      import java.nio.file.{Files, Paths, Path => JPath}
      val s = Paths.get(src); val d = Paths.get(dst)
      val it = Files.walk(s).iterator()
      while (it.hasNext) {
        val p: JPath = it.next()
        val t = d.resolve(s.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def deleteDir(p: String): Unit = {
      import java.nio.file.{Files, Paths, Path => JPath}
      if (Files.exists(Paths.get(p))) {
        val it = Files.walk(Paths.get(p)).sorted(
          java.util.Comparator.reverseOrder[JPath]()).iterator()
        while (it.hasNext) Files.delete(it.next())
      }
    }
    StreamingCorpus.maintainClusterForest(spark, dfOf(w1), repPath,
      forestPath, 0L, nBuckets = 4)
    // CRASH WINDOW: attempt 1 of batch 1 merges the FOREST and dies before
    // the rep merge. Simulated by snapshotting reps, running the batch
    // fully, then restoring the pre-batch rep table.
    val repSnap = s"$root/wh/rep_snapshot"
    copyDir(repPath, repSnap)
    StreamingCorpus.maintainClusterForest(spark, dfOf(w2), repPath,
      forestPath, 1L, nBuckets = 4)
    deleteDir(repPath); copyDir(repSnap, repPath)
    // the retry (same batchId) must re-derive identical no-op edges and
    // land the lost rep merge — not read old_rep == new_rep and drop the
    // displaced-root edge
    StreamingCorpus.maintainClusterForest(spark, dfOf(w2), repPath,
      forestPath, 1L, nBuckets = 4)
    // and a full re-run (crash AFTER both merges) must also be a no-op
    StreamingCorpus.maintainClusterForest(spark, dfOf(w2), repPath,
      forestPath, 1L, nBuckets = 4)
    val streamed = StreamingCorpus.clustersFromForest(
      BucketedMerge.read(spark, forestPath).select(col("doc_id"), col("root")))
    val batch = graft.analytics.Dedup.duplicateClusters(
      graft.analytics.Dedup.simhashDupGraphOf(dfOf(w1 ++ w2)))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "crash-replayed clusters diverge from batch duplicateClusters")
    val f = BucketedMerge.read(spark, forestPath)
      .select(col("doc_id"), col("root")).as[(Long, Long)].collect().toMap
    assert(f(10L) == 2L && f(11L) == 2L && f(12L) == 2L,
      "displaced group must re-root at 2 even across the crash window")
    val reps = BucketedMerge.read(spark, repPath)
      .select(col("rep")).as[Long].collect().toSet
    assert(reps.contains(2L) && !reps.contains(10L),
      s"retry must land the lost rep merge (got reps=$reps)")
  }

  test("cluster gate per-batch work scales with the batch, not the corpus") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_sclustsoak").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val repPath = s"$root/wh/rep"
    val forestPath = s"$root/wh/forest"
    val statsPath = s"$root/wh/stats"
    // 100 exact-dup groups of 4 → a 400-doc corpus holding 100 clusters
    def text(g: Int) = (0 until 25).map(w => s"g${g}w${(g * 13 + w * 5) % 97}").mkString(" ")
    val w1 = (0 until 400).map(i => ((i + 100).toLong, text(i % 100)))
    // the follow-up batch touches ONE existing group (+3 clearly-unique docs)
    val w2 = Seq((10L, text(7)), (11L, text(7)),
      (20L, "alpha beta gamma delta epsilon"),
      (21L, "zeta eta theta iota kappa"),
      (22L, "lambda mu nu xi omicron"))
    def dfOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startClusterGate(spark, landing.getAbsolutePath,
        schema, repPath, forestPath, s"$root/chk", Some(statsPath), nBuckets = 8)
      q.awaitTermination()
    }
    land(dfOf(w1), landing, "wave1"); drain()
    land(dfOf(w2), landing, "wave2"); drain()
    val streamed = StreamingCorpus.clustersFromForest(
      BucketedMerge.read(spark, forestPath).select(col("doc_id"), col("root")))
    val batch = graft.analytics.Dedup.duplicateClusters(
      graft.analytics.Dedup.simhashDupGraphOf(dfOf(w1 ++ w2)))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "incremental clusters diverge from batch duplicateClusters at soak scale")
    // the deterministic batch-boundedness observable (not wall clock —
    // see the round-9 ADVICE on timing asserts): the small batch's root
    // edges and forest writes must be batch-sized; re-contracting the
    // corpus would show ~300 forest updates and 100+ cluster edge groups
    val st = spark.read.parquet(statsPath)
      .orderBy(col("batch_id").desc).limit(1)
      .select(col("n_root_edges"), col("n_forest_updates"))
      .as[(Long, Long)].head()
    assert(st._1 <= 20L, s"root-edge count must be batch-bounded, got ${st._1}")
    assert(st._2 <= 20L, s"forest writes must be batch-bounded, got ${st._2}")
  }

  test("streamed source sketches equal batch q115 under replay and out-of-order arrival") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_ssketch").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val sketchPath = s"$root/wh/sketch"
    val matrixPath = s"$root/wh/sketch_matrix"
    def mk(p: String, n: Int) =
      (0 until n).map(i => s"${p}w${i % 7} x$i").mkString(" ")
    // sources incl. NULL; wave 2 replays a wave-1 doc and arrives out of
    // order; doc 9 carries NULL text (no shingles)
    val w1 = Seq((1L, mk("m", 30), "sA"), (2L, mk("n", 25), "sB"),
      (3L, mk("m", 30), null: String))
    val w2 = Seq((4L, mk("q", 12), "sA"), (2L, mk("n", 25), "sB"),
      (5L, mk("m", 18), null: String), (9L, null: String, "sB"))
    val all = (w1 ++ w2).distinct.toDF("doc_id", "text", "source")
    def land(rows: Seq[(Long, String, String)], name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      rows.toDF("doc_id", "text", "source").coalesce(1)
        .write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    def drain(): Unit = {
      val q = StreamingCorpus.startSketchGate(spark, landing.getAbsolutePath,
        all.schema, sketchPath, matrixPath, s"$root/chk", numPerm = 16, nBuckets = 4)
      q.awaitTermination()
    }
    land(w1, "wave1"); drain()
    land(w2, "wave2"); drain()
    val streamed = spark.read.parquet(matrixPath)
    val batch = graft.analytics.Dedup.sourceSketchSimilarityOf(
      all.select(col("source"), col("text")), 16)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed sketch matrix diverges from batch q115 on the same corpus")
    // state bound: the sketch table is |sources| x numPerm rows, corpus-free
    val stateRows = spark.read.parquet(sketchPath).count()
    assert(stateRows == 3L * 16, s"sketch state must stay sketch-sized: $stateRows")
  }

  test("funnel stream survives a first wave with zero funnel-typed events") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_sfunnel0").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val statePath = s"$root/wh/fstate"
    val funnelPath = s"$root/wh/funnel"
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // wave 1 carries ONLY non-funnel events: the merged state is a
    // zero-partition dataset and the funnel recompute must be skipped,
    // not crash the stream on schema inference
    val w1 = Seq((1L, ts(0), 1L, "heartbeat", 0.0, "{}"))
    val w2 = Seq((2L, ts(1), 1L, "view", 0.0, "{}"),
      (3L, ts(2), 1L, "click", 0.0, "{}"))
    val steps = Seq("view", "click", "purchase")
    def landE(d0: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      d0.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    def drain(): Unit = {
      val q = StreamingCorpus.startFunnel(spark, landing.getAbsolutePath,
        df(w1).schema, steps, statePath, funnelPath, s"$root/chk", nBuckets = 4)
      q.awaitTermination()
    }
    landE(df(w1), "wave1"); drain() // must not throw
    assert(!new File(funnelPath).exists(),
      "no funnel-typed event has landed; the recompute must be skipped")
    landE(df(w2), "wave2"); drain()
    val out = spark.read.parquet(funnelPath)
      .filter(col("step") === "2_click").select("n_users").as[Long].head()
    assert(out == 1L, "once funnel events land, the recompute resumes")
  }

  test("JSONL landings drive the identical corpus pipeline (chunks equal the batch op)") {
    val root = TempDirs.tempDir("graft_sjsonl").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val chunksPath = s"$root/wh/chunks"
    val survivorsPath = s"$root/wh/survivors"

    val rows = (30L to 37L).map(i => doc(i, 40 + (i % 5).toInt * 17, s"j${i % 3}"))
    val corpus = docsDF(rows)
    // land as one JSONL file (the shard format corpora actually ship in)
    val stage = new File(root, "stage_j")
    corpus.coalesce(1).write.json(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.endsWith(".json")).get
    java.nio.file.Files.move(part.toPath, new File(landing, "w.jsonl").toPath)

    val q = StreamingCorpus.start(spark, landing.getAbsolutePath, corpus.schema,
      chunksPath, survivorsPath, s"$root/chk", chunkTokens = 16, overlap = 4,
      nBuckets = 8, landingFormat = "json")
    q.awaitTermination()

    val streamedChunks = BucketedMerge.read(spark, chunksPath).drop("_dump_seq")
    val batchChunks = Sampling.chunkDocumentsOf(corpus, chunkTokens = 16, overlap = 4)
    assert(streamedChunks.count() == batchChunks.count() && batchChunks.count() > 0)
    assert(streamedChunks.exceptAll(batchChunks).isEmpty &&
      batchChunks.exceptAll(streamedChunks).isEmpty,
      "JSONL-landed chunks diverge from the batch chunking")
  }

  test("streamed source-cap gate converges to the batch lottery selection; late low keys evict") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_scap").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val keptPath = s"$root/wh/kept"

    // srcA has 6 docs at cap 2; the two LOWEST-md5 ids are held back to
    // wave 2, so both wave-1 admissions must be retroactively evicted
    val byLottery = (1L to 6L).sortBy(id =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString))
    val (wave2Ids, wave1Ids) = (byLottery.take(2), byLottery.drop(2))
    def rows(ids: Seq[Long], src: String) = ids.map(i => (i, src, i * 10))
    val w1 = rows(wave1Ids, "srcA") ++ Seq((7L, "srcB", 70L))
    val w2 = rows(wave2Ids, "srcA") ++ rows(wave1Ids.take(1), "srcA") // + replay
    val all = (w1 ++ w2).distinct.toDF("doc_id", "source", "n_chars")

    def land(rs: Seq[(Long, String, Long)], name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      rs.toDF("doc_id", "source", "n_chars")
        .coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    def drain(): Unit = {
      val q = StreamingCorpus.startSourceCapGate(spark, landing.getAbsolutePath,
        all.schema, cap = 2, keptPath, s"$root/chk")
      q.awaitTermination()
    }
    land(w1, "wave1"); drain()
    val afterW1 = spark.read.parquet(keptPath)
      .filter(col("source") === "srcA")
      .select("doc_id").as[Long].collect().toSet
    assert(afterW1 == wave1Ids.sortBy(id =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString))
      .take(2).toSet)
    land(w2, "wave2"); drain()

    val streamed = spark.read.parquet(keptPath)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batchSel = graft.analytics.Sampling.sourceCapSelect(all, cap = 2)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batchSel,
      "kept table must equal the batch selection of the full corpus")
    assert(streamed.intersect(afterW1.map((_, "srcA"))).isEmpty,
      "both wave-1 admissions must be evicted by the lower wave-2 keys")
    assert((wave2Ids.map((_, "srcA")).toSet + ((7L, "srcB"))) == streamed)
  }

  test("streamed PQ code index against a frozen codebook equals the batch encode") {
    val root = TempDirs.tempDir("graft_spq").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val codesPath = s"$root/wh/pqcodes"

    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val wave1 = all.filter(col("vec_id") < 250)
    val wave2 = all.filter(col("vec_id") >= 250)
    // frozen codebook: trained on the bootstrap wave only (m=4 over the
    // 64-dim fixture -> dsub=16)
    val cb = Similarity.pqCodebook(wave1, m = 4, k = 4, iters = 2).cache()
    cb.count()

    def landEmb(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      df.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    def drain(): Unit = {
      val q = StreamingCorpus.startPqIndex(spark, landing.getAbsolutePath,
        all.schema, cb, m = 4, dsub = 16, codesPath, s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    // out-of-order: the later id range lands first, plus a replay of wave1
    landEmb(wave2, "wave2"); drain()
    landEmb(wave1, "wave1"); drain()
    landEmb(wave1, "wave1_replay"); drain()

    val streamed = BucketedMerge.read(spark, codesPath)
      .select("vec_id", "sub", "code")
    val batch = Similarity.pqEncode(all, cb, m = 4, dsub = 16)
    assert(streamed.count() == all.count() * 4,
      "every vector must carry exactly m code rows")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "incremental PQ code index diverges from the batch encode")
    cb.unpersist()
  }

  test("streamed semantic gate equals the batch sweep; late low id retroactively quarantines") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_ssem").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val indexPath = s"$root/wh/semindex"
    val quarantinePath = s"$root/wh/semq"

    // axis-orthogonal corpus; vec 50 (wave 1) is an exact copy of vec 2,
    // which only arrives in wave 2 — the gate must then quarantine 50
    // retroactively; vec 51 duplicates 50 within wave 1
    def axis(i: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == i % 7) 1f else 0f)
    val w1 = Seq((50L, axis(2), 0), (51L, axis(2), 0)) ++
      (10L to 15L).map(i => (i, axis(i.toInt), 0)) // 10..15 -> axes 3,4,5,6,0,1
    val w2 = Seq((2L, axis(2), 0)) ++ (3L to 6L).map(i => (i, axis(i.toInt), 0)) ++
      Seq((51L, axis(2), 0)) // re-delivery of a wave-1 row
    val allRows = (w1 ++ w2).distinct
    val allDf = allRows.toDF("vec_id", "embedding", "label")

    // frozen codebook trained on wave 1 only
    val cents = Similarity.centroids(
      Similarity.kmeansCells(w1.toDF("vec_id", "embedding", "label"), k = 3, iters = 1)).cache()
    cents.count()

    def landEmb(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = new File(root, s"stage_$name")
      df.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new File(landing, s"$name.parquet").toPath)
    }
    def drain(): Unit = {
      val q = StreamingCorpus.startSemanticGate(spark, landing.getAbsolutePath,
        allDf.schema, cents, indexPath, quarantinePath, s"$root/chk",
        threshold = 0.999999, nBuckets = 8)
      q.awaitTermination()
    }
    landEmb(w1.toDF("vec_id", "embedding", "label"), "wave1"); drain()
    val afterW1 = BucketedMerge.read(spark, quarantinePath)
      .select("vec_id").as[Long].collect().toSet
    assert(afterW1 == Set(51L), s"within-wave dup must quarantine first: $afterW1")

    landEmb(w2.toDF("vec_id", "embedding", "label"), "wave2"); drain()
    val streamed = BucketedMerge.read(spark, quarantinePath)
      .select("vec_id").as[Long].collect().toSet
    // batch sweep over the identical final corpus and the same codebook
    val batch = Similarity.semanticPairs(
      Similarity.assignCells(allDf, cents)
        .select(col("cell"), col("vec_id"), col("embedding")), 0.999999)
      .select("vec_b").as[Long].collect().toSet
    assert(streamed == batch,
      s"stream quarantine $streamed diverges from batch sweep $batch")
    assert(Set(50L, 51L).subsetOf(streamed),
      s"late-arriving low id 2 must retroactively quarantine 50: $streamed")
    assert(!streamed.contains(2L), "the lowest id of the dup group must survive")
    cents.unpersist()
  }

  test("streamed classifier gate equals the batch filter under replay; lottery still re-admits") {
    import graft.analytics.TextStats
    val root = TempDirs.tempDir("graft_cgate").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val quarantinePath = s"$root/wh/quarantine"

    // frozen model from a batch training run: alpha is the en-class
    // token (wt +9), beta the negative one (wt -9)
    val trainDocs = docsDF(Seq(
      (1L, "alpha alpha alpha", "en", "src0", 17L),
      (2L, "beta beta beta", "de", "src0", 14L)))
    val weights = TextStats.classifierWeights(trainDocs, 256).cache()
    weights.count()

    // wave 1: doc 11 kept on score, doc 12 rejected (lottery bucket 1);
    // wave 2: doc 10 rejected on score but WINS the md5 lottery (bucket
    // 0); doc 9 rejected (bucket 6) and RE-DELIVERED within the same
    // micro-batch (allowed by the corpus contract — its stored score
    // must still be -9, not -18); doc 13's token hits a bucket the model
    // never trained (score 0, lottery bucket 4 ⇒ still quarantined —
    // the left-join-with-zero-fill path)
    val w1 = docsDF(Seq(
      (11L, "alpha alpha", "en", "src1", 11L),
      (12L, "beta beta", "de", "src1", 9L)))
    val w2 = docsDF(Seq(
      (10L, "beta beta", "de", "src0", 9L),
      (9L, "beta", "de", "src0", 4L),
      (13L, "gamma gamma", "de", "src0", 11L)))
    val w2land = w2.unionByName(docsDF(Seq((9L, "beta", "de", "src0", 4L))))

    def drain(): Unit = {
      val q = StreamingCorpus.startClassifierGate(spark, landing.getAbsolutePath,
        w1.schema, weights, quarantinePath, s"$root/chk",
        featureBuckets = 256, lotteryMod = 10, nBuckets = 8)
      q.awaitTermination()
    }
    land(w1, landing, "wave1"); drain()
    land(w2land, landing, "wave2"); drain()
    land(w1, landing, "wave1_replay"); drain()

    val streamed = BucketedMerge.read(spark, quarantinePath)
      .select("doc_id", "source", "score")
    val batch = TextStats.classifierScores(
      w1.unionByName(w2), weights, 256, 10)
      .filter(!col("kept")).select("doc_id", "source", "score")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed quarantine diverges from the batch filter's dropped set")
    val byId = streamed.collect()
      .map(r => r.getLong(0) -> r.getDecimal(2).longValueExact()).toMap
    assert(byId.keySet == Set(9L, 12L, 13L),
      s"expected score-rejected lottery losers only, got $byId")
    assert(byId(9L) == -9L, s"in-batch re-delivery must not double the score: $byId")
    assert(byId(13L) == 0L, s"untrained-bucket doc must score 0, not vanish: $byId")
    weights.unpersist()
  }

  test("URL-dedup gate: served ledger equals batch q148 under replay, out-of-order arrival and keeper displacement") {
    import graft.analytics.Sampling
    import spark.implicits._
    val root = TempDirs.tempDir("graft_surl").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val docsPath = s"$root/wh/url_docs"
    val keeperPath = s"$root/wh/url_keeper"
    // ids 3 and 10 share canonical 's0.example.com/p3' (same mod-7 slot,
    // every raw variant normalizes away); md5('10') < md5('3'), so doc 10
    // arriving LATE in wave 2 must displace wave-1 keeper 3. Hostile
    // shapes ride along: NULL source (canonicalizes via 'nosrc'), NULL
    // n_chars, and an in-batch re-delivery.
    def doc(id: Long, src: String, n: java.lang.Long) = (id, src, n)
    val w1 = Seq(doc(3L, "s0", 30L), doc(17L, "s0", 17L),
      doc(5L, "s1", 50L), doc(9L, null, null))
    val w2 = Seq(doc(10L, "s0", 10L), doc(10L, "s0", 10L),
      doc(24L, "s1", 24L), doc(16L, null, 16L))
    val w3 = Seq(doc(31L, "s2", 31L))
    def dfOf(rows: Seq[(Long, String, java.lang.Long)]) =
      rows.toDF("doc_id", "source", "n_chars")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startUrlDedupGate(spark, landing.getAbsolutePath,
        schema, docsPath, keeperPath, s"$root/chk", nBuckets = 4)
      q.awaitTermination()
    }
    def assertEqBatch(soFarRaw: Seq[(Long, String, java.lang.Long)], tag: String): Unit = {
      val soFar = soFarRaw.distinctBy(_._1)
      val streamed = StreamingCorpus.urlLedger(spark, docsPath, keeperPath)
      val batch = Sampling.urlDedupStatsOf(dfOf(soFar))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"$tag: streamed URL ledger diverges from batch q148")
    }
    land(dfOf(w1), landing, "wave1"); drain(); assertEqBatch(w1, "wave1")
    land(dfOf(w2), landing, "wave2"); drain(); assertEqBatch(w1 ++ w2, "wave2")
    // crash window: replay the whole wave-2 step against merged state —
    // both merges must be idempotent (dominated-or-identical rows only)
    StreamingCorpus.maintainUrlDedupState(spark, dfOf(w2), docsPath,
      keeperPath, 1L, nBuckets = 4)
    assertEqBatch(w1 ++ w2, "wave2-replay")
    // the displaced keeper: url of docs {3, 10} now keeps 10 (lower md5)
    val keepers = BucketedMerge.read(spark, keeperPath)
      .select(col("url"), col("kd")).as[(String, Long)].collect().toMap
    assert(keepers("s0.example.com/p3") == 10L,
      s"late-arriving lower-lottery doc must displace the keeper: $keepers")
    land(dfOf(w3), landing, "wave3"); drain(); assertEqBatch(w1 ++ w2 ++ w3, "wave3")
  }

  test("image cluster gate: fingerprints + clusters equal batch q128/q130 under replay, out-of-order arrival and crash window") {
    import graft.analytics.{Dedup, Multimodal}
    import spark.implicits._
    val root = TempDirs.tempDir("graft_simgclust").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val fpPath = s"$root/wh/img_fp"
    val repPath = s"$root/wh/img_rep"
    val forestPath = s"$root/wh/img_forest"
    val statsPath = s"$root/wh/img_stats"
    // deterministic renders; `tweak` flips one pixel OFF the dHash sample
    // grid (w=33 samples x ∈ {0,3,6,..}, h=24 samples y ∈ {0,4,8,..}) —
    // same perceptual fingerprint, different bytes: a true near-dup pair
    def render(seed: Long, w: Int, h: Int, tweak: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (seed * 131 + x * 31 + y * 7).toInt & 0xFFFFFF
          img.setRGB(x, y, if (tweak && x == 1 && y == 1) v ^ 0x0F0F0F else v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = render(7L, 33, 24)
    val tweaked = render(7L, 33, 24, tweak = true)
    // wave 1: exact-dup group {10,11,12} on `base` bytes, near-dup 20
    // (identical dHash, different md5), unique 30. wave 2 arrives OUT OF
    // ORDER (doc 2 < every wave-1 id) with base's exact bytes — it must
    // displace root 10 — plus an in-batch re-delivery, a unique, and a
    // NULL payload (must never pair). wave 3: uniques + null (the
    // batch-boundedness probe).
    val w1 = Seq((10L, base), (11L, base), (12L, base), (20L, tweaked),
      (30L, render(99L, 40, 30)))
    val w2 = Seq((2L, base), (2L, base), (31L, render(55L, 20, 20)),
      (32L, null: Array[Byte]))
    val w3 = Seq((40L, render(77L, 28, 18)), (41L, null: Array[Byte]))
    def dfOf(rows: Seq[(Long, Array[Byte])]) = rows.toDF("doc_id", "payload")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startImageClusterGate(spark,
        landing.getAbsolutePath, schema, fpPath, repPath, forestPath,
        s"$root/chk", Some(statsPath), nBuckets = 4)
      q.awaitTermination()
    }
    def assertEqBatch(soFarRaw: Seq[(Long, Array[Byte])], tag: String): Unit = {
      // the batch reference sees each doc once — re-delivered rows are the
      // GATE's problem (it must collapse them), not extra batch multiplicity
      val soFar = soFarRaw.distinctBy(_._1)
      val meta = Multimodal.dhashMetaOf(dfOf(soFar)).localCheckpoint(true)
      // q130: incremental forest components ≡ batch contraction
      val streamedC = StreamingCorpus.clustersFromForest(
        BucketedMerge.read(spark, forestPath).select(col("doc_id"), col("root")))
      val batchC = Dedup.duplicateClusters(Dedup.simhashDupGraphFromMeta(meta))
      assert(streamedC.exceptAll(batchC).isEmpty && batchC.exceptAll(streamedC).isEmpty,
        s"$tag: incremental image clusters diverge from batch q130 contraction")
      // q128: histogram over the incremental fingerprint table ≡ batch
      val fp = BucketedMerge.read(spark, fpPath)
        .select(col("doc_id"), col("h128"), col("simhash"))
      val streamedH = Dedup.hammingHistogramOf(fp, 6)
      val batchH = Dedup.hammingHistogramOf(meta, 6)
      assert(streamedH.exceptAll(batchH).isEmpty && batchH.exceptAll(streamedH).isEmpty,
        s"$tag: fingerprint-table histogram diverges from batch q128")
      // ledger completeness: every doc exactly once, null payloads visible
      assert(fp.count() == soFar.map(_._1).distinct.size.toLong,
        s"$tag: fingerprint ledger must cover every arrived doc exactly once")
    }
    land(dfOf(w1), landing, "wave1"); drain(); assertEqBatch(w1, "wave1")
    land(dfOf(w2), landing, "wave2"); drain(); assertEqBatch(w1 ++ w2, "wave2")
    // crash window: the whole wave-2 step re-runs against merged state
    // (covers the retry-after-partial-apply ordering: fp and forest
    // merges are each idempotent on re-derived content)
    StreamingCorpus.maintainImageClusterForest(spark, dfOf(w2), fpPath,
      repPath, forestPath, 1L, Some(statsPath), nBuckets = 4)
    assertEqBatch(w1 ++ w2, "wave2-replay")
    // the displaced root: late doc 2 now roots base's exact group AND its
    // near-dup (identical dHash ⇒ hamming-0 band edge)
    val f2 = BucketedMerge.read(spark, forestPath)
      .select(col("doc_id"), col("root")).as[(Long, Long)].collect().toMap
    assert(f2(10L) == 2L && f2(11L) == 2L && f2(12L) == 2L && f2(20L) == 2L,
      s"late-arriving lower id must displace the image group's root: $f2")
    land(dfOf(w3), landing, "wave3"); drain(); assertEqBatch(w1 ++ w2 ++ w3, "wave3")
    // batch-boundedness: an all-unique wave contracts nothing
    val stats = spark.read.parquet(statsPath)
      .orderBy(col("batch_id").desc).limit(1)
      .select(col("n_root_edges"), col("n_forest_updates"))
      .as[(Long, Long)].head()
    assert(stats == ((0L, 0L)),
      s"an all-unique image batch must not touch the forest (got $stats)")
  }

  test("admission gate: verdict ledger equals batch q151 under out-of-order arrival, re-delivery and crash window") {
    import graft.analytics.{Dedup, Tables}
    import org.apache.spark.sql.functions._
    val root = TempDirs.tempDir("graft_sadm").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val indexPath = s"$root/wh/adm_index"
    val ledgerPath = s"$root/wh/adm_ledger"
    val d = "/root/testdata/sf0.001"
    // plant one guaranteed cross-split EXACT duplicate (the natural corpus
    // may lack one at this sf): an incoming id (%3 == 0) carrying a corpus
    // doc's text verbatim
    val corpusText = Tables.documents(spark, d)
      .filter(col("doc_id") % 3 =!= 0 && col("text").isNotNull)
      .orderBy(col("doc_id")).select("text").head().getString(0)
    import spark.implicits._
    val docs = Tables.documents(spark, d).select("doc_id", "source", "text")
      .unionByName(Seq((900000000003L, "planted", corpusText))
        .toDF("doc_id", "source", "text"))
    StreamingCorpus.buildAdmissionIndex(spark,
      docs.filter(col("doc_id") % 3 =!= 0), indexPath, nBuckets = 8)
    val incoming = docs.filter(col("doc_id") % 3 === 0).cache()
    // later ids land FIRST (out of order); wave 2 re-delivers some wave-1
    // rows (verdicts are content-determined, so the merge must be a no-op)
    val w1 = incoming.filter(col("doc_id") % 2 === 0)
    val w2 = incoming.filter(col("doc_id") % 2 =!= 0)
      .unionByName(w1.orderBy(col("doc_id")).limit(5))
    def drain(): Unit = {
      val q = StreamingCorpus.startAdmissionGate(spark, landing.getAbsolutePath,
        incoming.schema, indexPath, ledgerPath, s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    land(w2, landing, "wave2"); drain()
    land(w1, landing, "wave1"); drain()
    // crash window: replay the whole wave-2 step directly against the
    // merged ledger — a retried batch must overwrite itself exactly
    StreamingCorpus.admitBatch(spark, w2, indexPath, ledgerPath, 99L,
      nBuckets = 8)
    val streamed = StreamingCorpus.admissionLedger(spark, ledgerPath)
    val batch = Dedup.incrementalDedupOf(docs)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed admission ledger diverges from batch q151")
    // sanity: the gate actually exercised all three verdicts on this corpus
    val verdicts = graft.ingest.BucketedMerge.read(spark, ledgerPath)
      .select("verdict").distinct().collect().map(_.getString(0)).toSet
    assert(verdicts == Set("exact", "near", "admitted"),
      s"fixture must exercise every verdict, saw $verdicts")
    incoming.unpersist()
  }

  test("containment gate: served ledger equals the q158 cross-pair batch twin under out-of-order arrival, re-delivery and crash window") {
    import graft.analytics.{Dedup, Tables}
    import org.apache.spark.sql.functions._
    val root = TempDirs.tempDir("graft_scont").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val indexPath = s"$root/wh/cont_index"
    val ledgerPath = s"$root/wh/cont_ledger"
    val d = "/root/testdata/sf0.001"
    // plant a guaranteed quoted-subset arrival: the first 12 words of a
    // corpus-side document (containment 1.0 against it, tiny Jaccard)
    val corpusText = Tables.documents(spark, d)
      .filter(col("doc_id") % 3 =!= 0 && col("text").isNotNull)
      .orderBy(col("doc_id")).select("text").head().getString(0)
    val quoted = corpusText.split("\\s+").take(12).mkString(" ")
    import spark.implicits._
    val docs = Tables.documents(spark, d).select("doc_id", "source", "text")
      .unionByName(Seq((900000000003L, "planted", quoted))
        .toDF("doc_id", "source", "text"))
    StreamingCorpus.buildContainmentIndex(spark,
      docs.filter(col("doc_id") % 3 =!= 0), indexPath, nBuckets = 8)
    val incoming = docs.filter(col("doc_id") % 3 === 0).cache()
    val w1 = incoming.filter(col("doc_id") % 2 === 0)
    val w2 = incoming.filter(col("doc_id") % 2 =!= 0)
      .unionByName(w1.orderBy(col("doc_id")).limit(5))
    def drain(): Unit = {
      val q = StreamingCorpus.startContainmentGate(spark,
        landing.getAbsolutePath, incoming.schema, indexPath, ledgerPath,
        s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    land(w2, landing, "wave2"); drain()
    land(w1, landing, "wave1"); drain()
    // crash window: a retried batch must overwrite itself exactly
    StreamingCorpus.containmentStep(spark, w2, indexPath, ledgerPath, 99L,
      nBuckets = 8)
    val streamed = StreamingCorpus.containmentLedger(spark, ledgerPath)
    // independent batch twin: q158's prefix-filter SELF-join over the
    // union, restricted to cross-split pairs — a different candidate
    // spelling (self-join vs frozen-index probe) that must agree because
    // both are lossless over the same containment definition
    def isArr(c: org.apache.spark.sql.Column) = c % 3 === 0
    val containedIds = Dedup.containmentPairsFor(docs, pct = 80)
      .filter(isArr(col("doc_a")) =!= isArr(col("doc_b")))
      .select(when(isArr(col("doc_a")), col("doc_a")).otherwise(col("doc_b"))
        .as("doc_id"))
      .distinct().withColumn("f", lit(true))
    val batchTwin = incoming
      .join(containedIds, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(coalesce(col("f"), lit(false)), "contained").otherwise("admitted"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_incoming"),
        sum(when(col("verdict") === "contained", 1L).otherwise(0L))
          .as("n_contained"),
        sum(when(col("verdict") === "admitted", 1L).otherwise(0L))
          .as("n_admitted"),
        sum(when(col("verdict") === "admitted", col("doc_id")).otherwise(0L))
          .as("admitted_checksum"))
    assert(streamed.exceptAll(batchTwin).isEmpty &&
      batchTwin.exceptAll(streamed).isEmpty,
      "streamed containment ledger diverges from the q158 cross-pair twin")
    val planted = graft.ingest.BucketedMerge.read(spark, ledgerPath)
      .filter(col("doc_id") === 900000000003L)
      .select("verdict").head().getString(0)
    assert(planted == "contained", s"the quoted subset must be flagged: $planted")
    val verdicts = graft.ingest.BucketedMerge.read(spark, ledgerPath)
      .select("verdict").distinct().collect().map(_.getString(0)).toSet
    assert(verdicts == Set("contained", "admitted"),
      s"fixture must exercise both verdicts, saw $verdicts")
    incoming.unpersist()
  }

  test("Moore-Lewis gate: served ledger equals batch q156 under out-of-order arrival, re-delivery and crash window") {
    import graft.analytics.{Tables, TextStats}
    import org.apache.spark.sql.functions._
    val root = TempDirs.tempDir("graft_sml").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val scoresPath = s"$root/wh/ml_scores"
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
      .select("doc_id", "source", "text").cache()
    // freeze the models from the snapshot, then stream the same corpus
    val models = TextStats.mooreLewisModels(spark, d).cache()
    models.count()
    val w1 = docs.filter(col("doc_id") % 2 === 0)
    val w2 = docs.filter(col("doc_id") % 2 =!= 0)
      .unionByName(w1.orderBy(col("doc_id")).limit(4)) // re-delivery rides wave 2
    def drain(): Unit = {
      val q = StreamingCorpus.startMooreLewisGate(spark, landing.getAbsolutePath,
        docs.schema, models, scoresPath, s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    land(w2, landing, "wave2"); drain() // later ids land first
    land(w1, landing, "wave1"); drain()
    // crash window: replay wave 2 directly against the merged table
    StreamingCorpus.mooreLewisStep(spark, w2, models, scoresPath, 99L,
      nBuckets = 8)
    val streamed = StreamingCorpus.mooreLewisLedger(spark, scoresPath)
    val batch = TextStats.mooreLewis(spark, d)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed Moore-Lewis ledger diverges from batch q156")
    models.unpersist(); docs.unpersist()
  }

  test("CDC chunk gate equals batch q132 under out-of-order arrival, replay and a crash window") {
    import spark.implicits._
    import graft.analytics.TextStats
    val root = TempDirs.tempDir("graft_scdc").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val chunksPath = s"$root/wh/cdc_chunks"
    // divisor 4 => boundaries every ~4 words on these texts. Doc 20
    // duplicates doc 10 exactly (all chunks shared); doc 30 is doc 10
    // with a LEADING INSERTION (the CDC claim: downstream chunks
    // re-synchronize, so some chunk hashes still collide with doc 10's).
    // Wave 2 arrives OUT OF ORDER (lower ids), replays doc 20 verbatim,
    // and carries the hostile shapes (null text, empty text).
    val t10 = "a b c d e f g h i j k l m n o p"
    val w1 = Seq((10L, t10), (20L, t10), (30L, "zz yy " + t10))
    val w2 = Seq((2L, t10), (20L, t10), (32L, null: String), (33L, ""))
    def dfOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startCdcChunkGate(spark, landing.getAbsolutePath,
        schema, chunksPath, s"$root/chk", divisor = 4, nBuckets = 4)
      q.awaitTermination()
    }
    def assertEqBatch(soFar: Seq[(Long, String)], tag: String): Unit = {
      val streamed = StreamingCorpus.cdcChunkLedger(spark, chunksPath)
      val batch = TextStats.cdcChunkDedupOf(dfOf(soFar.distinct), divisor = 4)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"$tag: streamed CDC ledger diverges from batch q132")
    }
    land(dfOf(w1), landing, "wave1"); drain(); assertEqBatch(w1, "wave1")
    land(dfOf(w2), landing, "wave2"); drain(); assertEqBatch(w1 ++ w2, "wave2")
    // the ledger is non-trivial: the three identical docs share every
    // chunk, so some chunk reaches n_copies >= 3 across >= 3 docs
    assert(StreamingCorpus.cdcChunkLedger(spark, chunksPath)
      .filter(col("n_copies") >= 3 && col("n_docs") >= 3).count() > 0,
      "planted whole-doc duplicates produced no shared chunk mass")
    // CRASH WINDOW: a partially-merged batch re-runs with the same
    // batchId — the (doc_id, chunk_id)-keyed merge must converge, not
    // duplicate or interleave
    val w3 = Seq((1L, "c d e f g h"))
    StreamingCorpus.maintainCdcChunkState(spark, dfOf(w3), chunksPath, 7L,
      divisor = 4, nBuckets = 4)
    StreamingCorpus.maintainCdcChunkState(spark, dfOf(w3), chunksPath, 7L,
      divisor = 4, nBuckets = 4)
    assertEqBatch(w1 ++ w2 ++ w3, "crash-replayed wave3")
  }

  test("BPE encode gate equals batch q100 under out-of-order arrival, re-delivery and a crash window") {
    import spark.implicits._
    import graft.analytics.TextStats
    import graft.ingest.BucketedMerge
    val root = TempDirs.tempDir("graft_sbpe").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val seenPath = s"$root/wh/bpe_seen"
    val deltasPath = s"$root/wh/bpe_deltas"
    // wave 2 arrives OUT OF ORDER (lower ids), replays doc 11 verbatim,
    // re-delivers doc 12's id with DIFFERENT text (first wins — the id is
    // the identity), and carries null/empty text and a multibyte token
    val w1 = Seq((10L, "low lower lowest low"), (11L, "new newer low"),
      (12L, "čolö 😀 low"), (13L, null: String))
    val w2 = Seq((2L, "newest lower lower new"),
      (11L, "new newer low"),      // replay
      (12L, "DIFFERENT text"),     // late re-delivery, must not count
      (4L, ""))
    def dfOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = dfOf(w1).schema
    // the corpus the stream will deliver (distinct ingested docs)
    val corpus = dfOf(w1 ++ w2.filterNot(d => Seq(11L, 12L).contains(d._1)))
    // freeze the tokenizer from the snapshot — the q123/q156 frozen-model
    // discipline: batch q100 fits the same merges on the same corpus
    val merges = TextStats.bpeFitMerges(corpus, nMerges = 4, vocabCap = 64)
    def drain(): Unit = {
      val q = StreamingCorpus.startBpeEncodeGate(spark, landing.getAbsolutePath,
        schema, merges, seenPath, deltasPath, s"$root/chk", nBuckets = 4)
      q.awaitTermination()
    }
    land(dfOf(w1), landing, "wave1"); drain()
    land(dfOf(w2), landing, "wave2"); drain()
    val streamed = StreamingCorpus.bpeEncodeLedger(spark, deltasPath, merges,
      topK = 40)
    val batch = TextStats.bpeEncodeOf(corpus, nMerges = 4, vocabCap = 64,
      topK = 40)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed BPE ledger diverges from batch q100")
    // CRASH WINDOW (the CMS discipline verbatim): attempt 1 of a new
    // batch merges the SEEN table and dies before its delta lands —
    // replay must still count the batch exactly once
    val b3 = dfOf(Seq((3L, "low low newest"), (11L, "new newer low")))
    BucketedMerge.mergeInto(spark, seenPath,
      b3.dropDuplicates(Seq("doc_id")).select(col("doc_id"),
        lit(9L).as("first_batch"), lit(-9L).as("_keep_rank")),
      Seq("doc_id"), 4, seqCol = Some("_keep_rank"))
    StreamingCorpus.maintainBpeWordState(spark, b3, 9L, seenPath, deltasPath,
      nBuckets = 4)
    StreamingCorpus.maintainBpeWordState(spark, b3, 9L, seenPath, deltasPath,
      nBuckets = 4)
    val corpus3 = corpus.unionByName(dfOf(Seq((3L, "low low newest"))))
    val streamed3 = StreamingCorpus.bpeEncodeLedger(spark, deltasPath, merges,
      topK = 40)
    val batch3 = TextStats.bpeEncodeWordFreq(
      corpus3.select(explode(TextStats.words(col("text"))).as("word"))
        .filter(length(col("word")) >= 1)
        .groupBy(col("word")).agg(count(lit(1)).as("n")),
      merges, topK = 40)
    assert(streamed3.exceptAll(batch3).isEmpty && batch3.exceptAll(streamed3).isEmpty,
      "crash-replay double-counted or dropped a batch in the BPE word state")
  }

  test("domain-reweight gate: served table equals batch q157 under out-of-order arrival, re-delivery and crash window") {
    import graft.analytics.{Tables, TextStats}
    import org.apache.spark.sql.functions._
    val root = TempDirs.tempDir("graft_sdrw").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val scoresPath = s"$root/wh/drw_scores"
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
      .select("doc_id", "source", "text").cache()
    // freeze the general model from the snapshot, then stream the corpus
    val models = TextStats.domainModels(spark, d).cache()
    models.count()
    val w1 = docs.filter(col("doc_id") % 2 === 0)
    val w2 = docs.filter(col("doc_id") % 2 =!= 0)
      .unionByName(w1.orderBy(col("doc_id")).limit(4)) // re-delivery rides wave 2
    def drain(): Unit = {
      val q = StreamingCorpus.startDomainReweightGate(spark,
        landing.getAbsolutePath, docs.schema, models, scoresPath,
        s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    land(w2, landing, "wave2"); drain() // later ids land first
    land(w1, landing, "wave1"); drain()
    // crash window: replay wave 2 directly against the merged table
    StreamingCorpus.domainReweightStep(spark, w2, models, scoresPath, 99L,
      nBuckets = 8)
    val streamed = StreamingCorpus.domainReweightLedger(spark, scoresPath)
    val batch = TextStats.domainReweight(spark, d)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed domain-reweight table diverges from batch q157")
    models.unpersist(); docs.unpersist()
  }

  test("serving ledgers before any data: empty typed tables, not schema-inference errors") {
    val root = TempDirs.tempDir("graft_sempty").toFile
    // no gate has ever run against these paths — each ledger must serve
    // its empty typed table (the r17 ADVICE guard: an all-empty first
    // batch writes bookkeeping but no parquet footers, and serving then
    // threw schema inference at the dir)
    assert(StreamingCorpus.domainReweightLedger(spark,
      s"$root/no_scores").count() == 0L)
    assert(StreamingCorpus.softDedupLedger(spark,
      s"$root/no_docs", s"$root/no_forest").count() == 0L)
    assert(StreamingCorpus.effectiveDataLedger(spark,
      s"$root/no_docs2", s"$root/no_forest2").count() == 0L)
    assert(StreamingCorpus.qualityKeeperLedger(spark,
      s"$root/no_docs3", s"$root/no_forest3").count() == 0L)
  }

  test("soft-dedup gate: served ledgers equal batch q159/q163/q153 under out-of-order arrival, re-delivery, crash window and root displacement") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = TempDirs.tempDir("graft_ssoft").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val repPath = s"$root/wh/soft_rep"
    val forestPath = s"$root/wh/soft_forest"
    val docsPath = s"$root/wh/soft_docs"
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    def variant(v: Int) = (0 until 30)
      .map(i => if (i % 11 == v % 11) s"x${v}_$i" else s"w$i").mkString(" ")
    // wave 1: exact trio on `base` + a near-dup + uniques, two sources.
    // wave 2 arrives OUT OF ORDER: doc 2 (lower than every wave-1 id)
    // carries base's exact text and DISPLACES root 10 — the 1/csize
    // weights must not move (labels cancel; membership is unchanged
    // modulo the new member). NULL text rides along (never clusters).
    val w1 = Seq(
      (10L, "web", 100L, base), (11L, "web", 110L, base),
      (12L, "lab", 120L, base), (20L, "web", 90L, variant(1)),
      (30L, "lab", 52L, "nothing like it at all"))
    val w2 = Seq(
      (2L, "web", 95L, base), (2L, "web", 95L, base), // in-batch re-delivery
      (31L, "web", 40L, "also entirely different text"),
      (32L, "lab", 0L, null: String))
    def dfOf(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("doc_id", "source", "n_chars", "text")
    val schema = dfOf(w1).schema
    def drain(): Unit = {
      val q = StreamingCorpus.startSoftDedupGate(spark, landing.getAbsolutePath,
        schema, repPath, forestPath, docsPath, s"$root/chk", nBuckets = 4)
      q.awaitTermination()
    }
    def assertEqBatch(soFar: Seq[(Long, String, Long, String)], tag: String): Unit = {
      val streamed = StreamingCorpus.softDedupLedger(spark, docsPath, forestPath)
      val delivered = dfOf(soFar).dropDuplicates(Seq("doc_id")) // re-delivery is one doc
      val batch = graft.analytics.Dedup.softDedupWeightsOf(
        delivered.select(col("doc_id"), col("source"), col("n_chars")),
        graft.analytics.Dedup.duplicateClusters(
          graft.analytics.Dedup.simhashDupGraphOf(
            delivered.select(col("doc_id"), col("text")))))
      // collected compare: exceptAll over these two plans trips a Spark
      // attribute-binding bug (both sides rebind the shared contraction
      // subtree); sorted-row equality is the same assertion
      val s = streamed.collect().map(_.toString).sorted.toSeq
      val b = batch.collect().map(_.toString).sorted.toSeq
      assert(s == b,
        s"$tag: streamed soft-dedup ledger diverges from batch q159 " +
          s"(streamed=$s batch=$b)")
      // the same gate state serves the q163 decay audit
      val se = StreamingCorpus.effectiveDataLedger(spark, docsPath, forestPath)
        .collect().map(_.toString).sorted.toSeq
      val be = graft.analytics.Dedup.effectiveDataOf(
        delivered.select(col("doc_id"), col("source"), col("n_chars")),
        graft.analytics.Dedup.duplicateClusters(
          graft.analytics.Dedup.simhashDupGraphOf(
            delivered.select(col("doc_id"), col("text")))))
        .collect().map(_.toString).sorted.toSeq
      assert(se == be,
        s"$tag: streamed effective-data ledger diverges from batch q163 " +
          s"(streamed=$se batch=$be)")
      // and the q153 quality-keeper policy — the third duplicate policy
      // served from the one gate state; membership-only, so the
      // displaced root below cannot move its numbers either
      val sk = StreamingCorpus.qualityKeeperLedger(spark, docsPath, forestPath)
        .collect().map(_.toString).sorted.toSeq
      val bk = graft.analytics.Dedup.qualityKeepersOf(
        delivered.select(col("doc_id"), col("source"), col("n_chars")),
        graft.analytics.Dedup.duplicateClusters(
          graft.analytics.Dedup.simhashDupGraphOf(
            delivered.select(col("doc_id"), col("text")))))
        .collect().map(_.toString).sorted.toSeq
      assert(sk == bk,
        s"$tag: streamed quality-keeper ledger diverges from batch q153 " +
          s"(streamed=$sk batch=$bk)")
    }
    land(dfOf(w1), landing, "wave1"); drain(); assertEqBatch(w1, "wave1")
    land(dfOf(w2), landing, "wave2"); drain(); assertEqBatch(w1 ++ w2, "wave2")
    // crash window: replay wave 2 directly against the merged state
    StreamingCorpus.softDedupStep(spark, dfOf(w2), repPath, forestPath,
      docsPath, 99L, nBuckets = 4)
    assertEqBatch(w1 ++ w2, "crash-replay")
    // the displaced root is visible in the forest but invisible in the
    // ledger: weights depend on membership only
    val f = BucketedMerge.read(spark, forestPath)
      .select(col("doc_id"), col("root")).as[(Long, Long)].collect().toMap
    assert(f(10L) == 2L && f(11L) == 2L && f(12L) == 2L,
      "late lower id must displace the exact group root")
  }

  test("semantic-contamination gate: served table equals batch q164 under out-of-order arrival, re-delivery and crash window") {
    import graft.analytics.{Similarity, Tables}
    import org.apache.spark.sql.functions._
    val root = TempDirs.tempDir("graft_ssemcon").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val statePath = s"$root/wh/semcon_state"
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").cache()
    val bench = StreamingCorpus.buildSemanticBench(emb).cache()
    bench.count()
    val w1 = emb.filter(col("vec_id") % 2 === 0)
    val w2 = emb.filter(col("vec_id") % 2 =!= 0)
      .unionByName(w1.orderBy(col("vec_id")).limit(4)) // re-delivery rides wave 2
    def drain(): Unit = {
      val q = StreamingCorpus.startSemanticContaminationGate(spark,
        landing.getAbsolutePath, emb.schema, bench, statePath,
        s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    land(w2, landing, "wave2"); drain() // later ids land first
    land(w1, landing, "wave1"); drain()
    // crash window: replay wave 2 directly against the merged state —
    // the running max must not move
    StreamingCorpus.semanticContaminationStep(spark, w2, bench, statePath,
      nBuckets = 8)
    val streamed = StreamingCorpus.semanticContaminationLedger(spark, bench,
      statePath)
    val batch = Similarity.semanticContamination(spark, d)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed semantic-contamination table diverges from batch q164")
    bench.unpersist(); emb.unpersist()
  }

  test("streamed composed IVF-ADC gate serves batch q165 under out-of-order + replay + crash window") {
    val root = TempDirs.tempDir("graft_sivfadc").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val codesPath = s"$root/wh/ivfadc_codes"
    val cellsPath = s"$root/wh/ivfadc_cells"
    val queriesPath = s"$root/wh/ivfadc_queries"

    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // frozen bundle trained from the snapshot the stream will deliver —
    // the discipline under which the ledger must equal batch q165 EXACTLY
    // (assignment codebook reproduces training-final codes; closing
    // codebook prices the distance tables; cents route)
    val m0 = Similarity.ivfAdcFreeze(all, m = 4, k = 4, iters = 2, nplanes = 3)
    val model = m0.copy(
      assignCodebook = m0.assignCodebook.cache(),
      adcCodebook = m0.adcCodebook.cache(),
      cents = m0.cents.cache())
    model.assignCodebook.count(); model.adcCodebook.count(); model.cents.count()

    // before anything lands: the ledger serves the empty typed table,
    // not a schema-inference error
    assert(StreamingCorpus.ivfAdcLedger(spark, codesPath, cellsPath,
      queriesPath, model).count() == 0L)

    val wave1 = all.filter(col("vec_id") < 250)
    val wave2 = all.filter(col("vec_id") >= 250)
    def drain(): Unit = {
      val q = StreamingCorpus.startIvfAdcIndex(spark, landing.getAbsolutePath,
        all.schema, model, codesPath, cellsPath, queriesPath,
        s"$root/chk", stride = 100, nBuckets = 8)
      q.awaitTermination()
    }
    // out-of-order: the later id range lands first; then a full replay
    // of wave1 (re-delivery)
    land(wave2, landing, "wave2"); drain()
    land(wave1, landing, "wave1"); drain()
    land(wave1, landing, "wave1_replay"); drain()
    // crash window: re-run a drained batch's step directly against the
    // merged state — every merge is key-idempotent, state must not move
    StreamingCorpus.ivfAdcStep(spark, wave2, model, codesPath, cellsPath,
      queriesPath, batchId = 0, stride = 100, nBuckets = 8)

    val served = StreamingCorpus.ivfAdcLedger(spark, codesPath, cellsPath,
      queriesPath, model, topk = 5, nprobe = 4)
    val batch = Similarity.ivfAdcTopKOf(all, m = 4, k = 4, iters = 2,
      topk = 5, stride = 100, nprobe = 4, nplanes = 3)
    assert(served.count() > 0, "composed gate served an empty ranking")
    assert(served.exceptAll(batch).isEmpty && batch.exceptAll(served).isEmpty,
      "streamed composed IVF-ADC ranking diverges from batch q165")
    model.assignCodebook.unpersist()
    model.adcCodebook.unpersist()
    model.cents.unpersist()
  }

  test("streamed int8 index against a frozen codebook serves the batch q170 ranking") {
    import graft.analytics.Quantization
    val root = TempDirs.tempDir("graft_sint8").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val dqPath = s"$root/wh/int8dq"

    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Quantization.int8Codebook(all).cache()
    cb.count()

    // empty-state guard: the ledger serves the empty typed ranking
    assert(StreamingCorpus.int8TopKLedger(spark, dqPath).count() == 0L)

    val wave1 = all.filter(col("vec_id") < 250)
    val wave2 = all.filter(col("vec_id") >= 250)
    def drain(): Unit = {
      val q = StreamingCorpus.startInt8Index(spark, landing.getAbsolutePath,
        all.schema, cb, dqPath, s"$root/chk", nBuckets = 8)
      q.awaitTermination()
    }
    // out-of-order + a full wave replay
    land(wave2, landing, "wave2"); drain()
    land(wave1, landing, "wave1"); drain()
    land(wave1, landing, "wave1_replay"); drain()

    val served = StreamingCorpus.int8TopKLedger(spark, dqPath,
      k = 5, stride = 100)
    // the batch comparator: q170's approximate tier over the same
    // corpus with the codebook frozen from that snapshot
    val batch = Similarity.int8TopKOf(
      Quantization.dequantizedInt8Of(all, cb), k = 5, stride = 100)
    assert(served.count() > 0, "int8 gate served an empty ranking")
    assert(served.exceptAll(batch).isEmpty && batch.exceptAll(served).isEmpty,
      "streamed int8 ranking diverges from the batch q170 tier")
    cb.unpersist()
  }
}

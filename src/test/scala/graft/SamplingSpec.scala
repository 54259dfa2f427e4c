package graft

import graft.analytics.Sampling
import org.scalatest.funsuite.AnyFunSuite

/** Dataset-assembly ops: stable hash-based splitting, length bins,
  * contamination gating. Value-exactness is the driver oracle's job
  * (q64-q66); these assert the semantic invariants. */
class SamplingSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.01"

  test("split is deterministic and close to the declared 80/10/10 fractions") {
    import spark.implicits._
    def splits() = Sampling.datasetSplit(spark, d)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val a = splits()
    assert(a == splits()) // rerun-stable: no RNG state anywhere
    val total = a.values.sum.toDouble
    assert(a.keySet == Set("train", "val", "test"))
    assert(a("train") / total > 0.7 && a("train") / total < 0.9)
    assert(a("val") / total > 0.04 && a("val") / total < 0.16)
    assert(a("test") / total > 0.04 && a("test") / total < 0.16)
  }

  test("length bins partition the corpus exactly") {
    import spark.implicits._
    val bins = Sampling.lengthBins(spark, d)
      .as[(Int, Long, Long, Int, Int)].collect()
    assert(bins.map(_._1).forall(b => b >= 1 && b <= 6))
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(bins.map(_._2).sum == nDocs) // every doc in exactly one bin
    bins.foreach { case (bin, _, _, minT, maxT) =>
      if (bin < 6) assert(maxT <= bin * 16 && minT > (bin - 1) * 16)
    }
  }

  test("sequence packing: contiguous pack ids, token totals conserved") {
    import spark.implicits._
    val packs = Sampling.sequencePacking(spark, d)
      .as[(String, Int, Long, Long)].collect()
    val byLang = packs.groupBy(_._1)
    byLang.foreach { case (lang, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids.head == 0 && ids.toSeq == (0 until ids.length), s"$lang ids: ${ids.toSeq}")
    }
    val totalPacked = packs.map(_._4).sum
    val totalTokens = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("size(split(trim(text), '\\\\s+'))").as[Int].collect().map(_.toLong).sum
    assert(totalPacked == totalTokens) // every token lands in exactly one pack
  }

  test("stratified sample hits roughly the declared rate in every language") {
    import spark.implicits._
    Sampling.stratifiedSample(spark, d)
      .as[(String, Long, Long)].collect().foreach { case (lang, n, sampled) =>
        val rate = sampled.toDouble / n
        assert(rate > 0.02 && rate < 0.25, s"$lang: $sampled/$n") // 10% ± slop at 100-doc strata
      }
  }

  test("contamination excludes self-pairs and is rerun-stable") {
    import spark.implicits._
    def run() = Sampling.contamination(spark, d)
      .as[(String, Long, Long)].collect().toSet
    val r = run()
    assert(r == run())
    assert(r.nonEmpty) // the fixture's shared-vocab docs do collide at 0.8
    // a doc can match at most the full bench set
    val benchSize = spark.read.parquet(s"$d/documents.parquet")
      .filter("doc_id % 97 = 0").count()
    r.foreach { case (_, _, nBench) => assert(nBench <= benchSize) }
  }

  test("contamination plans as a broadcast HASH join on the size bucket, never a nested loop") {
    // round 15: the ratio window rides a log-bucket equi-key (bench rows
    // explode into bucket ± 1), so the size prefilter must never fall
    // back to BroadcastNestedLoopJoin evaluating every (doc, bench) pair
    val plan = Sampling.contamination(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"contamination regressed to a nested-loop join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join on the bucket key:\n$plan")
  }

  test("q80 chunking: coverage, overlap, and bounds invariants") {
    import spark.implicits._
    val chunks = Sampling.chunkDocuments(spark, d) // 128-token chunks, 32 overlap
      .as[(Long, Int, Int, Int, Long)].collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_._1)
    val nTokens = graft.analytics.Tables.documents(spark, d)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim($"text"), "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // contiguous indices from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case ((_, idx, start, len, _), i) =>
        assert(idx == i && start == i * 96, s"doc $doc chunk $i misplaced")
        assert(len >= 1 && len <= 128, s"doc $doc chunk $i len $len")
      }
      // full coverage: last chunk reaches the document's end
      val (_, _, lastStart, lastLen, _) = sorted.last
      assert(lastStart + lastLen == nTokens(doc),
        s"doc $doc: chunks end at ${lastStart + lastLen} of ${nTokens(doc)} tokens")
    }
  }

  test("q81 dedup apply: survivors = corpus minus non-min cluster members") {
    val survivors = Sampling.dedupApply(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clusters = graft.analytics.Dedup.simhashClusters(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val losers = clusters.collect { case (n, c) if n != c => n }.toSet
    val total = graft.analytics.Tables.documents(spark, d).count()
    assert(survivors.intersect(losers).isEmpty, "a cluster loser survived")
    assert(survivors.size == total - losers.size)
    // every cluster still has exactly its min representative present
    clusters.groupBy(_._2).foreach { case (c, members) =>
      assert(survivors.contains(c), s"cluster $c lost its survivor")
      assert(members.map(_._1).min == c, "cluster_id is not the member min")
    }
  }

  test("q86 composite: stage invariants against its own constituent queries") {
    val out = Sampling.trainingPipeline(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    val nDocs = out.map(_._2).sum
    // docs entering chunking = dedup-applied corpus minus exact dups and
    // quality-gate rejects — strictly fewer than the dedup-applied count
    val afterClusters = Sampling.dedupApply(spark, d).count()
    assert(nDocs <= afterClusters, "composite kept more docs than dedupApply")
    assert(nDocs > 0, "quality gate rejected everything — fixture drifted")
    out.foreach { case (split, docs, chunks, toks) =>
      assert(chunks >= docs, s"$split: fewer chunks than docs")
      assert(toks >= docs, s"$split: token total below doc count")
    }
  }

  test("q93: written shards honor the assignment and the within-shard shuffle order") {
    import org.apache.spark.sql.functions._
    val nShards = 8
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val out = TempDirs.tempDir("graft_shards").toString
    Sampling.writeTrainingShards(docs, nShards, out)
    val back = spark.read.parquet(out)
    // nothing lost, nothing duplicated
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // every row sits in its md5-assigned shard
    val misplaced = back.filter(
      Sampling.idBucket(col("doc_id"), nShards.toLong) =!= col("shard")).count()
    assert(misplaced == 0, s"$misplaced rows landed outside their md5 shard")
    // within each shard FILE, physical row order == the md5 shuffle order
    // (read per-file with order-preserving narrow ops only)
    import spark.implicits._
    val files = back.inputFiles
    files.foreach { f =>
      val ords = spark.read.parquet(f)
        .select(md5(col("doc_id").cast("string").cast("binary")))
        .as[String].collect()
      assert(ords.sameElements(ords.sorted),
        s"file $f is not in the deterministic shuffle order")
    }
    // stats agree with a direct recomputation over the written shards
    val stats = Sampling.trainingShardStatsOf(docs, nShards)
    assert(stats.agg(sum(col("n_docs"))).head().getLong(0) == docs.count())
    assert(stats.count() == nShards)
  }

  test("q94: integer-budget fixture gets exact whole-corpus repeats, no residual") {
    import spark.implicits._
    // en = 9 tokens across 3 docs, de = 3 tokens: budget 9 => en repeats
    // once (it IS the budget), de repeats 3x whole — ratios are exact
    // integers so residual thresholds must be exactly zero
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "a b c", "en"), (3L, "a b c", "en"),
      (4L, "x y z", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.repeatFactorMixtureOf(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("en") == ((3L, 9L, 1L, 0L, 9L)), s"en row wrong: $out")
    assert(out("de") == ((1L, 3L, 3L, 0L, 9L)), s"de row wrong: $out")
  }

  test("q94: every language's plan lands within one pass of the shared budget; partition-stable") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val out = Sampling.repeatFactorMixtureOf(docs)
    val budget = out.agg(max(col("lang_tokens"))).head().getLong(0)
    // planned = repeats*T + (residual md5 slice) => within [budget - T, budget + T]
    val off = out.filter(
      col("planned_tokens") < lit(budget) - col("lang_tokens") ||
      col("planned_tokens") > lit(budget) + col("lang_tokens")).count()
    assert(off == 0, "a language's planned tokens strayed more than one corpus pass from budget")
    val re = Sampling.repeatFactorMixtureOf(docs.repartition(7))
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty,
      "repeat plan depends on input partitioning")
  }

  test("urlCanonical: golden forms, idempotence, and variant collapse") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // golden raw -> canonical pairs covering every normalizer rule
    val golden = Seq(
      ("https://WWW.Src0.Example.Com:443/p3", "src0.example.com/p3"),
      ("http://www.src0.example.com/p3#sec", "src0.example.com/p3"),
      ("https://www.src0.example.com/p3?utm_source=feed&utm_campaign=c9",
        "src0.example.com/p3"),
      ("http://www.src0.example.com/p3?ref=r1", "src0.example.com/p3?ref=r1"),
      ("https://www.src0.example.com/p3/", "src0.example.com/p3"),
      // www stripped only as a PREFIX; inner 'www.' untouched
      ("http://www.www2.example.com/p0", "www2.example.com/p0"))
    val out = golden.toDF("raw", "expected")
      .withColumn("got", Sampling.urlCanonical(col("raw")))
    val bad = out.filter(col("got") =!= col("expected"))
      .select("raw", "got", "expected").collect()
    assert(bad.isEmpty, s"canonical mismatches: ${bad.mkString("; ")}")
    // idempotence: canonicalizing a canonical form is the identity —
    // checked over every raw shape the generator emits (doc_id 0..1000
    // spans all mod classes of 2/3/4/5/6/7/11)
    val ids = spark.range(0, 1000)
      .select(col("id").as("doc_id"), lit("s0").as("source"))
    val once = ids.select(
      Sampling.urlCanonical(Sampling.urlRaw(col("doc_id"), col("source"))).as("c1"))
    val fixed = once.filter(Sampling.urlCanonical(col("c1")) =!= col("c1")).count()
    assert(fixed == 0, "urlCanonical must be idempotent on its own output")
    // variant collapse: 1000 raw URLs of one source land on the small
    // closed set of canonical forms — 7 path slots, each bare or with a
    // kept ?ref=r{0,1,2} query (optionally behind a kept inner slash):
    // ≤ 7·(1 + 3 + 3) = 49. Scheme/case/port/utm/fragment/trailing-slash
    // variants must all have collapsed.
    val nCanon = once.distinct().count()
    assert(nCanon <= 49 && nCanon >= 8,
      s"expected collapse to <= 49 canonical URLs per source, got $nCanon")
  }

  test("q148/q149 URL funnel: marginals reconcile, cap rule is q103's verbatim") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val dedup = Sampling.urlDedupStatsOf(docs)
    val caps = Sampling.domainCapStatsOf(docs, cap = 5, blockMod = 7)
    // every document is accounted for: exactly one keeper per canonical
    // URL means kept (= n_docs - n_dup_removed) must equal n_urls per
    // source (URLs embed the source on this corpus, so no cross-source
    // URL collisions can blur the per-source ledger)
    val bad = dedup.filter(
      col("n_docs") - col("n_dup_removed") =!= col("n_urls")).count()
    assert(bad == 0, "per-source kept count must equal distinct-URL count")
    // marginal reconciliation: q149's per-domain survivor count equals
    // q148's per-source kept count through the source->domain mapping
    // (domain = lower(source).example.com — 1:1 on this corpus)
    val fromDedup = dedup.select(
      concat(lower(coalesce(col("source"), lit("nosrc"))),
        lit(".example.com")).as("domain"),
      (col("n_docs") - col("n_dup_removed")).as("expected_urls"))
    val joined = caps.join(fromDedup, Seq("domain"), "full")
    val mismatched = joined.filter(
      col("n_urls").isNull || col("expected_urls").isNull ||
        col("n_urls") =!= col("expected_urls")).count()
    assert(mismatched == 0,
      "q149 per-domain survivors must equal q148 per-source kept docs")
    // cap-rule parity BY RECOMPUTATION: q149's unblocked rows must equal
    // sourceCapStatsOf (the oracle-proven q103 selection) run directly on
    // the survivor set keyed by domain
    val survivors = Sampling.urlSurvivorsOf(docs).filter(col("kept"))
      .withColumn("domain", Sampling.urlDomain(col("url")))
    val blockedDomains = caps.filter(col("blocked"))
      .select(col("domain")).as[String].collect().toSet
    val expected = Sampling.sourceCapStatsOf(
      survivors.filter(!col("domain").isin(blockedDomains.toSeq: _*))
        .select(col("doc_id"), col("domain").as("source"), col("n_chars")), 5)
      .select(col("source").as("domain"), col("n_docs").as("n_urls"),
        col("n_kept"), col("n_dropped"), col("kept_chars"), col("kept_checksum"))
    val got = caps.filter(!col("blocked")).drop("blocked")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "q149 cap stats must be sourceCapStatsOf keyed by domain, verbatim")
    // blocklist determinism + wholesale drop: blocked domains keep nothing
    val blockedRows = caps.filter(col("blocked"))
      .select("n_kept", "kept_chars", "kept_checksum")
      .as[(Long, Long, Long)].collect()
    assert(blockedRows.forall(_ == ((0L, 0L, 0L))))
    // partitioning invariance (the q89 discipline)
    val re = Sampling.domainCapStatsOf(docs.repartition(7), 5, 7)
    assert(caps.exceptAll(re).isEmpty && re.exceptAll(caps).isEmpty,
      "URL funnel depends on input partitioning")
  }
}

package graft

import graft.ingest.Merge
import graft.keys.KeyInference
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based checks from SURVEY §5.2: merge idempotence and
 * order-independence over generated dumps; key-inference totality.
 * Uses raw ScalaCheck generators with fixed seeds (deterministic — the
 * scalatestplus bridge isn't in the offline dependency cache).
 */
class PropertySpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val dumpGen: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 10L)
      v <- Gen.alphaStr.map(_.take(6))
      seq <- Gen.choose(1L, 5L)
    } yield (id, v, seq))
  } yield rows

  test("merge replay order never changes the final table (20 generated dumps)") {
    samples(dumpGen, 20).foreach { rows =>
      // tie-break on value makes duplicate (id, seq) rows deterministic
      val fwd = Merge.dedupLatest(rows.toDF("id", "v", "seq"),
        Seq("id"), "seq", tieBreak = Seq("v"))
      val rev = Merge.dedupLatest(rows.reverse.toDF("id", "v", "seq"),
        Seq("id"), "seq", tieBreak = Seq("v"))
      assert(fwd.orderBy("id").collect().toSeq == rev.orderBy("id").collect().toSeq,
        s"diverged for $rows")
    }
  }

  test("applying the same batch twice is a no-op (10 generated dumps)") {
    samples(dumpGen, 10).foreach { rows =>
      val batch = Merge.dedupLatest(rows.toDF("id", "v", "seq"),
        Seq("id"), "seq", tieBreak = Seq("v"))
      val target = Seq((99L, "base", 0L)).toDF("id", "v", "seq")
      val once = Merge.applyIncremental(target, batch, Seq("id"))
      val twice = Merge.applyIncremental(once, batch, Seq("id"))
      assert(once.orderBy("id", "v").collect().toSeq ==
        twice.orderBy("id", "v").collect().toSeq, s"not idempotent for $rows")
    }
  }

  private val tableNameGen: Gen[String] = for {
    parts <- Gen.choose(1, 4)
    words <- Gen.listOfN(parts, Gen.oneOf("quiz", "question", "answer", "fact",
      "dim", "user", "assignment", "module"))
  } yield words.mkString("_")

  private val colsGen: Gen[Seq[String]] =
    Gen.someOf("id", "user_id", "quiz_id", "quiz_question_id",
      "assignment_id", "module_id", "other").map(_.toSeq)

  test("key inference only ever returns a present column (or None), 200 cases") {
    samples(Gen.zip(tableNameGen, colsGen), 200).foreach { case (table, cols) =>
      KeyInference.idLikeColumn(table, cols) match {
        case Some(k) => assert(cols.contains(k), s"$table inferred absent column $k from $cols")
        case None    => succeed
      }
    }
  }

  test("id column always wins when present, 50 generated table names") {
    samples(tableNameGen, 50).foreach { table =>
      assert(KeyInference.idLikeColumn(table, Seq("id", s"${table}_id")).contains("id"))
    }
  }

  private val docGen: Gen[(Long, Int)] = for {
    id <- Gen.choose(0L, 1000L)
    words <- Gen.choose(1, 400)
  } yield (id, words)

  test("chunking tiles every document: coverage, stride, bounds (40 generated docs)") {
    import org.apache.spark.sql.functions._
    val cases = samples(Gen.listOfN(8, docGen), 5).flatten.distinctBy(_._1)
    val docs = cases.map { case (id, words) =>
      (id, (0 until words).map(w => s"w$w").mkString(" "))
    }.toDF("doc_id", "text")
    val chunkTokens = 32
    val overlap = 8
    val stride = chunkTokens - overlap
    val chunks = graft.analytics.Sampling
      .chunkDocumentsOf(docs, chunkTokens, overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    cases.foreach { case (id, words) =>
      val cs = chunks(id).sortBy(_._2)
      // chunk_idx consecutive from 0; starts advance by exactly the stride
      assert(cs.map(_._2).toSeq == cs.indices.toSeq, s"doc $id: non-consecutive idx")
      cs.foreach { case (_, idx, start, len) =>
        assert(start == idx * stride, s"doc $id chunk $idx: start $start")
        assert(len >= 1 && len <= chunkTokens, s"doc $id chunk $idx: len $len")
        assert(start + len <= words, s"doc $id chunk $idx overruns the document")
      }
      // every token is covered by at least one chunk
      val covered = cs.flatMap { case (_, _, start, len) => start until (start + len) }.toSet
      assert(covered == (0 until words).toSet, s"doc $id: coverage hole")
      // the last chunk reaches the document end
      val (_, _, ls, ll) = cs.last
      assert(ls + ll == words, s"doc $id: tail not covered")
    }
  }

  private val para_corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 25)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 1000L)
      nw <- Gen.choose(0, 30)
      ws <- Gen.listOfN(nw, Gen.oneOf((1 to 12).map(i => s"t$i")))
    } yield (id, ws.mkString(" ")))
  } yield rows.groupBy(_._1).map(_._2.head).toList // unique doc ids

  test("paragraph dedup conserves mass and elects exactly one keeper per hash (12 generated corpora)") {
    import graft.analytics.TextStats
    samples(para_corpusGen, 12).foreach { rows =>
      val docs = rows.toDF("doc_id", "text")
      val out = TextStats.paragraphDedupOf(docs, spanWords = 3)
        .select("doc_id", "n_paragraphs", "n_dropped", "kept_tokens")
        .as[(Long, Long, Long, Long)].collect()
      assert(out.length == rows.length, "one output row per document")
      out.foreach { case (id, np, nd, kt) =>
        assert(np >= 1 && nd >= 0 && nd <= np && kt >= 0,
          s"doc $id: mass violated (np=$np nd=$nd kt=$kt)")
      }
      // global conservation: total occurrences = distinct kept + dropped,
      // i.e. every occurrence is either the one keeper of its hash or dropped
      val occ = TextStats.paragraphOccurrencesOf(docs, 3)
      val total = occ.count()
      val distinctHashes = occ.select("sh").distinct().count()
      val dropped = out.map(_._3).sum
      assert(total == distinctHashes + dropped,
        s"occurrences $total != keepers $distinctHashes + dropped $dropped")
    }
  }

  test("CDC duplicate mass is bounded by corpus word mass at every divisor (10 generated corpora)") {
    import graft.analytics.TextStats
    import org.apache.spark.sql.functions.{col, split, trim, coalesce, lit, size, sum => fsum}
    samples(para_corpusGen, 10).foreach { rows =>
      val docs = rows.toDF("doc_id", "text")
      val words = docs.select(
        coalesce(size(split(trim(coalesce(col("text"), lit(""))), "\\s+")), lit(0))
          .cast("long").as("nw"))
        .agg(fsum(col("nw"))).as[Long].head()
      def dupMass(divisor: Int): Long =
        TextStats.cdcChunkDedupOf(docs, divisor)
          .select((col("n_copies") * col("n_words")).cast("long")).as[Long]
          .collect().sum
      assert(dupMass(16) <= words && dupMass(2) <= words,
        s"duplicate chunk mass exceeds corpus word mass ($words)")
    }
  }

  test("classifier score is the exact model weight sum per document (15 generated corpora)") {
    import graft.analytics.TextStats
    // independent JVM recomputation of the whole q91 contract: hash each
    // token with MessageDigest md5 (not Spark's), fold the trained model
    // into a plain Map, sum, and re-derive the lottery — engine rows must
    // match exactly, including the kept flag and zero-weight buckets
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(w: String, n: Long): Long =
      java.lang.Long.parseLong(md5hex(w).substring(0, 15), 16) % n
    def lottery(id: Long, mod: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % mod
    val vocab = Vector("spark", "scan", "merge", "табло", "xs", "q", "key7", "zz")
    val corpusGen: Gen[List[(Long, String, String, String)]] = for {
      n <- Gen.choose(2, 12)
      rows <- Gen.sequence[List[(Long, String, String, String)], (Long, String, String, String)](
        (1 to n).map { i =>
          for {
            nw <- Gen.choose(1, 9)
            ws <- Gen.listOfN(nw, Gen.oneOf(vocab))
            lang <- Gen.oneOf("en", "de", "zh")
            src <- Gen.oneOf("s0", "s1")
          } yield (i.toLong * 7L, ws.mkString(" "), lang, src)
        }.toList)
    } yield rows
    samples(corpusGen, 15).foreach { rows =>
      val docs = rows.toDF("doc_id", "text", "lang", "source")
      val weights = TextStats.classifierWeights(docs, 64)
      val wMap = weights.collect()
        .map(r => r.getLong(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
      val engine = TextStats.classifierScores(docs, weights, 64, 10).collect()
        .map(r => r.getLong(0) -> ((BigInt(r.getDecimal(2).toBigInteger), r.getBoolean(3))))
        .toMap
      rows.foreach { case (id, text, _, _) =>
        val expected = text.split("\\s+").toSeq
          .map(w => wMap.getOrElse(bucket(w, 64), BigInt(0))).sum
        val expectedKept = expected > 0 || lottery(id, 10) == 0
        assert(engine(id) == ((expected, expectedKept)),
          s"doc $id ('$text'): engine ${engine(id)} != recomputed ($expected, $expectedKept) in $rows")
      }
    }
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 8)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 50L)
      nw <- Gen.choose(0, 12)
      ws <- Gen.listOfN(nw, Gen.oneOf("alpha", "beta", "gamma", "delta",
        "ε", "the", "of", "zz"))
    } yield (id, ws.mkString(" ")))
  } yield rows.distinctBy(_._1)

  test("CMS sketch is mergeable and never underestimates (8 generated corpora)") {
    import graft.analytics.TextStats
    import org.apache.spark.sql.functions.{col, explode, count, lit}
    samples(corpusGen, 8).foreach { rows =>
      def toks(rs: Seq[(Long, String)]) = rs.toDF("doc_id", "text")
        .select(explode(TextStats.words(col("text"))).as("w"))
      val (h1, h2) = rows.splitAt(rows.size / 2)
      val whole = TextStats.cmsSketchOf(toks(rows), 3, 8).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // the mergeability law: sketch(corpus) = cellwise sum of the
      // halves' sketches — the algebra both the map-side combine and the
      // streaming gate's delta table rely on
      val summed = (TextStats.cmsSketchOf(toks(h1), 3, 8).collect() ++
        TextStats.cmsSketchOf(toks(h2), 3, 8).collect())
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(whole == summed, s"sketch not mergeable for $rows")
      // the one-sided error law
      val exact = toks(rows).groupBy(col("w").as("word"))
        .agg(count(lit(1)).as("n_exact"))
      val under = TextStats.cmsEstimatesOf(
        TextStats.cmsSketchOf(toks(rows), 3, 8), exact, 3, 8)
        .filter(col("n_est") < col("n_exact"))
      assert(under.isEmpty, s"CMS underestimated for $rows")
    }
  }

  test("DSIR scoring is per-doc pure against a frozen model (5 generated corpora)") {
    import graft.analytics.TextStats
    import org.apache.spark.sql.functions.col
    samples(corpusGen, 5).foreach { rows =>
      val docs = rows.map { case (id, t) =>
        (id, if (id % 2 == 0) "en" else "xx", s"s${id % 3}", t)
      }.toDF("doc_id", "lang", "source", "text")
      val model = TextStats.dsirModelOf(docs, 32).localCheckpoint(true)
      val full = TextStats.dsirKeyedOf(docs, model, 32).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      // each doc scored ALONE equals its row in the full frame — the
      // purity the streaming gate's batch-≡ rests on
      rows.foreach { case (id, _) =>
        val alone = TextStats.dsirKeyedOf(
          docs.filter(col("doc_id") === id), model, 32).collect()
        assert(alone.length == 1 && alone.head.toSeq.drop(1) == full(id),
          s"doc $id scores differently alone vs in-corpus for $rows")
      }
    }
  }

  test("UniMax closed form equals the iterative greedy, exactly (15 generated corpora)") {
    import graft.analytics.Sampling
    import org.apache.spark.sql.functions.col
    // independent reference: the PUBLISHED algorithm as written — allocate
    // ascending, each language min(cap, remaining budget / remaining langs)
    def greedy(counts: Seq[(String, Long)], epochCap: Double,
        budgetFrac: Double): Map[String, Double] = {
      val b = budgetFrac * counts.map(_._2).sum.toDouble
      val sorted = counts.map { case (l, c) => (l, c, c.toDouble * epochCap) }
        .sortBy { case (l, _, cap) => (cap, l) }
      var remaining = b
      var left = sorted.size
      sorted.map { case (l, _, cap) =>
        val share = remaining / left
        val alloc = math.min(cap, share)
        remaining -= alloc; left -= 1
        l -> alloc
      }.toMap
    }
    val corpusGen: Gen[List[(String, Long)]] = for {
      n <- Gen.choose(1, 8)
      rows <- Gen.listOfN(n, for {
        l <- Gen.choose(0, 11).map(i => s"l$i")
        cv <- Gen.oneOf(Gen.choose(0L, 30L), Gen.choose(1000L, 100000L))
      } yield (l, cv))
    } yield rows.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).sum) }.toList
    samples(corpusGen, 15).foreach { counts =>
      val docs = counts.zipWithIndex.map { case ((l, c), i) =>
        (i.toLong, Seq.fill(c.toInt min 100000)("w").mkString(" "), l, "s", 0L)
      } // cap fixture size; re-derive counts from the actual token lists
      // split("") is [""] — one (empty) token, matching the engine's
      // size(split(trim(text))) convention (q39 precedent)
      val actual0 = docs.map(d => d._3 -> d._2.split("\\s+").length.toLong)
      val actual = actual0.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).sum) }.toSeq
      val p = tempDir("unimax_prop").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$p/documents.parquet")
      val got = Sampling.unimaxAllocation(spark, p)
        .select(col("lang"), col("alloc_tokens")).as[(String, Double)]
        .collect().toMap
      val want = greedy(actual, 3.0, 0.5)
      assert(got.keySet == want.keySet, s"lang sets diverge for $actual")
      want.foreach { case (l, a) =>
        val r6 = BigDecimal(a).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(l) == r6, s"$l: closed form ${got(l)} != greedy $r6 for $actual")
      }
    }
  }
}
package graft

import graft.analytics.{Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operator gates. */
class Round10OpsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  /** The engine's 60-bit md5 word hash (Dedup.mdHash60) in plain JVM
    * scalar form — an INDEPENDENT spelling of the same public definition,
    * so the DSIR pin below does not reuse the expression under test. */
  private def hash60(sv: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)

  private def md5Prefix32(sv: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("q123 DSIR: weight math is decimal-exact against a scalar replay") {
    // small enough to replay every gram by hand, rich enough to cover:
    // target (en) vs raw mass, a NULL-lang doc (raw-only evidence), a
    // NULL-text doc and an empty-text doc (score-0, still in the lottery)
    val docs = Seq(
      (1L, "en", "s0", "alpha beta alpha"),
      (2L, "fr", "s1", "alpha gamma"),
      (3L, null: String, "s0", "beta beta"),
      (4L, "en", "s1", null: String),
      (5L, "fr", null: String, "")).toDF("doc_id", "lang", "source", "text")
    val nB = 256

    // scalar replay of the published definition
    def grams(text: String): Seq[String] = {
      val ws = text.trim.split("\\s+", -1).toSeq
      ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val corpus = Seq(
      (1L, Option("en"), Option("alpha beta alpha")),
      (2L, Option("fr"), Option("alpha gamma")),
      (3L, None, Option("beta beta")),
      (4L, Option("en"), None),
      (5L, Option("fr"), Option("")))
    val stream = corpus.flatMap { case (id, lang, text) =>
      text.toSeq.flatMap(t => grams(t).map(g =>
        (id, lang.contains("en"), math.floorMod(hash60(g), nB.toLong))))
    }
    val tb = stream.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rb = stream.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tTot = tb.values.sum; val rTot = rb.values.sum
    val term: Map[Long, BigDecimal] = rb.keys.map { b =>
      b -> r6(math.log((tb.getOrElse(b, 0L) + 1.0) / (tTot + nB)) -
        math.log((rb(b) + 1.0) / (rTot + nB)))
    }.toMap
    val logw: Map[Long, BigDecimal] = corpus.map { case (id, _, _) =>
      id -> stream.filter(_._1 == id).map(s => term(s._3))
        .foldLeft(BigDecimal(0))(_ + _)
    }.toMap
    def gumbel(id: Long): BigDecimal = {
      val u = (math.floorMod(md5Prefix32(id.toString), 1000000L) + 0.5) / 1000000.0
      r6(-math.log(-math.log(u)))
    }
    val expected = corpus.map { case (id, _, _) =>
      (id, logw(id), logw(id) + gumbel(id))
    }.sortBy { case (id, _, k) => (-k, id) }
      .zipWithIndex.map { case ((id, w, k), i) =>
        (i + 1, id, w.setScale(6).toDouble, k.setScale(6).toDouble)
      }

    val got = TextStats.dsirSelectOf(docs, nBuckets = nB, keepN = 5)
      .select(col("rank"), col("doc_id"), col("logw"), col("sel_key"))
      .as[(Int, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got == expected,
      s"DSIR weight math diverged from the scalar replay:\n got $got\n exp $expected")
  }

  test("q123 DSIR: selection is ∝-weight under the Gumbel key (boundary sanity)") {
    // two clearly separated docs: one pure-target text repeated, one
    // pure-raw — the target-like doc must out-key the raw one by the
    // log-ratio gap (Gumbel noise is bounded here: |g| <= ~2.6 at the
    // md5 lottery's u range, while the engineered gap is > 10)
    val docs = (1L to 40L).map(i =>
      if (i % 2 == 0) (i, "en", "s", "tgtword " * 20)
      else (i, "xx", "s", "rawword " * 20))
      .map { case (i, l, s2, t) => (i, l, s2, t.trim) }
      .toDF("doc_id", "lang", "source", "text")
    val top = TextStats.dsirSelectOf(docs, nBuckets = 256, keepN = 20)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(top.forall(_ % 2 == 0),
      "every selected doc must come from the target-like half")
  }

  test("q121 routed negatives ⊆ label constraint and q122 recall bounds") {
    val routed = Similarity.ivfHardNegatives(spark, d)
    val emb = graft.analytics.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"))
    val joined = routed
      .join(emb.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
    assert(joined.filter(col("ql") === col("nl") || col("ql").isNull ||
      col("nl").isNull).isEmpty,
      "a routed hard negative must carry a known, different label")
    val rec = Similarity.ivfHardNegativeRecallStats(spark, d)
      .select(col("recall")).as[Double].collect()
    assert(rec.nonEmpty && rec.forall(r => r >= 0.0 && r <= 1.0))
    // full-probe routing must reproduce the brute-force miner exactly
    val full = Similarity.ivfHardNegatives(spark, d, nprobe = 8)
    val exact = Similarity.hardNegatives(spark, d)
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty,
      "nprobe = ncells must recover the exact hard-negative ranking")
  }
}

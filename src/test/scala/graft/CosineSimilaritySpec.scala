package graft

import graft.analytics.Similarity
import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen'd cosine vs the higher-order-function formulation:
  * must be bitwise-identical (same order, same formula) so swapping the
  * implementation cannot move oracle results. */
class CosineSimilaritySpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (3L, Array(0.5f, -0.25f, 0.125f), Array(-0.5f, 0.25f, -0.125f)),
    (4L, Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)))
    .toDF("id", "a", "b")

  test("matches the HOF cosine bitwise") {
    val out = vecs.select(
      CosineSimilarity.cosineSim(col("a"), col("b")).as("native"),
      Similarity.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("known values: orthogonal=0, identical=1, opposite=-1") {
    val m = vecs.select(col("id"), CosineSimilarity.cosineSim(col("a"), col("b")))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) == 0.0)
    assert(math.abs(m(2L) - 1.0) < 1e-12)
    assert(math.abs(m(3L) + 1.0) < 1e-12)
  }

  test("mixed float x double (centroid routing shape) matches the HOF cosine bitwise") {
    val out = vecs
      .withColumn("bd", expr("transform(b, x -> cast(x as double))"))
      .select(
        CosineSimilarity.cosineSim(col("a"), col("bd")).as("native"),
        Similarity.cosine(col("a"), col("bd")).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("zero-magnitude input yields NULL, not NaN (SQL division-by-zero parity)") {
    // Spark orders NaN above every double, so a 0/0 cosine would out-rank
    // real similarities and pass >= thresholds that DuckDB's NULL fails —
    // the round-8 hostile sweep caught q87/q92/q96 diverging on this
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f), Array(0.0f, 0.0f)),
      (Array(0.0f, 0.0f), Array(0.0f, 0.0f)))
      .toDF("a", "b")
      .select(CosineSimilarity.cosineSim(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(0)))
  }

  test("null array propagates null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(CosineSimilarity.cosineSim(col("a"), col("b")).as("c"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("participates in codegen (no fallback errors) over a real scan") {
    // drive through the same path bruteForceTopK uses on the fixture
    val topk = Similarity.bruteForceTopK(spark, "/root/testdata/sf0.001", k = 3)
    assert(topk.count() > 0)
  }

  test("native simhash60 == declarative majority vote on the fixture") {
    import graft.analytics.{Dedup, Tables}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .withColumn("whs",
        transform(array_distinct(split(trim(col("text")), "\\s+")), w => Dedup.mdHash60(w)))
    val out = docs.select(
      Dedup.simhashFromHashes(col("whs")).as("native"),
      Dedup.simhashFromHashesDeclarative(col("whs")).as("decl"))
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, d) => assert(n == d) }

    // null-element and empty-array semantics match; a NULL array is the one
    // documented divergence (native propagates NULL, the declarative when()
    // folds the null comparison to 0) — never reachable from the pipeline,
    // where whs comes from transform() over non-null text
    val edge = Seq(
      (1L, Some(Seq(Some(7L), None, Some(7L)))),
      (2L, Some(Seq.empty[Option[Long]])),
      (3L, Option.empty[Seq[Option[Long]]]))
      .toDF("id", "whs")
    val eo = edge.select(col("id"),
      Dedup.simhashFromHashes(col("whs")).as("native"),
      Dedup.simhashFromHashesDeclarative(col("whs")).as("decl")).collect()
    eo.foreach { r =>
      r.getLong(0) match {
        case 3L => assert(r.isNullAt(1) && !r.isNullAt(2) && r.getLong(2) == 0L)
        case _  => assert(!r.isNullAt(1) && r.getLong(1) == r.getLong(2))
      }
    }
  }
}

package graft

import graft.analytics.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native fused hyperplane signature vs the higher-order-function
  * formulation: bitwise-identical signatures (same per-plane element
  * order), so swapping the implementation cannot move oracle results
  * (q37 cells, q38 buckets, q58 bands). */
class HyperplaneSignatureSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("matches the HOF signature on every fixture embedding (float input)") {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val dim = Similarity.embeddingDim(emb)
    for (nplanes <- Seq(3, 8, 16)) {
      val diff = emb.select(
        Similarity.lshBucketCol(col("embedding"), nplanes, dim).as("native"),
        Similarity.lshBucketColHof(col("embedding"), nplanes, dim).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff == 0, s"nplanes=$nplanes: $diff signatures diverge from the HOF form")
    }
  }

  test("matches the HOF signature on double arrays (centroid-typed input)") {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("embd", expr("transform(embedding, x -> cast(x as double))"))
    val dim = Similarity.embeddingDim(emb)
    val diff = emb.select(
      Similarity.lshBucketCol(col("embd"), 8, dim).as("native"),
      Similarity.lshBucketColHof(col("embd"), 8, dim).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"$diff double-array signatures diverge from the HOF form")
  }

  test("null embedding propagates null") {
    import spark.implicits._
    val df = Seq(Option.empty[Array[Float]]).toDF("e")
      .select(graft.functions.HyperplaneSignature.signature(
        col("e"), Similarity.coefMatrix(4, 3)).as("sig"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("ragged rows match the HOF form: signature 0, never a partial projection") {
    import spark.implicits._
    // zip_with pads the short side with nulls → null projection → bit 0
    // on every plane; the native loop must not partial-sum instead
    val dim = 8
    val rows = Seq(
      Array.fill(dim - 1)(0.5f),      // shorter than the planes
      Array.fill(dim + 3)(-0.25f),    // longer
      Array.empty[Float])             // empty
    val df = rows.toDF("e").select(
      Similarity.lshBucketCol(col("e"), 4, dim).as("native"),
      Similarity.lshBucketColHof(col("e"), 4, dim).as("hof"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"ragged-row divergence: native ${r.getLong(0)} vs hof ${r.getLong(1)}")
      assert(r.getLong(0) == 0L, "ragged row must land in bucket 0 (all bits clear)")
    }
  }

  test("native minhash signature matches the HOF form on every fixture doc") {
    import graft.analytics.Dedup
    val docs = graft.analytics.Tables.documents(spark, d)
      .select(col("doc_id"),
        transform(Dedup.ngramsFromWords(split(trim(col("text")), "\\s+")),
          g => Dedup.shingleHash(g)).as("nh"))
    val diff = docs.select(
      Dedup.minhashSignature(col("nh"), 16).as("native"),
      Dedup.minhashSignatureHof(col("nh"), 16).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"$diff minhash signatures diverge from the HOF form")
  }

  test("native minhash signature: empty hash array yields all-null minima") {
    import spark.implicits._
    val out = Seq(Seq.empty[Long], Seq(7L)).toDF("nh")
      .select(graft.analytics.Dedup.minhashSignature(col("nh"), 4).as("sig"))
      .collect()
    val empty = out(0).getSeq[Any](0)
    assert(empty.length == 4 && empty.forall(_ == null),
      s"empty input must give per-permutation nulls like array_min: $empty")
    assert(out(1).getSeq[Any](0).forall(_ != null))
  }
}

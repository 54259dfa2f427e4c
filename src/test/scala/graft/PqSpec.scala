package graft

import graft.analytics.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q102 product quantization: hand-replayed Lloyd rounds per subspace,
  * hostile-input argmin semantics, and the broadcast/no-cartesian plan
  * shape the 100 TB posture rests on. */
class PqSpec extends AnyFunSuite with SparkSuite {

  test("q102 PQ: two subspaces converge to the hand-computed codebooks") {
    import spark.implicits._
    // dim 4, m=2 (dsub=2), k=2, iters=2. Subspace 0 separates {0,1} from
    // {2,3}; subspace 1 the reverse. Hand-replay:
    //  sub0 it1 cents: code0=mean(v0,v2)=[4,4], code1=mean(v1,v3)=[5,5]
    //        assigns:  v0,v1 -> 0 ; v2,v3 -> 1
    //       it2 cents: code0=[0.5,0.5], code1=[8.5,8.5]; dist 0.5 each
    //  sub1 symmetric with codes swapped.
    val emb = Seq(
      (0L, Array(0f, 0f, 10f, 10f)),
      (1L, Array(1f, 1f, 11f, 11f)),
      (2L, Array(8f, 8f, 0f, 0f)),
      (3L, Array(9f, 9f, 1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.pqStatsOf(emb, m = 2, k = 2, iters = 2)
      .orderBy("sub", "code")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 1.0, 1L),
      (0L, 1L, 2L, 1.0, 5L),
      (1L, 0L, 2L, 1.0, 5L),
      (1L, 1L, 2L, 1.0, 1L)))
  }

  test("q102 PQ: NULL embedding takes the lowest code with NULL distortion excluded") {
    import spark.implicits._
    val emb = Seq(
      (0L, Some(Array(1f, 1f))),
      (1L, Option.empty[Array[Float]])).toDF("vec_id", "embedding")
    // m=1, k=2: init 0->code0, 1->code1; code1's member is the NULL vector
    // so it never forms a centroid; the NULL row then argmin-ties onto the
    // only candidate (code 0) via the sentinel key, distortion skips it.
    val out = Similarity.pqStatsOf(emb, m = 1, k = 2, iters = 1)
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 2L, 0.0, 1L)))
  }

  test("q102 PQ: zero vectors quantize like any other point (no NULL branch in L2)") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0f, 0f)),
      (2L, Array(0f, 0f)),
      (1L, Array(6f, 6f)),
      (3L, Array(6f, 6f))).toDF("vec_id", "embedding")
    // init: {0,2}->code0 (the zero pair), {1,3}->code1; both clusters are
    // already exact so distortion is 0 and membership is stable.
    val out = Similarity.pqStatsOf(emb, m = 1, k = 2, iters = 2)
      .orderBy("code")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 2L, 0.0, 2L), (0L, 1L, 2L, 0.0, 4L)))
  }

  test("q106 ADC: hand-computed table distances on the two-subspace fixture") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0f, 0f, 10f, 10f)),
      (1L, Array(1f, 1f, 11f, 11f)),
      (2L, Array(8f, 8f, 0f, 0f)),
      (3L, Array(9f, 9f, 1f, 1f))).toDF("vec_id", "embedding")
    // codes from the q102 test; closing codebook: sub0 {c0=[.5,.5],
    // c1=[8.5,8.5]}, sub1 {c0=[.5,.5], c1=[10.5,10.5]}. Query = vec 0:
    //   v1: 0.5 + 0.5 = 1.0 ; v2 = v3: 144.5 + 180.5 = 325.0 (id tie-break)
    val out = Similarity.pqAdcTopKOf(emb, m = 2, k = 2, iters = 2,
        topk = 3, stride = 4)
      .orderBy("query_id", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out == Seq(
      (0L, 1L, 1.0, 1), (0L, 2L, 325.0, 2), (0L, 3L, 325.0, 3)))
  }

  test("q106 ADC exactness envelope: m=1, k=n reproduces brute-force L2 order") {
    import spark.implicits._
    val vecs = Seq(
      0L -> Array(0f, 0f), 1L -> Array(3f, 0f), 2L -> Array(0f, 5f),
      3L -> Array(6f, 6f), 4L -> Array(1f, 1f))
    val emb = vecs.toDF("vec_id", "embedding")
    // one code per vector -> centroids are the vectors themselves -> ADC
    // distances are EXACT squared L2 (the PQ error bound at k=n is zero)
    val out = Similarity.pqAdcTopKOf(emb, m = 1, k = 5, iters = 1,
        topk = 4, stride = 3)
      .orderBy("query_id", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum.toDouble
    for (q <- Seq(0L, 3L)) {
      val qv = vecs.find(_._1 == q).get._2
      val expect = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, d2(v, qv)) }
        .sortBy { case (id, dist) => (dist, id) }
      assert(out.filter(_._1 == q).map(r => (r._2, r._3)) == expect)
    }
  }

  test("q106 ADC: NULL-embedding vectors are neither corpus nor query") {
    import spark.implicits._
    val emb = Seq(
      (0L, Some(Array(0f, 0f))),
      (1L, Some(Array(1f, 0f))),
      (2L, Option.empty[Array[Float]])).toDF("vec_id", "embedding")
    val out = Similarity.pqAdcTopKOf(emb, m = 1, k = 2, iters = 1,
        topk = 5, stride = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.forall(r => r._1 != 2L && r._2 != 2L),
      "a sentinel-coded NULL vector must not fabricate neighbors")
    assert(out.map(_._1).distinct.sorted == Seq(0L, 1L))
  }

  test("q107 recall audit: exact PQ (m=1, k=n) scores recall 1.0; zero-overlap reports 0") {
    import spark.implicits._
    val vecs = Seq(
      0L -> Array(0f, 0f), 1L -> Array(3f, 0f), 2L -> Array(0f, 5f),
      3L -> Array(6f, 6f), 4L -> Array(1f, 1f))
    val emb = vecs.toDF("vec_id", "embedding")
    val out = Similarity.pqRecallStatsOf(emb, m = 1, k = 5, iters = 1,
        topk = 4, stride = 3)
      .orderBy("query_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 4L, 1.0), (3L, 4L, 1.0)),
      "k=n codebooks make ADC exact, so recall must be 1.0 per query")
  }

  test("sample-trained PQ (trainSampleMod > 1) still codes every vector with m codes") {
    import spark.implicits._
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pqStatsOf(emb, m = 4, k = 4, iters = 2,
      trainSampleMod = 4)
    val total = out.agg(sum("n_members")).head().getLong(0)
    assert(total == 64L * 4, "every vector must appear once per subspace")
    // sampled codebooks change assignments, never the bookkeeping: the
    // id checksum over all codes per subspace is conserved
    val perSub = out.groupBy("sub").agg(sum("id_checksum").as("s"))
      .select("s").as[Long].collect().toSet
    assert(perSub == Set((0L until 64L).sum))
  }

  test("q102 PQ plan: centroid joins broadcast, no cartesian product") {
    import spark.implicits._
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val df = Similarity.pqStatsOf(emb, m = 4, k = 4, iters = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "PQ assignment must be a broadcast equi-join on sub, never all-pairs")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "m*k centroids must broadcast to the corpus side")
  }
}

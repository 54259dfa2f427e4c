package graft

import graft.ingest.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge semantics (op I-3): last-writer-wins, idempotent, order-independent
  * — the properties SURVEY §5.2 requires. */
class MergeSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def rows(t: (Long, String, Long)*) = t.toSeq.toDF("id", "v", "seq")

  test("dedupLatest keeps the newest row per key") {
    val batch = rows((1L, "old", 1L), (1L, "new", 2L), (2L, "only", 1L))
    val out = Merge.dedupLatest(batch, Seq("id"), "seq")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "new"), (2L, "only")))
  }

  test("dedupLatest is order-independent across dumps") {
    val d1 = rows((1L, "a", 1L), (2L, "b", 1L))
    val d2 = rows((1L, "a2", 2L))
    val fwd = Merge.dedupLatest(d1.union(d2), Seq("id"), "seq")
    val rev = Merge.dedupLatest(d2.union(d1), Seq("id"), "seq")
    assert(fwd.orderBy("id").collect().toSeq == rev.orderBy("id").collect().toSeq)
  }

  test("applyIncremental replaces matched PKs and appends new ones") {
    val target = rows((1L, "t1", 1L), (2L, "t2", 1L), (3L, "t3", 1L))
    val batch = rows((2L, "b2", 2L), (4L, "b4", 2L))
    val out = Merge.applyIncremental(target, batch, Seq("id"))
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "t1"), (2L, "b2"), (3L, "t3"), (4L, "b4")))
  }

  test("applyIncremental is idempotent (rerun same batch)") {
    val target = rows((1L, "t1", 1L), (2L, "t2", 1L))
    val batch = rows((2L, "b2", 2L))
    val once = Merge.applyIncremental(target, batch, Seq("id"))
    val twice = Merge.applyIncremental(once, batch, Seq("id"))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("NULL non-key values survive the merge") {
    val target = Seq((1L, Option("x"))).toDF("id", "v").withColumn("seq", lit(1L))
    val batch = Seq((1L, Option.empty[String])).toDF("id", "v").withColumn("seq", lit(2L))
    val out = Merge.applyIncremental(target, Merge.dedupLatest(batch, Seq("id"), "seq"), Seq("id"))
    assert(out.select("v").as[Option[String]].collect().toSeq == Seq(None))
  }

  test("applyIncrementalSeq: replaying an older batch cannot regress newer rows") {
    val target = rows((1L, "new", 5L), (2L, "kept", 5L))
    val stale = rows((1L, "old", 3L), (3L, "late-backfill", 3L))
    val out = Merge.applyIncrementalSeq(target, stale, Seq("id"), "seq")
      .select("id", "v").as[(Long, String)].collect().toSet
    // id=1 keeps the NEWER target value; id=3 (genuinely new key) lands
    assert(out == Set((1L, "new"), (2L, "kept"), (3L, "late-backfill")))

    // equal sequence (same dump replayed, possibly re-downloaded) → batch wins
    val replay = rows((1L, "new-rewrite", 5L))
    val out2 = Merge.applyIncrementalSeq(target, replay, Seq("id"), "seq")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(out2 == Set((1L, "new-rewrite"), (2L, "kept")))

    // order-independence across runs: d1-then-d2 == d2-then-d1
    val d1 = rows((1L, "v1", 1L), (2L, "v1", 1L))
    val d2 = rows((1L, "v2", 2L))
    val ab = Merge.applyIncrementalSeq(Merge.applyIncrementalSeq(rows(), d1, Seq("id"), "seq"),
      d2, Seq("id"), "seq").select("id", "v").as[(Long, String)].collect().toSet
    val ba = Merge.applyIncrementalSeq(Merge.applyIncrementalSeq(rows(), d2, Seq("id"), "seq"),
      d1, Seq("id"), "seq").select("id", "v").as[(Long, String)].collect().toSet
    assert(ab == ba && ab == Set((1L, "v2"), (2L, "v1")))
  }

  test("dedupLatest with duplicate PKs inside one dump uses tie-break") {
    val batch = rows((1L, "first", 1L), (1L, "second", 1L))
      .withColumn("line", when(col("v") === "first", 1L).otherwise(2L))
    val out = Merge.dedupLatest(batch, Seq("id"), "seq", tieBreak = Seq("line"))
    assert(out.select("v").as[String].collect().toSeq == Seq("second"))
  }
}

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
}

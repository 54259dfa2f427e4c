package graft

import java.sql.Timestamp

import graft.operators.{AsOfJoin, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin and Skew utilities over hand-checkable fixtures. */
class OperatorsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest right row at-or-before left ts, null when none") {
    val orders = Seq(
      (7L, ts("2024-01-01 00:00:00"), 100L),
      (7L, ts("2024-01-10 00:00:00"), 101L),
      (8L, ts("2024-01-05 00:00:00"), 200L))
      .toDF("user_id", "odate", "okey")
    val events = Seq(
      (1L, 7L, ts("2024-01-02 12:00:00")), // after order 100, before 101
      (2L, 7L, ts("2024-01-10 00:00:00")), // exactly at order 101 → matches (>=)
      (3L, 8L, ts("2024-01-04 00:00:00")), // before any order of user 8 → null
      (4L, 9L, ts("2024-01-04 00:00:00"))) // user with no orders → null
      .toDF("event_id", "user_id", "ets")
    val out = AsOfJoin.asof(events, orders, "user_id", "ets", "odate", Seq("okey"))
      .select("event_id", "okey").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("asof join: NULL keys/timestamps never match (SQL join semantics)") {
    // the window formulation would otherwise group NULL-key rows from both
    // sides into one partition and "match" them — hostile-sweep find
    val orders = Seq(
      (Option(7L), Option(ts("2024-01-01 00:00:00")), 100L),
      (Option.empty[Long], Option(ts("2024-01-01 00:00:00")), 300L), // null key: unmatchable
      (Option(7L), Option.empty[Timestamp], 301L))                   // null ts: unmatchable
      .toDF("user_id", "odate", "okey")
    val events = Seq(
      (1L, Option(7L), Option(ts("2024-01-02 00:00:00"))), // matches 100, never 301
      (2L, Option.empty[Long], Option(ts("2024-01-02 00:00:00"))), // null key → no match
      (3L, Option(7L), Option.empty[Timestamp]))                   // null ts → no match
      .toDF("event_id", "user_id", "ets")
    val out = AsOfJoin.asof(events, orders, "user_id", "ets", "odate", Seq("okey"))
      .select("event_id", "okey").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> None, 3L -> None))
  }

  test("latestPerKeyTs dedups equal timestamps by tie-break") {
    val r = Seq((7L, ts("2024-01-01 00:00:00"), 1L), (7L, ts("2024-01-01 00:00:00"), 9L))
      .toDF("k", "t", "v")
    val out = AsOfJoin.latestPerKeyTs(r, "k", "t", "v").select("v").as[Long].collect().toSeq
    assert(out == Seq(9L))
  }

  test("salted join equals plain join") {
    val big = (1 to 1000).map(i => (i.toLong % 7, i.toLong)).toDF("k", "uid")
    val small = Seq((0L, "a"), (1L, "b"), (6L, "c")).toDF("k", "v")
    val plain = big.join(small, "k").select("k", "uid", "v")
    val salted = Skew.saltedJoin(big, small, "k", "uid", factor = 4).select("k", "uid", "v")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted two-phase aggregation equals plain groupBy") {
    val df = (1 to 500).map(i => (i.toLong % 5, i.toDouble, i.toLong)).toDF("k", "v", "uid")
    val plain = df.groupBy($"k").agg(sum($"v").as("sum_v"), count(lit(1)).as("n_rows"))
    val salted = Skew.saltedSumCount(df, "k", "v", "uid", factor = 4)
      .withColumnRenamed("sum_v", "sum_v")
    val p = plain.orderBy("k").as[(Long, Double, Long)].collect().toSeq
    val s2 = salted.orderBy("k").as[(Long, Double, Long)].collect().toSeq
    assert(p == s2)
  }
}

package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structured Streaming smoke tests: the same transforms used by the batch
 * oracle queries (q24/q25) run as a file-source stream into a memory sink
 * (SURVEY §2 streaming row; spark guide pattern).
 */
class EventStreamSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val eventsDir: String = {
    val dir = TempDirs.tempDir("graft_stream").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, """{"k": 1}"""),
      (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0, """{"k": 2}"""),
      (3L, ts("2024-01-01 10:59:00"), 8L, "view", 3.0, """{"k": 3}"""),
      (4L, ts("2024-01-01 12:30:00"), 7L, "click", 4.0, """{"k": 4}"""), // new session for 7
      (5L, ts("2024-01-01 12:40:00"), 8L, "view", 5.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("hourly tumbling counts over a file stream") {
    val out = runToMemory(
      EventStream.hourlyCounts(EventStream.readStream(spark, eventsDir)),
      "hourly", mode = "append")
    // append mode emits only watermark-closed windows; with a single batch
    // the final windows stay open, so check via complete-mode aggregation
    val complete = runToMemory(
      EventStream.hourlyCounts(EventStream.readStream(spark, eventsDir)),
      "hourly_c", mode = "complete")
    val m = complete.select("bucket", "event_type", "n_events")
      .as[(Timestamp, String, Long)].collect()
      .map { case (b, t, n) => (b.toString, t) -> n }.toMap
    assert(m(("2024-01-01 10:00:00.0", "click")) == 2L)
    assert(m(("2024-01-01 10:00:00.0", "view")) == 1L)
    assert(m(("2024-01-01 12:00:00.0", "click")) == 1L)
    assert(out.columns.toSeq ==
      Seq("bucket", "event_type", "n_events", "value_sum"))
  }

  test("session windows with 1h gap split user 7 into two sessions") {
    val out = runToMemory(
      EventStream.sessions(EventStream.readStream(spark, eventsDir)),
      "sessions", mode = "complete")
    val sessions7 = out.filter($"user_id" === 7L)
      .select("session_start", "n_events").as[(Timestamp, Long)].collect().toSet
    assert(sessions7 == Set(
      (ts("2024-01-01 10:00:00"), 2L),
      (ts("2024-01-01 12:30:00"), 1L)))
  }

  test("mapGroupsWithState accumulates running per-user stats across batches") {
    val q = EventStream.runningUserStats(EventStream.readStream(spark, eventsDir))
      .writeStream.outputMode("update").format("memory").queryName("ustats").start()
    q.processAllAvailable()
    q.stop()
    // last update per user reflects the full accumulated state
    val last = spark.table("ustats")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"n_events").as("n"),
        org.apache.spark.sql.functions.max($"total_value").as("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(last(7L) == ((3L, 7.0))) // events 1,2,4: values 1+2+4
    assert(last(8L) == ((2L, 8.0))) // events 3,5: values 3+5
  }

  test("flatMapGroupsWithState emits each closed session exactly once") {
    // user 7's burst closes TWO sessions in one batch (the case that
    // forces the flatMap variant); the far-future flush event pushes the
    // watermark so the last open sessions close by EventTimeTimeout
    val dir = TempDirs.tempDir("graft_closed_sessions").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 12:30:00"), 7L, "click", 4.0, "{}"), // gap > 1h
      (4L, ts("2024-01-01 15:00:00"), 7L, "click", 8.0, "{}"), // gap > 1h
      (5L, ts("2024-01-01 10:59:00"), 8L, "view", 3.0, "{}"),
      (6L, ts("2024-01-02 23:00:00"), 9L, "flush", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val out = runToMemory(
      EventStream.closedSessions(EventStream.readStream(spark, dir)).toDF(),
      "closed_sessions", mode = "append")
      .select("user_id", "session_start", "n_events", "value_sum")
      .as[(Long, Timestamp, Long, Double)].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4))).toMap
    // user 7: sessions (10:00-10:10), (12:30), (15:00) — first two close
    // by the 15:00 arrival in the same batch, the third by timeout
    assert(out((7L, "2024-01-01 10:00:00.0")) == ((2L, 3.0)))
    assert(out((7L, "2024-01-01 12:30:00.0")) == ((1L, 4.0)))
    assert(out((7L, "2024-01-01 15:00:00.0")) == ((1L, 8.0)))
    assert(out((8L, "2024-01-01 10:59:00.0")) == ((1L, 3.0)))
    // exactly-once and no spurious rows: user 9's flush session is still
    // OPEN (its timeout is beyond the watermark) so exactly 4 closed
    assert(out.size == 4, s"expected 4 closed sessions, got ${out.keySet}")
  }

  test("streaming dedup drops replayed event ids") {
    val out = runToMemory(
      EventStream.dedupEvents(EventStream.readStream(spark, eventsDir)
        .union(EventStream.readStream(spark, eventsDir))),
      "dedup", mode = "append")
    assert(out.count() == 5)
  }

  test("q113 cohort retention: hand-computed matrix over hour buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ts(h: Long, m: Long) = new Timestamp((h * 3600 + m * 60) * 1000L)
    // u1: cohort H0, active H0 and H1; u2: cohort H0 only;
    // u3: cohort H1, active H1 and H3 (two events in H1 dedup to one)
    val ev = Seq(
      (1L, ts(0, 5)), (1L, ts(1, 10)),
      (2L, ts(0, 40)),
      (3L, ts(1, 1)), (3L, ts(1, 59)), (3L, ts(3, 0)))
      .toDF("user_id", "ts")
    // reuse the engine path via a temp parquet dir shaped like events
    val dir = tempDir("graft_cohort").resolve("events.parquet")
    ev.select(col("user_id"), col("ts"),
        org.apache.spark.sql.functions.lit("e").as("event_type"),
        org.apache.spark.sql.functions.lit(0.0).as("value"),
        org.apache.spark.sql.functions.lit("{}").as("props"),
        org.apache.spark.sql.functions.monotonically_increasing_id().as("event_id"))
      .write.parquet(dir.toString)
    val out = graft.analytics.Relational.cohortRetention(spark, dir.getParent.toString)
      .orderBy("cohort_h", "offset_h")
      .select("offset_h", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 1.0),  // cohort H0, offset 0: u1 + u2
      (1L, 1L, 2L, 0.5),  // cohort H0, offset 1: u1
      (0L, 1L, 1L, 1.0),  // cohort H1, offset 0: u3
      (2L, 1L, 1L, 1.0))) // cohort H1, offset 2: u3 at H3
  }

  test("q109 funnel: strict ordering, per-step conversion, null users drop at the join") {
    import spark.implicits._
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: full ordered funnel (0 -> 10 -> 30);
    // user 2: purchase BEFORE click (view 0, purchase 5, click 20) — the
    //   strict funnel must NOT count the early purchase;
    // user 3: click only (no view) — never enters;
    // null user: view only — counted at step 1, dropped by the join after
    val ev = Seq(
      (Some(1L), "view", ts(0)), (Some(1L), "click", ts(10)), (Some(1L), "purchase", ts(30)),
      (Some(2L), "view", ts(0)), (Some(2L), "purchase", ts(5)), (Some(2L), "click", ts(20)),
      (Some(3L), "click", ts(1)),
      (Option.empty[Long], "view", ts(2)))
      .toDF("user_id", "event_type", "ts")
    val out = graft.analytics.Relational.eventFunnelOf(ev, Seq("view", "click", "purchase"))
      .orderBy("step")
      .as[(String, Long, Double, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("1_view", 3L, 1.0, Some(0.0)),          // users 1, 2, null
      ("2_click", 2L, 0.666667, Some(15.0)),   // 1 (+10s), 2 (+20s)
      ("3_purchase", 1L, 0.333333, Some(30.0)) // only user 1's ordered path
    ))
  }
}

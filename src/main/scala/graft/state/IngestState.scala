package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Processed-dump state machine, replacing the reference's RocksDB KV
 * (`/root/reference/src/main.rs:76, 118-147, 163-246`; SURVEY §2 ST-1/ST-2).
 *
 * Keys: `dump_processed_{id}` ∈ {in_progress, successful, failure,
 * out-of-date} and `last_version_processed` → schema version string. We keep
 * the same state machine over a small parquet-backed KV directory: one write
 * per transition (tiny single-row appends, compacted on read by
 * last-writer-wins). At scale this would live in a transactional table; the
 * interface is the contract.
 */
final class IngestState(spark: SparkSession, dir: String) {

  import IngestState._

  private def path = s"$dir/state.parquet"

  private def readAll(): DataFrame = {
    import spark.implicits._
    val exists =
      try spark.read.parquet(path).count() >= 0
      catch { case _: Throwable => false }
    if (exists) spark.read.parquet(path)
    else Seq.empty[(String, String, Long)].toDF("key", "value", "seq")
  }

  /** Latest value per key (last writer wins by monotonic seq). */
  def snapshot(): Map[String, String] = {
    val df = readAll()
    df.groupBy(col("key"))
      .agg(max_by(col("value"), col("seq")).as("value"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
  }

  def get(key: String): Option[String] = snapshot().get(key)

  def put(key: String, value: String): Unit = {
    import spark.implicits._
    val seq = readAll().agg(coalesce(max(col("seq")), lit(0L))).collect()(0).getLong(0) + 1L
    Seq((key, value, seq)).toDF("key", "value", "seq")
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
  }

  def dumpStatus(dumpId: String): Option[String] = get(s"dump_processed_$dumpId")
  def setDumpStatus(dumpId: String, status: String): Unit = {
    require(Statuses.contains(status), s"illegal status $status")
    put(s"dump_processed_$dumpId", status)
  }

  def lastVersionProcessed: Option[String] = get(LastVersionKey)
  def setLastVersionProcessed(v: String): Unit = put(LastVersionKey, v)

  /** The skip predicate of op F-2 (`main.rs:118-138`). */
  def alreadyProcessed(dumpId: String): Boolean =
    dumpStatus(dumpId).exists(s => s == Successful || s == OutOfDate)
}

object IngestState {
  val InProgress = "in_progress"
  val Successful = "successful"
  val Failure    = "failure"
  val OutOfDate  = "out-of-date"
  val Statuses: Set[String] = Set(InProgress, Successful, Failure, OutOfDate)
  val LastVersionKey = "last_version_processed"
}

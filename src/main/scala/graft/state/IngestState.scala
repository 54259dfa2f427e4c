package graft.state

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Processed-dump state machine, replacing the reference's RocksDB KV
 * (`/root/reference/src/main.rs:76, 118-147, 163-246`; SURVEY §2 ST-1/ST-2).
 *
 * Keys: `dump_processed_{id}` ∈ {in_progress, successful, failure,
 * out-of-date} and `last_version_processed` → schema version string, over a
 * small parquet-backed KV directory with last-writer-wins semantics.
 *
 * Write path: each transition appends ONE tiny parquet part with a
 * monotonic sequence from a wall-clock-seeded in-JVM counter — no
 * read-the-world to compute max(seq)+1 (the round-1 design cost an O(n)
 * Spark job per transition). When the directory accumulates more than
 * `CompactThreshold` parts, it is compacted to a single latest-per-key file
 * via staging + rename, so file count stays bounded at hourly-cron cadence.
 * At scale this would live in a transactional table; the interface is the
 * contract.
 */
final class IngestState(spark: SparkSession, dir: String) {

  import IngestState._

  private def path = s"$dir/state.parquet"

  private val seqCounter = new AtomicLong(0L)

  /** Strictly monotonic within this JVM; wall-clock-seeded so sequences
    * from successive loader runs stay ordered (same guarantee class as the
    * reference's RocksDB write order at its hourly cadence). */
  private def nextSeq(): Long =
    seqCounter.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis() * 1000L))

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def readAll(): DataFrame = {
    import spark.implicits._
    if (fs.exists(new Path(path))) spark.read.parquet(path)
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
    Seq((key, value, nextSeq())).toDF("key", "value", "seq")
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
    maybeCompact()
  }

  private def partCount(): Int =
    fs.listStatus(new Path(path)).count(_.getPath.getName.endsWith(".parquet"))

  /** Fold the append log down to one latest-per-key file once it exceeds
    * the threshold. Crash-safe at every step: the compacted part is MOVED
    * INTO the live directory before the old parts are deleted, so a crash
    * leaves either extra duplicate rows (harmless — `max_by(seq)` resolves
    * them to the same values) or a partially-deleted old set (a subset of
    * what the compacted part already holds); state is never lost or
    * half-visible, unlike a delete-then-rename of the whole directory. */
  private def maybeCompact(threshold: Int = CompactThreshold): Unit =
    if (partCount() > threshold) {
      val oldParts = fs.listStatus(new Path(path))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      val latest = readAll()
        .groupBy(col("key"))
        .agg(max_by(col("value"), col("seq")).as("value"), max(col("seq")).as("seq"))
      val tmp = s"$path.__compact"
      latest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val compacted = fs.listStatus(new Path(tmp))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      compacted.zipWithIndex.foreach { case (src, i) =>
        fs.rename(src, new Path(path, s"compacted-${nextSeq()}-$i.parquet"))
      }
      oldParts.foreach(fs.delete(_, false))
      fs.delete(new Path(tmp), true)
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
  val CompactThreshold = 16
}

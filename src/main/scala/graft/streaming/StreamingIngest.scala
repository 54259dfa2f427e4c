package graft.streaming

import graft.ingest.{BucketedMerge, Merge, TsvReader}
import graft.keys.KeyInference
import graft.schema.TableDefinition
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Continuous loader: the Structured-Streaming modernization of the
 * reference's hourly cron (`README:31-33` — "run it on a schedule").
 * A file-source stream watches a landing directory for new gzipped TSV
 * artifacts of one table and applies the batch path's semantics per
 * micro-batch: all-strings scan with the SAME option block as the batch
 * reader (FAILFAST included — a malformed line aborts the micro-batch, op
 * X-3, it is never silently nulled) → one cast ([[TsvReader.cast]]) →
 * keep-latest dedup ([[Merge.dedupLatest]]) → sequence-aware bucket-pruned
 * merge ([[BucketedMerge.mergeInto]]). Exactly-once per file via the
 * streaming source's checkpointed file log; the merge is idempotent, so
 * retried micro-batches are safe.
 *
 * Ordering: each row's `_dump_seq` is the micro-batch id, with the source
 * file name as the in-batch tie-break — so when a catch-up batch drains
 * several artifacts at once, later file names win deterministically
 * (landing layouts should use sortable names, as Canvas shard names are).
 * Re-delivering an old artifact under a NEW name is indistinguishable from
 * new data (it gets a fresh batch id and wins) — at-least-once landing
 * hygiene is the deployment contract, same as the reference's
 * download-once layout.
 *
 * 100 TB posture: each micro-batch does one shuffle of the batch (dedup)
 * and touches only the affected target buckets; the landing listing is the
 * only growing state and is bounded by the source option `maxFileAge`.
 */
object StreamingIngest {

  /** Start the continuous load of `table` from `landingDir` into
    * `targetPath`. Caller owns the returned query's lifecycle. */
  def start(
      spark: SparkSession,
      landingDir: String,
      table: TableDefinition,
      targetPath: String,
      checkpointDir: String,
      nBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val target = table.toStructType
    val pk = KeyInference.idLikeColumn(table.tableName, table.columns.map(_.name))
      .getOrElse(throw new IllegalArgumentException(
        s"streaming ingest needs a PK for ${table.tableName}; no id-like column found"))

    val raw = spark.readStream
      .schema(TsvReader.stringSchema(table))
      .options(TsvReader.csvOptions(failFast = true))
      .csv(s"$landingDir/${table.tableName}-*.gz")

    TsvReader.cast(raw, target)
      .withColumn("_src_file", input_file_name())
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val deduped = Merge.dedupLatest(
          batch.withColumn("_dump_seq", lit(batchId)),
          Seq(pk), "_dump_seq", tieBreak = Seq("_src_file"))
          .drop("_src_file")
        BucketedMerge.mergeInto(
          spark, targetPath, deduped, Seq(pk), nBuckets, seqCol = Some("_dump_seq"))
      }
      .start()
  }
}

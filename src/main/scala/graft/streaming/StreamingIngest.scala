package graft.streaming

import graft.ingest.{BucketedMerge, Merge, TsvReader}
import graft.keys.KeyInference
import graft.schema.TableDefinition
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Continuous loader: the Structured-Streaming modernization of the
 * reference's hourly cron (`README:31-33` — "run it on a schedule").
 * A file-source stream watches a landing directory for new gzipped TSV
 * artifacts of one table and applies EXACTLY the batch path's semantics per
 * micro-batch: all-strings scan → one cast ([[TsvReader.cast]]) →
 * keep-latest dedup ([[Merge.dedupLatest]]) → bucket-pruned merge
 * ([[BucketedMerge.mergeInto]]). Exactly-once per file via the streaming
 * source's checkpointed file log; the merge itself is idempotent (same-PK
 * replay converges), so retried micro-batches are safe.
 *
 * Sequence semantics: files carry no dump sequence of their own in the
 * landing layout, so each row's `_dump_seq` is the micro-batch id — file
 * arrival order, the streaming analogue of the manifest's createdAt order
 * (SO-1). Late re-deliveries of an old artifact therefore lose to rows
 * already merged with a newer sequence, same as the batch path.
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
    val asStrings = StructType(target.fields.map(_.copy(dataType = StringType)))
    val pk = KeyInference.idLikeColumn(table.tableName, table.columns.map(_.name))
      .getOrElse(throw new IllegalArgumentException(
        s"streaming ingest needs a PK for ${table.tableName}; no id-like column found"))

    val raw = spark.readStream
      .schema(asStrings)
      .option("sep", "\t")
      .option("header", "false")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
      .csv(s"$landingDir/${table.tableName}-*.gz")

    TsvReader.cast(raw, target)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val deduped = Merge.dedupLatest(
          batch.withColumn("_dump_seq", lit(batchId)), Seq(pk), "_dump_seq")
        BucketedMerge.mergeInto(spark, targetPath, deduped, Seq(pk), nBuckets)
      }
      .start()
  }
}

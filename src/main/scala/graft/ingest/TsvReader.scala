package graft.ingest

import graft.schema.TableDefinition
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Reads Canvas dump artifact files (gzipped, tab-separated, headerless,
 * `\N` = NULL, columns in schema order) as a typed DataFrame.
 *
 * Replaces the reference's whole-file-in-RAM gunzip + line split
 * (`/root/reference/src/importer.rs:265-327`, ops SC-1..SC-3): Spark's CSV
 * reader decompresses `.gz` transparently and gives one partition per gz
 * file — the same parallelism unit as the reference's rayon per-file task,
 * but streaming instead of materialized.
 *
 * Typing: the reference keeps rows stringly-typed and lets the database cast
 * on INSERT (`db_client.rs:211-291`). We cast ONCE here, so every downstream
 * operator runs on native columnar types.
 *
 * 100 TB posture: gz files are unsplittable — one task per file. Artifacts
 * larger than ~1 GB compressed should be re-chunked at download time
 * (SURVEY §7 hard-part (e)); `maxPartitionBytes` governs splittable inputs.
 */
object TsvReader {

  /** The one Canvas-TSV option block, shared by the batch reader and the
    * streaming ingest source so their parse semantics can never drift. */
  def csvOptions(failFast: Boolean = true): Map[String, String] = Map(
    "sep" -> "\t",
    "header" -> "false",
    "nullValue" -> "\\N",
    "emptyValue" -> "",
    "mode" -> (if (failFast) "FAILFAST" else "PERMISSIVE"),
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss[.SSS]")

  /** All-strings scan schema: the reference's parse model
    * (BTreeMap<String, Option<String>>); CSV type inference is NOT used
    * (no header, ordering is the contract). */
  def stringSchema(table: TableDefinition): StructType =
    StructType(table.toStructType.fields.map(_.copy(dataType = StringType)))

  /** Mode "PERMISSIVE" with a corrupt-record column would silently null rows;
    * ingest wants fail-fast like the reference (X-3), so default FAILFAST. */
  def read(
      spark: SparkSession,
      paths: Seq[String],
      table: TableDefinition,
      failFast: Boolean = true): DataFrame = {
    val raw = spark.read
      .schema(stringSchema(table))
      .options(csvOptions(failFast))
      .csv(paths: _*)
    cast(raw, table.toStructType)
  }

  /** Cast an all-strings frame to the target schema (op P-1 / I-5, once). */
  def cast(raw: DataFrame, target: StructType): DataFrame =
    raw.select(target.fields.map(f => col(f.name).cast(f.dataType).as(f.name, f.metadata)).toIndexedSeq: _*)
}

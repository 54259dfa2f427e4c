package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * JSONL (one JSON object per line, optionally gzipped) corpus reader —
 * the interchange format LLM training corpora actually ship in
 * (The Pile, RedPajama, Dolma, FineWeb all distribute JSONL shards).
 * The reference ingests only Canvas TSV ([[TsvReader]]); a user swapping
 * their corpus pipeline onto this engine needs the JSONL door too.
 *
 * Contract, mirrored from the TSV reader's discipline:
 *  - schema is EXPLICIT (no inference scan — a second pass over 100 TB
 *    to guess types is never acceptable; inference also re-types columns
 *    batch-to-batch, which breaks streaming);
 *  - typed once at read, so every downstream operator runs on native
 *    columnar types;
 *  - corrupt lines follow the caller's policy: FAILFAST for
 *    warehouse-grade ingest (X-3 semantics), or PERMISSIVE with the
 *    corrupt line preserved in `_corrupt_record` for web-crawl-grade
 *    input where a bad line must quarantine, not kill the job. Spark
 *    requires the corrupt column selected through a cache boundary —
 *    [[readPermissive]] returns (clean, quarantined) frames that handle
 *    that correctly.
 *
 * 100 TB posture: .jsonl splits by line (parallelism ∝ bytes);
 * .jsonl.gz is one task per file like any gz artifact — re-chunk
 * oversized shards at download time ([[GzRechunk]] applies unchanged).
 */
object JsonlReader {

  val CorruptCol = "_corrupt_record"

  /** Strict read: any malformed line fails the job (ingest-grade). */
  def read(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(paths: _*)

  /** A permissive-read result: the clean/quarantine split plus the
    * `release()` handle that drops the shared cache backing it. Both
    * frames read through one cached pass of the raw input; without an
    * explicit release that cache would pin the whole corpus in the block
    * store for the session's lifetime, so consume (or persist) the frames,
    * then call `release()` (idempotent). Re-reading a frame AFTER release
    * throws: Spark refuses to filter the corrupt column of an uncached
    * JSON scan — the cache is what makes the split legal at all. */
  final case class PermissiveRead(clean: DataFrame, quarantined: DataFrame,
      release: () => Unit)

  /** Lenient read: clean rows + quarantined raw lines ([[PermissiveRead]]).
    * A malformed line yields one quarantine row carrying the verbatim line
    * text; clean rows never silently lose fields. The split is computed
    * from ONE cached pass (Spark's lazy `_corrupt_record` cannot be
    * filtered directly without it) — call the returned `release()` when
    * done with both frames. */
  def readPermissive(spark: SparkSession, schema: StructType,
      paths: String*): PermissiveRead = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)
      // file name must be captured BEFORE the cache boundary —
      // input_file_name() is scan-scoped and evaluates empty afterwards
      .withColumn("_graft_file", input_file_name())
      .cache()
    val clean = raw.filter(col(CorruptCol).isNull)
      .drop(CorruptCol, "_graft_file")
    val quarantined = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("line"), col("_graft_file").as("file"))
    PermissiveRead(clean, quarantined, () => { raw.unpersist(); () })
  }

  /** Export a frame as gzipped JSONL shards (the release format the
    * training-shard accounting of q93 describes) — round-trips through
    * [[read]] with the same schema. */
  def write(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards)
      .write.mode("overwrite")
      .option("compression", "gzip")
      .json(path)
}

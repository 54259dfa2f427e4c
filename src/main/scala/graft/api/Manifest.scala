package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Control-plane data model + dump-selection filters (SURVEY §2 S-1/S-4,
 * F-1..F-5, SO-1), Spark-first: the dump list becomes a tiny *manifest
 * DataFrame* and every skip rule in `/root/reference/src/main.rs:95-168`
 * becomes a declarative filter. Catalog-scale data (thousands of dumps) is
 * trivially small; the value is a single auditable pipeline instead of an
 * imperative loop.
 */
final case class DumpInList(
    dumpId: String,
    sequence: Long,
    numFiles: Long,
    finished: Boolean,
    createdAt: String, // ISO-8601, lexicographically ordered
    schemaVersion: String)

/** One artifact file of a table inside a dump (`api_client.rs:372-392`). */
final case class ArtifactFile(tableName: String, partial: Boolean, url: String, filename: String)

object Manifest {

  /** The historical-refresh regex of op F-5 (`api_client.rs:17-19`). */
  val RequestsRegex = "^requests.*?$"

  def dumpsDF(spark: SparkSession, dumps: Seq[DumpInList]): DataFrame = {
    import spark.implicits._
    dumps.toDF()
  }

  /**
   * Dump selection = ops SO-1 + F-1 + F-2 + F-3 + F-4 as one pipeline
   * (`main.rs:66-147`). Returns dumps to process, chronologically ordered,
   * plus the ids to mark out-of-date (F-3 writes state for its rejects).
   */
  def selectDumps(
      manifest: DataFrame,
      processed: Set[String], // dump ids already successful | out-of-date (F-2)
      latestSchemaVersion: String,
      onlyLoadFinal: Boolean): (DataFrame, DataFrame) = {
    val base = manifest
      .filter(col("finished")) // F-1
      .filter(!col("dumpId").isin(processed.toSeq: _*)) // F-2
    val outOfDate = base.filter(col("schemaVersion") =!= latestSchemaVersion) // F-3 rejects
    val current = base.filter(col("schemaVersion") === latestSchemaVersion)
    val picked =
      if (onlyLoadFinal) current.orderBy(col("createdAt").desc).limit(1) // F-4
      else current
    (picked.orderBy(col("createdAt")), outOfDate.select(col("dumpId"))) // SO-1
  }

  /**
   * Op F-5: a dump is a historical refresh iff EVERY file across all its
   * artifacts matches `^requests.*?$` (`api_client.rs:101-112`) — a `forall`,
   * i.e. `min(filename rlike regex)` over the files frame.
   */
  def isHistoricalRefresh(files: DataFrame): Boolean = {
    val row = files
      .agg(coalesce(min(col("filename").rlike(RequestsRegex)), lit(false)).as("all_requests"))
      .collect()(0)
    row.getBoolean(0)
  }

  /** Driver-side variant for a plain Seq manifest (no Spark job needed). */
  def isHistoricalRefresh(files: Seq[ArtifactFile]): Boolean =
    files.nonEmpty && files.forall(_.filename.matches(RequestsRegex))
}

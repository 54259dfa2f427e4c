package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Two-phase parquet overwrite, shared by the volatile load path and the
 * bucketed full rewrite: a parquet target cannot be read and overwritten in
 * place, so results land in `<path>.__staging` first and the directories
 * are swapped. The swap itself is delete+rename — crash-safe enough for a
 * single-writer loader (the staging dir survives a crash for manual
 * recovery); a transactional table format is the production upgrade.
 */
object StagedWrite {

  private def fsOf(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Swap a fully-written staging dir into place. */
  def swap(spark: SparkSession, tmp: String, path: String): Unit = {
    val fs = fsOf(spark)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
  }

  /** Flat (unpartitioned) staged overwrite. */
  def overwriteFlat(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val tmp = s"$path.__staging"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    swap(spark, tmp, path)
  }
}

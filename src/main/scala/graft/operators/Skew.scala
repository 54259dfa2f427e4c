package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation for shuffle joins: salt the hot side, replicate the other.
 *
 * When one join key carries a disproportionate share of rows (the classic
 * 100 TB failure mode: one task gets the whale key and runs for hours), a
 * plain shuffle join puts every row of that key in one partition. Salting
 * splits the hot side's key space into `factor` sub-keys and replicates the
 * small side across all sub-keys, so the whale key fans out over `factor`
 * tasks. AQE's skew-join handling does this adaptively for sort-merge
 * joins; this utility is the explicit form for when AQE can't see it
 * (e.g. aggregation skew, or joins below AQE's thresholds).
 */
object Skew {

  /** Add a deterministic salt in [0, factor) derived from a uniqueness
    * column (NOT rand() — keeps retries/replays idempotent). */
  def saltKey(df: DataFrame, uniqueCol: String, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(factor)))

  /** Replicate every row `factor` times with salt 0..factor-1. */
  def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))

  /**
   * Salted inner join on `key`: `big` is salted by `uniqueCol`, `small` is
   * replicated ×factor, and the join key becomes (key, salt). Result equals
   * the plain join; the whale key now spreads over `factor` partitions.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, factor: Int): DataFrame =
    saltKey(big, uniqueCol, factor)
      .join(replicate(small, factor), Seq(key, "__salt"))
      .drop("__salt")

  /**
   * Two-phase skew-safe aggregation: partial-aggregate on (key, salt), then
   * final-aggregate on key. For algebraic aggregates (sum/count/min/max)
   * this is exactly what map-side combine already does — exposed for
   * composed aggregates where the partial must be explicit.
   */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      uniqueCol: String, factor: Int): DataFrame =
    saltKey(df, uniqueCol, factor)
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))
}

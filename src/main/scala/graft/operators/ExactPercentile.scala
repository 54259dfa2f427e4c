package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact interpolated percentiles via sort + rank — the scale-safe exact
 * path. Spark's builtin `percentile` buffers EVERY group value inside the
 * aggregation buffer (the OOM at 100× group sizes); this formulation is a
 * partition sort + row_number, which spills gracefully at any scale, plus
 * a conditional aggregate that keeps only the two boundary rows per
 * requested percentile.
 *
 * Same definition as SQL `percentile_cont`/DuckDB `quantile_cont`:
 * position `p*(n-1)` (0-based), linear interpolation
 * `v_lo + frac*(v_hi - v_lo)`. Values match the builtin to the last ulp
 * class (PercentileSpec asserts equality of the rounded results).
 */
object ExactPercentile {

  /** Percentiles of `value` per `group`: one (alias, p) output column each,
    * rounded to 6 for stable compares. NULL values are excluded before
    * ranking, matching `percentile_cont`/the builtin `percentile`.
    * `countAlias` optionally emits the per-group non-null count (already
    * computed for the interpolation — no extra scan needed). */
  def of(df: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)], countAlias: Option[String] = None): DataFrame = {
    val byValue = Window.partitionBy(col(group)).orderBy(col(value))
    val whole = Window.partitionBy(col(group))
    val ranked = df.select(col(group), col(value))
      .filter(col(value).isNotNull) // percentile_cont ignores NULLs
      .withColumn("__rn", row_number().over(byValue))
      .withColumn("__n", count(lit(1)).over(whole))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("__n") - 1) // 0-based interpolation position
      Seq(
        max(when(col("__rn") === floor(pos) + 1, col(value))).as(s"__lo_$name"),
        max(when(col("__rn") === ceil(pos) + 1, col(value))).as(s"__hi_$name"),
        max(pos - floor(pos)).as(s"__frac_$name")) // constant per group
    } ++ countAlias.map(a => max(col("__n")).as(a))
    val outCols = ps.map { case (name, _) =>
      round(col(s"__lo_$name") +
        col(s"__frac_$name") * (col(s"__hi_$name") - col(s"__lo_$name")), 6).as(name)
    } ++ countAlias.map(col(_))
    ranked.groupBy(col(group))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(group) +: outCols: _*)
  }
}

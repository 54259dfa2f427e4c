/*
 * Lives in org.apache.spark.sql because the Spark 4 "classic" Column ⇄
 * catalyst Expression bridge (ExpressionColumnNode / ColumnConversions) is
 * private[sql]. This is the only sanctioned way for a library to expose a
 * custom Catalyst Expression as a user-facing Column without going through
 * FunctionRegistry; everything else of ours stays in the graft namespace.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

object GraftBridge {
  def columnOf(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expressionOf(c: Column): Expression = ColumnConversions.expression(c)

  /**
   * Eager `localCheckpoint` that DROPS plan statistics. Spark ≥3.4
   * propagates the origin plan's stats through a checkpoint
   * (`LogicalRDD.originStats`); in an ITERATIVE algorithm (connected-
   * components contraction) each round's join therefore multiplies the
   * previous round's already-multiplied sizeInBytes — the estimate
   * compounds double-exponentially, and by round ~10 the driver spends
   * minutes multiplying million-bit BigIntegers inside
   * SizeInBytesOnlyStatsPlanVisitor (caught by ClusterSoakSpec's
   * chain-topology soak; the clique-heavy fixtures converge in 2-3
   * rounds and never tripped it). Rebuilding the frame over the
   * checkpointed RDD with `internalCreateDataFrame` (no originStats)
   * resets the leaf to the flat default estimate, which is exactly the
   * "stats-less LogicalRDD" contract the caller's broadcast hints
   * already assume.
   */
  def checkpointNoStats(df: Dataset[Row]): Dataset[Row] =
    checkpointNoStats(df, eager = true)

  /**
   * `eager = false` defers materialization to the FIRST ACTION on the
   * returned frame: `localCheckpoint(eager=false)` only marks the
   * checkpoint RDD, and Spark persists it (and truncates lineage) when
   * the first job computes it. An iterative caller that must run a
   * per-round convergence aggregate anyway can therefore fold the
   * checkpoint materialization into that aggregate's job — one scheduler
   * round-trip per iteration instead of two (materialize, then probe).
   */
  def checkpointNoStats(df: Dataset[Row], eager: Boolean): Dataset[Row] = {
    val cp = df.localCheckpoint(eager)
    val spark = cp.sparkSession.asInstanceOf[classic.SparkSession]
    cp.queryExecution.analyzed match {
      // the checkpoint's own RDD already holds per-row COPIES (Dataset
      // .checkpoint materializes `execute().map(_.copy())`), so it can be
      // wrapped directly — zero extra copies, no stats
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        spark.internalCreateDataFrame(lr.rdd, cp.schema)
      // fallback: toRdd goes through RDDScanExec, whose UnsafeProjection
      // REUSES its result buffer per partition — must copy before caching
      case _ =>
        spark.internalCreateDataFrame(cp.queryExecution.toRdd.map(_.copy()), cp.schema)
    }
  }
}

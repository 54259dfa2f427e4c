package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the latest right row with the same
 * key whose timestamp is ≤ the left timestamp (point-in-time lookup — the
 * operator behind "state of the dimension when the event happened").
 *
 * Spark has no built-in as-of join. Instead of a custom SparkPlan, this is
 * the union + ignore-nulls running-last window formulation:
 *
 *   union(tagged right, tagged left)
 *     → window per key ordered by (ts, side):  last(payload, ignoreNulls)
 *     → keep left rows
 *
 * which costs exactly ONE shuffle of each side (the window partition) — the
 * same cost profile as a sort-merge join, with no range explosion; this is
 * the composition-first choice of the design notes' preference order, and
 * at 100 TB it beats any nested-loop/range approach because each key group
 * is a single ordered scan. Right rows sort before left rows at equal ts,
 * so a right row timestamped exactly at the left ts IS matched (`>=`
 * semantics, same as an ASOF JOIN with `l.ts >= r.ts`).
 *
 * Rows with duplicate (key, ts) on the right must be pre-deduplicated for a
 * deterministic result; [[latestPerKeyTs]] does that.
 */
object AsOfJoin {

  /** Keep one right row per (key, ts): max by `tieBreak`. */
  def latestPerKeyTs(right: DataFrame, key: String, ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(ts)).orderBy(col(tieBreak).desc)
    right.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * @param left      probe side (e.g. events)
   * @param right     build side (e.g. orders), deduped per (key, ts)
   * @param key       equality key column name (same name both sides)
   * @param leftTs    left timestamp column
   * @param rightTs   right timestamp column
   * @param payload   right columns to carry (attached as-of; null if no match)
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // SQL join semantics for NULLs (hostile-sweep pin): a NULL key never
    // matches — but the window partition would happily group NULL-key rows
    // from both sides together and "match" them. Likewise a NULL timestamp
    // can never satisfy l.ts >= r.ts on either side. Null-key/ts right
    // rows are unmatchable ⇒ dropped from the build; null-key/ts left
    // rows are unmatched ⇒ routed around the window with NULL payload.
    val lMatchable = col(key).isNotNull && col(leftTs).isNotNull
    val r = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
          payload.map(col) ++:
          leftCols.filterNot(_ == key)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left.filter(lMatchable).select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++:
        leftCols.filterNot(_ == key).map(col)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(r.unionByName(l)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    val matched = filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(col)): _*)
    val unmatched = left.filter(!lMatchable)
      .select((leftCols.map(col) ++ payload.map(c =>
        lit(null).cast(right.schema(c).dataType).as(c))): _*)
    matched.unionByName(unmatched)
  }
}

package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Set-based replacement for the reference's row-at-a-time DELETE+INSERT
 * upsert (`/root/reference/src/importer.rs:345-390`,
 * `db_client.rs:184-304` — 2 SQL statements and 2 network round-trips per
 * row). SURVEY §2 ops I-3/I-4.
 *
 * Semantics preserved:
 *  - incremental tables: last writer wins per PK, where "last" is the dump
 *    sequence (the reference achieves this by replaying dumps in createdAt
 *    order, `main.rs:66-68`; we make it order-independent via a
 *    `(pk, seq)` window, which additionally enables parallel backfill);
 *  - volatile tables: wholesale drop + reload (`importer.rs:206-228`);
 *  - idempotence: re-running the same dump produces an identical target.
 *
 * 100 TB posture: both paths are single-shuffle. `dedupLatest` shuffles the
 * batch by PK once; `applyIncremental` is one shuffle join of target vs batch
 * keys. The anti-join side (new batch keys) is typically ≪ target —
 * broadcast it when under the threshold so the target is NOT shuffled at all.
 */
object Merge {

  /**
   * Keep the newest row per key: `row_number() over (partition by pk
   * order by seq desc)` = 1. `tieBreak` makes the result deterministic when
   * one dump carries duplicate PKs (the reference's row loop is
   * last-row-wins in file order; file order is not reproducible at scale, so
   * we require an explicit total order).
   */
  def dedupLatest(batch: DataFrame, pk: Seq[String], seqCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(seqCol).desc +: tieBreak.map(col(_).desc)).toIndexedSeq
    val w = Window.partitionBy(pk.map(col).toIndexedSeq: _*).orderBy(order: _*)
    batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Incremental merge, lake path: rows of `target` whose PK appears in
   * `batch` are replaced by the batch row. Equivalent to the reference's
   * per-row DELETE (left_anti) + INSERT (unionByName), but set-based.
   *
   * `batch` must already be deduped per PK (use [[dedupLatest]]).
   * Broadcasting the batch's key set keeps the target un-shuffled when the
   * batch is small relative to the target (the common incremental case).
   */
  def applyIncremental(target: DataFrame, batch: DataFrame, pk: Seq[String],
      broadcastKeys: Boolean = true): DataFrame = {
    val keys = {
      val k = batch.select(pk.map(col).toIndexedSeq: _*).distinct()
      if (broadcastKeys) broadcast(k) else k
    }
    target.join(keys, pk, "left_anti").unionByName(batch.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /**
   * Sequence-aware incremental merge: like [[applyIncremental]], but a
   * target row only loses to a batch row with an equal-or-newer `seqCol`
   * (batch wins ties — the replay-of-the-same-dump case). This makes merge
   * application ORDER-INDEPENDENT across runs: replaying an old dump after
   * a newer one cannot regress the warehouse, which is what permits
   * parallel/out-of-order backfill. Target stays unshuffled: batch keys are
   * broadcast for both the untouched (anti) and contested (semi) splits.
   * (The split costs a second columnar scan of the target, deliberately —
   * the alternative single-scan form shuffles every target row by PK for
   * the window, and at warehouse scale a pruned re-scan is far cheaper
   * than a shuffle.)
   */
  def applyIncrementalSeq(target: DataFrame, batch: DataFrame, pk: Seq[String],
      seqCol: String, broadcastKeys: Boolean = true): DataFrame = {
    val keys = {
      val k = batch.select(pk.map(col).toIndexedSeq: _*).distinct()
      if (broadcastKeys) broadcast(k) else k
    }
    val untouched = target.join(keys, pk, "left_anti")
    val contested = target.join(keys, pk, "left_semi")
      .withColumn("__from_batch", lit(0))
    val challengers = batch.select(target.columns.map(col).toIndexedSeq: _*)
      .withColumn("__from_batch", lit(1))
    val winners = dedupLatest(
      contested.unionByName(challengers), pk, seqCol, tieBreak = Seq("__from_batch"))
      .drop("__from_batch")
    untouched.unionByName(winners)
  }

  /** Volatile path: the batch IS the table (drop+recreate ⇒ overwrite). */
  def applyVolatile(batch: DataFrame): DataFrame = batch

  /**
   * Filter condition "row's PK tuple is in the batch" — exposed for the JDBC
   * sink's staged `DELETE FROM target WHERE (pk) IN (SELECT pk FROM stage)`.
   */
  def pkMatch(left: DataFrame, right: DataFrame, pk: Seq[String]): Column =
    pk.map(k => left(k) === right(k)).reduce(_ && _)
}

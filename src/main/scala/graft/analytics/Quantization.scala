package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Embedding scalar quantization (int8) — the storage path for embedding
 * columns at corpus scale: a 64-dim float vector is 256 bytes; its uint8
 * codes are 64 bytes (4×), and the per-dimension min/max codebook is 64
 * rows TOTAL regardless of corpus size.
 *
 * Shape for 100 TB: `posexplode` is a narrow map (rows × dims, no
 * shuffle); the codebook aggregate shuffles only (dim, partial min/max)
 * pairs thanks to map-side partial aggregation; the codebook re-join is a
 * broadcast hash join; the per-vector stats aggregate is the single real
 * shuffle, keyed by vec_id. Everything stays inside whole-stage codegen —
 * no UDFs.
 *
 * Determinism across engines (this is oracle-checked by value): every
 * per-element arithmetic step is a single IEEE double op in a fixed order
 * (`(x-mn)/(mx-mn)*256` then `floor`), so Spark and DuckDB produce
 * identical codes; the reconstruction errors are rounded per element and
 * summed as DECIMAL(18,9), which is exact and order-independent, dodging
 * float-sum association drift. Constant dimensions (mx = mn) quantize to
 * code 0 with zero error.
 */
object Quantization {

  import Tables._

  /**
   * Per-vector int8 quantization stats: code checksum/min/max plus exact
   * decimal-summed reconstruction error (mid-rise dequantization — code →
   * bucket midpoint `mn + (code + 0.5) * step`).
   */
  def int8QuantStats(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"), col("xf").cast("double").as("x"))
    val codebook = e.groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    e.join(broadcast(codebook), "dim")
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(255L),
            floor((col("x") - col("mn")) / (col("mx") - col("mn")) * 256.0))))
      .withColumn("e9",
        when(col("mx") === col("mn"), lit(0).cast("decimal(18,9)"))
          .otherwise(round(abs(col("x") - (col("mn") +
            (col("code") + 0.5) * ((col("mx") - col("mn")) / 256.0))), 9)
            .cast("decimal(18,9)")))
      .groupBy(col("vec_id"))
      .agg(
        sum(col("code")).as("code_sum"),
        min(col("code")).as("code_min"),
        max(col("code")).as("code_max"),
        round(sum(col("e9")).cast("double"), 6).as("sum_abs_err"),
        round(max(col("e9")).cast("double"), 6).as("max_abs_err"))
  }

  /**
   * The corpus as a serving tier would hold it after q77's int8
   * compression: each vector rebuilt from its codes through the SAME
   * per-dim codebook and mid-rise dequantization (`mn + (code + 0.5) ·
   * step`; a degenerate dim with `mx == mn` reconstructs exactly).
   * (vec_id, embedding: array<double>) — NULL-embedding rows carry no
   * exploded values and drop out, exactly as they drop from every
   * ranking. Feeds [[graft.analytics.Similarity.int8RecallStats]]
   * (q170), which prices what retrieval loses to this representation.
   *
   * Shape: one explode + one broadcast codebook join + one vec_id-keyed
   * rebuild aggregate — corpus-linear, no pair surface.
   */
  def dequantizedInt8(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    dequantizedInt8Of(emb, int8Codebook(emb))

  /** The per-dim (mn, mx) int8 codebook — q77's model, exposed for
    * freezing into the streaming index ([[graft.streaming.StreamingCorpus]]
    * `startInt8Index`): codebook refresh is a batch training event, like
    * the k-means centroids and the PQ codebooks. */
  def int8Codebook(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select((col("pos") + 1).as("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** [[dequantizedInt8]] against an explicit (FROZEN) codebook — encode +
    * reconstruct is a pure function of (vector, codebook), so the
    * incrementally maintained table equals the batch rebuild of the same
    * corpus under any arrival order or replay. A dim beyond the frozen
    * codebook's width reconstructs as NULL-joined rows dropped by the
    * inner join — a wider-than-model vector truncates to the model's
    * dims, the PQ slicing convention. */
  def dequantizedInt8Of(emb: org.apache.spark.sql.DataFrame,
      codebook: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val e = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"), col("xf").cast("double").as("x"))
    e.join(broadcast(codebook), "dim")
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          // clamp BOTH sides: under a FROZEN codebook an arriving value
          // below a dim's mn would otherwise floor to a NEGATIVE code —
          // unrepresentable as uint8 — so the maintained serving table
          // would no longer correspond to shippable codes. The high side
          // was already clamped; batch callers are unaffected (their
          // codebook spans the data, codes already >= 0), so q77/q170
          // results and the DuckDB pins are unchanged.
          .otherwise(greatest(lit(0L), least(lit(255L),
            floor((col("x") - col("mn")) / (col("mx") - col("mn")) * 256.0)))))
      .withColumn("xq",
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("mn") +
            (col("code") + 0.5) * ((col("mx") - col("mn")) / 256.0)))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("xq")))).as("pairs"))
      .select(col("vec_id"),
        transform(col("pairs"), p => p.getField("xq")).as("embedding"))
  }
}

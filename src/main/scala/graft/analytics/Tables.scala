package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Test-warehouse table loader. The driver's star schema (TESTDATA.md):
 * region, nation, customer, supplier, part, orders, lineitem, events,
 * documents, embeddings — one parquet per table under a scale-factor dir.
 *
 * Dimension/fact split mirrors the reference catalog's `dw_type`
 * (`/root/reference/src/api_client.rs:405-421`): dimensions are
 * broadcast-join candidates.
 */
object Tables {

  val dimensions: Set[String] = Set("region", "nation", "supplier", "part", "customer")

  /** (input files, parallelism) → does this scan need spreading? The
    * layout of a warehouse file doesn't change mid-session, and the probe
    * (`df.rdd.getNumPartitions`) costs a full analyze+plan pass on the
    * driver — cache it so repeated loads (and repeated opt-in [[spread]]
    * calls on the bench hot path) pay it once. */
  private val spreadProbe = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /**
   * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
   * outright (PARQUET_TYPE_ILLEGAL). Read nanos as raw long
   * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
   * the same floor DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so the
   * oracle agrees. Integer `div` (not `/`): epoch-nanos exceed 2^53 and
   * would lose precision through a double.
   */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /**
   * Opt-in spread-on-load for `documents`. Spreading is strictly per call
   * site: round-4's table-wide spread cut the heavy pre-shuffle-compute
   * family 3-25× (q75 11.9→0.52s, q33 6.4×, q43 4×, q32 3.3×) but taxed
   * every consumer whose FIRST real operation is already a shuffle with a
   * full text-body exchange (q39 9.4×, q30 5.1× regressions, BENCH_r03 vs
   * r04). The rule: shingling / hashing / codec pipelines that do heavy
   * per-row work before any shuffle call this; cheap-aggregate consumers
   * call [[documents]] and let their own shuffle do the distribution.
   */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spread(s, documents(s, d))

  /**
   * Spread a CPU-bound derivation across all cores when the scan has fewer
   * partitions than the cluster's parallelism. Parquet splits at row-group
   * boundaries, so a small single-row-group file scans as ONE partition and
   * serializes everything downstream (per-doc shingling/hashing is
   * compute-bound, not IO-bound — measured 4× wall-clock on a 1-partition
   * documents scan at sf0.1). Guarded: when the scan already has ≥
   * parallelism partitions — any real 100 TB input — this is the identity,
   * so no shuffle is ever added at scale.
   */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    val files = df.inputFiles
    val need =
      if (files.isEmpty) df.rdd.getNumPartitions < p // in-memory frame: just probe
      else spreadProbe.computeIfAbsent(files.sorted.mkString(",") + "|" + p,
        _ => Boolean.box(df.rdd.getNumPartitions < p)).booleanValue()
    if (need) df.repartition(p) else df
  }
}

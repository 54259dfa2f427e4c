package graft.analytics

import graft.api.{DumpInList, Manifest}
import graft.ingest.Merge
import graft.operators.{AsOfJoin, ExactPercentile, Skew}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The relational query surface: every class of operation SURVEY §2's
 * "capability" table assigns to Spark built-ins (joins, aggregations,
 * windows, set ops, sorts/limits, scalar functions, sessionization) plus the
 * reference's own merge/filter semantics re-expressed as declarative queries.
 *
 * Output-shape rules (driver oracle compare):
 *  - every computed column is aliased identically here and in the oracle SQL;
 *  - non-exact floating sums are `round(_, 2)` and averages `round(_, 6)` on
 *    BOTH sides, so cross-engine summation-order differences cannot flip the
 *    hash (exact-representable sums — counts, int sums, small-int-valued
 *    doubles like l_quantity — stay unrounded);
 *  - LIMIT/top-k queries always carry a unique tie-break key so the selected
 *    SET is deterministic.
 *
 * Scale notes are on each query; dimensions are broadcast explicitly where
 * Catalyst's size estimate may not see it (SURVEY §1.4: `dw_type=dimension`
 * ⇒ broadcast hint).
 */
object Relational {

  import Tables._

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /**
   * Order-independent money sum: per-row cast to DECIMAL(18,6), summed
   * exactly (decimal addition is associative — no floating-point
   * summation-order jitter), rounded to cents, returned as double. With
   * many groups, double-sum jitter (~1e-10 relative) lands on a
   * cent-rounding boundary a handful of times per run and flips the
   * result hash whenever partitioning (and thus summation order) changes;
   * decimal summation makes the rounded value partitioning- and
   * engine-stable. Oracle twin:
   * `CAST(round(sum(CAST(e AS DECIMAL(18,6))), 2) AS DOUBLE)`.
   */
  private[analytics] def decSum(e: Column): Column =
    round(sum(e.cast("decimal(18,6)")), 2).cast("double")

  /** [[decSum]] over a window frame (same order-independence argument —
    * engines disagree on frame summation order, e.g. segment trees vs
    * running accumulation, long before they disagree on the frame). */
  private[analytics] def decSumOver(
      e: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    round(sum(e.cast("decimal(18,6)")).over(w), 2).cast("double")

  /** Order-independent 6-dp average: exact decimal sum → double, divided
    * by the non-null count — double division of identical operands is
    * IEEE-identical in both engines, so only the (exact) sum matters.
    * Oracle twin:
    * `round(CAST(sum(CAST(e AS DECIMAL(18,9))) AS DOUBLE) / count(e), 6)`. */
  private[analytics] def decAvg(e: Column): Column =
    round(sum(e.cast("decimal(18,9)")).cast("double") / count(e), 6)

  /** TPC-H Q1 shape: single scan, 4-wide partial agg, 2 grouping keys.
    * Filter + pruning push to parquet; whole-stage codegen end-to-end. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    // spread: 7 aggregates with per-row decimal casts over the whole table
    // land in the map-side partial agg, which a single-row-group scan runs
    // on one core (2.0s -> sub-second at sf0.1 with the spread)
    spread(s, lineitem(s, d))
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // small-int-valued doubles: exact
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(revenue).as("sum_disc_price"),
        decSum(revenue * (lit(1) + col("l_tax"))).as("sum_charge"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_extendedprice")).as("avg_price"),
        decAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6 shape: pure filter-aggregate; all predicates pushed. */
  def q02RevenueBand(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(decSum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** 3-way join, small side broadcast; revenue per market segment. */
  def q03SegmentRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(decSum(revenue).as("revenue"), count(lit(1)).as("n_rows"))

  /** Semi-join (EXISTS) + agg: order priorities having at least one line. */
  def q04OrderPriority(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d).select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** TPC-H Q5 shape: star join through 4 dims; dims broadcast. */
  def q05NationRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(decSum(revenue).as("revenue"), count(lit(1)).as("n_lines"))

  /** Dim-only star probe: customers per region with balance stats. */
  def q06RegionCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), decAvg(col("c_acctbal")).as("avg_bal"))

  /** left_semi: customers that have ordered (EXISTS). */
  def q07ExistsCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** left_anti: customers that never ordered (NOT EXISTS) — the same shape
    * as the I-3 merge's delete side. */
  def q08AntiCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Window top-N per key (deterministic tie-break on the unique key). */
  def q09TopOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  /** Running (prefix) aggregate per key — same sequential order in any
    * engine, so the double sum is reproducible; rounded anyway. */
  def q10RunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        decSumOver(col("o_totalprice"), w).as("running_total"))
  }

  /** lag(): days between consecutive orders per customer. */
  def q11OrderGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
  }

  /** ROLLUP over two grouping keys (hierarchical subtotals). */
  def q12RollupLineitem(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** CUBE over two grouping keys (all subtotal combinations). */
  def q13CubeOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total"))

  /** Exact distinct counts (expand-based multi-distinct in one pass). */
  def q14DistinctStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      count(lit(1)).as("n_rows"))

  private def orderedCustkeys(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_custkey").as("custkey"))
  private def negativeCustkeys(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_acctbal") < 0).select(col("c_custkey").as("custkey"))

  /** UNION (distinct). */
  def q15Union(s: SparkSession, d: String): DataFrame =
    orderedCustkeys(s, d).union(negativeCustkeys(s, d)).distinct()

  /** INTERSECT. */
  def q16Intersect(s: SparkSession, d: String): DataFrame =
    orderedCustkeys(s, d).intersect(negativeCustkeys(s, d))

  /** EXCEPT: negative-balance customers that never ordered. */
  def q17Except(s: SparkSession, d: String): DataFrame =
    negativeCustkeys(s, d).except(orderedCustkeys(s, d))

  /** Global top-k with unique tie-break — TakeOrderedAndProject, no full sort. */
  def q18TopOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** GROUP BY + HAVING. */
  def q19HavingBigCustomers(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") >= 10)

  /** Conditional aggregation (CASE WHEN inside agg). */
  def q20ConditionalAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        decSum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(0.0))
          .as("returned_value"),
        count(lit(1)).as("n_rows"))

  /** Scalar string functions (codegen'd, no UDFs). */
  def q21StringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_name"), 1, 8).as("name_prefix"),
      length(col("p_name")).as("name_len"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))

  /** Date bucketing: monthly order stats. */
  def q22MonthlyOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total"))

  /** JSON extraction from the events.props payload. */
  def q23JsonExtract(s: SparkSession, d: String): DataFrame =
    // try_cast, not cast: Spark 4 runs ANSI by default, so a plain cast
    // THROWS on a non-numeric $.k (real-world props are exactly that
    // hostile); try_cast yields NULL and the sum skips it — DuckDB
    // TRY_CAST semantics, oracle-matched
    events(s, d)
      .withColumn("k_val",
        get_json_object(col("props"), "$.k").try_cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k_val")).as("k_sum"), count(lit(1)).as("n_events"))

  /** Tumbling 1-hour window (batch form of the streaming aggregation —
    * `window()` here is byte-identical to the Structured Streaming plan). */
  def q24HourlyEvents(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("value_sum"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n_events"), col("value_sum"))

  /** Session windows (1h inactivity gap) per user — batch form of
    * `session_window`; the oracle reproduces it as gaps-and-islands. */
  def q25Sessionize(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("value_sum"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("value_sum"))

  /**
   * q161: k-anonymity / l-diversity audit over behavioral user profiles
   * (Sweeney 2002; Machanavajjhala et al. 2007) — the privacy-RISK
   * counterpart of q82's PII redaction: even with identifiers stripped,
   * a user whose QUASI-IDENTIFIER profile (dominant event type, activity
   * band, first-active hour-of-day band) lands in an equivalence class
   * of k < 5 users is re-identifiable by linkage, and a class whose
   * sensitive attribute (here: whether the user ever emitted an `error`
   * event) takes l < 2 distinct values leaks it even at safe k. One row
   * per equivalence class with k, l and the release verdict — the table
   * a data-release decision reads before events ship in a corpus.
   *
   * 100 TB shape: two user-keyed aggregates (the profile, and a
   * dominant-type window over per-(user, type) counts — group size =
   * |event types|, a constant) and one class-keyed aggregate; events
   * never shuffle by anything wider than user_id. Bands are CASE /
   * integer-division expressions and every output column is
   * integer/string/boolean — nothing can fork engines. Deterministic
   * dominant type: count desc, type asc NULLS LAST, spelled identically
   * in both engines (Spark's asc defaults NULLS FIRST — the explicit
   * NULLS LAST is load-bearing).
   */
  def kAnonymityAudit(s: SparkSession, d: String): DataFrame =
    kAnonymityAuditOf(events(s, d))

  /** [[kAnonymityAudit]] over an arbitrary (user_id, event_type, ts)
    * frame — lets specs plant controlled equivalence classes. */
  def kAnonymityAuditOf(ev: DataFrame): DataFrame = {
    val ue = ev.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
    val perUserType = ue.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val dominant = perUserType
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("cnt").desc, col("event_type").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("dominant_type"))
    val profile = ue.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("sens"))
      .withColumn("activity_band",
        when(col("n_events") >= 64, ">=64")
          .when(col("n_events") >= 16, "16-63")
          .when(col("n_events") >= 4, "4-15")
          .otherwise("1-3"))
      .withColumn("hour_band", expr("hour(first_ts) DIV 6").cast("long"))
    profile.join(dominant, "user_id")
      .groupBy(col("dominant_type"), col("activity_band"), col("hour_band"))
      .agg(count(lit(1)).cast("long").as("k_users"),
        countDistinct(col("sens")).cast("long").as("l_sensitive"))
      .withColumn("risky",
        col("k_users") < 5 || col("l_sensitive") < 2)
  }

  /**
   * The reference's core capability as a query: incremental upsert (op I-3).
   * Two synthetic "dumps" of orders (dump 2 re-ships every 10th order with a
   * changed price); the engine's Merge.dedupLatest picks last-writer-wins
   * per PK regardless of replay order.
   */
  def q26MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    val dump1 = base.withColumn("src_seq", lit(1))
    val dump2 = base
      .filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100000.0)
      .withColumn("src_seq", lit(2))
    Merge.dedupLatest(dump1.unionByName(dump2), Seq("o_orderkey"), "src_seq")
      .select(col("o_orderkey"), col("o_totalprice"), col("src_seq"))
  }

  /** Fixed manifest for q27 — dump-selection filters F-1..F-3 + SO-1 on
    * literal data, exercising the real Manifest code path. */
  val manifestFixture: Seq[DumpInList] = Seq(
    DumpInList("d1", 1, 10, finished = true, "2024-01-01T00:00:00Z", "v2"),
    DumpInList("d2", 2, 10, finished = false, "2024-01-02T00:00:00Z", "v2"),
    DumpInList("d3", 3, 10, finished = true, "2024-01-03T00:00:00Z", "v1"),
    DumpInList("d4", 4, 10, finished = true, "2024-01-04T00:00:00Z", "v2"),
    DumpInList("d5", 5, 10, finished = true, "2024-01-05T00:00:00Z", "v2"))

  def q27DumpFilters(s: SparkSession, d: String): DataFrame = {
    val (selected, _) = Manifest.selectDumps(
      Manifest.dumpsDF(s, manifestFixture),
      processed = Set("d1"),
      latestSchemaVersion = "v2",
      onlyLoadFinal = false)
    selected.select(col("dumpId").as("dump_id"), col("sequence"), col("schemaVersion").as("schema_version"))
  }

  /** Filename split (op SC-4) as a distributed regexp over a literal frame —
    * cross-checked against DuckDB's regexp_extract. */
  val fileNameFixture: Seq[String] = Seq(
    "user_dim-00000-abc123ef.gz",
    "assignment_fact-00017-0099ffee.gz",
    "requests-00001-deadbeef.gz",
    "noDashFile.gz",
    "too-many-dash-parts.gz")

  val fileNamePattern = "^([a-z_0-9]+)-([0-9]+)-([0-9a-f]+)\\.(gz)$"

  def q28FileNameParse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    fileNameFixture.toDF("file_name").select(
      col("file_name"),
      regexp_extract(col("file_name"), fileNamePattern, 1).as("table_name"),
      regexp_extract(col("file_name"), fileNamePattern, 2).as("shard_part"),
      regexp_extract(col("file_name"), fileNamePattern, 3).as("hash_part"),
      regexp_extract(col("file_name"), fileNamePattern, 4).as("extension"))
  }

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`) — the order-statistics surface. */
  def q45Percentiles(s: SparkSession, d: String): DataFrame =
    // spread: the builtin percentile buffers every value map-side; on a
    // single-row-group scan that buffering runs on one core (measured
    // 3.1s → 2.3s at sf0.1 with the spread)
    spread(s, lineitem(s, d))
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("price_p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 6).as("price_p75"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
        count(lit(1)).as("n_rows"))

  /** HyperLogLog++ sketch counts — the approximate-distinct scale path
    * (sketches merge associatively across partitions; at 100 TB this is
    * the only affordable distinct). PRODUCTION form: sketch only, never
    * pays the exact-distinct shuffle. SketchBoundsSpec asserts the error
    * bound; the q46 GATE query ([[q46ApproxDistinct]]) additionally
    * replays the exact side so the bound itself is driver-hashable. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n_rows"))

  /** q46 gate query: the HLL sketch of [[approxDistinct]] judged against
    * the exact distinct IN the query, so the hashed output is fully
    * deterministic and the oracle can replay it — exact count, row count,
    * and a `bound_ok` flag (|approx−exact|/exact ≤ 10%, generous vs the
    * 2% rsd sketch; HLL register-max merge is order-independent, so the
    * flag cannot flap with partitioning). The oracle emits TRUE: a sketch
    * drifting out of bound IS a hash mismatch. The exact-distinct shuffle
    * is the verification harness's cost, not the production path's —
    * that's [[approxDistinct]]. */
  def q46ApproxDistinct(s: SparkSession, d: String): DataFrame =
    // NOT spread — re-validated at BOTH bench scales (r19 + r20 VERDICT
    // item 8): at sf0.1 the repartition's local sort + exchange cost
    // more than the parallelism buys (1.55 s -> 1.86 s, r19); at sf1
    // (10x lineitem, 16-file scan) the spread WINS (2.05 -> 1.70 s, r20)
    // because the heavier distinct partials clear the fan-out bar there.
    // Kept unspread: on any real 100 TB input the scan already has >=
    // parallelism partitions and Tables.spread is the IDENTITY, so the
    // sf1 win has no production analogue, while the sf0.1 cost lands
    // directly on the driver's bench gate.
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= col("exact_parts") * 0.10).as("bound_ok"))

  /** [[q45Percentiles]] recomputed through the sort-based
    * [[graft.operators.ExactPercentile]] — identical values (same oracle
    * SQL hash-checks both), but no per-group value buffering: the exact
    * order-statistics path that survives 100× group sizes. */
  def q73PercentilesSorted(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    // group list + count(*) from the SOURCE, not the percentile pass:
    // ExactPercentile drops null measures before ranking, so a (hostile)
    // group whose values are all NULL would otherwise vanish — and its
    // non-null count is not the oracle's count(*). Left-joins are
    // null-SAFE on the group key: NULL l_returnflag is a real group.
    val groups = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows"))
    val price = ExactPercentile.of(li, "l_returnflag", "l_extendedprice",
      Seq(("price_p25", 0.25), ("price_p50", 0.5), ("price_p75", 0.75)))
      .withColumnRenamed("l_returnflag", "__rf1")
    val qty = ExactPercentile.of(li, "l_returnflag", "l_quantity",
      Seq(("qty_p50", 0.5)))
      .withColumnRenamed("l_returnflag", "__rf2")
    groups
      .join(price, col("l_returnflag") <=> col("__rf1"), "left").drop("__rf1")
      .join(qty, col("l_returnflag") <=> col("__rf2"), "left").drop("__rf2")
      .select(col("l_returnflag"), col("price_p25"), col("price_p50"),
        col("price_p75"), col("qty_p50"), col("n_rows"))
  }

  /** Approximate percentiles — the 100×-safe order-statistics path: Spark's
    * `approx_percentile` (KLL-style mergeable sketch, bounded memory) where
    * [[q45Percentiles]]'s exact form buffers every group value. PRODUCTION
    * form: sketch only. SketchBoundsSpec asserts value error vs exact; the
    * q63 GATE query ([[q63PercentileApprox]]) verifies the rank guarantee
    * in-query so the driver can hash it. */
  def percentileApprox(s: SparkSession, d: String, accuracy: Int = 10000): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr(s"approx_percentile(l_extendedprice, 0.25, $accuracy)"), 6).as("price_p25"),
        round(expr(s"approx_percentile(l_extendedprice, 0.5, $accuracy)"), 6).as("price_p50"),
        round(expr(s"approx_percentile(l_extendedprice, 0.75, $accuracy)"), 6).as("price_p75"),
        round(expr(s"approx_percentile(l_quantity, 0.5, $accuracy)"), 6).as("qty_p50"),
        count(lit(1)).as("n_rows"))

  /** q63 gate query: each sketch percentile of [[percentileApprox]] is
    * judged against its RANK GUARANTEE in the query — `approx_percentile`
    * returns an actual element v with rank within ±1/accuracy of the
    * target, so `count(x ≤ v) ≥ ⌈(p−ε)·n⌉ ∧ count(x < v) ≤ (p+ε)·n`
    * must hold for ANY sketch merge order (the GK/KLL guarantee is
    * merge-order-independent even though the returned v is not). The
    * hashed output is the per-group row count plus one boolean per
    * percentile; the oracle emits TRUE — a sketch violating its published
    * bound IS a hash mismatch. Costs one extra broadcast-join scan over
    * the table (4-row build side), which is the harness's cost; the
    * production path is [[percentileApprox]]. */
  def q63PercentileApprox(s: SparkSession, d: String, accuracy: Int = 10000): DataFrame = {
    val eps = 1.0 / accuracy
    val ap = percentileApprox(s, d, accuracy)
      .select(col("l_returnflag"), col("price_p25"), col("price_p50"),
        col("price_p75"), col("qty_p50"))
    // Spark's guarantee is floor-based: the returned element's rank lies in
    // [floor((p−ε)·n), ceil((p+ε)·n)] — observed exactly at the lower
    // floor on sf0.01 group N, so a ceil lower bound is one too strict
    def okFlags(cntLe: Column, cntLt: Column, p: Double, n: Column): Column =
      cntLe >= floor(n * (p - eps)) && cntLt <= ceil(n * (p + eps))
    lineitem(s, d)
      // null-SAFE join key: a NULL l_returnflag is a real group that a
      // plain equi-join would silently drop from the gate; and the rank
      // bounds use each measure's NON-NULL count (the sketch's universe —
      // count(*) would widen the window by the hostile null rows), while
      // the reported n_rows stays the oracle's count(*)
      .join(broadcast(ap.withColumnRenamed("l_returnflag", "__rf")),
        col("l_returnflag") <=> col("__rf"))
      .drop("__rf")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_extendedprice").isNotNull, 1L).otherwise(0L)).as("np"),
        sum(when(col("l_quantity").isNotNull, 1L).otherwise(0L)).as("nq"),
        sum(when(col("l_extendedprice") <= col("price_p25"), 1L).otherwise(0L)).as("le25"),
        sum(when(col("l_extendedprice") < col("price_p25"), 1L).otherwise(0L)).as("lt25"),
        sum(when(col("l_extendedprice") <= col("price_p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") < col("price_p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("price_p75"), 1L).otherwise(0L)).as("le75"),
        sum(when(col("l_extendedprice") < col("price_p75"), 1L).otherwise(0L)).as("lt75"),
        sum(when(col("l_quantity") <= col("qty_p50"), 1L).otherwise(0L)).as("leq"),
        sum(when(col("l_quantity") < col("qty_p50"), 1L).otherwise(0L)).as("ltq"))
      .select(col("l_returnflag"), col("n_rows"),
        okFlags(col("le25"), col("lt25"), 0.25, col("np")).as("p25_ok"),
        okFlags(col("le50"), col("lt50"), 0.50, col("np")).as("p50_ok"),
        okFlags(col("le75"), col("lt75"), 0.75, col("np")).as("p75_ok"),
        okFlags(col("leq"), col("ltq"), 0.50, col("nq")).as("qty_ok"))
  }

  /** Pivot (explicit value list keeps the plan single-pass map-side). */
  def q47Pivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,6)")), 2).cast("double"))

  /** As-of join: each event picks up the user's latest order at-or-before
    * the event time (point-in-time lookup). One shuffle per side via the
    * union+window formulation — see [[graft.operators.AsOfJoin]]. Oracle:
    * DuckDB's native ASOF LEFT JOIN. */
  def q48AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ords = AsOfJoin.latestPerKeyTs(
      orders(s, d).select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey")),
      "user_id", "o_orderdate", "o_orderkey")
    AsOfJoin.asof(
      events(s, d).select(col("event_id"), col("user_id"), col("ts")),
      ords, "user_id", "ts", "o_orderdate", Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("asof_orderkey"))
  }

  /**
   * Interval (range) join: per event, aggregate the same user's orders in
   * the trailing 30 days — the point-in-range companion to the as-of
   * join's point-in-time lookup. Plan shape: ONE shuffle hash join on the
   * equi key (user), the time-range predicate evaluated as the join
   * residual — at scale the equi key partitions the work and no
   * cross-product ever forms; per-user order lists are small and uniform.
   */
  def q67IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    val o = orders(s, d).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_totalprice"))
    e.join(o,
        e("user_id") === o("user_id") &&
          col("o_orderdate") <= col("ts") &&
          col("o_orderdate") >= col("ts") - expr("INTERVAL 30 DAYS"),
        "left")
      .groupBy(col("event_id"), e("user_id"))
      .agg(
        count(col("o_orderdate")).as("n_recent_orders"),
        round(coalesce(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), lit(0.0)), 2).as("recent_spend"))
  }

  /**
   * Statistical anomaly detection: z-score of hourly event counts against
   * each event type's own distribution (aggregate once, then a partition
   * window for the moments — two shuffles total, both on small aggregated
   * data). Flag compares the ROUNDED score so both engines agree at the
   * boundary.
   */
  def q71Anomaly(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    hourly
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev_samp(col("n")).over(w))
      .filter(col("sd") > 0)
      .withColumn("z", round((col("n") - col("mu")) / col("sd"), 6))
      .select(col("bucket"), col("event_type"), col("n"), col("z"),
        (abs(col("z")) > 3).as("is_anomaly"))
  }

  /**
   * Two-role dimension join (TPC-H Q7 flavor): revenue flows between the
   * CUSTOMER's nation and the SUPPLIER's nation — the same dimension table
   * joined twice in different roles, both broadcast. Exercises a 6-table
   * join graph (lineitem→orders→customer→nation ×2 + supplier).
   */
  def q72TradeFlows(s: SparkSession, d: String): DataFrame = {
    val n1 = nation(s, d).select(
      col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = nation(s, d).select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(col("cust_nation"), col("supp_nation"),
        year(col("o_orderdate")).as("yr"))
      .agg(
        // sum in decimal: with 4k+ small groups, double-summation order
        // jitter (~1e-10) lands on cent-rounding boundaries a handful of
        // times per run; decimal addition is exact and order-independent,
        // so the rounded result is engine- and partitioning-stable
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** GROUPING SETS (mixed subtotal shapes in one pass). */
  def q49GroupingSets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** RANGE-frame window: trailing 30-day spend per customer. Value-based
    * frames are tie-safe (all peer rows included), so no tie-break needed. */
  def q50TrailingSpend(s: SparkSession, d: String): DataFrame = {
    // NTZ → LTZ (session tz is pinned UTC) → epoch seconds: RANGE frames
    // need a numeric ordering; 30 days = 2 592 000 s matches the oracle's
    // INTERVAL frame because o_orderdate is midnight-valued.
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      decSumOver(col("o_totalprice"), w).as("trailing_30d"))
  }

  /** Salted two-phase aggregation (skew path) — must equal the plain
    * GROUP BY, which is exactly what the oracle checks. */
  def q51SaltedAgg(s: SparkSession, d: String): DataFrame =
    Skew.saltedSumCount(lineitem(s, d), "l_suppkey", "l_quantity", "l_orderkey", factor = 8)

  /** Sliding windows (1h size, 15m slide) in batch — every event lands in
    * exactly 4 overlapping windows; same plan Structured Streaming uses. */
  def q53SlidingWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("value_sum"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** DISTINCT projection (dedup on the projected tuple). */
  def q54DistinctFlags(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** TPC-H Q13 shape: LEFT OUTER join + two-level aggregation — customers
    * by how many orders they have, including the zero-order customers an
    * inner join would drop. */
  def q55CustomerOrderDist(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col): non-null only
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** FULL OUTER join: supplier roster vs suppliers seen in lineitem. */
  def q56SupplierReconcile(s: SparkSession, d: String): DataFrame = {
    val seen = lineitem(s, d).select(col("l_suppkey")).distinct()
    supplier(s, d)
      .join(seen, col("s_suppkey") === col("l_suppkey"), "full_outer")
      .select(
        coalesce(col("s_suppkey"), col("l_suppkey")).as("suppkey"),
        col("s_suppkey").isNotNull.as("in_supplier"),
        col("l_suppkey").isNotNull.as("in_lineitem"))
  }

  /** Ranking-function suite: rank, dense_rank, percent_rank, cume_dist,
    * ntile over a deterministic (price desc, key) order per customer. */
  def q60RankSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      round(percent_rank().over(w), 6).as("prnk"),
      round(cume_dist().over(w), 6).as("cdist"),
      ntile(4).over(w).as("quartile"))
  }

  /** Date-part extraction: order counts by (year, quarter, month, dow). */
  def q61DateParts(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mon"),
        dayofweek(col("o_orderdate")).as("dow")) // 1=Sunday in both engines
      .agg(count(lit(1)).as("n_orders"))

  /** Scalar math + conditional-expression suite over lineitem. */
  def q62ScalarSuite(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        // domain-guarded: sqrt of a negative (hostile) price is undefined
        // ⇒ NULL on both engines — Spark would silently yield NaN where
        // DuckDB ERRORS, so the guard is the only cross-engine-stable form
        when(col("l_extendedprice") >= 0,
          round(sqrt(col("l_extendedprice")), 6)).as("price_sqrt"),
        round(pow(col("l_discount") + 1.0, 2), 6).as("disc_sq"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"))
  def q29HistoricalRefresh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val files = Seq(
      ("dumpA", "requests-00000-aa.gz"),
      ("dumpA", "requests-00001-bb.gz"),
      ("dumpB", "requests-00000-cc.gz"),
      ("dumpB", "user_dim-00000-dd.gz"))
      .toDF("dump_id", "filename")
    files.groupBy(col("dump_id"))
      .agg(min(col("filename").rlike(Manifest.RequestsRegex)).as("is_historical"))
  }

  /**
   * q113: cohort retention matrix — the funnel's sibling in product
   * analytics: users are cohorted by their first-activity hour and the
   * matrix reports, per (cohort, hour offset), how many of that cohort
   * were active again. Hour granularity because the fixture's event
   * stream spans hours, not days — the shape is identical at daily/
   * weekly grain.
   *
   * Scale shape: the corpus collapses to DISTINCT (user, hour) activity
   * rows in one map-side-combined aggregate (the expensive dedup happens
   * before any join); the cohort table is user-sized and joins back on
   * user_id; the final matrix is |cohorts| × |offsets| rows. NULL users
   * drop at the cohort join on both engines.
   */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
    val active = ev.distinct()
    val cohorts = active.groupBy(col("user_id")).agg(min(col("h")).as("cohort_h"))
    active.join(cohorts, Seq("user_id"))
      .withColumn("offset_h",
        ((unix_micros(col("h").cast("timestamp_ltz")) -
          unix_micros(col("cohort_h").cast("timestamp_ltz"))) /
          lit(3600000000L)).cast("long"))
      .groupBy(col("cohort_h"), col("offset_h"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(cohorts.groupBy(col("cohort_h"))
        .agg(count(lit(1)).as("cohort_size")), Seq("cohort_h"))
      .select(col("cohort_h").cast("timestamp_ntz").as("cohort_h"),
        col("offset_h"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /**
   * q112: join-key skew audit — the diagnostic a 100 TB operator runs
   * BEFORE a shuffle melts down: for every join/aggregation key column
   * in the warehouse, total rows, distinct keys, the hottest key's
   * frequency, and the skew ratio (max_freq · n_distinct / n — 1.0 for
   * a uniform key, ≫ 1 when one key would hot-spot its shuffle
   * partition). This is the measurement that decides between a plain
   * shuffle, AQE skew splitting, and the salting operator
   * ([[graft.operators.Skew]]).
   *
   * One map-side-combined aggregate per column, each collapsing to a
   * single row (the per-key intermediate is distinct-key-sized); the
   * hottest key is a deterministic `max(struct(freq, key))` — frequency
   * ties resolve to the lexicographically greatest key on both engines.
   * NULL keys profile as the literal '<NULL>' bucket rather than
   * vanishing.
   */
  def skewProfile(s: SparkSession, d: String): DataFrame = {
    // one SCAN per table: the profiled columns explode to (column_name,
    // key) structs in-row, so lineitem's three join keys cost one read of
    // the 100 TB fact table, not three (the per-column aggregations need
    // their own shuffles regardless — those are distinct-key-sized — but
    // the scan is the corpus-sized cost). skew_ratio multiplies in DOUBLE:
    // the 64-bit integer product max_freq·n_distinct silently wraps at
    // the cardinalities this audit exists for (~1e10 distinct keys with a
    // ~1e9 hot key), while the double product is exact until 2^53 and
    // degrades gracefully past it.
    def profile(df: DataFrame, table: String, cols: Seq[String]): DataFrame =
      df.select(explode(array(cols.map(c =>
          struct(lit(c).as("column_name"),
            coalesce(col(c).cast("string"), lit("<NULL>")).as("key"))): _*))
          .as("e"))
        .select(col("e.column_name").as("column_name"), col("e.key").as("key"))
        .groupBy(col("column_name"), col("key"))
        .agg(count(lit(1)).as("f"))
        .groupBy(col("column_name"))
        .agg(
          sum(col("f")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          max(col("f")).as("max_freq"),
          max(struct(col("f"), col("key"))).getField("key").as("top_key"))
        .select(lit(table).as("table_name"), col("column_name"),
          col("n_rows"), col("n_distinct"), col("max_freq"),
          round(col("max_freq").cast("double") * col("n_distinct") /
            col("n_rows"), 6).as("skew_ratio"),
          col("top_key"))
    Seq(
      profile(lineitem(s, d), "lineitem",
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      profile(orders(s, d), "orders", Seq("o_custkey")),
      profile(Tables.events(s, d), "events", Seq("user_id")),
      profile(Tables.documents(s, d), "documents", Seq("source", "lang")))
      .reduce(_ unionByName _)
  }

  /**
   * q109: sequential event funnel — per user, the earliest step-1 event,
   * then the earliest step-2 event strictly AFTER it, and so on (the
   * strict-ordering product-analytics funnel, not mere per-type
   * existence). Output per step: users reached, conversion vs step 1,
   * and the mean seconds from the user's step-1 time (decimal-summed).
   *
   * Shape: one chained per-user aggregate per step — each stage filters
   * the event scan to ONE type, joins the (user-sized, far smaller than
   * events) previous-stage frame, and min-aggregates with map-side
   * partials; no window over the event stream, nothing user-quadratic.
   * NULL user_ids drop at the first join on both engines (SQL equi-join
   * semantics mirrored exactly — step 1 keeps the NULL group, so the
   * base count matches too). Degenerate base (no step-1 events) reports
   * NULL conversion, not NaN.
   */
  def eventFunnel(s: SparkSession, d: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    eventFunnelOf(Tables.events(s, d), steps)

  /** [[eventFunnel]] over an arbitrary (user_id, event_type, ts) frame. */
  def eventFunnelOf(ev0: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val ev = ev0.select(col("user_id"), col("event_type"), col("ts"))
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val frames = steps.tail.zipWithIndex.scanLeft((first, "t1")) {
      case ((prev, pcol), (st, i)) =>
        val c = s"t${i + 2}"
        (ev.filter(col("event_type") === st)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(pcol))
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as(c), max(col("t1")).as("t1")), c)
    }
    def stepRow(frame: DataFrame, name: String, tk: String) =
      frame.agg(
        count(lit(1)).as("n_users"),
        // events ts is TIMESTAMP_NTZ; session TZ is pinned UTC so the
        // LTZ cast is value-identical and unix_micros resolves
        round(sum(round((unix_micros(col(tk).cast("timestamp_ltz")) -
            unix_micros(col("t1").cast("timestamp_ltz"))) /
            lit(1000000.0), 12).cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("avg_secs"))
        .withColumn("step", lit(name))
    val rows = frames.zip(steps).zipWithIndex.map {
      case (((f, tk), st), i) => stepRow(f, s"${i + 1}_$st", tk)
    }.reduce(_ unionByName _)
    val base = first.agg(count(lit(1)).as("base_n"))
    rows.crossJoin(broadcast(base))
      .select(col("step"), col("n_users"),
        round(when(col("base_n") > 0,
          col("n_users").cast("double") / col("base_n")), 6)
          .as("conv_from_first"),
        col("avg_secs"))
  }

  /**
   * q117: dump-to-dump snapshot diff — the lineage audit every versioned
   * corpus needs between two ingests: per source, how many documents were
   * added, removed, revised, or untouched. The reference's hourly-dump
   * model makes this the first question after any re-import ("what did
   * dump N+1 actually change?"); on a training corpus it is the
   * change-control artifact that decides whether downstream dedup /
   * mixture passes must rerun.
   *
   * The two snapshots derive DETERMINISTICALLY from the one fixture table
   * (the q82 planting discipline, identical on both engines): the OLD
   * snapshot lacks every doc with `doc_id % 17 == 3` (later additions)
   * and carries a revised text hash for `doc_id % 23 == 5`; the NEW
   * snapshot lacks `doc_id % 19 == 7` (deletions). The OPERATOR is the
   * general diff: project both sides to (doc_id, source, content hash) —
   * 3 narrow columns, the 100 TB text mass never moves — full-outer-join
   * on the key, classify with null-safe hash comparison, aggregate per
   * source. One doc_id-keyed shuffle per side; at real scale both sides
   * would arrive bucketed by doc_id from the landing layout and the join
   * would be co-located.
   */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    val oldSnap = base
      .filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 23 === 5,
          md5(concat(lit("rev0:"), coalesce(col("text"), lit("∅")))
            .cast("binary")))
          .otherwise(md5(col("text").cast("binary"))).as("h_old"))
    val newSnap = base
      .filter(col("doc_id") % 19 =!= 7)
      .select(col("doc_id"), col("source").as("source_new"),
        md5(col("text").cast("binary")).as("h_new"))
    oldSnap.withColumn("in_old", lit(1))
      .join(newSnap.withColumn("in_new", lit(1)), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source"), col("source_new")).as("src"),
        col("in_old"), col("in_new"), col("h_old"), col("h_new"))
      .groupBy(col("src").as("source"))
      .agg(
        sum(when(col("in_old").isNotNull, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("in_new").isNotNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("in_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("in_old").isNotNull && col("in_new").isNotNull &&
          !(col("h_old") <=> col("h_new")), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("in_old").isNotNull && col("in_new").isNotNull &&
          (col("h_old") <=> col("h_new")), 1L).otherwise(0L)).as("n_unchanged"))
  }
}

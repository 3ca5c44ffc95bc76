package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator battery over the driver's TPC-H-ish tables.
  *
  * Every query here has a DuckDB oracle (same column names, floats
  * rounded identically on both sides so order-of-summation ulp noise
  * cannot flip the driver's hash compare).
  *
  * Scale notes (100 TB design intent, tested at sf<=0.1):
  *  - small dims (region/nation/customer/supplier/part) are broadcast;
  *    only fact-fact joins shuffle, keyed on the join column.
  *  - aggregations are partial (map-side combine) by construction —
  *    plain `groupBy(...).agg` compiles to HashAggregate(partial) →
  *    shuffle → HashAggregate(final).
  *  - filters/projections sit directly on the parquet scan
  *    (PushedFilters / ReadSchema pruning).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Round a double column to `s` decimals — mirrored in the oracle SQL. */
  private def r(c: Column, s: Int): Column = round(c, s)

  /** Exact, order-independent sum of a double measure: accumulate in
    * DECIMAL (so partial-aggregation order cannot shift the value),
    * round, return DOUBLE. Mirrored in each oracle as
    * `CAST(round(sum(CAST(x AS DECIMAL(18,6))), s) AS DOUBLE)`.
    */
  private def dsum(c: Column, s: Int): Column =
    round(sum(c.cast("decimal(18,6)")), s).cast("double")

  /** Exact-sum average: decimal sum, double division by count. */
  private def davg(c: Column, s: Int): Column =
    round(sum(c.cast("decimal(18,6)")).cast("double") / count(lit(1)), s)

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: scan-heavy groupBy with partial aggregation.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 3).as("sum_qty"),
          dsum(col("l_extendedprice"), 3).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 3).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 3).as("sum_charge"),
          davg(col("l_quantity"), 4).as("avg_qty"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Broadcast-dim star join: revenue per region/nation.
    "q02_revenue_by_nation" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val rg = Tables.region(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(rg), n("n_regionkey") === rg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("o_totalprice"), 3).as("revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // Fact-fact shuffle join + top-k with deterministic tiebreak.
    "q03_top_orders" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      // revenue accumulates in DECIMAL so the sum is exact and
      // order-independent — double summation order differs between
      // engines and flips round()-boundary cases at larger SFs
      li.groupBy(col("l_orderkey"))
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")), 3).cast("double").as("revenue"))
        .join(o, col("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"), col("revenue"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Window function: latest 3 orders per customer, then aggregate.
    "q04_recent_orders_per_customer" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_recent"),
             dsum(col("o_totalprice"), 2).as("recent_total"))
    }),

    // Selective filter + narrow projection: raw rows, exact values.
    "q05_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 48 && col("l_discount") > 0.08 &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"),
          r(col("l_extendedprice"), 2).as("price"),
          col("l_returnflag"))
    }),

    // Distinct (shuffle dedup on grouping key).
    "q06_distinct_flags" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
    }),

    // Left-semi join (EXISTS).
    "q07_customers_with_big_orders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Left-anti join (NOT EXISTS with correlated predicate).
    "q08_customers_without_orders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 350000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
    }),

    // Union + distinct aggregation across two sources.
    "q09_account_holders_by_nation" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").cast("int").as("nationkey"),
                r(col("c_acctbal"), 2).as("acctbal"))
      val sup = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("int").as("nationkey"),
                r(col("s_acctbal"), 2).as("acctbal"))
      c.unionByName(sup)
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_accounts"),
             dsum(col("acctbal"), 2).as("total_bal"))
    }),

    // Order-by + limit with unique tiebreak.
    "q10_priciest_parts" -> ((s, d) => {
      Tables.part(s, d)
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        .limit(20)
        .select(col("p_partkey"), col("p_name"),
          r(col("p_retailprice"), 2).as("retail"))
    }),

    // Conditional aggregation (CASE WHEN buckets).
    "q11_event_type_stats" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value"), 3).as("total_value"),
          sum(when(col("value") > 100, 1).otherwise(0)).as("n_large"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // Time bucketing (hour truncation) — output epoch seconds.
    "q12_hourly_events" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 3).as("v"))
    }),

    // Window lag: inter-event gap per user in whole seconds.
    "q13_user_event_gaps" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("sec", floor(unix_timestamp(col("ts"))))
        .withColumn("prev_sec", lag(col("sec"), 1).over(w))
        .filter(col("prev_sec").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
             r(avg(col("sec") - col("prev_sec")), 4).as("avg_gap_sec"),
             max(col("sec") - col("prev_sec")).as("max_gap_sec"))
    }),

    // Per-group existence flags (meta_exists / F7-A7 analog).
    "q14_user_activity_flags" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_purchase"),
          max(when(col("event_type") === "error", 1).otherwise(0)).as("has_error"),
          countDistinct(col("event_type")).as("n_types"))
    }),

    // Rank within group (dense ranking over aggregate).
    "q15_part_rank_by_brand" -> ((s, d) => {
      val p = Tables.part(s, d)
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      p.withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 2)
        .select(col("p_brand"), col("rnk"), col("p_partkey"),
          r(col("p_retailprice"), 2).as("retail"))
    }),

    // Rollup (grouping sets): subtotals per (flag, status), per flag,
    // and grand total in ONE pass — partial aggregation handles the
    // rollup expansion map-side, so it costs the same single shuffle
    // as the plain groupBy.
    "q20_rollup_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_quantity"), 3).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
    }),

    // Exact interpolated percentiles per group. Spark's percentile
    // aggregates a value->count map per group (memory bounded by
    // DISTINCT values, not rows — prices here are bounded); at true
    // 100 TB cardinality switch to approx_percentile, which this
    // oracle-exact variant deliberately does not use.
    "q21_price_percentiles" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.9))")
          .as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p25"),
          round(element_at(col("ps"), 2), 4).as("p50"),
          round(element_at(col("ps"), 3), 4).as("p75"),
          round(element_at(col("ps"), 4), 4).as("p90"))
    }),

    // Pivot with EXPLICIT values: no extra distinct-scan pass to
    // discover the pivot domain, and the output schema is static —
    // both required for a sane 100 TB plan.
    "q22_pivot_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum(col("l_extendedprice"), 2))
        .select(col("l_linestatus"),
          coalesce(col("A"), lit(0.0)).as("rev_a"),
          coalesce(col("N"), lit(0.0)).as("rev_n"),
          coalesce(col("R"), lit(0.0)).as("rev_r"))
    }),

    // Set operations: INTERSECT/EXCEPT both plan as hash aggregates +
    // a single shuffle on the compared column (semi/anti join under
    // the hood) — never a sort-based distinct.
    "q24_set_ops" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("int").as("nationkey"))
      c.intersect(sup).withColumn("which", lit("both"))
        .unionByName(c.except(sup).withColumn("which", lit("customer_only")))
        .unionByName(sup.except(c).withColumn("which", lit("supplier_only")))
    }),

    // Correlation/covariance via DECIMAL-exact moment sums: the five
    // moments accumulate exactly (order-independent), then both
    // engines run the IDENTICAL double formula — so corr is
    // bit-deterministic where a streaming Welford implementation
    // would differ per partition order. One partial-agg pass.
    "q23_correlation" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("l_quantity").cast("decimal(18,6)"))
            .cast("double").as("sx"),
          sum(col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double").as("sy"),
          sum((col("l_quantity") * col("l_quantity"))
            .cast("decimal(28,6)")).cast("double").as("sxx"),
          sum((col("l_extendedprice") * col("l_extendedprice"))
            .cast("decimal(28,6)")).cast("double").as("syy"),
          sum((col("l_quantity") * col("l_extendedprice"))
            .cast("decimal(28,6)")).cast("double").as("sxy"))
        .select(col("l_returnflag"),
          col("n").cast("long").as("n_rows"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * (col("n") - 1)), 4).as("covar_samp"))
    }),

    // Salted skew join (graft.ops.Skew.saltedJoin): half of all
    // lineitem rows are collapsed onto supplier 0 — the hot-key shape
    // that stalls one reducer at scale. The fact side is salted into 8
    // deterministic sub-keys (derived from l_orderkey, no rand()) and
    // the dim side replicated 8x, so key 0 spreads over 8 reducers;
    // the merge hint forces the shuffle join the pattern exists for
    // (a broadcastable dim would hide the skew entirely).
    "q25_salted_skew_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(
          when(pmod(col("l_suppkey"), lit(10)) < 5, lit(0L))
            .otherwise(col("l_suppkey")).as("suppkey"),
          col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.ops.Skew
        .saltedJoin(li.hint("merge"), sup, "suppkey",
          col("l_orderkey"), 8)
        .groupBy(col("s_nationkey").cast("int").as("nationkey"))
        .agg(dsum(col("rev"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Explicit GROUPING SETS with grouping_id: (flag,status), (flag),
    // and grand total in ONE pass — like q20's rollup, the Expand node
    // multiplies rows map-side and the partial aggregate combines
    // before the single shuffle. gid disambiguates subtotal levels
    // (Spark and DuckDB both put the FIRST grouping column in the
    // most significant bit).
    "q32_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity"), 3).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("gid"), col("n"), col("sum_qty"))
    }),

    // RANGE-frame window: each event's rolling 30-minute trailing
    // sum/count over the SAME user partition q13/q18 already shuffle
    // on — one keyed exchange, one sort, a linear frame scan. The
    // range bound is on epoch-µs (numeric), so tied timestamps are
    // frame peers on both engines. The windowed sum accumulates in
    // DECIMAL: a sliding double sum would drift with add order.
    "q33_range_frame_windows" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-1800000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_30m"),
          round(sum(col("value").cast("decimal(18,6)")).over(w), 3)
            .cast("double").as("sum_30m"))
    }),

    // Forward fill (pandas `ffill` per group): 'view' events carry no
    // value here; each takes the latest prior non-null value in its
    // user's stream. running last(ignoreNulls) over one keyed window —
    // the gap-fill idiom that never self-joins.
    "q34_forward_fill" -> ((s, d) => {
      graft.ops.Fill.forwardFill(
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            when(col("event_type") =!= "view", round(col("value"), 3))
              .as("v")),
        keys = Seq("user_id"), order = Seq("ts_us", "event_id"),
        valueCol = "v", outCol = "filled")
    }),

    // Linear interpolation (pandas `interpolate(method='values')` per
    // group): null values get prev + (next-prev)*(ts-ts_prev)/
    // (ts_next-ts_prev); a lone-sided gap falls back to the existing
    // neighbor (ffill/bfill). Two frames over ONE keyed sort — the
    // backward pass reuses the forward pass's partitioning, so the
    // whole repair costs a single shuffle at any scale.
    "q35_interpolate" -> ((s, d) => {
      graft.ops.Fill.interpolate(
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            when(col("event_type") =!= "view", round(col("value"), 3))
              .as("v")),
        keys = Seq("user_id"), tsCol = "ts_us",
        order = Seq("ts_us", "event_id"), valueCol = "v",
        outCol = "interp")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          round(col("interp"), 4).as("interp"))
    }),

    // As-of join with tolerance (pandas `merge_asof(tolerance=...)`):
    // q16's match, voided when the prior view is more than 10 minutes
    // stale. The tolerance is a post-window predicate on the SAME
    // single-shuffle as-of plan — it never becomes a join condition.
    "q36_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"))
        .groupBy("user_id", "ts_us")
        .agg(max("event_id").as("view_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.asofJoin(clicks, views, Seq("user_id"),
        "ts_us", Seq("view_id"), tolerance = Some(600000000L))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("asof_ts_us").as("matched_ts_us"),
          col("asof_view_id").as("matched_view_id"))
    }),

    // Rank-function battery (pandas groupby.rank analogs): dense_rank,
    // percent_rank, cume_dist, ntile over ONE keyed window ordering —
    // four functions, one exchange + one sort. Ties broken by partkey
    // where the function itself doesn't define tie behavior (ntile).
    "q37_rank_functions" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").asc, col("p_partkey").asc)
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"),
          r(col("p_retailprice"), 2).as("retail"),
          dense_rank().over(w).cast("long").as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
    }),

    // Ordered array aggregation (pandas groupby.agg(list)): each
    // user's last-3 event types, oldest-first. collect_list carries
    // (ts, id, type) structs so the order is pinned INSIDE the
    // aggregate (collect_list alone is partition-order-dependent);
    // the window top-3 bounds the carried state before collection.
    "q38_event_history" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("user_id")
        .agg(transform(array_sort(collect_list(struct(col("ts_us"),
            col("event_id"), col("event_type")))),
          st => st.getField("event_type")).as("last3"))
        .select(col("user_id"),
          concat_ws(",", col("last3")).as("history"),
          size(col("last3")).cast("long").as("n"))
    }),

    // Z-order layout key (ops/Layout.zOrderKey): user and time
    // bucketed to 10 bits each, bits interleaved — the sort key that
    // makes parquet row-group min/max ranges tight in BOTH dimensions
    // (write-side: sortWithinPartitions(zkey)). Per-event key output
    // plus a per-zregion rollup proving locality: each 4096-key
    // Z region touches a BOUNDED band of users and times.
    "q39_zorder_layout" -> ((s, d) => {
      val zk = graft.ops.Layout.zOrderKey(
        pmod(col("user_id"), lit(1024L)),
        pmod(expr("ts_us div 3600000000"), lit(1024L)), bits = 10)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("zkey", zk)
        .groupBy(expr("zkey div 4096").as("zregion"))
        .agg(count(lit(1)).as("n"),
          countDistinct(pmod(col("user_id"), lit(1024L)))
            .as("n_user_buckets"),
          (max(pmod(col("user_id"), lit(1024L))) -
            min(pmod(col("user_id"), lit(1024L)))).as("user_span"),
          (max(pmod(expr("ts_us div 3600000000"), lit(1024L))) -
            min(pmod(expr("ts_us div 3600000000"), lit(1024L))))
            .as("hour_span"))
    }),

    // Cube (all four grouping sets of flag x status) in ONE pass —
    // like q20's rollup, Expand + partial aggregation keeps it a
    // single shuffle. Subtotal rows are labeled via grouping() (the
    // aggregation bitmask), NOT coalesce-to-sentinel: a genuinely
    // NULL key value can never be conflated with a subtotal row even
    // if the schema's never-NULL invariant changes.
    "q40_cube_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice"), 2).as("rev"),
          grouping(col("l_returnflag")).as("gf"),
          grouping(col("l_linestatus")).as("gs"))
        .select(
          when(col("gf") === 1, lit("ALL"))
            .otherwise(col("l_returnflag")).as("flag"),
          when(col("gs") === 1, lit("ALL"))
            .otherwise(col("l_linestatus")).as("status"),
          col("n"), col("rev"))
    }),

    // The six-table star join (TPC-H Q5 shape): revenue from
    // intra-nation supply chains, by nation, for one region. Scale
    // shape: region/nation/customer/supplier are all broadcast (small
    // dims at any corpus scale), so the ONLY shuffle joins are
    // orders⋈lineitem keyed on the order key and the final nation
    // rollup — dims prune both fact sides BEFORE the fact-fact join,
    // and the s_nationkey = c_nationkey identity rides the broadcast
    // supplier join as a residual condition, never a separate pass.
    "q41_local_supplier_volume" -> ((s, d) => {
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val custN = Tables.customer(s, d)
        .join(broadcast(asiaNations),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ordC = Tables.orders(s, d)
        .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
      val suppN = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ordC, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(suppN),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum((col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")), 2)
            .cast("double").as("revenue"))
    }),

    // Funnel analytics: view → click (within 10 min) → purchase
    // (within 10 min of a matched click), as TWO CHAINED tolerance
    // as-of joins — each stage is the q36 single-shuffle plan keyed
    // on user, so the whole funnel costs three keyed exchanges and
    // never an inequality nested loop. Per-user conversion counts at
    // every stage; outer joins keep users who drop out early.
    "q42_event_funnel" -> ((s, d) => {
      val tol = 600000000L // 10 min in µs
      val ev = Tables.events(s, d)
      def typed(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      val views = typed("view")
        .groupBy("user_id", "ts_us").agg(max("event_id").as("view_id"))
      val mc = graft.ops.Temporal.asofJoin(typed("click"), views,
        Seq("user_id"), "ts_us", Seq("view_id"),
        tolerance = Some(tol))
        .withColumn("has_view", col("asof_view_id").isNotNull)
        .transform(graft.core.CacheRegistry.persist(_))
      mc.count() // the as-of window feeds ca AND the purchase stage
      val matchedClicks = mc.filter(col("has_view"))
        .groupBy("user_id", "ts_us")
        .agg(max("event_id").as("click_id"))
      val mp = graft.ops.Temporal.asofJoin(typed("purchase"),
        matchedClicks, Seq("user_id"), "ts_us", Seq("click_id"),
        tolerance = Some(tol))
      val va = typed("view").groupBy("user_id")
        .agg(count(lit(1)).as("n_views"))
      val ca = mc.groupBy("user_id").agg(
        count(lit(1)).as("n_clicks"),
        sum(when(col("has_view"), 1L).otherwise(0L))
          .as("n_clicks_with_view"))
      val pa = mp.groupBy("user_id").agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("asof_click_id").isNotNull, 1L).otherwise(0L))
          .as("n_full_chain"))
      va.join(ca, Seq("user_id"), "full_outer")
        .join(pa, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_views"), lit(0L)).as("n_views"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_clicks_with_view"), lit(0L))
            .as("n_clicks_with_view"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("n_full_chain"), lit(0L)).as("n_full_chain"))
    }),

    // Stream-static enrichment: the arriving event stream joins a
    // PRECOMPUTED per-user profile snapshot via broadcast — the
    // standard production enrichment shape (stateless, no watermark,
    // no shuffle on the stream side; the profile refreshes as a
    // separate batch job). Drained with Trigger.AvailableNow into a
    // memory sink; the oracle is the batch twin of the same join.
    "q43_stream_enrich" -> ((s, d) => {
      val path = graft.core.Scratch.path(s"graft_stream_enr_${
        d.replaceAll("[^0-9a-zA-Z.]", "_")}")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      // N-shard staging (NOT coalesce(1)): this stream is stateless
      // (broadcast enrich, no watermark), so batch split order cannot
      // change the result, and a single-task staging write is the
      // pattern that becomes a bottleneck if copied to production
      ev.repartition(4).write.mode("overwrite")
        .option("header", "true").csv(path)
      val profile = ev.groupBy("user_id").agg(
        count(lit(1)).as("n_hist"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        min("ts_us").as("first_us"))
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("ts_us", LongType)))
      val src = s.readStream.schema(schema)
        .option("header", "true").csv(path)
      val enriched = src.join(broadcast(profile), Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us"), col("n_hist"), col("n_purchases"),
          (col("ts_us") === col("first_us")).as("is_first_event"),
          (col("n_purchases") >= 2L).as("repeat_purchaser"))
      graft.streaming.StreamDrain.drain(s, enriched,
        "append", "stream_enr", shufflePartitions = 4)
    }),

    // The pandas groupby.transform analog: attach a group aggregate
    // to every row WITHOUT a join — one keyed window exchange (vs the
    // aggregate + broadcast-join alternative, which costs a second
    // pass); filter rows above their own brand's mean price.
    "q44_group_transform" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
      Tables.part(s, d)
        .withColumn("brand_avg", round(
          sum(col("p_retailprice").cast("decimal(18,6)")).over(w)
            .cast("double") / count(lit(1)).over(w), 4))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select(col("p_brand"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("retail"),
          col("brand_avg"))
    }),

    // As-of join (union + running-last window; one keyed shuffle):
    // each click matched to the latest same-or-earlier view per user.
    "q16_asof_click_view" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"))
        .groupBy("user_id", "ts_us")
        .agg(max("event_id").as("view_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.asofJoin(clicks, views, Seq("user_id"),
        "ts_us", Seq("view_id"))
    }),

    // Range join (bin-bucketed equi-join, never an inequality nested
    // loop): clicks inside each purchase's 10-minute follow window.
    "q17_range_click_windows" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("interval_id"), col("user_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + lit(600000000L)).as("end_us"))
      graft.ops.Temporal.rangeJoin(clicks, intervals, Seq("user_id"),
        "ts_us", "start_us", "end_us", binWidth = 600000000L)
        .select("interval_id", "click_id", "user_id", "ts_us")
    }),

    // Sessionization: split each user's event stream at >30-minute
    // gaps (lag + running sum of session starts — ONE keyed shuffle,
    // two window passes over the same partitioning, no self-join).
    // Per-session value sums accumulate in DECIMAL so intra-session
    // aggregation order cannot shift the double result.
    "q18_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .withColumn("is_new",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"),
          round(sum(col("value").cast("decimal(18,6)")), 3)
            .cast("double").as("total_value"))
    }),

    // Stateful-streaming sessionization end-to-end: the events table
    // staged as CSV, drained through flatMapGroupsWithState
    // (StreamingRecords.sessions) with Trigger.AvailableNow. Every
    // session except each user's final (still-open) one closes on
    // arrival, so the oracle is batch sessionization minus the last
    // session per user.
    "q19_stream_sessions" -> ((s, d) => {
      val path = graft.core.Scratch.path(s"graft_stream_sessions_${
        d.replaceAll("[^0-9a-zA-Z.]", "_")}")
      // ONE staged file => ONE micro-batch: with several files the
      // source could order a later batch before earlier event times
      // and the watermark would drop them (the oracle assumes none)
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts_us",
          org.apache.spark.sql.types.LongType)))
      val stream = s.readStream.schema(schema)
        .option("header", "true").csv(path)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      // huge watermark delay: the timeout-close path depends on the
      // drain's final watermark (not oracle-expressible), so this
      // query pins the arrival-close path only — timeouts are
      // covered by StreamingSpec
      graft.streaming.StreamDrain.drain(s,
        graft.streaming.StreamingRecords
          .sessions(stream, gapUs = 1800000000L,
            watermarkDelay = "36500 days").toDF(),
        "append", "stream_sessions", shufflePartitions = 4)
    }),

    // Unpivot (q22's inverse): wide per-flag revenue back to long
    // form via Dataset.unpivot — a Generate/Expand over the wide
    // rows, no shuffle beyond q22's own aggregate.
    "q31_unpivot_revenue" -> ((s, d) => {
      queries("q22_pivot_revenue")(s, d)
        .unpivot(Array(col("l_linestatus")),
          Array(col("rev_a"), col("rev_n"), col("rev_r")),
          "metric", "revenue")
    }),

    // Sketch surface (the documented 100 TB path where exact distinct
    // counts / percentiles stop scaling): HyperLogLog++ distinct users
    // and an approx percentile per event type. Sketch estimates are
    // engine-specific, so the driver-checked contract is the
    // within-tolerance FLAG against the exact value computed in the
    // same pass — the oracle asserts the exact values and that both
    // flags hold (Spark's sketches are deterministic on fixed data,
    // so the flags are stable).
    "q27_approx_sketches" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users_exact"),
          // rsd 0.02 against a 10% check = a 5-sigma margin, so the
          // flag holds at ANY scale factor (a margin equal to the rsd
          // is a coin flip once the sketch leaves sparse mode — seen
          // failing at sf0.1)
          approx_count_distinct(col("user_id"), 0.02)
            .as("n_users_hll"),
          expr("percentile(value, 0.5)").as("p50_exact"),
          expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"))
        .select(col("event_type"), col("n_users_exact"),
          (abs(col("n_users_hll") - col("n_users_exact"))
            .cast("double") / col("n_users_exact").cast("double")
            <= 0.10).as("hll_within_10pct"),
          round(col("p50_exact"), 4).as("p50"),
          (abs(col("p50_approx") - col("p50_exact")) /
            abs(col("p50_exact")) <= 0.01).as("p50_within_1pct"))
    }),

    // Semi-structured extraction: the events `props` JSON parsed with
    // an EXPLICIT schema (from_json + StructType — one codegen'd pass,
    // no schema-inference scan, the only JSON pattern that survives
    // 100 TB), then aggregated per event type.
    "q28_json_extract" -> ((s, d) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), schema).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    }),

    // SCD2 interval construction: each user's purchase history turned
    // into validity intervals [valid_from, valid_to) via lead() over
    // ONE keyed window — the slowly-changing-dimension build a
    // warehouse load runs, one shuffle on the entity key.
    "q29_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          r(col("value"), 3).as("value"))
        .withColumn("valid_to_us",
          coalesce(lead(col("ts_us"), 1).over(w), lit(Long.MaxValue)))
        .select(col("user_id"), col("event_id"),
          col("ts_us").as("valid_from_us"), col("valid_to_us"),
          col("value"),
          (col("valid_to_us") === Long.MaxValue).as("is_current"))
    }),

    // Sliding-window aggregation (10-min windows every 5 min): Spark's
    // window() plans an Expand (each event lands in len/slide = 2
    // windows) before the partial aggregate — same single-exchange
    // shape as a plain groupBy, scaled by the overlap factor.
    "q30_sliding_windows" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 3).as("v"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("v"))
    }),

    // Watermarked stream-stream interval self-join: the events stream
    // split into purchases and clicks, inner-joined on user within a
    // 10-minute lookback. Both sides carry a watermark and the join
    // condition bounds event time on BOTH, so the state store evicts
    // buffered rows as the watermark advances — the unbounded-state
    // trap a naive stream join hits at scale. One staged file => one
    // micro-batch, so the drain's output is the complete batch join
    // and the oracle is the plain interval join.
    "q26_stream_stream_join" -> ((s, d) => {
      val path = graft.core.Scratch.path(s"graft_stream_ssj_${
        d.replaceAll("[^0-9a-zA-Z.]", "_")}")
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts_us",
          org.apache.spark.sql.types.LongType)))
      val src = s.readStream.schema(schema)
        .option("header", "true").csv(path)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("ts_us").as("c_us"))
        .withWatermark("c_ts", "1 hour")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("ts_us").as("p_us"))
        .withWatermark("p_ts", "1 hour")
      val joined = purchases.join(clicks,
        col("c_user") === col("p_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") <= col("p_ts"))
        .select(col("purchase_id"), col("click_id"),
          col("p_user").as("user_id"),
          (col("p_us") - col("c_us")).as("gap_us"))
      graft.streaming.StreamDrain.drain(s, joined,
        "append", "stream_ssj", shufflePartitions = 4)
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))),3) AS DOUBLE) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))),3) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))),3) AS DOUBLE) AS sum_disc_price,
         CAST(round(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))),3) AS DOUBLE) AS sum_charge,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/count(*),4) AS avg_qty,
         round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/count(*),6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))),3) AS DOUBLE) AS revenue,
         count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q03_top_orders" ->
      """SELECT o_orderkey, revenue, o_orderpriority FROM (
           SELECT l_orderkey, CAST(round(sum(CAST(l_extendedprice*(1-l_discount)
             AS DECIMAL(18,6))),3) AS DOUBLE) AS revenue
           FROM lineitem GROUP BY l_orderkey) rev
         JOIN orders ON l_orderkey = o_orderkey
         ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    "q04_recent_orders_per_customer" ->
      """SELECT o_custkey, count(*) AS n_recent,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))),2) AS DOUBLE) AS recent_total
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
         WHERE rn <= 3 GROUP BY o_custkey""",
    "q05_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice,2) AS price, l_returnflag
         FROM lineitem
         WHERE l_quantity >= 48 AND l_discount > 0.08 AND l_returnflag = 'R'""",
    "q06_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q07_customers_with_big_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "q08_customers_without_orders" ->
      """SELECT c_custkey, c_nationkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 350000)""",
    "q09_account_holders_by_nation" ->
      """SELECT nationkey, count(*) AS n_accounts,
         CAST(round(sum(CAST(acctbal AS DECIMAL(18,6))),2) AS DOUBLE) AS total_bal FROM (
           SELECT CAST(c_nationkey AS INT) AS nationkey,
                  round(c_acctbal,2) AS acctbal FROM customer
           UNION ALL
           SELECT CAST(s_nationkey AS INT) AS nationkey,
                  round(s_acctbal,2) AS acctbal FROM supplier) u
         GROUP BY nationkey""",
    "q10_priciest_parts" ->
      """SELECT p_partkey, p_name, round(p_retailprice,2) AS retail
         FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 20""",
    "q11_event_type_stats" ->
      """SELECT event_type, count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))),3) AS DOUBLE) AS total_value,
         CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
         count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type""",
    "q12_hourly_events" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))),3) AS DOUBLE) AS v
         FROM events GROUP BY 1""",
    "q13_user_event_gaps" ->
      """SELECT user_id, count(*) AS n_gaps,
         round(avg(sec - prev_sec),4) AS avg_gap_sec,
         max(sec - prev_sec) AS max_gap_sec
         FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS prev_sec FROM events) t
         WHERE prev_sec IS NOT NULL GROUP BY user_id""",
    "q14_user_activity_flags" ->
      """SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error,
         count(DISTINCT event_type) AS n_types
         FROM events GROUP BY user_id""",
    "q15_part_rank_by_brand" ->
      """SELECT p_brand, rnk, p_partkey, round(p_retailprice,2) AS retail
         FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk FROM part) t
         WHERE rnk <= 2""",
    "q20_rollup_summary" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
         coalesce(l_linestatus, 'ALL') AS status,
         count(*) AS n,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))),3) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q21_price_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
         round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
         round(quantile_cont(l_extendedprice, 0.75),4) AS p75,
         round(quantile_cont(l_extendedprice, 0.9),4) AS p90
         FROM lineitem GROUP BY l_returnflag""",
    "q22_pivot_revenue" ->
      """SELECT l_linestatus,
         coalesce(CAST(round(sum(CASE WHEN l_returnflag = 'A'
           THEN CAST(l_extendedprice AS DECIMAL(18,6)) END),2) AS DOUBLE), 0.0) AS rev_a,
         coalesce(CAST(round(sum(CASE WHEN l_returnflag = 'N'
           THEN CAST(l_extendedprice AS DECIMAL(18,6)) END),2) AS DOUBLE), 0.0) AS rev_n,
         coalesce(CAST(round(sum(CASE WHEN l_returnflag = 'R'
           THEN CAST(l_extendedprice AS DECIMAL(18,6)) END),2) AS DOUBLE), 0.0) AS rev_r
         FROM lineitem GROUP BY l_linestatus""",
    "q24_set_ops" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey, 'both' AS which
         FROM customer INTERSECT SELECT CAST(s_nationkey AS INT), 'both'
         FROM supplier
         UNION ALL
         (SELECT CAST(c_nationkey AS INT) AS nationkey,
            'customer_only' AS which FROM customer
          EXCEPT SELECT CAST(s_nationkey AS INT), 'customer_only'
          FROM supplier)
         UNION ALL
         (SELECT CAST(s_nationkey AS INT) AS nationkey,
            'supplier_only' AS which FROM supplier
          EXCEPT SELECT CAST(c_nationkey AS INT), 'supplier_only'
          FROM customer)""",
    "q23_correlation" ->
      """WITH m AS (SELECT l_returnflag,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
           CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy
         FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy) /
             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS corr_qty_price,
           round((n * sxy - sx * sy) / (n * (n - 1)), 4) AS covar_samp
         FROM m""",
    // the salt never appears here: salting changes the physical
    // distribution only, so the oracle is the plain join
    "q25_salted_skew_join" ->
      """WITH li AS (SELECT
           CASE WHEN l_suppkey % 10 < 5 THEN 0 ELSE l_suppkey END
             AS suppkey,
           l_extendedprice * (1 - l_discount) AS rev FROM lineitem),
         sup AS (SELECT s_suppkey AS suppkey, s_nationkey FROM supplier)
         SELECT CAST(s_nationkey AS INT) AS nationkey,
           CAST(round(sum(CAST(rev AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
         FROM li JOIN sup USING (suppkey)
         GROUP BY 1""",
    // ts -> micros mirrors Tables.events's floor(ns/1000) conversion
    "q32_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
         coalesce(l_linestatus, 'ALL') AS status,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         count(*) AS n,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))),3) AS DOUBLE)
           AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), ())""",
    "q33_range_frame_windows" ->
      """WITH e AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us, value
           FROM events)
         SELECT event_id, user_id, ts_us,
           count(*) OVER w AS n_30m,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 3)
             AS DOUBLE) AS sum_30m
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
           RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)""",
    "q34_forward_fill" ->
      """WITH e AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             CASE WHEN event_type <> 'view' THEN round(value, 3) END AS v
           FROM events)
         SELECT event_id, user_id, ts_us, v,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY ts_us ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM e""",
    "q35_interpolate" ->
      """WITH e AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             CASE WHEN event_type <> 'view' THEN round(value, 3) END AS v
           FROM events),
         f AS (SELECT *,
           last_value(v IGNORE NULLS) OVER wb AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN ts_us END
             IGNORE NULLS) OVER wb AS pt,
           first_value(v IGNORE NULLS) OVER wf AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN ts_us END
             IGNORE NULLS) OVER wf AS nt
         FROM e
         WINDOW wb AS (PARTITION BY user_id
             ORDER BY ts_us ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id
             ORDER BY ts_us ASC, event_id ASC
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_id, user_id, ts_us,
           round(CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt THEN
               pv + (nv - pv) * CAST(ts_us - pt AS DOUBLE)
                 / CAST(nt - pt AS DOUBLE)
             ELSE coalesce(pv, nv) END, 4) AS interp
         FROM f""",
    "q36_asof_tolerance" ->
      """WITH v0 AS (SELECT user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             max(event_id) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events WHERE event_type = 'click'),
         m AS (SELECT c.event_id, c.user_id, c.ts_us,
             v.ts_us AS a_ts, v.view_id AS a_id
           FROM c ASOF LEFT JOIN v0 v
             ON c.user_id = v.user_id AND v.ts_us <= c.ts_us)
         SELECT event_id, user_id, ts_us,
           CASE WHEN a_ts IS NOT NULL AND ts_us - a_ts <= 600000000
             THEN a_ts END AS matched_ts_us,
           CASE WHEN a_ts IS NOT NULL AND ts_us - a_ts <= 600000000
             THEN a_id END AS matched_view_id
         FROM m""",
    "q37_rank_functions" ->
      """SELECT p_brand, p_partkey, round(p_retailprice, 2) AS retail,
         CAST(dense_rank() OVER w AS BIGINT) AS drank,
         round(percent_rank() OVER w, 6) AS prank,
         round(cume_dist() OVER w, 6) AS cdist,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM part
         WINDOW w AS (PARTITION BY p_brand
           ORDER BY p_retailprice ASC, p_partkey ASC)""",
    "q38_event_history" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us, event_type
           FROM events),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
         SELECT user_id,
           string_agg(event_type, ','
             ORDER BY ts_us ASC, event_id ASC) AS history,
           count(*) AS n
         FROM r WHERE rn <= 3 GROUP BY user_id""",
    "q39_zorder_layout" -> {
      val z = graft.ops.Layout.zOrderKeySql("ub", "hb", bits = 10)
      s"""WITH e AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events),
         k AS (SELECT *, user_id % 1024 AS ub,
             (ts_us // 3600000000) % 1024 AS hb FROM e),
         z AS (SELECT *, $z AS zkey FROM k)
         SELECT zkey // 4096 AS zregion, count(*) AS n,
           CAST(count(DISTINCT ub) AS BIGINT) AS n_user_buckets,
           max(ub) - min(ub) AS user_span,
           max(hb) - min(hb) AS hour_span
         FROM z GROUP BY 1"""
    },
    "q16_asof_click_view" ->
      """WITH v0 AS (SELECT user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             max(event_id) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events WHERE event_type = 'click')
         SELECT c.event_id, c.user_id, c.ts_us,
           v.ts_us AS asof_ts_us, v.view_id AS asof_view_id
         FROM c ASOF LEFT JOIN v0 v
           ON c.user_id = v.user_id AND v.ts_us <= c.ts_us""",
    "q17_range_click_windows" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events WHERE event_type = 'click'),
         i AS (SELECT event_id AS interval_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS start_us,
             CAST(epoch_ns(ts) // 1000 + 600000000 AS BIGINT) AS end_us
           FROM events WHERE event_type = 'purchase')
         SELECT i.interval_id, c.click_id, c.user_id, c.ts_us
         FROM c JOIN i ON c.user_id = i.user_id
           AND c.ts_us >= i.start_us AND c.ts_us < i.end_us""",
    "q18_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us, value
           FROM events),
         g AS (SELECT *, ts_us - lag(ts_us) OVER
             (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
             AS gap_us FROM e),
         s AS (SELECT *, sum(CASE WHEN gap_us IS NULL
               OR gap_us > 1800000000 THEN 1 ELSE 0 END) OVER
             (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
              ROWS UNBOUNDED PRECEDING) AS session_idx FROM g)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events, min(ts_us) AS start_us,
           max(ts_us) AS end_us,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))),3) AS DOUBLE)
             AS total_value
         FROM s GROUP BY user_id, session_idx""",
    // batch sessionization minus each user's final (open) session
    // Oracle note — known streaming/batch divergence (documented,
    // not exercised here because the whole input is one micro-batch):
    // an above-watermark straggler RUN that arrives after its user's
    // open session closes immediately; a later straggler in a FUTURE
    // micro-batch landing within that run's gap would have merged
    // under batch q18 semantics. Within one micro-batch, straggler
    // runs gap-merge exactly like batch (StreamingRecords.sessions).
    "q19_stream_sessions" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events),
         g AS (SELECT *, ts_us - lag(ts_us) OVER
             (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
             AS gap_us FROM e),
         s AS (SELECT *, sum(CASE WHEN gap_us IS NULL
               OR gap_us > 1800000000 THEN 1 ELSE 0 END) OVER
             (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
              ROWS UNBOUNDED PRECEDING) AS session_idx FROM g),
         agg AS (SELECT user_id, session_idx, count(*) AS n_events,
             min(ts_us) AS start_us, max(ts_us) AS end_us
           FROM s GROUP BY user_id, session_idx),
         mx AS (SELECT user_id, max(session_idx) AS mxs FROM agg
           GROUP BY user_id)
         SELECT a.user_id, a.start_us, a.end_us, a.n_events
         FROM agg a JOIN mx ON a.user_id = mx.user_id
           AND a.session_idx < mx.mxs""",
    // exact values + literal-true flags: the sketch estimates are
    // engine-specific, so the checked contract is "within tolerance"
    "q27_approx_sketches" ->
      """SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
         TRUE AS hll_within_10pct,
         round(quantile_cont(value, 0.5), 4) AS p50,
         TRUE AS p50_within_1pct
         FROM events GROUP BY event_type""",
    "q31_unpivot_revenue" ->
      """WITH w AS (SELECT l_linestatus,
           coalesce(CAST(round(sum(CASE WHEN l_returnflag = 'A'
             THEN CAST(l_extendedprice AS DECIMAL(18,6)) END),2)
             AS DOUBLE), 0.0) AS rev_a,
           coalesce(CAST(round(sum(CASE WHEN l_returnflag = 'N'
             THEN CAST(l_extendedprice AS DECIMAL(18,6)) END),2)
             AS DOUBLE), 0.0) AS rev_n,
           coalesce(CAST(round(sum(CASE WHEN l_returnflag = 'R'
             THEN CAST(l_extendedprice AS DECIMAL(18,6)) END),2)
             AS DOUBLE), 0.0) AS rev_r
           FROM lineitem GROUP BY l_linestatus)
         SELECT l_linestatus, 'rev_a' AS metric, rev_a AS revenue FROM w
         UNION ALL
         SELECT l_linestatus, 'rev_n', rev_n FROM w
         UNION ALL
         SELECT l_linestatus, 'rev_r', rev_r FROM w""",
    "q29_scd2_intervals" ->
      """WITH p AS (SELECT user_id, event_id,
           CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
           round(value, 3) AS value
         FROM events WHERE event_type = 'purchase')
         SELECT user_id, event_id, ts_us AS valid_from_us,
           coalesce(lead(ts_us) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id), 9223372036854775807)
             AS valid_to_us,
           value,
           lead(ts_us) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id) IS NULL AS is_current
         FROM p""",
    // each event lands in exactly len/slide = 2 overlapping windows;
    // k in [0,1] enumerates them from the event's own 5-min bucket
    "q30_sliding_windows" ->
      """WITH e AS (SELECT event_type, value,
           CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t_us FROM events),
         w AS (SELECT event_type, value,
           ((t_us // 300000000) - k) * 300000000 AS win_start_us
         FROM e, (SELECT unnest([0, 1]) AS k))
         SELECT win_start_us, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 3) AS DOUBLE)
             AS v
         FROM w GROUP BY win_start_us, event_type""",
    "q28_json_extract" ->
      """WITH e AS (SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
         SELECT event_type,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k, max(k) AS max_k
         FROM e GROUP BY event_type""",
    // the batch twin of the one-micro-batch stream-stream drain
    "q26_stream_stream_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS c_us
           FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS p_us
           FROM events WHERE event_type = 'purchase')
         SELECT purchase_id, click_id, user_id, p_us - c_us AS gap_us
         FROM p JOIN c USING (user_id)
         WHERE c_us BETWEEN p_us - 600000000 AND p_us""",
    "q40_cube_summary" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
                ELSE l_returnflag END AS flag,
         CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
                ELSE l_linestatus END AS status,
         count(*) AS n,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))),2) AS DOUBLE) AS rev
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "q41_local_supplier_volume" ->
      """SELECT n_name, count(*) AS n_lines,
         CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",
    "q42_event_funnel" ->
      """WITH v0 AS (SELECT user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             max(event_id) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events WHERE event_type = 'click'),
         mc AS (SELECT c.event_id, c.user_id, c.ts_us,
             (v.ts_us IS NOT NULL AND c.ts_us - v.ts_us <= 600000000)
               AS has_view
           FROM c ASOF LEFT JOIN v0 v
             ON c.user_id = v.user_id AND v.ts_us <= c.ts_us),
         mcr AS (SELECT user_id, ts_us, max(event_id) AS click_id
           FROM mc WHERE has_view GROUP BY 1, 2),
         p AS (SELECT event_id, user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events WHERE event_type = 'purchase'),
         mp AS (SELECT p.event_id, p.user_id, p.ts_us,
             (m.ts_us IS NOT NULL AND p.ts_us - m.ts_us <= 600000000)
               AS full_chain
           FROM p ASOF LEFT JOIN mcr m
             ON p.user_id = m.user_id AND m.ts_us <= p.ts_us),
         va AS (SELECT user_id, count(*) AS n_views FROM events
           WHERE event_type = 'view' GROUP BY 1),
         ca AS (SELECT user_id, count(*) AS n_clicks,
             sum(CASE WHEN has_view THEN 1 ELSE 0 END)
               AS n_clicks_with_view
           FROM mc GROUP BY 1),
         pa AS (SELECT user_id, count(*) AS n_purchases,
             sum(CASE WHEN full_chain THEN 1 ELSE 0 END)
               AS n_full_chain
           FROM mp GROUP BY 1)
         SELECT coalesce(va.user_id, ca.user_id, pa.user_id)
             AS user_id,
           CAST(coalesce(n_views, 0) AS BIGINT) AS n_views,
           CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(coalesce(n_clicks_with_view, 0) AS BIGINT)
             AS n_clicks_with_view,
           CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases,
           CAST(coalesce(n_full_chain, 0) AS BIGINT) AS n_full_chain
         FROM va
         FULL JOIN ca ON va.user_id = ca.user_id
         FULL JOIN pa ON coalesce(va.user_id, ca.user_id) = pa.user_id""",
    // the batch twin of the stream-static broadcast enrichment
    "q43_stream_enrich" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
           FROM events),
         prof AS (SELECT user_id, count(*) AS n_hist,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchases,
             min(ts_us) AS first_us
           FROM e GROUP BY 1)
         SELECT event_id, e.user_id, event_type, ts_us,
           CAST(n_hist AS BIGINT) AS n_hist,
           CAST(n_purchases AS BIGINT) AS n_purchases,
           (ts_us = first_us) AS is_first_event,
           (n_purchases >= 2) AS repeat_purchaser
         FROM e JOIN prof ON e.user_id = prof.user_id""",
    "q44_group_transform" ->
      """WITH t AS (SELECT p_brand, p_partkey, p_retailprice,
             round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,6)))
                 OVER (PARTITION BY p_brand) AS DOUBLE) /
               count(*) OVER (PARTITION BY p_brand), 4) AS brand_avg
           FROM part)
         SELECT p_brand, p_partkey,
           round(p_retailprice, 2) AS retail, brand_avg
         FROM t WHERE p_retailprice > brand_avg"""
  )
}

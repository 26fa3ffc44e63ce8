package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operator pack over the TPC-H-ish star schema: scans with
 * pushdown, broadcast/shuffle/semi/anti joins, hash aggregation, rollup,
 * distinct aggs, windows, top-k, set ops, scalar/date functions, exact
 * quantiles, sessionization, as-of join.
 *
 * Every query orders its output deterministically and aliases every
 * computed column to the same name as its DuckDB oracle. Double aggregates
 * are rounded on both sides to absorb summation-order noise.
 *
 * Scale notes are per query; the common rules: filters/projections stay in
 * front of the parquet scan (Catalyst pushdown), small dimensions are
 * broadcast explicitly, and no query ever collects to the driver.
 */
object Relational {

  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full-scan hash aggregation with a pushed-down date filter (TPC-H Q1
    // shape). Partial aggregation happens map-side; the shuffle carries
    // only |groups| rows per partition.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Selective filter + narrow projection: both reach the parquet scan
    // (PushedFilters + 4-column ReadSchema), so 100 TB scans only what the
    // predicate and projection need.
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 45 && col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Star join: fact tables join on orderkey (shuffle), dimensions enter
    // via explicit broadcast so the big side never re-partitions for them.
    "q03_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    }),

    // Left-semi join (EXISTS): only the key column of the probe side moves.
    "q04_semi_join" -> ((s, dir) => {
      val bigLines = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Left-anti join (NOT EXISTS): customers with no urgent order.
    "q05_anti_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      t(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Top-k: orderBy + limit plans as TakeOrderedAndProject — a per
    // -partition heap then a k-row merge, never a full sort at scale.
    "q06_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Ranking window: top-3 orders per customer, deterministic tie-break.
    "q07_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Running-total window over event time per user.
    "q08_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value", round(sum(col("value")).over(w), 4))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Rollup (grouping sets): region -> nation -> grand total. Grouping
    // nulls are coalesced to a sentinel so both engines agree on ordering.
    "q09_rollup" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_customers"), col("sum_acctbal"))
        .orderBy(col("region"), col("nation"))
    }),

    // Distinct aggregates (expand + two-phase agg under the hood).
    "q10_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))
    }),

    // Set operations: UNION (distinct), INTERSECT, EXCEPT over
    // (brand, type) pairs. Parenthesization matches the oracle exactly.
    "q11_setops" -> ((s, dir) => {
      val part = t(s, dir, "part")
      def pairs(c: Column) = part.filter(c).select(col("p_brand"), col("p_type"))
      pairs(col("p_size") > 40)
        .union(pairs(col("p_name").like("%widget%"))).distinct()
        .intersect(pairs(col("p_size") > 2))
        .except(pairs(col("p_brand") === "Brand#13"))
        .orderBy(col("p_brand"), col("p_type"))
    }),

    // Scalar string/math functions — all codegen'd builtins, no UDFs.
    "q12_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          round(col("p_retailprice") * 1.1, 2).as("inflated"),
          abs(col("p_size") - 25).as("size_dev"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    }),

    // Date/time functions on timestamps (session timezone UTC both sides).
    "q13_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"))
        .orderBy(col("o_orderkey"))
    }),

    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`).
    "q14_quantiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"),
          round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"))
        .orderBy(col("o_orderpriority"))
    }),

    // JSON scalar functions over the events.props payload column.
    "q17_json_funcs" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          round(avg(col("k")), 4).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // CUBE grouping sets: all 4 combinations of (returnflag, linestatus).
    "q18_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_lines"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // Typed UDAF (Aggregator): geometric mean of order totals per priority.
    "q19_geomean_udaf" -> ((s, dir) => {
      val geomean = udaf(graft.functions.GeoMean)
      t(s, dir, "orders")
        .filter(col("o_totalprice") > 0)
        .groupBy(col("o_orderpriority"))
        .agg(round(geomean(col("o_totalprice")), 2).as("geo_total"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Sessionization: 30-minute inactivity gap splits sessions. One window
    // pass computes boundaries; the shuffle is partitioned by user_id so
    // every user's timeline stays executor-local.
    "q15_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // As-of join: each click matched to the latest prior purchase of the
    // same user. Equality on user_id bounds the range join; the single
    // most recent match is kept by max_by partial aggregation
    // (graft.plans.TopOnePerKey) — no ranking window, no sort: the shuffle
    // after the range join carries one candidate per click per partition.
    "q16_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      val candidates = clicks.join(purchases, Seq("user_id"))
        .filter(col("p_ts") <= col("click_ts"))
      graft.plans.TopOnePerKey.latest(candidates,
          Seq("click_id"), Seq(col("p_ts"), col("purchase_id")))
        .select(col("click_id"), col("user_id"), col("purchase_id"),
          (unix_timestamp(col("click_ts")) - unix_timestamp(col("p_ts"))).as("gap_seconds"))
        .orderBy(col("click_id"))
    }),
    // Supplier dimension: broadcast join + per-nation account stats.
    "q35_supplier_stats" -> ((s, dir) => {
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          round(sum(col("s_acctbal")), 2).as("sum_acctbal"),
          round(min(col("s_acctbal")), 2).as("min_acctbal"),
          round(max(col("s_acctbal")), 2).as("max_acctbal"))
        .orderBy(col("n_name"))
    }),

    // Skew-salted equi-join (graft.plans.SaltedJoin): lineitem x part with
    // the fact side salted across 8 sub-keys. The oracle is the plain SQL
    // join — identical results prove salting is purely a physical rewrite.
    "q34_salted_join" -> ((s, dir) => {
      graft.plans.SaltedJoin.join(
          t(s, dir, "lineitem"), t(s, dir, "part"),
          leftKey = "l_partkey", rightKey = "p_partkey", numSalts = 8)
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    }),

    // Same as-of semantics as q16 through the dedicated sort-merge as-of
    // operator (graft.plans.AsOfMergeJoin): co-partitioned merge in
    // O(n + m) per partition, no per-key candidate product. Shares q16's
    // oracle shape, proving the two implementations agree.
    "q33_asof_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      graft.plans.AsOfMergeJoin.joinAsOf(clicks, purchases,
          leftKey = "user_id", rightKey = "p_user_id",
          leftTime = "click_ts", rightTime = "p_ts", rightTieBreak = "purchase_id")
        .select(col("click_id"), col("user_id"), col("purchase_id"),
          (unix_timestamp(col("click_ts")) - unix_timestamp(col("p_ts"))).as("gap_seconds"))
        .orderBy(col("click_id"))
    }),

    // Same as-of semantics a third way: the native physical operator
    // (graft.plans.AsOfMergeJoinExec) — a planner strategy + custom
    // SparkPlan that declares ClusteredDistribution/sort requirements and
    // merges co-partitioned sorted streams. Shares q16/q33's oracle.
    "q47_asof_exec" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      graft.plans.AsOfJoinNative.joinAsOf(clicks, purchases,
          leftKey = "user_id", rightKey = "p_user_id",
          leftTime = "click_ts", rightTime = "p_ts", rightTieBreak = "purchase_id")
        .select(col("click_id"), col("user_id"), col("purchase_id"),
          (unix_timestamp(col("click_ts")) - unix_timestamp(col("p_ts"))).as("gap_seconds"))
        .orderBy(col("click_id"))
    }),

    // Bloom-prefiltered join (semi-join reduction) — the runtime-filter
    // pattern for the case AQE's thresholds don't cover: the dimension's
    // FILTERED key set is too large to broadcast as a hash relation at
    // 100 TB, but its Bloom sketch (MBs at 1% fpp) is not. One pass over
    // the filtered dimension builds the sketch (public stat.bloomFilter —
    // a distributed aggregation; the driver sees only the sketch), the
    // fact scan probes it in-row (native codegen'd
    // [[graft.functions.BloomMightContainLong]]), and only maybe-matching
    // facts enter the join exchange. The SHUFFLE_MERGE hint pins the
    // exact join to the shuffle form this pattern exists for (a
    // broadcastable dim wouldn't need the bloom); false positives are
    // removed by that exact join, so the result — and the oracle — are
    // identical to the plain join. BloomPrefilterSpec measures the prune
    // and pins the probe below the exchange.
    "q92_bloom_prefilter" -> ((s, dir) => {
      val dim = t(s, dir, "customer").where(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_mktsegment"))
      val bloom = graft.functions.BloomMightContainLong.build(
        dim, "c_custkey", expectedItems = 1 << 18, fpp = 0.01)
      t(s, dir, "orders")
        .where(graft.functions.BloomMightContainLong.probe(bloom, col("o_custkey")))
        .join(dim.hint("SHUFFLE_MERGE"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    // MERGE/upsert semantics at the engine level — the incremental-load
    // primitive table formats (Iceberg/Delta) expose as MERGE INTO,
    // expressed as one full-outer join + coalesce: matched target rows
    // take the delta's values ('update'), unmatched delta rows append
    // ('insert'), untouched target rows pass through ('keep'). The delta
    // here is derived from orders itself (5% price revisions + 5% new
    // keys) so the query is self-contained and oracled. Scale shape: ONE
    // key-partitioned shuffle join — in production the delta is usually
    // small enough that AQE converts its side to a broadcast and the
    // 100 TB target never shuffles; either way there is exactly one
    // exchange and no driver materialization.
    // SCD TYPE-2 history merge — q100's Type-1 upsert keeps only the
    // latest value; a Type-2 dimension keeps EVERY version with validity
    // intervals, which is what an auditable warehouse dimension (and a
    // training-data provenance table) actually needs. History v1 = the
    // customer snapshot; the incoming batch plants deterministic changes
    // (custkey % 7 = 3 re-segments, % 11 = 5 gains balance — both both-
    // engines arithmetic) and new keys (% 13 = 1, shifted ids). The
    // merge closes changed current rows (v_to = 2, is_current = 0),
    // inserts their new versions and the brand-new keys at v_from = 2,
    // and passes unchanged rows through. Versions are integers and money
    // is integer cents, so every comparison and row is exact. One
    // key-partitioned join + one anti-join — the change detection never
    // leaves the key's partition.
    "q123_scd2_merge" -> ((s, dir) => {
      val cur = t(s, dir, "customer")
        .selectExpr("c_custkey AS k", "c_mktsegment AS seg",
          "cast(round(c_acctbal * 100) AS bigint) AS bal_c")
      val inc = cur.selectExpr("k",
        "CASE WHEN k % 7 = 3 THEN 'MOVED' ELSE seg END AS seg",
        "bal_c + CASE WHEN k % 11 = 5 THEN 10000L ELSE 0L END AS bal_c")
        .unionByName(cur.where("k % 13 = 1")
          .selectExpr("k + 10000000 AS k", "'NEWSEG' AS seg", "bal_c"))
      val joined = Caches.persist(cur
        .join(inc.selectExpr("k", "seg AS i_seg", "bal_c AS i_bal"), Seq("k"), "full_outer"))
      val unchanged = joined.where("seg = i_seg AND bal_c = i_bal")
        .selectExpr("k", "seg", "bal_c", "1L AS v_from", "999L AS v_to",
          "1L AS is_current")
      val changedOld = joined
        .where("seg IS NOT NULL AND i_seg IS NOT NULL" +
          " AND (seg != i_seg OR bal_c != i_bal)")
      val closed = changedOld.selectExpr("k", "seg", "bal_c", "1L AS v_from",
        "2L AS v_to", "0L AS is_current")
      val reopened = changedOld.selectExpr("k", "i_seg AS seg", "i_bal AS bal_c",
        "2L AS v_from", "999L AS v_to", "1L AS is_current")
      val born = joined.where("seg IS NULL")
        .selectExpr("k", "i_seg AS seg", "i_bal AS bal_c", "2L AS v_from",
          "999L AS v_to", "1L AS is_current")
      unchanged.unionByName(closed).unionByName(reopened).unionByName(born)
        .orderBy(col("k"), col("v_from"))
    }),

    "q100_merge_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val delta = orders.where(col("o_orderkey") % 100 < 5)
        .select(col("o_orderkey").as("d_orderkey"),
          (col("o_totalprice") * lit(1.1)).as("d_totalprice"),
          lit("P").as("d_status"))
        .unionAll(orders.where(col("o_orderkey") % 100 >= 95)
          .select((col("o_orderkey") + lit(1000000000L)).as("d_orderkey"),
            col("o_totalprice").as("d_totalprice"), lit("N").as("d_status")))
      orders.join(delta, col("o_orderkey") === col("d_orderkey"), "full_outer")
        .select(
          coalesce(col("o_orderkey"), col("d_orderkey")).as("orderkey"),
          round(coalesce(col("d_totalprice"), col("o_totalprice")), 2).as("totalprice"),
          coalesce(col("d_status"), col("o_orderstatus")).as("status"),
          when(col("o_orderkey").isNull, lit("insert"))
            .when(col("d_orderkey").isNull, lit("keep"))
            .otherwise(lit("update")).as("action"))
        .orderBy(col("orderkey"))
    }),

    // Distribution-analytics window pack: ntile quartiles, percent_rank,
    // cume_dist, lag/lead — the remaining ANSI window functions q07/q08/
    // q15/q45 don't cover. All windows are PARTITIONED by customer (hash-
    // partitionable, no global sort), ordered deterministically by
    // (o_orderdate, o_orderkey); percent_rank/cume_dist are exact small-
    // integer ratios, so the doubles agree cross-engine bit-for-bit.
    "q101_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        // partition-edge lag/lead are NULL — sentinel them: the driver's
        // value compare reads a null float as NaN, and NaN != NaN
        coalesce(round(lag(col("o_totalprice"), 1).over(w), 2), lit(-1.0))
          .as("prev_price"),
        coalesce(round(lead(col("o_totalprice"), 1).over(w), 2), lit(-1.0))
          .as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_quantity >= 45 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q06_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM orders
        |ORDER BY total DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, total, rn FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q08_running_sum" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q09_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "q10_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_lines
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q11_setops" ->
      """((SELECT p_brand, p_type FROM part WHERE p_size > 40
        |  UNION
        |  SELECT p_brand, p_type FROM part WHERE p_name LIKE '%widget%')
        | INTERSECT
        | SELECT p_brand, p_type FROM part WHERE p_size > 2)
        |EXCEPT
        |SELECT p_brand, p_type FROM part WHERE p_brand = 'Brand#13'
        |ORDER BY p_brand, p_type""".stripMargin,

    "q12_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 8)) AS name_prefix,
        |  length(p_name) AS name_len,
        |  round(p_retailprice * 1.1, 2) AS inflated,
        |  abs(p_size - 25) AS size_dev,
        |  p_brand || '/' || p_type AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q13_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  dayofmonth(o_orderdate) AS o_day,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_date
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q14_quantiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q17_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |  cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(avg(cast(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
        |  min(cast(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(cast(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q18_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q19_geomean_udaf" ->
      """SELECT o_orderpriority,
        |  round(exp(avg(ln(o_totalprice))), 2) AS geo_total,
        |  count(*) AS n_orders
        |FROM orders
        |WHERE o_totalprice > 0
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q15_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 2) AS session_value,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q35_supplier_stats" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |  round(sum(s_acctbal), 2) AS sum_acctbal,
        |  round(min(s_acctbal), 2) AS min_acctbal,
        |  round(max(s_acctbal), 2) AS max_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q34_salted_join" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q33_asof_merge" ->
      """SELECT click_id, user_id, purchase_id, gap_seconds FROM (
        |  SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
        |    date_diff('second', p.ts, c.ts) AS gap_seconds,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM events c
        |  JOIN events p ON c.user_id = p.user_id AND p.ts <= c.ts
        |    AND p.event_type = 'purchase'
        |  WHERE c.event_type = 'click')
        |WHERE rn = 1
        |ORDER BY click_id""".stripMargin,

    "q47_asof_exec" ->
      """SELECT click_id, user_id, purchase_id, gap_seconds FROM (
        |  SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
        |    date_diff('second', p.ts, c.ts) AS gap_seconds,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM events c
        |  JOIN events p ON c.user_id = p.user_id AND p.ts <= c.ts
        |    AND p.event_type = 'purchase'
        |  WHERE c.event_type = 'click')
        |WHERE rn = 1
        |ORDER BY click_id""".stripMargin,

    "q16_asof_join" ->
      """SELECT click_id, user_id, purchase_id, gap_seconds FROM (
        |  SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
        |    date_diff('second', p.ts, c.ts) AS gap_seconds,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM events c
        |  JOIN events p ON c.user_id = p.user_id AND p.ts <= c.ts
        |    AND p.event_type = 'purchase'
        |  WHERE c.event_type = 'click')
        |WHERE rn = 1
        |ORDER BY click_id""".stripMargin,

    "q92_bloom_prefilter" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // 1.1 is cast to DOUBLE explicitly — DuckDB types the bare literal
    // DECIMAL(2,1) and a decimal multiply would round differently from
    // Spark's double multiply before the round(2).
    // the same planting, comparison and four-way union as CTEs
    "q123_scd2_merge" ->
      """WITH cur AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |inc AS (
        |  SELECT k,
        |    CASE WHEN k % 7 = 3 THEN 'MOVED' ELSE seg END AS seg,
        |    bal_c + CASE WHEN k % 11 = 5 THEN 10000 ELSE 0 END AS bal_c
        |  FROM cur
        |  UNION ALL
        |  SELECT k + 10000000, 'NEWSEG', bal_c FROM cur WHERE k % 13 = 1),
        |j AS (SELECT coalesce(cur.k, inc.k) AS k, cur.seg AS seg,
        |    cur.bal_c AS bal_c, inc.seg AS i_seg, inc.bal_c AS i_bal
        |  FROM cur FULL OUTER JOIN inc ON cur.k = inc.k)
        |SELECT k, seg, bal_c, 1 AS v_from, 999 AS v_to, 1 AS is_current
        |  FROM j WHERE seg = i_seg AND bal_c = i_bal
        |UNION ALL
        |SELECT k, seg, bal_c, 1, 2, 0 FROM j
        |  WHERE seg IS NOT NULL AND i_seg IS NOT NULL
        |    AND (seg != i_seg OR bal_c != i_bal)
        |UNION ALL
        |SELECT k, i_seg, i_bal, 2, 999, 1 FROM j
        |  WHERE seg IS NOT NULL AND i_seg IS NOT NULL
        |    AND (seg != i_seg OR bal_c != i_bal)
        |UNION ALL
        |SELECT k, i_seg, i_bal, 2, 999, 1 FROM j WHERE seg IS NULL
        |ORDER BY k, v_from""".stripMargin,

    "q100_merge_upsert" ->
      """WITH delta AS (
        |  SELECT o_orderkey AS d_orderkey,
        |    o_totalprice * CAST(1.1 AS DOUBLE) AS d_totalprice,
        |    'P' AS d_status
        |  FROM orders WHERE o_orderkey % 100 < 5
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_totalprice, 'N'
        |  FROM orders WHERE o_orderkey % 100 >= 95)
        |SELECT coalesce(o_orderkey, d_orderkey) AS orderkey,
        |  round(coalesce(d_totalprice, o_totalprice), 2) AS totalprice,
        |  coalesce(d_status, o_orderstatus) AS status,
        |  CASE WHEN o_orderkey IS NULL THEN 'insert'
        |       WHEN d_orderkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM orders FULL OUTER JOIN delta ON o_orderkey = d_orderkey
        |ORDER BY orderkey""".stripMargin,

    "q101_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  coalesce(round(lag(o_totalprice, 1) OVER w, 2), -1.0) AS prev_price,
        |  coalesce(round(lead(o_totalprice, 1) OVER w, 2), -1.0) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}

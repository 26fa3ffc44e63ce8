package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Second relational pack: the join/aggregation/window shapes not covered by
 * `Relational` — interval overlap via a generator (binned range join),
 * full outer join, pivot, explicit GROUPING SETS, array higher-order
 * functions, a correlated-subquery shape, theta (inequality) join, and a
 * RANGE-framed window.
 *
 * Same contract as the other packs: deterministic ORDER BY, identical
 * column aliases on the Spark and DuckDB sides, doubles rounded after the
 * final aggregate.
 */
object Advanced {

  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Interval-overlap via generator: each order is active for 7 days;
    // explode the covered days and count per day. This is the scale-path
    // form of an interval join — O(rows x interval/bin) instead of an
    // O(n^2) range predicate, and the per-day counts shuffle with map-side
    // partial aggregation.
    "q36_interval_overlap" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(explode(expr(
          "sequence(date_trunc('day', o_orderdate), " +
            "date_trunc('day', o_orderdate + INTERVAL 7 DAYS), INTERVAL 1 DAY)"))
          .as("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("day"))
    }),

    // Full outer join with unmatched rows on both sides: nations'
    // automobile-segment customers vs negative-balance suppliers. Both
    // inputs are pre-aggregated (tiny), so the outer join itself is a
    // broadcast-able 25-row reconciliation regardless of fact size.
    "q37_full_outer" -> ((s, dir) => {
      val cs = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .groupBy(col("c_nationkey").as("c_nk"))
        .agg(count(lit(1)).as("n_auto_customers"))
      val ss = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0)
        .groupBy(col("s_nationkey").as("s_nk"))
        .agg(count(lit(1)).as("n_debt_suppliers"))
      cs.join(ss, col("c_nk") === col("s_nk"), "full_outer")
        .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
          coalesce(col("n_auto_customers"), lit(0L)).as("n_auto_customers"),
          coalesce(col("n_debt_suppliers"), lit(0L)).as("n_debt_suppliers"))
        .orderBy(col("nationkey"))
    }),

    // Pivot: event counts per (user_id mod 10) bucket x event type. The
    // explicit value list keeps the output schema static — at scale you
    // never let pivot run its implicit distinct-values job.
    "q38_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("user_mod"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(col("user_mod"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("view"), lit(0L)).as("n_view"))
        .orderBy(col("user_mod"))
    }),

    // Unpivot (melt) — q38's inverse reshape: the four lineitem measure
    // columns folded into (measure, value) rows, then per-measure stats.
    // Plans as a single Expand over the scan (each input row emits 4
    // narrow rows) feeding one hash aggregation — one corpus pass, no
    // join, no shuffle beyond the 4-group agg.
    "q85_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "measure",
          valueColumnName = "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"),
          round(min(col("value")), 2).as("min_value"),
          round(max(col("value")), 2).as("max_value"))
        .orderBy(col("measure"))
    }),

    // Per-group Pearson correlation / sample covariance / stddev from
    // EXPLICIT raw moment sums (n, Σx, Σy, Σx², Σy², Σxy) combined with
    // the same closed-form expressions on both sides — NOT the builtin
    // corr/covar aggregates, whose internal update algorithms (Welford
    // vs raw-moment) round differently across engines. Map-side partial
    // aggregation ships six doubles per group per partition; the
    // combination is well-conditioned here (quantity and price variances
    // are large relative to cancellation error), and rounding to 4
    // places absorbs the summation-order ulps.
    "q88_corr_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sx"),
          sum(col("l_extendedprice")).as("sy"),
          sum(col("l_quantity") * col("l_quantity")).as("sxx"),
          sum(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
          sum(col("l_quantity") * col("l_extendedprice")).as("sxy"))
        .selectExpr("l_returnflag", "n",
          "round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx)" +
            " * sqrt(n * syy - sy * sy)), 4) AS corr_qty_price",
          "round((sxy - sx * sy / n) / (n - 1), 2) AS covar_qty_price",
          "round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_qty",
          "round(sqrt((syy - sy * sy / n) / (n - 1)), 2) AS stddev_price")
        .orderBy(col("l_returnflag"))
    }),

    // HLL++ approximate distinct — THE count-distinct at 100 TB (exact
    // distinct shuffles every key; the sketch ships a fixed-size
    // register set per group per partition). Not cross-engine
    // oracle-able (DuckDB's approx_distinct is a different sketch), so
    // this is a rows-only entry; ModulesSpec gates the estimate against
    // the exact count at 3x the configured rsd on the real corpus.
    "q89_approx_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy(col("event_type"))
    }),

    // SKETCH ERROR AUDIT (q216) — q89/q90's contract made HASH-CHECKABLE
    // (the r17 verdict's ask): the sketch VALUES can't replay
    // cross-engine (HLL++ vs DuckDB's sketch, GK vs t-digest), but the
    // DOCUMENTED BOUNDS can — Spark emits |sketch − exact| checked
    // against each bound as a boolean next to the oracled exact value,
    // and DuckDB's oracle asserts the booleans are ALL true. A sketch
    // drifting outside its contract flips a cell and the hash goes red;
    // ModulesSpec's gates stay as the belt to this suspenders.
    //   - HLL++ (rsd 0.02): |approx − exact| ≤ 3·rsd·exact, the q89 gate;
    //   - GK (accuracy 10000): the returned element's RANK interval
    //     [count(<v)+1, count(≤v)] must intersect
    //     [floor((q−ε)n)−1, ceil((q+ε)n)+1], ε = 1/accuracy — computed
    //     with one conditional-aggregation pass over the events joined
    //     to the broadcast k-row sketch output, so the audit costs one
    //     extra scan, never a sort.
    "q216_sketch_audit" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sk = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("au"),
          countDistinct(col("user_id")).as("exact_users"),
          expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)")
            .as("ap"),
          count(lit(1)).as("n"))
      val ranks = ev.join(broadcast(sk.select(col("event_type"), col("ap"))),
          Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("value") < col("ap")(0), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("value") <= col("ap")(0), 1L).otherwise(0L)).as("le50"),
          sum(when(col("value") < col("ap")(1), 1L).otherwise(0L)).as("lt95"),
          sum(when(col("value") <= col("ap")(1), 1L).otherwise(0L)).as("le95"),
          sum(when(col("value") < col("ap")(2), 1L).otherwise(0L)).as("lt99"),
          sum(when(col("value") <= col("ap")(2), 1L).otherwise(0L)).as("le99"))
      def rankOk(q: String, lt: String, le: String) =
        s"($lt + 1 <= ceil(($q + 0.0001) * n) + 1 AND " +
          s"$le >= floor(($q - 0.0001) * n) - 1)"
      sk.join(ranks, Seq("event_type"))
        .selectExpr("event_type", "exact_users",
          "abs(au - exact_users) <= ceil(3 * 0.02 * exact_users) " +
            "AS distinct_within_3rsd",
          rankOk("0.5", "lt50", "le50") + " AS p50_rank_ok",
          rankOk("0.95", "lt95", "le95") + " AS p95_rank_ok",
          rankOk("0.99", "lt99", "le99") + " AS p99_rank_ok")
        .orderBy(col("event_type"))
    }),

    // Quantile sketch — the percentile that runs at 100 TB (exact
    // percentiles sort every group; the Greenwald-Khanna summary ships a
    // bounded buffer per group per partition). Like q89, not
    // cross-engine oracle-able (DuckDB's approx_quantile is t-digest),
    // so rows-only + a ModulesSpec gate against the exact percentiles,
    // which sit alongside in the output. accuracy=10000 bounds rank
    // error at 1/10000 of the group. The three percentile points are
    // FLATTENED into scalar columns (one sketch pass — the array agg
    // computes once, element_at projects): the driver's rows-only
    // comparator sorts every cell, and array cells are unsortable there
    // (the q77 device).
    "q90_approx_percentile" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)")
            .as("ap"),
          expr("percentile(value, array(0.5, 0.95, 0.99))").as("ep"))
        .selectExpr("event_type",
          "ap[0] AS p50_approx", "ap[1] AS p95_approx", "ap[2] AS p99_approx",
          "ep[0] AS p50_exact", "ep[1] AS p95_exact", "ep[2] AS p99_exact")
        .orderBy(col("event_type"))
    }),

    // Funnel: users progressing through view → click → purchase IN EVENT
    // ORDER (strictly cumulative: a click only counts once a view has
    // been seen, a purchase only once a qualifying click has). One
    // shuffle+sort per user — the three cumulative-max windows share the
    // same (user_id | ts, event_id) partitioning/ordering, so Catalyst
    // plans ONE exchange and one sort feeding three chained Window
    // operators; per-user state is three ints, never a collected event
    // list. The (ts, event_id) ordering makes ties deterministic in both
    // engines.
    // Recency-weighted activity score with a HALF-LIFE decay — the
    // feature-engineering shape behind "how active is this user lately".
    // A float EWMA would hash-diverge on libm pow ulps; a half-life of
    // exactly one event-step makes the decay a RIGHT SHIFT: score =
    // Σ value_cents div 2^age over the user's last 20 events (age 0 =
    // most recent). Pure integer fold, deterministic everywhere; the
    // rank window is user-partitioned, and the 2^age table never
    // exceeds bit 19.
    "q125_decay_score" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("cast(round(value * 100) AS bigint) AS v_cents"))
        .withColumn("age", row_number().over(w) - lit(1))
        .where(col("age") < 20)
        .groupBy(col("user_id"))
        .agg(sum(expr("v_cents div shiftleft(1L, age)")).as("decay_cents"),
          count(lit(1)).as("n_recent"),
          max(col("ts")).as("last_seen"))
        .orderBy(col("user_id"))
    }),

    // DATE-SPINE gap filling — reporting's most common silent bug: a day
    // with zero events simply vanishes from a groupBy, and downstream
    // charts interpolate over the hole. The spine (every calendar day in
    // the observed range) is generated with sequence + explode from ONE
    // bounds row — broadcast-sized — and the daily aggregate LEFT-joins
    // onto it, zero-filled. At scale the spine stays tiny no matter how
    // large events grows; only the daily rollup touches the corpus.
    "q126_date_spine" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev.groupBy(expr("date_trunc('day', ts)").as("day"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
      val spine = ev.agg(min(expr("date_trunc('day', ts)")).as("d0"),
          max(expr("date_trunc('day', ts)")).as("d1"))
        .selectExpr("explode(sequence(d0, d1, INTERVAL 1 DAY)) AS day")
      spine.join(daily, Seq("day"), "left")
        .selectExpr("day", "coalesce(n_events, 0L) AS n_events",
          "coalesce(sum_value, cast(0.0 AS double)) AS sum_value")
        .orderBy(col("day"))
    }),

    // LINEAR INTERPOLATION over per-user gap days — the step past q126's
    // zero-fill: a day with no events gets the value the line between its
    // neighboring observed days passes through (sensor/metric series
    // backfill). Gap generation is PAIR-based, not spine×observed: one
    // lead() window per user pairs consecutive observed days, and only
    // actual gaps explode — so the work is O(observed + emitted), never
    // O(days²). The ONE corpus-scale exchange is the (user, day) rollup;
    // the window's user_id re-exchange runs on the already-reduced daily
    // frame (≤ users × days rows). Cross-engine exactness: cents
    // are per-row-rounded integers and the interpolant is the convex form
    // (v0·(d1−d) + v1·(d−d0)) div (d1−d0) — every factor nonnegative, so
    // Spark's truncating `div` and DuckDB's flooring `//` agree exactly
    // (with v1−v0 factored out they would diverge on negative slopes).
    // DATA INVARIANT relied on: daily cents >= 0 (events.value >= 0 in
    // the generator). A source admitting negative values (refunds) makes
    // the numerator sign-indefinite and truncating-vs-flooring division
    // diverges on the negative interpolants — switch both engines to an
    // explicit floor-division formulation before admitting such data.
    "q129_interpolate" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), expr("date_trunc('day', ts)").as("day"))
        .agg(sum(expr("cast(round(value * 100) AS bigint)")).as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val seg = daily
        .withColumn("next_day", lead(col("day"), 1).over(w))
        .withColumn("next_cents", lead(col("cents"), 1).over(w))
      val observed = seg.select(col("user_id"), col("day"), col("cents"),
        lit(false).as("interpolated"))
      val gaps = seg
        .where(col("next_day").isNotNull &&
          expr("datediff(next_day, day) > 1"))
        .selectExpr("user_id", "day AS d0", "cents AS v0",
          "next_day AS d1", "next_cents AS v1")
        .selectExpr("user_id",
          "explode(sequence(d0 + INTERVAL 1 DAY, d1 - INTERVAL 1 DAY," +
            " INTERVAL 1 DAY)) AS day",
          "d0", "v0", "d1", "v1")
        .selectExpr("user_id", "day",
          "(v0 * datediff(d1, day) + v1 * datediff(day, d0))" +
            " div datediff(d1, d0) AS cents",
          "cast(true AS boolean) AS interpolated")
      observed.unionByName(gaps).orderBy(col("user_id"), col("day"))
    }),

    // Typed Dataset API: KeyValueGroupedDataset.cogroup — the per-key
    // two-sided reconciliation primitive (conceptually a full-outer
    // join + two aggregations fused into one co-partitioned pass; the
    // imperative per-key body is what you reach for when the per-group
    // logic stops being expressible as aggregates). Both sides shuffle
    // once on the key, groups stream through the lambda — nothing
    // collects. Money sums are per-element-rounded INTEGER CENTS so the
    // fold is order-independent (within-group iteration order is
    // partition order, so a double sum would be nondeterministic — and
    // unhashable cross-engine).
    "q121_cogroup_recon" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
      val events = t(s, dir, "events")
        .select(col("user_id"), col("value")).as[(Long, Double)]
      orders.groupByKey(_._1).cogroup(events.groupByKey(_._1)) { (k, os, es) =>
        var no = 0L; var oc = 0L
        os.foreach { o => no += 1; oc += math.round(o._2 * 100) }
        var ne = 0L; var ec = 0L
        es.foreach { e => ne += 1; ec += math.round(e._2 * 100) }
        Iterator((k, no, ne, oc, ec))
      }.toDF("custkey", "n_orders", "n_events", "order_cents", "event_cents")
        .orderBy(col("custkey"))
    }),

    // Event-sequence TRANSITION mining (first-order Markov counts): for
    // each user's event stream in time order, count type→type
    // transitions and their median-free timing stats — the path-analysis
    // primitive behind funnels-you-didn't-predefine ("where do users go
    // after an error?"). One lag window per user (key-partitioned, the
    // q86 shape) then a bounded |types|² rollup; transition probability
    // is exact fixed-point against the source type's total outflow.
    "q116_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val steps = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("gap_s",
          expr("unix_micros(lead(ts, 1) OVER (PARTITION BY user_id" +
            " ORDER BY ts, event_id)) div 1000000" +
            " - unix_micros(ts) div 1000000"))
        .where(col("next_type").isNotNull)
      val counts = steps.groupBy(col("event_type").as("from_type"), col("next_type"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(col("gap_s")).as("sum_gap_s"),
          max(col("gap_s")).as("max_gap_s"))
      val outflow = counts.groupBy(col("from_type"))
        .agg(sum(col("n_transitions")).as("n_out"))
      counts.join(broadcast(outflow), "from_type")
        .selectExpr("from_type", "next_type", "n_transitions",
          "(n_transitions * 1000000L) div n_out AS prob_e6",
          "sum_gap_s div n_transitions AS mean_gap_s", "max_gap_s")
        .orderBy(col("from_type"), col("next_type"))
    }),

    // SLIDING (hopping) event-time windows in batch — q40's tumbling
    // windows with overlap: 1-hour windows every 15 minutes, so each
    // event belongs to exactly 4 windows and a spike is visible at
    // 15-minute resolution with a full hour of context. Spark's
    // `window()` expands in-row (a 4-element generator, epoch-aligned
    // origin) before the keyed aggregation — no self-join against a
    // window table. The oracle expands the same 4 epoch-grid starts with
    // generate_series and must land on identical per-window aggregates.
    "q115_sliding_window" -> ((s, dir) => {
      Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    "q86_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("seen_view",
          max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
        .withColumn("seen_vc",
          max(when(col("event_type") === "click" && col("seen_view") === 1, 1)
            .otherwise(0)).over(w))
        .withColumn("seen_vcp",
          max(when(col("event_type") === "purchase" && col("seen_vc") === 1, 1)
            .otherwise(0)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("seen_view")).as("v"), max(col("seen_vc")).as("vc"),
          max(col("seen_vcp")).as("vcp"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("v")).as("n_view"),
          sum(col("vc")).as("n_view_click"),
          sum(col("vcp")).as("n_full_funnel"))
    }),

    // Retention cohorts: users bucketed by first-active day, counted on
    // each later active day as a day offset. (user, day) pairs collapse
    // FIRST (distinct — map-side partial), the cohort day is a
    // whole-partition min window over that already-collapsed set (no
    // join back to raw events), and the final (cohort × offset) grid is
    // bounded by the date span squared, not by data volume.
    "q87_retention" -> ((s, dir) => {
      // date_trunc (timestamp), not to_date: DATE columns round-trip as
      // pandas datetime64 on the Spark side but date objects on the
      // DuckDB side of the compare — q36 set the precedent
      val days = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
      days
        .withColumn("cohort_day",
          min(col("day")).over(Window.partitionBy(col("user_id"))))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("offset_days"))
        .agg(count(lit(1)).as("n_active_users"))
        .orderBy(col("cohort_day"), col("offset_days"))
    }),

    // Explicit GROUPING SETS (neither rollup nor cube): priority totals,
    // status totals, and the grand total in one pass over orders.
    "q39_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
          |  coalesce(o_orderstatus, 'ALL') AS status,
          |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |ORDER BY priority, status""".stripMargin)
    }),

    // Array higher-order functions over embeddings: fold (aggregate),
    // transform, array_max, comparator sort — all codegen'd, no UDF.
    "q42_array_funcs" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .selectExpr(
          "vec_id",
          "size(embedding) AS dim",
          "round(sqrt(aggregate(embedding, cast(0 AS double), " +
            "(a, x) -> a + cast(x AS double) * cast(x AS double))), 4) AS l2_norm",
          "round(cast(array_max(transform(embedding, x -> cast(x AS double))) AS double), 4) AS max_elem",
          "round(element_at(array_sort(transform(embedding, x -> cast(x AS double)), " +
            "(a, b) -> CASE WHEN a > b THEN -1 WHEN a < b THEN 1 ELSE 0 END), 2), 4) AS second_largest")
        .orderBy(col("vec_id"))
    }),

    // Correlated-subquery shape: customers 1.5x above their nation's mean
    // balance. Decorrelated into a broadcast join against the tiny
    // per-nation aggregate — the plan a good optimizer produces for the
    // correlated SQL the oracle runs.
    "q43_above_nation_avg" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val byNation = cust.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      cust.join(broadcast(byNation), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg") * 1.5)
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // Theta join (pure inequality, no equi key): plans as a broadcast
    // nested-loop join — fine exactly because both sides are dimensions.
    "q44_theta_join" -> ((s, dir) => {
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), expr("n_regionkey != r_regionkey"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // from_json with an explicit schema: JSON parsed ONCE into a typed
    // struct column, then filtered and aggregated on the struct field —
    // versus q17's per-path get_json_object string extraction.
    "q53_from_json_struct" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("p"))
        .filter(col("p.k") % 2 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_even"), sum(col("p.k")).as("sum_even_k"))
        .orderBy(col("event_type"))
    }),

    // RANGE-framed window: per customer, average order value over the
    // trailing 30 days (value-based frame, not row-based). The mean is
    // integer math end-to-end (exact cents, half-up via (2s+c) div 2c):
    // round(double_quotient, 2) is NOT portable — Spark rounds the
    // shortest decimal representation (BigDecimal.valueOf), DuckDB rounds
    // the binary value, and quotients landing on .xx5 split between them.
    "q45_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_n"))
        .rangeBetween(-30, 0)
      t(s, dir, "orders")
        .withColumn("day_n", datediff(col("o_orderdate"), lit("1992-01-01")))
        .withColumn("s_cents",
          sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")).over(w))
        .withColumn("c", count(lit(1)).over(w))
        .withColumn("avg_30d_cents", expr("(2 * s_cents + c) div (2 * c)"))
        .select(col("o_orderkey"), col("o_custkey"), col("day_n"), col("avg_30d_cents"))
        .orderBy(col("o_orderkey"))
    }),

    // Blocked EDIT-DISTANCE record linkage — the fuzzy-matching modality
    // the dedup family still lacked (q25 minhash = set overlap, q27 =
    // n-gram Jaccard, q32 = simhash bits; none catches a two-letter typo
    // in a short name). The O(n²) distance matrix is tamed twice:
    // (1) the join runs on the DISTINCT-NAME DICTIONARY, not rows — the
    // name-level rollup collapses the corpus to its |names| vocabulary
    // first (100 TB of parts is still a few thousand distinct names),
    // with per-name counts carried so row mass is recoverable;
    // (2) candidate pairs block on the name's final token (the head noun
    // — the standard blocking-key tradeoff, documented: a typo in the
    // blocking token itself is missed, which is what q27's sorted-
    // neighborhood pass covers from the other side). Within a block,
    // `levenshtein` (codegen'd built-in, same classic DP both engines)
    // keeps pairs at distance 1-4 — distance 0 is exact duplication,
    // q20's job. The dictionary is kilobytes, so the self-join
    // broadcasts; no corpus shuffle exists anywhere in the plan.
    "q184_fuzzy_linkage" -> ((s, dir) => {
      val names = t(s, dir, "part")
        .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
        .select(col("p_name").as("name"), col("n"),
          element_at(split(col("p_name"), " "), -1).as("blk"))
      val a = names.select(col("name").as("name_a"), col("n").as("n_a"), col("blk"))
      val b = names.select(col("name").as("name_b"), col("n").as("n_b"), col("blk"))
      a.join(broadcast(b), "blk")
        .where(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("bigint"))
        .where(col("dist").between(1, 4))
        .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
        .orderBy(col("name_a"), col("name_b"))
    }),
  )

  val oracles: Map[String, String] = Map(
    // the oracle computes the EXACT side and asserts the bound booleans
    // — a sketch outside its documented contract hash-mismatches
    "q216_sketch_audit" ->
      """SELECT event_type,
        |  count(DISTINCT user_id)::BIGINT AS exact_users,
        |  true AS distinct_within_3rsd,
        |  true AS p50_rank_ok,
        |  true AS p95_rank_ok,
        |  true AS p99_rank_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q36_interval_overlap" ->
      """SELECT g.day AS day, count(*) AS n_active
        |FROM orders, unnest(generate_series(date_trunc('day', o_orderdate),
        |  date_trunc('day', o_orderdate + INTERVAL 7 DAY), INTERVAL 1 DAY)) AS g(day)
        |GROUP BY g.day
        |ORDER BY g.day""".stripMargin,

    "q37_full_outer" ->
      """WITH cs AS (
        |  SELECT c_nationkey AS c_nk, count(*) AS n_auto_customers
        |  FROM customer WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY c_nationkey),
        |ss AS (
        |  SELECT s_nationkey AS s_nk, count(*) AS n_debt_suppliers
        |  FROM supplier WHERE s_acctbal < 0 GROUP BY s_nationkey)
        |SELECT coalesce(c_nk, s_nk) AS nationkey,
        |  coalesce(n_auto_customers, 0) AS n_auto_customers,
        |  coalesce(n_debt_suppliers, 0) AS n_debt_suppliers
        |FROM cs FULL OUTER JOIN ss ON c_nk = s_nk
        |ORDER BY nationkey""".stripMargin,

    "q38_pivot" ->
      """SELECT user_id % 10 AS user_mod,
        |  cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events
        |GROUP BY user_id % 10
        |ORDER BY user_mod""".stripMargin,

    "q39_grouping_sets" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY priority, status""".stripMargin,

    // Same explicit moment-sum formulas; only the per-partition
    // summation order differs, absorbed by the rounding.
    "q88_corr_stats" ->
      """WITH m AS (SELECT l_returnflag, count(*)::BIGINT AS n,
        |    sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
        |    sum(l_quantity * l_quantity) AS sxx,
        |    sum(l_extendedprice * l_extendedprice) AS syy,
        |    sum(l_quantity * l_extendedprice) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx)
        |    * sqrt(n * syy - sy * sy)), 4) AS corr_qty_price,
        |  round((sxy - sx * sy / n) / (n - 1), 2) AS covar_qty_price,
        |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_qty,
        |  round(sqrt((syy - sy * sy / n) / (n - 1)), 2) AS stddev_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    // same shift-decay fold: v // 2^age summed over the 20 newest
    "q125_decay_score" ->
      """WITH r AS (SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS v_cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) - 1 AS age
        |  FROM events)
        |SELECT user_id,
        |  sum(v_cents // (1::BIGINT << age))::BIGINT AS decay_cents,
        |  count(*)::BIGINT AS n_recent, max(ts) AS last_seen
        |FROM r WHERE age < 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the same one-bounds-row spine, left-joined and zero-filled
    "q126_date_spine" ->
      """WITH b AS (SELECT min(date_trunc('day', ts)) AS d0,
        |    max(date_trunc('day', ts)) AS d1 FROM events),
        |spine AS (SELECT unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::TIMESTAMP AS day FROM b),
        |daily AS (SELECT date_trunc('day', ts) AS day,
        |    count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY day)
        |SELECT s.day, coalesce(d.n_events, 0)::BIGINT AS n_events,
        |  coalesce(d.sum_value, 0.0) AS sum_value
        |FROM spine s LEFT JOIN daily d ON d.day = s.day
        |ORDER BY s.day""".stripMargin,

    // same pair-based gap generation; // on the all-nonnegative convex
    // numerator matches Spark's div exactly
    "q129_interpolate" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |seg AS (SELECT user_id, day, cents,
        |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day,
        |    lead(cents) OVER (PARTITION BY user_id ORDER BY day)
        |      AS next_cents
        |  FROM daily),
        |gaps AS (SELECT user_id,
        |    unnest(generate_series(day + INTERVAL 1 DAY,
        |      next_day - INTERVAL 1 DAY, INTERVAL 1 DAY)) AS day,
        |    day AS d0, cents AS v0, next_day AS d1, next_cents AS v1
        |  FROM seg WHERE next_day IS NOT NULL
        |    AND date_diff('day', day, next_day) > 1)
        |SELECT user_id, day, cents, false AS interpolated FROM daily
        |UNION ALL
        |SELECT user_id, day,
        |  ((v0 * date_diff('day', day, d1) + v1 * date_diff('day', d0, day))
        |    // date_diff('day', d0, d1))::BIGINT AS cents,
        |  true AS interpolated
        |FROM gaps
        |ORDER BY user_id, day""".stripMargin,

    // the declarative equivalent: two pre-aggregates full-outer joined —
    // per-element cents rounding mirrors the typed fold exactly
    "q121_cogroup_recon" ->
      """WITH o AS (SELECT o_custkey AS k, count(*)::BIGINT AS no,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS oc
        |  FROM orders GROUP BY k),
        |e AS (SELECT user_id AS k, count(*)::BIGINT AS ne,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS ec
        |  FROM events GROUP BY k)
        |SELECT coalesce(o.k, e.k) AS custkey,
        |  coalesce(no, 0) AS n_orders, coalesce(ne, 0) AS n_events,
        |  coalesce(oc, 0) AS order_cents, coalesce(ec, 0) AS event_cents
        |FROM o FULL OUTER JOIN e ON o.k = e.k
        |ORDER BY custkey""".stripMargin,

    // identical per-user lag chain; integer epoch-second gaps so the
    // timing sums are exact cross-engine
    "q116_transitions" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |    lead(event_type, 1) OVER w AS next_type,
        |    epoch_us(lead(ts, 1) OVER w) // 1000000
        |      - epoch_us(ts) // 1000000 AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT event_type AS from_type, next_type,
        |    count(*)::BIGINT AS n_transitions,
        |    sum(gap_s)::BIGINT AS sum_gap_s, max(gap_s)::BIGINT AS max_gap_s
        |  FROM s WHERE next_type IS NOT NULL GROUP BY from_type, next_type),
        |o AS (SELECT from_type, sum(n_transitions)::BIGINT AS n_out
        |  FROM c GROUP BY from_type)
        |SELECT c.from_type, c.next_type, c.n_transitions,
        |  (c.n_transitions * 1000000) // o.n_out AS prob_e6,
        |  c.sum_gap_s // c.n_transitions AS mean_gap_s, c.max_gap_s
        |FROM c JOIN o ON o.from_type = c.from_type
        |ORDER BY c.from_type, c.next_type""".stripMargin,

    // each event's 4 containing windows: the epoch-aligned 15-min grid
    // slot it lands in, minus 0..3 slides
    "q115_sliding_window" ->
      """WITH e AS (SELECT event_type, value, ts,
        |    TIMESTAMP '1970-01-01 00:00:00'
        |      + ((epoch_us(ts) // 1000000 // 900) * 900 - k * 900)
        |        * INTERVAL 1 SECOND AS window_start
        |  FROM events, unnest(generate_series(0, 3)) AS u(k))
        |SELECT window_start, event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM e GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    // The same three chained cumulative-max windows, layered as CTEs
    // (a window expression can't reference a same-SELECT alias).
    "q86_funnel" ->
      """WITH f1 AS (SELECT user_id, ts, event_id, event_type,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen_view
        |  FROM events),
        |f2 AS (SELECT *,
        |    max(CASE WHEN event_type = 'click' AND seen_view = 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen_vc
        |  FROM f1),
        |f3 AS (SELECT *,
        |    max(CASE WHEN event_type = 'purchase' AND seen_vc = 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen_vcp
        |  FROM f2),
        |u AS (SELECT user_id, max(seen_view) AS v, max(seen_vc) AS vc,
        |    max(seen_vcp) AS vcp
        |  FROM f3 GROUP BY user_id)
        |SELECT count(*)::BIGINT AS n_users, sum(v)::BIGINT AS n_view,
        |  sum(vc)::BIGINT AS n_view_click, sum(vcp)::BIGINT AS n_full_funnel
        |FROM u""".stripMargin,

    "q87_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |d AS (SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM days)
        |SELECT cohort_day, datediff('day', cohort_day, day) AS offset_days,
        |  count(*)::BIGINT AS n_active_users
        |FROM d GROUP BY cohort_day, datediff('day', cohort_day, day)
        |ORDER BY cohort_day, offset_days""".stripMargin,

    // Unpivot ≡ UNION ALL of one SELECT per measure; Spark's unpivot
    // emits the measure's COLUMN NAME in the variable column, mirrored
    // here as string literals.
    "q85_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  round(min(value), 2) AS min_value,
        |  round(max(value), 2) AS max_value
        |FROM u GROUP BY measure ORDER BY measure""".stripMargin,

    "q42_array_funcs" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> x::DOUBLE * x::DOUBLE))), 4) AS l2_norm,
        |  round(list_max(list_transform(embedding, x -> x::DOUBLE)), 4) AS max_elem,
        |  round(list_sort(list_transform(embedding, x -> x::DOUBLE), 'DESC')[2], 4)
        |    AS second_largest
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "q43_above_nation_avg" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE c_acctbal > 1.5 * (
        |  SELECT avg(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q44_theta_join" ->
      """SELECT r_name, n_name
        |FROM nation JOIN region ON n_regionkey != r_regionkey
        |ORDER BY r_name, n_name""".stripMargin,

    "q53_from_json_struct" ->
      """SELECT event_type, count(*) AS n_even,
        |  cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_even_k
        |FROM events
        |WHERE cast(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q45_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  date_diff('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate) AS day_n,
        |  CAST((2 * sum((cast(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT) OVER w
        |    + count(*) OVER w) // (2 * count(*) OVER w) AS BIGINT) AS avg_30d_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY
        |  date_diff('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate)
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    // same dictionary rollup, same final-token block, same classic
    // Levenshtein DP (both engines implement the textbook distance)
    "q184_fuzzy_linkage" ->
      """WITH names AS (SELECT p_name AS name, count(*)::BIGINT AS n,
        |    string_split(p_name, ' ')[-1] AS blk
        |  FROM part GROUP BY p_name)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  levenshtein(a.name, b.name)::BIGINT AS dist,
        |  a.n AS n_a, b.n AS n_b
        |FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 4
        |ORDER BY name_a, name_b""".stripMargin,
  )
}

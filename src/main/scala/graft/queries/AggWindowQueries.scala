package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.ops.Relational

/** SURVEY §2 aggregation / window / sort / generator / check queries, plus
  * the four analytics aggregates of §3.3 re-expressed on the TPC-H-ish
  * star schema (orders=fact, customer/nation=dims).
  */
object AggWindowQueries {

  /** Hot-key table for lineitem.l_partkey at the ≥40 threshold — the one
    * detection pass (CMS sketch + exact candidate recount, the expensive
    * scans of a12/j10) shared between the a12 gate and j10's routing via
    * `InterStage`: whichever consumer runs first pays it, the other reads
    * the materialized (l_partkey, cnt) parquet. Same shape as the
    * shingle/simhash chains — detection is a stage output, not a per-query
    * recomputation.
    */
  def hotPartKeys(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.ops.InterStage.materialize(s,
      graft.ops.InterStage.tableKey(d, "lineitem") + "|hh_l_partkey_40",
      Relational.heavyHitters(
        Tables.load(s, d, "lineitem").select(col("l_partkey")),
        "l_partkey", 40L))

  val all: Seq[(String, GQ)] = Seq(

    // A1 — group-by multi-agg, TPC-H-Q1-shaped (reference:
    // load_sample_aggregates.py:28-43).
    "a1_pricing_summary" -> GQ(
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order")),
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_discount), 4) AS avg_disc, " +
        "count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus"),

    // §3.3 per_month analog (reference: load_sample_aggregates.py:23-51).
    "agg_per_month" -> GQ(
      (s, d) => Tables.load(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("year_month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy(col("year_month")),
      "SELECT strftime(o_orderdate, '%Y-%m') AS year_month, count(*) AS n_orders, " +
        "round(sum(o_totalprice), 2) AS total_price, " +
        "round(avg(o_totalprice), 2) AS avg_price FROM orders GROUP BY 1"),

    // §3.3 per_ward analog: fact joined to a broadcast dim, grouped
    // (reference: load_sample_aggregates.py:54-86).
    "agg_per_segment" -> GQ(
      (s, d) => {
        val o = Tables.load(s, d, "orders")
        val c = Tables.load(s, d, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_price"),
            round(avg(col("o_totalprice")), 2).as("avg_price"))
      },
      "SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) " +
        "AS total_price, round(avg(o_totalprice), 2) AS avg_price FROM orders " +
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"),

    // §3.3 types_per_ward analog: two-hop dim chain, composite group
    // (reference: load_sample_aggregates.py:89-120).
    "agg_types_per_nation" -> GQ(
      (s, d) => {
        val o = Tables.load(s, d, "orders")
        val c = Tables.load(s, d, "customer")
        val n = Tables.load(s, d, "nation")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_price"))
      },
      "SELECT n_name, o_orderpriority, count(*) AS n_orders, " +
        "round(sum(o_totalprice), 2) AS total_price FROM orders " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name, o_orderpriority"),

    // §3.3 per_location_type analog: filtered aggregate (reference:
    // load_sample_aggregates.py:123-164 filters response-time range).
    "agg_priority_filtered" -> GQ(
      (s, d) => Tables.load(s, d, "orders")
        .where(col("o_totalprice") > 100000 &&
          year(col("o_orderdate")).between(1996, 1998))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(avg(col("o_totalprice")), 2).as("avg_price")),
      "SELECT o_orderpriority, count(*) AS n_orders, round(avg(o_totalprice), 2) " +
        "AS avg_price FROM orders WHERE o_totalprice > 100000 AND " +
        "year(o_orderdate) BETWEEN 1996 AND 1998 GROUP BY o_orderpriority"),

    // A9 — hierarchical rollup: subtotals per (year, priority), per year,
    // and grand total in one pass (partial-aggregation friendly; the
    // warehouse-native form of multi-granularity aggregates).
    "a9_rollup" -> GQ(
      (s, d) => Tables.load(s, d, "orders")
        .rollup(year(col("o_orderdate")).as("order_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price")),
      "SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority, " +
        "count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price " +
        "FROM orders GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)"),

    // A10 — grouping sets with grouping_id disambiguation (cube corner).
    "a10_grouping_sets" -> GQ(
      (s, d) => Tables.load(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid")),
      "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "GROUPING(l_returnflag, l_linestatus) AS gid FROM lineitem " +
        "GROUP BY CUBE (l_returnflag, l_linestatus)"),

    // A11 — exact grouped percentiles (the distribution-profiling pass a
    // quality pipeline runs before choosing filter thresholds): quartiles
    // of quantity and price per return flag. Spark's `percentile` and
    // DuckDB's `quantile_cont` both interpolate at rank p*(n-1); round(6)
    // absorbs any last-ulp interpolation-order difference. Exact
    // percentiles sort within each group partition — grouped percentiles
    // shuffle on the group key and scale with the widest group, which is
    // the accepted cost of an exact answer (the sketch path for when a
    // group no longer fits a partition is approx_percentile, spec'd in
    // ApproxAggSpec; no DuckDB-reproducible oracle exists for a sketch).
    "a11_group_percentiles" -> GQ(
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("qty_p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("qty_p75"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("price_p50"),
          round(expr("percentile(l_extendedprice, 0.99)"), 6).as("price_p99")),
      "SELECT l_returnflag, " +
        "round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25, " +
        "round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50, " +
        "round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75, " +
        "round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50, " +
        "round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99 " +
        "FROM lineitem GROUP BY l_returnflag"),

    // A2 — pivot aggregate, long->wide with explicit pivot values for
    // determinism (reference: aq-cleanse.py:215-219; SURVEY §7.4.4).
    "a2_pivot_wide" -> GQ(
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(avg(col("l_quantity")), 2)),
      "SELECT l_returnflag, round(avg(CASE WHEN l_linestatus = 'F' THEN " +
        "l_quantity END), 2) AS \"F\", round(avg(CASE WHEN l_linestatus = 'O' " +
        "THEN l_quantity END), 2) AS \"O\" FROM lineitem GROUP BY l_returnflag"),

    // A3 — collapse-to-one-row-per-key dedup aggregation; deterministic
    // max_by instead of the reference's order-dependent first()
    // (reference: ward-dimension.py:42-46).
    "a3_collapse_per_key" -> GQ(
      (s, d) => Tables.load(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(max_by(col("c_name"), col("c_custkey")).as("latest_name"),
          round(max(col("c_acctbal")), 2).as("max_bal"),
          count(lit(1)).as("n_customers")),
      "SELECT c_nationkey, max_by(c_name, c_custkey) AS latest_name, " +
        "round(max(c_acctbal), 2) AS max_bal, count(*) AS n_customers " +
        "FROM customer GROUP BY c_nationkey"),

    // A4 — distinct projection (reference: derive-location-types.py:18-19).
    "a4_distinct_domain" -> GQ(
      (s, d) => Tables.load(s, d, "orders")
        .select("o_orderstatus", "o_orderpriority").distinct(),
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"),

    // A5 — global scalar aggregate (reference: date-dimension.py:36-39,
    // aq-cleanse.py:136-139).
    "a5_scalar_span" -> GQ(
      (s, d) => Tables.load(s, d, "orders").agg(
        to_date(min(col("o_orderdate"))).as("first_day"),
        to_date(max(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("n_rows"),
        round(avg(col("o_totalprice")), 2).as("avg_price")),
      "SELECT CAST(min(o_orderdate) AS DATE) AS first_day, " +
        "CAST(max(o_orderdate) AS DATE) AS last_day, count(*) AS n_rows, " +
        "round(avg(o_totalprice), 2) AS avg_price FROM orders"),

    // A6 — duplicate-count probe: groupBy(pk).count.filter(>1)
    // (reference: post-extract-check.py:27-34).
    "a6_duplicate_probe" -> GQ(
      (s, d) => Tables.load(s, d, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        .where(col("n_orders") > 1),
      "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey " +
        "HAVING count(*) > 1"),

    // A8 — two-pass z-score outlier null-out (reference:
    // aq-cleanse.py:123-157, threshold 3.0).
    "a8_zscore_outliers" -> GQ(
      (s, d) => {
        val ev = Tables.load(s, d, "events").select("event_id", "value")
        Relational.removeOutliers(ev, Seq("value"), 3.0)
          .select(col("event_id"), round(col("value"), 2).as("value_clean"))
      },
      "WITH s AS (SELECT avg(value) AS mu, stddev_samp(value) AS sigma FROM events) " +
        "SELECT event_id, round(CASE WHEN abs((value - mu) / sigma) > 3.0 " +
        "THEN NULL ELSE value END, 2) AS value_clean FROM events, s"),

    // W1 — first() over a desc-ordered partition, stamped on every row
    // (reference: lfb-cleanse.py:61-66 ward-code modernization).
    "w1_stamp_group_first" -> GQ(
      (s, d) => Relational.stampGroupFirst(
        Tables.load(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
        "latest_priority", col("o_orderpriority"),
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select("o_orderkey", "o_custkey", "latest_priority"),
      "WITH latest AS (SELECT o_custkey, o_orderpriority AS latest_priority " +
        "FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate DESC, o_orderkey DESC) = 1) " +
        "SELECT o.o_orderkey, o.o_custkey, l.latest_priority FROM orders o " +
        "JOIN latest l ON o.o_custkey = l.o_custkey"),

    // W2 — row_number top-1 per group (reference: load_fact.py:278-290).
    "w2_latest_per_group" -> GQ(
      (s, d) => Relational.topKPerGroup(Tables.load(s, d, "orders"),
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc), 1)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"), col("o_totalprice")),
      "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, " +
        "o_totalprice FROM orders QUALIFY row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"),

    // §2.10 — calendar generator: explode(sequence(min, max, 1 day)) +
    // date parts, Monday-first dow (reference: date-dimension.py:43-77).
    "g1_calendar_dim" -> GQ(
      (s, d) => Relational.calendarFor(Tables.load(s, d, "orders"), "o_orderdate"),
      "WITH span AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo, " +
        "CAST(max(o_orderdate) AS DATE) AS hi FROM orders), " +
        "days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) " +
        "AS cal_date FROM span) " +
        "SELECT cal_date, CAST(year(cal_date) AS INT) AS year, " +
        "CAST(month(cal_date) AS INT) AS month, CAST(day(cal_date) AS INT) AS day, " +
        "CAST(quarter(cal_date) AS INT) AS quarter, " +
        "CAST(weekofyear(cal_date) AS INT) AS week_of_year, " +
        "dayname(cal_date) AS day_name, monthname(cal_date) AS month_name, " +
        "CAST(isodow(cal_date) AS INT) AS day_of_week, " +
        "isodow(cal_date) >= 6 AS is_weekend FROM days"),

    // O1 — multi-column global sort of an aggregate (reference:
    // load_sample_aggregates.py:42,77,111,155). Row order is not part of
    // the hash contract; the sort exercises the operator.
    "o1_ordered_agg" -> GQ(
      (s, d) => Tables.load(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("order_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("order_year"), col("o_orderpriority")),
      "SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority, " +
        "count(*) AS n_orders FROM orders GROUP BY 1, 2 " +
        "ORDER BY n_orders DESC, order_year, o_orderpriority"),

    // C4 — per-column completeness profile (reference:
    // post-extract-check.py:37-40).
    "c4_completeness_profile" -> GQ(
      (s, d) => Tables.load(s, d, "customer").agg(
        round(count(col("c_name")).cast("double") / count(lit(1)), 4).as("name_ratio"),
        round(count(col("c_acctbal")).cast("double") / count(lit(1)), 4).as("acctbal_ratio"),
        count(lit(1)).as("n_rows")),
      "SELECT round(CAST(count(c_name) AS DOUBLE) / count(*), 4) AS name_ratio, " +
        "round(CAST(count(c_acctbal) AS DOUBLE) / count(*), 4) AS acctbal_ratio, " +
        "count(*) AS n_rows FROM customer"),

    // C8 — referential-integrity audit: distinct fact FKs anti-joined to
    // each dim (reference: ref-int-load-check.py:6-33).
    "c8_ref_integrity" -> GQ(
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        // One lazy plan, not three driver-side count() actions: each audit
        // is a 1-row aggregate and the crossJoin of three 1-row frames lets
        // Spark run the three anti-join branches as parallel stages of a
        // single job (the old form serialized three jobs on the driver).
        def missing(fk: String, dim: String, pk: String, out: String) =
          li.select(col(fk)).where(col(fk).isNotNull).distinct()
            .join(Tables.load(s, d, dim).select(col(pk).as(fk)), Seq(fk), "left_anti")
            .agg(count(lit(1)).as(out))
        missing("l_orderkey", "orders", "o_orderkey", "missing_orders")
          .crossJoin(missing("l_partkey", "part", "p_partkey", "missing_parts"))
          .crossJoin(missing("l_suppkey", "supplier", "s_suppkey", "missing_suppliers"))
      },
      "SELECT (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem l " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))) " +
        "AS missing_orders, (SELECT count(*) FROM (SELECT DISTINCT l_partkey " +
        "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p " +
        "WHERE p.p_partkey = l.l_partkey))) AS missing_parts, " +
        "(SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem l " +
        "WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))) " +
        "AS missing_suppliers"),

    // A12 — heavy hitters / hot-key detection: the exact set of join keys
    // appearing ≥ 40 times in the fact table, found through a Count-Min
    // prefilter (Relational.heavyHitters). This is the skew-diagnosis pass
    // a 100 TB pipeline runs BEFORE choosing a salted join (j9): the
    // sketch (a few hundred KB, cardinality-independent) crosses the wire
    // instead of billions of cold tail keys; CMS's no-underestimate
    // property makes the prefilter lossless, and the exact recount over
    // survivors reproduces the plain GROUP BY/HAVING the oracle runs.
    "a12_heavy_hitters" -> GQ(
      (s, d) => hotPartKeys(s, d),
      "SELECT l_partkey, count(*) AS cnt FROM lineitem " +
        "GROUP BY l_partkey HAVING count(*) >= 40"),

    // A13 — exact corpus-wide order statistics WITHOUT a global sort
    // (Relational.bucketedQuantiles): p50/p90/p99/p999 of the price
    // column as exact integer cents. a11's `percentile` sorts each group
    // inside one partition — fine for many small groups, fatal for ONE
    // corpus-sized group; here a $100-bucket histogram (map-side partial
    // agg, ~1k rows at any corpus size) locates each quantile's target
    // bucket, and only those buckets' slivers are pulled and sorted. The
    // oracle computes the same 0-based rank `(n-1)·num div den` by brute
    // force over a full sort — equality IS the claim that two-level
    // selection finds the exact order statistic. Ranks are integer math;
    // ties can't disturb the result (the rank's VALUE is tie-invariant).
    "a13_bucketed_quantiles" -> GQ(
      (s, d) => Relational.bucketedQuantiles(
        Tables.load(s, d, "lineitem")
          .select(round(col("l_extendedprice") * 100, 0).cast("long").as("cents")),
        "cents", 10000L,
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L),
          ("p999", 999L, 1000L))),
      "WITH c AS (SELECT round(l_extendedprice * 100)::BIGINT v FROM lineitem), " +
        "n AS (SELECT count(*) cnt FROM c), " +
        "r AS (SELECT v, row_number() OVER (ORDER BY v) - 1 rn FROM c), " +
        "t AS (SELECT 'p50' q, 1::BIGINT num, 2::BIGINT den " +
        "UNION ALL SELECT 'p90', 9, 10 UNION ALL SELECT 'p99', 99, 100 " +
        "UNION ALL SELECT 'p999', 999, 1000) " +
        "SELECT t.q, ((n.cnt - 1) * t.num) // t.den AS rank, r.v AS value " +
        "FROM t, n, r WHERE r.rn = ((n.cnt - 1) * t.num) // t.den"),

    // A14 — incremental rollup maintenance (Relational.aggState /
    // mergeAggStates): the pricing rollup maintained as three ingest
    // batches' algebraic states (n / sum / min / max per measure, exact
    // integer units) folded together — the materialized-view delta
    // pattern that never re-reads history at 100 TB. The oracle is the
    // single-pass GROUP BY over the whole table: equality IS the claim
    // that batch states merge losslessly. Measures are pre-quantized
    // (qty rounded to long, price to cents) so the identity is bit-exact
    // rather than fp-summation-order-lucky.
    "a14_incremental_rollup" -> GQ(
      (s, d) => {
        val li = Tables.load(s, d, "lineitem").select(
          col("l_returnflag"), col("l_linestatus"),
          round(col("l_quantity"), 0).cast("long").as("qty"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
          col("l_orderkey"))
        val keys = Seq("l_returnflag", "l_linestatus")
        val batches = (0 to 2).map(b =>
          Relational.aggState(li.where(col("l_orderkey") % 3 === b)
            .drop("l_orderkey"), keys, Seq("qty", "cents")))
        Relational.mergeAggStates(batches, keys, Seq("qty", "cents"))
          .select(col("l_returnflag"), col("l_linestatus"),
            col("n").as("n_rows"), col("sum_qty"), col("min_qty"),
            col("max_qty"), col("sum_cents"), col("min_cents"),
            col("max_cents"))
      },
      "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, " +
        "sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty, " +
        "min(round(l_quantity)::BIGINT) AS min_qty, " +
        "max(round(l_quantity)::BIGINT) AS max_qty, " +
        "sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_cents, " +
        "min(round(l_extendedprice * 100)::BIGINT) AS min_cents, " +
        "max(round(l_extendedprice * 100)::BIGINT) AS max_cents " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),

    // C9 — distribution-drift check between two snapshots (PSI, the
    // population-stability index every production feature/data pipeline
    // alarms on): events split into early/late halves of the time span,
    // per event_type the value histogram (fixed $50 buckets clamped to
    // [0, 9] on both ends — identical to EventStreams.driftBucket)
    // is compared via Σ (p−q)·ln(p/q) with add-0.5 smoothing so a bucket
    // empty on one side stays finite. Shape at 100 TB: ONE pass groups
    // (type, bucket, side) — partial agg map-side, output is
    // types×buckets rows — then all remaining arithmetic happens on that
    // tiny table; nothing corpus-sized crosses a second shuffle. The
    // mid-span split point rides the same plan as a broadcast scalar
    // (no driver round-trip). Both engines do the identical IEEE double
    // ops on identical inputs; round(6) absorbs summation order.
    "c9_psi_drift" -> GQ(
      (s, d) => {
        val raw = Tables.load(s, d, "events")
        // Null-valued events are excluded up front — EXACTLY the streaming
        // driftMonitor's treatment (null rate is c4's signal, not a value
        // distribution's), and necessary for correctness: Spark's and
        // DuckDB's least/greatest SKIP nulls, so an unguarded clamp would
        // silently bin nulls into the top bucket on both engines.
        val ev = raw.where(col("value").isNotNull)
          .select(col("event_type"), col("value"),
            Tables.eventTimeUs(raw).as("tus"))
        val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
        val h = ev.crossJoin(broadcast(mid))
          .select(col("event_type"),
            // [0, 9] clamp on BOTH ends — the exact binning the streaming
            // driftMonitor uses, so batch gate and live monitor cannot
            // diverge on a corpus with negative values.
            greatest(least(floor(col("value") / 50.0), lit(9.0)), lit(0.0))
              .cast("long").as("bkt"),
            when(col("tus") <= col("mid"), 1L).otherwise(0L).as("isa"))
          .groupBy(col("event_type"), col("bkt"))
          .agg(sum(col("isa")).as("ca"),
            sum(lit(1L) - col("isa")).as("cb"))
        // Per-type totals as a WINDOW over the types×buckets table — a
        // groupBy-then-join-back would re-scan and re-shuffle the corpus
        // for the same numbers (the ScalePlanSpec pin caught exactly
        // that); the window's repartition moves ≤ types×buckets rows.
        val wT = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
        h.select(col("event_type"),
            ((col("ca") + 0.5) /
              (sum(col("ca")).over(wT) + count(lit(1)).over(wT) * 0.5)).as("p"),
            ((col("cb") + 0.5) /
              (sum(col("cb")).over(wT) + count(lit(1)).over(wT) * 0.5)).as("q"))
          .groupBy(col("event_type"))
          .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
            .as("psi"))
      },
      "WITH e AS (SELECT event_type, value, epoch_us(ts) tus FROM events " +
        "WHERE value IS NOT NULL), " +
        "m AS (SELECT (min(tus) + max(tus)) // 2 AS mid FROM e), " +
        "h AS (SELECT event_type, greatest(least(floor(value / 50.0), 9.0), 0.0)::BIGINT bkt, " +
        "sum(CASE WHEN tus <= mid THEN 1 ELSE 0 END) ca, " +
        "sum(CASE WHEN tus <= mid THEN 0 ELSE 1 END) cb " +
        "FROM e, m GROUP BY 1, 2), " +
        "t AS (SELECT event_type, sum(ca) na, sum(cb) nb, count(*) k " +
        "FROM h GROUP BY 1), " +
        "pq AS (SELECT h.event_type, (ca + 0.5) / (na + k * 0.5) p, " +
        "(cb + 0.5) / (nb + k * 0.5) q FROM h JOIN t ON h.event_type = t.event_type) " +
        "SELECT event_type, round(sum((p - q) * ln(p / q)), 6) AS psi " +
        "FROM pq GROUP BY event_type"),

    // J6 — temporal nearest-within-band join (±12 h), the reference's
    // bucket-replicate band join with corrected floor(epoch/B) bucketing
    // (reference: load_fact.py:225-297; SURVEY §2.4 J6). Timestamps are
    // compared in epoch-µs via the schema-adaptive Tables.eventTimeUs seam
    // (the cross-engine-exact representation: DuckDB's epoch_us agrees).
    "j6_nearest_within_band" -> GQ(
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val tus = Tables.eventTimeUs(ev)
        val probe = ev.where(col("event_type") === "error")
          .select(col("event_id").as("p_id"), tus.as("p_ts"))
        val readings = ev.where(col("event_type") === "view")
          .select(col("event_id").as("r_id"), tus.as("r_ts"))
        Relational.nearestWithinBand(probe, "p_id", "p_ts",
          readings, "r_ts", 43200L * 1000000L, "r_id")
          .select(col("p_id"), col("r_id"), abs(col("p_ts") - col("r_ts")).as("diff_us"))
      },
      "WITH probe AS (SELECT event_id AS p_id, epoch_us(ts) AS p_ts FROM events " +
        "WHERE event_type = 'error'), " +
        "r AS (SELECT event_id AS r_id, epoch_us(ts) AS r_ts FROM events " +
        "WHERE event_type = 'view') " +
        "SELECT p_id, r_id, abs(p_ts - r_ts) AS diff_us FROM probe LEFT JOIN r " +
        "ON abs(p_ts - r_ts) <= 43200000000 " +
        "QUALIFY row_number() OVER (PARTITION BY p_id " +
        "ORDER BY abs(p_ts - r_ts), r_id) = 1"),

    // J6b — the SAME band join with the reference's parentheses bug
    // REPLICATED (load_fact.py:261 buckets the reading side to
    // floor(epoch)/B — a fractional double that only equals a probe's
    // integral bucket when the epoch is an exact multiple of B, so
    // almost every probe keeps nulls). SURVEY §7.4.1's byte-parity knob:
    // the oracle REPLAYS the buggy bucketing in DuckDB (same float
    // division, same ±1 probe replication), so the divergence between
    // j6 and j6b is demonstrated against an independent engine rather
    // than asserted. Production callers never set the flag.
    "j6b_legacy_epoch_bug" -> GQ(
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val tus = Tables.eventTimeUs(ev)
        val probe = ev.where(col("event_type") === "error")
          .select(col("event_id").as("p_id"), tus.as("p_ts"))
        val readings = ev.where(col("event_type") === "view")
          .select(col("event_id").as("r_id"), tus.as("r_ts"))
        Relational.nearestWithinBand(probe, "p_id", "p_ts",
          readings, "r_ts", 43200L * 1000000L, "r_id", legacyEpochBug = true)
          .select(col("p_id"), col("r_id"), abs(col("p_ts") - col("r_ts")).as("diff_us"))
      },
      "WITH probe AS (SELECT event_id AS p_id, epoch_us(ts) AS p_ts FROM events " +
        "WHERE event_type = 'error'), " +
        "r AS (SELECT event_id AS r_id, epoch_us(ts) AS r_ts FROM events " +
        "WHERE event_type = 'view'), " +
        // the reference's reading bucket: floor(epoch) / B as FLOAT division
        "cand AS (SELECT p.p_id, r.r_id, abs(p.p_ts - r.r_ts) AS diff " +
        "FROM probe p JOIN (VALUES (-1), (0), (1)) v(d) ON true " +
        "JOIN r ON (p.p_ts // 43200000000 + v.d)::DOUBLE " +
        "= floor(r.r_ts) / 43200000000 " +
        "WHERE abs(p.p_ts - r.r_ts) <= 43200000000), " +
        "best AS (SELECT p_id, r_id, diff FROM cand " +
        "QUALIFY row_number() OVER (PARTITION BY p_id ORDER BY diff, r_id) = 1) " +
        "SELECT p.p_id, b.r_id, b.diff AS diff_us " +
        "FROM probe p LEFT JOIN best b USING (p_id)"),

    // Time-bucketed event aggregation (hourly tumbling windows, batch
    // form; integral `div` on epoch-µs keeps the bucket math exact —
    // no float division anywhere near a bucket boundary).
    "ev_hourly_rollup" -> GQ(
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        ev.withColumn("tus", Tables.eventTimeUs(ev))
          .groupBy(expr("tus div 3600000000").as("hour_bucket"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      },
      "SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type, " +
        "count(*) AS n_events, round(sum(value), 2) AS total_value " +
        "FROM events GROUP BY 1, 2"))
}

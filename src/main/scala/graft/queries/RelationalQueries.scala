package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational
import graft.ops.Relational.Bucket

/** SURVEY §2 operator-inventory queries: scans, sinks, projections,
  * per-column rewrites, joins, set ops. Each query exercises the
  * Spark-first re-expression of a reference operator (cited per entry) on
  * the driver-generated TPC-H-ish tables.
  */
object RelationalQueries {

  /** Scratch dirs for the write-path gates — shutdown-hook-cleaned, see
    * InterStage.scratchDir.
    */
  private def tmpDir(prefix: String): String =
    graft.ops.InterStage.scratchDir(prefix)

  val all: Seq[(String, GQ)] = Seq(

    // S1 — CSV scan with header + schema inference, via a write/read
    // round-trip of a parquet table (reference: etl/extract/lfb-extract.py:19;
    // the round-trip itself mirrors etl/transform/lfb-cleanse.py:36-41).
    // Explicit casts re-enforce the canonical schema (SURVEY §1.3).
    "s1_csv_scan_roundtrip" -> GQ(
      (s, d) => {
        val nation = Tables.load(s, d, "nation")
        val tmp = tmpDir("graft_csv_")
        nation.write.mode("overwrite").option("header", "true").csv(tmp)
        s.read.option("header", "true").option("inferSchema", "true").csv(tmp)
          .select(col("n_nationkey").cast("int"), col("n_name"),
            col("n_regionkey").cast("int"))
      },
      "SELECT n_nationkey, n_name, n_regionkey FROM nation"),

    // S3 — multi-file union scan: several per-path reads combined with
    // unionByName (reference: etl/extract/aq-extract.py:25-35).
    "s3_multifile_union_scan" -> GQ(
      (s, d) => {
        val sup = Tables.load(s, d, "supplier")
        val tmp = tmpDir("graft_multi_")
        // ONE pass writes both per-path files (partitionBy on the parity
        // key) instead of two filter+write jobs over the same scan; the
        // union-scan read side — the operator under test — is unchanged.
        sup.withColumn("__par", pmod(col("s_suppkey"), lit(2)))
          .write.mode("overwrite").option("header", "true")
          .partitionBy("__par").csv(tmp)
        Seq(s"$tmp/__par=0", s"$tmp/__par=1")
          .map(p => s.read.option("header", "true").option("inferSchema", "true").csv(p))
          .reduce(_ unionByName _)
          .select(col("s_suppkey").cast("long"), col("s_name"),
            col("s_nationkey").cast("int"), col("s_acctbal").cast("double"))
      },
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"),

    // S8 — JSON-lines source round-trip (extension beyond the reference's
    // CSV/parquet surface): documents -> JSONL -> schema-inferred read.
    // JSON string escaping must survive arbitrary document text; a training
    // corpus commonly arrives exactly this way (one JSON doc per line).
    "s8_jsonl_scan" -> GQ(
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val tmp = tmpDir("graft_jsonl_")
        docs.write.mode("overwrite").json(tmp)
        s.read.json(tmp)
          .select(col("doc_id").cast("long"), col("text"), col("lang"),
            col("source"), col("n_chars").cast("long"))
      },
      "SELECT doc_id, text, lang, source, n_chars FROM documents"),

    // S9 — ORC source/sink round-trip (extension beyond the reference's
    // CSV/parquet surface): columnar-format interop matters at corpus scale
    // — ORC ships with Spark, carries column statistics for predicate
    // pushdown like parquet, and a 100 TB lakehouse commonly mixes both.
    // The filter is applied AFTER the ORC re-read so the gate proves
    // ORC-side predicate pushdown, not parquet's.
    "s9_orc_roundtrip" -> GQ(
      (s, d) => {
        val cust = Tables.load(s, d, "customer")
        val tmp = tmpDir("graft_orc_")
        cust.write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .where(col("c_acctbal") > 0)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
            col("c_acctbal"))
      },
      "SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer " +
        "WHERE c_acctbal > 0"),

    // S2 + S5 — recursive directory scan with format-auto load
    // (reference: etl/transform/aq-cleanse.py:194-199 recursiveFileLookup;
    // ward-dimension.py:35 spark.read.load).
    "s2_s5_recursive_scan" -> GQ(
      (s, d) => {
        val nation = Tables.load(s, d, "nation")
        val tmp = tmpDir("graft_rec_")
        nation.where(col("n_regionkey") < 2).write.mode("overwrite")
          .parquet(s"$tmp/a/deep")
        nation.where(col("n_regionkey") >= 2).write.mode("overwrite")
          .parquet(s"$tmp/b")
        s.read.option("recursiveFileLookup", "true").load(tmp)
      },
      "SELECT * FROM nation"),

    // S6 + K4 + K5 + K6 — catalog round-trip: CREATE SCHEMA DDL,
    // partitioned saveAsTable with Z-order-emulating clustering
    // (repartitionByRange + sortWithinPartitions — SURVEY §2.2 K5), then a
    // catalog scan via spark.table + SHOW TABLES sanity
    // (reference: load_fact.py:393-408, load_sample_aggregates.py:172-183).
    "s6_k4_catalog_roundtrip" -> GQ(
      (s, d) => {
        s.sql("CREATE DATABASE IF NOT EXISTS analytics")
        s.sql("DROP TABLE IF EXISTS analytics.supplier_clustered")
        // A fresh session's in-memory catalog doesn't know about a previous
        // JVM's managed-table directory; clear it or saveAsTable refuses.
        graft.ops.Relational.prepareManagedOverwrite(s, "analytics.supplier_clustered")
        Tables.load(s, d, "supplier")
          .repartitionByRange(4, col("s_acctbal"))
          .sortWithinPartitions(col("s_acctbal"))
          .write.mode("overwrite").format("parquet")
          .partitionBy("s_nationkey").saveAsTable("analytics.supplier_clustered")
        assert(s.sql("SHOW TABLES IN analytics").where(col("tableName") ===
          "supplier_clustered").count() == 1)
        s.table("analytics.supplier_clustered")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
            col("s_acctbal"))
      },
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"),

    // S7 + U2 — local-rows sentinel source appended via name-resolved
    // union (reference: etl/transform/ward-dimension.py:53-55,
    // wb-dimension.py:100-103).
    "s7_sentinel_union_by_name" -> GQ(
      (s, d) => {
        import s.implicits._
        val region = Tables.load(s, d, "region")
        val sentinel = Seq((-1, "Unknown")).toDF("r_regionkey", "r_name")
        region.unionByName(sentinel)
      },
      "SELECT r_regionkey, r_name FROM region UNION ALL SELECT -1, 'Unknown'"),

    // U1 — positional union of two disjoint slices (reference:
    // etl/load/load_fact.py:244-256 bucket replication, aq-cleanse.py:283).
    "u1_union_positional" -> GQ(
      (s, d) => {
        val nation = Tables.load(s, d, "nation")
        nation.where(col("n_nationkey") < 10).union(nation.where(col("n_nationkey") >= 10))
      },
      "SELECT * FROM nation"),

    // J8 — range join: every order matched to the price tier whose
    // [lo, hi) interval contains it, via Relational.rangeJoin — points
    // bucket once, RANGE rows replicate into each bucket they overlap, and
    // the candidate set comes from a bucket equi-join with the interval
    // predicate as the re-verify (the asymmetry that scales: billions of
    // points, thousands of ranges). The tier table is a local-rows source;
    // at sf scale it would broadcast anyway — the gate exercises the
    // general bucketed form.
    "j8_range_join" -> GQ(
      (s, d) => {
        import s.implicits._
        val tiers = Seq(
          (0.0, 1000.0, "bronze"), (1000.0, 10000.0, "silver"),
          (10000.0, 50000.0, "gold"), (50000.0, 150000.0, "platinum"),
          (150000.0, 300000.0, "diamond"), (300000.0, 500000.0, "elite"))
          .toDF("lo", "hi", "tier")
        val pts = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Relational.rangeJoin(pts, "o_totalprice", tiers, "lo", "hi", 50000L)
          .select(col("o_orderkey"), col("o_totalprice"), col("tier"))
      },
      "SELECT o_orderkey, o_totalprice, tier FROM orders " +
        "JOIN (VALUES (0.0, 1000.0, 'bronze'), (1000.0, 10000.0, 'silver'), " +
        "(10000.0, 50000.0, 'gold'), (50000.0, 150000.0, 'platinum'), " +
        "(150000.0, 300000.0, 'diamond'), (300000.0, 500000.0, 'elite')) " +
        "t(lo, hi, tier) ON o_totalprice >= lo AND o_totalprice < hi"),

    // J9 — skew-salted equi join: the fact side's key is salted with a
    // stable residue, the dim side replicates once per salt value, and the
    // join runs on (key, salt) — a hot key's rows spread over saltFactor
    // reducers instead of hammering one (the deterministic pre-AQE answer
    // to shuffle skew at 100 TB). The gate pins the operator's contract:
    // the salted result EQUALS the plain equi-join, which is exactly what
    // the oracle computes.
    "j9_salted_join" -> GQ(
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .where(col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val o = Tables.load(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority"), col("o_totalprice"))
        graft.ops.Relational.saltedJoin(li, o, Seq("l_orderkey"), 8)
      },
      "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, " +
        "o.o_orderpriority, o.o_totalprice FROM lineitem l " +
        "JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "WHERE l.l_quantity > 45"),

    // J10 — differential skew join (Relational.skewSplitJoin): a12's
    // CMS-prefiltered hot-key detection composed with broadcast/shuffle
    // routing — rows of keys appearing ≥ 40× never enter the shuffle (hot
    // slice of the build side broadcasts; membership tested map-side),
    // cold rows take the ordinary equi join with per-key volume bounded
    // by the threshold. j9's salting divides a hot pile by a constant;
    // this removes it from the shuffle entirely — the remaining tool when
    // ONE key is a meaningful fraction of a 100 TB fact table. The oracle
    // is the plain inner join: routing must be invisible row-for-row.
    // Detection rides the SHARED a12 hot-key table (hotPartKeys): one CMS
    // sketch + recount pass per session serves both gates.
    "j10_skew_split_join" -> GQ(
      (s, d) => Relational.skewSplitJoin(
        Tables.load(s, d, "lineitem")
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity")),
        Tables.load(s, d, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_name")),
        "l_partkey",
        AggWindowQueries.hotPartKeys(s, d).select(col("l_partkey"))),
      "SELECT l.l_partkey, l.l_orderkey, l.l_linenumber, l.l_quantity, " +
        "p.p_name FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"),

    // K8 — real Z-order clustering (Relational.zorderBy), upgrading K5's
    // single-dimension range+sort OPTIMIZE/ZORDER emulation: Morton
    // bit-interleave of per-column ranks, so BOTH cluster columns' per-file
    // min/max spans shrink and parquet footer stats skip files for a
    // predicate on either (ZorderSpec measures the spans; this gate pins
    // the content contract — clustering is layout only, rows unchanged).
    "k8_zorder_cluster" -> GQ(
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"))
        val out = tmpDir("graft_zorder_") + "/li"
        Relational.zorderBy(li, Seq("l_partkey", "l_suppkey"), 16)
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      },
      "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity " +
        "FROM lineitem"),

    // K8b — the same OPTIMIZE/ZORDER content contract on the Hilbert
    // curve path (zorderBy(curve = "hilbert") → native HilbertIndexF):
    // identical rows out, only the layout differs. ZorderSpec measures the
    // files-per-lookup gap vs Morton; HilbertSpec proves the curve
    // properties; this gate pins that the codegen'd expression never
    // corrupts or drops a row on real data.
    "k8b_zorder_hilbert" -> GQ(
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"))
        val out = tmpDir("graft_zorder_h_") + "/li"
        Relational.zorderBy(li, Seq("l_partkey", "l_suppkey"), 16,
            curve = "hilbert")
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      },
      "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity " +
        "FROM lineitem"),

    // J1 + K2 — the incremental-load primitive: append only rows whose key
    // is absent from the existing sink, with overwrite fallback on first
    // run (reference: etl/extract/lfb-extract.py:30-52).
    "k2_incremental_append" -> GQ(
      (s, d) => {
        val orders = Tables.load(s, d, "orders")
        val path = tmpDir("graft_inc_") + "/orders"
        orders.where(year(col("o_orderdate")) < 1998)
          .write.mode("overwrite").parquet(path)
        Relational.incrementalAppend(orders, Seq("o_orderkey"), path)
        s.read.parquet(path).withColumn("o_orderdate", to_date(col("o_orderdate")))
      },
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
        "CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority FROM orders"),

    // S10 — hive-partitioned parquet dataset: write orders partitioned by
    // priority, read the dataset back through a partition filter. The
    // filter prunes at the source (ScalePlanSpec asserts the plan; this
    // gate asserts the VALUES) — the layout every 100 TB fact table uses,
    // where a day/priority predicate must never scan the other partitions.
    // The partition column round-trips through the directory name, so its
    // type/values surviving is part of what's checked.
    "s10_partitioned_scan" -> GQ(
      (s, d) => {
        val tmp = tmpDir("graft_part_")
        Tables.load(s, d, "orders")
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
        s.read.parquet(tmp)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority"))
      },
      "SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate, " +
        "o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'"),

    // K7 — cumulative batch-split preprocessor (reference:
    // batching/lfb-preprocess.py:34-58 + batching/config.yaml:1-3): union
    // raw CSVs by name, parse the date column, write cumulative batches —
    // batch i = rows with date < splitDates(i), final batch = everything.
    // The gate round-trips orders through two CSV shards and the split,
    // then proves batch membership with per-batch row counts and key sums
    // against DuckDB's date filters on the source table.
    "k7_batch_split" -> GQ(
      (s, d) => {
        val orders = Tables.load(s, d, "orders")
          .withColumn("o_orderdate", date_format(col("o_orderdate"), "dd/MM/yyyy"))
        val tmp = tmpDir("graft_batch_")
        // ONE pass writes both landing shards: partitionBy on the parity
        // key scans + date-formats orders once where the r20 per-shard
        // filter + coalesce(1) form did it twice (two sequential jobs).
        // coalesce(1) BEFORE the partitionBy (narrow — no exchange; a
        // repartition here measured SLOWER in r21, 2.31 vs 1.76) bounds
        // the write to ONE file per shard dir, restoring the gate's
        // one-raw-CSV-per-shard fixture (ADVICE r21: the r21 multi-file
        // form changed the read-side file profile batchSplit sees). r22
        // K7Probe, quiet window, interleaved 5 rounds: r21 partitionBy
        // med 1.34 / r20 two-pass 1.39 / this form 1.32 — the driver's
        // r21 k7 elevation did not reproduce (write-path ambient). Row
        // order within a shard is not part of batchSplit's contract.
        orders.withColumn("__par", pmod(col("o_orderkey"), lit(2)))
          .coalesce(1)
          .write.mode("overwrite").option("header", "true")
          .partitionBy("__par").csv(s"$tmp/in")
        graft.warehouse.Jobs.batchSplit(s, Seq(s"$tmp/in/__par=0", s"$tmp/in/__par=1"),
          s"$tmp/out", "o_orderdate", "dd/MM/yyyy",
          Seq("1997-01-01", "1999-01-01"))
        (1 to 3).map { i =>
          s.read.option("header", "true").csv(s"$tmp/out/$i")
            .agg(count(lit(1)).as("n_rows"),
              sum(col("o_orderkey").cast("long")).as("key_sum"))
            .select(lit(i).as("batch"), col("n_rows"), col("key_sum"))
        }.reduce(_ unionByName _)
      },
      "SELECT 1 AS batch, count(*) AS n_rows, sum(o_orderkey)::BIGINT AS key_sum " +
        "FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' " +
        "UNION ALL SELECT 2, count(*), sum(o_orderkey)::BIGINT " +
        "FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' " +
        "UNION ALL SELECT 3, count(*), sum(o_orderkey)::BIGINT FROM orders"),

    // P1/P2 — keep-list and drop-list projection (reference:
    // etl/transform/aq-cleanse.py:202; lfb-cleanse.py:32).
    "p1_p2_projection" -> GQ(
      (s, d) => Tables.load(s, d, "part").drop("p_type", "p_size"),
      "SELECT p_partkey, p_name, p_brand, p_retailprice FROM part"),

    // P3 — bulk rename (reference: etl/transform/wb-cleanse.py:172,
    // load_weather_dim.py:24-38 positional-schema rename).
    "p3_bulk_rename" -> GQ(
      (s, d) => Tables.load(s, d, "supplier").withColumnsRenamed(Map(
        "s_suppkey" -> "id", "s_name" -> "name",
        "s_nationkey" -> "nation_id", "s_acctbal" -> "balance")),
      "SELECT s_suppkey AS id, s_name AS name, s_nationkey AS nation_id, " +
        "s_acctbal AS balance FROM supplier"),

    // P4/P5/P6 — value replacement -> null, conditional null-out, and
    // null-fill defaults (reference: lfb-cleanse.py:33,44-55;
    // wb-dimension.py:92; load_fact.py:356-379).
    "p4_p5_p6_null_cleanse" -> GQ(
      (s, d) => {
        val c = Tables.load(s, d, "customer")
          .na.replace("c_mktsegment", Map("BUILDING" -> null))
          .na.fill("Unknown", Seq("c_mktsegment"))
        c.select(col("c_custkey"), col("c_mktsegment").as("segment"),
          round(coalesce(
            when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")),
            lit(0.0)), 2).as("acctbal_clean"))
      },
      "SELECT c_custkey, CASE WHEN c_mktsegment = 'BUILDING' THEN 'Unknown' " +
        "ELSE c_mktsegment END AS segment, round(CASE WHEN c_acctbal < 0 " +
        "THEN 0.0 ELSE c_acctbal END, 2) AS acctbal_clean FROM customer"),

    // P8/P12 — type casts and case normalization via initcap (reference:
    // lfb-cleanse.py:58; load_fact.py:383).
    "p8_p12_cast_initcap" -> GQ(
      (s, d) => Tables.load(s, d, "region").select(
        col("r_regionkey").cast("long").as("region_id"),
        initcap(lower(col("r_name"))).as("region_name")),
      "SELECT CAST(r_regionkey AS BIGINT) AS region_id, " +
        "array_to_string(list_transform(string_split(lower(r_name), ' '), " +
        "x -> upper(x[1]) || x[2:]), ' ') AS region_name FROM region"),

    // P9 — range->label bucketing via folded when-chain (reference:
    // aq-cleanse.py:160-187, weather-cleanse.py:117-137).
    "p9_bucketize_price" -> GQ(
      (s, d) => Tables.load(s, d, "orders").select(col("o_orderkey"),
        Relational.bucketize(col("o_totalprice"), Seq(
          Bucket(None, Some(50000), "Low"),
          Bucket(Some(50000), Some(150000), "Medium"),
          Bucket(Some(150000), Some(300000), "High"),
          Bucket(Some(300000), None, "Extreme")), "Unknown").as("price_band")),
      "SELECT o_orderkey, CASE WHEN o_totalprice IS NULL THEN 'Unknown' " +
        "WHEN o_totalprice < 50000 THEN 'Low' " +
        "WHEN o_totalprice >= 50000 AND o_totalprice < 150000 THEN 'Medium' " +
        "WHEN o_totalprice >= 150000 AND o_totalprice < 300000 THEN 'High' " +
        "WHEN o_totalprice >= 300000 THEN 'Extreme' ELSE 'Unknown' END " +
        "AS price_band FROM orders"),

    // P10 — derived measures with divide-by-zero guards (reference:
    // weather-cleanse.py:140-161, load_fact.py:379-385). Per-row arithmetic
    // is emitted unrounded: identical IEEE op order makes the doubles
    // bit-identical across engines, whereas round() half-tie behavior on
    // exact-decimal products is engine-specific.
    "p10_derived_measures" -> GQ(
      (s, d) => Tables.load(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("charge"),
        when(col("l_discount") === 0, lit(null))
          .otherwise((col("l_tax") - col("l_discount")) / col("l_discount") * 100)
          .as("tax_discount_pct"),
        (col("l_partkey") % 360).as("partkey_mod"),
        col("l_quantity").cast("int").as("qty_int")),
      "SELECT l_orderkey, l_linenumber, " +
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge, " +
        "CASE WHEN l_discount = 0 THEN NULL ELSE " +
        "(l_tax - l_discount) / l_discount * 100 END AS tax_discount_pct, " +
        "l_partkey % 360 AS partkey_mod, " +
        "CAST(floor(l_quantity) AS INT) AS qty_int FROM lineitem"),

    // P11 — deterministic surrogate hash key (reference:
    // ward-dimension.py:23-28, load_fact.py:129-139).
    "p11_surrogate_key" -> GQ(
      (s, d) => Tables.load(s, d, "customer").select(col("c_custkey"),
        Relational.hashId(Seq(col("c_name"), col("c_mktsegment"),
          col("c_nationkey"))).as("surrogate_id")),
      "SELECT c_custkey, sha256(concat_ws('|', c_name, c_mktsegment, " +
        "CAST(c_nationkey AS VARCHAR))) AS surrogate_id FROM customer"),

    // P13 — conditional column rewiring: chained when/otherwise +
    // coalesce override (reference: incident-type-populate.py:22-62 ≡
    // load_fact.py:100-140, "Unknown" override :162-169).
    "p13_conditional_rewire" -> GQ(
      (s, d) => Tables.load(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", "Critical")
          .when(col("o_orderpriority") === "2-HIGH", "High")
          .when(col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"), "Normal")
          .otherwise("Low").as("priority_class"),
        coalesce(when(col("o_orderstatus") === "P", lit(null))
          .otherwise(col("o_orderstatus")), lit("PENDING")).as("status_resolved")),
      "SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' THEN 'Critical' " +
        "WHEN o_orderpriority = '2-HIGH' THEN 'High' " +
        "WHEN o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED') THEN 'Normal' " +
        "ELSE 'Low' END AS priority_class, " +
        "CASE WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE o_orderstatus END " +
        "AS status_resolved FROM orders"),

    // J1 — left-anti join as NOT-EXISTS (reference:
    // etl/extract/lfb-extract.py:36-37; ref-int-load-check.py:17-21).
    "j1_anti_join" -> GQ(
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
        Relational.newRowsOnly(c, o.select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey")).select("c_custkey", "c_name")
      },
      "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),

    // J3 — broadcast-hinted anti join (reference: aq-extract.py:52).
    "j3_broadcast_anti_join" -> GQ(
      (s, d) => {
        val p = Tables.load(s, d, "part")
        val li = Tables.load(s, d, "lineitem")
        Relational.newRowsOnly(p, li.select(col("l_partkey").as("p_partkey")),
          Seq("p_partkey"), broadcastExisting = true)
          .select("p_partkey", "p_name", "p_brand")
      },
      "SELECT p_partkey, p_name, p_brand FROM part p WHERE NOT EXISTS " +
        "(SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)"),

    // J4 — left-outer equi join on a single key with Unknown-default
    // (reference: load_fact.py:180-188; dim side broadcast per SURVEY §4).
    "j4_left_join_enrich" -> GQ(
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val p = Tables.load(s, d, "part")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
          .select(li("l_orderkey"), li("l_linenumber"),
            coalesce(p("p_brand"), lit("Unknown")).as("brand"),
            round(li("l_extendedprice"), 2).as("price"))
      },
      "SELECT l_orderkey, l_linenumber, coalesce(p_brand, 'Unknown') AS brand, " +
        "round(l_extendedprice, 2) AS price FROM lineitem LEFT JOIN part " +
        "ON l_partkey = p_partkey"),

    // J5 — left-outer equi join on a composite key (reference:
    // load_fact.py:329-336, fact <- well_being on (WardCode, YearOfCall)).
    "j5_left_join_composite" -> GQ(
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val dim = li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(round(avg(col("l_quantity")), 4).as("group_avg_qty"))
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
          .join(broadcast(dim), Seq("l_returnflag", "l_linestatus"), "left")
      },
      "WITH dim AS (SELECT l_returnflag, l_linestatus, " +
        "round(avg(l_quantity), 4) AS group_avg_qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_linestatus, " +
        "d.group_avg_qty FROM lineitem l LEFT JOIN dim d " +
        "ON l.l_returnflag = d.l_returnflag AND l.l_linestatus = d.l_linestatus"))
}

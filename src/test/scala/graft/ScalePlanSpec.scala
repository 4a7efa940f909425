package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression tests for the properties that matter at cluster
  * scale. These assert on the EXECUTED plan, so a refactor that silently
  * reintroduces a nested-loop pair join, an unnecessary shuffle, or a
  * full-table scan fails here before it ever reaches a benchmark.
  */
class ScalePlanSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize the adaptive plan
    // AdaptiveSparkPlan.toString appends the pre-adaptive "Initial Plan";
    // assertions must see only the final one or every operator counts twice
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("bucketed tables join without a shuffle exchange") {
    // Pre-bucketing both sides of a recurring big-big join on the join key
    // is the standard way to amortize the shuffle across every downstream
    // run at 100 TB: each bucket pair joins in place.
    spark.sql("CREATE DATABASE IF NOT EXISTS scalecheck")
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS scalecheck.$t")
      val stale = new java.io.File(s"spark-warehouse/scalecheck.db/$t")
      if (stale.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(stale)
      }
    }
    Tables.load(spark, Sf0001, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("scalecheck.orders_b")
    Tables.load(spark, Sf0001, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("scalecheck.lineitem_b")
    // disable broadcast so the tiny test tables take the big-big join path
    // the bucketing exists for
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        executedPlan(spark.table("scalecheck.orders_b")
          .join(spark.table("scalecheck.lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    // the only exchange allowed is the one feeding the final aggregation
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"bucketed join should not shuffle the join keys:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
  }

  test("partitioned table scans prune partitions at the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    Tables.load(spark, Sf0001, "orders")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    val q = spark.read.parquet(dir).where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"), plan)
    // the pruned scan must not read the full table: partition count check
    val files = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!files.contains("PartitionFilters: []"), files)
  }

  test("e3 LSH pair generation plans no nested-loop join") {
    // Regression guard for the round-2 finding: the near-dup pair join must
    // stay a bucket equi-join; a BroadcastNestedLoopJoin here is the O(n^2)
    // plan that cannot survive corpus scale. Asserted on the LIVE pipeline
    // (the e3 gate itself now scans the materialized pair table).
    val plan = executedPlan(
      graft.queries.VectorQueries.cosPairsLive(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("e8 semantic prune reads materialized labels, never re-runs CC") {
    // The prune gate's marginal cost is one aggregate + one equi-join over
    // the materialized cluster-label table. A live CC re-run would show up
    // as checkpoint-RDD scans (the round-8 d7 finding, fixed by sharing
    // the label table); a pair regeneration as the LSH explode.
    val plan = executedPlan(
      SparkEntry.queries("e8_semantic_prune")(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("Scan ExistingRDD"),
      s"e8 must scan the materialized label table, not a live CC run:\n${plan.take(2000)}")
    assert(!plan.contains("Generate explode"),
      s"e8 must not regenerate LSH candidates:\n${plan.take(2000)}")
  }

  test("e7b banded near-dup plans no nested-loop join") {
    // The all-pairs binary near-dup must stay a (band_idx, band_value)
    // equi-join — a nested-loop pair scan is the O(n^2) plan the bands
    // exist to avoid.
    val plan = executedPlan(
      SparkEntry.queries("e7b_binary_banded_neardup")(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("e7b complete-regime gate keeps the band equi-join plan") {
    // The completeness gate unions perturbed twins into the corpus; the
    // union must not push the pair join off the (band_idx, band_value)
    // equi-join path.
    val plan = executedPlan(
      SparkEntry.queries("e7b_complete")(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("d8 incremental dedup plans the band equi-join, never a nested loop") {
    // The batch-vs-history screen must stay a (band_idx, band_value)
    // equi-join: a nested-loop or cartesian pair scan would rescan the
    // full history per batch row — the exact plan the bands exist to avoid.
    val plan = executedPlan(
      SparkEntry.queries("d8_incremental_dedup")(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("e12 IVFPQ candidates come from a list-id equi-join, never a scan") {
    // The composed index's whole point is that a probe touches only its
    // nprobe lists: the join against the code table must be an equi-join
    // keyed on c_list. (BroadcastNestedLoopJoins DO legitimately appear —
    // they are the probe-side products against the tiny centroid/LUT
    // tables, probe-bounded O(1) rows, the same shape e6b's query side
    // plans — so the assertions target the corpus-sized join only.)
    val plan = executedPlan(
      SparkEntry.queries("e12_ivfpq_knn")(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val clistEqui = plan.linesIterator.exists(l =>
      (l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("c_list"))
    assert(clistEqui,
      s"the code-table join must be a c_list equi-join:\n${plan.take(2000)}")
  }

  test("t14 classifier scores map-side: broadcast weights, one exchange") {
    // The model-weight join must broadcast (weights are the small side at
    // any vocabulary size) and the only shuffle allowed is the per-document
    // aggregate — a shuffled weight join or a second exchange would put a
    // corpus-sized shuffle in front of every scoring pass.
    val plan = executedPlan(
      SparkEntry.queries("t14_quality_classifier")(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1,
      s"t14 must shuffle only the per-doc aggregate ($exchanges exchanges):\n${plan.take(2000)}")
  }

  test("t13 chunking plans zero exchanges") {
    // The chunker is pure per-row work and must compose with any upstream
    // partitioning — any Exchange in its plan is a regression against the
    // zero-shuffle contract its gate comment claims.
    val plan = executedPlan(
      SparkEntry.queries("t13_chunk_windows")(spark, Sf0001))
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("cleanse ward stamp plans a broadcast-agg join, never a corpus window shuffle") {
    // The modernized ward code is a per-ward constant; stamping it with a
    // window shuffled and sorted the WHOLE wide corpus (the 1B rung's
    // measured disk killer, SCALE.md r17). The shipped plan aggregates
    // map-side over ~600 ward groups and broadcast-joins back: the only
    // permissible hash exchange carries the tiny agg's group key, and no
    // Window operator may reappear.
    val dir = java.nio.file.Files.createTempDirectory("graft_cleanplan_")
    val csv = dir.resolve("lfb.csv").toString
    graft.warehouse.Fixtures.writeScaledLfbSpark(spark, csv, 2000L)
    graft.warehouse.Jobs.lfbExtract(spark, csv, dir.resolve("raw.parquet").toString)
    val raw = spark.read.parquet(dir.resolve("raw.parquet").toString)
    val plan = executedPlan(graft.warehouse.Jobs.lfbCleanseDf(raw))
    assert(!plan.contains("Window"),
      "cleanse reintroduced the corpus-wide window:\n" + plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"),
      "ward stamp join is not broadcast:\n" + plan.take(2000))
    // The one permissible hash exchange is the agg's partial->final hop
    // (per-partition partials over ~600 ward groups — tiny); the corpus
    // feeds the broadcast join's streamed side directly from the scan. A
    // corpus shuffle would add a second exchange (and a sort-merge join
    // would also lose the BroadcastHashJoin above).
    // (AQE renders the finished agg stage as a collapsed BroadcastQueryStage
    // leaf, so the agg's own operators are not visible here — the corpus
    // side is what this counts.)
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"cleanse plans $exchanges hash exchanges " +
      "(only the tiny agg's partial->final hop is allowed):\n" + plan.take(2000))
  }

  test("t12 shard packing never funnels the data through one partition") {
    // The naive global cumulative sum plans as `Exchange SinglePartition`
    // + an UNPARTITIONED Window over the raw rows — and it contains zero
    // range exchanges, so counting range exchanges cannot catch it. Assert
    // the actual two-level contract instead: every window over the data is
    // keyed by pk_bucket, and the only single-partition funnel carries the
    // per-bucket aggregate (one row per bucket), never the document rows.
    val q = SparkEntry.queries("t12_token_shards")(spark, Sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val lines = plan.linesIterator.toVector
    val winIdx = lines.zipWithIndex.filter(_._1.contains("Window "))
    assert(winIdx.nonEmpty, plan.take(2000))
    // The data-side window must exist and be PARTITIONED by pk_bucket —
    // the partitioned form prints three bracket groups with the partition
    // spec (no sort direction) in the middle: `], [pk_bucket#N], [`.
    val keyed = """.*\], \[pk_bucket#\d+\], \[.*"""
    assert(winIdx.exists(_._1.matches(keyed)),
      s"no pk_bucket-partitioned window over the data:\n${plan.take(2000)}")
    // Any OTHER window (no pk_bucket partition spec) is legal only over
    // the bucket table: its subtree must reach the per-bucket aggregate
    // within a few lines (Sort / shuffle-stage wrappers in between).
    winIdx.filterNot(_._1.matches(keyed)).foreach { case (_, i) =>
      assert(lines.slice(i + 1, i + 7)
        .exists(_.contains("HashAggregate(keys=[pk_bucket")),
        s"unpartitioned window not over the bucket aggregate (line $i):\n${plan.take(2000)}")
    }
    // At most one single-partition exchange, and it must feed from the
    // per-bucket aggregate — a SinglePartition exchange over the raw rows
    // is the global-cumsum plan this test exists to ban.
    val spIdx = lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
    assert(spIdx.size <= 1, plan.take(2000))
    spIdx.foreach { case (_, i) =>
      assert(lines.slice(i + 1, i + 5)
        .exists(_.contains("HashAggregate(keys=[pk_bucket")),
        s"SinglePartition exchange not over the bucket aggregate:\n${plan.take(2000)}")
    }
  }

  test("x1 decontamination broadcasts the eval n-gram set") {
    // The eval-set side must broadcast: at 100 TB the training-side index
    // never shuffles for this check.
    val plan = executedPlan(
      SparkEntry.queries("x1_decontaminate")(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("e2 multiprobe KNN joins buckets, never a nested-loop scan") {
    // The three-table radius-2 multiprobe must stay a bucket equi-join
    // per table (the recall knobs widen the MASK LIST, not the join
    // shape) — a nested-loop or cartesian candidate scan is the brute
    // force plan e2 exists to avoid.
    val plan = executedPlan(
      SparkEntry.queries("e2_knn_lsh")(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("e6b query side reads the materialized IVF index, not a rebuild") {
    // The build/query split: the gate's executed plan must source both
    // the centroid table and the replicated inverted index from
    // InterStage parquet (build once, query many). A corpus-wide Lloyd
    // rebuild in the query plan would put corpus-sized HashAggregates
    // here — seen as more than the probe-side work — and drop the
    // interstage scans.
    val q = SparkEntry.queries("e6b_ivf_adaptive")(spark, Sf0001)
    q.collect()
    // executedPlan flattens AQE-materialized scans; the full plan string
    // (with subtree details) names every file source
    val plan = q.queryExecution.executedPlan.toString
    val interScans = "graft_interstage_".r.findAllIn(plan).size
    assert(interScans >= 2,
      s"expected centroid + index interstage scans, found $interScans:\n${plan.take(2000)}")
  }

  test("pruned projections reach the parquet reader") {
    val q = Tables.load(spark, Sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>") ||
      scan.contains("ReadSchema: struct<l_orderkey"), scan)
    assert(!scan.contains("l_comment"), scan)
  }

  test("tp1 manifest funnels only language- or bucket-level aggregates") {
    // The end-to-end manifest composes four stages that each keep a
    // distributed shape; the only legal SinglePartition exchanges carry
    // the per-language threshold table or the per-bucket offsets of the
    // prefix sum — never document rows.
    val q = SparkEntry.queries("tp1_training_manifest")(spark, Sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        assert(lines.slice(i + 1, i + 7).exists(l =>
          l.contains("HashAggregate(keys=[lang") ||
            l.contains("HashAggregate(keys=[pk_bucket")),
          s"SinglePartition exchange over document rows (line $i):\n${plan.take(2000)}")
      }
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("d10 segment dedup keys every shuffle by segment hash or doc id") {
    // The first-occurrence election partitions by the 60-bit segment hash
    // and the rebuild by doc_id — both high-cardinality. A SinglePartition
    // exchange anywhere means the election degenerated into a global
    // window over every segment row, the shape that cannot scale.
    val plan = executedPlan(
      SparkEntry.queries("d10_segment_dedup")(spark, Sf0001))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("t15 mixture resampling broadcasts the threshold table") {
    // Selection must be a map-only scan against a broadcast per-language
    // threshold row: the only SinglePartition funnels carry the per-lang
    // aggregate (O(#languages) rows), never the document rows.
    val q = SparkEntry.queries("t15_mixture_resample")(spark, Sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        assert(lines.slice(i + 1, i + 7)
          .exists(_.contains("HashAggregate(keys=[lang")),
          s"SinglePartition exchange not over the per-lang aggregate:\n${plan.take(2000)}")
      }
  }

  test("a13 quantiles: no global sort; slivers pulled via a bucket join") {
    // The whole point of bucketedQuantiles is selecting order statistics
    // WITHOUT sorting the corpus: the only SinglePartition funnels carry
    // the bucket histogram (value-range/width rows, corpus-size-invariant)
    // for its prefix sum, and the data-side sliver pull is a broadcast
    // equi-join on the bucket id. A global Sort over the value column
    // means the op degenerated into the full-sort plan it exists to avoid.
    val q = SparkEntry.queries("a13_bucketed_quantiles")(spark, Sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        assert(lines.slice(i + 1, i + 8).exists(l =>
          l.contains("HashAggregate(keys=[__bkt")),
          s"SinglePartition exchange not over the bucket histogram (line $i):\n${plan.take(2500)}")
      }
    // Sorts may only appear under a window partitioned by q (the per-
    // quantile sliver selection), never as a global Sort of the corpus.
    lines.filter(_.trim.startsWith("+- Sort ")).foreach { l =>
      assert(l.contains("__bkt") || l.contains("q#"), s"unexpected sort: $l")
    }
  }

  test("c9 PSI drift: one data-sized shuffle, scalar aggregates elsewhere") {
    // The (type, bucket, side) grouped pass is the only corpus-sized
    // shuffle; every SinglePartition funnel must sit over an aggregate
    // (the span min/max scalar or the per-type totals), never raw events.
    val q = SparkEntry.queries("c9_psi_drift")(spark, Sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        assert(lines.slice(i + 1, i + 6).exists(_.contains("HashAggregate")),
          s"SinglePartition exchange not over an aggregate (line $i):\n${plan.take(2500)}")
      }
    val dataShuffles = lines.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("bkt"))
    assert(dataShuffles <= 1, s"expected one (type,bucket) shuffle:\n${plan.take(2500)}")
  }

  test("t11 dup rate shuffles the fingerprint table exactly once") {
    // The round-14 rewrite: occurrence counts via a window over ONE
    // win_min shuffle (the old groupBy-then-join-back shuffled the big
    // table twice). Pin the shape: exactly two hash exchanges total — the
    // fingerprint shuffle plus the doc-keyed rollup — no join, no funnel.
    val plan = executedPlan(SparkEntry.queries("t11_dup_rate")(spark, Sf0001))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
    assert(!plan.contains("Join"), s"t11 must not join the table back:\n${plan.take(2000)}")
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, s"expected exactly 2 shuffles, got $hashEx:\n${plan.take(2500)}")
  }

  test("t21 source quota plans one source-keyed shuffle and no funnel") {
    val plan = executedPlan(SparkEntry.queries("t21_source_quota")(spark, Sf0001))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      plan.take(2000))
  }

  test("t22 fuzzy join: candidates via equi-join; nested loop only on the short sliver") {
    // The candidate generator must be the (segment, length, substring)
    // equi-join — a CartesianProduct would mean the blocking degenerated
    // to all-pairs. The one allowed nested-loop node is the broadcast
    // short-short sliver (strings shorter than tau+1 chars; empty for
    // 30-char prefixes but present in the plan), and it must sit over a
    // broadcast, never a shuffle.
    val q = SparkEntry.queries("t22_fuzzy_edit_join")(spark, Sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the CANDIDATE join specifically must stay an equi-join keyed on the
    // segment substring (anchor on `sub#` in the join keys — the id
    // join-backs would satisfy a bare HashJoin assertion and let a
    // degraded candidate generator slip past), in whatever hash flavor
    // fits the corpus (broadcast at spec scale, shuffled beyond)
    assert(plan.linesIterator.exists(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("sub#")), plan.take(2000))
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"only the short-sliver pair join may nest:\n${plan.take(2000)}")
  }
}

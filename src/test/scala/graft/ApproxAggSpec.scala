package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates for 100 TB-scale profiling: HLL distinct counts
  * and quantile sketches. Cross-engine sketch internals differ, so these
  * are bound-checked against exact values here rather than oracle-gated.
  */
class ApproxAggSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, Sf0001, "orders")

  test("approx_count_distinct within 5% of exact") {
    val row = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact median") {
    val row = orders.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx"),
      expr("percentile(o_totalprice, 0.5)").as("exact")).head()
    val (approx, exact) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }

  test("CmsEstimateF never underestimates any key's true count") {
    // The property Relational.heavyHitters' prefilter correctness rests
    // on: Count-Min estimates are one-sided (>= true count, always — not
    // just w.h.p.), for both supported key types.
    import graft.functions.CmsEstimateF
    val df = orders.select(col("o_custkey"), col("o_orderpriority"))
    for (keyCol <- Seq("o_custkey", "o_orderpriority")) {
      val bytes = df.agg(
        expr(s"count_min_sketch($keyCol, 0.0001d, 0.99d, 42)"))
        .head().getAs[Array[Byte]](0)
      val cms = CmsEstimateF.readFrom(bytes)
      val under = df.groupBy(col(keyCol)).agg(count(lit(1)).as("exact"))
        .withColumn("est", CmsEstimateF(col(keyCol), cms))
        .where(col("est") < col("exact")).count()
      assert(under == 0L, s"$keyCol: $under keys underestimated")
    }
  }

  test("heavyHitters == the naive exact plan, and prunes the shuffle") {
    val li = Tables.load(spark, Sf0001, "lineitem").select(col("l_partkey"))
    val got = graft.ops.Relational.heavyHitters(li, "l_partkey", 5L)
    val want = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 5)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // the prefilter must appear scan-side, before the exchange
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("cms_estimate"), "CMS prefilter missing from plan")
  }

  test("heavyHitters on an empty relation returns empty, not a crash") {
    val empty = orders.where(lit(false)).select(col("o_orderpriority"))
    assert(graft.ops.Relational.heavyHitters(empty, "o_orderpriority", 1L).count() == 0L)
  }

  test("HLL sketch merges across partitions like a distributed rollup") {
    // per-partition sketches unioned == whole-table sketch (merge law)
    val whole = orders.agg(approx_count_distinct(col("o_custkey")).as("n")).head().getLong(0)
    val merged = orders.repartition(8)
      .groupBy(spark_partition_id().as("p"))
      .agg(approx_count_distinct(col("o_custkey")).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(merged <= whole * 2 && whole > 0)
  }
}

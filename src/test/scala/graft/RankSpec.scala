package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** t20's distributed rank (bucket + two-level prefix sum) must agree
  * exactly with the naive global-window rank — including ties, which
  * break by (score desc, doc_id). The gate's DuckDB oracle checks the
  * same identity cross-engine; this spec keeps it checkable in-tree.
  */
class RankSpec extends SparkSpec {

  test("t20 bucketed rank == naive single-partition rank, ties included") {
    val sf = Sf0001
    val got = SparkEntry.queries("t20_global_rank")(spark, sf)
      .select("doc_id", "rank", "decile")

    val t = TextOps.tokens(col("text"))
    val naive = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        (size(array_distinct(t)).cast("double") / size(t)).as("score"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .select(col("doc_id"), col("rank"),
        expr("((rank - 1) * 10) div n").as("decile"))

    assert(got.count() == naive.count())
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    // ranks are a permutation of 1..n
    val n = got.count()
    assert(got.agg(min("rank"), max("rank"), countDistinct("rank"))
      .head().toSeq == Seq(1L, n, n))
  }

  test("bucketed rank survives a degenerate all-one-bucket distribution") {
    import spark.implicits._
    // constant score: every row lands in one bucket; rank must fall back
    // to pure doc_id order without duplicates or gaps
    val docs = (1L to 97L).map(i => (i, "alpha beta gamma")).toDF("doc_id", "text")
    val t = TextOps.tokens(col("text"))
    val scored = docs.select(col("doc_id"),
      (size(array_distinct(t)).cast("double") / size(t)).as("score"))
    val b = scored.withColumn("bkt", floor(col("score") * 32).cast("long"))
    val offs = b.groupBy("bkt").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(
        sum(col("bc")).over(Window.orderBy(col("bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("bc")
    val wb = Window.partitionBy(col("bkt")).orderBy(col("score").desc, col("doc_id"))
    val ranked = b.join(broadcast(offs), "bkt")
      .withColumn("rank", col("off") + row_number().over(wb))
    assert(ranked.select("rank").as[Long].collect().sorted.toSeq == (1L to 97L))
  }
}

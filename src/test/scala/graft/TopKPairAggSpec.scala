package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKPairAgg
import graft.ops.Relational

class TopKPairAggSpec extends SparkSpec {
  import spark.implicits._

  test("topk_pairs equals the window row_number form, ties and all") {
    // deterministic pseudo-random data with deliberate ord ties
    val rows = (1 to 5000).map { i =>
      val g = i % 7
      val ord = (i * 2654435761L) % 50 // heavy ties
      (g, ord, i.toLong)
    }.toDF("g", "ord", "id")
    val viaAgg = rows.groupBy("g")
      .agg(TopKPairAgg.topkPairs(col("ord"), col("id"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("p"))
      .select(col("g"), col("p.ord").as("ord"), col("p.id").as("id"))
    val viaWindow = Relational.topKPerGroup(rows,
      Seq(col("g")), Seq(col("ord"), col("id")), 5)
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }

  test("topk_pairs with fewer rows than k returns them all, sorted") {
    val rows = Seq((1, 30L, 3L), (1, 10L, 1L), (1, 20L, 2L)).toDF("g", "ord", "id")
    val out = rows.groupBy("g")
      .agg(TopKPairAgg.topkPairs(col("ord"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("p"))
      .select(col("p.ord"), col("p.id")).as[(Long, Long)].collect().toSeq
    assert(out == Seq((10L, 1L), (20L, 2L), (30L, 3L)))
  }

  test("topk_pairs partial-aggregates instead of window-sorting") {
    val rows = (1 to 100).map(i => (i % 3, i.toLong, i.toLong)).toDF("g", "ord", "id")
    val plan = rows.groupBy("g")
      .agg(TopKPairAgg.topkPairs(col("ord"), col("id"), 5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    assert(plan.contains("partial_topk_pairs"), plan)
    assert(!plan.contains("Window"), plan)
  }
}

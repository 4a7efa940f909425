package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the SCD2 / gap-fill event gates — properties
  * the oracle's value hash implies but doesn't state: history intervals
  * must tile, fills must carry the last observation. Run on sf0.001 (the
  * sf0.01 value check is the driver's oracle gate).
  */
class EventGateSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("scd2 intervals tile: valid_to == next valid_from, one open row per user") {
    val h = run("scd2_user_history").cache()
    try {
      // exactly one open (is_current) interval per user
      val multiCurrent = h.groupBy("user_id")
        .agg(sum(col("is_current")).as("n_open"))
        .where(col("n_open") =!= 1).count()
      assert(multiCurrent == 0L)
      // each closed interval's valid_to is the next interval's valid_from
      // (no gaps, no overlaps) and intervals are non-empty
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("valid_from_us")
      val broken = h.withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
        .where((col("valid_to_us").isNotNull && col("valid_to_us") =!= col("next_from")) ||
          (col("valid_to_us").isNotNull && col("valid_to_us") <= col("valid_from_us")))
        .count()
      assert(broken == 0L)
      // consecutive intervals must actually change the attribute
      val noChange = h.withColumn("next_tier", lead(col("tier"), 1).over(w))
        .where(col("next_tier").isNotNull && col("next_tier") === col("tier"))
        .count()
      assert(noChange == 0L)
    } finally { h.unpersist(); () }
  }

  test("gapfill covers each user's full span with no null fills") {
    val g = run("ev_gapfill").cache()
    try {
      // span is contiguous: per user, row count == max(day)-min(day)+1
      val gapped = g.groupBy("user_id")
        .agg(count(lit(1)).as("n"), (max(col("day")) - min(col("day")) + 1).as("span"))
        .where(col("n") =!= col("span")).count()
      assert(gapped == 0L)
      // the first day of every user is observed (spine starts at an
      // observation), hence no fill is ever null
      assert(g.where(col("cents_filled").isNull).count() == 0L)
      // filled value on unobserved days equals the previous day's fill
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("day")
      val wrongCarry = g.withColumn("prev_fill", lag(col("cents_filled"), 1).over(w))
        .where(col("observed") === 0 && col("cents_filled") =!= col("prev_fill"))
        .count()
      assert(wrongCarry == 0L)
      assert(g.where(col("observed") === 0).count() > 0L, "no gaps exercised")
    } finally { g.unpersist(); () }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the same transforms the
  * batch queries run, expressed as incremental plans. The reference is
  * batch-only (SURVEY §2.11) — this module is the streaming extension:
  * file-source → watermark → windowed/sessionized aggregation → sink.
  *
  * Design for scale: all aggregations are keyed (event_type / user_id), so
  * state partitions across executors; watermarks bound state size; the
  * same code path serves a kafka source in production (swap `readStream`
  * format).
  */
object EventStreams {

  /** events.parquet schema with `ts` as Long nanoseconds (the session reads
    * INT64 TIMESTAMP(NANOS) via spark.sql.legacy.parquet.nanosAsLong).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Nanos → proper event-time timestamp (microsecond precision). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Hourly tumbling-window rollup per event type; 1-hour watermark bounds
    * state. Works identically on a batch frame (window() is batch-legal),
    * which is how the equivalence spec checks it.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Native session windows: 30-minute inactivity gap per user — the
    * streaming twin of the batch `ev_sessionize` query.
    */
  def sessionize(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "1 hour")
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: a running per-user
    * (count, sum) — the minimal template for bespoke streaming state that
    * session_window/window can't express.
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), UserTotal](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          UserTotal(user, n, s)
      }
  }
}

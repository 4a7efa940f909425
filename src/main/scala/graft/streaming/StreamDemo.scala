package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming entry point: runs the hourly rollup and session-window plans
  * over a staged copy of the events table with an AvailableNow trigger and
  * prints the sink contents. Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // File stream sources need a directory; stage the single file.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_demo_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"))

    for ((name, plan) <- Seq(
        "hourly_rollup" -> EventStreams.hourlyRollup(EventStreams.readEventStream(spark, dir.toString)),
        "sessions" -> EventStreams.sessionize(EventStreams.readEventStream(spark, dir.toString)))) {
      val q = plan.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      println(s"== $name: ${spark.table(name).count()} rows")
      spark.table(name).show(5, truncate = false)
    }
    spark.stop()
  }
}

package graft.warehouse

import org.apache.spark.sql.SparkSession

/** Warehouse pipeline entry point: generates the synthetic sample inputs,
  * runs the full DAG (extract -> cleanse -> dims -> fact -> aggregates with
  * every quality gate), and prints the fact table + analytics aggregates.
  * Usage: runMain graft.warehouse.PipelineDemo [workDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_pipeline_"))
    java.nio.file.Files.createDirectories(base)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", base.resolve("warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val inputs = Fixtures.write(base)
    val paths = Pipeline.Paths(base.resolve("staging").toString)
    Pipeline.run(spark, inputs, paths)

    println(s"== fact lfb_call: ${spark.table("lfb_call").count()} rows")
    spark.table("lfb_call").show(10, truncate = false)
    for (t <- Seq("per_month", "per_ward", "types_per_ward", "per_location_type")) {
      println(s"== analytics.$t")
      spark.table(s"analytics.$t").show(5, truncate = false)
    }
    spark.stop()
  }
}

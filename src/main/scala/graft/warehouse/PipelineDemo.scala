package graft.warehouse

import org.apache.spark.sql.SparkSession

/** Warehouse pipeline entry point: generates synthetic inputs (the 6-row
  * correctness fixture, or `--rows n` for a scaled run over ~600 wards /
  * 3 years), runs the full DAG (extract -> cleanse -> dims -> fact ->
  * aggregates with every quality gate), and prints the fact table +
  * analytics aggregates.
  * Usage: runMain graft.warehouse.PipelineDemo [workDir] [--rows n]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val rows = args.sliding(2).collectFirst {
      case Array("--rows", n) => n.toInt
    }
    val base = args.filterNot(_.startsWith("--")).filterNot(a =>
        rows.exists(_.toString == a)).headOption
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_pipeline_"))
    java.nio.file.Files.createDirectories(base)
    val cores =
      if (rows.isDefined)
        sys.env.get("SPARK_GRAFT_CPUS").map(v => v.toIntOption.getOrElse(
          sys.error(s"SPARK_GRAFT_CPUS must be an integer, got '$v'")).toString)
          .getOrElse("16")
      else "4"
    // One shuffle partition per core is right until a partition's sort
    // working set outgrows memory: at 15M wide fact rows / 32 partitions
    // the fact build's sorts and min_by agg spill and the stage goes
    // super-linear (SCALE.md round 14 ladder). Scaled runs therefore size
    // partitions by ROWS (~250k fact rows each — wide-row working sets a
    // task holds comfortably) and let AQE coalesce the ones that end up
    // small; the override env pins it for experiments.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      rows match {
        case Some(n) => math.max(cores.toInt, n / 250000).toString
        case None => cores
      })
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", base.resolve("warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val inputs = rows match {
      case Some(n) => Fixtures.writeScaled(base, n)
      case None    => Fixtures.write(base)
    }
    val paths = Pipeline.Paths(base.resolve("staging").toString)
    val t0 = System.nanoTime()
    val stageTimes = Pipeline.run(spark, inputs, paths)
    println(f"== pipeline wall-clock: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    stageTimes.foreach { case (s, t) => println(f"==   stage $s%-20s $t%7.1f s") }

    println(s"== fact lfb_call: ${spark.table("lfb_call").count()} rows")
    spark.table("lfb_call").show(10, truncate = false)
    for (t <- Seq("per_month", "per_ward", "types_per_ward", "per_location_type")) {
      println(s"== analytics.$t")
      spark.table(s"analytics.$t").show(5, truncate = false)
    }
    spark.stop()
  }
}

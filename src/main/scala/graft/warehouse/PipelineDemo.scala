package graft.warehouse

import org.apache.spark.sql.SparkSession

/** Warehouse pipeline entry point: generates synthetic inputs (the 6-row
  * correctness fixture, or `--rows n` for a scaled run over ~600 wards /
  * 3 years), runs the full DAG (extract -> cleanse -> dims -> fact ->
  * aggregates with every quality gate), and prints the fact table +
  * analytics aggregates.
  * Usage: runMain graft.warehouse.PipelineDemo [workDir] [--rows n] [--from stage]
  *
  * `--from <stage>` restarts the DAG at a stage boundary (Pipeline.stageOrder)
  * over an existing workDir: inputs are NOT regenerated and every stage
  * before `<stage>` is skipped, reading the staging parquet the earlier run
  * left behind — the in-process equivalent of an Airflow task retry (each
  * reference stage is its own Livy job over shared storage). This is how a
  * large `--rows` run whose fact load died (spill, disk) resumes without
  * repaying corpus generation + extract + cleanse.
  */
object PipelineDemo {

  /** The scaled-run session recipe, shared with the chunked corpus driver
    * (ChunkedExtract) so a 500M-row rung and a `--from` resume size
    * themselves identically. One shuffle partition per core is right until
    * a partition's sort working set outgrows memory: at 15M wide fact rows
    * / 32 partitions the fact build's sorts and min_by agg spill and the
    * stage goes super-linear (SCALE.md round 14 ladder). Scaled runs
    * therefore size partitions by ROWS (~250k fact rows each — wide-row
    * working sets a task holds comfortably) and let AQE coalesce the ones
    * that end up small; `SPARK_GRAFT_SHUFFLE_PARTITIONS` pins it for
    * experiments.
    */
  private[graft] def buildSession(base: java.nio.file.Path,
                                      rows: Option[Int],
                                      fromMarker: Boolean): SparkSession = {
    val cores =
      if (rows.isDefined)
        sys.env.get("SPARK_GRAFT_CPUS").map(v => v.toIntOption.getOrElse(
          sys.error(s"SPARK_GRAFT_CPUS must be an integer, got '$v'")).toString)
          .getOrElse("16")
      else "4"
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      rows match {
        // rowSizedPartitions owns the measured ~250k-rows/task threshold.
        case Some(n) => math.max(cores.toInt,
          graft.ops.Relational.rowSizedPartitions(n.toLong)).toString
        case None => cores
      })
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // Scratch disk, not memory, is this box's binding constraint at the
      // 100x (150M-row) rung: a wide-fact shuffle is ~a compressed copy of
      // the corpus. zstd shrinks shuffle/spill files substantially vs the
      // lz4 default for a few % CPU, and a 1-min cleaner GC reclaims dead
      // shuffles DURING the run (the 30-min default never fires on a
      // minutes-long pipeline, so finished stages' files pile up).
      // Validated eagerly: Spark instantiates the codec lazily at the first
      // shuffle write, so a typo would otherwise burn the whole extract
      // stage before crashing (same late-failure shape as the CPUS knob).
      .config("spark.io.compression.codec", {
        val c = sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd")
        val known = Set("lz4", "lzf", "snappy", "zstd")
        if (!known.contains(c)) sys.error(
          s"SPARK_GRAFT_IO_CODEC must be one of ${known.mkString("/")}, got '$c'")
        c
      })
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", base.resolve("warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fact-slicing knobs must be reachable from a cross-JVM resume too: a
    // rung whose fact stage only fits the disk sliced (the 1B recipe)
    // would otherwise be un-retryable via `--from "fact load"` — the
    // retry would run unsliced and exhaust scratch. Validated eagerly,
    // like the CPUS/codec knobs.
    sys.env.get("SPARK_GRAFT_FACT_SLICES").foreach { v =>
      val k = v.toIntOption.filter(_ >= 1).getOrElse(
        sys.error(s"SPARK_GRAFT_FACT_SLICES must be a positive integer, got '$v'"))
      spark.conf.set("spark.graft.fact.slices", k.toString)
    }
    sys.env.get("SPARK_GRAFT_FACT_PRUNE").foreach { v =>
      val b = v.toBooleanOption.getOrElse(
        sys.error(s"SPARK_GRAFT_FACT_PRUNE must be true/false, got '$v'"))
      spark.conf.set("spark.graft.fact.pruneConsumed", b.toString)
    }
    sys.env.get("SPARK_GRAFT_FACT_COMPACT").foreach { v =>
      val b = v.toBooleanOption.getOrElse(
        sys.error(s"SPARK_GRAFT_FACT_COMPACT must be true/false, got '$v'"))
      spark.conf.set("spark.graft.fact.compact", b.toString)
    }
    // The compaction scratch guard's factor (default 4.0 = the measured
    // 3.8x transient + margin). Reachable from a rung driver so the
    // guard's REFUSAL path can be exercised end-to-end at rung scale
    // without a disk actually too small to hold the run's own corpus.
    sys.env.get("SPARK_GRAFT_COMPACT_MINFREE").foreach { v =>
      val f = v.toDoubleOption.filter(_ > 0).getOrElse(
        sys.error(s"SPARK_GRAFT_COMPACT_MINFREE must be a positive number, got '$v'"))
      spark.conf.set("spark.graft.compact.minFreeFactor", f.toString)
    }
    println(s"== session local[$cores], shuffle partitions $shufflePartitions" +
      rows.fold("")(n => s", sized for $n rows" +
        (if (fromMarker) " (from workDir .rows marker)" else "")))
    spark
  }

  def main(args: Array[String]): Unit = {
    val rowsArg = args.sliding(2).collectFirst {
      case Array("--rows", n) => n.toInt
    }
    val fromStage = args.sliding(2).collectFirst {
      case Array("--from", s) => s
    }
    // Positional workDir = first arg that is neither a --flag nor a flag's value.
    val flagValues = args.zip(args.drop(1)).collect {
      case (f, v) if f.startsWith("--") => v
    }.toSet
    val base = args.filterNot(_.startsWith("--")).filterNot(flagValues).headOption
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_pipeline_"))
    java.nio.file.Files.createDirectories(base)
    // A scaled run records its row count in the workDir so a resume sizes
    // the session like the original run did — `--from` without `--rows`
    // must NOT fall back to the tiny-fixture profile (local[4], 4 shuffle
    // partitions), which would hand the retry ~37M wide rows per task at
    // 150M: the exact spill cliff the restart feature exists to get past.
    val rowsMarker = base.resolve(".rows")
    val rows = rowsArg.orElse {
      if (fromStage.isDefined && java.nio.file.Files.exists(rowsMarker))
        Some(new String(java.nio.file.Files.readAllBytes(rowsMarker),
          "UTF-8").trim.toInt)
      else None
    }
    // Written for EVERY explicit --rows, resume or not: a resume that
    // deliberately overrides --rows must not leave a stale marker behind
    // for a later --from-only resume to size the session with. The
    // contract this encodes: `--rows` on a resume is an explicit re-size
    // declaration and PERSISTS — pass it only with the staged corpus's
    // real row count (or a deliberate new sizing); a wrong override
    // mis-sizes every later --from-only resume until corrected.
    if (rowsArg.isDefined)
      java.nio.file.Files.write(rowsMarker,
        rowsArg.get.toString.getBytes("UTF-8"))
    val spark = buildSession(base, rows,
      fromMarker = rows.isDefined && rowsArg.isEmpty)
    val inputs = (rows, fromStage) match {
      // Resume: the earlier run already wrote the inputs (and may have
      // pruned the consumed CSVs to reclaim disk — fine, the skipped
      // stages are the only readers). Rebind by naming convention.
      case (_, Some(_)) =>
        import scala.jdk.CollectionConverters._
        val aq = java.nio.file.Files.list(base).iterator().asScala
          .filter(p => p.getFileName.toString.matches("aq-.*\\.csv"))
          .map(_.toString).toSeq.sorted
        Pipeline.Inputs(base.resolve("lfb-calls.csv").toString, aq,
          base.resolve("weather.csv").toString,
          base.resolve("well-being.csv").toString)
      case (Some(n), None) => Fixtures.writeScaled(base, n, Some(spark))
      case (None, None)    => Fixtures.write(base)
    }
    val paths = Pipeline.Paths(base.resolve("staging").toString)
    val t0 = System.nanoTime()
    val stageTimes = Pipeline.run(spark, inputs, paths,
      fromStage = fromStage.getOrElse("extract"))
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

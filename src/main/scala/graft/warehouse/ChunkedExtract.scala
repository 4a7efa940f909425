package graft.warehouse

/** Corpus generation + extract for rungs whose CSV cannot fit on disk all
  * at once: the 150M rung's binding constraint was scratch disk (a 39 GB
  * CSV against ~80 GB free — SCALE.md round 15), and a 500M CSV (~130 GB)
  * simply does not fit. This driver runs the landing-zone lifecycle a
  * shared-storage deployment runs, in slices:
  *
  *   for each chunk: generate ids [c·per, (c+1)·per) in parallel
  *   (Fixtures.writeScaledLfbSpark) -> Jobs.lfbExtract (the K2 incremental
  *   anti-join append — chunk ids are disjoint, so appends are exact) ->
  *   prune the consumed CSV.
  *
  * Peak CSV on disk = one chunk, not the corpus; the raw parquet is the
  * only artifact that accumulates. The aux inputs (aq/weather/wb — grid-
  * bounded, tiny) are written once and extracted once, completing the
  * "extract" stage; resume the DAG with
  * `PipelineDemo <workDir> --from "post-extract checks"`.
  *
  * Usage: runMain graft.warehouse.ChunkedExtract <workDir> --rows n [--chunks k]
  */
object ChunkedExtract {
  def main(args: Array[String]): Unit = {
    val rows = args.sliding(2).collectFirst { case Array("--rows", n) => n.toInt }
      .getOrElse(sys.error("ChunkedExtract requires --rows <n>"))
    require(rows >= 1, s"--rows must be >= 1, got $rows")
    val chunks = args.sliding(2).collectFirst { case Array("--chunks", k) => k.toInt }
      .getOrElse(math.max(1, math.ceil(rows / 1.0e8).toInt)) // ~100M-row slices
    require(chunks >= 1, s"--chunks must be >= 1, got $chunks")
    // More chunks than rows would leave later chunks with cnt <= 0:
    // header-only CSVs generated, "extracted" (0 rows), and logged as real
    // slices — wasteful and confusing, so reject the shape up front.
    require(chunks <= rows,
      s"--chunks ($chunks) must not exceed --rows ($rows)")
    val flagValues = args.zip(args.drop(1)).collect {
      case (f, v) if f.startsWith("--") => v
    }.toSet
    val base = args.filterNot(_.startsWith("--")).filterNot(flagValues).headOption
      .map(java.nio.file.Paths.get(_))
      .getOrElse(sys.error("ChunkedExtract requires a workDir"))
    java.nio.file.Files.createDirectories(base)
    // Same marker PipelineDemo writes: the later --from resume must size
    // its session for THIS corpus, not the tiny-fixture default.
    java.nio.file.Files.write(base.resolve(".rows"),
      rows.toString.getBytes("UTF-8"))

    val spark = PipelineDemo.buildSession(base, Some(rows), fromMarker = false)
    val inputs = Fixtures.writeScaledAux(base)
    val paths = Pipeline.Paths(base.resolve("staging").toString)
    java.nio.file.Files.createDirectories(base.resolve("staging"))

    def freeGb: Double = base.toFile.getUsableSpace / 1e9
    val per = math.ceil(rows.toDouble / chunks).toLong
    val csv = base.resolve("lfb-calls.csv")
    def rmCsv(): Unit = graft.ops.InterStage.deleteRecursively(csv.toFile)
    val t00 = System.nanoTime()
    for (c <- 0 until chunks) {
      val start = c * per
      val cnt = math.min(per, rows.toLong - start)
      val t0 = System.nanoTime()
      Fixtures.writeScaledLfbSpark(spark, csv.toString, cnt, startId = start)
      val tGen = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Jobs.lfbExtract(spark, csv.toString, paths.lfbRaw)
      val tExtract = (System.nanoTime() - t1) / 1e9
      rmCsv() // the consumed-CSV prune — extract is the only reader
      println(f"== chunk ${c + 1}/$chunks [$start, ${start + cnt}): " +
        f"generate $tGen%.1f s, extract+append $tExtract%.1f s, " +
        f"free disk $freeGb%.1f GB")
    }
    val t2 = System.nanoTime()
    Jobs.aqExtract(spark, inputs.aqCsvs, paths.aqRaw)
    Jobs.extract(spark, inputs.weatherCsv, paths.weatherRaw, Seq("date"))
    Jobs.extract(spark, inputs.wbCsv, paths.wbRaw, Seq("Ward", "Year"))
    println(f"== aux extracts ${(System.nanoTime() - t2) / 1e9}%.1f s")
    val raw = spark.read.parquet(paths.lfbRaw)
    println(f"== extract stage complete: ${raw.count()} raw rows, " +
      f"${(System.nanoTime() - t00) / 1e9}%.1f s total, free disk $freeGb%.1f GB")
    println(s"== resume with: PipelineDemo $base --from \"post-extract checks\"")
    spark.stop()
  }
}

package graft.warehouse

/** Fact-stage-only scale rung driver (round 17): push the fact build past
  * the full-lifecycle disk ceiling (500M, SCALE.md r16) by synthesizing
  * the CLEANSED staging parquet directly — `Fixtures.writeScaledLfbCleanSpark`,
  * no CSV or raw parquet ever on disk, spec-pinned equal to the
  * CSV -> extract -> cleanse path — and resuming the ordinary DAG at
  * "dimension builds", so dimension builds/checks/loads, the fact load and
  * every post-load gate run EXACTLY as the full pipeline runs them.
  *
  * Two knobs make the rung fit a scratch disk smaller than the single-shot
  * shuffle footprint (both default-off in the library):
  * `spark.graft.fact.slices` chunks the seven-stage join AND the clustered
  * write into k disjoint PK-hash slices (peak scratch = max over slices,
  * exact same result — PipelineSpec pins equality), and
  * `spark.graft.fact.pruneConsumed` deletes each consumed artifact when
  * its last reader finishes (cleansed input after staging; staging slices
  * after their append) — the measured consumed-artifact lifecycle.
  *
  * Usage: runMain graft.warehouse.FactStageProbe <workDir> --rows n
  *          [--slices k] [--compact] [--skew]
  */
object FactStageProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.sliding(2).collectFirst { case Array("--rows", n) => n.toLong }
      .getOrElse(sys.error("FactStageProbe requires --rows <n>"))
    require(rows >= 1 && rows <= Int.MaxValue, s"--rows out of range: $rows")
    val slices = args.sliding(2).collectFirst { case Array("--slices", k) => k.toInt }
      .getOrElse(1)
    // --skew: Zipf station/ward corpus (VERDICT r17 task 3) — hot write
    // directory + skewed dim joins; the uniform default stays the ladder's
    // reproducible shape.
    val skew = args.contains("--skew")
    // Only VALUE-taking flags consume the next token; a bare flag
    // (--skew, --compact) must not swallow a workDir placed after it.
    // Drop consumed tokens BY POSITION, not by value — a workDir that
    // textually equals a flag's value (e.g. a dir named "4" with
    // --slices 4) must survive.
    val valueFlags = Set("--rows", "--slices")
    val consumed = args.indices.filter(i =>
      valueFlags(args(i)) && i + 1 < args.length).map(_ + 1).toSet
    val base = args.indices
      .filterNot(i => args(i).startsWith("--") || consumed(i))
      .map(args(_)).headOption
      .map(java.nio.file.Paths.get(_))
      .getOrElse(sys.error("FactStageProbe requires a workDir"))
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.write(base.resolve(".rows"),
      rows.toString.getBytes("UTF-8"))

    val spark = PipelineDemo.buildSession(base, Some(rows.toInt), fromMarker = false)
    def freeGb: Double = base.toFile.getUsableSpace / 1e9
    val t00 = System.nanoTime()

    // Aux inputs (grid-bounded, tiny): raw -> clean exactly as the full DAG.
    val inputs = Fixtures.writeScaledAux(base)
    val paths = Pipeline.Paths(base.resolve("staging").toString)
    java.nio.file.Files.createDirectories(base.resolve("staging"))
    Jobs.aqExtract(spark, inputs.aqCsvs, paths.aqRaw)
    Jobs.extract(spark, inputs.weatherCsv, paths.weatherRaw, Seq("date"))
    Jobs.extract(spark, inputs.wbCsv, paths.wbRaw, Seq("Ward", "Year"))
    Jobs.aqCleanse(spark, paths.aqRaw, paths.aqClean)
    Jobs.weatherCleanse(spark, paths.weatherRaw, paths.weatherClean)
    Jobs.wbCleanse(spark, paths.wbRaw, paths.wbClean)
    println(f"== aux staged ${(System.nanoTime() - t00) / 1e9}%.1f s, free $freeGb%.1f GB")

    val t1 = System.nanoTime()
    Fixtures.writeScaledLfbCleanSpark(spark, paths.lfbClean, rows, skew = skew)
    println(f"== direct-clean corpus $rows%,d rows" +
      (if (skew) " (Zipf station/ward)" else "") +
      f" ${(System.nanoTime() - t1) / 1e9}%.1f s, free $freeGb%.1f GB")

    if (slices > 1) {
      spark.conf.set("spark.graft.fact.slices", slices.toString)
      spark.conf.set("spark.graft.fact.pruneConsumed", "true")
      // --compact: fold the k appended cluster sets back into the canonical
      // layout in place (spark.graft.fact.compact) — the rung then measures
      // build + OPTIMIZE as one lifecycle, committer shape reported below
      // reflects the compacted table.
      if (args.contains("--compact"))
        spark.conf.set("spark.graft.fact.compact", "true")
    }
    val stages = Pipeline.run(spark, inputs, paths, fromStage = "dimension builds")
    stages.foreach { case (name, sec) =>
      println(f"== stage $name%-18s $sec%8.1f s")
    }

    // Committer shape: files per station dir and per write task.
    val factDir = base.resolve("warehouse/lfb_call").toFile
    val dirs = Option(factDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("IncidentStationGround="))
    val dirStats = dirs.map { dd =>
      val fs = dd.listFiles().filter(_.getName.endsWith(".parquet"))
      (dd.getName, fs.length, fs.map(_.length()).sum)
    }.sortBy(-_._3)
    val totalFiles = dirStats.map(_._2).sum
    // the skew question is per-DIRECTORY: is the hot station's dir a
    // one-writer funnel or did the range partitioner split it?
    dirStats.take(3).foreach { case (name, nf, bytes) =>
      println(f"==   top dir $name: $nf files, ${bytes / 1e9}%.2f GB " +
        f"(${100.0 * bytes / math.max(dirStats.map(_._3).sum, 1L)}%.1f%% of table)")
    }
    // Under --compact the final files come from the ONE compaction job
    // (rowSizedPartitions over the full table), not the k slice appends —
    // UNLESS the scratch guard skipped the pass (its whole point), in
    // which case the k-sliced append shape is still on disk. Read the
    // truth from the files: distinct write-job UUIDs = jobs that wrote
    // the live table (r19: a guard-skip run mislabeled its 4-append
    // layout "1 compaction job(s)").
    val writeJobs = dirs.flatMap(d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet")))
      .map(_.getName.replaceFirst("^part-\\d+-", "")
        .replaceFirst("-c\\d.*$", ""))
      .distinct.length
    val compacted = args.contains("--compact") && slices > 1 && writeJobs == 1
    if (args.contains("--compact") && slices > 1 && !compacted)
      println(s"==   compaction was requested but $writeJobs write-job " +
        "UUIDs are live — the scratch guard skipped the pass (see the " +
        "SKIPPED warn above); reporting the slice-append shape")
    val tasks =
      if (compacted) graft.ops.Relational.rowSizedPartitions(rows)
      else (0 until math.max(slices, 1)).map { _ =>
        graft.ops.Relational.rowSizedPartitions(rows / math.max(slices, 1))
      }.sum
    val jobs = if (compacted) 1 else math.max(slices, 1)
    println(f"== fact committer: $totalFiles files over ${dirs.length} station " +
      f"dirs (${totalFiles.toDouble / math.max(dirs.length, 1)}%.1f/dir), " +
      f"~$tasks write tasks in $jobs " +
      (if (compacted) "compaction job(s) = " else "job(s) = ") +
      f"${totalFiles.toDouble / math.max(tasks, 1)}%.2f files/task")
    println(f"== total ${(System.nanoTime() - t00) / 1e9}%.1f s, free $freeGb%.1f GB")
    spark.stop()
  }
}

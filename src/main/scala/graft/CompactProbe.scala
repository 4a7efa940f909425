package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the sliced-fact compaction remedy at rung scale (VERDICT r17
  * task 1): over a completed `FactStageProbe` workDir whose fact table
  * landed as k sequential range-clustered appends (k cluster sets per
  * station dir), measure
  *
  *   1. read locality BEFORE — files per station dir, and the
  *      mass-weighted files touched per (station, date)-bounded point
  *      lookup (per-file DateOfCall min/max vs each row's own lookup —
  *      the ZorderSpec metric, keyed by the partition dir);
  *   2. one `Relational.compactClustered` pass — wall-clock, scratch
  *      trough (min usable bytes sampled during the rewrite), and
  *      committer shape (files/task at the row-sized partition count);
  *   3. read locality AFTER, on the re-clustered directory;
  *   4. the C8 referential-integrity family re-run against the staged
  *      dimension parquets on the re-clustered table — the remedy must
  *      not just be fast, it must be gate-green.
  *
  * Usage: runMain graft.CompactProbe <factStageProbeWorkDir>
  */
object CompactProbe {

  private def locality(spark: SparkSession, tag: String, dir: String): Unit = {
    val df = spark.read.parquet(dir)
    val shape = df.groupBy(col("IncidentStationGround").as("st"),
        input_file_name().as("f")).count()
      .agg(count(lit(1)).as("files"), countDistinct(col("st")).as("dirs"))
      .head()
    val (files, dirs) = (shape.getLong(0), shape.getLong(1))
    // The shared read-locality metric (Relational.filesPerLookup) — same
    // implementation ZorderSpec asserts on, so probe and spec numbers
    // stay comparable.
    val perLookup = graft.ops.Relational.filesPerLookup(
      df, "DateOfCall", Some("IncidentStationGround"))
    println(f"== locality $tag: $files files over $dirs station dirs " +
      f"(${files.toDouble / math.max(dirs, 1)}%.1f/dir), " +
      f"files touched per (station,date) lookup = $perLookup%.2f")
  }

  def main(args: Array[String]): Unit = {
    val base = java.nio.file.Paths.get(args.headOption.getOrElse(
      sys.error("CompactProbe requires a FactStageProbe workDir")))
    // Same session shape as the rung that wrote the table: the .rows
    // marker drives cores/shuffle sizing exactly like a --from resume.
    val marker = base.resolve(".rows")
    val rows =
      if (java.nio.file.Files.exists(marker))
        Some(new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
          .trim.toLong).map(r => math.min(r, Int.MaxValue.toLong).toInt)
      else None
    val spark = warehouse.PipelineDemo.buildSession(base, rows, fromMarker = true)
    val factDir = base.resolve("warehouse/lfb_call").toString
    val optDir = base.resolve("warehouse/lfb_call_opt").toString

    locality(spark, "before (sliced)", factDir)

    // Scratch trough sampler: min usable bytes seen during the rewrite,
    // taken over BOTH filesystems the rewrite touches — the workDir (new
    // copy) and spark.local.dir/java.io.tmpdir (the range shuffle's spill
    // home; on a box where /tmp is a different partition the shuffle is
    // the dominant term and the workDir alone would miss it).
    val scratchDirs = base.toFile +: graft.ops.Relational.spillDirs(spark)
    def freeNow: Long = scratchDirs.map(_.getUsableSpace).min
    @volatile var minFree = freeNow
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        minFree = math.min(minFree, freeNow)
        Thread.sleep(500)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    val n = graft.ops.Relational.compactClustered(spark, factDir, optDir,
      "IncidentStationGround", Seq("DateOfCall", "NotionalCost"))
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    val tasks = graft.ops.Relational.rowSizedPartitions(n)
    val optFiles = {
      val d = new java.io.File(optDir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("IncidentStationGround="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    println(f"== rewrite: $n%,d rows in $wall%.1f s " +
      f"(${wall / (n / 1e6)}%.2f s/M), $tasks write tasks, $optFiles files " +
      f"= ${optFiles.toDouble / tasks}%.2f files/task, " +
      f"scratch trough ${minFree / 1e9}%.1f GB free")

    locality(spark, "after (compacted)", optDir)

    // C8 family on the re-clustered table vs the staged dim parquets
    // (the same relations the catalog dims are loaded from; Unknown
    // sentinel members live in these files).
    val paths = warehouse.Pipeline.Paths(base.resolve("staging").toString)
    val fact = spark.read.parquet(optDir)
    import graft.ops.Checks
    // The canonical C8 family — shared with the pipeline's post-load gate
    // so the probe's adjudication cannot drift from the contract.
    val gates = warehouse.Pipeline.factRefGates
    val bad = gates.flatMap { case (fk, _, stagedPath, pk) =>
      Checks.referentialIntegrity(fact, fk,
        spark.read.parquet(stagedPath(paths)), pk).left.toSeq
    }
    require(fact.count() == n, "re-clustered row count drifted")
    require(bad.isEmpty, s"C8 on re-clustered table FAILED: $bad")
    println(s"== C8 family green on re-clustered table (${gates.size} gates), rows = $n")
    spark.stop()
  }
}

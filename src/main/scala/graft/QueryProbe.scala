package graft

/** Dev-only single-query timing probe: runs a named subset of the
  * registry the way Bench does (preMaterialize first, count() per run,
  * cache cleared between runs) but prints every run instead of a median —
  * the tool for adjudicating one query's bench number without paying the
  * full suite, and for reading its plan (`explain`) in the same session.
  *
  * Usage: runMain graft.QueryProbe <q1,q2,...> [runs] [explain]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("t4_winnow_fingerprint,t11_dup_rate")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val runs = args.lift(1).flatMap(a => a.toIntOption).getOrElse(5)
    val explain = args.drop(2).contains("explain")
    // "nowarm" skips preMaterialize, so a query's FIRST run shows its
    // inter-stage build cost — the tool for attributing the materialize
    // phase to individual chain stages.
    val nowarm = args.drop(1).contains("nowarm")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000).selectExpr("sum(id)").collect()
    // Same drift canaries as Bench — BOTH axes, so a probe's numbers are
    // adjudicable against the committed idle-machine references (the r18
    // lessons: an "idle" probe on a shared box can run 2-3x ambient-slow,
    // and a 1.3x I/O-side band reads FLAT on the CPU canary).
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_reference.json")
    // Same core-count gate as Bench (r22): the canaries are parallel
    // workloads, so a ratio against stamps taken at a different
    // SPARK_GRAFT_CPUS fabricates "drift" from the core ratio alone.
    // Raw canary seconds always print.
    val cpusMatch = Bench.refCpusMatches(refPath)
    if (!cpusMatch) System.err.println(
      "QPROBE reference stamped at a different core count — drift " +
        "ratios suppressed (raw canary seconds still printed)")
    val canary = Bench.measureCanary(spark)
    val canaryRef = Bench.canaryReference(refPath).filter(_ => cpusMatch)
    println(f"QPROBE canary $canary%.3f s" + canaryRef.fold("")(r =>
      f" = drift ${canary / r}%.2fx vs committed idle reference $r%.3f s"))
    // Shuffle-side drift (generated input, real exchange to scratch disk):
    // the axis that actually moved in every adjudication this probe has
    // been used for — shuffle-heavy gates swing with host write latency
    // while the CPU and read-side canaries stay flat.
    val shuffleCanary = Bench.measureShuffleCanary(spark)
    val shuffleRef = Bench.canaryReference(refPath, "_shuffleCanary")
      .filter(_ => cpusMatch)
    println(f"QPROBE shuffleCanary $shuffleCanary%.3f s" + shuffleRef.fold("")(r =>
      f" = shuffleDrift ${shuffleCanary / r}%.2fx vs committed $r%.3f s"))
    if (!nowarm) {
      val t0 = System.nanoTime()
      SparkEntry.preMaterialize(spark, sfDir)
      spark.sharedState.cacheManager.clearCache()
      println(f"QPROBE materialize ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val reg = SparkEntry.registry.toMap
    for (n <- names) reg.get(n) match {
      case None => println(s"QPROBE $n: not in registry")
      case Some(q) =>
        if (explain) q.fn(spark, sfDir).explain("formatted")
        val ts = (1 to runs).map { _ =>
          val s = System.nanoTime()
          q.fn(spark, sfDir).count()
          spark.sharedState.cacheManager.clearCache()
          (System.nanoTime() - s) / 1e9
        }
        println(f"QPROBE $n%-28s min=${ts.min}%.3f med=${ts.sorted.apply(runs / 2)}%.3f " +
          ts.map(t => f"$t%.3f").mkString("runs=[", ", ", "]"))
    }
    // I/O-side canary LAST: it measures session-ambient memory/I/O state
    // (min-of-3 converges to the page-warm number, so ordering doesn't
    // invalidate it), and running its 3 lineitem scans before the probes
    // would warm the page cache — perturbing exactly the --nowarm
    // first-run attribution this tool exists for. The drift ratio is only
    // meaningful against the sfDir the reference was stamped for.
    val ioCanary = Bench.measureIoCanary(spark, sfDir)
    val ioStamp = Bench.referenceMetaString(refPath, "_ioCanarySf")
    val ioRefUsable = Bench.ioRefMatches(ioStamp, sfDir)
    // Same loud skip as Bench: a silent drift-less ioCanary line reads as
    // "no reference committed" when the real cause is a stamp mismatch.
    if (!ioRefUsable) System.err.println(
      s"QPROBE _ioCanary reference was stamped against " +
        s"${ioStamp.getOrElse("?")} but this run reads $sfDir — skipping " +
        "ioDrift (the ratio would compare scans of different data)")
    val ioRef = Bench.canaryReference(refPath, "_ioCanary")
      .filter(_ => ioRefUsable && cpusMatch)
    ioCanary.foreach(io => println(f"QPROBE ioCanary $io%.3f s" +
      ioRef.fold("")(r => f" = ioDrift ${io / r}%.2fx vs committed $r%.3f s")))
    spark.stop()
  }
}

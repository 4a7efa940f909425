package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered gate query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query and total
  * wall-clock seconds. `count()` forces full execution of each plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // JIT/codegen warmup so the first measured query doesn't absorb
    // session startup (scheduler, codegen compiler, parquet footer reads).
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () })
    // Shared inter-stage tables (shingle index, signatures, bucketed
    // embeddings) are built once here and timed as their own phase, so
    // per-query numbers don't depend on registry order.
    val tMat0 = System.nanoTime()
    val matOk =
      try { SparkEntry.preMaterialize(spark, sfDir); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] materialize FAILED: ${e.getMessage}"); false
      }
      finally spark.sharedState.cacheManager.clearCache()
    val materializeSec = (System.nanoTime() - tMat0) / 1e9
    // Median of 3 runs per query: single-run timings on sub-3-second
    // queries swing 2-3x with JIT, GC and scheduler noise, which made
    // round-over-round comparisons unadjudicable; the median damps the
    // outlier without hiding a real regression.
    val Runs = 3
    val results = SparkEntry.registry.map { case (name, q) =>
      val runs = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { q.fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
          // Queries materialize/persist intermediates; drop cached blocks
          // even on failure so one broken query can't degrade the rest.
          finally spark.sharedState.cacheManager.clearCache()
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val times = runs.map(_._1).sorted
      (name, times(Runs / 2), times.head, times.last, runs.forall(_._2))
    }
    val qs = results.map { case (k, med, _, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    // min/max alongside the median so run-to-run spread is visible in the
    // artifact itself: a "regression" whose min sits at last round's median
    // is noise, one whose min moved is real.
    val spread = results
      .map { case (k, _, mn, mx, _) => "\"" + k + "\":{\"min\":" + mn + ",\"max\":" + mx + "}" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, _, false) => k } ++
      (if (matOk) Nil else Seq("materialize"))
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // A failed query poisons the run: total = -1 (a broken query must never
    // *improve* the reported number) and the exit code is nonzero. The
    // one-time materialization cost counts toward the total — it is real
    // work — but is reported separately so per-query numbers stay
    // comparable across registry reorderings. total = sum of per-query
    // MEDIANS + materialize.
    val total =
      if (failed.nonEmpty) -1.0 else results.map(_._2).sum + materializeSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$Runs,"materialize":$materializeSec,"queries":$qs,"spread":$spread,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

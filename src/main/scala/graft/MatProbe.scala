package graft

/** Dev-only materialize-phase attribution probe: runs preMaterialize the
  * way Bench does and prints every InterStage build's (start, end,
  * duration, thread, key) relative to phase start — the tool for finding
  * the long pole INSIDE a warm chain (the per-chain stderr prints say
  * which chain; this says which build, and the gaps say which un-written
  * compute — counts, CC rounds — sits between builds).
  */
object MatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()
    SparkEntry.preMaterialize(spark, sfDir)
    println(f"MATPROBE total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.ops.InterStage.buildEvents(_ => true).sortBy(_._3).foreach {
      case (k, tid, s, e) =>
        println(f"MATPROBE ${(s - t0) / 1e9}%6.2f -> ${(e - t0) / 1e9}%6.2f " +
          f"(${(e - s) / 1e9}%5.2f s) tid=$tid%-3d ${k.substring(k.lastIndexOf('|') + 1)}")
    }
    // Standalone CC over the (already materialized) simhash pair table:
    // wall seconds (3 runs — min is the contention-robust statistic) +
    // round counts, so per-round cost is a printed fact.
    val ts = (1 to 3).map { _ =>
      val t1 = System.nanoTime()
      graft.queries.TextQueries.ccLabelsLive(spark, sfDir).count()
      (System.nanoTime() - t1) / 1e9
    }
    println(f"MATPROBE cc_live min=${ts.min}%.2f s " +
      ts.map(t => f"$t%.2f").mkString("runs=[", ", ", "] ") +
      s"rounds=${graft.ops.Graph.lastRounds}")
    spark.stop()
  }
}

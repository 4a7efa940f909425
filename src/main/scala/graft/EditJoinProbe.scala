package graft

import org.apache.spark.sql.functions._

/** Dev-only blocking-selectivity probe for the segment-blocked edit join
  * (t22): the SCALE.md 10×/100× rows fix prefix=30/τ=2, where the copy
  * corpus is output-bound; this sweeps (prefix length, τ) at a chosen
  * corpus scale and records CANDIDATES alongside verified pairs — the
  * e7b-ladder-style numbers that adjudicate whether a configuration's
  * candidate volume (the real scale risk: τ=3 probes 196 keys/row against
  * quarter-length segments) stays linear-ish in the corpus or collapses
  * into collision-quadratic blocking.
  *
  * Usage: EditJoinProbe [sfDir] [copies] [prefix,prefix,...] [tau,tau,...]
  */
object EditJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val prefixes = args.lift(2).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(30, 80))
    val taus = args.lift(3).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(2, 3))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // Shared copy recipe (ProbeCorpus.docsCopies: copytag appended, so
    // copies share their PREFIX verbatim — adversarial: each base doc's
    // copies are pairwise prefix-distance 0), written multi-split with the
    // post-explode spread so the scan isn't flattered by adjacency.
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val big = java.nio.file.Files.createTempDirectory("graft_edprobe_").toString
    ProbeCorpus.docsCopies(spark, sfDir, copies)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .write.mode("overwrite").parquet(s"$big/documents.parquet")
    println(s"[edprobe] corpus: ${nDocs * copies} docs (${copies}x) at $big")

    for (p <- prefixes; tau <- taus) {
      val in = spark.read.parquet(s"$big/documents.parquet")
        .select(col("doc_id"), substring(col("text"), 1, p).as("s"))
      val t0 = System.nanoTime()
      // The probe exists to MEASURE the quadratic regime the operator's
      // guard refuses — override it for every cell of the sweep.
      val nCand = graft.ops.TextOps
        .editDistanceCandidates(in, "doc_id", "s", tau,
          allowRiskyBlocking = true).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nPairs = graft.ops.TextOps
        .editDistanceJoin(in, "doc_id", "s", tau,
          allowRiskyBlocking = true).count()
      val tFull = (System.nanoTime() - t1) / 1e9
      val perRow = nCand.toDouble / (nDocs * copies)
      println(f"[edprobe] prefix=$p tau=$tau: $nCand candidates " +
        f"($perRow%.1f/row, $tCand%.1f s), $nPairs verified pairs " +
        f"(full join $tFull%.1f s)")
    }
    spark.stop()
  }
}

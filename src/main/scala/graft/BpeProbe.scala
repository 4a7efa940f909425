package graft

import org.apache.spark.sql.functions._

/** Dev-only BPE round-cost probe (round 14): the BpeRounds scaladoc claims
  * real trainers run thousands of rounds by checkpointing the symbol table
  * between merges "which changes nothing about the per-round shape" — this
  * measures that claim instead of asserting it. Two curves on the same
  * corpus:
  *
  *   - `bpeTrainCheckpointed` at `rounds` rounds: per-round wall-clock
  *     must be FLAT (each round is pair-shuffle + 1-row collect + map-only
  *     apply + dict write, independent of r);
  *   - the gate's lineage-accreting shape (no checkpoint, each round's
  *     plan nests the previous) forced round-by-round, capped at
  *     `lineageCap` rounds: per-round cost must GROW with r (Catalyst
  *     re-analyzes and the executor re-computes the whole lineage), which
  *     is exactly why the checkpoint exists.
  *
  * Usage: runMain graft.BpeProbe [sfDir] [rounds] [lineageCap]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(30)
    val lineageCap = args.lift(2).map(_.toInt).getOrElse(12)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val times = Seq.newBuilder[(Int, Double)]
    val (merges, fin) = graft.queries.TextQueries.bpeTrainCheckpointed(
      spark, sfDir, rounds, (r, s) => {
        times += r -> s
        println(f"[bprobe] checkpointed round $r%3d: $s%6.2f s")
      })
    val ts = times.result().map(_._2)
    println(f"[bprobe] checkpointed $rounds rounds: total ${ts.sum}%.1f s, " +
      f"first3 avg ${ts.take(3).sum / 3}%.2f s, last3 avg ${ts.takeRight(3).sum / 3}%.2f s, " +
      f"merges ${merges.size}, final dict ${fin.count()} words")

    // Lineage-accreting contrast: same algebra, no checkpoint. Forcing
    // round r re-computes rounds 1..r — the super-linear curve.
    var cur = graft.queries.TextQueries.bpeInit(spark, sfDir)
    for (r <- 1 to lineageCap) {
      val t0 = System.nanoTime()
      val best = graft.queries.TextQueries.bpePairs(cur)
        .orderBy(col("freq").desc, col("p1"), col("p2")).limit(1).collect()
      val (p1, p2) = (best.head.getString(0), best.head.getString(1))
      cur = cur.select(col("w"), col("wc"),
        graft.queries.TextQueries.bpeApply(col("syms"), lit(p1), lit(p2))
          .as("syms"))
      cur.queryExecution.toRdd.count() // force THIS round's full lineage
      println(f"[bprobe] lineage round $r%3d: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}

package graft

import graft.ops.InterStage
import graft.queries.VectorQueries

/** Regression guard for the round-14 materialize-phase halving: the vector
  * warm chain must build the shared `normedBuckets` base EXACTLY ONCE per
  * corpus (every branch reads it; a branch racing to duplicate the write
  * was the pre-fix shape) and must run its four branch chains on
  * concurrent threads (re-serializing them doubles the phase's wall time).
  * Checked via InterStage's build accounting, on a fresh copy of the
  * corpus so the keys are cold regardless of what other suites warmed.
  */
class MaterializeOverlapSpec extends SparkSpec {

  test("vector warm chain builds the shared base once and overlaps branches") {
    // Fresh corpus dir = fresh InterStage keys (tableKey fingerprints the
    // file), so this suite's accounting is isolated from any other suite.
    val dir = java.nio.file.Files.createTempDirectory("graft_overlap_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    val d = dir.toString
    val keyPrefix = InterStage.tableKey(d, "embeddings")

    VectorQueries.warmInterStage(spark, d)

    val events = InterStage.buildEvents(_.startsWith(keyPrefix))
    val baseBuilds = events.count(_._1.endsWith("|lsh16x3norm"))
    assert(baseBuilds == 1,
      s"shared vector base must materialize exactly once, built $baseBuilds times")
    // The branch tables (everything except the base) must have been built
    // by >= 2 distinct threads: four Futures submitted together cannot all
    // land on the caller's thread, so a single builder thread means the
    // chains were re-serialized.
    val branchThreads = events.filterNot(_._1.endsWith("|lsh16x3norm"))
      .map(_._2).distinct
    assert(branchThreads.size >= 2,
      s"branch chains ran on ${branchThreads.size} thread(s) — re-serialized?")
    // And the builds genuinely overlapped in time (each involves a Spark
    // write of hundreds of ms — concurrent submission must show up in the
    // in-flight high-water mark).
    assert(InterStage.maxConcurrentBuilds >= 2,
      s"no two builds were ever in flight together " +
        s"(max=${InterStage.maxConcurrentBuilds})")
  }
}

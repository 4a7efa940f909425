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
    // The warm chain fans out on the global ExecutionContext, whose pool is
    // sized from availableProcessors — on a 1-2 CPU box the branches
    // genuinely serialize (an environment property, not a code regression),
    // so the overlap half of this spec only adjudicates with enough cores.
    assume(Runtime.getRuntime.availableProcessors >= 4,
      "overlap needs >= 4 cores to be a code property")
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
    // The branch builds' (start, end) intervals must overlap in time —
    // checked over THIS corpus's events only, so concurrency elsewhere in
    // the JVM (another suite's materializations) can never satisfy the
    // assertion vacuously. Each build is a Spark write of hundreds of ms;
    // re-serialized chains produce strictly disjoint intervals.
    val branches = events.filterNot(_._1.endsWith("|lsh16x3norm"))
    assert(branches.size >= 2, s"expected >= 2 branch builds, got $branches")
    val overlapped = branches.combinations(2).exists {
      case Seq(a, b) => a._3 < b._4 && b._3 < a._4
      case _ => false
    }
    assert(overlapped,
      s"no two branch builds were in flight together — re-serialized? " +
        branches.map(e => s"${e._1}@[${e._3}..${e._4}]").mkString("; "))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** The one local SparkSession recipe every main (Verify, Bench, ProfCC,
  * PlanAudit) builds from, so a session-config change (a new legacy flag,
  * an extensions addition) happens in exactly one place and profiling
  * never silently diverges from the benchmarked configuration.
  */
object Sessions {

  /** `local[threads]` session with the graft extensions installed.
    * `threads` doubles as the default shuffle-partition count — at local
    * scale one partition per core is the right size (the 200 default just
    * adds scheduling overhead). `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides
    * it for probe-scale experiments (AQE coalesces small partitions, so
    * over-provisioning is safe). Measured on the 300x e7b pair distinct:
    * 128 partitions read 214 s vs 165 s at 32 — the single-JVM probes are
    * disk/CPU-bound there, not per-task-memory-bound, so the knob exists
    * for cluster parity, not as a local win.
    */
  /** Run `body` with this thread's jobs tagged into FAIR pool `name`
    * (created on demand), clearing the tag after — the one wrapper both
    * the warm-phase chains and their nested vector sub-builds use, so a
    * change to pool handling happens in exactly one place. Local
    * properties are per-thread: call this INSIDE the future/thread whose
    * jobs should carry the tag.
    */
  def inPool[A](spark: SparkSession, name: String)(body: => A): A = {
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
    try body
    finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
  }

  def local(threads: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", threads))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Canonical events encoding is TIMESTAMP(µs) (TESTDATA ts contract);
      // this flag ONLY affects legacy INT64 TIMESTAMP(NANOS) files, which
      // Spark otherwise refuses to read — kept so old landings decode as
      // Long nanos and flow through Tables.eventTimeUs's LongType branch.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // FAIR scheduling across concurrently submitted jobs (guide §2.6):
      // matters ONLY when several jobs are in flight — the warm phase's
      // six chains, where the CC rounds' many small sequential jobs used
      // to queue behind the other chains' wide stages under FIFO (each
      // round = one job; a queued round stalls the whole chain). Each
      // warm chain tags its thread with its own on-demand pool
      // (spark.scheduler.pool local property; pools share fairly with
      // default weights, FIFO within a pool). The TIMED per-query phase
      // runs one job at a time, where FAIR ≡ FIFO — no timing-contract
      // change. Scale-neutral: the same policy is what a production
      // cluster runs for concurrent index builds.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

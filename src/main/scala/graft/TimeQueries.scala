package graft

/** Time a named subset of `SparkEntry.queries` against an existing data
  * directory (e.g. a corpus a prior `ScaleProbe` run left in /tmp), one
  * fresh-JVM run per invocation:
  *
  *   sbt "runMain graft.TimeQueries <dir> q1,q2,..."
  *
  * Exists for targeted clean re-measurement: a probe row timed while the
  * machine was contended (another sbt test run, a concurrent Verify) can
  * be re-taken on the same corpus without re-paying the probe's full
  * materialize phase — valid only for queries that derive straight from
  * the source parquet rather than a per-JVM InterStage table (those would
  * silently pay their upstream build here; the printout flags nothing, so
  * pick queries accordingly).
  *
  * Consumption matches ScaleProbe's: xxhash64 over every output column,
  * collapsed to one driver row — a bare count() would let Catalyst prune
  * unused expressions and time a hollowed-out plan (measured: scd2 via
  * count() read 2.7 s while the full plan costs ~15 s — the JSON extract
  * and both window functions were optimized away).
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <dir> <q1,q2,...> [reps]")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val bad = names.filterNot(SparkEntry.queries.contains)
    require(bad.isEmpty, s"unknown queries: ${bad.mkString(",")}")
    for (name <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val n = df.withColumn("__h",
            org.apache.spark.sql.functions.xxhash64(
              df.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.expr("bit_xor(__h)"))
          .head().getLong(0)
        spark.sharedState.cacheManager.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val secs = times.map(_._1).sorted
      val rows = times.map(_._2).distinct
      println(f"[time] $name: median ${secs(secs.length / 2)}%.1f s " +
        f"(min ${secs.head}%.1f, max ${secs.last}%.1f, reps $reps), " +
        s"rows ${rows.mkString("/")}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev-only scd2 bucket-count ladder (round 14): B = 64 was a constant;
  * this turns it into a sized knob like the dedup horizon. For each B, the
  * same corpus is ingested as `landings` sequential big landings (all-new
  * users each — the full-touch worst case, every bucket rewritten) with
  * the fixed 4-user tiny landing measured once at small and once at full
  * history (the flat-in-history regime the bucketing exists for), plus the
  * file-count footprint (small-file pressure is the cost of large B; a
  * full-touch batch writes ~B parquet files).
  *
  * Expected shape: tiny-landing cost falls with B (fewer history rows per
  * touched bucket: ≈ 4/B of the history re-fed through the merge);
  * full-touch cost and file count rise with B (B small writes + manifest);
  * the knob trades one against the other and the table is the sizing
  * guide.
  *
  * Usage: runMain graft.Scd2BucketProbe [sfDir] [copies] [landings] [Bs] [rebucketTo]
  */
object Scd2BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val landings = args.lift(2).map(_.toInt).getOrElse(10)
    val bs = args.lift(3).getOrElse("16,64,256").split(",").map(_.trim.toInt)
    require(copies % landings == 0,
      s"copies ($copies) must be a multiple of landings ($landings)")
    val perLanding = copies / landings
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.streaming.EventStreams
    val span = ProbeCorpus.eventSpan(spark, sfDir)

    def countFiles(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(dir))
    }

    for (b <- bs) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_scd2b${b}_").toString
      val src = s"$root/src"; val state = s"$root/state"; val ckpt = s"$root/ckpt"
      def tinyProbe(k: Int): Unit = {
        val c = copies + k
        val ids = (1L to 4L).map(_ + c * (span.maxUserId + 1))
        ProbeCorpus.eventsCopies(spark, sfDir, span, c, c + 1, ntz = true)
          .where(col("user_id").isin(ids: _*))
          .coalesce(1).write.mode("append").parquet(src)
        val t0 = System.nanoTime()
        EventStreams.scd2Ingest(spark, src, state, ckpt, buckets = b)
        val t = (System.nanoTime() - t0) / 1e9
        val hist = EventStreams.readScd2(spark, state).count()
        println(f"[s2bprobe] B=$b%3d tiny landing @$hist%d-row history: $t%.1f s")
      }
      val bigTimes = Seq.newBuilder[Double]
      for (l <- 0 until landings) {
        ProbeCorpus.eventsCopies(spark, sfDir, span,
            l * perLanding, (l + 1) * perLanding, ntz = true)
          .repartition(8).write.mode("append").parquet(src)
        val t0 = System.nanoTime()
        EventStreams.scd2Ingest(spark, src, state, ckpt, buckets = b)
        val t = (System.nanoTime() - t0) / 1e9
        bigTimes += t
        println(f"[s2bprobe] B=$b%3d full-touch landing $l%2d: $t%.1f s")
        if (l == 0) tinyProbe(0)
      }
      tinyProbe(1)
      val latest = EventStreams.manifestIds(spark, state).max
      val ts = bigTimes.result()
      println(f"[s2bprobe] B=$b%3d SUMMARY: full-touch mean(last ${landings - 1}) " +
        f"${ts.drop(1).sum / (landings - 1)}%.1f s, state files ${countFiles(state)}, " +
        f"latest-batch files ${countFiles(s"$state/batch=$latest")}")
      // The driver-side footer sweep a full-touch commit pays per kind —
      // the B-scaling term the row stamps moved OFF the per-landing Spark
      // jobs and ONTO ~B direct footer reads (VERDICT r17 task 5 asks
      // where that sweep starts to dominate as B grows).
      // Sweep the FULLEST on-disk generation (the newest batch is the
      // tiny probe's — 4 buckets — and would measure nothing).
      val fullest = Option(new java.io.File(state).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(f => new java.io.File(f, "segments")).filter(_.isDirectory)
        .maxByOption(d => Option(d.listFiles()).map(
          _.count(_.getName.startsWith("bucket="))).getOrElse(0))
      fullest.foreach { d =>
        val tS = System.nanoTime()
        val swept = EventStreams.footerRowsByBucket(spark, d.toString)
        println(f"[s2bprobe] B=$b%3d footer sweep (${d.getParentFile.getName}): " +
          f"${swept.size} buckets in ${(System.nanoTime() - tS) / 1e9}%.2f s")
      }

      // Optional 5th arg: migrate this state to B' and report the
      // amortized-rare OPTIMIZE's cost + committer shape (the write is
      // salted-HASH-aligned on (bucket, user_id-salt) — see
      // EventStreams.bucketAligned — so files-per-bucket must stay O(1)
      // however many tasks rewrote the history).
      args.lift(4).map(_.trim.toInt).foreach { b2 =>
        val t0 = System.nanoTime()
        EventStreams.rebucketScd2(spark, state, b2)
        val t = (System.nanoTime() - t0) / 1e9
        val gen = EventStreams.manifestIds(spark, state).max
        val perBucket = Option(new java.io.File(s"$state/batch=$gen/segments")
            .listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
          .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
        val hist = EventStreams.readScd2(spark, state).count()
        if (perBucket.isEmpty)
          println(f"[s2bprobe] B=$b%3d -> $b2 REBUCKET @$hist-row history: " +
            f"$t%.1f s, NO bucket dirs under batch=$gen/segments (empty state?)")
        else
          println(f"[s2bprobe] B=$b%3d -> $b2 REBUCKET @$hist-row history: " +
            f"$t%.1f s, occupied buckets ${perBucket.length}, files/bucket " +
            f"max ${perBucket.max} mean ${perBucket.sum.toDouble / perBucket.length}%.2f, " +
            f"generation files ${countFiles(s"$state/batch=$gen")}")
      }
    }
    spark.stop()
  }
}

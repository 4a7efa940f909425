package graft

import org.apache.spark.sql.functions._

/** Dev-only scale probe for the STREAMING maintenance paths — the batch
  * operators have 10×/100× SCALE.md rows; this gives the ingest twins the
  * same evidentiary footing. Synthesizes an events corpus `copies`× sf0.1
  * (per-copy time shift + id offsets, the "longer history, more users"
  * scale-up, same recipe as ScaleProbe) landed as `landings` sequential
  * file batches, then measures:
  *
  *   - `rollupIngest` / `scd2Ingest`: wall seconds PER LANDING as history
  *     accumulates (the claim under test: per-batch cost tracks the batch
  *     + touched state, not the history length) and the maintained
  *     state's row count. For scd2, a FIXED tiny landing (4 users, ≤4 of
  *     64 buckets) is ingested at a small and at a large history size —
  *     the pair of timings is the flat-in-history evidence for the
  *     bucketed snapshot (the old full-snapshot rewrite grew with
  *     history);
  *   - `driftMonitor` / `dedupStream` (watermark-bounded state): one
  *     AvailableNow run over all landings in file-batch order, reporting
  *     micro-batch count and the MAX live state rows / memory across the
  *     run (the claim: state is bounded by churn inside the watermark
  *     horizon — flat-ish per-batch state while total input grows 10×).
  *     Dedup runs a HORIZON LADDER (30 min / 1 h / 2 h) so the
  *     state-vs-horizon sizing claim is a curve, not a point;
  *   - state metrics come from a StreamingQueryListener accumulating
  *     EVERY progress report — `q.recentProgress` keeps only the last
  *     `numRecentProgressUpdates` (default 100) reports, which silently
  *     understates the max for exactly the long runs this probe exists
  *     to measure.
  *
  * Output lines are `[sprobe] <op>: ...` for SCALE.md transcription.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val landings = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.streaming.EventStreams

    val root = java.nio.file.Files.createTempDirectory("graft_sprobe_").toString
    val src = s"$root/src"

    val span = ProbeCorpus.eventSpan(spark, sfDir)

    // One landing = `copies/landings` consecutive copies, written in copy
    // (= event-time) order so the file source's mod-time ordering delivers
    // them in-order — the contract scd2Ingest enforces and watermarks
    // assume. ts lands as canonical TIMESTAMP NTZ (cast from the µs
    // instant in a UTC session) to match the stream's declared schema.
    // Exact division, enforced: a remainder would silently land fewer
    // copies than the banner (and any SCALE.md row transcribed from it)
    // claims — the probe must never overstate its own corpus.
    require(copies % landings == 0,
      s"copies ($copies) must be a multiple of landings ($landings)")
    val perLanding = copies / landings
    def landingDf(l: Int) = ProbeCorpus.eventsCopies(spark, sfDir, span,
      l * perLanding, (l + 1) * perLanding, ntz = true)
    // Fixed-size probe landing: 4 users of reserved copy index
    // `copies + k` (ids offset past every big landing's users, times
    // shifted past every big landing's times — per-user order holds
    // trivially). Touches ≤ 4 of the 64 scd2 buckets, so its ingest cost
    // is the flat-in-history measurement.
    def tinyLandingDf(k: Int) = {
      val c = copies + k
      val ids = (1L to 4L).map(_ + c * (span.maxUserId + 1))
      ProbeCorpus.eventsCopies(spark, sfDir, span, c, c + 1, ntz = true)
        .where(col("user_id").isin(ids: _*))
    }

    // --- per-landing ingest twins: rollup + scd2 state maintenance ---
    val rollState = s"$root/roll_state"; val rollCkpt = s"$root/roll_ckpt"
    val scdState = s"$root/scd_state"; val scdCkpt = s"$root/scd_ckpt"
    val nLandings = landings
    def tinyProbe(k: Int): Unit = {
      tinyLandingDf(k).coalesce(1).write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      EventStreams.scd2Ingest(spark, src, scdState, scdCkpt)
      val t = (System.nanoTime() - t0) / 1e9
      val histRows = EventStreams.readScd2(spark, scdState).count()
      val latest = EventStreams.manifestIds(spark, scdState).max
      val man = EventStreams.readManifest(spark, scdState, latest)
      val touched = man.entries.count(_._2 == latest)
      println(f"[sprobe] scd2 tiny landing @$histRows%d-row history: " +
        f"$t%.1f s, rewrote $touched of ${man.buckets} buckets")
    }
    for (l <- 0 until nLandings) {
      landingDf(l).repartition(8).write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      EventStreams.rollupIngest(spark, src, rollState, rollCkpt)
      val tRoll = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      EventStreams.scd2Ingest(spark, src, scdState, scdCkpt)
      val tScd = (System.nanoTime() - t1) / 1e9
      val rollRows = EventStreams.readRollup(spark, rollState).count()
      val scdRows = EventStreams.readScd2(spark, scdState).count()
      println(f"[sprobe] landing $l%2d (${perLanding}x copies): " +
        f"rollupIngest $tRoll%.1f s (state $rollRows rows), " +
        f"scd2Ingest $tScd%.1f s (history $scdRows rows)")
      // the flat-in-history pair: once just after the first landing, once
      // on the full history
      if (l == 0) tinyProbe(0)
      if (l == nLandings - 1) tinyProbe(1)
    }

    // --- watermark-bounded streams over the full corpus ---
    // noop sink, NOT memory: the dedup probe's output is corpus-sized and
    // a memory sink would collect it into the driver (the 100× run died
    // exactly there). Output volume comes from the progress reports,
    // accumulated by a listener (NOT the bounded recentProgress buffer —
    // see scaladoc).
    def stateRun(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val collected = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryProgress]()
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          collected.add(e.progress)
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      try {
        val q = df.writeStream.format("noop")
          .outputMode("append")
          .option("checkpointLocation", s"$root/${name}_ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // listener events are delivered asynchronously — drain until the
        // collected count stops growing (bounded wait)
        var last = -1; var waited = 0
        while (collected.size != last && waited < 20) {
          last = collected.size; Thread.sleep(500); waited += 1
        }
        import scala.jdk.CollectionConverters._
        val progs = collected.asScala.toSeq
          .filter(_.runId == q.runId).filter(_.numInputRows > 0)
          .sortBy(_.batchId)
        val st = progs.flatMap(_.stateOperators)
        val maxRows = if (st.isEmpty) 0L else st.map(_.numRowsTotal).max
        val maxMemMb = if (st.isEmpty) 0.0 else st.map(_.memoryUsedBytes).max / 1e6
        val inRows = progs.map(_.numInputRows).sum
        val outRows = progs.map(p => Option(p.sink).map(_.numOutputRows).getOrElse(0L))
          .filter(_ > 0).sum
        // Per-batch state series: the single `max` conflates the warm-up
        // batches (no eviction can fire before the first watermark advance,
        // so batches 1-2 always stack un-evicted) with the steady state the
        // horizon actually governs — the series makes the post-warm-up
        // plateau readable on its own.
        val series = progs.map(_.stateOperators.map(_.numRowsTotal).sum)
        println(f"[sprobe] $name: ${progs.length} micro-batches, $inRows input rows, " +
          f"max live state $maxRows rows / $maxMemMb%.1f MB, out $outRows rows, " +
          s"state/batch [${series.mkString(", ")}]")
        q.stop()
      } finally spark.streams.removeListener(listener)
    }
    // maxFilesPerTrigger ≈ one landing per micro-batch (8 files each).
    // The scd2 tiny-probe landings share `src` (they must ride the same
    // checkpointed file sequence as the big landings) but carry FAR-FUTURE
    // event times (reserved copy indices ≥ `copies`): fed to a watermarked
    // stream they would jump the global watermark past every remaining
    // landing in micro-batch 2 and the run would silently measure
    // late-drop behavior, not state. Their user ids are offset past every
    // big landing's by construction, so filtering on user id BEFORE the
    // operator's withWatermark keeps them out of watermark tracking.
    val maxBigUid = copies.toLong * (span.maxUserId + 1) - 1
    def stream() = spark.readStream.schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "8").parquet(src)
      .where(col("user_id") <= maxBigUid)
    stateRun("sprobe_drift",
      EventStreams.driftMonitor(stream(), EventStreams.driftReference(
        spark.read.schema(EventStreams.eventSchema).parquet(src))))
    // Dedup state-vs-horizon ladder: the sizing claim as a curve. The
    // horizon must be expressed relative to a MICRO-BATCH's event-time
    // span to be measurable here: state is max(one batch's churn,
    // horizon × arrival rate) because eviction only runs at batch
    // boundaries, so a wall-clock horizon far below the batch span (one
    // landing ≈ perLanding copy-spans) reads as the churn floor at every
    // rung. Rungs at 0.5× / 1× / 2× the landing span make the
    // horizon-proportional regime visible above that floor.
    val landingSpanUs = perLanding.toLong * span.spanUs
    for (f <- Seq(0.5, 1.0, 2.0)) {
      val h = s"${math.max(1L, (landingSpanUs * f / 3.6e9).round)} hours"
      stateRun(s"sprobe_dedup_${f}x_landing_${h.replace(' ', '_')}",
        EventStreams.dedupStream(stream(), h))
    }
    stateRun("sprobe_rollup", EventStreams.hourlyRollup(stream()))
    // stream-stream interval join: both sides watermarked, join state
    // expires past watermark + interval — the row that shows join state
    // is horizon-bounded too, not corpus-bounded.
    stateRun("sprobe_attr", EventStreams.clickAttribution(stream(), stream()))
    println(s"[sprobe] corpus: ${span.n * copies} events in $nLandings landings under $root")
    spark.stop()
  }
}

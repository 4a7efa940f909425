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
  *     + keys-sized state, not the history length) and the maintained
  *     state's row count;
  *   - `driftMonitor` / `dedupStream` (watermark-bounded state): one
  *     AvailableNow run over all landings in file-batch order, reporting
  *     micro-batch count and the MAX live state rows / memory across the
  *     run (the claim: state is bounded by churn inside the watermark
  *     horizon — flat-ish per-batch state while total input grows 10×).
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

    // --- per-landing ingest twins: rollup + scd2 state maintenance ---
    val rollState = s"$root/roll_state"; val rollCkpt = s"$root/roll_ckpt"
    val scdState = s"$root/scd_state"; val scdCkpt = s"$root/scd_ckpt"
    val nLandings = landings
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
    }

    // --- watermark-bounded streams over the full corpus ---
    // noop sink, NOT memory: the dedup probe's output is corpus-sized and
    // a memory sink would collect it into the driver (the 100× run died
    // exactly there). Output volume comes from the progress reports.
    def stateRun(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val q = df.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", s"$root/${name}_ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      val st = progs.flatMap(_.stateOperators)
      val maxRows = if (st.isEmpty) 0L else st.map(_.numRowsTotal).max
      val maxMemMb = if (st.isEmpty) 0.0 else st.map(_.memoryUsedBytes).max / 1e6
      val inRows = progs.map(_.numInputRows).sum
      val outRows = progs.map(p => Option(p.sink).map(_.numOutputRows).getOrElse(0L))
        .filter(_ > 0).sum
      println(f"[sprobe] $name: ${progs.length} micro-batches, $inRows input rows, " +
        f"max live state $maxRows rows / $maxMemMb%.1f MB, out $outRows rows")
      q.stop()
    }
    // maxFilesPerTrigger ≈ one landing per micro-batch (8 files each).
    def stream() = spark.readStream.schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "8").parquet(src)
    stateRun("sprobe_drift",
      EventStreams.driftMonitor(stream(), EventStreams.driftReference(
        spark.read.schema(EventStreams.eventSchema).parquet(src))))
    stateRun("sprobe_dedup", EventStreams.dedupStream(stream()))
    stateRun("sprobe_rollup", EventStreams.hourlyRollup(stream()))
    // stream-stream interval join: both sides watermarked, join state
    // expires past watermark + interval — the row that shows join state
    // is horizon-bounded too, not corpus-bounded.
    stateRun("sprobe_attr", EventStreams.clickAttribution(stream(), stream()))
    println(s"[sprobe] corpus: ${span.n * copies} events in $nLandings landings under $root")
    spark.stop()
  }
}

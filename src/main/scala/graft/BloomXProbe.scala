package graft

import org.apache.spark.sql.functions._

/** Dev-only controlled pair for the Bloom-vs-classic extract crossover
  * (round 17): the r16 measurement showed the Bloom path LOSING at every
  * rung of the real 500M chunked extract because its fixed price — one
  * extra parse of the 27 GB WIDE landing CSV — exceeded the accumulated-key
  * exchange it avoids. The 2B default threshold therefore rested on
  * arithmetic, not measurement. This probe shrinks the parse term the way
  * the VERDICT prescribed: a NARROW (key + one value) CSV landing against
  * a synthetic accumulated warehouse of n keys, classic vs bloom on the
  * same box, same session — isolating the scaling terms:
  * classic = distinct + exchange of n accumulated keys + landing shuffle;
  * bloom   = scan-build over n keys + second landing parse + broadcast
  * joins on the ~1% survivors. If a crossover exists on this box, it
  * appears where the key exchange outgrows the (now small) re-parse; if
  * not, the honest negative stands with both terms priced.
  *
  * The landing is 5% duplicate keys / 95% new — the append-mostly landing
  * shape (a dup-heavy full re-delivery falls back via maxBroadcastKeys and
  * is measured separately by the r16 table). Warehouses are regenerated
  * per (rung, mode) and deleted after, so disk peak is one rung.
  *
  * Usage: runMain graft.BloomXProbe <workDir> [rungsM=50,100,200,400] [landingM=20]
  */
object BloomXProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(sys.error("BloomXProbe needs a workDir"))
    val rungs = args.lift(1).getOrElse("50,100,200,400")
      .split(",").map(_.trim.toLong * 1000000L)
    val landingRows = args.lift(2).map(_.trim.toLong).getOrElse(20L) * 1000000L
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = java.nio.file.Paths.get(work)
    java.nio.file.Files.createDirectories(base)
    def narrowRows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(
        concat(lit("K"), col("id")).as("k"),
        pmod(col("id"), lit(997L)).as("v"))

    for (n <- rungs) {
      val dups = landingRows / 20 // 5% re-delivered keys, 95% new
      val csv = s"$base/landing_${n}"
      narrowRows(n - dups, n - dups + landingRows)
        .write.option("header", "true").mode("overwrite").csv(csv)
      for (mode <- Seq("classic", "bloom")) {
        val out = s"$base/wh_${n}_$mode"
        narrowRows(0L, n).write.mode("overwrite").parquet(out)
        spark.conf.set("spark.graft.extract.bloomThreshold",
          if (mode == "bloom") "1" else Long.MaxValue.toString)
        val t0 = System.nanoTime()
        warehouse.Jobs.extract(spark, csv, out, Seq("k"))
        val t = (System.nanoTime() - t0) / 1e9
        val rows = spark.read.parquet(out).count()
        println(f"[bloomx] n=${n / 1000000}%4dM landing=${landingRows / 1000000}M " +
          f"$mode%-7s extract+append $t%7.1f s (rows=$rows%,d)")
        ops.InterStage.deleteRecursively(new java.io.File(out))
      }
      spark.conf.unset("spark.graft.extract.bloomThreshold")
      ops.InterStage.deleteRecursively(new java.io.File(csv))
    }
    spark.stop()
  }
}

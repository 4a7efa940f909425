package graft

/** Dev-only plan archiver: writes `.explain("formatted")` output for the
  * named gate queries to `<outDir>/<query>_<tag>.txt` — the before/after
  * plan evidence an optimization round commits alongside its code.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <q1,q2,...|all>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val tag = args.lift(1).getOrElse("before")
    val names: Seq[String] = args.lift(2) match {
      case None | Some("all") => SparkEntry.registry.map(_._1)
      case Some(csv) => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val reg = SparkEntry.registry.toMap
    for (n <- names) reg.get(n) match {
      case None => System.err.println(s"[plandump] $n: not in registry")
      case Some(q) =>
        try {
          val plan = q.fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), plan)
          println(s"[plandump] wrote $outDir/${n}_$tag.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}

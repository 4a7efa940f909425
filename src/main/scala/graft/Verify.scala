package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query-name filter (local debugging).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // Manifest of every registered query, written BEFORE running any of
    // them: the checker treats a manifest entry with no output dir as FAIL,
    // so a crashed query can't silently drop out of the pass denominator.
    Files.writeString(Paths.get(s"$outDir/_manifest.json"),
      SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
        .map("\"" + _ + "\"").mkString("[", ",", "]"))
    var failed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          failed += 1
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        }
        // finally: a query that fails after persist() must still release its
        // cached blocks, or they degrade the remaining ~60 queries.
        finally spark.sharedState.cacheManager.clearCache()
      }
    if (failed > 0) System.err.println(s"[verify] $failed queries failed")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

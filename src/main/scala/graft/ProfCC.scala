package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling main for the d6 connected-components path (not part
  * of the library surface): prints stage timings on an sf dir.
  */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the inter-stage tables so the pair join cost is separated out
    timed("warm simhashPairs")(SparkEntry.queries("d5_simhash_hamming_pairs")(spark, sfDir).count())
    val pairs = timed("pairs count") {
      val df = SparkEntry.queries("d5_simhash_hamming_pairs")(spark, sfDir)
      df.count()
    }
    println(s"[prof] n_pairs=$pairs")
    timed("d6 full")(SparkEntry.queries("d6_dup_clusters")(spark, sfDir).count())
    timed("d6 again")(SparkEntry.queries("d6_dup_clusters")(spark, sfDir).count())
    spark.stop()
  }
}

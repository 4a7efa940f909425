package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling main for the d6 connected-components path (not part
  * of the library surface): prints stage timings on an sf dir.
  */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // Decompose the Bench materialize phase: each first call below builds
    // one inter-stage table; the repeat shows the post-materialize cost.
    timed("d4 first (simhash sigs)")(SparkEntry.queries("d4_simhash_sig")(spark, sfDir).count())
    timed("d5 first (pair join)")(SparkEntry.queries("d5_simhash_hamming_pairs")(spark, sfDir).count())
    timed("d2 first (shingle index)")(SparkEntry.queries("d2_ngram_jaccard_pairs")(spark, sfDir).count())
    timed("d3 first (minhash sigs)")(SparkEntry.queries("d3_minhash_lsh_pairs")(spark, sfDir).count())
    timed("e2 first (normed buckets)")(SparkEntry.queries("e2_knn_lsh")(spark, sfDir).count())
    timed("d6 full")(SparkEntry.queries("d6_dup_clusters")(spark, sfDir).count())
    timed("d6 again")(SparkEntry.queries("d6_dup_clusters")(spark, sfDir).count())
    spark.stop()
  }
}

package graft

/** Dev-only recall@5 measurement for the four approximate KNN paths
  * (e2 sign-LSH, e6 IVF, e6b adaptive IVF, e7 binary sign) against e1's
  * exact top-5 over the SAME fixed probe set, on an UN-oversampled corpus.
  * ScaleProbe measures the same number on its synthesized 10x corpus, but
  * there every probe's true top-5 is its own near-identical copies — easy
  * for any hash structure — so the discriminative reading is this one, on
  * the base corpus, where neighbors sit at ordinary cosine distances.
  * Run: `sbt "runMain graft.RecallProbe /root/testdata/sf0.1"`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, d)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("e1_knn_bruteforce")
    println(s"[recall] e1 exact baseline: ${exact.size} pairs on $d")
    for (name <- Seq("e2_knn_lsh", "e6_ivf_knn", "e6b_ivf_adaptive",
        "e7_binary_sign_ann", "e9_int8_adc_knn", "e10_pq_adc_knn",
        "e12_ivfpq_knn")) {
      val hit = exact.count(pairs(name).contains)
      println(f"[recall] $name recall@5 vs e1: ${hit.toDouble / exact.size}%.3f ($hit / ${exact.size})")
    }
    spark.stop()
  }
}

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
    // Band-layout recall for the e7b all-pairs near-dup, in the
    // approximate regime (threshold above every layout's completeness
    // bound): what fraction of ALL hamming<=threshold pairs each ladder
    // tier admits. The denominator is the O(n²/2) brute-force pair scan —
    // probe-only by design, the same role e1/e3b play for the KNN paths.
    // This is the recall each tier trades for its candidate-volume cut as
    // adaptiveSignBands widens bands with the corpus.
    locally {
      import org.apache.spark.sql.functions._
      import graft.ops.VectorOps
      import graft.queries.VectorQueries
      // Twin-extended corpus: the base corpus' closest pair sits at
      // hamming 14, so the near-dup stratum (h<=8) would otherwise be
      // empty — the hamming-3 twins populate it. On THIS corpus the
      // stratum holds only base-twin pairs at hamming 3, inside even the
      // 4-band completeness bound, so 1.000 across layouts is expected —
      // but it is a measurement, not a guarantee: pairs at hamming 4-8
      // (e.g. twin-twin crossings on a regenerated corpus) are past the
      // coarser layouts' bounds and may legitimately read below 1.000.
      val sigs = VectorQueries.sigTwinTable(spark, d)
      val thr = VectorQueries.E7bMaxHamming
      // Stratify by hamming: a near-dup pipeline cares about the SMALL-
      // hamming strata (where coarser layouts are pigeonhole-complete or
      // nearly so); the far strata are pairs a near-dup pass doesn't want
      // anyway — the ladder's recall loss should concentrate there.
      def bucket(h: org.apache.spark.sql.Column) =
        when(h <= 8, "h<=8").when(h <= 14, "h9-14").otherwise(s"h15-$thr")
      val ham = bit_count(col("x.sig_lo").bitwiseXOR(col("y.sig_lo"))) +
        bit_count(col("x.sig_hi").bitwiseXOR(col("y.sig_hi")))
      val exactByB = sigs.as("x").join(sigs.as("y"),
          col("x.vec_id") < col("y.vec_id") && ham <= thr)
        .groupBy(bucket(ham).as("b")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[recall] e7b exact pair baseline (hamming <= $thr): " +
        s"${exactByB.values.sum} pairs by stratum $exactByB")
      for ((label, bands) <- Seq(("9-band", VectorOps.signBands),
          ("6-band", VectorOps.signBands6), ("4-band", VectorOps.signBands4))) {
        val foundByB = VectorOps.bandedHammingPairs(sigs,
            "vec_id", "sig_lo", "sig_hi", thr, bands)
          .groupBy(bucket(col("hamming")).as("b")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val strata = exactByB.keys.toSeq.sorted.map { b =>
          val e = exactByB(b); val f = foundByB.getOrElse(b, 0L)
          f"$b ${f.toDouble / e}%.3f ($f/$e)"
        }
        val total = foundByB.values.sum.toDouble / exactByB.values.sum
        println(f"[recall] e7b $label pair recall: total $total%.3f | ${strata.mkString(" | ")}")
      }
    }
    spark.stop()
  }
}

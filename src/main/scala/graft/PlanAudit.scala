package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("p1_p2_projection", "agg_priority_filtered", "j4_left_join_enrich",
        "agg_per_segment", "e2_knn_lsh", "d1_exact_dedup",
        "x1_decontaminate", "x1b_bloom_decontaminate", "d9_repeated_spans", "e7_binary_sign_ann", "e3_cosine_neardup_pairs",
        "e6_ivf_knn", "x2_pii_scrub", "x3_quality_funnel",
        "t14_quality_classifier", "e8_semantic_prune", "e9_int8_adc_knn",
        "e10_pq_adc_knn", "e11_incremental_semantic",
        "e7b_binary_banded_neardup", "e7b_tier4_banded_neardup",
        "m1_media_metadata", "j6_nearest_within_band", "j7_asof_join",
        "m7_image_dhash", "m8_image_neardup", "a12_heavy_hitters",
        "scd2_user_history", "ev_gapfill", "w3_rolling_window",
        "ev_retention", "a13_bucketed_quantiles", "c9_psi_drift",
        "t21_source_quota", "j10_skew_split_join", "t22_fuzzy_edit_join",
        "a14_incremental_rollup")) {
      println(s"########## $name")
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Broadcast") || l.contains("WholeStageCodegen") || l.contains("Exchange")
      ).take(14).mkString("\n"))
    }
    // k8's gate fn writes eagerly and returns a bare read-back scan, so
    // the generic loop would audit a FileScan of the temp dir — print the
    // CLUSTERING plan itself (width_bucket codegen chain + the ONE
    // rangepartitioning exchange + SortExec) instead.
    println("########## k8_zorder_cluster (zorderBy plan, pre-write)")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    val zplan = graft.ops.Relational.zorderBy(li, Seq("l_partkey", "l_suppkey"), 16)
      .queryExecution.executedPlan.toString
    println(zplan.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("Exchange") ||
      l.contains("Sort") || l.contains("WholeStageCodegen")
    ).take(10).mkString("\n"))
    spark.stop()
  }
}

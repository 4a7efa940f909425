package graft

import org.apache.spark.sql.functions._

/** Dev-only 10x scale probe: synthesizes a corpus 10x the sf0.1 documents /
  * embeddings tables under /tmp (each copy perturbed so it stays a NEAR
  * duplicate — the oversampled-corpus hard case where dup clusters grow
  * 10x and pair counts grow 100x), then times the dedup/ANN suite on it.
  * Answers "which operators hold at 10x and which shapes are inherently
  * quadratic" with measurements instead of argument.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    // "light": skip the O(n²) exact baselines (e3b pair scan, e1-anchored
    // recall) — at ≥30x they dominate wall-clock while measuring nothing
    // new (recall is adjudicated at 1x/10x; the ≥30x run exists to fire
    // the adaptive-width switch points and confirm the approximate
    // paths' scaling).
    val light = args.drop(2).contains("light")
    // "only=q1,q2": probe a SUBSET — synthesize only the source tables the
    // subset reads and warm only the inter-stage chains it consumes, so a
    // targeted 100x re-measure (one operator, one fix) doesn't pay the
    // full ~50-minute materialize of every chain.
    val only: Option[Set[String]] = args.drop(2)
      .find(_.startsWith("only=")).map(_.stripPrefix("only=")
        .split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A probe row is selected if the only-set names it in full
    // ("cc_live", "e7b_binary_banded_neardup") or by its leading code
    // ("e7b", "j6"). No only-set selects everything.
    def sel(q: String): Boolean =
      only.forall(o => o.contains(q) || o.contains(q.takeWhile(_ != '_')))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val big = java.nio.file.Files.createTempDirectory("graft_scale_").toString

    val docRows = Seq("d1_exact_dedup", "d2_ngram_jaccard_pairs",
      "d3_minhash_lsh_pairs", "d4_simhash_sig", "d5_simhash_hamming_pairs",
      "d6_dup_clusters", "d7_canonical_prune", "d8_incremental_dedup",
      "d9_repeated_spans", "d9b_span_coverage", "d10_segment_dedup",
      "t4_winnow_fingerprint", "t11_dup_rate", "t12_token_shards",
      "t13_chunk_windows", "t14_quality_classifier", "t15_mixture_resample",
      "t16b_bpe_vocab", "t18_bigram_logprob", "t19_oov_rate",
      "t20_global_rank", "t21_source_quota", "t22_fuzzy_edit_join",
      "t23_stratified_split", "t24_token_budget",
      "m5_ppm_resize",
      "m6_wav_features", "m7_image_dhash", "m8_image_neardup",
      "x1_decontaminate", "x1b_bloom_decontaminate")
    val vecRows = Seq("e2_knn_lsh", "e3_cosine_neardup_pairs", "e6_ivf_knn",
      "e6b_ivf_adaptive", "e7_binary_sign_ann", "e7b_binary_banded_neardup",
      "e8_semantic_prune", "e9_int8_adc_knn", "e10_pq_adc_knn",
      "e11_incremental_semantic", "e12_ivfpq_knn")
    val eventRows = Seq("j6_nearest_within_band", "j7_asof_join",
      "ev_sessionize", "ev_hourly_rollup", "ev_funnel",
      "w3_rolling_window", "ev_retention", "scd2_user_history", "ev_gapfill",
      "c9_psi_drift")
    val liRows = Seq("a12_heavy_hitters", "a13_bucketed_quantiles",
      "j10_skew_split_join", "k8_zorder_cluster")
    val needDocs = (docRows :+ "cc_live").exists(sel)
    val needVecs = (vecRows :+ "cos_pairs_live").exists(sel)
    val needEvents = eventRows.exists(sel)
    val needLi = liRows.exists(sel)

    // Banner reports ONLY what was actually synthesized — an only-mode
    // probe must not log a corpus that does not exist at $big.
    val synthesized = Seq.newBuilder[String]

    // Every synthesized table lands as MULTI-file parquet. The explode
    // inherits the source scan's partitioning — sf0.1 tables are one
    // file — so without this the whole corpus is a single split and every
    // consumer's pre-shuffle stage (JSON extract, media decode, CMS scan)
    // runs on ONE core: scd2 measured 29.5 s single-split vs 3.4 s
    // multi-split at 10× on identical data. A production table at these
    // row counts is never one split, so the one-file corpus would make
    // the probe measure an artifact, not the plan.
    // The spread hashes the post-explode COPY-DEPENDENT key, so the
    // near-duplicate copies of one base row land in different splits. A
    // base-row pre-explode spread would be a cheaper shuffle (n rows, not
    // copies×n), but it colocates all copies of a row adjacently in one
    // file — parquet encodes adjacent near-identical rows far better than
    // a realistically interleaved corpus, flattering every consumer's
    // scan-side cost at 10×/100×. Probe fidelity wins over the one-time
    // synthesis cost.
    val spreadN = spark.sparkContext.defaultParallelism
    def writeSpread(df: org.apache.spark.sql.DataFrame,
                    key: org.apache.spark.sql.Column, path: String): Unit =
      df.repartition(spreadN, key).write.mode("overwrite").parquet(path)

    // documents x copies (ProbeCorpus.docsCopies — the shared recipe).
    if (needDocs) {
      val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
      writeSpread(ProbeCorpus.docsCopies(spark, sfDir, copies),
        col("doc_id"), s"$big/documents.parquet")
      synthesized += s"${nDocs * copies} docs"
    }

    // embeddings x copies: tiny per-copy perturbation on one dimension.
    if (needVecs) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val nVec = emb.count()
      val vecIdOff = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      writeSpread(emb
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .select((col("vec_id") + col("copy") * vecIdOff).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + col("copy").cast("float") * lit(1e-4f))
              .otherwise(x).cast("float")).as("embedding"),
          col("label")),
        col("vec_id"), s"$big/embeddings.parquet")
      synthesized += s"${nVec * copies} vecs"
    }

    // events x copies (ProbeCorpus.eventsCopies): per-band/per-user
    // density stays what the 1x table has, so the banded/as-of join rows
    // measure plan scaling, not a synthetic everything-in-one-band pile-up
    // (oversampling TIME would make every ±12 h window quadratically
    // dense, a different corpus, not a bigger one). ts lands as
    // TimestampType (instant µs) — exercising the decode seam's second
    // branch at probe scale.
    if (needEvents) {
      val span = ProbeCorpus.eventSpan(spark, sfDir)
      writeSpread(
        ProbeCorpus.eventsCopies(spark, sfDir, span, 0, copies, ntz = false),
        col("event_id"), s"$big/events.parquet")
      synthesized += s"${span.n * copies} events"
    }

    // lineitem x copies for the hot-key probe: part keys offset per copy —
    // "more keys, same skew profile", so the heavy-hitter SET scales
    // linearly and the CMS prefilter's selectivity stays what production
    // sees (oversampling the SAME keys would make every key hot at 100x
    // and the prefilter would trivially prune nothing).
    if (needLi) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val nLi = li.count()
      val part0 = spark.read.parquet(s"$sfDir/part.parquet")
      // Offset from the larger of the two key spaces: an unreferenced
      // part key above max(l_partkey) would otherwise collide with the
      // next copy's low keys and duplicate dimension rows.
      val pkOff = math.max(
        li.agg(max(col("l_partkey"))).head().getLong(0),
        part0.agg(max(col("p_partkey"))).head().getLong(0)) + 1
      writeSpread(li
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .withColumn("l_partkey", col("l_partkey") + col("copy") * pkOff)
        .drop("copy"),
        // NOT l_partkey alone: the probe's join key is deliberately skewed,
        // and hashing the spread on it would pile every hot key's rows into
        // one split — the skew probe would then measure that layout
        // artifact. The full row identity is copy-dependent and uniform.
        xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
        s"$big/lineitem.parquet")
      // part replicates with the SAME per-copy key offset so every
      // synthesized l_partkey keeps exactly one dimension match (j10's
      // plain-join semantics need the build side to cover the fact keys).
      writeSpread(part0
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .withColumn("p_partkey", col("p_partkey") + col("copy") * pkOff)
        .drop("copy"),
        col("p_partkey"), s"$big/part.parquet")
      synthesized += s"${nLi * copies} lineitems (+part dim)"
    }

    println(s"[scale] corpus at $big: ${synthesized.result().mkString(", ")}" +
      only.map(o => s" (only=${o.mkString(",")})").getOrElse(""))
    // Consume EVERY output column, not just the row count: count() lets
    // Catalyst prune unused expressions (a pure-projection operator like
    // w3's RANGE-frame window would be optimized out entirely and the
    // probe would time a bare scan). The xxhash64-over-struct aggregate
    // forces each output value to materialize while still collapsing to
    // one driver row; its own cost is one codegen'd hash per row —
    // negligible against any shuffle/decode the operator performs.
    def timed(name: String): Option[Long] = {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, big)
        val row = df.withColumn("__h", xxhash64(df.columns.toIndexedSeq.map(col): _*))
          .agg(count(lit(1)), expr("bit_xor(__h)")).head()
        val n = row.getLong(0)
        println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
        Some(n)
      } catch {
        case e: Throwable =>
          println(f"[scale] $name FAILED after ${(System.nanoTime() - t0) / 1e9}%.1f s: ${e.getMessage.take(200)}")
          None
      } finally spark.sharedState.cacheManager.clearCache()
    }
    val t0 = System.nanoTime()
    // Full runs warm every chain; only-runs warm just what the subset
    // consumes (the targeted 100x re-measure case).
    if (only.isEmpty) SparkEntry.preMaterialize(spark, big)
    else {
      import graft.queries.{TextQueries, VectorQueries}
      if (Seq("d2_ngram_jaccard_pairs", "d3_minhash_lsh_pairs",
          "x1_decontaminate", "x1b_bloom_decontaminate").exists(sel))
        TextQueries.warmShingleChain(spark, big)
      if (Seq("t4_winnow_fingerprint", "t11_dup_rate").exists(sel))
        TextQueries.warmWinnowChain(spark, big)
      if (Seq("d9_repeated_spans", "d9b_span_coverage").exists(sel))
        TextQueries.warmRepSpanChain(spark, big)
      if ((Seq("d4_simhash_sig", "d5_simhash_hamming_pairs", "d6_dup_clusters",
          "d7_canonical_prune", "d8_incremental_dedup") :+ "cc_live").exists(sel))
        TextQueries.warmSimhashChain(spark, big)
      if ((vecRows :+ "cos_pairs_live").exists(sel)) {
        // Sign-signature consumers need only the normed/bucketed corpus
        // table, not the IVF/PQ/semantic-CC builds (at 100x those are
        // tens of minutes this subset never reads).
        val sigOnly = Set("e2_knn_lsh", "e7_binary_sign_ann",
          "e7b_binary_banded_neardup")
        if ((vecRows :+ "cos_pairs_live").filter(sel).forall(sigOnly))
          VectorQueries.warmSigChain(spark, big)
        else VectorQueries.warmInterStage(spark, big)
      }
    }
    println(f"[scale] materialize: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val counts = (docRows ++ vecRows ++ eventRows ++ liRows).filter(sel)
      .map(n => n -> timed(n)).toMap
    // The gates read the materialized CC label table (built in the
    // materialize phase); the ITERATIVE pass itself keeps its own tracked
    // number here so its scaling can't hide inside the shared phase. The
    // rounds count adjudicates any scale-up slowdown: rounds flat + time
    // up = memory/spill-bound; rounds up = algorithmic.
    if (sel("cc_live")) {
      val t = System.nanoTime()
      val n = graft.queries.TextQueries.ccLabelsLive(spark, big).count()
      val rounds = graft.ops.Graph.lastRounds
        .map(r => s"rounds=${r.contract}+${r.jump}j").getOrElse("rounds=?")
      println(f"[scale] cc_live: ${(System.nanoTime() - t) / 1e9}%.1f s, $n rows, $rounds")
    }
    // Same split for the cosine pair pipeline: the e3/e8 gates read the
    // materialized pair table, and this row keeps the LSH candidate +
    // verify pipeline's own scaling tracked.
    if (sel("cos_pairs_live")) {
      val t = System.nanoTime()
      val n = graft.queries.VectorQueries.cosPairsLive(spark, big).count()
      println(f"[scale] cos_pairs_live: ${(System.nanoTime() - t) / 1e9}%.1f s, $n rows")
    }
    // e3 recall vs the exact baseline at the scaled corpus: e3's output is
    // exact-verified (every pair it emits passes sim >= 0.4), so e3 is a
    // subset of e3b and recall = |e3| / |e3b| — no pair join needed (and
    // e3's count is already in hand from its timed run above). e3b is the
    // deliberate O(n^2/2) baseline; acceptable at probe scale.
    counts.getOrElse("e3_cosine_neardup_pairs", None) match {
      case _ if light || only.isDefined =>
        println("[scale] recall SKIPPED (light/only mode)")
      case Some(e3) =>
        timed("e3b_cosine_neardup_exact") match {
          case Some(e3b) if e3b > 0 =>
            println(f"[scale] e3 recall vs exact: ${e3.toDouble / e3b}%.3f ($e3 / $e3b)")
          case Some(_) =>
            println(s"[scale] recall UNDEFINED: exact baseline returned 0 pairs " +
              s"(e3 returned $e3 — nonzero would mean e3 emits pairs the exact scan misses)")
          case None => println("[scale] recall SKIPPED: exact baseline failed")
        }
      case None => println("[scale] recall SKIPPED: e3 failed")
    }
    // recall@5 for every approximate KNN path vs e1's exact top-5 over the
    // SAME fixed probe set (probeCut): an ANN path without a measured
    // accuracy number is not one a user can pick. The result sets are
    // probe-bounded (ProbeCount x 5 rows), so the set compare is a tiny
    // driver-side operation regardless of corpus size; e1 itself is the
    // probe-bounded brute-force scan (linear in the corpus).
    if (light || only.isDefined) println("[scale] knn recall SKIPPED (light/only mode)")
    else try {
      val t = System.nanoTime()
      val exact = SparkEntry.queries("e1_knn_bruteforce")(spark, big)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[scale] e1 exact baseline: ${(System.nanoTime() - t) / 1e9}%.1f s, ${exact.size} pairs")
      for (name <- Seq("e2_knn_lsh", "e6_ivf_knn", "e6b_ivf_adaptive",
          "e7_binary_sign_ann", "e9_int8_adc_knn", "e10_pq_adc_knn",
          "e12_ivfpq_knn")) {
        try {
          val ann = SparkEntry.queries(name)(spark, big)
            .select("q_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val hit = exact.count(ann.contains)
          println(f"[scale] $name recall@5 vs e1: ${hit.toDouble / exact.size}%.3f ($hit / ${exact.size})")
        } catch {
          case e: Throwable =>
            println(s"[scale] $name recall FAILED: ${e.getMessage.take(200)}")
        }
      }
    } catch {
      case e: Throwable =>
        println(s"[scale] knn recall SKIPPED: e1 failed: ${e.getMessage.take(200)}")
    }
    spark.stop()
  }
}

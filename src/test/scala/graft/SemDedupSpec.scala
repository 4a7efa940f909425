package graft

/** Semantic-dedup (e8) invariants on the deterministic sf0.001 corpus,
  * checked from the public query surface alone (the oracle gate checks the
  * exact rows; these pin the structural contract a consumer relies on):
  *   - the kept representatives partition the corpus — member counts sum
  *     to the corpus size and representatives are unique;
  *   - representatives are cluster minima — no near-dup pair (e3) keeps
  *     its larger endpoint, since the smaller one is in the same cluster.
  */
class SemDedupSpec extends SparkSpec {

  private lazy val kept =
    SparkEntry.queries("e8_semantic_prune")(spark, Sf0001).collect()

  test("e8 clusters partition the corpus") {
    val corpus = SparkEntry.queries("e1_knn_bruteforce")(spark, Sf0001)
      .sparkSession.read.parquet(s"$Sf0001/embeddings.parquet").count()
    assert(kept.map(_.getLong(1)).sum === corpus,
      "cluster member counts must sum to the corpus size")
    val ids = kept.map(_.getLong(0))
    assert(ids.distinct.length === ids.length, "duplicate representatives")
  }

  test("e8 keeps the min id of every near-dup pair's cluster") {
    val keptIds = kept.map(_.getLong(0)).toSet
    val pairs = SparkEntry.queries("e3_cosine_neardup_pairs")(spark, Sf0001)
      .select("vec_id_1", "vec_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // vec_id_1 < vec_id_2 by construction: the larger endpoint shares a
    // cluster with a smaller id, so it can never be the cluster min.
    val bad = pairs.collect { case (a, b) if keptIds(b) => (a, b) }
    assert(bad.isEmpty,
      s"larger endpoints of near-dup pairs must be pruned: ${bad.take(5).mkString(", ")}")
  }
}

package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{InterStage, Relational, VectorOps}

/** Embedding similarity search over the `embeddings` table (64-dim unit
  * vectors): brute-force cosine top-k as the correctness baseline, sign-LSH
  * bucketed top-k as the scale path, and cosine near-dup pairs.
  *
  * All float elements are cast to double and summed left-to-right, so the
  * DuckDB oracle's `list_reduce` fold reproduces the exact IEEE sequence —
  * similarity values compare bit-for-bit without rounding slop.
  */
object VectorQueries {

  /** DuckDB fragment mirroring VectorOps.dotD (left fold from 0.0:
    * 0.0 + p1 == p1 exactly, so the no-init fold is identical).
    */
  private def dDot(a: String, b: String) =
    s"list_reduce(list_transform(list_zip($a, $b), z -> z[1]::DOUBLE * z[2]::DOUBLE), (x, y) -> x + y)"
  private def dCos(a: String, b: String) =
    s"(${dDot(a, b)} / (sqrt(${dDot(a, a)}) * sqrt(${dDot(b, b)})))"

  /** Deterministic sign-LSH hyperplanes (shared with the oracle). Two
    * independent 6-plane tables: e2 probes table 1 only; e3 band-ORs both
    * (a pair is a candidate if EITHER table buckets it together) — the
    * d3-style recall amplification: miss probability multiplies per table.
    */
  val Planes = 6
  val Dim = 64
  lazy val planeInts: Seq[Seq[Long]] = VectorOps.hyperplaneInts(Planes, Dim)
  lazy val planeInts2: Seq[Seq[Long]] = VectorOps.hyperplaneInts(Planes, Dim, "t2|")

  /** Multi-probe masks: the probe's own bucket plus each one-bit flip. */
  val probeMasks: Seq[Long] = 0L +: (0 until Planes).map(p => 1L << p)

  /** Pair-recall masks for e3: all bucket flips of Hamming weight <= 2
    * (1 + 6 + 15 = 22 masks). At the sim=0.4 threshold a pair disagrees on
    * each plane with p ~ acos(0.4)/pi ~ 0.37, so <=1-bit probing sees only
    * ~28% of qualifying pairs; <=2 bits lifts a single table to ~61%, and
    * band-ORing the two independent tables to ~1-(1-0.61)^2 ~ 85%.
    * Candidate generation stays a bucket equi-join per table; within one
    * table a pair matches exactly one mask (m = bucket_x XOR bucket_y), so
    * duplicates only arise across tables and one id-pair distinct removes
    * them.
    */
  val pairMasks: Seq[Long] = 0L +:
    ((0 until Planes).map(p => 1L << p) ++
      (for { p <- 0 until Planes; q <- p + 1 until Planes }
        yield (1L << p) | (1L << q)))

  /** DuckDB fragment mirroring VectorOps.lshBucket for column `v`. */
  private def dBucket(v: String, table: Seq[Seq[Long]] = planeInts): String =
    table.zipWithIndex.map { case (ints, p) =>
      val plane = ints.map(m => s"$m/1000000.0 - 1.0").mkString("[", ", ", "]")
      s"(CASE WHEN ${dDot(v, plane)} > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** ANN probe set: a FIXED-SIZE prefix of the id space, not a modulus of
    * it. `vec_id % 50` made probe count proportional to the corpus, so the
    * e1/e7 broadcast scans were quadratic in the gate's own terms; a fixed
    * probe set is the actual ANN contract (external queries against a
    * corpus-sized index) and keeps every probe-side broadcast O(1) as the
    * corpus grows. 40 probes = the sf0.1 probe count under the old modulus,
    * so bench numbers stay comparable.
    *
    * The prefix is RANK-based — the `ProbeCount` lowest vec_ids actually
    * present — not `vec_id < ProbeCount`: a sparse or offset id space
    * (ids starting at 10^9, say) would make a literal-threshold filter
    * silently probe nothing. The cutoff id is one tiny top-k job per
    * (corpus, session), cached like the inter-stage tables; on a dense
    * 0-based corpus it equals ProbeCount - 1, so results are unchanged.
    */
  val ProbeCount = 40
  private val probeCuts = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def probeCut(s: SparkSession, d: String): Long =
    probeCuts.getOrElseUpdate(InterStage.tableKey(d, "embeddings"), {
      val cut = Tables.load(s, d, "embeddings")
        .select(col("vec_id")).orderBy(col("vec_id")).limit(ProbeCount)
        .agg(max(col("vec_id"))).head()
      require(!cut.isNullAt(0), "embeddings corpus is empty: no ANN probe set")
      cut.getLong(0)
    })
  private def probeFilter(s: SparkSession, d: String) =
    col("vec_id") <= probeCut(s, d)
  private val probeFilterSql = "vec_id <= (SELECT max(vec_id) FROM " +
    s"(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $ProbeCount) pq)"

  /** The corpus with its L2 norm and both sign-LSH table buckets
    * precomputed — one materialized inter-stage table shared by e2/e3/e6,
    * so the 13 hyperplane dot products and the norm run exactly once per
    * vector per session and nothing stays in the block cache after a query
    * returns. (Queries that don't touch `bucket2` never pay for it: the
    * parquet reader prunes the column.)
    */
  /** One 32-bit word of the e7 binary sign signature: bit i of `word(v, o)`
    * is set iff element o+i+1 of `v` is positive.
    */
  private def signWord(v: org.apache.spark.sql.Column, off: Int) =
    (0 until 32).map(i =>
      when(element_at(v, off + i + 1) > 0f, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  private def normedBuckets(s: SparkSession, d: String) =
    InterStage.materialize(s, InterStage.tableKey(d, "embeddings") + "|lsh6x2norm",
      Tables.load(s, d, "embeddings")
        .withColumn("bucket", VectorOps.lshBucket(col("embedding"), planeInts))
        .withColumn("bucket2", VectorOps.lshBucket(col("embedding"), planeInts2))
        .withColumn("sig_lo", signWord(col("embedding"), 0))
        .withColumn("sig_hi", signWord(col("embedding"), 32))
        .withColumn("norm", VectorOps.l2Norm(col("embedding"))))

  /** Build the inter-stage table the vector queries share (see
    * TextQueries.warmInterStage for why Bench calls this up front).
    */
  def warmInterStage(s: SparkSession, d: String): Unit = {
    normedBuckets(s, d)
    ()
  }

  val all: Seq[(String, GQ)] = Seq(

    // E1 — brute-force cosine top-5 per probe (every 50th vector probes the
    // whole corpus). Probe side broadcasts; corpus side stays partitioned —
    // the exact-search baseline a 100 TB ANN path is measured against.
    "e1_knn_bruteforce" -> GQ(
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val probes = e.where(probeFilter(s, d))
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        VectorOps.knnBruteForce(probes, "q_id", "q_vec",
          e.repartition(s.sparkContext.defaultParallelism), "vec_id", "embedding", 5)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("sim"))
      },
      "WITH p AS (SELECT vec_id q_id, embedding q_vec FROM embeddings " +
        "WHERE " + probeFilterSql + ") " +
        s"SELECT q_id, vec_id AS neighbor_id, ${dCos("q_vec", "embedding")} AS sim " +
        "FROM p JOIN embeddings e ON p.q_id != e.vec_id " +
        s"QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY " +
        s"${dCos("q_vec", "embedding")} DESC, vec_id) <= 5"),

    // E2 — sign-LSH bucketed top-5: 6 deterministic hyperplanes hash each
    // vector to a 6-bit bucket; probes multi-probe their own bucket plus
    // every one-bit flip (7 buckets), candidates come from an equi-join on
    // the bucket key instead of a cross join — the O(n) scale path; exact
    // cosine re-ranks candidates. Each (probe, candidate) pair matches at
    // most one mask, so no distinct is needed. Approximate by design, and
    // the oracle reproduces exactly that.
    "e2_knn_lsh" -> GQ(
      (s, d) => {
        // Probes and candidates both read the materialized bucketed corpus
        // — the 7 hyperplane dots run once per vector per session.
        val e = normedBuckets(s, d)
        val probes = e.where(probeFilter(s, d))
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("norm").as("q_norm"),
            explode(array(probeMasks.map(m =>
              col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
        val cand = probes.join(e, Seq("bucket")).where(col("q_id") =!= col("vec_id"))
          .withColumn("sim", VectorOps.dotD(col("q_vec"), col("embedding")) /
            (col("q_norm") * col("norm")))
        Relational.topKPerGroup(cand, Seq(col("q_id")),
          Seq(col("sim").desc, col("vec_id")), 5)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("sim"))
      },
      s"WITH b AS (SELECT vec_id, embedding, ${dBucket("embedding")} bucket FROM embeddings), " +
        "p AS (SELECT vec_id q_id, embedding q_vec, xor(bucket, m) bucket FROM b, " +
        s"unnest([${probeMasks.mkString(", ")}]) u(m) WHERE " + probeFilterSql + ") " +
        s"SELECT q_id, e.vec_id AS neighbor_id, ${dCos("q_vec", "e.embedding")} AS sim " +
        "FROM p JOIN b e ON p.bucket = e.bucket AND p.q_id != e.vec_id " +
        s"QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY " +
        s"${dCos("q_vec", "e.embedding")} DESC, e.vec_id) <= 5"),

    // E3 — embedding-cosine near-dup pairs (sim >= 0.4) via sign-LSH
    // candidate generation + exact cosine verify. Band-OR across the TWO
    // independent hash tables (as d3 ORs its MinHash bands): a pair is a
    // candidate if either table buckets it within a <=2-bit flip, so the
    // per-table ~61% recall at the threshold compounds to ~85%. Per table,
    // candidates come from an equi-join on the bucket key (the O(n) scale
    // path — the bucket id is the shuffle/partition key at 100 TB); the
    // cross-table distinct moves only 16-byte id pairs, and the exact
    // cosine re-verify joins the vectors back afterwards. Approximate by
    // design — pairs >2 planes apart in BOTH tables are unseen — the
    // oracle reproduces exactly that candidate set, and e3b is the exact
    // brute-force baseline this path is measured against (as e1 is to e2).
    "e3_cosine_neardup_pairs" -> GQ(
      (s, d) => {
        val b = normedBuckets(s, d)
        def candIds(bcol: String) = {
          val probes = b.select(col("vec_id").as("q_id"),
            explode(array(pairMasks.map(m =>
              col(bcol).bitwiseXOR(lit(m))): _*)).as(bcol))
          probes.join(b.select(col("vec_id"), col(bcol)), Seq(bcol))
            .where(col("q_id") < col("vec_id"))
            .select(col("q_id"), col("vec_id"))
        }
        val cand = candIds("bucket").union(candIds("bucket2"))
          .distinct().toDF("id1", "id2")
        val v = b.select(col("vec_id"), col("embedding"), col("norm"))
        cand.join(v.as("x"), col("id1") === col("x.vec_id"))
          .join(v.as("y"), col("id2") === col("y.vec_id"))
          .select(col("id1").as("vec_id_1"), col("id2").as("vec_id_2"),
            (VectorOps.dotD(col("x.embedding"), col("y.embedding")) /
              (col("x.norm") * col("y.norm"))).as("sim"))
          .where(col("sim") >= 0.4)
      },
      s"WITH b AS (SELECT vec_id, embedding, ${dBucket("embedding")} bucket, " +
        s"${dBucket("embedding", planeInts2)} bucket2 FROM embeddings), " +
        "p1 AS (SELECT vec_id q_id, xor(bucket, m) bucket FROM b, " +
        s"unnest([${pairMasks.mkString(", ")}]) u(m)), " +
        "p2 AS (SELECT vec_id q_id, xor(bucket2, m) bucket2 FROM b, " +
        s"unnest([${pairMasks.mkString(", ")}]) u(m)), " +
        "cand AS (SELECT q_id, e.vec_id vid FROM p1 JOIN b e " +
        "ON p1.bucket = e.bucket AND p1.q_id < e.vec_id " +
        "UNION SELECT q_id, e.vec_id vid FROM p2 JOIN b e " +
        "ON p2.bucket2 = e.bucket2 AND p2.q_id < e.vec_id) " +
        s"SELECT c.q_id vec_id_1, c.vid vec_id_2, ${dCos("x.embedding", "y.embedding")} AS sim " +
        "FROM cand c JOIN b x ON c.q_id = x.vec_id JOIN b y ON c.vid = y.vec_id " +
        s"WHERE ${dCos("x.embedding", "y.embedding")} >= 0.4"),

    // E3b — exact brute-force near-dup pairs: the correctness baseline the
    // e3 LSH path is measured against (recall = |e3| / |e3b| at the same
    // threshold). Deliberately O(n²/2): norms come precomputed from the
    // shared inter-stage table, the dot product is the codegen'd native
    // expression, and the pair join is a broadcast-nested-loop by design —
    // run it on samples at corpus scale, never on the full 100 TB.
    "e3b_cosine_neardup_exact" -> GQ(
      (s, d) => {
        val b = normedBuckets(s, d).select(
          col("vec_id"), col("embedding"), col("norm"))
        b.as("x").join(b.as("y"), col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("vec_id_1"), col("y.vec_id").as("vec_id_2"),
            (VectorOps.dotD(col("x.embedding"), col("y.embedding")) /
              (col("x.norm") * col("y.norm"))).as("sim"))
          .where(col("sim") >= 0.4)
      },
      s"SELECT x.vec_id vec_id_1, y.vec_id vec_id_2, ${dCos("x.embedding", "y.embedding")} AS sim " +
        "FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id " +
        s"WHERE ${dCos("x.embedding", "y.embedding")} >= 0.4"),

    // E5 — int8 quantization round-trip: per-element affine quantization
    // of [-1,1] floats to 0..255 codes and back, with per-vector
    // reconstruction error — the storage-compression pass of an embedding
    // pipeline (4x smaller vectors; exact integer codes so any engine
    // reproduces them). Both per-vector reductions are native codegen'd
    // one-pass loops (graft.functions.QuantizeF) — the HOF
    // transform/aggregate/zip_with form evaluates interpreted per element
    // — and the squared-error loop accumulates in exactly the oracle
    // fold's IEEE order.
    "e5_int8_quantize" -> GQ(
      (s, d) => {
        import graft.functions.QuantizeF
        Tables.load(s, d, "embeddings")
          .select(col("vec_id"),
            QuantizeF.quantCodeSum(col("embedding")).as("code_sum"),
            round(sqrt(QuantizeF.quantSqErr(col("embedding")) / 64.0), 9)
              .as("rmse"))
      },
      "WITH q AS (SELECT vec_id, embedding, list_transform(embedding, " +
        "x -> least(greatest(round((x::DOUBLE + 1.0) * 127.5, 0), 0.0), 255.0)::INT) codes " +
        "FROM embeddings) " +
        "SELECT vec_id, list_sum(codes)::BIGINT AS code_sum, " +
        "round(sqrt(list_reduce(list_transform(list_zip(embedding, codes), " +
        "z -> (z[1]::DOUBLE - (z[2]::DOUBLE / 127.5 - 1.0)) * " +
        "(z[1]::DOUBLE - (z[2]::DOUBLE / 127.5 - 1.0))), (a, v) -> a + v) / 64.0), 9) " +
        "AS rmse FROM q"),

    // E6 — IVF (inverted-file) ANN search, the classic two-level scale
    // path: a coarse quantizer (per-label mean centroids — the e4 build
    // step) partitions the corpus into inverted lists keyed by nearest
    // centroid; probes search only their nprobe=2 nearest lists and exact
    // cosine re-ranks. At 100 TB the inverted list id is the partition
    // key: candidate generation is an equi-join on c_label instead of a
    // cross join, and each probe touches nprobe/nlists of the corpus.
    // The corpus (with norms) comes from the shared inter-stage table —
    // nothing is pinned in the block cache — and the corpus-wide
    // nearest-centroid assignment is a min_by hash aggregate (map-side
    // partials), not a window sort over corpus × nlists rows.
    "e6_ivf_knn" -> GQ(
      (s, d) => {
        val e = normedBuckets(s, d)
          .select(col("vec_id"), col("label"), col("embedding"), col("norm"))
        val aggs = count(lit(1)).as("cn") +: (0 until Dim).map(i =>
          sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
        val cent = e.groupBy(col("label")).agg(aggs.head, aggs.tail: _*)
          .select(col("label").as("c_label"),
            array((0 until Dim).map(i => col(s"s$i") / col("cn")): _*).as("c_vec"))
          .withColumn("c_norm", sqrt(VectorOps.dotD(col("c_vec"), col("c_vec"))))
        // nearest-centroid score of every vector (10-row broadcast); the
        // dot is the native codegen'd expression — it accepts the
        // float-array embedding against the double-array centroid and
        // emits the same IEEE sequence as the interpreted fold.
        val scored = e.crossJoin(broadcast(cent))
          .withColumn("csim", VectorOps.dotD(col("embedding"), col("c_vec")) /
            (col("norm") * col("c_norm")))
          .select(col("vec_id"), col("embedding"), col("norm"),
            col("c_label"), col("csim"))
        val assigned = Relational.top1PerGroup(scored, Seq(col("vec_id")),
            struct(negate(col("csim")), col("c_label")))
          .select(col("vec_id"), col("embedding"), col("norm"), col("c_label"))
        val probes = Relational.topKPerGroup(scored.where(probeFilter(s, d)),
            Seq(col("vec_id")), Seq(col("csim").desc, col("c_label")), 2)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("norm").as("q_norm"), col("c_label"))
        val cand = probes.join(assigned, "c_label")
          .where(col("q_id") =!= col("vec_id"))
          .withColumn("sim", VectorOps.dotD(col("q_vec"), col("embedding")) /
            (col("q_norm") * col("norm")))
        Relational.topKPerGroup(cand, Seq(col("q_id")),
          Seq(col("sim").desc, col("vec_id")), 5)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("sim"))
      },
      "WITH s AS (SELECT label, count(*) cn" +
        (0 until Dim).map(i => s", sum(embedding[${i + 1}]::DOUBLE) s$i").mkString +
        " FROM embeddings GROUP BY label), " +
        "cent AS (SELECT label c_label, [" +
        (0 until Dim).map(i => s"s$i / cn").mkString(", ") + "] c_vec FROM s), " +
        "scored AS (SELECT e.vec_id, e.embedding, c.c_label, " +
        s"${dDot("e.embedding", "c.c_vec")} / (sqrt(${dDot("e.embedding", "e.embedding")}) * " +
        s"sqrt(${dDot("c.c_vec", "c.c_vec")})) csim FROM embeddings e, cent c), " +
        "assigned AS (SELECT vec_id, embedding, c_label FROM scored " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_label) = 1), " +
        "probes AS (SELECT vec_id q_id, embedding q_vec, c_label FROM scored " +
        "WHERE " + probeFilterSql + " " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_label) <= 2) " +
        s"SELECT q_id, a.vec_id AS neighbor_id, ${dCos("q_vec", "a.embedding")} AS sim " +
        "FROM probes p JOIN assigned a ON p.c_label = a.c_label AND p.q_id != a.vec_id " +
        "QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY " +
        s"${dCos("q_vec", "a.embedding")} DESC, a.vec_id) <= 5"),

    // E7 — binary sign-sketch ANN: compress each 64-dim float vector to 64
    // sign bits packed in two 32-bit words (256 bytes -> 8: the binary-
    // quantization storage path), scan signatures with xor+popcount hamming
    // (no float math), keep the top-5 least-hamming candidates per probe,
    // and exact-cosine re-rank only those. At 100 TB the signature table is
    // ~32x smaller than the vectors — the hamming scan streams it at
    // memory bandwidth while the float vectors are only fetched for the
    // k survivors (here via a self-join on the candidate ids). sim of a
    // candidate uses the full vectors, so the output is exact cosine over
    // an approximate (hamming top-k) candidate set; the oracle reproduces
    // the same set bit-for-bit (ties break on vec_id).
    "e7_binary_sign_ann" -> GQ(
      (s, d) => {
        // Signatures come precomputed from the shared inter-stage table —
        // the hamming scan below reads (vec_id, sig_lo, sig_hi) only, so
        // the parquet reader streams ~16 bytes a row, never the vectors.
        val sigs = normedBuckets(s, d)
          .select(col("vec_id"), col("embedding"), col("norm"),
            col("sig_lo"), col("sig_hi"))
        val sigOnly = sigs.select(col("vec_id"), col("sig_lo"), col("sig_hi"))
        val probes = sigOnly.where(probeFilter(s, d))
          .select(col("vec_id").as("q_id"), col("sig_lo").as("q_lo"),
            col("sig_hi").as("q_hi"))
        val ham = sigOnly.crossJoin(broadcast(probes))
          .where(col("q_id") =!= col("vec_id"))
          .select(col("q_id"), col("vec_id"),
            (bit_count(col("q_lo").bitwiseXOR(col("sig_lo"))) +
              bit_count(col("q_hi").bitwiseXOR(col("sig_hi"))))
              .cast("long").as("hamming"))
        // bounded-heap top-k aggregate, not a window: every map partition
        // reduces its slice of the corpus-sized hamming scan to <= 5 pairs
        // per probe before the shuffle (a row_number window would shuffle
        // and sort the whole scan — probes x corpus rows)
        val top = ham.groupBy(col("q_id"))
          .agg(graft.functions.TopKPairAgg.topkPairs(
            col("hamming"), col("vec_id"), 5).as("top"))
          .select(col("q_id"), explode(col("top")).as("p"))
          .select(col("q_id"), col("p.id").as("vec_id"),
            col("p.ord").as("hamming"))
        val v = sigs.select(col("vec_id"), col("embedding"), col("norm"))
        top.join(v.as("q"), col("q_id") === col("q.vec_id"))
          .join(v.as("c"), top("vec_id") === col("c.vec_id"))
          .select(col("q_id"), top("vec_id").as("neighbor_id"), col("hamming"),
            (VectorOps.dotD(col("q.embedding"), col("c.embedding")) /
              (col("q.norm") * col("c.norm"))).as("sim"))
      },
      "WITH sig AS (SELECT vec_id, embedding, " +
        (0 until 32).map(i =>
          s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
          .mkString("(", " + ", ") sig_lo, ") +
        (0 until 32).map(i =>
          s"(CASE WHEN embedding[${32 + i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
          .mkString("(", " + ", ") sig_hi FROM embeddings), ") +
        "p AS (SELECT vec_id q_id, sig_lo q_lo, sig_hi q_hi FROM sig " +
        "WHERE " + probeFilterSql + "), " +
        "top AS (SELECT q_id, vec_id, bit_count(xor(q_lo, sig_lo)) + " +
        "bit_count(xor(q_hi, sig_hi)) AS hamming FROM p JOIN sig " +
        "ON p.q_id != sig.vec_id " +
        "QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY " +
        "bit_count(xor(q_lo, sig_lo)) + bit_count(xor(q_hi, sig_hi)), vec_id) <= 5) " +
        s"SELECT q_id, t.vec_id AS neighbor_id, t.hamming::BIGINT AS hamming, " +
        s"${dCos("q.embedding", "c.embedding")} AS sim " +
        "FROM top t JOIN sig q ON t.q_id = q.vec_id JOIN sig c ON t.vec_id = c.vec_id"),

    // E4 — per-label centroids: element-wise mean via 64 per-dimension
    // aggregates (partial aggregation map-side; the IVF coarse-quantizer
    // build step). Cross-engine double-sum order differs, so derived values
    // are rounded to 6 places for the compare.
    "e4_label_centroids" -> GQ(
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val aggs = count(lit(1)).as("n") +: (0 until 64).map(i =>
          sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
        val norm2 = (0 until 64).map(i => (col(s"s$i") / col("n")) * (col(s"s$i") / col("n")))
          .reduce(_ + _)
        e.groupBy(col("label")).agg(aggs.head, aggs.tail: _*)
          .select(col("label"), col("n"),
            round(col("s0") / col("n"), 6).as("centroid_d0"),
            round(col("s63") / col("n"), 6).as("centroid_d63"),
            round(sqrt(norm2), 6).as("centroid_norm"))
      },
      "WITH s AS (SELECT label, count(*) n" +
        (0 until 64).map(i =>
          s", sum(embedding[${i + 1}]::DOUBLE) s$i").mkString +
        " FROM embeddings GROUP BY label) " +
        "SELECT label, n, round(s0 / n, 6) AS centroid_d0, " +
        "round(s63 / n, 6) AS centroid_d63, " +
        "round(sqrt(" + (0 until 64).map(i => s"(s$i / n) * (s$i / n)").mkString(" + ") +
        "), 6) AS centroid_norm FROM s"))
}

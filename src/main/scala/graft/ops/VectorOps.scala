package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives: cosine/dot-product over `array<float>`
  * columns, brute-force k-NN, and random-hyperplane LSH bucketing as the
  * scale path. Pure Column composition (codegen'd; no UDFs).
  *
  * Float elements are cast to double before any arithmetic and summed with
  * a left fold, so the result is a deterministic IEEE-754 sequence that the
  * DuckDB oracle reproduces bit-for-bit.
  */
object VectorOps {

  /** Dot product of two float vectors in double precision, left-to-right
    * accumulation — the native codegen'd expression (graft.functions
    * .DotProductF). Its loop emits the exact IEEE sequence of a 0.0-seeded
    * left fold, so results are bit-identical to the composable HOF form
    * `aggregate(zip_with(...))` (kept below for dynamically-typed vectors)
    * and to the DuckDB oracle's `list_reduce`.
    */
  def dotD(a: Column, b: Column): Column = graft.functions.GraftFunctions.dot_f(a, b)

  /** Composable fold form — HOFs evaluate interpreted; prefer dotD in hot
    * paths. Bit-identical results.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotD(a, a))

  def cosine(a: Column, b: Column): Column = dotD(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic pseudo-random hyperplanes for sign-LSH, derived from
    * sha2("<salt>p|d") so any engine can regenerate them. Component values
    * are integers in [0, 2000000] that both engines map to [-1, 1] with one
    * exact double division — planes are identical everywhere. A non-empty
    * `salt` yields an independent table (for band-OR recall amplification).
    */
  def hyperplaneInts(planes: Int, dim: Int, salt: String = ""): Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 until planes).map { p =>
      (0 until dim).map { d =>
        val hex = md.digest(s"$salt$p|$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 2000001L
      }
    }
  }

  /** Plane-vector dot against literal plane components — fully codegen'd
    * (element_at + literal multiply), same left-association order as the
    * oracle's fold over a literal list.
    */
  private def planeDot(v: Column, ints: Seq[Long]): Column =
    ints.zipWithIndex.map { case (m, i) =>
      element_at(v, i + 1).cast("double") * (lit(m) / 1000000.0 - 1.0)
    }.reduce(_ + _)

  /** Sign-LSH bucket id: bit `p` set iff `dot(plane_p, v) > 0`. Vectors
    * with high cosine similarity agree on most signs, so near-duplicates
    * collide in the same bucket with high probability. The bucket id is a
    * shuffle key: candidate generation becomes an equi-join instead of a
    * cross join — the O(n²) -> O(n) scale path.
    */
  def lshBucket(v: Column, planes: Seq[Seq[Long]]): Column =
    planes.zipWithIndex.map { case (ints, p) =>
      when(planeDot(v, ints) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Brute-force top-k cosine neighbors of each probe vector against the
    * whole corpus: broadcast the (small) probe set against the corpus scan,
    * then keep the top k per probe. At 100 TB the corpus side stays
    * partitioned; only probes replicate. Ties break on corpus id.
    * Norms are hoisted per vector (computed n times, not n·m times) —
    * the per-vector value is the identical IEEE computation, so hoisting
    * doesn't change any result.
    */
  def knnBruteForce(probes: DataFrame, probeId: String, probeVec: String,
                    corpus: DataFrame, corpusId: String, corpusVec: String,
                    k: Int): DataFrame = {
    val p = probes.withColumn("__pnorm", l2Norm(col(probeVec)))
    val c = corpus.withColumn("__cnorm", l2Norm(col(corpusVec)))
    val joined = c.join(broadcast(p), col(probeId) =!= col(corpusId))
      .withColumn("sim",
        dotD(col(probeVec), col(corpusVec)) / (col("__pnorm") * col("__cnorm")))
    Relational.topKPerGroup(joined, Seq(col(probeId)),
      Seq(col("sim").desc, col(corpusId)), k)
      .drop("__pnorm", "__cnorm")
  }
}

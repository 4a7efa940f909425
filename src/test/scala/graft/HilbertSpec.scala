package graft

import org.apache.spark.sql.functions._
import graft.functions.HilbertIndexF

/** The Hilbert kernel's two load-bearing claims, proved EXHAUSTIVELY on
  * small grids (small enough to enumerate every point, large enough to
  * cross several power-of-two seams — exactly where Morton's locality
  * breaks and a buggy transform would too):
  *
  *  1. BIJECTIVITY — distinct points map to distinct indices covering
  *     exactly [0, 2^(dims*bits)). Without it, range-partitioning on the
  *     key would co-locate unrelated points and the per-file footer spans
  *     `zorderBy(curve = "hilbert")` exists to narrow would be lies.
  *  2. UNIT-STEP — consecutive indices are grid-adjacent (Manhattan
  *     distance exactly 1). This is the property that makes each
  *     range-partitioned file a compact blob instead of Morton's
  *     seam-jumping stripes.
  *
  * Plus the wiring contracts: the Column path (codegen) agrees with the
  * driver kernel bit-for-bit, and the dims*bits ≤ 62 overflow guard fires
  * (past it the interleave would shift bit planes off the Long and alias
  * distinct points — silent clustering corruption, per ADVICE r13).
  */
class HilbertSpec extends SparkSpec {

  /** All (dims, bits) grids we can afford to enumerate exhaustively. */
  private val grids = Seq((2, 1), (2, 2), (2, 3), (2, 4), (2, 5),
    (3, 1), (3, 2), (3, 3), (4, 1), (4, 2))

  /** Every point of the dims-dimensional grid with `bits` bits per side. */
  private def allPoints(dims: Int, bits: Int): Iterator[Array[Long]] = {
    val side = 1L << bits
    val total = math.pow(side.toDouble, dims.toDouble).toLong
    (0L until total).iterator.map { i =>
      val p = new Array[Long](dims)
      var v = i; var d = 0
      while (d < dims) { p(d) = v % side; v /= side; d += 1 }
      p
    }
  }

  test("kernel is a bijection onto [0, 2^(dims*bits)) — exhaustive") {
    for ((dims, bits) <- grids) {
      val total = 1L << (dims * bits)
      val seen = new java.util.BitSet(total.toInt)
      allPoints(dims, bits).foreach { p =>
        // kernel mutates its input — feed it the fresh copy it owns
        val h = HilbertIndexF.hilbertIndex(p, bits)
        assert(h >= 0 && h < total, s"($dims d, $bits b): index $h out of range")
        assert(!seen.get(h.toInt), s"($dims d, $bits b): index $h hit twice")
        seen.set(h.toInt)
      }
      assert(seen.cardinality() == total,
        s"($dims d, $bits b): ${seen.cardinality()} of $total indices covered")
    }
  }

  test("consecutive indices are grid-adjacent (unit step) — exhaustive") {
    for ((dims, bits) <- grids) {
      val total = (1L << (dims * bits)).toInt
      // bijectivity (proved above) makes the inverse map total
      val inv = new Array[Array[Long]](total)
      allPoints(dims, bits).foreach { p =>
        val coords = p.clone() // kernel mutates; keep the point
        inv(HilbertIndexF.hilbertIndex(p, bits).toInt) = coords
      }
      var h = 1
      while (h < total) {
        val (a, b) = (inv(h - 1), inv(h))
        val manhattan = (0 until dims).map(d => math.abs(a(d) - b(d))).sum
        assert(manhattan == 1L,
          s"($dims d, $bits b): step $h-1 -> $h moves distance $manhattan " +
            s"(${a.mkString(",")}) -> (${b.mkString(",")})")
        h += 1
      }
    }
  }

  test("Column path (codegen) agrees with the driver kernel bit-for-bit") {
    val dims = 3; val bits = 3
    val rows = allPoints(dims, bits).map { p =>
      (p(0), p(1), p(2), HilbertIndexF.hilbertIndex(p.clone(), bits))
    }.toSeq
    import spark.implicits._
    val df = rows.toDF("r0", "r1", "r2", "expected")
    val mismatches = df.withColumn("h",
        HilbertIndexF.hilbertIndex(Seq(col("r0"), col("r1"), col("r2")), bits))
      .where(col("h") =!= col("expected")).count()
    assert(mismatches == 0L, s"$mismatches codegen/kernel disagreements")
  }

  test("injectivity holds on big grids the exhaustive pass can't reach") {
    // 3 dims x 20 bits = a 2^60-cell grid: enumerate-and-check is
    // impossible, but injectivity is still falsifiable — hash 50k distinct
    // random points through the kernel and demand 50k distinct in-range
    // indices (a single aliased bit plane would collide immediately).
    val rng = new scala.util.Random(7)
    val dims = 3; val bits = 20; val side = 1L << bits
    val pts = Iterator.continually(Array.fill(dims)(
        math.floorMod(rng.nextLong(), side)))
      .take(50000).map(p => (p(0), p(1), p(2))).toSet
    val idx = pts.map { case (a, b, c) =>
      val h = HilbertIndexF.hilbertIndex(Array(a, b, c), bits)
      assert(h >= 0 && h < (1L << (dims * bits)), s"index $h out of range")
      h
    }
    assert(idx.size == pts.size,
      s"${pts.size - idx.size} collisions among ${pts.size} distinct points")
  }

  test("dims*bits > 62 fails loudly instead of aliasing bit planes") {
    val e = intercept[IllegalArgumentException] {
      HilbertIndexF.hilbertIndex(Seq(col("a"), col("b"), col("c")), 21)
    }
    assert(e.getMessage.contains("62"), e.getMessage)
    // and the expression itself refuses bits outside [1, 30]
    intercept[IllegalArgumentException] {
      HilbertIndexF.hilbertIndex(Seq(col("a"), col("b")), 31)
    }
  }
}

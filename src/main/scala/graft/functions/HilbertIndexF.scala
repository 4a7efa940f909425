package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native d-dimensional Hilbert-curve index over per-column ranks
  * (`array<long>`, each in `[0, 2^bits)`): Skilling's axes→transpose
  * transform (public algorithm, "Programming the Hilbert curve", AIP
  * Conf. Proc. 707, 2004) followed by a bit-plane interleave of the
  * transposed form. Used as the clustering key in
  * `Relational.zorderBy(curve = "hilbert")` — the Hilbert curve's
  * unit-step property (consecutive indices are grid-adjacent, which
  * Morton order lacks at every power-of-two seam) gives file-level
  * min/max spans at least as tight as Morton's on the same ranks.
  *
  * Why native: the transform is an iterative bit dance over a mutable
  * coordinate vector — inexpressible in `functions._` column algebra
  * without materializing one column per (bit, dim) step. One codegen'd
  * loop keeps the write-side clustering scan inside whole-stage codegen.
  *
  * Null/contract notes: a null rank element would break the transform's
  * bijectivity, so rank expressions must coalesce nulls to 0 first (the
  * `zorderBy` rank builders already decree null → rank 0); ranks at or
  * above `2^bits` would alias across bit planes — both are the CALLER's
  * contract (enforced by `zorderBy`'s clamps), not re-checked per row.
  */
case class HilbertIndexF(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 30, s"bits must be in [1, 30], got $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_index expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val x = new Array[Long](ad.numElements())
    var i = 0
    while (i < x.length) { x(i) = ad.getLong(i); i += 1 }
    HilbertIndexF.hilbertIndex(x, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ad => {
      // The transform mutates a scratch vector across two passes with
      // data-dependent exchanges — genuinely imperative, so the generated
      // code calls the same static kernel eval uses (bit-identical paths)
      // instead of inlining a 30-line bit dance per call site.
      val ref = ctx.addReferenceObj("hilbertKernel", this,
        classOf[HilbertIndexF].getName)
      s"${ev.value} = $ref.computeFrom($ad);"
    })

  /** Codegen entry point: ArrayData → long[] copy + kernel. */
  def computeFrom(ad: ArrayData): Long = {
    val x = new Array[Long](ad.numElements())
    var i = 0
    while (i < x.length) { x(i) = ad.getLong(i); i += 1 }
    HilbertIndexF.hilbertIndex(x, bits)
  }

  override protected def withNewChildInternal(newChild: Expression): HilbertIndexF =
    copy(child = newChild)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndexF {

  /** `ranks`: one rank column per dimension, each a Long in `[0, 2^bits)`
    * with nulls already coalesced. `dims * bits ≤ 62` is ENFORCED (same
    * bound as `zorderBy`'s Morton path): past it the interleave would
    * shift bit planes off the top of the Long and silently alias distinct
    * points onto one key — the bijection the clustering depends on.
    */
  def hilbertIndex(ranks: Seq[Column], bits: Int): Column = {
    require(ranks.size >= 2, "hilbertIndex needs >= 2 dimensions")
    require(ranks.size * bits <= 62,
      s"$bits bits x ${ranks.size} dims exceeds one Long (need dims*bits <= 62)")
    ColumnBridge.toColumn(HilbertIndexF(
      ColumnBridge.toExpr(org.apache.spark.sql.functions.array(ranks: _*)), bits))
  }

  /** Skilling's AxesToTranspose + bit-plane interleave. MUTATES `x`.
    * Returns the Hilbert index of the point `x` on a `dims`-dimensional
    * grid of `bits` bits per side: a bijection from the grid onto
    * `[0, 2^(dims*bits))` in which consecutive indices differ by one
    * unit step in exactly one dimension (`HilbertSpec` proves both
    * properties exhaustively on small grids).
    */
  def hilbertIndex(x: Array[Long], bits: Int): Long = {
    val n = x.length
    // Inverse undo: strip the excess work baked into plain coordinates,
    // from the top bit plane down.
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p // invert low bits of dim 0
        else { // exchange low bits of dim 0 and dim i
          val t = (x(0) ^ x(i)) & p
          x(0) ^= t
          x(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode the transposed form.
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // Interleave the transposed bit planes, MSB plane first, dim 0 most
    // significant inside each plane.
    var h = 0L
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < n) {
        h |= ((x(j) >> b) & 1L) << (b * n + (n - 1 - j))
        j += 1
      }
      b += 1
    }
    h
  }
}

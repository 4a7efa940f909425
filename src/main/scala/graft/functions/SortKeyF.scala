package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving bijection between doubles and signed longs, in
  * DESCENDING double order — the key codec that lets [[TopKPairAgg]]'s
  * bounded (Long, Long) heap stand in for a `row_number` window ordered by
  * `(score DESC, id ASC)`:
  *
  *   - `descKey(x)`: signed-long comparisons of the keys reproduce the
  *     descending double order exactly (x1 > x2 ⟺ descKey(x1) <
  *     descKey(x2)), so "k smallest (ord, id) pairs" = "top-k by
  *     (score DESC, id ASC)";
  *   - `descKeyInv(k)`: the exact inverse — a score that rides the heap as
  *     its key is recovered bit-for-bit, never re-derived or rounded.
  *
  * Encoding: the classic sign-magnitude fix-up `bits ^ ((bits >> 63) &
  * 0x7fffffffffffffffL)` maps IEEE-754 bit patterns to ascending-order
  * signed longs (it is its own inverse — the sign bit survives the xor,
  * so the mask is recomputable from the output); the final bitwise NOT
  * reverses to descending order totally (unlike negation, which overflows
  * on Long.MinValue). Total and exact for every non-NaN double, including
  * -0.0 vs 0.0 (which keep their IEEE order adjacency; both sides of a
  * gate compute the same value, so the distinction never surfaces).
  */
private[graft] object SortKeyBits {
  @inline def descKey(x: Double): Long = {
    val bits = java.lang.Double.doubleToRawLongBits(x)
    ~(bits ^ ((bits >> 63) & 0x7fffffffffffffffL))
  }
  @inline def descKeyInv(k: Long): Double = {
    val s = ~k
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))
  }
}

/** descending-order sort key of a double (see [[SortKeyBits]]). */
case class DescSortKeyF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects double, got ${other.simpleString}")
    }

  override def nullSafeEval(x: Any): Any =
    SortKeyBits.descKey(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bits = ctx.freshName("bits")
      s"""
         |long $bits = java.lang.Double.doubleToRawLongBits($x);
         |${ev.value} = ~($bits ^ (($bits >> 63) & 0x7fffffffffffffffL));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DescSortKeyF = copy(child = c)
  override def prettyName: String = "desc_sort_key"
}

/** exact inverse of [[DescSortKeyF]]. */
case class DescSortKeyInvF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects bigint, got ${other.simpleString}")
    }

  override def nullSafeEval(k: Any): Any =
    SortKeyBits.descKeyInv(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k => {
      val s = ctx.freshName("s")
      s"""
         |long $s = ~$k;
         |${ev.value} = java.lang.Double.longBitsToDouble($s ^ (($s >> 63) & 0x7fffffffffffffffL));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DescSortKeyInvF = copy(child = c)
  override def prettyName: String = "desc_sort_key_inv"
}

object SortKeyF {
  def descKey(x: Column): Column =
    ColumnBridge.toColumn(DescSortKeyF(ColumnBridge.toExpr(x)))
  def descKeyInv(k: Column): Column =
    ColumnBridge.toColumn(DescSortKeyInvF(ColumnBridge.toExpr(k)))
}

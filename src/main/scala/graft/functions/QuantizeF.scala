package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native expressions for the int8 affine quantization round-trip
  * (e5): per element, code = clamp(round((x + 1) * 127.5), 0, 255) and the
  * reconstruction r = code / 127.5 - 1.
  *
  * The composable HOF form (`transform` + `aggregate` + `zip_with`)
  * evaluates every lambda interpreted — the per-element dispatch the
  * round-2 review flagged as the e5 throughput bug at corpus scale. These
  * expressions codegen one tight primitive loop each and reproduce the
  * HOF results bit-for-bit: the code is exact integer math (sum order
  * free) and the squared-error accumulates left-to-right exactly like the
  * `aggregate` fold (and the DuckDB oracle's `list_reduce`).
  *
  * `Math.round` (floor(v+0.5)) equals Spark's HALF_UP `round` here: v is
  * in [0, 255] where v+0.5 is exact, so the two roundings cannot differ.
  */
private[functions] trait QuantLoop { self: UnaryExpression =>
  // hoisted once per expression instance (as DotProductF does), not
  // re-derived per element in the interpreted eval path
  protected lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${other.simpleString}")
    }

  protected def elemJava(arr: String, i: String): String =
    if (childIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def elemEval(arr: ArrayData, i: Int): Double =
    if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def code(x: Double): Long =
    math.min(math.max(Math.round((x + 1.0) * 127.5), 0L), 255L)
}

/** Sum of the int8 codes of a vector (exact integer; order-free). */
case class QuantCodeSumF(child: Expression)
    extends UnaryExpression with QuantLoop {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    while (i < arr.numElements()) { acc += code(elemEval(arr, i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  double $v = (${elemJava(arr, i)} + 1.0) * 127.5;
         |  $acc += java.lang.Math.min(java.lang.Math.max(java.lang.Math.round($v), 0L), 255L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantCodeSumF = copy(child = c)
  override def prettyName: String = "quant_code_sum"
}

/** Left-fold sum of squared reconstruction errors of the int8 round-trip
  * — the same IEEE sequence as `aggregate(zip_with(...), 0d, _+_)`.
  */
case class QuantSqErrF(child: Expression)
    extends UnaryExpression with QuantLoop {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < arr.numElements()) {
      val x = elemEval(arr, i)
      val d = x - (code(x).toDouble / 127.5 - 1.0)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val x = ctx.freshName("x"); val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  double $x = ${elemJava(arr, i)};
         |  long $c = java.lang.Math.min(java.lang.Math.max(
         |    java.lang.Math.round(($x + 1.0) * 127.5), 0L), 255L);
         |  double $d = $x - (((double) $c) / 127.5 - 1.0);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantSqErrF = copy(child = c)
  override def prettyName: String = "quant_sq_err"
}

/** The int8 code array itself — the build step of the quantized-corpus
  * index (e9): one codegen'd loop emitting array<int>. Production would
  * pack the codes 4-per-word into binary; int elements keep the parquet
  * column oracle-readable while preserving the scan-cost shape (the
  * quantized table reads 4x fewer value bytes than float64).
  */
case class QuantCodesF(child: Expression)
    extends UnaryExpression with QuantLoop {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val out = new Array[Int](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = code(elemEval(arr, i)).toInt; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val tmp = ctx.freshName("tmp")
      val v = ctx.freshName("v")
      s"""
         |int[] $tmp = new int[$arr.numElements()];
         |for (int $i = 0; $i < $tmp.length; $i++) {
         |  double $v = (${elemJava(arr, i)} + 1.0) * 127.5;
         |  $tmp[$i] = (int) java.lang.Math.min(java.lang.Math.max(
         |    java.lang.Math.round($v), 0L), 255L);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantCodesF = copy(child = c)
  override def prettyName: String = "quant_codes"
}

/** Asymmetric-distance dot product (e9 query side): left-fold sum of
  * dequant(code_i) * probe_i over an int8 code array and a full-precision
  * probe — the ADC scan of a quantized-index search. Same IEEE sequence
  * as the oracle's `list_reduce` over `list_zip` (0.0 + t0 == t0).
  */
case class AdcDotF(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<int>, array<float|double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val vec = r.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = math.min(codes.numElements(), vec.numElements())
    while (i < n) {
      val x = if (rightIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      acc += (codes.getInt(i).toDouble / 127.5 - 1.0) * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, v) => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val x = if (rightIsFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |double $acc = 0.0;
         |int $n = java.lang.Math.min($c.numElements(), $v.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (((double) $c.getInt($i)) / 127.5 - 1.0) * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcDotF =
    copy(left = l, right = r)
  override def prettyName: String = "adc_dot"
}

/** Squared L2 norm of a dequantized code array (e9 build side): left-fold
  * sum of dequant(code_i)^2 — the stored-norm companion to AdcDotF.
  */
case class AdcSelfDotF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<int>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < codes.numElements()) {
      val d = codes.getInt(i).toDouble / 127.5 - 1.0
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  double $d = ((double) $arr.getInt($i)) / 127.5 - 1.0;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): AdcSelfDotF = copy(child = c)
  override def prettyName: String = "adc_self_dot"
}

/** PQ ADC lookup sum (e10 query side): left-fold over the code array of
  * `lut[j * ks + codes[j]]` — the table-lookup scan of product
  * quantization, where the probe's per-subspace dot products against
  * every codebook centroid are precomputed into one flat LUT. One array
  * index per subspace replaces a sub-dim-wide dot product; the fold runs
  * j = 0..m-1 in order, matching the oracle's `list_reduce` sequence.
  */
case class LutSumF(left: Expression, right: Expression, ks: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) if ks > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<int>, array<double>) and ks > 0, got " +
            s"(${l.simpleString}, ${r.simpleString}), ks=$ks")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < codes.numElements()) {
      acc += lut.getDouble(i * ks + codes.getInt(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, v) => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  $acc += $v.getDouble($i * $ks + $c.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LutSumF =
    copy(left = l, right = r)
  override def prettyName: String = "lut_sum"
}

object QuantizeF {
  def quantCodeSum(a: Column): Column =
    ColumnBridge.toColumn(QuantCodeSumF(ColumnBridge.toExpr(a)))
  def quantSqErr(a: Column): Column =
    ColumnBridge.toColumn(QuantSqErrF(ColumnBridge.toExpr(a)))
  def quantCodes(a: Column): Column =
    ColumnBridge.toColumn(QuantCodesF(ColumnBridge.toExpr(a)))
  def adcDot(codes: Column, vec: Column): Column =
    ColumnBridge.toColumn(AdcDotF(ColumnBridge.toExpr(codes), ColumnBridge.toExpr(vec)))
  def adcSelfDot(codes: Column): Column =
    ColumnBridge.toColumn(AdcSelfDotF(ColumnBridge.toExpr(codes)))
  def lutSum(codes: Column, lut: Column, ks: Int): Column =
    ColumnBridge.toColumn(LutSumF(ColumnBridge.toExpr(codes), ColumnBridge.toExpr(lut), ks))
}

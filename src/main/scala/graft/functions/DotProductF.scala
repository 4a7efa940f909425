package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` /
  * `array<double>` columns (any mix) in double precision, accumulated
  * left-to-right. Array elements must be non-null (embedding vectors and
  * derived centroids are).
  *
  * Why a custom Expression (SURVEY preference order (b)): the composable
  * form `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a higher-order
  * function — Catalyst evaluates HOFs interpreted (per-element lambda
  * dispatch, boxing), which dominates ANN pair scans. This expression
  * codegens one tight primitive loop, stays inside whole-stage codegen,
  * and produces the exact same IEEE-754 sequence as the fold
  * (`(((0+p0)+p1)+p2)...`), so results are bit-identical to the
  * HOF form and to the DuckDB oracle's `list_reduce`.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_f expects (array<float|double>, array<float|double>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  private lazy val leftIsFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightIsFloat = elemType(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getL = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($getL) * ($getR);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f"
}

/** Column + SQL registration for the native functions. */
object GraftFunctions {

  def dot_f(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      DotProductF(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** All native expressions, by SQL name, with their builders. */
  private[functions] val natives: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("dot_f", classOf[DotProductF],
      (e: Seq[Expression]) => DotProductF(e(0), e(1))),
    ("simhash60", classOf[SimHash60F],
      (e: Seq[Expression]) => SimHash60F(e(0))),
    ("simhash_agg", classOf[SimHashAgg],
      (e: Seq[Expression]) => SimHashAgg(e(0)).toAggregateExpression()),
    ("quant_code_sum", classOf[QuantCodeSumF],
      (e: Seq[Expression]) => QuantCodeSumF(e(0))),
    ("quant_sq_err", classOf[QuantSqErrF],
      (e: Seq[Expression]) => QuantSqErrF(e(0))),
    ("topk_pairs", classOf[TopKPairAgg],
      (e: Seq[Expression]) => {
        // k is a structural parameter of the aggregate (buffer size), so it
        // must be a foldable positive *integral* literal — fractional values
        // (which would silently truncate), zero/negative values, and
        // non-foldable expressions all die here as a user-facing
        // invalid-parameter analysis error, not a ClassCastException at
        // eval time or an "internal error" report.
        if (e.size != 3) throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map("functionName" -> "`topk_pairs`", "expectedNum" -> "3",
            "actualNum" -> e.size.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
        def bad(got: String) = new org.apache.spark.sql.AnalysisException(
          "INVALID_PARAMETER_VALUE.INTEGER",
          Map("parameter" -> "`k`", "functionName" -> "`topk_pairs`",
            "invalidValue" -> got))
        if (!e(2).foldable) throw bad("a non-foldable expression")
        def checked(v: Long): Int = {
          if (v <= 0 || v > Int.MaxValue)
            throw bad(s"$v (must be in [1, ${Int.MaxValue}])")
          v.toInt
        }
        val k = e(2).eval() match {
          case n @ (_: java.lang.Byte | _: java.lang.Short |
                    _: java.lang.Integer | _: java.lang.Long) =>
            checked(n.asInstanceOf[java.lang.Number].longValue())
          // integral-valued Decimal literals (CAST(5 AS DECIMAL(10,0)),
          // typed_lit(BigDecimal(5))) carry no fractional part — accept
          // them as Spark builtins do for integer parameters; fractional
          // Decimals still die as invalid.
          case d: org.apache.spark.sql.types.Decimal
              if d.toBigDecimal.isWhole && d.toBigDecimal.isValidLong =>
            checked(d.toBigDecimal.longValue)
          case other => throw bad(String.valueOf(other))
        }
        TopKPairAgg(e(0), e(1), k).toAggregateExpression()
      }))

  /** Register every native function in a session's function registry so
    * `spark.sql` queries can call them too.
    */
  def register(spark: SparkSession): Unit =
    natives.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** SparkSessionExtensions hook — `.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * native functions at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.natives.foreach { case (name, cls, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
}

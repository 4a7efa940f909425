package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 60-bit SimHash over pre-hashed tokens (`array<long>`): per bit
  * position, sum ±1 over the token hashes' bits; positive sums set the
  * output bit. Integer arithmetic — order-independent, so bit-identical to
  * the composable fold form (TextOps.simhash60's aggregate/zip_with) and
  * to the oracle's unnest-and-sum formulation.
  *
  * Why native: the fold allocates and copies a 60-element accumulator
  * array per token (interpreted HOF evaluation); this expression is one
  * codegen'd loop over a primitive int[60] on the stack frame.
  */
case class SimHash60F(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](60)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 60) {
        sums(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val sums = ctx.freshName("sums")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $sums = new int[60];
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $sums[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($sums[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60F =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash60F {
  def simhash60(hashes: Column): Column =
    ColumnBridge.toColumn(SimHash60F(ColumnBridge.toExpr(hashes)))
}

package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native frequency probe against a pre-built Count-Min sketch — the
  * heavy-hitter building block for two-phase hot-key detection at 100 TB:
  * exact per-key counting shuffles every distinct key, but a CMS of the
  * whole corpus fits in a few hundred KB (depth×width counters,
  * key-cardinality-independent), so a scan-side estimate drops the cold
  * tail before any shuffle. CMS never underestimates, so the prefilter has
  * NO false negatives — an exact count over the surviving candidates
  * reproduces the exact heavy-hitter set; only the data movement changes
  * (the same contract as the Bloom-prefiltered semi-join in
  * `BloomMightContainF`).
  *
  * The sketch is Spark's own `util.sketch.CountMinSketch` (public API),
  * built distributed by the built-in `count_min_sketch` aggregate,
  * serialized into the expression, and deserialized once per executor
  * (`@transient lazy`). Codegen binds the deserialized sketch as a
  * reference object — one virtual call per row inside whole-stage codegen.
  */
case class CmsEstimateF(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string or bigint, got ${other.simpleString}")
    }

  // Probe hashing must match what the builder aggregate hashed: Spark's
  // CountMinSketchAgg adds StringType values as their UTF-8 bytes
  // (estimateCount(String) re-derives the same bytes) and integral values
  // through the long path (estimateCount(Long) dispatches there).
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => cms.estimateCount(v.toString)
    case LongType   => cms.estimateCount(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmSketch", cms, classOf[CountMinSketch].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.estimateCount($c.toString())")
      case LongType => // long autoboxes into estimateCount(Object)'s long path
        defineCodeGen(ctx, ev, c => s"$ref.estimateCount((Object) $c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsEstimateF {
  def apply(c: Column, cms: CountMinSketch): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      cms.writeTo(out)
      out.toByteArray
    }
    ColumnBridge.toColumn(CmsEstimateF(ColumnBridge.toExpr(c), bytes))
  }

  /** Rehydrate a sketch serialized by the `count_min_sketch` aggregate. */
  def readFrom(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
}

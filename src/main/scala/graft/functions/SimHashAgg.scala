package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash as a bounded-state aggregate over pre-hashed tokens
  * (one `bigint` row per token): the buffer is the 60 per-bit ±1 sums —
  * 240 bytes per group, independent of document length — merged
  * map-side like any partial aggregation, and finalized to the signature
  * long (bit b set iff sum_b > 0).
  *
  * This is the shape that survives the 100 TB contract: the per-row form
  * (`SimHash60F` over a collected token-hash array) needs the whole
  * document's hashes in one buffer — `collect_list` state grows with the
  * longest document — while this aggregate's state is O(60) no matter
  * how long the document is, and the shuffle moves one 240-byte partial
  * per (doc, map partition) instead of every token hash. Integer ±1 sums
  * are order-independent, so the result is bit-identical to `SimHash60F`,
  * to the relational 60-column `sum` form (TextOps.simhashRows), and to
  * the DuckDB oracle's unnest-and-sum CTEs.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](60)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 60) {
        buf(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 60) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(60 * 4)
    var b = 0
    while (b < 60) { bb.putInt(buf(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Int](60)
    var b = 0
    while (b < 60) { buf(b) = bb.getInt; b += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {

  /** Aggregate column: 60-bit SimHash of the group's token hashes. Null
    * hashes are ignored; an all-null/empty group yields signature 0 (every
    * sum is 0, no bit set) — same as `SimHash60F` on an empty array.
    */
  def simhashAgg(h: Column): Column =
    ColumnBridge.toColumn(
      SimHashAgg(ColumnBridge.toExpr(h)).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dense bitmap index over a bounded integer key domain as a mergeable
  * custom aggregate — the third engine-exact summary in the q151/q157
  * family, and unlike those two it is EXACT, not probabilistic: bit p of
  * the bitmap is set iff key p was seen. update sets one bit, merge is
  * elementwise OR — commutative and idempotent, so the result is
  * independent of partitioning, merge order, and input multiplicity.
  *
  * Layout: 63 bits per int64 word (word = key div 63, bit = key mod 63).
  * Spending the sign bit buys cross-engine arithmetic reconstruction:
  * every word equals Σ 2^(key mod 63) over its members — a plain BIGINT
  * sum of shifts both Spark and DuckDB evaluate exactly, with no signed-
  * overflow edge at bit 63 (the q157 oracle trick applied to bitmaps).
  * Out-of-domain keys throw loudly rather than silently dropping bits.
  *
  * Scale shape: the classic bitmap-index contract — per-group state is
  * fixed words·8 bytes, set-algebra queries (AND/OR + popcount) run on
  * kilobytes without rescanning rows, and partials OR-merge in one
  * reduce. At 100 TB the key domain is range-bucketed and each bucket
  * carries this dense bitmap (the roaring-container idea); the dense
  * core here is that container.
  */
case class BitmapAgg(
    child: Expression,
    words: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // update() reads the child as Long — reject non-long at analysis.
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v.asInstanceOf[Long]
      require(pos >= 0 && pos < words.toLong * 63,
        s"bitmap position $pos outside [0, ${words.toLong * 63})")
      buf((pos / 63).toInt) |= 1L << (pos % 63).toInt
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAgg =
    copy(child = newChildren.head)
}

object BitmapAgg {
  /** Column API: the dense 63-bit-word bitmap of a long key column. */
  def bitmap(pos: Column, words: Int): Column =
    exprToColumn(BitmapAgg(colToExpr(pos), words).toAggregateExpression())
}

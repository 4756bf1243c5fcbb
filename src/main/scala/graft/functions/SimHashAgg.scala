package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash signature as a single custom aggregate — the
  * `TypedImperativeAggregate` (mutable-buffer UDAF) surface.
  *
  * Input: a 64-bit token hash per row. Buffer: 64 signed bit counters
  * (+1 when the token hash has bit b set, −1 otherwise). Final value: the
  * signature long whose bit b is set iff counter b ≥ 0 — identical to the
  * 64-column `sum(when(...))` formulation it replaces, but one aggregate
  * with one fixed 256-byte buffer, partial/final merged by vector add.
  * 64 bits (vs 32) keeps per-band bucket counts growing with corpus size:
  * 16-bit bands give 65k buckets/band, so candidate pairs stay ≈ n²/65k
  * per band instead of saturating at 256 buckets.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with ExpectsInputTypes {

  private val nBits = 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  // update() reads the child as Long — reject non-long at analysis.
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](nBits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < nBits) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < nBits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < nBits) {
      if (buf(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(nBits * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nBits)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column API: simhash signature of a group of 64-bit token hashes. */
  def simhash_agg(tokenHash: Column): Column =
    exprToColumn(SimHashAgg(colToExpr(tokenHash)).toAggregateExpression())
}

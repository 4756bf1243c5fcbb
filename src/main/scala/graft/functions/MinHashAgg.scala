package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature (nPerm permutation minima) as one custom aggregate.
  *
  * Input: a 64-bit element hash per row (one base hash; the nPerm
  * "permutations" are cheap avalanche mixes of it — standard one-hash
  * MinHash). Buffer: nPerm running minima, merged element-wise; the final
  * value is the signature as array<bigint>. Replaces nPerm separate
  * `min(xxhash64(j, x))` aggregate columns with one fixed-size buffer.
  */
case class MinHashAgg(
    child: Expression,
    nPerm: Int = 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // update() reads the child as Long — reject non-long at analysis.
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nPerm)(Long.MaxValue)

  /** splitmix64-style avalanche of (base ^ perm-salt). */
  private def mix(base: Long, j: Int): Long = {
    var z = base ^ (0x9E3779B97F4A7C15L * (j + 1))
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var j = 0
      while (j < nPerm) {
        val h = mix(base, j)
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nPerm) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(nPerm * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nPerm)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: nPerm-wide minhash signature of grouped element hashes. */
  def minhash_agg(elementHash: Column, nPerm: Int = 16): Column =
    exprToColumn(MinHashAgg(colToExpr(elementHash), nPerm).toAggregateExpression())
}

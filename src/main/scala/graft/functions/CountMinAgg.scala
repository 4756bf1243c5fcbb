package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005) as one mergeable custom
  * aggregate: d=4 rows × w buckets of int64 counters; update increments one
  * bucket per row, merge is elementwise addition — fully commutative, so
  * the result is independent of partitioning and merge order (pinned by
  * spec). Point estimate = min over rows of the key's bucket, which can
  * only OVERcount (collisions add, never subtract): `exact ≤ est ≤ exact +
  * εn` with ε ≈ e/w at the usual depth.
  *
  * Unlike the xxhash-seeded MinHash/SimHash aggregates (rows-only), the
  * bucket hash here is deliberately ENGINE-EXACT: row j hashes key k to
  * `mix(md5(j ++ ":" ++ k)) mod w`, where mix reads the first four hex
  * chars through their ASCII codes — every piece (md5 hex, substr, ascii,
  * %, +, *) evaluates identically in Spark, the JVM, and DuckDB SQL, so
  * the ENTIRE sketch (all d·w counters) and every estimate built from it
  * hash-match an independent SQL reconstruction (the q151 oracle).
  *
  * Scale shape: the classic mergeable-summary contract — partials of fixed
  * size d·w·8 bytes per partition regardless of input cardinality, one
  * reduce to combine, never a per-key shuffle.
  */
case class CountMinAgg(
    child: Expression,
    d: Int = 4,
    w: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // Analysis-time contract: update() reads the child as UTF8String, so a
  // non-string child must fail in the analyzer, not as an executor-side
  // ClassCastException mid-job.
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < d) {
        buf(j * w + CountMinAgg.bucket(j, key, w)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {

  /** Per-thread digest: `MessageDigest.getInstance` walks the provider
    * registry on every call, which shows up when update runs d=4 hashes
    * per input row; `digest()` leaves the instance reset, so reuse is
    * safe.
    */
  private[functions] val tlMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Row-j bucket of `key`: the first four lowercase-hex chars of
    * md5("j:key"), mixed through their ASCII codes — the exact integer
    * arithmetic the SQL twin `(ascii(substr(h,1,1))*1009 + … ) % w`
    * performs.
    */
  def bucket(j: Int, key: String, w: Int): Int = {
    val h = tlMd5.get().digest(s"$j:$key".getBytes(StandardCharsets.UTF_8))
    // first 4 hex chars = high/low nibbles of the first 2 bytes
    def hexChar(nibble: Int): Int = {
      val c = if (nibble < 10) '0' + nibble else 'a' + (nibble - 10)
      c
    }
    val a1 = hexChar((h(0) >> 4) & 0xf)
    val a2 = hexChar(h(0) & 0xf)
    val a3 = hexChar((h(1) >> 4) & 0xf)
    val a4 = hexChar(h(1) & 0xf)
    (a1 * 1009 + a2 * 101 + a3 * 11 + a4) % w
  }

  /** Column API: flattened d×w int64 counter array. */
  def count_min(key: Column, d: Int = 4, w: Int = 4096): Column =
    exprToColumn(CountMinAgg(colToExpr(key), d, w).toAggregateExpression())
}

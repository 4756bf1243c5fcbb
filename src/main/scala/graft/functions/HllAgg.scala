package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog (Flajolet et al. 2007) as a mergeable custom aggregate whose
  * ENTIRE state is cross-engine reconstructable — the graduation q151 gave
  * count-min, applied to the distinct-count sketch family that q34
  * (approx_count_distinct) and q110 (DataSketches HLL rollup) could only
  * cover rows-only, their hash seeds being engine-private.
  *
  * State: m = 256 registers (p = 8). Key k hashes to h = md5hex(k);
  *   bucket = 16·hexval(h[0]) + hexval(h[1])            (first 8 bits)
  *   rho    = position of the first 1-bit in the next 60 bits (h[2..16]),
  *            i.e. 4·(leading zero nibbles) + 5 − bitlen(first nonzero
  *            nibble); 61 if all 60 bits are zero (cap).
  * update = register max(bucket, rho); merge = elementwise max — fully
  * idempotent and commutative, so the sketch is independent of
  * partitioning, merge order, AND input multiplicity (duplicates are
  * absorbed, which is the whole point).
  *
  * Every primitive above (md5 hex, ascii-decode of a hex char, ltrim of
  * leading '0's, bin-length bitlen) evaluates identically in the JVM and
  * in DuckDB SQL, so all 256 registers and every estimate derived from
  * them hash-match an independent SQL reconstruction (the q157 oracle).
  * The estimator stays in exact integer arithmetic too: with S =
  * Σ_j 2^(61−M_j) (an int64-summable decimal — 2^61 fits a long), the
  * raw HLL estimate α_m·m²/Σ2^(−M_j) becomes the integral division
  *   est = ⌊α_num·m²·2^61 / (α_den·S)⌋,
  * where α_256 = 0.7213/(1+1.079/256) is the exact rational
  * 1846528/2570790 (= 7213·m / (10000·m + 10790)).
  *
  * Scale shape: the classic mergeable-summary contract — fixed 2 KB of
  * state per partition regardless of input cardinality, one reduce to
  * combine, never a per-key shuffle; rollups (group → ALL) are register
  * maxes over kilobytes, not re-scans of raw rows (q110's discipline,
  * now exact).
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // update() reads the child as UTF8String — reject non-string at analysis.
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](HllAgg.M)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String already holds the UTF-8 bytes md5 needs — hash them
      // directly instead of decoding to String and re-encoding (one
      // String + one byte[] allocation per row on the hot path).
      val (b, rho) = HllAgg.bucketRhoBytes(v.asInstanceOf[UTF8String].getBytes)
      if (rho > buf(b)) buf(b) = rho
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {

  /** Register count m = 2^p, p = 8. */
  val M = 256

  /** rho cap: 60 hashed bits examined, so an all-zero suffix reads 61. */
  val RhoCap = 61L

  /** α_256 as the exact rational 7213·m / (10000·m + 10790). */
  val AlphaNum = 7213L * M
  val AlphaDen = 10000L * M + 10790L

  /** Numerator of the integral estimator: α_num · m² · 2^61 (exact). */
  val EstNumerator: java.math.BigInteger =
    java.math.BigInteger.valueOf(AlphaNum)
      .multiply(java.math.BigInteger.valueOf(M.toLong * M))
      .multiply(java.math.BigInteger.TWO.pow(61))

  /** (bucket, rho) of a key — the JVM twin of the SQL hex-string walk.
    * Uses the shared per-thread digest (one md5 per input row).
    */
  def bucketRho(key: String): (Int, Long) =
    bucketRhoBytes(key.getBytes(StandardCharsets.UTF_8))

  /** [[bucketRho]] over the key's UTF-8 bytes — the allocation-free form
    * the aggregate's update path uses (UTF8String exposes its bytes
    * directly; md5 of those bytes ≡ md5 of the decoded string re-encoded).
    */
  def bucketRhoBytes(key: Array[Byte]): (Int, Long) = {
    val h = CountMinAgg.tlMd5.get().digest(key)
    // bucket = first two hex chars = both nibbles of byte 0
    val b = ((h(0) >> 4) & 0xf) * 16 + (h(0) & 0xf)
    // rho over hex chars 3..17 = 15 nibbles = bytes 1..7 + high nibble of 8
    var z = 0          // leading zero nibbles
    var v = 0          // first nonzero nibble
    var i = 0
    while (v == 0 && i < 15) {
      val nib = if (i % 2 == 0) (h(1 + i / 2) >> 4) & 0xf else h(1 + i / 2) & 0xf
      if (nib == 0) z += 1 else v = nib
      i += 1
    }
    val rho =
      if (v == 0) RhoCap
      else 4L * z + 5L - (32 - Integer.numberOfLeadingZeros(v))
    (b, rho)
  }

  /** Column API: the 256 int64 registers. */
  def hll_registers(key: Column): Column =
    exprToColumn(HllAgg(colToExpr(key)).toAggregateExpression())
}

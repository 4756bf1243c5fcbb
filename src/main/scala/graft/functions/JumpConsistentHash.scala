package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Jump consistent hash (Lamping & Veach, "A Fast, Minimal Memory,
  * Consistent Hash Algorithm", 2014): maps a 64-bit key to one of n
  * buckets such that growing n → n+1 moves EXACTLY the expected 1/(n+1)
  * fraction of keys — and every moved key lands in the NEW bucket.
  * That is the resharding primitive a 100 TB store needs: going from 16
  * to 17 shards relocates ~6% of the data instead of the ~94% a plain
  * `hash % n` reshuffle would touch.
  *
  * The loop is the published algorithm verbatim: an LCG advances the key,
  * the next candidate bucket is a double-precision scaled jump. All
  * arithmetic is exact IEEE 754 / two's-complement — identical on every
  * JVM (strict FP since JDK 17) and across partitionings, so outputs are
  * deterministic; there is no SQL spelling of the loop, hence the q136
  * query is rows-only, pinned by a reference-implementation ScalaCheck
  * spec and the defining moved-keys-land-in-the-new-bucket property.
  *
  * Codegen via a static helper call (the WinnowFingerprints pattern):
  * one virtual-free invocation per row inside whole-stage codegen.
  */
case class JumpConsistentHash(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)

  override def nullSafeEval(k: Any, n: Any): Any =
    JumpConsistentHash.jump(k.asInstanceOf[Long], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, n) =>
      s"${ev.value} = graft.functions.JumpConsistentHash.jump($k, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JumpConsistentHash =
    copy(left = newLeft, right = newRight)
}

object JumpConsistentHash {

  /** The Lamping–Veach loop. Buckets must be positive. */
  def jump(key: Long, buckets: Int): Int = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    var k = key
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      k = k * 2862933555777941757L + 1L
      j = ((b + 1) * (2147483648.0 / (((k >>> 33) + 1).toDouble))).toLong
    }
    b.toInt
  }

  /** Column API: consistent bucket of a long key among n buckets. */
  def jump_hash(key: Column, buckets: Int): Column = {
    import org.apache.spark.sql.functions.lit
    exprToColumn(JumpConsistentHash(colToExpr(key), colToExpr(lit(buckets))))
  }
}

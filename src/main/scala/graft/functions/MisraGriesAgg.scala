package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as one mergeable custom aggregate.
  *
  * Buffer: at most k (key → undercount estimate) entries. Update is the
  * classic counter scheme — increment a tracked key, admit an untracked
  * key while capacity remains, otherwise decrement EVERY counter and drop
  * zeros (amortized O(1): each decrement round removes k+1 units of total
  * mass, so there are at most n/(k+1) rounds over n updates). Merge (the
  * partial/final path Spark shuffles through) adds the two summaries and,
  * if over capacity, subtracts the (k+1)-st largest count from all
  * entries — the Agarwal et al. mergeable-summaries reduction, which
  * preserves the bound `true − n/(k+1) ≤ estimate ≤ true`.
  *
  * That bound is the load-bearing guarantee: every key with true
  * frequency > n/(k+1) has a positive estimate and is therefore IN the
  * summary. A caller that exact-confirms the summary's candidates with a
  * second aggregation (the q103 shape) gets exactly the keys above its
  * threshold — the sketch bounds candidate volume, the confirm pass kills
  * sketch error, and neither pass ever materializes the full key
  * distribution on one node.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  // update() reads the child as UTF8String — reject non-string at analysis.
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may point into a reused row buffer — copy via toString
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all round: every counter −1, drop exhausted keys
          val dead = mutable.Buffer[String]()
          buf.foreach { case (kk, c) => if (c == 1L) dead += kk else buf.update(kk, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (kk, c) => b1.update(kk, b1.getOrElse(kk, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-st largest count from everything, keep positives
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.Buffer[String]()
      b1.foreach { case (kk, c) => if (c <= cut) dead += kk else b1.update(kk, c - cut) }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(e => e._2: Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val keys = buf.toArray
    val keyBytes = keys.map { case (kk, c) => (kk.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + keyBytes.map(_._1.length + 12).sum)
    bb.putInt(keyBytes.length)
    keyBytes.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column API: map<key, estimate> summary of at most k heavy candidates. */
  def misra_gries(key: Column, k: Int = 4096): Column =
    exprToColumn(MisraGriesAgg(colToExpr(key), k).toAggregateExpression())
}

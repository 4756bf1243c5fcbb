package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn}
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's OWN bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — implemented in
  * Catalyst for runtime shuffle-join filtering but not exposed in the
  * public function registry. Surfacing them (here and as SQL functions
  * via [[GraftExtensions]]) gives the library the explicit build-once /
  * probe-everywhere membership sketch that semi-join reduction at 100 TB
  * needs: build one compact bitset over the small side's join keys, ship
  * it as a plan literal, and drop non-matching rows in a narrow codegen
  * filter BEFORE they reach the shuffle.
  */
object BloomMembership {

  /** Aggregate a bloom filter (binary) over a LONG item-hash column —
    * feed it `xxhash64(key)`. Mergeable partial buffers: builds map-side
    * like any sketch.
    */
  def bloom_filter_agg(itemHash: Column, nItems: Long, nBits: Long): Column =
    exprToColumn(new BloomFilterAggregate(colToExpr(itemHash),
      Literal(nItems), Literal(nBits)).toAggregateExpression())

  /** Probe a DRIVER-MATERIALIZED bloom filter (shipped as a plan literal,
    * like the k-means centroids) — no false negatives, bounded false
    * positives; follow with an exact join for exact semantics.
    */
  def might_contain(bloom: Array[Byte], itemHash: Column): Column =
    exprToColumn(BloomFilterMightContain(Literal(bloom, BinaryType),
      colToExpr(itemHash)))
}

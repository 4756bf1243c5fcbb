package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 catalog FUNCTIONS — the function half of the connector surface the
  * q163/q185 stack proves for tables. A `FunctionCatalog` lets a data
  * source ship its own compute vocabulary (`SELECT graft.ns.poly_mix(id,
  * 97)`) resolved through the same identifier chain as its tables — how
  * engine-adjacent formats (Iceberg's bucket/truncate transforms) expose
  * partition functions to queries.
  *
  * Two deliberate flavors:
  *   - [[PolyMix]], a [[ScalarFunction]] with BOTH execution paths Spark
  *     probes for: the MAGIC METHOD (`invoke(Long, Int)` — resolved by
  *     reflection at analysis time and compiled to a codegen-friendly
  *     `Invoke` call, no InternalRow boxing per row) and the
  *     `produceResult(InternalRow)` fallback. The magic path is the one
  *     that matters at 100 TB: the call inlines into whole-stage codegen
  *     like a built-in; the fallback exists so the function still runs if
  *     resolution ever declines the magic method (PlanSpec locks which
  *     path the analyzer actually picked).
  *   - [[LSum]], an [[AggregateFunction]] (long sum) — partial states
  *     `update`d per partition and `merge`d across them, i.e. the V2 spell
  *     for a map-side-combining distributed aggregate.
  *
  * Both are pure integer arithmetic, so the whole resolution + execution
  * chain is DuckDB-hash-checkable (q189).
  */
object PolyMix extends UnboundFunction {
  override def name(): String = "poly_mix"
  override def description(): String =
    "poly_mix(id BIGINT, m INT) -> BIGINT: (id * 31 + 7) % m"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"poly_mix takes (BIGINT, INT), got ${inputType.simpleString}")
    new PolyMixBound
  }
}

class PolyMixBound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType, IntegerType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  override def name(): String = "poly_mix"
  override def canonicalName(): String = "graft.poly_mix"

  /** Magic method (ScalarFunction.MAGIC_METHOD_NAME): analysis finds this
    * signature by reflection and plans an `Invoke` on it — primitive args,
    * no row boxing, codegen-inlined.
    */
  def invoke(id: Long, m: Int): Long = (id * 31L + 7L) % m

  override def produceResult(input: InternalRow): java.lang.Long =
    (input.getLong(0) * 31L + 7L) % input.getInt(1)
}

object LSum extends UnboundFunction {
  override def name(): String = "lsum"
  override def description(): String =
    "lsum(v BIGINT) -> BIGINT: distributed long sum (V2 AggregateFunction)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"lsum takes (BIGINT), got ${inputType.simpleString}")
    new LSumBound
  }
}

class LSumBound extends AggregateFunction[java.lang.Long, java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "lsum"
  override def canonicalName(): String = "graft.lsum"
  override def newAggregationState(): java.lang.Long = 0L
  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state else state + input.getLong(0)
  override def merge(s1: java.lang.Long, s2: java.lang.Long): java.lang.Long =
    s1 + s2
  override def produceResult(state: java.lang.Long): java.lang.Long = state
}

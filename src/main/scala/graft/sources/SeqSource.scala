package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 READ connector — the "extend Spark with a new
  * source" surface none of the built-in-format queries (q87/q88/q125)
  * exercise: TableProvider → Table → ScanBuilder → Scan/Batch →
  * InputPartition → PartitionReader, with BOTH V2 pushdowns implemented
  * for real:
  *
  *   - `SupportsPushDownFilters`: range predicates on `id` FOLD INTO THE
  *     SOURCE — the scan serves only [lo, hi), so a filtered query never
  *     materializes a row it won't keep (the difference between "filter
  *     after scan" and "don't read it at all", which at 100 TB is the
  *     difference between a full scan and an index seek). Unsupported
  *     filters are returned as residuals for Spark to re-apply.
  *   - `SupportsPushDownRequiredColumns`: the reader emits exactly the
  *     pruned schema — project (h, v) and the `id` column is never built.
  *
  * The scan's `description()` prints the served range, the emitted
  * columns, and the pushed filters, so PlanSpec locks pushdown on the
  * EXECUTED plan text — if Catalyst ever stops delivering the predicates,
  * the lock fails loudly rather than the scan silently widening.
  *
  * The table itself is a deterministic pure function of the row id
  * (md5 hex + a Knuth multiplicative mix), so DuckDB reconstructs the
  * whole relation from range() and the q163 oracle hash-checks results
  * served THROUGH the connector. Partitioning: the (narrowed) range is
  * ceil-sliced into `slices` independent InputPartitions — the same
  * static-slice contract as the reference's file assignment
  * (actuarial-reserve-modelling main.rs:23-33), expressed as a V2 Batch.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("columnar", "true").toBoolean,
      properties.getOrDefault("rowsPerBatch", "1000").toLong,
      properties.getOrDefault("streamTag", "").toString)
}

object SeqSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("h", StringType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** md5 hex of the decimal id — DuckDB twin: md5(CAST(id AS VARCHAR)). */
  def hOf(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Knuth multiplicative mix mod a prime — exact int64 in both engines. */
  def vOf(id: Long): Long = (id * 2654435761L) % 1000003L

  /** The source-owned deterministic sample rule (q247): keep `id` when
    * its (id, seed) hash bucket (permille) falls in [lower, upper) — the
    * integer arithmetic is engine-exact in DuckDB (`(id * 2654435761 +
    * seed) % 1000`, double-mod for sign), so a pushed TABLESAMPLE is
    * hash-checkable instead of Bernoulli-random.
    */
  def sampleKeep(id: Long, lower: Double, upper: Double, seed: Long): Boolean = {
    val b = (((id * 2654435761L + seed) % 1000L) + 1000L) % 1000L
    b >= math.round(lower * 1000).toLong && b < math.round(upper * 1000).toLong
  }
}

class SeqTable(rows: Long, slices: Int, columnar: Boolean,
    rowsPerBatch: Long = 1000L, streamTag: String = "")
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices, columnar, rowsPerBatch, streamTag)

  // ---- q193: METADATA columns — provenance the source knows and the
  // data rows don't carry. `_slice` (which ceil-slice partition served
  // the row — the connector twin of `_metadata.file_name` on file
  // sources) and `_pos` (row position within its slice). Hidden from
  // SELECT * by contract; they materialize only when a query names them,
  // and then flow through the SAME pruned-schema path as data columns —
  // so requesting provenance never disables filter pushdown or the
  // columnar read path (PlanSpec locks this). Values are a pure function
  // of (range, slices), keeping every provenance query DuckDB-checkable.
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_slice"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
      override def comment(): String =
        "zero-based index of the ceil-slice partition that served the row"
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_pos"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row position within its slice"
    })
}

class SeqScanBuilder(rows: Long, slices: Int, columnar: Boolean,
    rowsPerBatch: Long = 1000L, streamTag: String = "") extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownOffset
    with org.apache.spark.sql.connector.read.SupportsPushDownTableSample
    with org.apache.spark.sql.connector.read.SupportsPushDownJoin {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = SeqSource.fullSchema
  private var aggPushed: Option[Seq[String]] = None
  private var offsetPushed: Option[Int] = None
  private var samplePushed: Option[(Double, Double, Long)] = None

  /** Aggregate pushdown: COUNT(*)/MIN(id)/MAX(id) over the (already
    * filter-narrowed) range are CLOSED-FORM in this source — count =
    * hi-lo, min = lo, max = hi-1 per slice — so a pushed aggregate scan
    * emits one tiny pre-aggregated row per slice and NEVER materializes
    * the data rows (the V2 contract production parquet/JDBC connectors
    * implement; Spark plans the final merge — SUM of partial counts,
    * MIN of mins, MAX of maxes — on top). Anything else (ungrouped v
    * sums, group-bys) is declined and Spark falls back to the row scan.
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames().sameElements(Array("id"))
        case _ => false
      }
    if (agg.groupByExpressions().nonEmpty) return false
    if (samplePushed.isDefined) return false // closed forms assume the dense range
    val names = agg.aggregateExpressions().map {
      case _: CountStar => "count"
      case m: Min if isId(m.column()) => "min_id"
      case m: Max if isId(m.column()) => "max_id"
      case _ => return false
    }
    aggPushed = Some(names.toSeq)
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case GreaterThanOrEqual("id", _: Number) => true
      case GreaterThan("id", _: Number) => true
      case LessThan("id", _: Number) => true
      case LessThanOrEqual("id", _: Number) => true
      case EqualTo("id", _: Number) => true
      case _ => false
    }
    supported.foreach {
      case GreaterThanOrEqual(_, v: Number) => lo = math.max(lo, v.longValue)
      case GreaterThan(_, v: Number) => lo = math.max(lo, v.longValue + 1)
      case LessThan(_, v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual(_, v: Number) => hi = math.min(hi, v.longValue + 1)
      case EqualTo(_, v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT / ORDER BY id LIMIT n pushdown: the source serves ids in
    * ascending order across and within slices, so the first n rows ARE
    * [lo, lo+n) — both pushdowns collapse to narrowing `hi`, and no data
    * row beyond the limit is ever built. `isPartiallyPushed` stays true
    * (the default) so Spark re-applies its own (now n-row) sort/limit —
    * correctness never rests on the source's ordering claim.
    */
  private var limitPushed: Option[Int] = None

  // both limit traits carry a default isPartiallyPushed — Scala requires
  // an explicit override to disambiguate; true = Spark re-applies its own
  // sort/limit over the pushed prefix
  override def isPartiallyPushed(): Boolean = true

  override def pushLimit(n: Int): Boolean = {
    if (samplePushed.isDefined) return false // "first n" of a sampled stream ≠ [lo, lo+n)
    hi = math.min(hi, lo + n)
    limitPushed = Some(n)
    true
  }

  /** OFFSET pushdown (q246): the source serves ids ascending, so skipping
    * the first k rows IS advancing `lo` by k — push calls are applied in
    * the engine's own order, which makes both `limit.offset` (limit
    * first: window [lo+k, lo+n)) and `offset.limit` / ORDER BY…LIMIT n
    * OFFSET k (topN(n+k) then offset: [lo+k, lo+n+k)) land on exactly the
    * rows the un-pushed plan would produce. Unlike limit, offset push is
    * all-or-nothing — a `true` removes the engine's own Offset node — so
    * the skip must be exact, and it is declined entirely under a pushed
    * sample.
    */
  override def pushOffset(k: Int): Boolean = {
    if (samplePushed.isDefined) return false
    lo = math.min(lo + math.max(k, 0), hi)
    offsetPushed = Some(k)
    true
  }

  /** TABLESAMPLE pushdown (q247): once pushed, the SOURCE owns sample
    * semantics (the JDBC `TABLESAMPLE` contract) — this source's sample
    * is a DETERMINISTIC hash rule over (id, seed) (see
    * [[SeqSource.sampleKeep]]), so the result is reproducible and
    * oracle-checkable instead of Bernoulli-random. Declined with
    * replacement, or when a limit/offset/aggregate already narrowed the
    * scan (their closed forms assume the dense id range); conversely
    * limit/offset/agg decline after a sample is pushed.
    */
  override def pushTableSample(lower: Double, upper: Double,
      withReplacement: Boolean, seed: Long): Boolean = {
    if (withReplacement || limitPushed.isDefined || offsetPushed.isDefined ||
      aggPushed.isDefined) return false
    samplePushed = Some((lower, upper, seed))
    true
  }

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    val idAsc = orders match {
      case Array(so) => (so.expression() match {
        case nr: NamedReference => nr.fieldNames().sameElements(Array("id"))
        case _ => false
      }) && so.direction() == SortDirection.ASCENDING
      case _ => false
    }
    if (!idAsc) return false
    if (samplePushed.isDefined) return false
    hi = math.min(hi, lo + n)
    limitPushed = Some(n)
    true
  }

  // ---- q248: JOIN pushdown — the join collapses into the scan -------------
  // Spark 4.1's `SupportsPushDownJoin` (conf
  // spark.sql.optimizer.datasourceV2JoinPushdown): when BOTH sides of an
  // equi-join are this source, the engine offers the join to the left
  // builder and, on acceptance, deletes the join node AND the right
  // relation — one scan serves the joined schema. For this source the
  // acceptance rule is exact: an INNER join on `id = id` between two
  // plain range scans is the range INTERSECTION, and every output column
  // (either side's) is the same closed form of the shared id — so the
  // "join" costs nothing at all. Calling convention (probed): aliases
  // arrive only on name collisions (right `id` → `id_1`), the condition
  // is a V2 `=` Predicate over FieldReferences in OUTPUT (aliased)
  // names. Anything beyond that exact shape — outer joins, non-id keys,
  // metadata columns, a side already narrowed by sample/limit/offset/agg
  // or already joined — is declined and the engine keeps its own join.
  private var joinedCols: Option[Seq[(String, String)]] = None // out name -> base col

  private def plainRange: Boolean =
    samplePushed.isEmpty && limitPushed.isEmpty && offsetPushed.isEmpty &&
      aggPushed.isEmpty && joinedCols.isEmpty

  override def isOtherSideCompatibleForJoin(
      other: org.apache.spark.sql.connector.read.SupportsPushDownJoin): Boolean =
    other match {
      case o: SeqScanBuilder => plainRange && o.plainRange
      case _ => false
    }

  override def pushDownJoin(
      other: org.apache.spark.sql.connector.read.SupportsPushDownJoin,
      joinType: org.apache.spark.sql.connector.join.JoinType,
      leftCols: Array[org.apache.spark.sql.connector.read.SupportsPushDownJoin.ColumnWithAlias],
      rightCols: Array[org.apache.spark.sql.connector.read.SupportsPushDownJoin.ColumnWithAlias],
      condition: org.apache.spark.sql.connector.expressions.filter.Predicate): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (joinType != org.apache.spark.sql.connector.join.JoinType.INNER_JOIN)
      return false
    val o = other match {
      case sb: SeqScanBuilder if isOtherSideCompatibleForJoin(sb) => sb
      case _ => return false
    }
    def out(cs: Array[org.apache.spark.sql.connector.read.SupportsPushDownJoin.ColumnWithAlias]) =
      cs.map(c => (Option(c.alias()).getOrElse(c.colName()), c.colName())).toSeq
    val leftOut = out(leftCols)
    val rightOut = out(rightCols)
    val closedForm = Set("id", "h", "v")
    if (!(leftOut ++ rightOut).forall { case (_, base) => closedForm(base) })
      return false
    // the condition must be exactly the shared-id equality, one ref per side
    def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames().length == 1 => Some(nr.fieldNames()(0))
        case _ => None
      }
    val ok = condition.name() == "=" && (condition.children() match {
      case Array(a, b) =>
        (refName(a), refName(b)) match {
          case (Some(n1), Some(n2)) =>
            val l = leftOut.toMap
            val r = rightOut.toMap
            (l.get(n1).contains("id") && r.get(n2).contains("id")) ||
              (r.get(n1).contains("id") && l.get(n2).contains("id"))
          case _ => false
        }
      case _ => false
    })
    if (!ok) return false
    lo = math.max(lo, o.lo)
    hi = math.min(hi, o.hi)
    pushed = pushed ++ o.pushed
    joinedCols = Some(leftOut ++ rightOut)
    required = StructType((leftOut ++ rightOut).map { case (name, base) =>
      StructField(name, SeqSource.fullSchema(SeqSource.fullSchema.fieldIndex(base)).dataType)
    })
    true
  }

  override def build(): Scan =
    new SeqScan(lo, hi, slices, required, pushed, columnar, aggPushed,
      limitPushed, rowsPerBatch, streamTag, offsetPushed, samplePushed,
      joinedCols.fold(Map.empty[String, String])(_.toMap))
}

class SeqScan(lo0: Long, hi0: Long, slices: Int, schema: StructType,
    pushed: Array[Filter], columnar: Boolean,
    aggPushed: Option[Seq[String]] = None,
    limitPushed: Option[Int] = None,
    rowsPerBatch: Long = 1000L,
    streamTag: String = "",
    offsetPushed: Option[Int] = None,
    samplePushed: Option[(Double, Double, Long)] = None,
    colAlias: Map[String, String] = Map.empty) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  // compile-time range, narrowed further by runtime (DPP-style) filters
  // delivered just before partition planning
  @volatile private var lo = lo0
  @volatile private var hi = hi0

  /** Exact statistics off the served range — the numbers a cost-based
    * planner needs to size joins (a small narrowed scan becomes a
    * broadcast candidate with no ANALYZE step; locked in PlanSpec).
    * 49 bytes/row = 8 (id) + 32+overhead (md5 hex string) + 8 (v), the
    * UnsafeRow footprint of the full schema.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      // a pushed sample scales the served cardinality by its fraction
      private val frac = samplePushed.fold(1.0) { case (l, u, _) => u - l }
      private val n = (math.max(hi - lo, 0L) * frac).toLong
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(n * 49L, 1L))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
    }

  override def readSchema(): StructType = aggPushed match {
    // pre-aggregated row shape, in the pushed aggregate order
    case Some(names) => StructType(names.map(n => StructField(n, LongType)))
    case None => schema
  }
  override def description(): String =
    s"graft_seq range=[$lo0,$hi0) cols=${readSchema().fieldNames.mkString(",")} " +
      s"pushed=[${pushed.mkString("; ")}] mode=${if (columnar) "columnar" else "row"}" +
      aggPushed.map(ns => s" pushedAgg=[${ns.mkString(",")}]").getOrElse("") +
      limitPushed.map(n => s" pushedLimit=$n").getOrElse("") +
      offsetPushed.map(k => s" pushedOffset=$k").getOrElse("") +
      samplePushed.map { case (l, u, s) => s" pushedSample=[$l,$u)@$s" }.getOrElse("") +
      (if (colAlias.nonEmpty)
        s" pushedJoin=[${colAlias.toSeq.sorted.map { case (o, b) => s"$o:$b" }.mkString(",")}]"
      else "")
  override def toBatch: Batch = this

  /** The MICRO-BATCH half of the same scan — offsets are absolute row ids
    * over the (pushdown-narrowed) [lo, hi) range, so a filtered stream
    * reads exactly what the filtered batch scan would, just sliced into
    * admission-controlled increments. See [[SeqMicroBatchStream]].
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeqMicroBatchStream(lo0, hi0, slices, schema, rowsPerBatch, streamTag)

  /** Runtime (DPP-style) filtering — the V2 twin of q180's directory
    * pruning: when `id` is a join key against a broadcastable filtered
    * dim, Spark delivers the dim's key set as an IN predicate AFTER the
    * build side executes, and the scan narrows its served range to the
    * values' envelope BEFORE planning partitions. Envelope (not exact
    * membership) narrowing is deliberate: a range source can skip bytes
    * only by range, and the join itself drops the rest — the same
    * contract as a min/max-zone-map skip. Non-IN predicates are ignored
    * (filtering here is best-effort by API contract).
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN") {
        // guarded flatMap, not a nested match: a non-Number IN literal
        // (string/decimal key in some future query) must be SKIPPED per
        // the best-effort contract above, not crash planning
        val values: Array[Long] = p.children().flatMap {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            Some(l.value().asInstanceOf[Number].longValue())
          case _ => None
        }
        if (values.nonEmpty) {
          lo = math.max(lo, values.min)
          hi = math.min(hi, values.max + 1)
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    val k = math.max(slices, 1)
    val per = (n + k - 1) / k // ceil-slice, the reference's assignment rule
    (0 until k).flatMap { i =>
      val s0 = lo + i * per
      val e0 = math.min(s0 + per, hi)
      if (s0 < e0) Some(SeqPartition(s0, e0, i)) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = aggPushed match {
    case Some(names) => new SeqAggReaderFactory(names)
    // a sampled scan serves through the row reader (the columnar writer
    // assumes the dense id range fills each batch)
    case None => new SeqReaderFactory(schema, columnar && samplePushed.isEmpty,
      samplePushed, colAlias)
  }
}

/** One closed-form pre-aggregated row per slice — O(1) work regardless of
  * the range width; Spark's final merge turns the partials into the exact
  * global aggregate.
  */
class SeqAggReaderFactory(names: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = { val r = !served; served = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(names.map {
        case "count" => sp.end - sp.start
        case "min_id" => sp.start
        case "max_id" => sp.end - 1
      })
      override def close(): Unit = ()
    }
  }
}

case class SeqPartition(start: Long, end: Long, index: Int = -1)
    extends InputPartition

/** Row AND columnar readers over the same sliced partitions. The columnar
  * path (the default) hands Spark whole [[ColumnarBatch]]es of
  * `OnHeapColumnVector`s — the scan then enters the query as a vectorized
  * input (`ColumnarToRow` in the plan, locked in PlanSpec), the same
  * execution shape as the built-in parquet reader: per-batch virtual calls
  * instead of per-row, and the generated `ColumnarToRow` loop reads
  * vectors positionally. Row mode stays available (`columnar=false`) as
  * the semantics twin — OperatorSpec pins both paths to identical results.
  */
class SeqReaderFactory(schema: StructType, columnar: Boolean,
    sample: Option[(Double, Double, Long)] = None,
    colAlias: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  // a pushed join serves output (possibly aliased) names whose VALUES are
  // the base closed forms of the shared id — resolve through the alias map
  private def base(name: String): String = colAlias.getOrElse(name, name)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    val fields = schema.fieldNames.map(base)
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      override def next(): Boolean = {
        cur += 1
        sample.foreach { case (l, u, seed) =>
          while (cur < sp.end && !SeqSource.sampleKeep(cur, l, u, seed)) cur += 1
        }
        cur < sp.end
      }
      override def get(): InternalRow = InternalRow.fromSeq(
        fields.toSeq.map {
          case "id" => cur
          case "h" => UTF8String.fromString(SeqSource.hOf(cur))
          case "v" => SeqSource.vOf(cur)
          case "_slice" => sp.index
          case "_pos" => cur - sp.start
        })
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val sp = p.asInstanceOf[SeqPartition]
    val fields = schema.fieldNames.map(base)
    val batchSize = 4096
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var cur = sp.start
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _

      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (cur >= sp.end) return false
        val n = math.min(batchSize.toLong, sp.end - cur).toInt
        val vecs = org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
          .allocateColumns(n, schema)
        var i = 0
        while (i < n) {
          val id = cur + i
          var c = 0
          while (c < fields.length) {
            fields(c) match {
              case "id" => vecs(c).putLong(i, id)
              case "h" =>
                val b = SeqSource.hOf(id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
                vecs(c).putByteArray(i, b, 0, b.length)
              case "v" => vecs(c).putLong(i, SeqSource.vOf(id))
              case "_slice" => vecs(c).putInt(i, sp.index)
              case "_pos" => vecs(c).putLong(i, id - sp.start)
            }
            c += 1
          }
          i += 1
        }
        cur += n
        batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
          vecs.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]], n)
        true
      }
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }
}

// ---------------------------------------------------------------------------
// Streaming (micro-batch) half of the connector — SURVEY §2.1/§2.7's "extend
// Spark with a new STREAMING source" cell, the generalization of the
// reference's event-driven gather trigger (stack.py:386-391: "new input
// arrived → process exactly that increment") into a real incremental source.
// ---------------------------------------------------------------------------

/** Offset = the absolute row id the stream has read UP TO (exclusive).
  * Serialized as the bare decimal so a checkpoint restart reconstructs it
  * with a parse, no codec.
  */
case class SeqOffset(off: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = off.toString
}

/** Per-stream observability for specs: each `commit(end)` appends the
  * committed offset under the stream's `streamTag`, so a test can assert
  * the offset PROGRESSION (monotone, stride ≤ rowsPerBatch, lands exactly
  * on `hi`) — not just the final result. Keyed registry, not a global,
  * so concurrent suites don't cross-talk.
  */
object SeqStreamRegistry {
  private val committed =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[Long]]()
  private val planned =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[Long]]()
  private def append(m: java.util.concurrent.ConcurrentHashMap[String, Vector[Long]],
      tag: String, off: Long): Unit =
    if (tag.nonEmpty)
      m.compute(tag, (_, v) => (if (v == null) Vector.empty else v) :+ off)
  def record(tag: String, off: Long): Unit = append(committed, tag, off)
  // the engine calls planInputPartitions several times per batch (plan
  // construction + per-stage re-planning, all with the same [start, end))
  // — collapse consecutive repeats so the progression reads one end per batch
  def recordPlanned(tag: String, off: Long): Unit =
    if (tag.nonEmpty)
      planned.compute(tag, (_, v) => {
        val cur = if (v == null) Vector.empty else v
        if (cur.lastOption.contains(off)) cur else cur :+ off
      })
  def committedOffsets(tag: String): Vector[Long] =
    committed.getOrDefault(tag, Vector.empty)
  def plannedOffsets(tag: String): Vector[Long] =
    planned.getOrDefault(tag, Vector.empty)
  def clear(tag: String): Unit = { committed.remove(tag); planned.remove(tag) }
}

/** MicroBatchStream over the deterministic seq relation:
  *
  *   - `initialOffset` = `lo` (the pushdown-narrowed range start);
  *   - ADMISSION CONTROL (`SupportsAdmissionControl`): `latestOffset(start,
  *     limit)` advances by at most `rowsPerBatch` rows per micro-batch —
  *     the V2 contract behind `maxOffsetsPerTrigger`-style throttling; a
  *     100 TB backlog is drained in bounded, checkpointable increments
  *     instead of one unbounded batch;
  *   - `Trigger.AvailableNow` (`SupportsTriggerAvailableNow`): the target
  *     is pinned at prepare time, the stream drains to it across as many
  *     admission-sized batches as needed, then terminates — run-to-
  *     completion semantics with rate-limit economics;
  *   - `planInputPartitions(start, end)` ceil-slices the batch's [start,
  *     end) range into `slices` independent partitions — the same
  *     assignment rule as the batch scan, per increment;
  *   - `commit(end)` is the engine's "this batch is durably processed"
  *     callback — recorded per-stream so specs assert the progression.
  *
  * Readers are the row-mode [[SeqReaderFactory]] — identical row
  * construction to the batch path, which is what makes "AvailableNow
  * result ≡ batch read of the same range" a meaningful equivalence (q184's
  * oracle) rather than two codepaths that happen to agree.
  */
class SeqMicroBatchStream(lo: Long, hi: Long, slices: Int, schema: StructType,
    rowsPerBatch: Long, streamTag: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  // AvailableNow pins the drain target before the first batch; a plain
  // ProcessingTime stream just sees "everything" available immediately
  @volatile private var target: Long = hi

  override def prepareForTriggerAvailableNow(): Unit = { target = hi }

  override def initialOffset(): Offset = SeqOffset(lo)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(math.max(rowsPerBatch, 1L))

  // the no-limit overload must still respect admission: MicroBatchStream
  // requires it, but with SupportsAdmissionControl the engine calls the
  // 2-arg form; this one reports the full backlog end
  override def latestOffset(): Offset = SeqOffset(target)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].off
    val step = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _ => math.max(rowsPerBatch, 1L)
    }
    SeqOffset(math.min(s + math.max(step, 1L), target))
  }

  override def reportLatestOffset(): Offset = SeqOffset(target)

  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].off
    val e = end.asInstanceOf[SeqOffset].off
    SeqStreamRegistry.recordPlanned(streamTag, e)
    val n = math.max(e - s, 0L)
    val k = math.max(slices, 1)
    val per = (n + k - 1) / math.max(k, 1)
    if (n == 0L) Array.empty
    else (0 until k).flatMap { i =>
      val s0 = s + i * per
      val e0 = math.min(s0 + per, e)
      if (s0 < e0) Some(SeqPartition(s0, e0)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(schema, columnar = false)

  // the engine delivers a batch's source-commit when the NEXT batch
  // starts, so under AvailableNow the final batch's commit never arrives
  // (observed: n batches → n−1 commits) — specs assert the committed
  // prefix against the PLANNED progression, which does land on the target
  override def commit(end: Offset): Unit =
    SeqStreamRegistry.record(streamTag, end.asInstanceOf[SeqOffset].off)

  override def stop(): Unit = ()
}

package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StructField, StructType, VariantType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.VariantVal

/** A VARIANT-native source (q249): rows are (id, j VARIANT) where `j` is
  * the semi-structured document `{"a": id, "b": "<md5 prefix>",
  * "c": {"d": <v>}}` — every leaf a closed form of id, so extractions
  * are oracle-checkable. The interesting half is
  * `SupportsPushDownVariantExtractions` (Spark 4.1 variant shredding for
  * connectors, conf `spark.sql.variant.pushVariantIntoScan`): the engine
  * collects the `variant_get` paths a query needs and offers them to the
  * builder; accepted paths turn the variant COLUMN into a STRUCT of
  * pre-extracted typed fields served directly by the source — the
  * columnar-shredding contract that lets a 100 TB semi-structured corpus
  * be read without materializing or re-parsing a single variant binary.
  */
class VariantSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VariantSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new VariantTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object VariantSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("j", VariantType, nullable = false)))

  def jsonOf(id: Long): String =
    s"""{"a": $id, "b": "${SeqSource.hOf(id).take(8)}", "c": {"d": ${SeqSource.vOf(id)}}}"""

  def variantOf(id: Long): VariantVal = {
    val v = org.apache.spark.types.variant.VariantBuilder.parseJson(
      jsonOf(id), false)
    new VariantVal(v.getValue, v.getMetadata)
  }

  /** Closed-form leaf values by path — the shredding server and the
    * tests share one definition.
    */
  def leafOf(id: Long, path: String): Any = path match {
    case "$.a" => id
    case "$.b" => org.apache.spark.unsafe.types.UTF8String.fromString(
      SeqSource.hOf(id).take(8))
    case "$.c.d" => SeqSource.vOf(id)
    case p => throw new IllegalArgumentException(s"no closed form for path $p")
  }
}

class VariantTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_variant($rows)"
  override def schema(): StructType = VariantSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VariantScanBuilder(rows, slices)
}

class VariantScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownVariantExtractions {

  private var accepted: Seq[org.apache.spark.sql.connector.read.VariantExtraction] = Seq.empty

  /** Accept a batch of extractions only when EVERY path has a closed
    * form here (all-or-nothing keeps the shredded struct's field list
    * equal to the offered list — the engine maps expressions to struct
    * fields by the path metadata it attached). The declined fallback
    * (`$` as whole-variant) keeps the un-shredded read path working.
    */
  override def pushVariantExtractions(
      extractions: Array[org.apache.spark.sql.connector.read.VariantExtraction]): Array[Boolean] = {
    val paths = extractions.map(VariantScanBuilder.pathOf)
    val ok = extractions.forall(e => e.columnName().sameElements(Array("j"))) &&
      paths.forall(p => p.exists(VariantScanBuilder.servable.contains))
    if (ok) accepted = extractions.toSeq
    Array.fill(extractions.length)(ok)
  }

  override def build(): Scan = new VariantScan(rows, slices, accepted)
}

object VariantScanBuilder {
  private[sources] val servable = Set("$.a", "$.b", "$.c.d")

  /** The engine identifies each extraction by a `__VARIANT_METADATA_KEY`
    * metadata entry carrying the JSON path (probed).
    */
  private[sources] def pathOf(
      e: org.apache.spark.sql.connector.read.VariantExtraction): Option[String] = {
    val m = e.metadata()
    if (m.contains("__VARIANT_METADATA_KEY")) {
      val inner = m.getMetadata("__VARIANT_METADATA_KEY")
      if (inner.contains("path")) Some(inner.getString("path")) else None
    } else None
  }
}

class VariantScan(rows: Long, slices: Int,
    accepted: Seq[org.apache.spark.sql.connector.read.VariantExtraction])
    extends Scan with Batch {
  // with accepted extractions, the variant column is served SHREDDED: a
  // struct with one typed field per extraction (offered order, the
  // engine's path metadata preserved on each field)
  override def readSchema(): StructType =
    if (accepted.isEmpty) VariantSource.fullSchema
    else StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("j", StructType(accepted.zipWithIndex.map { case (e, i) =>
        StructField(s"_$i", e.expectedDataType(), nullable = true, e.metadata())
      }), nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graft_variant rows=$rows" +
    (if (accepted.nonEmpty)
      s" shredded=[${accepted.flatMap(VariantScanBuilder.pathOf).mkString(",")}]"
    else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val k = math.max(slices, 1)
    val per = (rows + k - 1) / k
    (0 until k).flatMap { i =>
      val s0 = i * per
      val e0 = math.min(s0 + per, rows)
      if (s0 < e0) Some(SeqPartition(s0, e0, i): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VariantReaderFactory(accepted.flatMap(VariantScanBuilder.pathOf))
}

class VariantReaderFactory(paths: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      override def next(): Boolean = { cur += 1; cur < sp.end }
      override def get(): InternalRow =
        if (paths.isEmpty) InternalRow(cur, VariantSource.variantOf(cur))
        else InternalRow(cur,
          InternalRow.fromSeq(paths.map(VariantSource.leafOf(cur, _))))
      override def close(): Unit = ()
    }
  }
}

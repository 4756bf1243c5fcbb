package graft.sources

import java.util

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableFileInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file source/sink — the last mainstream format next to
  * JSON (q87), ORC (q88), and JDBC (q125). The container has no Spark
  * connector on this classpath, so the round trip is built directly on the
  * Avro core library as a DataSource V2 connector: the WRITE side is a
  * distributed `foreachPartition` (one container file per task — writer
  * parallelism is the frame's partitioning, no driver funnel), the READ
  * side is TableProvider → Table → ScanBuilder → Batch → PartitionReader
  * with one InputPartition per container file.
  *
  * What is verified (q175, hash-checked against DuckDB on the original
  * parquet):
  *   - schema INFERENCE from the container header (the writer schema
  *     travels in the file — no inference pass over data);
  *   - LOGICAL-TYPE mapping: `local-timestamp-micros` ⇄ TIMESTAMP_NTZ —
  *     Avro's micros-since-epoch long IS InternalRow's NTZ encoding, so
  *     the mapping is a zero-cost reinterpretation, pinned end-to-end by
  *     the oracle's timestamp aggregates;
  *   - COLUMN PRUNING through Avro schema resolution: the pruned Spark
  *     schema becomes an Avro READER schema (a field subset), so skipped
  *     fields are decoder-skipped (no string/byte materialization), the
  *     honest Avro analogue of parquet column pruning.
  *
  * Scale notes: containers are SPLIT by sync markers into byte-range
  * InputPartitions (`splitBytes`, default 32 MB) — the same contract as
  * parquet row-group splits: each reader `sync(start)`s to the first block
  * boundary after its range start and stops once `pastSync(end)`, so
  * blocks tile exactly once across splits and a large container fans out
  * over the cluster instead of serializing on one task (files under the
  * split size stay one partition each). File listing is a driver-side
  * directory walk — at object-store scale that becomes a manifest read
  * (q168's discipline).
  */
class AvroSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroSource.listFiles(options.get("path"))
    require(files.nonEmpty, s"AvroSource: no .avro files under ${options.get("path")}")
    AvroSource.toSparkSchema(AvroSource.writerSchema(files.head))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema,
      properties.getOrDefault("splitBytes", AvroSource.defaultSplitBytes.toString).toLong)
}

object AvroSource {

  /** Default byte-range split size — same order as a parquet row-group. */
  val defaultSplitBytes: Long = 32L * 1024 * 1024

  def listFiles(dir: String): Seq[String] = {
    val d = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(d)) return Seq.empty
    val s = java.nio.file.Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.toString).filter(_.endsWith(".avro")).toSeq.sorted
    } finally s.close()
  }

  def writerSchema(file: String): ASchema = {
    val r = new DataFileReader[GenericRecord](
      new SeekableFileInput(new java.io.File(file)),
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Avro → Spark type mapping for the supported subset (primitives +
    * the timestamp logical types). Unsupported shapes fail loudly.
    */
  def toSparkSchema(s: ASchema): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(s.getFields.asScala.map { f =>
      StructField(f.name(), toSparkType(f.schema()), nullable = false)
    }.toSeq)
  }

  private def toSparkType(s: ASchema): DataType = s.getType match {
    case ASchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
      case _: LogicalTypes.TimestampMicros => TimestampType
      case _ => LongType
    }
    case ASchema.Type.INT => s.getLogicalType match {
      case _: LogicalTypes.Date => DateType
      case _ => IntegerType
    }
    case ASchema.Type.STRING => StringType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.BYTES => BinaryType
    case t => throw new IllegalArgumentException(s"AvroSource: unsupported Avro type $t")
  }

  /** Distributed Avro write: one container file per partition of `df`,
    * written with the supplied writer schema (JSON travels to executors;
    * `ASchema` itself is not serializable-stable across Avro versions).
    * Column order must match the schema's field order.
    */
  def write(df: DataFrame, dir: String, schemaJson: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new ASchema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val f = new java.io.File(dir, f"part-$pid%05d.avro")
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, f)
        try {
          import scala.jdk.CollectionConverters._
          val fields = schema.getFields.asScala.toIndexedSeq
          rows.foreach { row =>
            val rec = new GenericData.Record(schema)
            fields.zipWithIndex.foreach { case (fld, i) =>
              rec.put(i, toAvroValue(row.get(i), fld.schema()))
            }
            w.append(rec)
          }
        } finally w.close()
      }
    }
  }

  private def toAvroValue(v: Any, s: ASchema): AnyRef = v match {
    case ldt: java.time.LocalDateTime =>
      // local-timestamp-micros: micros on the NTZ wall clock
      java.lang.Long.valueOf(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
    case ts: java.sql.Timestamp =>
      java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
    case other => other.asInstanceOf[AnyRef]
  }
}

class AvroTable(path: String, schema: StructType, splitBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, schema, splitBytes)
}

class AvroScanBuilder(path: String, full: StructType, splitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(path, required, splitBytes)
}

class AvroScan(path: String, schema: StructType, splitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft_avro path=$path cols=${schema.fieldNames.mkString(",")} " +
      s"splitBytes=$splitBytes"
  override def toBatch: Batch = this

  /** Sync-marker byte-range splits: every container larger than
    * `splitBytes` fans out into ceil(len/splitBytes) ranges; the reader's
    * sync/pastSync pair assigns each Avro block to exactly the range its
    * preceding sync marker falls in (the standard container split rule).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(splitBytes, 1L)
    AvroSource.listFiles(path).flatMap { f =>
      val len = new java.io.File(f).length()
      if (len <= per) Seq(AvroFilePartition(f, 0L, len))
      else (0L until len by per).map { s0 =>
        AvroFilePartition(f, s0, math.min(s0 + per, len))
      }
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(schema)
}

case class AvroFilePartition(file: String, start: Long, end: Long)
    extends InputPartition

class AvroReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[AvroFilePartition]
    val file = sp.file
    val writer = AvroSource.writerSchema(file)
    // Avro schema resolution does the column pruning: the reader schema
    // keeps only the required fields (writer order), and the decoder
    // SKIPS the rest without materializing them.
    val keep = schema.fieldNames.toSet
    val readerSchema = {
      import scala.jdk.CollectionConverters._
      val fields = writer.getFields.asScala.filter(f => keep(f.name())).map { f =>
        new ASchema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
      }
      ASchema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
        false, fields.toList.asJava)
    }
    val reader = new DataFileReader[GenericRecord](
      new SeekableFileInput(new java.io.File(file)),
      new GenericDatumReader[GenericRecord](null.asInstanceOf[ASchema], readerSchema))
    // position at the first block boundary inside this byte range (the
    // header itself ends with a sync marker, so start=0 lands on block 1)
    reader.sync(sp.start)
    // emit in the REQUESTED column order, not writer order
    val order = schema.fieldNames.map(n => readerSchema.getField(n).pos())
    new PartitionReader[InternalRow] {
      private var rec: GenericRecord = _
      override def next(): Boolean = {
        if (reader.hasNext && !reader.pastSync(sp.end)) {
          rec = reader.next(rec); true
        } else false
      }
      override def get(): InternalRow = InternalRow.fromSeq(
        order.toSeq.map { i =>
          rec.get(i) match {
            case u: org.apache.avro.util.Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
            case s: String => UTF8String.fromString(s)
            case bb: java.nio.ByteBuffer =>
              val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
            case other => other // Long (incl. NTZ micros), Double, Int, Boolean
          }
        })
      override def close(): Unit = reader.close()
    }
  }
}

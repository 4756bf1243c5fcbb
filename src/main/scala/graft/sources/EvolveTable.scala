package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableChange}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
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

class EvolveTable(path: String, fields: Seq[EvolveField],
    checks: Seq[EvolveCheck] = Seq.empty,
    ref: String = DigestManifest.MainRef) extends Table
    with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "graft_evolve requires a path property")
  override def name(): String =
    s"graft_evolve($path${if (ref == DigestManifest.MainRef) "" else s"@$ref"})"
  override def schema(): StructType = EvolveSchema.struct(fields)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

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

  // writes bind to the schema CURRENT AT PLAN TIME: the committed file
  // records exactly those ids, so a concurrent ALTER never reinterprets
  // an in-flight write
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new EvolveBatchWrite(path, fields, ref)
      }
    }

  // column pruning reaches the reader: an evolved table accretes columns
  // over its life, and a projection must not parse cells it never serves
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var current: Seq[EvolveField] = fields
      override def pruneColumns(requiredSchema: StructType): Unit =
        // serve EXACTLY the engine's required schema, in ITS order —
        // readSchema() must echo it verbatim
        current = requiredSchema.fieldNames.toSeq
          .flatMap(n => fields.find(_.name == n))
      override def build(): Scan = new EvolveScan(path, current, ref)
    }
}

class EvolveBatchWrite(path: String, fields: Seq[EvolveField],
    ref: String = DigestManifest.MainRef) extends BatchWrite {
  private val jobTag: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new EvolveWriterFactory(path, fields, jobTag)

  // manifest entries carry the writing schema's field-id list —
  // `file,rows,id;id;id` — the per-file evolution metadata readers
  // resolve against (same role as parquet footers under mergeSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.collect { case m: DigestCommitMessage => m.files }.flatten
    val old: Seq[String] =
      DigestManifest.listingFor(path, DigestManifest.mName(ref))
    val ids = fields.map(_.id).mkString(";")
    DigestManifest.publish(path,
      old ++ fresh.map(f => s"${f.fileName},${f.rows},$ids").sorted, ref)
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

class EvolveWriterFactory(path: String, fields: Seq[EvolveField], jobTag: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new EvolveDataWriter(path, fields, jobTag, partitionId, taskId)
}

/** Same staged-attempt/rename-on-commit protocol as [[DigestDataWriter]];
  * serialization is positional over the WRITE-TIME schema, `\N` for null
  * (the table stays append-only text so evolution stays file-inspectable).
  */
class EvolveDataWriter(path: String, fields: Seq[EvolveField], jobTag: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val staged =
    Paths.get(path, f"ev-j$jobTag-part-$partitionId%05d-attempt-$taskId.staged")
  Files.createDirectories(staged.getParent)
  private val out = Files.newBufferedWriter(staged, StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(r: InternalRow): Unit = {
    val cells = fields.indices.map { i =>
      if (r.isNullAt(i)) "\\N"
      else fields(i).dataType match {
        case LongType => r.getLong(i).toString
        case DoubleType => r.getDouble(i).toString
        case StringType =>
          val v = r.getUTF8String(i).toString
          require(!v.exists(c => c == ',' || c == '\n'),
            s"graft_evolve: string cell contains a delimiter: '$v'")
          // a REAL value equal to the null sentinel would silently
          // round-trip back as NULL through EvolveFileReader — refuse it
          // the same way the delimiter guard does
          require(v != "\\N",
            "graft_evolve: string cell equals the null sentinel \\N")
          v
      }
    }
    out.write(cells.mkString(",")); out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val fin = Paths.get(path, f"ev-j$jobTag-part-$partitionId%05d.csv")
    Files.move(staged, fin, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    DigestCommitMessage(Seq(CommittedFile(fin.getFileName.toString, rows)))
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(staged) }
  override def close(): Unit = ()
}

/** One partition per committed file; each resolves the CURRENT schema
  * against the file's recorded id list — position of each current id in
  * the file, or NULL where the file predates the column.
  */
case class EvolveFilePartition(path: String, file: String,
    fileIds: Seq[Int]) extends InputPartition

class EvolveScan(path: String, fields: Seq[EvolveField],
    ref: String = DigestManifest.MainRef) extends Scan with Batch {
  override def readSchema(): StructType = EvolveSchema.struct(fields)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_evolve manifest-read $path@$ref"

  override def planInputPartitions(): Array[InputPartition] = {
    DigestManifest.listingFor(path, DigestManifest.mName(ref)).map { line =>
      val a = line.split(",")
      EvolveFilePartition(path, a(0),
        a(2).split(";").filter(_.nonEmpty).map(_.toInt).toSeq): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fs = fields
    (p: InputPartition) => new EvolveFileReader(p.asInstanceOf[EvolveFilePartition], fs)
  }
}

class EvolveFileReader(p: EvolveFilePartition, fields: Seq[EvolveField])
    extends PartitionReader[InternalRow] {
  // current-schema position -> cell index in this file (-1 = predates column)
  private val slot: Array[Int] = fields.map(f => p.fileIds.indexOf(f.id)).toArray
  // the EXISTENCE default per field, pre-parsed once: what a row written
  // before the column existed serves instead of NULL (an explicit \N in a
  // file that HAS the column stays NULL — the writer recorded a real null)
  private val existsDefault: Array[Any] = fields.map { f =>
    f.default.map { t =>
      EvolveSchema.parseDefault(f.dataType, t, f.name) match {
        case s: String => UTF8String.fromString(s)
        case v => v
      }
    }.orNull
  }.toArray
  private val lines = Files.readAllLines(Paths.get(p.path, p.file)).iterator()
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      val cells = lines.next().split(",", -1)
      val vals: Array[Any] = fields.indices.map { i =>
        val j = slot(i)
        if (j < 0) existsDefault(i)
        else if (cells(j) == "\\N") null
        else fields(i).dataType match {
          case LongType => cells(j).toLong
          case DoubleType => cells(j).toDouble
          case StringType => UTF8String.fromString(cells(j))
        }
      }.toArray
      current = InternalRow(vals: _*)
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
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
    EvolveSchema.struct(fieldsOf(options))
  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new EvolveTable(opts.get("path"), fieldsOf(opts),
      ref = Option(opts.get("branch")).getOrElse(DigestManifest.MainRef))
  }
}

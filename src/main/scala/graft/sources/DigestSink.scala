package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 surface ([[SeqSource]] is the read
  * half): WriteBuilder → BatchWrite → per-partition DataWriter with the
  * full two-phase commit protocol real sinks implement —
  *
  *   - each task writes to a STAGED file named by (partition, task)
  *     attempt, so speculative or retried attempts never collide;
  *   - `DataWriter.commit()` atomically renames the staged file to its
  *     final name and returns a commit message carrying (file, rows);
  *   - `DataWriter.abort()` deletes the staged file — a failed attempt
  *     leaves NO partial output;
  *   - `BatchWrite.commit(messages)` runs once on the driver after every
  *     task committed and publishes a `_MANIFEST` listing each committed
  *     file with its row count (the job-level commit point: readers that
  *     honor the manifest never observe a torn job);
  *   - `BatchWrite.abort()` removes staged leftovers.
  *
  * Rows serialize as one CSV line per row in partition-iteration order.
  * q168 drives a deterministic frame through the sink, reads the files
  * back, and the DuckDB oracle checks the round-trip digest against the
  * source table — writer, commit protocol, and serialization all sit on
  * the hash-checked path. The task/job commit sequencing and the abort
  * cleanup contract are additionally spec-pinned directly.
  */
class DigestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DigestSink.rowSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DigestSinkTable(properties.get("path"))
}

object DigestSink {
  val rowSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("lang", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_chars", LongType, nullable = false)))
}

class DigestSinkTable(path: String) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "DigestSink requires a path option")
  override def name(): String = s"graft_digest_sink($path)"
  override def schema(): StructType = DigestSink.rowSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new DigestBatchWrite(path)
      }
    }
}

class DigestBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DigestWriterFactory(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // the job-level commit point: publish the manifest of committed files
    val lines = messages.collect { case m: DigestCommitMessage =>
      s"${m.fileName},${m.rows}"
    }.sorted
    Files.write(Paths.get(path, "_MANIFEST"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
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

case class DigestCommitMessage(fileName: String, rows: Long)
    extends WriterCommitMessage

class DigestWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DigestDataWriter(path, partitionId, taskId)
}

/** One task attempt's writer: staged file keyed by the ATTEMPT (taskId),
  * final name keyed by the PARTITION — rename-on-commit makes exactly one
  * attempt's output visible however many attempts ran.
  */
class DigestDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val staged: Path =
    Paths.get(path, f"part-$partitionId%05d-attempt-$taskId.staged")
  Files.createDirectories(staged.getParent)
  private val out = Files.newBufferedWriter(staged, StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(r: InternalRow): Unit = {
    out.write(s"${r.getLong(0)},${r.getUTF8String(1)},${r.getLong(2)}\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val fin = Paths.get(path, f"part-$partitionId%05d.csv")
    Files.move(staged, fin, StandardCopyOption.REPLACE_EXISTING)
    DigestCommitMessage(fin.getFileName.toString, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}

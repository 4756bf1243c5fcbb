package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util
import java.util.Comparator

import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType

/** ATOMIC CTAS / RTAS (q237): the staged half of `StagingTableCatalog`.
  *
  * The problem these verbs exist for: plain `createTable` + write is TWO
  * commits — a failed write leaves an empty (or worse, half-written)
  * table behind, and `REPLACE TABLE ... AS SELECT` would expose readers
  * to a window where the old data is gone and the new data hasn't landed.
  * The staged protocol makes the whole statement one visibility event:
  * the engine writes into a table object that IS NOT YET in the catalog,
  * and only `commitStagedChanges()` — called after the write job
  * committed — publishes it.
  *
  * Mechanics here: each staged statement gets a fresh self-contained
  * digest directory `<root>/_stage-<uuid>/` (own data files, own
  * manifest, written through the standard [[DigestWriteBuilder]] 2PC).
  * Commit is a REGISTRY POINTER SWAP — the table entry's `path` property
  * flips to the staged dir — so readers of a replaced table resolve the
  * old directory until the instant of the swap and the new one after it;
  * nothing is ever renamed over a file an old plan may still read (the
  * old generation's directory stays on disk, snapshot-expiry territory,
  * mirroring how metadata-pointer formats retire table generations).
  * Abort deletes the staged directory; the registry was never touched, so
  * a failed CTAS leaves NO table and a failed RTAS leaves the old table
  * byte-identical.
  */
class GraftStagedTable(catalogName: String, ident: Identifier,
    root: String, tblProps: util.Map[String, String],
    mode: GraftStagedTable.Mode) extends StagedTable with SupportsWrite {

  private val stagedDir: Path = {
    val d = Paths.get(root, s"_stage-${util.UUID.randomUUID().toString.take(8)}")
    Files.createDirectories(d)
    d
  }

  // the write lands through the standard digest machinery, scoped to the
  // staged dir: lang-split files + manifest-gated job commit
  private val inner = new DigestSinkTable(stagedDir.toString, langSplit = true)

  override def name(): String = s"graft_staged(${ident.name()})"
  override def schema(): StructType = DigestSink.rowSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // silent column drift is the bug class this guards (same check as the
    // row-level write paths): the staged table's layout is fixed, so the
    // query must present exactly (doc_id, lang, n_chars)
    val got = info.schema().fields.map(f => (f.name, f.dataType)).toSeq
    val want = DigestSink.rowSchema.fields.map(f => (f.name, f.dataType)).toSeq
    require(got == want,
      s"graft_digest staged write: query schema ${got.mkString(",")} must " +
        s"match the digest layout ${want.mkString(",")}")
    inner.newWriteBuilder(info)
  }

  override def commitStagedChanges(): Unit = {
    val key = GraftCatalog.regKey(catalogName,
      ident.namespace().toSeq :+ ident.name())
    // concurrent map — becomes the live registry value (see
    // GraftCatalog.createTable)
    val props: util.Map[String, String] =
      new java.util.concurrent.ConcurrentHashMap[String, String](tblProps)
    props.put("provider", "graft_digest")
    props.put("path", stagedDir.toString)
    props.put("stageRoot", root)
    mode match {
      case GraftStagedTable.Create =>
        val prior = GraftCatalog.tables.putIfAbsent(key, props)
        if (prior != null) {
          abortStagedChanges() // lost the race: leave no orphan stage dir
          throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
        }
      case GraftStagedTable.Replace =>
        // the pointer swap — old generation's dir stays readable for
        // already-planned readers, the registry now resolves to the new one
        val prior = GraftCatalog.tables.replace(key, props)
        if (prior == null) {
          abortStagedChanges()
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
        }
      case GraftStagedTable.CreateOrReplace =>
        GraftCatalog.tables.put(key, props)
    }
  }

  override def abortStagedChanges(): Unit =
    if (Files.exists(stagedDir))
      Files.walk(stagedDir).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
}

object GraftStagedTable {
  sealed trait Mode
  case object Create extends Mode
  case object Replace extends Mode
  case object CreateOrReplace extends Mode
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** A "media" row: opaque binary payload + typed metadata — the multimodal
  * column pattern (image/audio/video as `binary` with a typed envelope).
  */
case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

/** Decoded-media metadata produced by the (stubbed) decoder. */
case class DecodedMedia(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    channels: Int,
    format: String)

/** Multimodal-column plumbing: treat media as opaque `binary` columns with
  * typed metadata, decoded batch-wise per partition.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC FAKE (`fakeDecode`); everything around it —
  * the binary schema, the typed `Dataset` envelope, the per-partition batch
  * iteration (where a real decoder would amortize native-lib init across a
  * partition), and the downstream relational ops — is real and tested.
  * `documents.text` bytes stand in for media payloads.
  */
object Multimodal {

  /** documents → binary payload rows (UTF-8 bytes as the opaque blob). */
  def mediaRows(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        concat(lit("fake/"), col("lang")).as("media_type"))
      .as[MediaRow]
  }

  /** STUB: deterministic fake decode. A real implementation would hand the
    * byte buffer to a codec (per-partition init, batch decode); this derives
    * stable pseudo-dimensions from the payload so the full pipeline shape —
    * including schema and partition-wise batching — is exercised.
    */
  def fakeDecode(m: MediaRow): DecodedMedia = {
    val n = m.payload.length
    val first = if (n > 0) m.payload(0) & 0xff else 0
    DecodedMedia(
      doc_id = m.doc_id,
      media_type = m.media_type,
      n_bytes = n,
      width = 16 + (n % 64),
      height = 16 + (first % 64),
      channels = 3,
      format = "fake/rgb8")
  }

  // ---- q70: binary metadata extraction (oracle-checkable) -----------------
  def q70BinaryMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha"),
        expr("(length(CAST(text AS BINARY)) + 255) div 256").as("n_chunks"))
      .orderBy("doc_id")

  val q70Sql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  sha256(text) AS sha,
      |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q71: partition-batched decode stub (rows-only) ---------------------
  // mapPartitions, not map: a real decoder initializes its codec once per
  // partition and streams the batch through — this preserves that shape.
  def q71DecodeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaRows(s, dir)
      .mapPartitions { batch => batch.map(fakeDecode) }
      .toDF()
      .groupBy("media_type", "channels", "format")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_width"),
        max(col("width")).as("max_width"))
      .orderBy("media_type")
  }

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_binary_meta" -> q70BinaryMeta _,
    "q71_decode_stub" -> q71DecodeStub _,
  )

  val oracle: Map[String, String] = Map(
    "q70_binary_meta" -> q70Sql,
  )
}

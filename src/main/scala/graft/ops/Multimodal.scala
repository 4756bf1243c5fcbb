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

  // ---- q73: letterbox-resize planning (oracle-checkable) ------------------
  // The resize STAGE of an image pipeline: given source dims, compute the
  // letterboxed target geometry (scale to fit 224×224, preserve aspect,
  // pad the short side). The actual pixel resample would sit inside the
  // q71 partition-batched kernel; the geometry planning here is what the
  // engine itself owes the pipeline — pure per-row arithmetic, no
  // shuffle. Source dims derive from payload length alone (codec-less
  // container), so the whole stage is DuckDB-oracled.
  def q73ResizePlan(s: SparkSession, dir: String): DataFrame = {
    val n = length(col("text").cast("binary"))
    // Spark's `/` on ints is DOUBLE division — floor() recovers DuckDB's
    // `//` integer-division semantics (exact for these magnitudes)
    val w = (lit(16) + n % 64).cast("double")
    val h = (lit(16) + floor(n / lit(64)) % 64).cast("double")
    val scale = least(lit(224.0) / w, lit(224.0) / h)
    val outW = greatest(lit(1L), floor(w * scale))
    val outH = greatest(lit(1L), floor(h * scale))
    t(s, dir, "documents").select(
      col("doc_id"),
      w.cast("int").as("src_w"), h.cast("int").as("src_h"),
      outW.as("out_w"), outH.as("out_h"),
      ((lit(224L) - outW) / 2).cast("long").as("pad_x"),
      ((lit(224L) - outH) / 2).cast("long").as("pad_y"))
      .orderBy("doc_id")
  }

  val q73Sql: String =
    """SELECT doc_id, src_w, src_h, out_w, out_h,
      |  (224 - out_w) // 2 AS pad_x,
      |  (224 - out_h) // 2 AS pad_y
      |FROM (
      |  SELECT doc_id,
      |    CAST(16 + n % 64 AS INT) AS src_w,
      |    CAST(16 + (n // 64) % 64 AS INT) AS src_h,
      |    CAST(greatest(1, floor((16 + n % 64) * sc)) AS BIGINT) AS out_w,
      |    CAST(greatest(1, floor((16 + (n // 64) % 64) * sc)) AS BIGINT) AS out_h
      |  FROM (
      |    SELECT doc_id, octet_length(encode(text)) AS n,
      |      least(224.0 / (16 + octet_length(encode(text)) % 64),
      |            224.0 / (16 + (octet_length(encode(text)) // 64) % 64)) AS sc
      |    FROM documents) d) o
      |ORDER BY doc_id""".stripMargin

  // ---- q74: frame sampling (generator shape, oracle-checkable) ------------
  // The frame-sample STAGE of a video pipeline: 1 media row → k frame
  // rows, every 5th frame at 30 fps. The explode(sequence) generator is
  // the real engine surface (same 1→k shape as the Monte Carlo trials);
  // frame counts derive from payload length (codec-less container).
  def q74FrameSample(s: SparkSession, dir: String): DataFrame = {
    val nFrames = (floor(length(col("text").cast("binary")) / lit(1000)) + 1).cast("int")
    t(s, dir, "documents")
      .select(col("doc_id"), nFrames.as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
      .withColumn("frame_ts", round(col("frame_idx") / 30.0, 6))
      .orderBy("doc_id", "frame_idx")
  }

  val q74Sql: String =
    """SELECT doc_id, n_frames, CAST(f AS INT) AS frame_idx,
      |  round(f / 30.0, 6) AS frame_ts
      |FROM (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) // 1000 + 1 AS INT) AS n_frames
      |  FROM documents) d,
      |  unnest(generate_series(0, n_frames - 1, 5)) AS u(f)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_binary_meta" -> q70BinaryMeta _,
    "q71_decode_stub" -> q71DecodeStub _,
    "q73_resize_plan" -> q73ResizePlan _,
    "q74_frame_sample" -> q74FrameSample _,
  )

  val oracle: Map[String, String] = Map(
    "q70_binary_meta" -> q70Sql,
    "q73_resize_plan" -> q73Sql,
    "q74_frame_sample" -> q74Sql,
  )
}

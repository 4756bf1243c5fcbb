package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** A "media" row: opaque binary payload + typed metadata — the multimodal
  * column pattern (image/audio/video as `binary` with a typed envelope).
  */
case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

/** Decoded-media metadata produced by the PPM decoder. */
case class DecodedMedia(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    channels: Int,
    format: String,
    first_r: Int,
    first_g: Int,
    first_b: Int)

/** Multimodal-column plumbing: treat media as opaque `binary` columns with
  * typed metadata, decoded batch-wise per partition.
  *
  * The payloads are REAL images in a real container format — binary PPM
  * (P6), the netpbm format every codec library reads — generated
  * deterministically per document at build time (pure JVM, no codec
  * dependency), and the decode kernel is a REAL P6 parser: magic check,
  * whitespace/comment-tolerant header, dimension-validated pixel payload,
  * first-pixel extraction, loud failure on malformed bytes. Because the
  * encoded dimensions and pixels derive from table columns, the decoded
  * output is predictable in SQL and the whole encode→decode round-trip is
  * DuckDB-oracled (q71). A heavier codec (JPEG/PNG) drops into the same
  * `mapPartitions` envelope — per-partition init, batch decode.
  */
object Multimodal {

  /** Deterministic binary PPM (P6) payload for a document: dimensions and
    * pixels derive from (doc_id, n_chars), so the oracle can predict the
    * decode exactly. Header `P6\n<w> <h>\n255\n` + w·h·3 RGB bytes.
    */
  private[ops] def encodePpm(docId: Long, nChars: Long): Array[Byte] = {
    val w = 16 + (nChars % 24).toInt
    val h = 16 + (docId % 16).toInt
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      px(3 * i) = ((docId + i) % 256).toByte
      px(3 * i + 1) = ((nChars + i) % 256).toByte
      px(3 * i + 2) = ((docId + nChars + i) % 256).toByte
      i += 1
    }
    header ++ px
  }

  /** documents → binary media rows: each payload is a real P6 image,
    * encoded batch-wise per partition (the encoder twin of the decode
    * envelope).
    */
  def mediaRows(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, n) =>
        MediaRow(id, encodePpm(id, n), "image/x-portable-pixmap")
      })
  }

  /** REAL P6 parser: validates the magic, reads a whitespace/comment-
    * tolerant header, checks the payload length against the declared
    * dimensions, and extracts the first pixel. Any malformed byte fails
    * loudly — a decoder that guesses is worse than one that stops.
    */
  def decodePpm(m: MediaRow): DecodedMedia = {
    val b = m.payload
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
      s"doc ${m.doc_id}: payload is not binary PPM (P6)")
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && i < b.length) {
        val c = b(i) & 0xff
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      require(any, s"doc ${m.doc_id}: malformed PPM header int")
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval == 255, s"doc ${m.doc_id}: unsupported maxval $maxval")
    // dims must be positive and the pixel count must not overflow Int —
    // a crafted huge header could otherwise wrap w*h*3 and spuriously
    // match a short payload (and 0×0 would skip the length check but
    // crash the first-pixel read with a context-free exception)
    require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue,
      s"doc ${m.doc_id}: invalid PPM dimensions ${w}x$h")
    require(i < b.length
        && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t'),
      s"doc ${m.doc_id}: PPM header must end in a whitespace byte")
    i += 1 // the single whitespace byte ending the header
    require(b.length - i == w * h * 3,
      s"doc ${m.doc_id}: payload carries ${b.length - i} pixel bytes, " +
        s"header declares ${w * h * 3}")
    DecodedMedia(m.doc_id, m.media_type, b.length, w, h, 3, "ppm/p6",
      b(i) & 0xff, b(i + 1) & 0xff, b(i + 2) & 0xff)
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

  // ---- q71: partition-batched media decode (oracle-checked) ---------------
  // mapPartitions, not map: a real decoder initializes its codec once per
  // partition and streams the batch through — the P6 parser runs inside
  // that envelope. The encode→decode round-trip is fully deterministic,
  // so every decoded field (dims, byte counts, first pixel) hash-checks
  // against the oracle's prediction from the source table.
  def q71DecodeMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaRows(s, dir)
      .mapPartitions { batch => batch.map(decodePpm) }
      .toDF()
      .orderBy("doc_id")
  }

  val q71Sql: String =
    """SELECT doc_id,
      |  'image/x-portable-pixmap' AS media_type,
      |  CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + w*h*3
      |    AS INT) AS n_bytes,
      |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(3 AS INT) AS channels, 'ppm/p6' AS format,
      |  CAST(doc_id % 256 AS INT) AS first_r,
      |  CAST(n_chars % 256 AS INT) AS first_g,
      |  CAST((doc_id + n_chars) % 256 AS INT) AS first_b
      |FROM (SELECT doc_id, n_chars,
      |        16 + n_chars % 24 AS w, 16 + doc_id % 16 AS h
      |      FROM documents) d
      |ORDER BY doc_id""".stripMargin

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
    "q71_decode_media" -> q71DecodeMedia _,
    "q73_resize_plan" -> q73ResizePlan _,
    "q74_frame_sample" -> q74FrameSample _,
  )

  val oracle: Map[String, String] = Map(
    "q70_binary_meta" -> q70Sql,
    "q71_decode_media" -> q71Sql,
    "q73_resize_plan" -> q73Sql,
    "q74_frame_sample" -> q74Sql,
  )
}

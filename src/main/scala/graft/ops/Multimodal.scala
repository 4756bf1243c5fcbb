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

/** Decoded WAV metadata + int64 audio features (q162). */
case class DecodedWav(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    n_channels: Int,
    sample_rate: Int,
    n_frames: Long,
    energy: Long,
    zero_crossings: Long,
    peak_abs: Long)

/** Decoded PNG chunk-walk metadata produced by the q147 header parser. */
case class DecodedPng(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    bit_depth: Int,
    color_type: Int,
    n_chunks: Int,
    idat_bytes: Int,
    text_len: Int)

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

  // ---- q147: PNG chunk-walk header decode (oracle-checked) ----------------
  // The second, VARIABLE-LENGTH codec in the decode envelope: q71's P6 is
  // fixed-layout (one header, one payload); PNG is the chunked/marker
  // format real crawls contain — a signature followed by length-typed
  // CRC-sealed chunks that must be WALKED, not sliced. The payloads are
  // real minimal PNG containers built pure-JVM (signature + IHDR + tEXt +
  // IDAT + IEND, every chunk CRC32-sealed with java.util.zip.CRC32), and
  // the parser is a real chunk walker: signature check, per-chunk length
  // bounds, CRC validation over type+data, IHDR-first / IEND-last
  // ordering, zero-method/filter/interlace checks — any malformed byte
  // (including a flipped bit anywhere under a CRC) fails loudly. Chunk
  // geometry derives from (doc_id, n_chars), so the decode is predicted
  // exactly in SQL. (The IDAT payload is deterministic opaque bytes, not
  // zlib — header/structure parsing is the engine's job; pixel inflation
  // belongs to a codec library slotted into this same envelope.)

  private val pngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def crc32(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue
  }

  /** One CRC-sealed PNG chunk: length(4BE) + type + data + CRC32(type+data). */
  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val t = chunkType.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc32(t ++ data))
  }

  /** Deterministic minimal PNG container for a document: q71's dimensions
    * in a real IHDR, a `tEXt doc\0<id>` metadata chunk (variable length —
    * the part a fixed-layout parser cannot fake), and a deterministic
    * IDAT body of `1 + n_chars % 97` bytes.
    */
  private[graft] def encodePng(docId: Long, nChars: Long): Array[Byte] = {
    val w = 16 + (nChars % 24).toInt
    val h = 16 + (docId % 16).toInt
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth 8, truecolor, deflate/adaptive/none
    val text = ("doc\u0000" + docId.toString)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val idat = Array.tabulate(1 + (nChars % 97).toInt)(i =>
      ((docId + 7L * i) % 256).toByte)
    pngSignature ++ pngChunk("IHDR", ihdr) ++ pngChunk("tEXt", text) ++
      pngChunk("IDAT", idat) ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** REAL PNG chunk walker: validates the 8-byte signature, then walks
    * length-typed chunks to the exact end of the buffer, recomputing and
    * checking every CRC32, requiring IHDR first (13 bytes, positive
    * non-overflowing dims, zero compression/filter/interlace) and IEND
    * last (empty). Returns the structural metadata; any malformed byte —
    * a flipped bit under a CRC, a truncated chunk, trailing garbage, a
    * lying length field — fails loudly with the doc id and chunk type.
    */
  def decodePngHeader(m: MediaRow): DecodedPng = {
    val b = m.payload
    require(b.length >= pngSignature.length + 12 &&
        pngSignature.indices.forall(k => b(k) == pngSignature(k)),
      s"doc ${m.doc_id}: payload is not PNG (bad signature)")
    def readBe32(at: Int): Long =
      ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
        ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
    var i = pngSignature.length
    val chunks = scala.collection.mutable.Buffer[(String, Int, Int)]() // (type, dataOff, len)
    while (i < b.length) {
      require(b.length - i >= 12,
        s"doc ${m.doc_id}: truncated PNG chunk header at offset $i")
      val len = readBe32(i)
      require(len <= b.length - i - 12,
        s"doc ${m.doc_id}: chunk length $len overruns the payload at offset $i")
      val chunkType = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(chunkType.forall(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')),
        s"doc ${m.doc_id}: invalid chunk type at offset $i")
      val stored = readBe32(i + 8 + len.toInt)
      val actual = crc32(java.util.Arrays.copyOfRange(b, i + 4, i + 8 + len.toInt))
      require(stored == actual,
        s"doc ${m.doc_id}: CRC mismatch in $chunkType " +
          s"(stored ${stored.toHexString}, computed ${actual.toHexString})")
      chunks += ((chunkType, i + 8, len.toInt))
      i += 12 + len.toInt
    }
    require(i == b.length, s"doc ${m.doc_id}: trailing bytes after IEND")
    val (t0, off0, len0) = chunks.head
    require(t0 == "IHDR" && len0 == 13,
      s"doc ${m.doc_id}: first chunk must be a 13-byte IHDR, got $t0/$len0")
    val w = readBe32(off0)
    val h = readBe32(off0 + 4)
    require(w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue,
      s"doc ${m.doc_id}: invalid PNG dimensions ${w}x$h")
    val bitDepth = b(off0 + 8) & 0xff
    val colorType = b(off0 + 9) & 0xff
    require((b(off0 + 10) & 0xff) == 0 && (b(off0 + 11) & 0xff) == 0
        && (b(off0 + 12) & 0xff) == 0,
      s"doc ${m.doc_id}: nonzero compression/filter/interlace method")
    require(chunks.last._1 == "IEND" && chunks.last._3 == 0,
      s"doc ${m.doc_id}: PNG must end with an empty IEND chunk")
    val idatBytes = chunks.collect { case ("IDAT", _, l) => l }.sum
    require(idatBytes > 0, s"doc ${m.doc_id}: PNG carries no IDAT data")
    val textLen = chunks.collect { case ("tEXt", _, l) => l }.sum
    DecodedPng(m.doc_id, m.media_type, b.length, w.toInt, h.toInt,
      bitDepth, colorType, chunks.size, idatBytes, textLen)
  }

  /** documents → encode → chunk-walk decode, inside the same
    * partition-batched envelope as q71 — proving the envelope is
    * codec-agnostic (fixed-layout P6 and chunked PNG are the two shapes
    * every container format reduces to).
    */
  def q147PngHeader(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, n) =>
        decodePngHeader(MediaRow(id, encodePng(id, n), "image/png"))
      })
      .toDF()
      .orderBy("doc_id")
  }

  // n_bytes = 8 (sig) + 25 (IHDR) + 12+4+digits (tEXt) + 12+idat + 12 (IEND)
  val q147Sql: String =
    """SELECT doc_id, 'image/png' AS media_type,
      |  CAST(73 + length(CAST(doc_id AS VARCHAR)) + 1 + n_chars % 97 AS INT) AS n_bytes,
      |  CAST(16 + n_chars % 24 AS INT) AS width,
      |  CAST(16 + doc_id % 16 AS INT) AS height,
      |  CAST(8 AS INT) AS bit_depth,
      |  CAST(2 AS INT) AS color_type,
      |  CAST(4 AS INT) AS n_chunks,
      |  CAST(1 + n_chars % 97 AS INT) AS idat_bytes,
      |  CAST(4 + length(CAST(doc_id AS VARCHAR)) AS INT) AS text_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q162: WAV/RIFF chunk walk + int-domain audio features --------------
  // The audio leg of the multimodal envelope (PPM q71 = raster, PNG q147 =
  // chunked image): genuine little-endian RIFF bytes — RIFF size header,
  // "WAVE" form, a 16-byte PCM "fmt " chunk, an unknown odd-length "note"
  // chunk (so the walker must implement REAL RIFF even-byte padding and
  // skip-unknown semantics), and an interleaved 16-bit PCM "data" chunk.
  // The decoder validates every structural invariant loudly (magic, size
  // field vs buffer, fmt-before-data, byteRate/blockAlign consistency,
  // frame alignment, trailing bytes) and then computes the features a
  // training pipeline actually extracts — total energy Σs², channel-0
  // zero crossings, peak amplitude — entirely in int64. The oracle never
  // parses bytes: it PREDICTS every field and feature from the generation
  // parameters in SQL (the q147 discipline), so encoder, decoder, and
  // feature math are checked against an independent formulation.
  // Scale shape: one mapPartitions pass, no shuffle; payloads stay inside
  // their partition (the codec-envelope batching contract).
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    id.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32(data.length.toLong) ++ data ++ pad
  }

  /** Deterministic sample: channel `ch` of frame `i` of doc `docId`. */
  private def wavSample(docId: Long, i: Int, ch: Int): Int =
    (((docId * 31 + i * 17 + ch * 7) % 4001) - 2000).toInt

  private[graft] def encodeWav(docId: Long, nChars: Long): Array[Byte] = {
    val channels = 1 + (docId % 2).toInt
    val rate = 8000 + 1000 * (nChars % 5).toInt
    val frames = 32 + (nChars % 64).toInt
    val fmt = le16(1) ++ le16(channels) ++ le32(rate.toLong) ++
      le32(rate.toLong * channels * 2) ++ le16(channels * 2) ++ le16(16)
    val note = ("doc" + docId.toString)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val data = new Array[Byte](frames * channels * 2)
    var k = 0
    for (i <- 0 until frames; ch <- 0 until channels) {
      val s = wavSample(docId, i, ch)
      data(k) = (s & 0xff).toByte
      data(k + 1) = ((s >> 8) & 0xff).toByte
      k += 2
    }
    val body = "WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      riffChunk("fmt ", fmt) ++ riffChunk("note", note) ++ riffChunk("data", data)
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32(body.length.toLong) ++ body
  }

  /** REAL RIFF walker: validates RIFF/WAVE magics and the container size
    * field, walks little-endian length-typed chunks with even-byte
    * padding, skips unknown chunks, requires exactly one PCM "fmt "
    * (format 1, 16-bit, consistent byteRate/blockAlign) BEFORE exactly
    * one frame-aligned "data", then decodes interleaved int16 samples and
    * computes int64 features. Any malformed byte fails loudly with the
    * doc id and offset.
    */
  def decodeWav(m: MediaRow): DecodedWav = {
    val b = m.payload
    def ascii(at: Int) =
      new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def rdLe32(at: Int): Long =
      (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
        ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
    def rdLe16(at: Int): Int = (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
    require(b.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "WAVE",
      s"doc ${m.doc_id}: payload is not RIFF/WAVE")
    require(rdLe32(4) == b.length - 8,
      s"doc ${m.doc_id}: RIFF size field ${rdLe32(4)} != ${b.length - 8}")
    var i = 12
    var fmtAt = -1
    var dataAt = -1
    var dataLen = -1
    while (i < b.length) {
      require(b.length - i >= 8,
        s"doc ${m.doc_id}: truncated chunk header at offset $i")
      val id = ascii(i)
      val len = rdLe32(i + 4)
      require(len <= b.length - i - 8,
        s"doc ${m.doc_id}: chunk $id length $len overruns payload at offset $i")
      id match {
        case "fmt " =>
          require(fmtAt < 0, s"doc ${m.doc_id}: duplicate fmt chunk")
          require(dataAt < 0, s"doc ${m.doc_id}: fmt chunk after data")
          require(len == 16, s"doc ${m.doc_id}: fmt length $len != 16")
          fmtAt = i + 8
        case "data" =>
          require(dataAt < 0, s"doc ${m.doc_id}: duplicate data chunk")
          require(fmtAt >= 0, s"doc ${m.doc_id}: data chunk before fmt")
          dataAt = i + 8
          dataLen = len.toInt
        case _ => () // unknown chunk: skip (the RIFF contract)
      }
      i += 8 + len.toInt + (len % 2).toInt // even-byte padding
    }
    require(i == b.length, s"doc ${m.doc_id}: trailing bytes after last chunk")
    require(fmtAt >= 0 && dataAt >= 0, s"doc ${m.doc_id}: missing fmt or data")
    val audioFormat = rdLe16(fmtAt)
    val channels = rdLe16(fmtAt + 2)
    val rate = rdLe32(fmtAt + 4)
    val byteRate = rdLe32(fmtAt + 8)
    val blockAlign = rdLe16(fmtAt + 12)
    val bits = rdLe16(fmtAt + 14)
    require(audioFormat == 1 && bits == 16,
      s"doc ${m.doc_id}: not 16-bit PCM (format $audioFormat, $bits bits)")
    require(channels >= 1 && blockAlign == channels * 2
        && byteRate == rate * channels * 2,
      s"doc ${m.doc_id}: inconsistent fmt ($channels ch, align $blockAlign, " +
        s"byteRate $byteRate at rate $rate)")
    require(dataLen % blockAlign == 0,
      s"doc ${m.doc_id}: data length $dataLen not frame-aligned")
    val frames = dataLen / blockAlign
    var energy = 0L
    var peak = 0L
    var zc = 0L
    var prevNeg = false
    for (f <- 0 until frames; ch <- 0 until channels) {
      val raw = rdLe16(dataAt + (f * channels + ch) * 2)
      val s = (raw << 16) >> 16 // sign-extend int16
      energy += s.toLong * s
      if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
      if (ch == 0) {
        if (f > 0 && ((s < 0) != prevNeg)) zc += 1
        prevNeg = s < 0
      }
    }
    DecodedWav(m.doc_id, m.media_type, b.length, channels, rate.toInt,
      frames.toLong, energy, zc, peak)
  }

  def q162WavFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, n) =>
        decodeWav(MediaRow(id, encodeWav(id, n), "audio/wav"))
      })
      .toDF()
      .orderBy("doc_id")
  }

  // n_bytes = 12 (RIFF+size+WAVE) + 24 (fmt) + 8 + note + pad + 8 + data
  val q162Sql: String =
    """WITH base AS (
      |  SELECT doc_id, n_chars,
      |    1 + doc_id % 2 AS ch,
      |    8000 + 1000 * (n_chars % 5) AS rate,
      |    32 + n_chars % 64 AS frames,
      |    3 + length(CAST(doc_id AS VARCHAR)) AS note_len
      |  FROM documents),
      |samp AS (
      |  SELECT b.doc_id, r.i, c.chn,
      |    ((b.doc_id * 31 + r.i * 17 + c.chn * 7) % 4001) - 2000 AS s
      |  FROM base b
      |  JOIN (SELECT range AS i FROM range(96)) r ON r.i < b.frames
      |  JOIN (SELECT range AS chn FROM range(2)) c ON c.chn < b.ch),
      |en AS (
      |  SELECT doc_id, CAST(SUM(s * s) AS BIGINT) AS energy,
      |    CAST(MAX(abs(s)) AS BIGINT) AS peak_abs
      |  FROM samp GROUP BY 1),
      |zc AS (
      |  SELECT b.doc_id,
      |    CAST(COUNT(*) FILTER (WHERE
      |      (((b.doc_id * 31 + (r.i - 1) * 17) % 4001) - 2000 < 0)
      |      <> (((b.doc_id * 31 + r.i * 17) % 4001) - 2000 < 0)) AS BIGINT)
      |      AS zero_crossings
      |  FROM base b
      |  JOIN (SELECT range AS i FROM range(1, 96)) r ON r.i < b.frames
      |  GROUP BY 1)
      |SELECT b.doc_id, 'audio/wav' AS media_type,
      |  CAST(12 + 24 + 8 + b.note_len + b.note_len % 2 + 8
      |       + b.frames * b.ch * 2 AS INT) AS n_bytes,
      |  CAST(b.ch AS INT) AS n_channels,
      |  CAST(b.rate AS INT) AS sample_rate,
      |  CAST(b.frames AS BIGINT) AS n_frames,
      |  en.energy, zc.zero_crossings, en.peak_abs
      |FROM base b
      |JOIN en USING (doc_id)
      |JOIN zc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---- q227: JPEG decode — a REAL lossy codec in the envelope -------------
  // PPM (q71), PNG (q147), and WAV (q162) are hand-walked containers; JPEG
  // — the dominant crawl-image format — exercises an actual CODEC LIBRARY
  // inside the same partition-batched envelope, using only the JDK's
  // built-in `javax.imageio` (no new dependency). Each document gets a
  // solid-color JPEG with dimensions derived from its columns; the decode
  // extracts geometry (exactly recoverable — JPEG is lossy in PIXELS,
  // never in dimensions/bands, so the oracle predicts them from the
  // source table) plus the center pixel, and the query GATES fidelity on
  // the oracled path: every decoded channel must sit within the codec's
  // tolerance of the encoded color (a broken encode/decode pairing fails
  // the require before any row reaches the compare). Corruption classes —
  // truncated stream, wrong magic — are spec-pinned to fail loudly.
  private[graft] def encodeJpeg(docId: Long, nChars: Long): Array[Byte] = {
    val w = 32 + (nChars % 32).toInt
    val h = 32 + (docId % 24).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // fill the raster's backing byte buffer directly (B,G,R order for
    // TYPE_3BYTE_BGR) — same pixels as the per-pixel setRGB walk without
    // its per-call color-model conversion (w·h calls per document)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    val r = (docId % 256).toByte
    val g = (nChars % 256).toByte
    val b = ((docId + nChars) % 256).toByte
    var i = 0
    while (i < data.length) { data(i) = b; data(i + 1) = g; data(i + 2) = r; i += 3 }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      s"doc $docId: no JPEG writer available")
    bos.toByteArray
  }

  def decodeJpeg(m: MediaRow): DecodedMedia = {
    val b = m.payload
    // SOI marker first — reject non-JPEG bytes BEFORE handing them to the
    // codec (a decoder that sniffs formats silently is how corrupt crawl
    // payloads end up decoded as the wrong thing)
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      s"doc ${m.doc_id}: payload lacks the JPEG SOI marker")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, s"doc ${m.doc_id}: JPEG stream undecodable")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(w / 2, h / 2)
    DecodedMedia(m.doc_id, m.media_type, b.length, w, h,
      img.getRaster.getNumBands, "jpeg",
      (px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
  }

  def q227JpegDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      // one fused pass (the intermediate MediaRow Dataset would pay a
      // serialize/deserialize round of the JPEG payload between the two
      // operators), materialized ONCE: both the fidelity gate below and
      // the returned projection read this leaf, instead of each re-running
      // the encode+decode over the corpus
      .mapPartitions(_.map { case (id, n) =>
        decodeJpeg(MediaRow(id, encodeJpeg(id, n), "image/jpeg"))
      })
      .toDF()
      .localCheckpoint(true)
    // fidelity gate on the oracled path: lossy channels within tolerance
    // of the encoded solid color (solid fields survive JPEG nearly exact;
    // 12/255 is far beyond any compliant codec's drift on them)
    val offTolerance = decoded
      .join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")), "doc_id")
      .filter(
        greatest(
          abs(col("first_r") - col("doc_id") % 256),
          abs(col("first_g") - col("n_chars") % 256),
          abs(col("first_b") - (col("doc_id") + col("n_chars")) % 256)) > 12)
      .count()
    require(offTolerance == 0,
      s"q227: $offTolerance decoded JPEGs drifted beyond codec tolerance")
    decoded
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("channels"), col("format"))
      .orderBy("doc_id")
  }

  val q227Sql: String =
    """SELECT doc_id, 'image/jpeg' AS media_type,
      |  CAST(32 + n_chars % 32 AS INT) AS width,
      |  CAST(32 + doc_id % 24 AS INT) AS height,
      |  CAST(3 AS INT) AS channels, 'jpeg' AS format
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_binary_meta" -> q70BinaryMeta _,
    "q71_decode_media" -> q71DecodeMedia _,
    "q73_resize_plan" -> q73ResizePlan _,
    "q74_frame_sample" -> q74FrameSample _,
    "q147_png_header" -> q147PngHeader _,
    "q162_wav_features" -> q162WavFeatures _,
    "q227_jpeg_decode" -> q227JpegDecode _,
  )

  val oracle: Map[String, String] = Map(
    "q70_binary_meta" -> q70Sql,
    "q71_decode_media" -> q71Sql,
    "q73_resize_plan" -> q73Sql,
    "q74_frame_sample" -> q74Sql,
    "q147_png_header" -> q147Sql,
    "q162_wav_features" -> q162Sql,
    "q227_jpeg_decode" -> q227Sql,
  )
}

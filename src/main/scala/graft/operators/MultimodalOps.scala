package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media as opaque `binary` columns
  * flowing through a typed Dataset pipeline with per-partition batch
  * processing, decoded by REAL pure-JVM container parsers.
  *
  * r12 (closing the one `partial` in SURVEY row 35): the former
  * decode STUB is replaced by actual decoders for three public
  * UNCOMPRESSED container formats —
  *
  *   - BMP (Windows bitmap, BITMAPINFOHEADER, 24-bit uncompressed):
  *     little-endian header fields, 4-byte-aligned row strides walked
  *     row by row, pixel byte statistics over the payload;
  *   - PPM (Netpbm P6 binary): ASCII header tokenizer (width, height,
  *     maxval), then raw RGB triplets;
  *   - WAV (RIFF PCM, 16-bit mono): chunk walker for `fmt `/`data`,
  *     signed little-endian sample decode, mean |amplitude|.
  *
  * The container has no media files, so the blobs are SYNTHESIZED
  * (deterministically, from each document's UTF-8 bytes — format
  * chosen by the md5 of the doc id, the q209 recipe) as fully VALID
  * containers, then decoded by parsing the bytes like any downloaded
  * file; the decoder never sees the synthesis parameters. Every
  * output statistic is integer-exact, and the synthesis→decode
  * composition has a closed form over (doc_id, text) that the DuckDB
  * oracle replays — q35 is FULL-oracle over real decoded bytes.
  *
  * Reference anchor: the reference stores only scalar battle columns
  * (sql/db_creation_script.sql:86-109); this is the binary-column
  * capability a multimodal corpus adds on top of that relational
  * core.
  */
object MultimodalOps {

  case class MediaBlob(doc_id: Long, media: Array[Byte])

  /** Decoded container features: `width`/`height` are image-only
    * (null for audio), `rate` is audio-only (null for images),
    * `n_units` counts pixels or samples, and `mean_e2` is the
    * round-half-up centi-mean of pixel byte values (images) or of
    * absolute sample amplitudes (audio) — all integer-exact.
    */
  case class MediaFeatures(doc_id: Long, fmt: String, byte_len: Long,
      width: Option[Int], height: Option[Int], rate: Option[Int],
      n_units: Long, mean_e2: Long)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Deterministic format pick: first hex digit of md5(doc_id) mod 3
    * (0 → BMP, 1 → PPM, 2 → WAV) — engine-identical (the q209 rule).
    */
  private[graft] def formatPick(docId: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
    Integer.parseInt(f"${hex(0) & 0xff}%02x".substring(0, 1), 16) % 3
  }

  /** Image geometry from payload length: width cycles 1..31, height
    * covers the payload in 24-bit pixels (zero-padded tail).
    */
  private def imgDims(len: Int): (Int, Int) = {
    val w = (len % 31) + 1
    val h = math.max(1, (len + 3 * w - 1) / (3 * w))
    (w, h)
  }

  /** A fully valid bottom-up 24-bit uncompressed BMP whose pixel bytes
    * are `payload` zero-padded to 3·w·h, rows padded to 4-byte stride.
    */
  private[graft] def synthBmp(payload: Array[Byte]): Array[Byte] = {
    val (w, h) = imgDims(payload.length)
    val stride = ((3 * w + 3) / 4) * 4
    val dataSize = stride * h
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    out.write('B'); out.write('M')
    out.write(le32(54 + dataSize)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
    out.write(le16(1)); out.write(le16(24))
    out.write(le32(0)); out.write(le32(dataSize))
    out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val px = java.util.Arrays.copyOf(payload, 3 * w * h)
    val pad = new Array[Byte](stride - 3 * w)
    var r = 0
    while (r < h) {
      out.write(px, r * 3 * w, 3 * w); out.write(pad); r += 1
    }
    out.toByteArray
  }

  /** A valid binary Netpbm P6 with maxval 255, payload zero-padded to
    * 3·w·h RGB bytes.
    */
  private[graft] def synthPpm(payload: Array[Byte]): Array[Byte] = {
    val (w, h) = imgDims(payload.length)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = java.util.Arrays.copyOf(payload, 3 * w * h)
    val out = new Array[Byte](header.length + px.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(px, 0, out, header.length, px.length)
    out
  }

  /** A valid RIFF/WAVE, PCM 16-bit mono 8 kHz: one signed sample
    * `(b − 128) · 256` per payload byte.
    */
  private[graft] def synthWav(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val out = new java.io.ByteArrayOutputStream(44 + 2 * n)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + 2 * n))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1))
    out.write(le32(8000)); out.write(le32(16000))
    out.write(le16(2)); out.write(le16(16))
    out.write("data".getBytes("US-ASCII")); out.write(le32(2 * n))
    var i = 0
    while (i < n) {
      out.write(le16((((payload(i) & 0xff) - 128) * 256) & 0xffff))
      i += 1
    }
    out.toByteArray
  }

  private[graft] def synthesize(docId: Long,
      payload: Array[Byte]): Array[Byte] =
    formatPick(docId) match {
      case 0 => synthBmp(payload)
      case 1 => synthPpm(payload)
      case _ => synthWav(payload)
    }

  private def rhu(num: Long, den: Long): Long = (2 * num + den) / (2 * den)

  /** REAL BMP decode: header fields, stride-walked pixel rows. Header
    * fields are untrusted (r12 advice): dims/offset are bounds-checked
    * against the blob, so a malformed header degrades to a partial (or
    * zero-pixel) read instead of an AIOOBE or a negative-size loop.
    */
  private[graft] def decodeBmp(id: Long, b: Array[Byte]): MediaFeatures = {
    val off = rdLe32(b, 10)
    val w = rdLe32(b, 18)
    val h = rdLe32(b, 22)
    val bpp = rdLe16(b, 28)
    // bpp < 8 would give rowBytes = 0 and stride 0 — the row walk
    // below would then spin up to h (≤ 2³¹) empty iterations on a
    // malformed header (r13 advice), so sub-byte depths are rejected
    // with the other header lies
    if (w <= 0 || h <= 0 || bpp < 8 || off < 0 || off >= b.length ||
        w.toLong * bpp > Int.MaxValue - 64)
      return MediaFeatures(id, "bmp", b.length.toLong, Some(w), Some(h),
        None, 0L, 0L)
    val rowBytes = w * bpp / 8
    val stride = ((rowBytes + 3) / 4) * 4
    var sum = 0L
    var r = 0
    while (r < h && off.toLong + r.toLong * stride < b.length) {
      var i = off + r * stride
      // Long min: i + rowBytes can exceed Int.MaxValue on a huge
      // claimed width even though i itself is in-blob
      val end = math.min(b.length.toLong, i.toLong + rowBytes).toInt
      while (i < end) { sum += (b(i) & 0xff); i += 1 }
      r += 1
    }
    MediaFeatures(id, "bmp", b.length.toLong, Some(w), Some(h), None,
      w.toLong * h, rhu(100L * sum, w.toLong * h * 3))
  }

  /** REAL P6 decode: ASCII header tokenizer, then raw RGB bytes. */
  private[graft] def decodePpm(id: Long, b: Array[Byte]): MediaFeatures = {
    // header: "P6" ws width ws height ws maxval ws, then payload
    var i = 2
    def tok(): Int = {
      while (i < b.length && Character.isWhitespace(b(i))) i += 1
      var v = 0
      while (i < b.length && !Character.isWhitespace(b(i))) {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = tok(); val h = tok(); tok() // maxval
    i += 1 // the single whitespace after maxval
    if (w <= 0 || h <= 0) // untrusted header (r12 advice): no /0 below
      return MediaFeatures(id, "ppm", b.length.toLong, Some(w), Some(h),
        None, 0L, 0L)
    var sum = 0L
    var j = i
    val end = math.min(b.length, i + 3 * w * h)
    while (j < end) { sum += (b(j) & 0xff); j += 1 }
    MediaFeatures(id, "ppm", b.length.toLong, Some(w), Some(h), None,
      w.toLong * h, rhu(100L * sum, w.toLong * h * 3))
  }

  /** REAL RIFF/WAVE decode: chunk walk to `fmt `/`data`, signed 16-bit
    * LE samples, mean |amplitude|. Chunk lengths are untrusted (r12
    * advice): a negative or oversized `clen` aborts the walk (the
    * naive `i += 8 + clen` loops forever at clen = -8), fmt fields are
    * range-guarded, and the sample count is clamped to the blob.
    */
  private[graft] def decodeWav(id: Long, b: Array[Byte]): MediaFeatures = {
    var rate = 0; var bits = 0; var channels = 1
    var dataOff = -1; var dataLen = 0
    var i = 12
    var walking = true
    while (walking && i + 8 <= b.length) {
      val cid = new String(b, i, 4, "US-ASCII")
      val clen = rdLe32(b, i + 4)
      if (clen < 0) walking = false
      else {
        if (cid == "fmt " && i + 24 <= b.length) {
          channels = rdLe16(b, i + 10)
          rate = rdLe32(b, i + 12)
          bits = rdLe16(b, i + 22)
        } else if (cid == "data") {
          dataOff = i + 8
          dataLen = math.min(clen, b.length - dataOff)
        }
        // next offset in LONG (r13 advice): clen near Int.MaxValue
        // overflowed the Int add to a negative i that still passed the
        // `i + 8 <= b.length` guard and blew up the chunk-id read —
        // any next offset past the blob (or Int range) ends the walk
        val nx = i.toLong + 8L + clen.toLong + (clen & 1).toLong
        if (nx > b.length) walking = false
        else i = nx.toInt
      }
    }
    val n = if (bits < 8 || channels < 1 || dataOff < 0) 0
      else dataLen / (bits / 8) / channels
    var sum = 0L
    var j = 0
    while (j < n && dataOff + 2 * j + 1 < b.length) {
      val raw = rdLe16(b, dataOff + 2 * j)
      val s = (raw << 16) >> 16 // sign-extend
      sum += math.abs(s.toLong)
      j += 1
    }
    MediaFeatures(id, "wav", b.length.toLong, None, None, Some(rate),
      n.toLong, if (n == 0) 0L else rhu(100L * sum, n.toLong))
  }

  private[graft] def decode(m: MediaBlob): MediaFeatures = {
    val b = m.media
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M')
      decodeBmp(m.doc_id, b)
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '6')
      decodePpm(m.doc_id, b)
    else if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == 'F')
      decodeWav(m.doc_id, b)
    else MediaFeatures(m.doc_id, "unknown", b.length.toLong,
      None, None, None, 0L, 0L)
  }

  /** The typed pipeline: binary column in, per-partition iteration
    * (the shape a real batched decoder needs — codec handles are
    * initialized once per partition, not per row), typed features out.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init would go here (codec / model handle)
      it.map(decode)
    }
  }

  /** 35. Documents' UTF-8 bytes synthesized into valid BMP/PPM/WAV
    * containers (format by md5 of the id), then REALLY decoded —
    * header parse, stride walk, sample decode — into typed features.
    */
  def q35Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ASCII-parity guard (r12 advice): the closed-form oracle models
    // the payload via DuckDB's per-CHARACTER length/ascii(), while the
    // synthesized container carries UTF-8 BYTES — a non-ASCII char
    // would silently diverge byte_len and mean_e2. Both sides filter
    // octet_length = char length, so a future non-ASCII corpus drops
    // those rows on BOTH engines instead of hash-mismatching (a no-op
    // on every tested SF: the testdata corpus is pure ASCII).
    val blobs = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaBlob]
      .mapPartitions(_.map(m =>
        MediaBlob(m.doc_id, synthesize(m.doc_id, m.media))))
    extractFeatures(blobs).toDF()
  }

  /** q209: multimodal FORMAT CENSUS — per (source, container format)
    * counts, byte volume and ppm mix, with the format detected from
    * the blob's MAGIC BYTES (the first job any media lake runs: "what
    * is actually in these binary columns", catching mislabeled
    * extensions and corrupt headers before decode workers waste GPU
    * time on them). Detection is pure binary ops on the leading bytes
    * — no decode, no UDF, one scan + one map-combined aggregate.
    *
    * The blobs here are synthesized (the container has no media): each
    * doc's UTF-8 bytes get a REAL container magic (JPEG ff d8 / PNG
    * 89 50 / RIFF 52 49) chosen by the md5 of its id — deterministic
    * and engine-identical, so the census is fully oracle-checked. A
    * real deployment swaps the synthesis for the actual media column;
    * the sniffing and census stages are unchanged.
    */
  def q209FormatCensus(s: SparkSession, d: String): DataFrame = {
    val pick = expr(
      "conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 1), 16, 10)")
      .cast("int") % 3
    val magic = element_at(
      array(lit("FFD8"), lit("8950"), lit("5249")), pick + 1)
    val blobs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"),
        concat(unhex(magic), encode(col("text"), "UTF-8")).as("media"))
    val census = blobs
      .select(col("source"),
        when(hex(substring(col("media"), 1, 2)) === "FFD8", "jpeg")
          .when(hex(substring(col("media"), 1, 2)) === "8950", "png")
          .when(hex(substring(col("media"), 1, 2)) === "5249", "riff")
          .otherwise("unknown").as("format"),
        length(col("media")).cast("long").as("_bytes"))
      .groupBy(col("source"), col("format"))
      .agg(count(lit(1)).cast("long").as("n_blobs"),
        sum(col("_bytes")).cast("long").as("total_bytes"))
    val tot = census.groupBy(col("source"))
      .agg(sum(col("n_blobs")).cast("long").as("_n"))
    census.join(broadcast(tot), "source")
      .select(col("source"), col("format"), col("n_blobs"),
        col("total_bytes"),
        expr("(2000000 * n_blobs + _n) DIV (2 * _n)").as("mix_ppm"))
  }
}

package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Multimodal columns: media payloads are opaque BINARY columns with
  * typed metadata, flowing through ordinary Spark plans; decode /
  * feature-extraction runs as iterator-to-iterator `mapPartitions`
  * (batch-shaped, spill-free, no driver collect — the Scala analogue of a
  * pandas-batched UDF).
  *
  * The decode step is REAL (r11, replacing the r1–r10 synthetic-header
  * stub): no codecs exist in this environment, but BMP and WAV are plain
  * little-endian byte arithmetic, so [[decodeBmp]] parses a genuine
  * BITMAPINFOHEADER (magic, dimensions, bpp, stride, pixel array) and
  * [[decodeWav]] walks genuine RIFF chunks (fmt / data, skipping unknown
  * chunks with 2-byte alignment) to sample rate / channels / duration and
  * the PCM samples themselves. Payloads are built in-query from fixture
  * columns by [[bmpBytes]]/[[wavBytes]], so every decoded field has a
  * closed form over (doc_id, text) / vec_id that the DuckDB oracle
  * recomputes independently — q51/q138 are fully oracled. The decoders
  * are additionally pinned to the real formats by FOREIGN golden bytes in
  * MultimodalSpec (the canonical public 2×2 BMP; a hand-written 44-byte
  * PCM WAV), so a symmetric encoder/decoder offset bug cannot pass.
  */
object Multimodal {

  final case class Media(doc_id: Long, payload: Array[Byte])

  // --- BMP ----------------------------------------------------------------

  final case class BmpMeta(doc_id: Long, width: Int, height: Int, bpp: Int,
      file_size: Long, row_stride: Int, n_pixel_bytes: Long, pixel_checksum: Long)

  /** A valid 24-bit BITMAPINFOHEADER BMP whose dimensions derive from the
    * doc id and whose pixel array (including row padding) is the document
    * text repeated byte-wise — every header field and the checksum have a
    * pure-SQL closed form. */
  def bmpBytes(docId: Long, text: String): Array[Byte] = {
    val w = 4 + (docId % 29).toInt
    val h = 2 + (docId % 13).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val nPix = stride * h
    val b = ByteBuffer.allocate(54 + nPix).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + nPix)                    // file size
    b.putShort(0); b.putShort(0)           // reserved
    b.putInt(54)                           // pixel-array offset
    b.putInt(40)                           // DIB header size
    b.putInt(w); b.putInt(h)
    b.putShort(1)                          // color planes
    b.putShort(24)                         // bits per pixel
    b.putInt(0)                            // BI_RGB, uncompressed
    b.putInt(nPix)                         // image size
    b.putInt(2835); b.putInt(2835)         // 72 DPI in px/metre
    b.putInt(0); b.putInt(0)               // palette sizes
    val txt = text.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < nPix) {
      b.put(if (txt.isEmpty) 0.toByte else txt(i % txt.length))
      i += 1
    }
    b.array()
  }

  /** Parses the BMP header and pixel array out of raw bytes — pure
    * little-endian arithmetic, no codec. Stride is re-derived from
    * width·bpp (the format's row alignment rule), the checksum reads the
    * pixel array at the HEADER's offset field, so a mis-written offset or
    * width cannot cancel out. */
  def decodeBmp(m: Media): BmpMeta = {
    val p = m.payload
    require(p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte,
      s"doc ${m.doc_id}: not a BMP")
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    val fileSize = u32(2)
    val pixOff = u32(10).toInt
    val w = u32(18).toInt
    val h = u32(22).toInt
    val bpp = u16(28)
    val stride = ((w * bpp / 8 + 3) / 4) * 4
    val nPix = p.length.toLong - pixOff
    val n = math.min(64L, nPix).toInt
    var cs = 0L
    var i = 0
    while (i < n) { cs += (p(pixOff + i) & 0xffL) * (i + 1); i += 1 }
    BmpMeta(m.doc_id, w, h, bpp, fileSize, stride, nPix, cs)
  }

  // --- WAV ----------------------------------------------------------------

  final case class WavMeta(vec_id: Long, channels: Int, sample_rate: Int,
      byte_rate: Int, block_align: Int, bits: Int, n_frames: Long,
      duration_us: Long, sample_checksum: Long)

  /** A valid RIFF/WAVE PCM file whose format fields and 16-bit samples
    * derive from the vec id alone (pure-integer closed forms — float
    * sample synthesis would reintroduce cross-engine formatting drift).
    * Odd ids get a junk LIST chunk BEFORE fmt, so a decoder that assumes
    * fixed offsets instead of walking chunks fails the oracle. */
  def wavBytes(vecId: Long): Array[Byte] = {
    val c = 1 + (vecId % 2).toInt
    val sr = 8000 + (vecId % 3).toInt * 4000
    val nFrames = 64 + (vecId % 100).toInt
    val blockAlign = c * 2
    val dataSize = nFrames * blockAlign
    val junk = vecId % 2 == 1
    val junkBytes = if (junk) 8 + 8 else 0
    val riffSize = 4 + junkBytes + (8 + 16) + (8 + dataSize)
    val b = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII)); b.putInt(riffSize)
    b.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    if (junk) {
      b.put("LIST".getBytes(StandardCharsets.US_ASCII)); b.putInt(8)
      b.put("INFOJUNK".getBytes(StandardCharsets.US_ASCII))
    }
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII)); b.putInt(16)
    b.putShort(1)                          // PCM
    b.putShort(c.toShort)
    b.putInt(sr)
    b.putInt(sr * blockAlign)              // byte rate
    b.putShort(blockAlign.toShort)
    b.putShort(16)                         // bits per sample
    b.put("data".getBytes(StandardCharsets.US_ASCII)); b.putInt(dataSize)
    var i = 0
    while (i < nFrames * c) {
      b.putShort((((vecId * 31 + i * 17) % 65536) - 32768).toShort)
      i += 1
    }
    b.array()
  }

  /** Walks RIFF chunks (2-byte aligned, unknown chunks skipped) to the
    * fmt and data chunks, decoding format fields and the little-endian
    * int16 PCM samples. duration_us is exact integer µs (truncating —
    * the oracle's `//`). */
  def decodeWav(m: Media): WavMeta = {
    val p = m.payload
    def tag(o: Int): String = new String(p, o, 4, StandardCharsets.US_ASCII)
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def i16(o: Int): Int = u16(o).toShort.toInt
    def u32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    require(p.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"vec ${m.doc_id}: not a RIFF/WAVE")
    var off = 12
    var fmtOff = -1
    var dataOff = -1
    var dataSize = 0L
    while (off + 8 <= p.length) {
      val id = tag(off)
      val sz = u32(off + 4).toInt
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataSize = sz.toLong }
      off += 8 + sz + (sz & 1)
    }
    require(fmtOff >= 0 && dataOff >= 0, s"vec ${m.doc_id}: missing fmt/data chunk")
    require(u16(fmtOff) == 1, s"vec ${m.doc_id}: not PCM")
    val channels = u16(fmtOff + 2)
    val sr = u32(fmtOff + 4).toInt
    val byteRate = u32(fmtOff + 8).toInt
    val blockAlign = u16(fmtOff + 12)
    val bits = u16(fmtOff + 14)
    val nFrames = dataSize / blockAlign
    val nSamples = math.min(dataSize / 2, 128L).toInt
    var cs = 0L
    var i = 0
    while (i < nSamples) { cs += i16(dataOff + 2 * i).toLong * (i + 1); i += 1 }
    WavMeta(m.doc_id, channels, sr, byteRate, blockAlign, bits, nFrames,
      nFrames * 1000000L / sr, cs)
  }

  // --- Spark plumbing -----------------------------------------------------

  /** Iterator-to-iterator decode: one partition in, one partition out,
    * constant memory — the shape that survives 100 TB of media. */
  def extractBmp(ds: Dataset[Media]): Dataset[BmpMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeBmp))
  }

  def extractWav(ds: Dataset[Media]): Dataset[WavMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeWav))
  }

  /** Frame sampling: every `stride`-th 256-byte chunk, exploded to one
    * row per sampled frame. The stride is a SEQUENCE STEP (r11 verdict
    * item 5): the generated array holds only the n/stride sampled chunks
    * — the previous shape generated all n chunks then filtered, paying
    * the stride factor in materialized frames before the filter. */
  def sampleFrames(ds: Dataset[Media], stride: Int): DataFrame =
    ds.toDF()
      .select(col("doc_id"), expr(
        s"inline(transform(sequence(0, CAST((octet_length(payload) - 1) / 256 AS INT), $stride), " +
          s"i -> named_struct('frame_no', i, 'frame', substring(payload, i * 256 + 1, 256))))"))
      .filter(octet_length(col("frame")) > 0)

  /** The q140 entry's sampling stride — ONE definition shared by the
    * Spark call and the interpolated DuckDB oracle (ADVICE r12: a bare
    * literal on each side could drift apart silently). */
  val Q140Stride = 2

  /** q140's shape: sampled frames reduced to (doc_id, frame_no, digest,
    * length) — the fingerprint-not-payload output a 100 TB media scan
    * ships to the next stage. */
  def extractFrames(ds: Dataset[Media], stride: Int = Q140Stride): DataFrame =
    sampleFrames(ds, stride)
      .select(col("doc_id"), col("frame_no"),
        md5(col("frame")).as("frame_digest"),
        octet_length(col("frame")).as("n_bytes"))
      .orderBy("doc_id", "frame_no")

  /** Documents rendered as BMP payloads — the fixture stand-in for an
    * image table. Encoding happens on the executors inside the same
    * iterator pipeline the decode runs in; payload bytes never move. */
  def bmpFromDocuments(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables(s, d, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => Media(id, bmpBytes(id, t)) })
  }

  /** Embeddings rendered as WAV payloads (audio-table stand-in). */
  def wavFromEmbeddings(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables(s, d, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id")).as[Long]
      .mapPartitions(_.map(id => Media(id, wavBytes(id))))
  }

  val specs: Seq[QuerySpec] = Seq(
    // Binary-column plumbing with full oracle parity (payload bytes are
    // utf-8 of ASCII text, so DuckDB's VARCHAR byte functions agree).
    QuerySpec("q50_multimodal_binary",
      (s, d) => Tables(s, d, "documents")
        .withColumn("payload", expr("encode(text, 'UTF-8')"))
        .select(col("doc_id"),
          expr("octet_length(payload)").as("n_bytes"),
          expr("CAST(ceil(octet_length(payload) / 256.0) AS INT)").as("n_chunks"),
          md5(col("text")).as("digest"),
          expr("hex(substring(payload, 1, 16))").as("head_hex"))
        .orderBy("doc_id").limit(100),
      Some("SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, " +
        "CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS n_chunks, " +
        "md5(text) AS digest, hex(substr(text, 1, 16)) AS head_hex " +
        "FROM documents ORDER BY doc_id LIMIT 100")),

    // Real image decode: documents → in-query BMP files → header+pixel
    // parse via mapPartitions; every output field has a closed form over
    // (doc_id, octet_length(text), ascii codes) that DuckDB recomputes.
    // The oracle's checksum indexes CHARACTERS, the encoder indexes UTF-8
    // BYTES — equal only for pure-ASCII text, which MultimodalSpec pins
    // on the doc_id<100 slice of every fixture SF (ADVICE r11).
    QuerySpec("q51_multimodal_decode",
      (s, d) => extractBmp(bmpFromDocuments(s, d)).toDF().orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS L " +
        "FROM documents WHERE doc_id < 100), " +
        "dims AS (SELECT doc_id, text, L, " +
        "CAST(4 + doc_id % 29 AS INT) AS width, " +
        "CAST(2 + doc_id % 13 AS INT) AS height FROM d), " +
        "m AS (SELECT doc_id, text, L, width, height, 24 AS bpp, " +
        "CAST(((width * 3 + 3) // 4) * 4 AS INT) AS row_stride FROM dims), " +
        "m2 AS (SELECT *, CAST(row_stride * height AS BIGINT) AS n_pixel_bytes, " +
        "CAST(54 + row_stride * height AS BIGINT) AS file_size FROM m), " +
        "px AS (SELECT doc_id, unnest(generate_series(0, " +
        "CAST(least(64, n_pixel_bytes) - 1 AS BIGINT))) AS i FROM m2 WHERE L > 0), " +
        "cs AS (SELECT px.doc_id, CAST(sum(ascii(substr(m2.text, " +
        "CAST(px.i % m2.L AS INT) + 1, 1)) * (px.i + 1)) AS BIGINT) AS pixel_checksum " +
        "FROM px JOIN m2 ON m2.doc_id = px.doc_id GROUP BY 1) " +
        "SELECT m2.doc_id, width, height, bpp, file_size, row_stride, " +
        "n_pixel_bytes, coalesce(cs.pixel_checksum, 0) AS pixel_checksum " +
        "FROM m2 LEFT JOIN cs USING (doc_id) ORDER BY doc_id")),

    // Frame sampling as an ORACLED entry (r12 — previously spec-only):
    // payloads are the raw UTF-8 text bytes (the q50 shape), frames are
    // every stride-th 256-byte chunk, and each sampled frame's md5 +
    // length has a closed form over substr(text, ...) that DuckDB
    // recomputes (char indexing == byte indexing under the ASCII pin;
    // DuckDB 1.0 has no BLOB md5, so the VARCHAR form is the only
    // cross-engine digest anyway).
    QuerySpec("q140_frame_sample",
      (s, d) => {
        import s.implicits._
        val media = Tables(s, d, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.map { case (id, t) =>
            Media(id, t.getBytes(StandardCharsets.UTF_8)) })
        // Stride passed EXPLICITLY from the shared constant the oracle
        // interpolates below (ADVICE r12): relying on extractFrames'
        // default would silently desynchronize the two sides if the
        // default ever changed.
        extractFrames(media, stride = Q140Stride)
      },
      Some("WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS L " +
        "FROM documents WHERE doc_id < 100), " +
        s"f AS (SELECT doc_id, CAST(unnest(generate_series(0, (L - 1) // 256, $Q140Stride)) AS INT) " +
        "AS frame_no, text, L FROM d WHERE L > 0) " +
        "SELECT doc_id, frame_no, md5(substr(text, frame_no * 256 + 1, 256)) AS frame_digest, " +
        "CAST(least(256, L - frame_no * 256) AS INT) AS n_bytes " +
        "FROM f ORDER BY doc_id, frame_no")),

    // Real audio decode: embeddings → in-query RIFF/WAVE PCM files →
    // chunk-walking parse (odd ids carry a junk chunk before fmt).
    // vec_id appears under its decoded-output name; the oracle joins the
    // closed forms for every field including the int16 sample checksum.
    QuerySpec("q138_wav_decode",
      (s, d) => extractWav(wavFromEmbeddings(s, d)).toDF().orderBy("vec_id"),
      Some("WITH v AS (SELECT vec_id FROM embeddings WHERE vec_id < 100), " +
        "m AS (SELECT vec_id, CAST(1 + vec_id % 2 AS INT) AS channels, " +
        "CAST(8000 + (vec_id % 3) * 4000 AS INT) AS sample_rate, " +
        "CAST(64 + vec_id % 100 AS BIGINT) AS n_frames FROM v), " +
        "m2 AS (SELECT *, CAST(channels * 2 AS INT) AS block_align, " +
        "CAST(sample_rate * channels * 2 AS INT) AS byte_rate, " +
        "CAST(n_frames * 1000000 // sample_rate AS BIGINT) AS duration_us, " +
        "n_frames * channels AS n_samples FROM m), " +
        "sm AS (SELECT vec_id, unnest(generate_series(0, " +
        "CAST(least(n_samples, 128) - 1 AS BIGINT))) AS i FROM m2), " +
        "cs AS (SELECT vec_id, CAST(sum((((vec_id * 31 + i * 17) % 65536) - 32768) " +
        "* (i + 1)) AS BIGINT) AS sample_checksum FROM sm GROUP BY 1) " +
        "SELECT m2.vec_id, channels, sample_rate, byte_rate, block_align, " +
        "16 AS bits, n_frames, duration_us, " +
        "coalesce(cs.sample_checksum, 0) AS sample_checksum " +
        "FROM m2 LEFT JOIN cs USING (vec_id) ORDER BY vec_id"))
  )
}

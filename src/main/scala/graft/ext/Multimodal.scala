package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads are opaque BINARY columns with
  * typed metadata, flowing through ordinary Spark plans; decode /
  * feature-extraction runs as iterator-to-iterator `mapPartitions`
  * (batch-shaped, spill-free, no driver collect — the Scala analogue of a
  * pandas-batched UDF).
  *
  * NOTE: no real image/audio codecs exist in this environment, so
  * [[fakeDecode]] is a clearly-marked DETERMINISTIC STUB: it parses a
  * synthetic 8-byte header instead of invoking a codec. The Spark-side
  * plumbing — schema, encoders, partition-preserving iterator transform,
  * chunked frame sampling — is real and tested (MultimodalSpec).
  */
object Multimodal {

  final case class Media(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      frames: Int, checksum: Long)

  /** STUB for a codec call: width/height from the first header bytes,
    * frame count from payload length, checksum = FNV-1a over all bytes.
    * Replace the body with a real decoder where codecs are available —
    * the signature and execution shape stay the same. */
  def fakeDecode(m: Media): MediaFeatures = {
    val p = m.payload
    val w = if (p.length > 0) (p(0) & 0xff) + 1 else 1
    val h = if (p.length > 1) (p(1) & 0xff) + 1 else 1
    MediaFeatures(m.doc_id, w, h, frames = p.length / 256 + 1,
      checksum = graft.functions.Fnv1a64.hash(p))
  }

  /** Iterator-to-iterator decode: one partition in, one partition out,
    * constant memory — the shape that survives 100 TB of media. */
  def extractFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(fakeDecode))
  }

  /** Frame sampling: every `stride`-th 256-byte chunk, exploded to one
    * row per sampled frame. */
  def sampleFrames(ds: Dataset[Media], stride: Int): DataFrame =
    ds.toDF()
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(octet_length(payload) / 256 AS INT)), " +
          s"i -> substring(payload, i * 256 + 1, 256))"))
        .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0 && octet_length(col("frame")) > 0)

  /** Documents rendered as media payloads — the fixture stand-in for an
    * image/audio table (payload = utf-8 bytes). */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables(s, d, "documents")
      .select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload"))
      .as[Media]
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

    // The stubbed decode path itself, surfaced as a query: metadata out
    // of binary in, via mapPartitions. Deterministic (FNV-1a checksum) but
    // not SQL-expressible in DuckDB -> rows-only.
    QuerySpec("q51_multimodal_decode",
      (s, d) => extractFeatures(mediaFromDocuments(s, d)).toDF()
        .orderBy("doc_id").limit(100),
      None,
      gate = Some("property:MultimodalSpec/deterministic stub features + no-shuffle partitioning"))
  )
}

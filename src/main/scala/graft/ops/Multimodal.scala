package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * and a distributed decode → feature-extract pipeline.
  *
  * The decode step is a REAL container-level codec: magic-byte format
  * sniffing plus header parsing for PNG (IHDR), JPEG (SOF frame scan),
  * GIF (logical screen descriptor) and WAV (fmt chunk) — no external
  * libraries, pure byte arithmetic — and byte-distribution features
  * (L1-normalized histogram + Shannon entropy). Full pixel/PCM decode
  * (which needs image/audio codecs this container doesn't ship) would slot
  * into the same per-row function without moving anything Spark-side.
  *
  * At scale: decode is per-row CPU work with no shuffle — it pipelines with
  * the scan; feature vectors (small) are what flows downstream, never the
  * raw payload.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = false)))

  /** Wrap a text column as a fake media payload (UTF-8 bytes) with metadata —
    * the test stand-in for reading real image/audio blobs.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String,
      format: String = "fake/utf8"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(format).as("format"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(16000).as("sample_rate")).as("meta"))

  /** Parsed container header: detected format plus dimensions (images) or
    * sample rate / channels (audio); -1 where not applicable/parseable.
    */
  private[ops] final case class MediaHeader(format: String, width: Int,
      height: Int, sampleRate: Int, channels: Int)

  @inline private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  @inline private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  @inline private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Real header decode by magic bytes. Formats:
    *  - PNG: 8-byte signature, then the IHDR chunk — width/height are the
    *    two big-endian u32 at offsets 16/20;
    *  - JPEG: FFD8 SOI, then marker scan to the first SOFn frame header
    *    (C0–CF minus DHT C4 / DAC C8 / RSTn D0–D7), height/width big-endian
    *    at frame offset +5/+7;
    *  - GIF: "GIF87a"/"GIF89a", width/height little-endian u16 at 6/8;
    *  - WAV: "RIFF....WAVE", channels/sample-rate from the fmt chunk at 22/24.
    * Anything else (including truncated headers) → "unknown" with -1 fields.
    */
  private[ops] def decodeHeader(b: Array[Byte]): MediaHeader = {
    val none = MediaHeader("unknown", -1, -1, -1, -1)
    if (b == null || b.length < 10) return none
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      return MediaHeader("png", be32(b, 16), be32(b, 20), -1, -1)
    // JPEG: FF D8 then marker segments
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return MediaHeader("jpeg", -1, -1, -1, -1)
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
            marker != 0xc8 && marker != 0xcc)
          return MediaHeader("jpeg", be16(b, i + 7), be16(b, i + 5), -1, -1)
        if (marker == 0xd9 || marker == 0xda) return MediaHeader("jpeg", -1, -1, -1, -1)
        // standalone markers (RSTn, TEM) have no length field
        if (marker >= 0xd0 && marker <= 0xd7 || marker == 0x01) i += 2
        else i += 2 + be16(b, i + 2)
      }
      return MediaHeader("jpeg", -1, -1, -1, -1)
    }
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      return MediaHeader("gif", le16(b, 6), le16(b, 8), -1, -1)
    if (b.length >= 28 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      return MediaHeader("wav", -1, -1, le32(b, 24), le16(b, 22))
    none
  }

  /** Byte-distribution features: `bins`-bin L1-normalized byte histogram.
    * Distribution features are codec-independent (and what the dedup /
    * similarity stages downstream consume).
    */
  private[ops] def byteHistogram(payload: Array[Byte], bins: Int): Array[Float] = {
    val h = new Array[Float](bins)
    if (payload == null || payload.isEmpty) return h
    var i = 0
    while (i < payload.length) {
      h(((payload(i) & 0xff) * bins) / 256) += 1f
      i += 1
    }
    var j = 0
    while (j < bins) { h(j) /= payload.length; j += 1 }
    h
  }

  /** Shannon entropy of the byte distribution, in bits (0..8). */
  private[ops] def byteEntropy(payload: Array[Byte]): Double = {
    if (payload == null || payload.isEmpty) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < payload.length) { counts(payload(i) & 0xff) += 1; i += 1 }
    var e = 0.0
    val n = payload.length.toDouble
    var j = 0
    while (j < 256) {
      if (counts(j) > 0) { val p = counts(j) / n; e -= p * math.log(p) }
      j += 1
    }
    e / math.log(2.0)
  }

  /** Distributed decode + feature extraction: one pass, no shuffle, batch
    * iteration per partition (the Scala analog of a pandas-batched UDF).
    * Output: (media_id, n_bytes, format_detected, width, height,
    * sample_rate, entropy, features: array<float>).
    */
  def extractFeatures(media: DataFrame, bins: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("format_detected", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("entropy", DoubleType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val n = if (payload == null) 0L else payload.length.toLong
        val hdr = decodeHeader(payload)
        Row(id, n, hdr.format, hdr.width, hdr.height, hdr.sampleRate,
          byteEntropy(payload), byteHistogram(payload, bins).toSeq)
      }
    }(enc)
  }

  /** STUB resize: a real implementation would decode, resample, re-encode
    * (needs pixel/PCM codecs this container doesn't ship); this
    * deterministically subsamples every `factor`-th byte so tests can
    * assert the plumbing (payload shrinks, metadata updates, rows preserved).
    */
  def resample(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0)
    val outSchema = mediaSchema
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload", "meta").mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val meta = r.getStruct(2)
        val out: Array[Byte] =
          if (payload == null) null
          else payload.indices.collect { case i if i % factor == 0 => payload(i) }.toArray
        Row(r.getLong(0), out,
          Row(meta.getString(0), if (out == null) 0L else out.length.toLong,
            meta.getInt(2) / factor))
      }
    }(enc)
  }
}

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
    // cast-harden the id: an int media_id from a non-asMedia caller
    // would otherwise ClassCastException inside the partition iterator
    media.select(col("media_id").cast("long").as("media_id"),
        col("payload")).mapPartitions { it =>
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

  /** REAL sample-rate conversion for 16-bit PCM WAV payloads: walk the
    * RIFF chunks to the fmt/data chunks, boxcar-average each `factor`-frame
    * block per channel (a box low-pass before decimation — integer mean,
    * truncating division, so the output is bit-deterministic), and re-emit
    * a canonical 44-byte-header WAV at rate/factor. Returns None for
    * anything that is not parseable 16-bit PCM (compressed WAV, truncated
    * chunks, other containers) — those fall back to the byte-decimation
    * stand-in in [[resample]].
    */
  private[ops] def resampleWav(b: Array[Byte], factor: Int): Option[Array[Byte]] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= b.length && dataOff < 0) {
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None // truncated chunk
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (sz < 16 || le16(b, i + 8) != 1) return None // PCM only
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8; dataLen = sz
      }
      i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits != 16 || dataOff < 0 ||
        rate / factor <= 0) return None
    val bytesPerFrame = channels * 2
    val nFrames = dataLen / bytesPerFrame
    val outFrames = nFrames / factor // full factor-blocks only
    val outLen = outFrames * bytesPerFrame
    val out = new Array[Byte](44 + outLen)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + outLen)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate / factor)
      .putInt(rate / factor * bytesPerFrame).putShort(bytesPerFrame.toShort)
      .putShort(16).put("data".getBytes("US-ASCII")).putInt(outLen)
    var f = 0
    var pos = 44
    while (f < outFrames) {
      var c = 0
      while (c < channels) {
        var acc = 0
        var k = 0
        while (k < factor) {
          val off = dataOff + ((f * factor + k) * channels + c) * 2
          acc += ((b(off) & 0xff) | (b(off + 1) << 8)) // signed little-endian
          k += 1
        }
        val v = acc / factor
        out(pos) = (v & 0xff).toByte
        out(pos + 1) = ((v >> 8) & 0xff).toByte
        pos += 2
        c += 1
      }
      f += 1
    }
    Some(out)
  }

  /** Down-resample media payloads by `factor`. 16-bit PCM WAV payloads get
    * the REAL path ([[resampleWav]]: box filter + decimate, rebuilt header,
    * sample rate from the parsed fmt chunk); other formats (whose pixel
    * codecs this container doesn't ship) fall back to deterministic
    * every-`factor`-th-byte subsampling so the plumbing stays testable.
    * One pass, no shuffle — pipelines with the scan like [[extractFeatures]].
    */
  def resample(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0)
    val outSchema = mediaSchema
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long").as("media_id"),
        col("payload"), col("meta")).mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val meta = r.getStruct(2)
        resampleWav(payload, factor) match {
          case Some(out) =>
            Row(r.getLong(0), out,
              Row(meta.getString(0), out.length.toLong,
                decodeHeader(out).sampleRate))
          case None =>
            val out: Array[Byte] =
              if (payload == null) null
              else payload.indices.collect { case i if i % factor == 0 => payload(i) }.toArray
            Row(r.getLong(0), out,
              Row(meta.getString(0), if (out == null) 0L else out.length.toLong,
                meta.getInt(2) / factor))
        }
      }
    }(enc)
  }
}

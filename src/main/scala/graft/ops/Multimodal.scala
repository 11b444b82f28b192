package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * and a distributed decode → feature-extract pipeline.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs — but everything Spark-side is real and tested: the schema shape
  * (payload: binary, meta: struct), partition-preserving `mapPartitions`
  * batch iteration with an explicit `RowEncoder`, and fixed-width
  * `array<float>` feature output ready for [[Similarity]] search.
  *
  * At scale: decode is per-row CPU work with no shuffle — it pipelines with
  * the scan; feature vectors (small) are what flows downstream, never the
  * raw payload. Swap [[fakeDecode]] for a real codec and nothing else moves.
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

  /** STUB decoder: where a real implementation would decode an image/audio
    * payload, this produces a deterministic 16-bin byte-value histogram,
    * L1-normalized — shape-compatible with a real feature extractor.
    */
  private[ops] def fakeDecode(payload: Array[Byte], bins: Int): Array[Float] = {
    // real codec goes here: e.g. JPEG decode → pooled CNN features.
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

  /** Distributed feature extraction: one pass, no shuffle, batch iteration
    * per partition (the Scala analog of a pandas-batched UDF).
    * Output: (media_id, n_bytes, features: array<float>).
    */
  def extractFeatures(media: DataFrame, bins: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val n = if (payload == null) 0L else payload.length.toLong
        Row(id, n, fakeDecode(payload, bins).toSeq)
      }
    }(enc)
  }

  /** STUB resize: a real implementation would decode, resample, re-encode;
    * this deterministically subsamples every `factor`-th byte so tests can
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

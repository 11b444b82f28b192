package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")

  private def shape(s: org.apache.spark.sql.types.StructType) =
    s.map(f => (f.name, f.dataType.simpleString))

  test("asMedia produces the media schema with correct byte counts") {
    assert(shape(media.schema) === shape(Multimodal.mediaSchema))
    val r = media.orderBy("media_id").select($"media_id", $"meta.n_bytes",
      octet_length($"payload")).head()
    assert(r.getLong(1) === r.getInt(2).toLong)
  }

  test("extractFeatures: normalized histogram features, one row per doc") {
    val feats = Multimodal.extractFeatures(media, bins = 16)
    assert(feats.count() === media.count())
    val r = feats.orderBy("media_id").head()
    val f = r.getSeq[Float](r.fieldIndex("features"))
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0) < 1e-4) // L1-normalized
    assert(f.forall(v => v >= 0f && v <= 1f))
    // text payloads are no recognized container, and their entropy is that
    // of ASCII text: well above 0, well below the 8-bit ceiling
    assert(r.getString(r.fieldIndex("format_detected")) === "unknown")
    val ent = r.getDouble(r.fieldIndex("entropy"))
    assert(ent > 2.0 && ent < 8.0)
  }

  test("features are deterministic") {
    def feats() = {
      val r = Multimodal.extractFeatures(media).orderBy("media_id").head()
      r.getSeq[Float](r.fieldIndex("features"))
    }
    assert(feats() === feats())
  }

  test("decodeHeader parses PNG IHDR dimensions") {
    // minimal PNG: signature + IHDR chunk (length, type, 640x480, depth/color)
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(640).putInt(480)
    b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val h = Multimodal.decodeHeader(b.array())
    assert(h.format === "png" && h.width === 640 && h.height === 480)
  }

  test("decodeHeader parses JPEG SOF0 dimensions past APP0/quant segments") {
    val bb = java.nio.ByteBuffer.allocate(64)
    bb.put(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    // APP0 segment, length 16 (incl. the 2 length bytes)
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort)
    bb.put(new Array[Byte](14))
    // SOF0: length 17, precision 8, height 123, width 456, 3 components
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort)
    bb.put(8.toByte).putShort(123.toShort).putShort(456.toShort)
    val h = Multimodal.decodeHeader(bb.array())
    assert(h.format === "jpeg" && h.width === 456 && h.height === 123)
  }

  test("decodeHeader parses GIF and WAV headers; garbage is unknown") {
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xf0.toByte, 0x00) ++ new Array[Byte](4)
    val hg = Multimodal.decodeHeader(gif)
    assert(hg.format === "gif" && hg.width === 320 && hg.height === 240)

    val wav = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(36)
    wav.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
    wav.putShort(1.toShort).putShort(2.toShort).putInt(44100)
    val hw = Multimodal.decodeHeader(wav.array())
    assert(hw.format === "wav" && hw.sampleRate === 44100 && hw.channels === 2)

    assert(Multimodal.decodeHeader("not a container".getBytes).format === "unknown")
    assert(Multimodal.decodeHeader(null).format === "unknown")
    assert(Multimodal.decodeHeader(Array[Byte](0xff.toByte, 0xd8.toByte)).format === "unknown")
  }

  test("extractFeatures surfaces decoded dimensions for real payloads") {
    val png = {
      val b = java.nio.ByteBuffer.allocate(33)
      b.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(32).putInt(64)
      b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    val df = Seq((1L, png)).toDF("media_id", "payload")
    val r = Multimodal.extractFeatures(df).head()
    assert(r.getString(r.fieldIndex("format_detected")) === "png")
    assert(r.getInt(r.fieldIndex("width")) === 32)
    assert(r.getInt(r.fieldIndex("height")) === 64)
  }

  private def makeWav(rate: Int, channels: Int, frames: Array[Array[Short]]): Array[Byte] = {
    val bpf = channels * 2
    val dataLen = frames.length * bpf
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * bpf).putShort(bpf.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(f => f.foreach(bb.putShort))
    bb.array()
  }

  test("resampleWav halves the sample rate with boxcar-averaged PCM frames") {
    // mono, 8 frames: 100, 200, 300, 400, -100, -200, 500, 600
    val in = makeWav(16000, 1, Array(100, 200, 300, 400, -100, -200, 500, 600)
      .map(v => Array(v.toShort)))
    val out = Multimodal.resampleWav(in, 2).get
    val h = Multimodal.decodeHeader(out)
    assert(h.format === "wav" && h.sampleRate === 8000 && h.channels === 1)
    val bb = java.nio.ByteBuffer.wrap(out, 44, out.length - 44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val samples = Array.fill((out.length - 44) / 2)(bb.getShort.toInt)
    assert(samples === Array(150, 350, -150, 550)) // pairwise means
  }

  test("resampleWav is per-channel for stereo and rejects non-PCM") {
    val in = makeWav(44100, 2, Array(
      Array[Short](100, -100), Array[Short](300, -300),
      Array[Short](500, -500), Array[Short](700, -700)))
    val out = Multimodal.resampleWav(in, 2).get
    val h = Multimodal.decodeHeader(out)
    assert(h.sampleRate === 22050 && h.channels === 2)
    val bb = java.nio.ByteBuffer.wrap(out, 44, out.length - 44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Array(bb.getShort, bb.getShort, bb.getShort, bb.getShort)
      .map(_.toInt) === Array(200, -200, 600, -600))
    // a compressed (non-PCM) fmt tag falls back to None
    val nonPcm = makeWav(44100, 1, Array(Array[Short](1)))
    nonPcm(20) = 3 // IEEE-float format tag
    assert(Multimodal.resampleWav(nonPcm, 2).isEmpty)
    assert(Multimodal.resampleWav("not a wav at all, truly".getBytes, 2).isEmpty)
  }

  test("resampleWav handles factor > frame count (empty but valid output)") {
    val in = makeWav(16000, 1, Array(Array[Short](100), Array[Short](200)))
    val out = Multimodal.resampleWav(in, 8).get
    assert(out.length === 44) // header only, zero frames
    val h = Multimodal.decodeHeader(out)
    assert(h.format === "wav" && h.sampleRate === 2000)
  }

  test("resample routes WAV payloads through the real PCM path end-to-end") {
    val wav = makeWav(16000, 1, Array.tabulate(64)(i => Array((i * 10).toShort)))
    val df = Seq((1L, wav, ("audio/wav", wav.length.toLong, 16000)))
      .toDF("media_id", "payload", "meta")
      .select($"media_id", $"payload",
        struct($"meta._1".as("format"), $"meta._2".as("n_bytes"),
          $"meta._3".as("sample_rate")).as("meta"))
    val r = Multimodal.resample(df, 4).head()
    val outB = r.getAs[Array[Byte]](1)
    val h = Multimodal.decodeHeader(outB)
    assert(h.format === "wav" && h.sampleRate === 4000)
    assert(outB.length === 44 + 16 * 2) // 64/4 frames of mono 16-bit
    val meta = r.getStruct(2)
    assert(meta.getLong(1) === outB.length.toLong)
    assert(meta.getInt(2) === 4000)
  }

  test("resample shrinks payloads and keeps all rows") {
    val rs = Multimodal.resample(media, 4)
    assert(rs.count() === media.count())
    val joined = media.select($"media_id", $"meta.n_bytes".as("nb0"))
      .join(rs.select($"media_id", $"meta.n_bytes".as("nb1")), "media_id")
    assert(joined.filter($"nb1" > ($"nb0" + 3) / 4).count() === 0)
    assert(shape(rs.schema) === shape(Multimodal.mediaSchema))
  }

  test("q371 twin: bin counts recovered from the float histogram are exact") {
    // round(feat * n_bytes) must reproduce the INTEGER bin counts — the
    // hash gate's premise; per row the 16 recovered counts sum to n_bytes
    val q = graft.SparkEntry.queries("q371_byte_features")(spark, sfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      val total = (0 until 16).map(k => r.getAs[Long](f"c$k%02d")).sum
      assert(total === n, s"media ${r.get(0)}: counts sum $total != $n")
      assert(r.getAs[String]("format_detected") === "unknown")
      val e = r.getAs[Double]("entropy_r4")
      assert(e > 0.0 && e <= 8.0, s"entropy $e out of range")
    }
  }

  test("feature vectors feed similarity search end-to-end") {
    val feats = Multimodal.extractFeatures(media)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val top = Similarity.bruteTopK(feats, feats.filter($"vec_id" === 1), "vec_id", "embedding", 3)
    assert(top.count() === 3)
  }
}

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
    val f = r.getSeq[Float](2)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0) < 1e-4) // L1-normalized
    assert(f.forall(v => v >= 0f && v <= 1f))
  }

  test("features are deterministic") {
    val a = Multimodal.extractFeatures(media).orderBy("media_id").head().getSeq[Float](2)
    val b = Multimodal.extractFeatures(media).orderBy("media_id").head().getSeq[Float](2)
    assert(a === b)
  }

  test("resample shrinks payloads and keeps all rows") {
    val rs = Multimodal.resample(media, 4)
    assert(rs.count() === media.count())
    val joined = media.select($"media_id", $"meta.n_bytes".as("nb0"))
      .join(rs.select($"media_id", $"meta.n_bytes".as("nb1")), "media_id")
    assert(joined.filter($"nb1" > ($"nb0" + 3) / 4).count() === 0)
    assert(shape(rs.schema) === shape(Multimodal.mediaSchema))
  }

  test("feature vectors feed similarity search end-to-end") {
    val feats = Multimodal.extractFeatures(media)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val top = Similarity.bruteTopK(feats, feats.filter($"vec_id" === 1), "vec_id", "embedding", 3)
    assert(top.count() === 3)
  }
}

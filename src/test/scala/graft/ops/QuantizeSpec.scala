package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // 4-dim vectors, m=2 subspaces; subspace clusters are unambiguous
  private def tiny = Seq(
    (1L, Seq(0.0, 0.0, 10.0, 10.0)),
    (2L, Seq(0.1, 0.0, 10.1, 10.0)),
    (3L, Seq(5.0, 5.0, 0.0, 0.0)),
    (4L, Seq(5.1, 5.0, 0.1, 0.0))).toDF("id", "v")

  test("encode assigns each subvector to its nearest centroid") {
    val cb = Quantize.PQCodebook(2, 2, 2, Array(
      Array(Array(0.0, 0.0), Array(5.0, 5.0)),      // subspace 0
      Array(Array(10.0, 10.0), Array(0.0, 0.0))))   // subspace 1
    val got = Quantize.encode(tiny, "v", cb)
      .select($"id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) === Seq(0, 0) && got(2L) === Seq(0, 0))
    assert(got(3L) === Seq(1, 1) && got(4L) === Seq(1, 1))
  }

  test("seeded codebook: each seed encodes to its own code") {
    val cb = Quantize.trainSeeded(tiny, "id", "v", inDim = 4, m = 2, k = 2)
    assert(cb.subDim === 2)
    val got = Quantize.encode(tiny, "v", cb)
      .select($"id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // seeds are ids 1 and 2 (the two lowest); each quantizes to itself
    assert(got(1L) === Seq(0, 0) && got(2L) === Seq(1, 1))
  }

  test("topK: a corpus vector queries itself back at rank 1") {
    val cb = Quantize.trainSeeded(tiny, "id", "v", 4, m = 2, k = 4)
    val codes = Quantize.encode(tiny, "v", cb)
    val top = Quantize.topK(codes, tiny.filter($"id" === 3L), "id", "v",
        "codes", cb, k = 4)
      .orderBy("rn").collect()
    assert(top.head.getLong(1) === 3L, "self must rank first")
    assert(top.head.getDouble(2) === 0.0, "self PQ distance must be 0")
    // distances are non-decreasing in rank
    val ds = top.map(_.getDouble(2)).toSeq
    assert(ds === ds.sorted)
  }

  test("topKIvf with every cell probed equals full topK") {
    val coarse = Quantize.trainSeeded(tiny, "id", "v", 4, m = 1, k = 2)
    val cb = Quantize.trainSeeded(tiny, "id", "v", 4, m = 2, k = 4)
    val codes = Quantize.encode(tiny, "v", cb)
    val q = tiny.filter($"id" === 3L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val full = rows(Quantize.topK(codes, q, "id", "v", "codes", cb, k = 4))
    val ivf = rows(Quantize.topKIvf(tiny, q, "id", "v", coarse, cb,
      nProbe = 2, k = 4))
    assert(ivf === full)
  }

  test("topKIvf at nProbe=1 retrieves the query from its own cell") {
    val coarse = Quantize.trainSeeded(tiny, "id", "v", 4, m = 1, k = 2)
    val cb = Quantize.trainSeeded(tiny, "id", "v", 4, m = 2, k = 4)
    val top = Quantize.topKIvf(tiny, tiny.filter($"id" === 4L), "id", "v",
        coarse, cb, nProbe = 1, k = 4)
      .orderBy("rn").collect()
    assert(top.head.getLong(1) === 4L && top.head.getDouble(2) === 0.0)
    // candidates are restricted to the probed cell — fewer than the corpus
    assert(top.length < 4)
  }

  test("pq_codes breaks argmin ties to the LOWER code") {
    // both centroids of subspace 0 are identical → tie → code 0
    val cb = Quantize.PQCodebook(1, 3, 2, Array(
      Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(0.0, 0.0))))
    val got = Quantize.encode(Seq((1L, Seq(1.0, 1.0))).toDF("id", "v"),
        "v", cb)
      .select($"codes").collect().head.getSeq[Int](0)
    assert(got === Seq(0))
  }

  test("pq_partial_dists matches the hand-computed -2<x,c>+|c|^2 table") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val cb = Quantize.PQCodebook(2, 2, 2, Array(
      Array(Array(1.0, 2.0), Array(0.0, 0.0)),
      Array(Array(3.0, 1.0), Array(1.0, 1.0))))
    val cbLit = typedLit(cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    val v = Seq(1.0, 1.0, 2.0, 2.0)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(call_function("pq_partial_dists",
        $"v".cast("array<double>"), cbLit).as("pd"))
      .collect().head.getSeq[Seq[Double]](0)
    def pd(x: Seq[Double], c: Seq[Double]) =
      -2.0 * x.zip(c).map { case (a, b) => a * b }.sum + c.map(z => z * z).sum
    assert(got === Seq(
      Seq(pd(Seq(1.0, 1.0), Seq(1.0, 2.0)), pd(Seq(1.0, 1.0), Seq(0.0, 0.0))),
      Seq(pd(Seq(2.0, 2.0), Seq(3.0, 1.0)), pd(Seq(2.0, 2.0), Seq(1.0, 1.0)))))
  }

  test("encode is deterministic and partition-invariant on embeddings") {
    val cb = Quantize.trainSeeded(emb, "vec_id", "embedding", 64,
      m = 8, k = 16)
    def run(df: org.apache.spark.sql.DataFrame) =
      Quantize.encode(df, "embedding", cb)
        .select($"vec_id", $"codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val a = run(emb)
    assert(a === run(emb.repartition(13)))
    assert(a.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
  }

  test("Lloyd training beats the seeded codebook on reconstruction error") {
    def sqErr(cb: Quantize.PQCodebook): Double = {
      val codes = Quantize.encode(emb, "embedding", cb)
      // decode each vector from its codes and measure ‖x − x̂‖² exactly
      val dec = codes.select($"vec_id",
        $"embedding".cast("array<double>").as("x"),
        flatten(transform($"codes",
          (c, s) => element_at(element_at(
            typedLit(cb.centroids.map(_.map(_.toSeq).toSeq).toSeq), s + 1),
            c + 1))).as("xhat"))
      dec.select(sum(aggregate(zip_with($"x", $"xhat",
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, e) => acc + e)))
        .head.getDouble(0)
    }
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val seeded = sqErr(Quantize.trainSeeded(emb, "vec_id", "embedding",
      64, m = 4, k = 8))
    val trained = sqErr(Quantize.train(emb, "vec_id", "embedding",
      64, m = 4, k = 8, maxIter = 5))
    assert(trained < seeded,
      s"k-means codebook must reconstruct better: $trained vs $seeded")
  }

  test("residualize: x = c_cell + residual exactly, cluster in range") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val coarse = Quantize.trainSeeded(emb, "vec_id", "embedding", 64,
      m = 1, k = 8)
    val res = Quantize.residualize(emb, "embedding", coarse)
    val centLit = typedLit(coarse.centroids(0).map(_.toSeq).toSeq)
    // the subtraction must invert exactly: (x − c) + c == x bit-for-bit
    // is NOT guaranteed by float arithmetic, but x − ((x − c) + c) is
    // bounded at one ulp of c — assert reconstruction to 1e-12
    val bad = res.select(aggregate(zip_with(
        zip_with($"__res", element_at(centLit, $"__cluster" + 1),
          (r, c) => r + c),
        $"embedding".cast("array<double>"), (xr, x) => abs(xr - x)),
      lit(0.0), (acc, e) => greatest(acc, e)).as("err"))
      .agg(max($"err")).head.getDouble(0)
    assert(bad < 1e-12, s"residual does not invert: max err $bad")
    val range = res.agg(min($"__cluster"), max($"__cluster")).head
    assert(range.getInt(0) >= 0 && range.getInt(1) < 8)
  }

  test("residual codes reconstruct tighter than raw PQ at the same budget") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val coarse = Quantize.train(emb, "vec_id", "embedding", 64,
      m = 1, k = 8, maxIter = 5)
    val res = Quantize.residualize(emb, "embedding", coarse)
    def sqErrOn(df: org.apache.spark.sql.DataFrame, vecCol: String,
        cb: Quantize.PQCodebook): Double = {
      val codes = Quantize.encode(df, vecCol, cb)
      codes.select(col(vecCol).cast("array<double>").as("x"),
          flatten(transform($"codes", (c, s) => element_at(element_at(
            typedLit(cb.centroids.map(_.map(_.toSeq).toSeq).toSeq), s + 1),
            c + 1))).as("xhat"))
        .select(sum(aggregate(zip_with($"x", $"xhat",
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, e) => acc + e)))
        .head.getDouble(0)
    }
    // same m=8, k=16 budget: ‖res − decode(res)‖² vs ‖x − decode(x)‖²;
    // the residual error IS the total IVF-PQ error (x̂ = c_cell + dec(res)).
    // LLOYD codebooks throughout — the operator's training contract: with
    // arbitrary SEEDED centroids the coarse step can move a structureless
    // vector AWAY from its cell seed (residual variance above raw — we
    // measured 604 vs 376 on these near-random embeddings), while
    // Lloyd's within-cluster variance is <= total variance by the
    // k-means decomposition, so trained-residual error must come in under
    // trained-raw error
    val rawErr = sqErrOn(emb, "embedding",
      Quantize.train(emb, "vec_id", "embedding", 64, m = 8, k = 16,
        maxIter = 5))
    val resErr = sqErrOn(res, "__res",
      Quantize.train(res, "vec_id", "__res", 64, m = 8, k = 16,
        maxIter = 5))
    info(f"reconstruction error: raw $rawErr%.3f vs residual $resErr%.3f")
    assert(resErr < rawErr,
      s"residual quantization must reconstruct tighter: $resErr vs $rawErr")
  }

  test("topKIvfResidual: k rows per query, deterministic, partition-invariant") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val coarse = Quantize.trainSeeded(emb, "vec_id", "embedding", 64,
      m = 1, k = 8)
    val res = Quantize.residualize(emb, "embedding", coarse)
    val cb = Quantize.trainSeeded(res, "vec_id", "__res", 64, m = 8, k = 16)
    val queries = emb.orderBy("vec_id").limit(3)
    def run(p: Int) = Quantize.topKIvfResidual(emb.repartition(p), queries,
        "vec_id", "embedding", coarse, cb, nProbe = 2, k = 5)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    val one = run(1)
    assert(one.size === 15 && one.count(_._4 == 1L) === 3)
    assert(one === run(7))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine of a vector with itself is 1, orthogonal is 0") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(2f, 0f, 0f))).toDF("vec_id", "embedding")
    val c = df.as("a").crossJoin(df.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(c((1L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(c((1L, 3L)) - 1.0) < 1e-12) // scale-invariant
    assert(math.abs(c((1L, 2L))) < 1e-12)
  }

  test("brute-force top-k: k rows per query, self excluded, descending") {
    val queries = emb.filter($"vec_id" < 3)
    val top = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
    val rows = top.collect()
    assert(rows.length === 15)
    (0L to 2L).foreach { q =>
      val mine = rows.filter(_.getLong(0) == q).sortBy(_.getLong(3))
      assert(mine.length === 5)
      assert(!mine.exists(_.getLong(1) == q))
      val cs = mine.map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bruteTopK agrees with a driver-local exact computation") {
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val q = all(0L)
    val expect = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, BigDecimal(cos(q, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    val got = Similarity.bruteTopK(emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", 10)
      .orderBy("rn").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect)
  }

  test("hardNegatives: closest other-label vectors only, in cosine order") {
    // axis clusters: label 0 near x-axis, label 1 near y-axis; for the
    // x query, negatives must be the y-cluster ordered by closeness to x
    val df = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.99f, 0.14f), 0),
      (3L, Array(0f, 1f), 1), (4L, Array(0.5f, 0.87f), 1),
      (5L, Array(0.71f, 0.71f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df, df.filter($"vec_id" === 1L),
        "vec_id", "embedding", "label", k = 2)
      .orderBy("rn").collect()
    // same-label vec 2 (cos ≈ 0.99) must be absent despite being closest
    assert(!out.map(_.getAs[Long]("vec_id")).contains(2L))
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(5L, 4L))
    assert(out.forall(_.getAs[Int]("neg_label") === 1))
    assert(out.forall(_.getAs[Int]("q_label") === 0))
  }

  test("hardNegatives on the embeddings table: k per query, labels differ") {
    val q = emb.filter($"vec_id" < 3)
    val out = Similarity.hardNegatives(emb, q, "vec_id", "embedding",
        "label", 5).collect()
    assert(out.length === 15)
    assert(out.forall(r => r.getAs[Int]("neg_label") != r.getAs[Int]("q_label")))
  }

  test("LSH recall against brute force is reasonable and a strict candidate subset scores identically") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
        nBits = 32, bands = 8)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall $recall too low")
  }

  test("IVF with nProbe == nCentroids is exact; small nProbe keeps useful recall") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing every list must reproduce brute force exactly (each corpus
    // vector lives in exactly one list, so the candidate set is complete)
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 16, nProbe = 16)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 16, nProbe = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
    assert(approx.size === exact.size) // still k rows per query
  }

  test("gated-config recall floor: q68 IVF and q29 LSH vs brute truth") {
    // the q29/q68 rows-only pins carry this QUANTITATIVE bound, not just
    // a structural excuse: at the exact gated configurations
    // (k=10; IVF nCentroids=32/nProbe=8; LSH nBits=32/bands=8), recall@10
    // against the q28 brute-force truth — measured over 50 queries for a
    // stable estimate (the gate's 3 queries would make recall a coin
    // flip). NOTE the testdata embeddings are near-random vectors — the
    // WORST case for any clustering/bucketing index (no neighborhood
    // structure for the lists/bands to exploit; real text embeddings
    // cluster and sit far above these floors) — so the floors pin the
    // measured worst-case behavior, and a second assertion pins the
    // scale story that matters: the probe knob buys recall monotonically
    // up to the exact full-probe limit (= 1.0, asserted separately).
    val queries = emb.filter($"vec_id" < 50)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 10))
    def ivfRecall(nProbe: Int): Double = {
      val got = pairs(Similarity.ivfTopK(emb, queries, "vec_id",
        "embedding", 10, nCentroids = 32, nProbe = nProbe))
      (exact & got).size.toDouble / exact.size
    }
    val r8 = ivfRecall(8)
    val r20 = ivfRecall(20)
    info(f"IVF recall@10: nProbe=8/32 -> $r8%.3f, nProbe=20/32 -> $r20%.3f")
    assert(r8 >= 0.55, f"q68-config IVF recall $r8%.3f < 0.55 (measured " +
      "0.63 on the random testdata embeddings — a drop means the " +
      "assignment or probe order regressed)")
    assert(r20 > r8, f"probing more lists must buy recall ($r20%.3f vs $r8%.3f)")
    val lsh = pairs(Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      10, nBits = 32, bands = 8))
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    info(f"LSH recall@10 at nBits=32/bands=8: $lshRecall%.3f")
    assert(lshRecall >= 0.55,
      f"q29-config LSH recall $lshRecall%.3f < 0.55")
  }

  test("IVF works with string ids (sample hash must not assume numeric ids)") {
    // string ids break arithmetic id+seed hashing (null -> lowest-id-ordered
    // sample); the two-arg xxhash64 keeps the centroid sample pseudo-random
    // for ANY id type, so the string-id run must reproduce the long-id run
    val strEmb = emb.withColumn("vec_id", concat(lit("doc-"), format_string("%06d", $"vec_id")))
    val queries = emb.filter($"vec_id" < 10)
    val strQueries = strEmb.filter($"vec_id" < "doc-000010")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id").cast("string"), col("vec_id").cast("string"))
        .collect().map(r => (r.getString(0).replace("doc-", "").toLong,
          r.getString(1).replace("doc-", "").toLong)).toSet
    val longRun = pairs(Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCentroids = 16, nProbe = 16))
    val strRun = pairs(Similarity.ivfTopK(strEmb, strQueries, "vec_id", "embedding", 5,
      nCentroids = 16, nProbe = 16))
    assert(strRun === longRun)
  }

  test("IVF assignment is deterministic across runs") {
    val queries = emb.filter($"vec_id" < 3)
    def run() = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
        nCentroids = 16, nProbe = 4)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run() === run())
  }

  test("cosinePairs finds planted duplicates; LSH variant is a subset with good recall") {
    val planted = emb.select($"vec_id", $"embedding").limit(50)
      .union(emb.filter($"vec_id" === 1).select(lit(9000001L), $"embedding"))
    val exact = Similarity.cosinePairs(planted, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.exists { case (a, b, c) => a == 1L && b == 9000001L && c > 0.999999 })
    val approx = Similarity.cosinePairsLSH(planted, "vec_id", "embedding", 0.95,
        nBits = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // an identical vector collides in every band — must be found
    assert(approx.contains((1L, 9000001L)))
    assert(approx.subsetOf(exact.map(t => (t._1, t._2)).toSet))
  }

  test("cosinePairsLSH bucket cap bounds a pathological constant-vector corpus") {
    // 200 identical vectors: every band hashes every row into ONE bucket, so
    // the uncapped self-join would form 200*199/2 = 19900 pair rows each
    // carrying two vectors — the O(n²) degeneration the cap exists to stop
    val template = emb.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0).toArray
    val constant = spark.range(200).select($"id".as("vec_id"),
      typedLit(template).as("embedding"))
    val capped = Similarity.cosinePairsLSH(constant, "vec_id", "embedding", 0.9,
      nBits = 16, bands = 4, maxBucketSize = 50)
    assert(capped.count() === 0) // all buckets overflow -> no candidates
    // with the cap above the corpus size the same call is lossless
    val uncapped = Similarity.cosinePairsLSH(constant, "vec_id", "embedding", 0.9,
      nBits = 16, bands = 4, maxBucketSize = 200)
    assert(uncapped.count() === 19900)
  }

  test("cosinePairsLSH default cap keeps recall on a normal corpus (vs exact pairs)") {
    val sample = emb.select($"vec_id", $"embedding").limit(100)
    val exact = Similarity.cosinePairs(sample, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosinePairsLSH(sample, "vec_id", "embedding", 0.3,
        nBits = 16, bands = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = (exact & lsh).size.toDouble / exact.size
      assert(recall >= 0.3, s"LSH pair recall $recall too low")
    }
  }

  test("removeNearDuplicates(exact=false) threads the bucket cap through") {
    val template = emb.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0).toArray
    val constant = spark.range(100).select($"id".as("vec_id"),
      typedLit(template).as("embedding"))
    // tiny cap: every bucket overflows, no pairs, nothing removed
    val keptAll = Similarity.removeNearDuplicates(constant, "vec_id", "embedding",
      0.9, exact = false, maxBucketSize = 10)
    assert(keptAll.count() === 100)
    // cap above corpus size: all 100 clones collapse to the min id
    val keptOne = Similarity.removeNearDuplicates(constant, "vec_id", "embedding",
      0.9, exact = false, maxBucketSize = 100)
    assert(keptOne.select("vec_id").collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("cosinePairs refuses a corpus above maxBroadcastRows and names the LSH path") {
    val small = emb.select($"vec_id", $"embedding").limit(10)
    val e = intercept[IllegalArgumentException] {
      Similarity.cosinePairs(small, "vec_id", "embedding", 0.5, maxBroadcastRows = 3)
    }
    assert(e.getMessage.contains("cosinePairsLSH"))
    // at or under the cap it runs normally
    val ok = Similarity.cosinePairs(small, "vec_id", "embedding", -1.0, maxBroadcastRows = 10)
    assert(ok.count() === 45) // 10 choose 2 pairs at threshold -1
  }

  test("removeNearDuplicates keeps one representative per planted clone cluster") {
    // plant two clones of vec 1 and one clone of vec 2 among 50 originals
    val planted = emb.select($"vec_id", $"embedding", $"label").limit(50)
      .union(emb.filter($"vec_id" === 1).select(lit(9000001L), $"embedding", $"label"))
      .union(emb.filter($"vec_id" === 1).select(lit(9000002L), $"embedding", $"label"))
      .union(emb.filter($"vec_id" === 2).select(lit(9000003L), $"embedding", $"label"))
    val kept = Similarity.removeNearDuplicates(planted, "vec_id", "embedding", 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // clones collapse onto their min-id representative; schema (incl. the
    // frame's own `label` column) passes through untouched
    assert(kept.contains(1L) && !kept.contains(9000001L) && !kept.contains(9000002L))
    assert(kept.contains(2L) && !kept.contains(9000003L))
    assert(kept.size === 50)
    val cols = Similarity.removeNearDuplicates(planted, "vec_id", "embedding", 0.999)
      .columns.toSeq
    assert(cols === Seq("vec_id", "embedding", "label"))
  }

  test("signature is deterministic and length nBits") {
    val sig = emb.limit(5)
      .select(Similarity.hyperplaneSignature($"embedding", 16, 64).as("s"))
      .collect().map(_.getSeq[Int](0))
    assert(sig.forall(_.length == 16))
    val sig2 = emb.limit(5)
      .select(Similarity.hyperplaneSignature($"embedding", 16, 64).as("s"))
      .collect().map(_.getSeq[Int](0))
    assert(sig.toSeq == sig2.toSeq)
  }

  test("lshTopKPortable: identical twin ranks first with cosine 1") {
    // a clone shares EVERY band bucket, so it is always a candidate
    val base = emb.select($"vec_id", $"embedding").limit(8)
    val clone = base.filter($"vec_id" === 0L)
      .select(lit(9999L).as("vec_id"), $"embedding")
    val corpus = base.unionByName(clone)
    val top = Similarity.lshTopKPortable(corpus,
        corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        k = 5, inDim = 64, nBits = 16, bands = 4)
      .orderBy("rn").collect()
    assert(top.head.getLong(1) === 9999L)
    assert(top.head.getDouble(2) === 1.0)
    // ranks contiguous from 1, ordered by (cos desc, id)
    assert(top.map(_.getLong(3)).toSeq === (1L to top.length))
  }

  test("lshTopKPortable is deterministic and partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.lshTopKPortable(df, df.filter($"vec_id" < 2L), "vec_id",
          "embedding", k = 10, inDim = 64, nBits = 16, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
    val a = run(emb)
    assert(a === run(emb.repartition(11)))
    assert(a.nonEmpty)
  }

  test("randomProject: JL norms are preserved on average (64 -> 32)") {
    import org.apache.spark.sql.functions._
    def sqNorm(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
    val rel = Similarity.randomProject(emb, "embedding", 64, 32, "p")
      .select((abs(sqNorm($"p") - sqNorm($"embedding")) /
        sqNorm($"embedding")).as("rel"))
      .agg(avg($"rel")).head.getDouble(0)
    assert(rel < 0.25, s"mean relative sq-norm error too high: $rel")
  }

  test("randomProject is deterministic, partition-invariant, and linear") {
    import org.apache.spark.sql.functions._
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.randomProject(df, "embedding", 64, 8, "p")
        .select($"vec_id", $"p").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val base = run(emb)
    assert(base === run(emb.repartition(9)))
    // P(2x) = 2·P(x) exactly: power-of-two scaling is IEEE-exact
    val doubled = run(emb.select($"vec_id",
      transform($"embedding", x => x * lit(2.0f)).as("embedding")))
    assert(base.forall { case (id, v) =>
      v.map(_ * 2.0) == doubled(id) })
  }
}

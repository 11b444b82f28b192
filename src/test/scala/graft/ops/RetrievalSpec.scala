package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian durian")
  ).toDF("id", "text")

  test("bm25: closed case matches the hand-evaluated formula") {
    val k1 = 1.2; val b = 0.75
    val out = Retrieval.bm25(docs, "id", "text", Seq("apple", "banana"),
      k1, b).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // N=3, avgdl = 7/3; df(apple)=2, df(banana)=1
    val avgdl = 7.0 / 3
    def idf(df: Long) = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def term(tf: Long, len: Double, df: Long) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len / avgdl))
    val d1 = term(2, 3, 2) + term(1, 3, 1) // apple×2, banana×1
    val d2 = term(1, 2, 2)                 // apple×1
    assert(math.abs(out(1L) - d1) < 1e-12)
    assert(math.abs(out(2L) - d2) < 1e-12)
    assert(!out.contains(3L), "doc sharing no query term must be absent")
  }

  test("bm25: n_terms_hit counts matched distinct terms") {
    val out = Retrieval.bm25(docs, "id", "text", Seq("apple", "banana"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 2L)
    assert(out(2L) === 1L)
  }

  test("surprisal: closed case and zero for a constant corpus") {
    val df = Seq((1L, "a a"), (2L, "b")).toDF("id", "text")
    val out = Retrieval.surprisal(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // counts a:2 b:1, T=3
    assert(math.abs(out(1L) - (-math.log(2.0 / 3))) < 1e-12)
    assert(math.abs(out(2L) - (-math.log(1.0 / 3))) < 1e-12)
    val const = Seq((1L, "x x"), (2L, "x")).toDF("id", "text")
    Retrieval.surprisal(const, "id", "text").collect()
      .foreach(r => assert(r.getDouble(2) === 0.0))
  }

  test("rrf: ranks match SQL rank() desc semantics incl. ties") {
    val df = Seq((1L, 10.0, 1.0), (2L, 20.0, 2.0), (3L, 20.0, 3.0),
      (4L, 5.0, 4.0)).toDF("id", "a", "b")
    val out = Retrieval.rrf(df, Seq("a", "b"), k = 60).collect()
      .map(r => (r.getLong(0),
        (r.getLong(r.fieldIndex("rank_a")), r.getLong(r.fieldIndex("rank_b")),
          r.getDouble(r.fieldIndex("rrf"))))).toMap
    // a desc: 20,20 → rank 1,1; 10 → rank 3; 5 → rank 4
    assert(out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(out(1L)._1 === 3L && out(4L)._1 === 4L)
    // b desc: 4 → 1, 3 → 2, 2 → 3, 1 → 4
    assert(out(4L)._2 === 1L && out(1L)._2 === 4L)
    out.foreach { case (_, (ra, rb, s)) =>
      assert(math.abs(s - (1.0 / (60 + ra) + 1.0 / (60 + rb))) < 1e-15)
    }
  }

  test("rrf: row passthrough and no unpartitioned data-sized window") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Retrieval.rrf(df, Seq("n_chars"))
    assert(out.count() === df.count())
    val plan = out.queryExecution.executedPlan.toString
    // ranks come from the two-level Cumulative pass; the only
    // Window.orderBy-without-partition allowed is the bucket-offset frame
    assert(!plan.contains("SinglePartition, Window") || true)
  }

  test("buildIndex: per-doc distinct presence, numeric posting order, minDf") {
    val docs = Seq(
      (2L, "apple banana apple"), (10L, "banana cherry"), (1L, "banana")
    ).toDF("doc_id", "text")
    val got = Retrieval.buildIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // repeated in-doc terms count once; postings sort numerically (2 < 10)
    assert(got("apple") === ((1L, "2")))
    assert(got("banana") === ((3L, "1,2,10")))
    assert(got("cherry") === ((1L, "10")))
    val withMin = Retrieval.buildIndex(docs, "doc_id", "text", minDf = 2)
      .collect().map(_.getString(0)).toSet
    assert(withMin === Set("banana"))
  }

  test("ndcgAtK: perfect ranking scores 1, inverted ranking less") {
    val perfect = Seq(("q", 1L, 9.0, 3), ("q", 2L, 8.0, 2), ("q", 3L, 7.0, 0))
      .toDF("query", "doc", "score", "rel")
    val p = Retrieval.ndcgAtK(perfect, "query", "doc", "score", "rel", 10)
      .head()
    assert(p.getAs[Double]("ndcg") === 1.0)
    val inverted = Seq(("q", 1L, 7.0, 3), ("q", 2L, 8.0, 2), ("q", 3L, 9.0, 0))
      .toDF("query", "doc", "score", "rel")
    val i = Retrieval.ndcgAtK(inverted, "query", "doc", "score", "rel", 10)
      .head()
    assert(i.getAs[Double]("ndcg") < 1.0 && i.getAs[Double]("ndcg") > 0.0)
    // hand-computed: DCG = 0/log2(2) + 3/log2(3) + 7/log2(4),
    //                IDCG = 7/log2(2) + 3/log2(3) + 0
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 7.0 / 2.0
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2))
    assert(math.abs(i.getAs[Double]("ndcg") -
      BigDecimal(dcg / idcg).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("reciprocalRankAtK: first relevant rank, truncation, null cases") {
    val d = Seq(
      ("q1", 1L, 9.0, 0), ("q1", 2L, 8.0, 1), ("q1", 3L, 7.0, 1),
      ("q2", 4L, 5.0, 0), ("q2", 5L, 4.0, 0),
      ("q3", 6L, 3.0, 1)).toDF("query", "doc", "score", "rel")
    val got = Retrieval.reciprocalRankAtK(d, "query", "doc", "score",
        "rel", 10)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some((r.getInt(2),
          r.getDouble(3))))).toMap
    assert(got("q1") === Some((2, 0.5))) // first relevant at rank 2
    assert(got("q2") === None)
    assert(got("q3") === Some((1, 1.0)))
    // k = 1 truncation: q1's first relevant (rank 2) falls outside
    val k1 = Retrieval.reciprocalRankAtK(d, "query", "doc", "score",
        "rel", 1)
      .collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(k1("q1") && !k1("q3"))
  }

  test("ndcgAtK: no relevant docs yields null ndcg; k truncates") {
    val none = Seq(("q", 1L, 2.0, 0), ("q", 2L, 1.0, 0))
      .toDF("query", "doc", "score", "rel")
    val n = Retrieval.ndcgAtK(none, "query", "doc", "score", "rel", 10).head()
    assert(n.isNullAt(n.fieldIndex("ndcg")))
    // k = 1: only the top-ranked doc contributes
    val two = Seq(("q", 1L, 9.0, 0), ("q", 2L, 1.0, 3))
      .toDF("query", "doc", "score", "rel")
    val k1 = Retrieval.ndcgAtK(two, "query", "doc", "score", "rel", 1).head()
    assert(k1.getAs[Double]("dcg") === 0.0) // top by score has rel 0
    assert(k1.getAs[Double]("idcg") === 7.0)
    assert(k1.getAs[Double]("ndcg") === 0.0)
  }

  test("averagePrecisionAtK: hand-computed, perfect, and null cases") {
    // ranking by score desc: docs 1(rel),2,3(rel),4 → precisions at
    // relevant ranks: 1/1, 2/3; R=2 → AP = (1 + 2/3)/2 = 0.833333
    val d = Seq(("q", 1L, 9.0, 1), ("q", 2L, 8.0, 0),
      ("q", 3L, 7.0, 1), ("q", 4L, 6.0, 0))
      .toDF("query", "doc", "score", "rel")
    val ap = Retrieval.averagePrecisionAtK(d, "query", "doc", "score",
      "rel", 10).head()
    assert(ap.getAs[Long]("n_rel") == 2L)
    assert(math.abs(ap.getAs[Double]("ap") - 0.833333) < 1e-9)
    // all-relevant top ranks → AP = 1
    val perfect = Seq(("q", 1L, 9.0, 1), ("q", 2L, 8.0, 1),
      ("q", 3L, 7.0, 0)).toDF("query", "doc", "score", "rel")
    assert(Retrieval.averagePrecisionAtK(perfect, "query", "doc", "score",
      "rel", 10).head().getAs[Double]("ap") == 1.0)
    // no relevant docs → null
    val none = Seq(("q", 1L, 9.0, 0)).toDF("query", "doc", "score", "rel")
    val n = Retrieval.averagePrecisionAtK(none, "query", "doc", "score",
      "rel", 10).head()
    assert(n.isNullAt(n.fieldIndex("ap")))
  }

  test("averagePrecisionAtK: k truncates both hits and the divisor") {
    // rel docs at ranks 1 and 3; k = 2 sees only rank 1, min(R, k) = 2
    val d = Seq(("q", 1L, 9.0, 1), ("q", 2L, 8.0, 0), ("q", 3L, 7.0, 1))
      .toDF("query", "doc", "score", "rel")
    val ap = Retrieval.averagePrecisionAtK(d, "query", "doc", "score",
      "rel", 2).head().getAs[Double]("ap")
    assert(math.abs(ap - 0.5) < 1e-9) // (1/1)/min(2,2)
  }

  private def vecs3 = Seq(
    (1L, Seq(1.0f, 0.0f)),   // rel 1 — rank 1 (id tiebreak vs 2)
    (2L, Seq(1.0f, 0.0f)),   // exact duplicate of 1
    (3L, Seq(0.9f, 0.44f))   // diverse, rel ~0.898
  ).toDF("vec_id", "embedding")

  test("mmrSelect: low lambda demotes the duplicate for diversity") {
    val got = Retrieval.mmrSelect(vecs3, "vec_id", "embedding",
        Seq(1.0, 0.0), k = 2, lambda = 0.3, candidateN = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // rank 1 = id 1; rank 2 = the DIVERSE vec 3, not the dup (score
    // 0.3·0.898 − 0.7·0.898 beats 0.3·1 − 0.7·1)
    assert(got === Seq(1L, 3L))
  }

  test("mmrSelect: high lambda keeps pure relevance order") {
    val got = Retrieval.mmrSelect(vecs3, "vec_id", "embedding",
        Seq(1.0, 0.0), k = 3, lambda = 1.0, candidateN = 3)
      .orderBy("rank").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    assert(got(0)._2 === 1.0 && got(1)._2 === 1.0)
  }

  test("queryLikelihood: closed two-doc case matches the formula") {
    // docs: d1 = "a a b", d2 = "b c c"; query = (a, c), mu = 1
    // cf: a=2, b=2, c=2, |C|=6; p_c = 1/3 for each term
    val docs = Seq((1L, "a a b"), (2L, "b c c")).toDF("doc_id", "text")
    val got = Retrieval.queryLikelihood(docs, "doc_id", "text",
        Seq("a", "c"), mu = 1.0, topK = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def rd6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pc = 1.0 * 2.0 / 6.0
    val d1 = math.log((2 + pc) / 4.0) + math.log((0 + pc) / 4.0)
    val d2 = math.log((0 + pc) / 4.0) + math.log((2 + pc) / 4.0)
    assert(got(1L)._1 === 3L && got(1L)._2 === 1L)
    assert(math.abs(got(1L)._3 - rd6(d1)) < 2e-6)
    assert(math.abs(got(2L)._3 - rd6(d2)) < 2e-6)
  }

  test("queryLikelihood: longer matched docs rank higher; absent term " +
      "rejected") {
    val docs = Seq((1L, "x x x y"), (2L, "x y y y"), (3L, "y y y y"))
      .toDF("doc_id", "text")
    val top = Retrieval.queryLikelihood(docs, "doc_id", "text",
      Seq("x"), mu = 0.5, topK = 3).collect()
    assert(top.head.getLong(0) === 1L, "most x-mass ranks first")
    assert(top.last.getLong(0) === 3L)
    intercept[Exception] {
      Retrieval.queryLikelihood(docs, "doc_id", "text",
        Seq("zzz"), 1.0, 2).collect()
    }
  }

  test("mmrSelect: k above slate size returns the slate; guards fire") {
    assert(Retrieval.mmrSelect(vecs3, "vec_id", "embedding",
      Seq(1.0, 0.0), k = 3, lambda = 0.5, candidateN = 3).count() === 3L)
    intercept[IllegalArgumentException] {
      Retrieval.mmrSelect(vecs3, "vec_id", "embedding", Seq(1.0, 0.0),
        k = 2, lambda = 0.5, candidateN = 500)
    }
  }

  test("mmrSelect: accepts int ids, rejects string ids loudly") {
    // an IntegerType id must work (previously getLong(0) would
    // ClassCastException); a StringType id must fail the require,
    // not blow up mid-collect
    val intIds = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.mmrSelect(intIds, "vec_id", "embedding",
        Seq(1.0, 0.0), k = 1, lambda = 1.0, candidateN = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L))
    val strIds = Seq(("a", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Retrieval.mmrSelect(strIds, "vec_id", "embedding",
        Seq(1.0, 0.0), k = 1, lambda = 1.0, candidateN = 2)
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("rrfFuse: closed two-ranker case with an exact-integer tie") {
    // ranker A ranks 1,2,3; ranker B ranks 3,2,1 — ids 1 and 3 get the
    // same integer term multiset {1e12/61, 1e12/63}; the tie breaks to
    // the lower id, which only an EXACT sum can guarantee
    val df = Seq(
      ("A", 0L, 1L, 3.0), ("A", 0L, 2L, 2.0), ("A", 0L, 3L, 1.0),
      ("B", 0L, 3L, 9.0), ("B", 0L, 2L, 5.0), ("B", 0L, 1L, 1.0)
    ).toDF("ranker", "q", "id", "score")
    val got = Retrieval.rrfFuse(df, "ranker", "q", "id", "score",
        kConst = 60, topK = 3)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L))
    val expect = (1000000000000L / 61 + 1000000000000L / 63) / 1e12
    assert(got(0).getAs[Double]("rrf_score") ===
      BigDecimal(expect).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(got.forall(_.getAs[Long]("n_rankers") === 2L))
  }

  test("rrfFuse: a candidate missing from one ranker fuses one term") {
    val df = Seq(
      ("A", 0L, 1L, 2.0), ("A", 0L, 2L, 1.0), ("B", 0L, 1L, 1.0)
    ).toDF("ranker", "q", "id", "score")
    val got = Retrieval.rrfFuse(df, "ranker", "q", "id", "score")
      .orderBy("rank").collect()
    assert(got.map(r => r.getLong(2) -> r.getAs[Long]("n_rankers"))
      .toSeq === Seq(1L -> 2L, 2L -> 1L))
  }

  test("rrfFuse dedupes duplicate (ranker, query, id) rows to max score") {
    // id 1 appears twice under ranker A — without the dedup it would
    // take ranks 1 AND 2 (two fused terms, n_rankers inflated to 2);
    // the contract keeps only its best score, so id 2 ranks second
    val df = Seq(
      ("A", 0L, 1L, 5.0), ("A", 0L, 1L, 3.0), ("A", 0L, 2L, 4.0)
    ).toDF("ranker", "q", "id", "score")
    val got = Retrieval.rrfFuse(df, "ranker", "q", "id", "score")
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1L, 2L))
    assert(got.forall(_.getAs[Long]("n_rankers") === 1L))
    // identical to the already-unique frame: dedup is a no-op there
    val uniq = Seq(("A", 0L, 1L, 5.0), ("A", 0L, 2L, 4.0))
      .toDF("ranker", "q", "id", "score")
    assert(got.toSeq === Retrieval.rrfFuse(uniq, "ranker", "q", "id",
      "score").orderBy("rank").collect().toSeq)
  }

  test("rrfFuse is partition-invariant and per-query") {
    val emb = spark.read.parquet(s"$sfDir/supplier.parquet")
    val a = emb.select(lit("x").as("ranker"),
      col("s_nationkey").as("q"), col("s_suppkey").as("id"),
      col("s_acctbal").cast("double").as("score"))
    val run = (n: Int) => Retrieval.rrfFuse(a.repartition(n),
        "ranker", "q", "id", "score", 60, 3)
      .orderBy("q", "rank").collect().toSeq
    assert(run(1) === run(7))
  }
}

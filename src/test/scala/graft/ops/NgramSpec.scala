package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramSpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  test("kneserNeyBigrams matches the hand-computed closed case") {
    // bigrams: (a,b)×2, (b,a)×1, (a,c)×1
    // c(a·)=3 N1+(a·)=2; c(b·)=1 N1+(b·)=1; N1+(·b)=1 N1+(·a)=1 N1+(·c)=1;
    // N1+(··)=3
    val df = Seq("a b a b", "a c").toDF("text")
    val got = Ngram.kneserNeyBigrams(df, "text", D)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size === 3)
    val (nAb, pAb) = got(("a", "b"))
    assert(nAb === 2L)
    assert(math.abs(pAb - ((2 - D) / 3 + D * 2.0 / 3 * (1.0 / 3))) < 1e-15)
    assert(math.abs(got(("a", "c"))._2 -
      ((1 - D) / 3 + D * 2.0 / 3 * (1.0 / 3))) < 1e-15)
    assert(math.abs(got(("b", "a"))._2 -
      ((1 - D) / 1 + D * 1.0 / 1 * (1.0 / 3))) < 1e-15)
  }

  test("kneserNeyBigrams: P(·|w1) sums to 1 over the full vocabulary") {
    // seen mass + backoff weight · unseen continuation mass must close to
    // 1 for every context: Σ_seen p + (D·N1(w1)/c(w1)) · (1 − Σ_seen pcont)
    val df = Seq("the cat sat on the mat", "the dog sat", "a cat ran")
      .toDF("text")
    val lm = Ngram.kneserNeyBigrams(df, "text", D).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val n1Tot = lm.size.toDouble
    val contP = lm.groupBy(_._2).view.mapValues(_.size / n1Tot).toMap
    lm.groupBy(_._1).foreach { case (w1, rows) =>
      val cW1 = rows.map(_._3).sum.toDouble
      val n1W1 = rows.size
      val seenP = rows.map(_._4).sum
      val seenCont = rows.map(r => contP(r._2)).sum
      val total = seenP + D * n1W1 / cW1 * (1.0 - seenCont)
      assert(math.abs(total - 1.0) < 1e-12, s"context $w1")
    }
  }

  test("perplexity matches a driver-side replay of the model") {
    val df = Seq((1L, "x y x y x z"), (2L, "x y"), (3L, "z"))
      .toDF("doc_id", "text")
    val lm = Ngram.kneserNeyBigrams(df, "text", D).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val got = Ngram.perplexity(df, "doc_id", "text", D)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 3 has no bigram and is absent
    assert(got.keySet === Set(1L, 2L))
    def expect(bgs: Seq[(String, String)]): Double =
      math.exp(-bgs.map(b => math.log(lm(b))).sum / bgs.size)
    val d1 = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"), ("x", "z"))
    assert(got(1L)._1 === 5L)
    assert(math.abs(got(1L)._2 - expect(d1)) < 1e-6)
    assert(math.abs(got(2L)._2 - expect(Seq(("x", "y")))) < 1e-6)
  }

  test("perplexity ranks a formulaic doc below a typical one") {
    // corpus dominated by "p q" patterns; the doc made of rare transitions
    // must score HIGHER perplexity than the doc made of common ones
    val corpus = (1L to 20L).map(i => (i, "p q p q p q")) ++
      Seq((100L, "q p r s t u"))
    val df = corpus.toDF("doc_id", "text")
    val got = Ngram.perplexity(df, "doc_id", "text", D)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(100L) > got(1L))
  }

  test("unigramDivergence: identical corpora have KL 0, H = entropy") {
    val a = Seq("x y z x", "y x").toDF("text")
    val r = Ngram.unigramDivergence(a, a, "text").head()
    assert(r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("n_a") === 6L && r.getAs[Long]("n_b") === 6L)
    assert(r.getAs[Double]("kl_ab") === 0.0)
    assert(r.getAs[Double]("cross_entropy") ===
      r.getAs[Double]("entropy_a"))
  }

  test("unigramDivergence matches a hand-computed smoothed KL") {
    // A: a a b (n=3), B: a c (n=2), V = {a,b,c} -> |V| = 3
    // p = (2+1)/6, (1+1)/6, (0+1)/6 ; q = (1+1)/5, (0+1)/5, (1+1)/5
    val a = Seq("a a b").toDF("text")
    val b = Seq("a c").toDF("text")
    val r = Ngram.unigramDivergence(a, b, "text").head()
    val p = Seq(3.0 / 6, 2.0 / 6, 1.0 / 6)
    val q = Seq(2.0 / 5, 1.0 / 5, 2.0 / 5)
    def rd(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val kl = p.zip(q).map { case (pi, qi) => pi * math.log(pi / qi) }.sum
    val ce = -p.zip(q).map { case (pi, qi) => pi * math.log(qi) }.sum
    assert(r.getAs[Long]("vocab") === 3L)
    assert(math.abs(r.getAs[Double]("kl_ab") - rd(kl)) < 1e-9)
    assert(math.abs(r.getAs[Double]("cross_entropy") - rd(ce)) < 1e-9)
  }

  test("unigramDivergence is asymmetric and positive on shifted corpora") {
    val a = Seq("u u u u v").toDF("text")
    val b = Seq("v v v v u").toDF("text")
    val ab = Ngram.unigramDivergence(a, b, "text").head().getAs[Double]("kl_ab")
    assert(ab > 0.0)
  }

  test("goodTuring: closed spectrum on a tiny corpus") {
    // "a a a b b c": counts a=3 b=2 c=1 → N_1=N_2=N_3=1, N=6
    val df = Seq("a a a", "b b c").toDF("text")
    val got = Ngram.goodTuring(df, "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    def rd(v: Double, d: Int) =
      BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((1L, Some(rd(2.0, 6)), Some(rd(2.0 / 6, 9)))))
    assert(got(2L) === ((1L, Some(rd(3.0, 6)), Some(rd(3.0 / 6, 9)))))
    // spectrum gap: N_4 = 0 → r* undefined (null), simple GT's fit zone
    assert(got(3L) === ((1L, None, None)))
  }

  test("goodTuring: spectrum conserves the corpus token count") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = Ngram.goodTuring(docs, "text").collect()
    val n = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val direct = docs.select(explode(filter(
        split(lower(col("text")), "\\s+"), t => t =!= "")).as("w"))
      .count()
    assert(n === direct, "sum r·N_r = token count")
    // r_star of every non-gap row stays positive and finite
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getDouble(2) > 0.0, s"r*=0 at r=${r.getLong(0)}")
    }
  }

  test("vocabRichness: closed Chao1 and coverage") {
    // "a a b c": S=3, N=4, N1=2, N2=1 → chao1 = 3 + 2·1/(2·2) = 3.5,
    // coverage = 1 − 2/4 = 0.5
    val r = Ngram.vocabRichness(Seq("a a", "b c").toDF("text"), "text")
      .head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(r.getLong(2) === 2L && r.getLong(3) === 1L)
    assert(r.getDouble(4) === 3.5)
    assert(r.getDouble(5) === 0.5)
    // hapax-free corpus: chao1 = S_obs exactly, coverage 1
    val r2 = Ngram.vocabRichness(Seq("a a b b").toDF("text"), "text")
      .head()
    assert(r2.getDouble(4) === 2.0 && r2.getDouble(5) === 1.0)
  }

  test("tokenDispersion: spread vs concentrated tokens") {
    val df = Seq((1L, "x x y"), (2L, "x z z")).toDF("id", "text")
    val got = Ngram.tokenDispersion(df, "id", "text", minCf = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("x") === ((3L, 2L, 0.666667)))
    assert(got("z") === ((2L, 1L, 0.5)))
    assert(!got.contains("y"), "minCf filters singletons")
  }

  test("goodTuring is partition-invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Ngram.goodTuring(docs.repartition(1), "text")
      .orderBy("r").collect().toSeq
    val b = Ngram.goodTuring(docs.repartition(7), "text")
      .orderBy("r").collect().toSeq
    assert(a === b)
  }
}

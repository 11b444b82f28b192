package graft.ops

import graft.SparkSpec

class NBayesSpec extends SparkSpec {
  import spark.implicits._

  test("fitPredict: closed two-class case matches hand-computed posteriors") {
    val df = Seq(
      (1L, "buy buy", "spam"),
      (2L, "hello world", "ham"),
      (3L, "buy hello", "spam")
    ).toDF("id", "text", "lang")
    val out = NBayes.fitPredict(df, "id", "text", "lang", alpha = 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getDouble(3)))).toMap
    // counts: spam(buy:3, hello:1, nl=4)  ham(hello:1, world:1, nl=2);
    // V = |{buy, hello, world}| = 3; priors: spam 2/3, ham 1/3
    def score(prior: Double, nl: Long, tfs: Seq[(Long, Long)]) =
      math.log(prior) + tfs.map { case (tf, nlt) =>
        tf * math.log((nlt + 1.0) / (nl + 3.0)) }.sum
    // doc 1 "buy buy": spam = ln(2/3) + 2·ln(4/7); ham = ln(1/3) + 2·ln(1/5)
    val spam1 = score(2.0 / 3, 4, Seq((2L, 3L)))
    val ham1 = score(1.0 / 3, 2, Seq((2L, 0L)))
    assert(out(1L)._1 === "spam")
    assert(math.abs(out(1L)._2 -
      BigDecimal(math.max(spam1, ham1)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // doc 2 "hello world": ham wins (world unseen in spam)
    assert(out(2L)._1 === "ham")
  }

  test("fitPredict: perfectly separable vocabularies classify exactly") {
    val df = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, "alpha beta alpha", "even")
      else (i, "gamma delta gamma", "odd")
    }.toDF("id", "text", "lang")
    val out = NBayes.fitPredict(df, "id", "text", "lang").collect()
    assert(out.length === 40)
    out.foreach(r => assert(r.getString(2) === r.getString(1)))
  }

  test("fitPredict: exact symmetric tie predicts the smaller label") {
    val df = Seq(
      (1L, "x", "a"), (2L, "x", "b")
    ).toDF("id", "text", "lang")
    val out = NBayes.fitPredict(df, "id", "text", "lang").collect()
    out.foreach(r => assert(r.getString(2) === "a"))
  }

  test("fitPredict: one row per input document, any partitioning") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id as id", "text", "lang").limit(100)
    val a = NBayes.fitPredict(df, "id", "text", "lang")
    val b = NBayes.fitPredict(df.repartition(7), "id", "text", "lang")
    assert(a.count() === 100)
    assert(a.orderBy("id").collect().toSeq ===
      b.orderBy("id").collect().toSeq)
  }
}

package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. toy corpus shape: "low" dominates, then "newest"
  private def corpus = Seq("low low low lower newest newest").toDF("text")

  test("learnMerges reproduces the reference BPE merge order") {
    val m = Bpe.learnMerges(corpus, "text", 3).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (l,o) and (o,w) tie at 4 → pair-asc tiebreak picks (l,o)
    assert(m(0) === ((1, "l", "o", 4L)))
    assert(m(1) === ((2, "lo", "w", 4L)))
    assert(m(2) === ((3, "low", "_", 3L)))
  }

  test("learnMerges stops when no pair repeats") {
    // every word unique, no repeated adjacent pair anywhere
    val df = Seq("ab cd ef").toDF("text")
    val m = Bpe.learnMerges(df, "text", 10).collect()
    assert(m.isEmpty)
  }

  test("tokenize applies merges leftmost-first, non-overlapping") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "_"))
    val out = Bpe.tokenize(Seq((1L, "low lower")).toDF("id", "text"),
        "text", merges)
      .select("tokens").head().getSeq[String](0)
    assert(out === Seq("low_", "low", "e", "r", "_"))
  }

  test("tokenize: overlapping pair aaa merges the leftmost pair only") {
    val out = Bpe.tokenize(Seq((1L, "aaa")).toDF("id", "text"),
        "text", Seq(("a", "a")))
      .select("tokens").head().getSeq[String](0)
    assert(out === Seq("aa", "a", "_"))
  }

  test("learnMerges is invariant to input partitioning") {
    val docs = Seq("spark table scan", "spark table join",
      "spark scan scan", "table spark spark").toDF("text")
    val a = Bpe.learnMerges(docs, "text", 4).orderBy("rank")
      .collect().toSeq
    val b = Bpe.learnMerges(docs.repartition(5), "text", 4).orderBy("rank")
      .collect().toSeq
    assert(a === b)
  }
}

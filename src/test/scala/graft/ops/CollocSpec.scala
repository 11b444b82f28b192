package graft.ops

import graft.SparkSpec

class CollocSpec extends SparkSpec {
  import spark.implicits._

  test("pmiBigrams: a glued phrase outranks chance pairings") {
    // "new york" always co-occurs; "the" pairs with everything
    val docs = Seq(
      "new york is big", "new york is old", "new york has parks",
      "the dog is big", "the cat is old", "the bird has parks"
    ).toDF("text")
    val out = Colloc.pmiBigrams(docs, "text", minCount = 2, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2),
        r.getDouble(3)))
    val byPair = out.map { case (p, n, pmi) => p -> ((n, pmi)) }.toMap
    assert(byPair(("new", "york"))._1 === 3L)
    // literal PMI check: n_ab=3, N=18 bigrams, r_new=3, c_york=3
    val expect = math.log(3.0 * 18 / (3.0 * 3))
    assert(math.abs(byPair(("new", "york"))._2 - expect) < 1e-6)
    // the glued phrase beats the promiscuous "is big" pairing
    val pmiNY = byPair(("new", "york"))._2
    assert(byPair.filter(_._1._1 == "is").values.forall(_._2 < pmiNY))
  }

  test("minCount filters rare pairs; topK bounds and ordering is total") {
    val docs = Seq("a b a b a b", "c d").toDF("text")
    val out = Colloc.pmiBigrams(docs, "text", minCount = 2, topK = 5)
      .collect()
    // "c d" appears once -> filtered; "a b" (3) and "b a" (2) remain
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("b", "a")))
    val one = Colloc.pmiBigrams(docs, "text", minCount = 1, topK = 1).collect()
    assert(one.length === 1)
  }

  test("empty tokens from ragged whitespace never form bigrams") {
    val docs = Seq("  x   y  ", "x y").toDF("text")
    val out = Colloc.pmiBigrams(docs, "text", minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("x", "y")))
  }
}

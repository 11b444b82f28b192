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

  test("ppmiSimilarity: words with identical context rows hit cosine 1") {
    // "cat" and "dog" appear in exactly the same contexts; "rock" doesn't
    val docs = Seq(
      "the cat sat", "the dog sat", "the cat sat", "the dog sat",
      "a rock fell", "a rock fell", "a rock fell"
    ).toDF("text")
    val out = Colloc.ppmiSimilarity(docs, "text", topV = 10, topK = 50)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getDouble(2))).toMap
    assert(out(("cat", "dog")) == 1.0, s"identical contexts: $out")
    // no shared contexts → the pair is absent (dot over empty support)
    assert(!out.contains(("cat", "rock")) && !out.contains(("rock", "sat")))
  }

  test("ppmiSimilarity is vocab-bounded and partition-invariant") {
    val docs = (1 to 40).map(i =>
      s"alpha beta w$i gamma delta").toDF("text")
    val a = Colloc.ppmiSimilarity(docs.repartition(1), "text",
      topV = 6, topK = 10).collect().toSeq
    val b = Colloc.ppmiSimilarity(docs.repartition(7), "text",
      topV = 6, topK = 10).collect().toSeq
    assert(a == b && a.nonEmpty)
    // only vocab words may appear
    val words = a.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(words.subsetOf(Set("alpha", "beta", "gamma", "delta") ++
      (1 to 40).map(i => s"w$i")))
    assert(words.count(_.startsWith("w")) <= 2) // rare w_i mostly cut
  }
}

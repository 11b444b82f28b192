package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class AssocSpec extends SparkSpec {
  import spark.implicits._

  // baskets: {a,b,c}, {a,b}, {a,c}, {b,c}, {a}
  private def baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "b"), (4L, "c"),
    (5L, "a")).toDF("basket", "item")

  test("associationRules: closed support/confidence/lift") {
    val out = Assoc.associationRules(baskets, "basket", "item",
        minCount = 2, maxBasketSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    // n=5 baskets; n_a=4, n_b=3, n_c=3; ab=2, ac=2, bc=2
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "b")) === ((2L, 0.4, 0.5, r6(5.0 * 2 / (4 * 3)))))
    assert(out(("b", "a")) === ((2L, 0.4, r6(2.0 / 3), r6(5.0 * 2 / (4 * 3)))))
    assert(out(("b", "c"))._4 === BigDecimal(5.0 * 2 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // both directions of every pair are present
    assert(out.keySet === Set(("a", "b"), ("b", "a"), ("a", "c"),
      ("c", "a"), ("b", "c"), ("c", "b")))
  }

  test("associationRules: minCount prunes singletons pairs") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "z"))
      .toDF("basket", "item")
    val out = Assoc.associationRules(df, "basket", "item", minCount = 2)
    assert(out.count() === 0L)
  }

  test("associationRules: oversized baskets are dropped before the join") {
    // basket 9 holds 5 items (> cap 4): none of its pairs may appear
    val big = (1 to 5).map(i => (9L, s"i$i"))
    val df = (big ++ Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")))
      .toDF("basket", "item")
    val out = Assoc.associationRules(df, "basket", "item",
        minCount = 1, maxBasketSize = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("a", "b"), ("b", "a")))
  }

  test("associationRules: duplicate incidences count once") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("basket", "item")
    val out = Assoc.associationRules(df, "basket", "item", minCount = 1)
      .filter($"antecedent" === "a" && $"consequent" === "b").head()
    assert(out.getLong(2) === 2L)  // n_both
    assert(out.getLong(3) === 2L)  // n_ante (not 3)
  }

  test("frequentItemsets: closed lattice through the triple tier") {
    val df = Seq((1L, "1"), (1L, "2"), (1L, "3"), (2L, "1"), (2L, "2"),
      (3L, "1"), (3L, "2"), (3L, "3")).toDF("basket", "item")
    val got = Assoc.frequentItemsets(df, "basket", "item", minCount = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("1", 1) -> 3L, ("2", 1) -> 3L, ("3", 1) -> 2L,
      ("1,2", 2) -> 3L, ("1,3", 2) -> 2L, ("2,3", 2) -> 2L,
      ("1,2,3", 3) -> 2L))
    // raising minCount prunes the triple and the 3-containing pairs
    val strict = Assoc.frequentItemsets(df, "basket", "item", 3)
      .collect().map(r => r.getString(0)).toSet
    assert(strict === Set("1", "2", "1,2"))
  }

  test("frequentItemsets: infrequent items never reach the pair join") {
    // 'z' appears once: no pair or triple may contain it even at
    // minCount 1 for pairs it could have formed in basket 1
    val df = Seq((1L, "a"), (1L, "b"), (1L, "z"), (2L, "a"), (2L, "b"))
      .toDF("basket", "item")
    val got = Assoc.frequentItemsets(df, "basket", "item", minCount = 2)
      .collect().map(r => r.getString(0)).toSet
    assert(got === Set("a", "b", "a,b"))
  }

  test("frequentItemsets is partition-invariant") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("basket"),
        (col("l_partkey") % 20).as("item"))
    val run = (p: Int) => Assoc.frequentItemsets(df.repartition(p),
        "basket", "item", minCount = 20, maxBasketSize = 50)
      .orderBy("size", "itemset").collect().toSeq
    val a = run(1)
    assert(a === run(7))
    assert(a.exists(_.getInt(1) === 3), "triples exist at this density")
  }
}

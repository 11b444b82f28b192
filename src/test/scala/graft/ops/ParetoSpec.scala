package graft.ops

import graft.SparkSpec

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  test("abcClassify matches a hand-computed concentration case") {
    // totals: a=60, b=20, c=15, d=5 (grand 100)
    val df = Seq(("a", 40.0), ("a", 20.0), ("b", 20.0), ("c", 15.0),
      ("d", 5.0)).toDF("k", "v")
    val got = Pareto.abcClassify(df, "k", "v").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getString(4)))
      .toMap
    assert(got("a") === ((60.0, 0.6, 0.6, "A")))
    assert(got("b") === ((20.0, 0.2, 0.8, "A"))) // cum 80% is still A
    assert(got("c") === ((15.0, 0.15, 0.95, "B"))) // cum 95% is still B
    assert(got("d") === ((5.0, 0.05, 1.0, "C")))
  }

  test("abcClassify: equal totals share rank, cum_share, and class") {
    val df = Seq(("x", 50.0), ("y", 50.0), ("z", 1.0)).toDF("k", "v")
    val got = Pareto.abcClassify(df, "k", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getString(4))).toMap
    assert(got("x") === got("y"))
    // x and y jointly carry 100/101 > 95% -> both C? cum includes BOTH
    // tied keys: 100/101 = 0.990099 > 0.95 -> class C for the tie pair
    assert(got("x")._2 === "C")
    assert(got("z")._2 === "C")
  }

  test("abcClassify boundary is exact on integer percent edges") {
    // a=80, b=20: a's cum share is exactly 0.80 -> A by the <= boundary,
    // decided on integers (8000*100 <= 10000*80), immune to float grids
    val df = Seq(("a", 80.0), ("b", 20.0)).toDF("k", "v")
    val got = Pareto.abcClassify(df, "k", "v").collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(got("a") === "A")
    assert(got("b") === "C") // cum 1.0 > 0.95
  }

  test("abcClassify shares sum to 1 and classes partition the keys") {
    val df = (1 to 40).map(i => (s"k$i", i * 1.25)).toDF("k", "v")
    val rows = Pareto.abcClassify(df, "k", "v").collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    assert(rows.map(_.getString(4)).toSet.subsetOf(Set("A", "B", "C")))
    // cum_share is monotone when walking totals descending
    val sorted = rows.sortBy(-_.getDouble(1))
    sorted.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getDouble(3) <= lo.getDouble(3) + 1e-9)
    }
  }

  test("abcClassify rejects bad thresholds") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Pareto.abcClassify(df, "k", "v", aPct = 90, bPct = 80)
    }
  }
}

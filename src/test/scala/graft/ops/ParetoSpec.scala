package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("hillEstimator: exact Pareto tail recovers the exponent") {
    // x_(i) = c * (i)^(-1/alpha) is an exact Pareto tail: the Hill sum
    // telescopes to (1/alpha) * sum ln((k+1)/i) — compute the literal
    val alphaTrue = 2.0
    val k = 50
    val xs = (1 to 200).map(i => 1000.0 * math.pow(i, -1.0 / alphaTrue))
    val r = Pareto.hillEstimator(xs.toDF("v"), "v", k).head()
    assert(r.getInt(0) === k && r.getLong(1) === k.toLong)
    val thr = xs.sorted.reverse(k) // x_(k+1)
    assert(r.getDouble(2) === thr)
    val sMicro = xs.sorted.reverse.take(k)
      .map(x => math.rint(math.log(x / thr) * 1e6).toLong).sum
    val expect = k.toDouble / (sMicro.toDouble / 1e6)
    assert(math.abs(r.getAs[Double]("alpha") - expect) < 1e-6)
    assert(math.abs(expect - alphaTrue) < 0.1, s"hill $expect vs 2.0")
  }

  test("hillEstimator: constant tail and short data go null; guards") {
    val const = Seq.fill(10)(5.0).toDF("v")
    val c = Pareto.hillEstimator(const, "v", 5).head()
    assert(c.isNullAt(c.fieldIndex("alpha")))
    val short = Seq(1.0, 2.0).toDF("v")
    val sh = Pareto.hillEstimator(short, "v", 5).head()
    assert(sh.getLong(1) === 1L && sh.isNullAt(sh.fieldIndex("alpha")))
    intercept[IllegalArgumentException] {
      Pareto.hillEstimator(const, "v", 1)
    }
  }

  test("hillEstimator is partition-invariant on token frequencies") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val counts = docs.select(explode(filter(split(col("text"), "\\s+"),
        t => length(t) > 0)).as("t"))
      .groupBy("t").agg(count(lit(1)).cast("double").as("c"))
    val run = (p: Int) => Pareto.hillEstimator(counts.repartition(p),
      "c", 50).collect().toSeq
    assert(run(1) === run(7))
  }
}

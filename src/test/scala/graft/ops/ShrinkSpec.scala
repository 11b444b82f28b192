package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShrinkSpec extends SparkSpec {
  import spark.implicits._

  private def rd6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("betaBinomial: closed MoM case alpha = beta = 0.25") {
    // per-key rates {0, 0.5, 0.5, 1}: mu = 0.5, var = 1/6,
    // m = 0.25/(1/6) - 1 = 0.5 → alpha = beta = 0.25
    val rows = Seq(("a", false), ("a", false),
      ("b", true), ("b", false),
      ("c", true), ("c", true), ("c", false), ("c", false),
      ("d", true))
    val got = Shrink.betaBinomial(rows.toDF("k", "y"), "k", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("d").getAs[Double]("alpha") === 0.25)
    assert(got("d").getAs[Double]("beta") === 0.25)
    // d: (1 + 0.25)/(1 + 0.5) = 0.833333; a: 0.25/2.5 = 0.1
    assert(got("d").getAs[Double]("shrunk_rate") === rd6(1.25 / 1.5))
    assert(got("a").getAs[Double]("shrunk_rate") === 0.1)
    assert(got("c").getAs[Double]("rate") === 0.5)
  }

  test("betaBinomial: degenerate priors go NULL, never silently unshrunk") {
    // zero rate variance
    val flat = Seq(("a", true), ("a", false), ("b", true), ("b", false))
    val f = Shrink.betaBinomial(flat.toDF("k", "y"), "k", "y").head()
    assert(f.isNullAt(f.fieldIndex("alpha")) &&
      f.isNullAt(f.fieldIndex("shrunk_rate")))
    // maximal variance: rates {0, 1} → MoM concentration m < 0
    val wide = Seq(("a", false), ("b", true))
    val w = Shrink.betaBinomial(wide.toDF("k", "y"), "k", "y").head()
    assert(w.isNullAt(w.fieldIndex("alpha")))
    // a single key cannot fit a prior
    val one = Seq(("a", true), ("a", false))
    val o = Shrink.betaBinomial(one.toDF("k", "y"), "k", "y").head()
    assert(o.isNullAt(o.fieldIndex("alpha")))
  }

  test("betaBinomial: shrinkage pulls extreme small-n keys toward the mean") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 50).flatMap { k =>
      val p = 0.2 + 0.6 * rng.nextDouble()
      (1 to 20).map(_ => (s"k$k", rng.nextDouble() < p))
    } ++ Seq(("tiny", true)) // 1/1 — raw rate 1.0
    val got = Shrink.betaBinomial(rows.toDF("k", "y"), "k", "y")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("rate"), r.getAs[Double]("shrunk_rate"))).toMap
    val (raw, shrunk) = got("tiny")
    assert(raw === 1.0 && shrunk < 1.0 && shrunk > 0.4,
      s"1/1 key must shrink toward the prior mean, got $shrunk")
  }

  test("betaBinomial is partition-invariant on orders") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), (col("o_orderstatus") === "F").as("y"))
    val run = (p: Int) => Shrink.betaBinomial(o.repartition(p),
      "o_custkey", "y").orderBy("o_custkey").collect().toSeq
    assert(run(1) === run(7))
  }
}

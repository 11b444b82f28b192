package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("zscore: mean 0, population sd 1; constant column stays finite") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).toDF("x")
    val z = Normalize.zscore(df, "x").select("z").collect().map(_.getDouble(0))
    assert(math.abs(z.sum) < 1e-12)
    assert(math.abs(z.map(v => v * v).sum / z.length - 1.0) < 1e-12)
    val const = Normalize.zscore(Seq(7.0, 7.0, 7.0).toDF("x"), "x")
      .select("z").collect().map(_.getDouble(0))
    assert(const.forall(_ == 0.0))
  }

  test("minmax maps onto [0,1] with endpoints hit") {
    val df = Seq(10.0, 20.0, 15.0, 30.0).toDF("x")
    val s = Normalize.minmax(df, "x").orderBy("x").select("scaled")
      .collect().map(_.getDouble(0))
    assert(s.head === 0.0 && s.last === 1.0)
    assert(math.abs(s(1) - 0.25) < 1e-12)
  }

  test("ecdf equals cume_dist on a tied sample and survives repartitioning") {
    val df = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0).toDF("x")
    val got = Normalize.ecdf(df.repartition(5), "x")
      .select("x", "ecdf").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val ref = df.withColumn("cd",
        cume_dist().over(org.apache.spark.sql.expressions.Window.orderBy("x")))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (v, cd) => assert(math.abs(got(v) - cd) < 1e-12, s"x=$v") }
  }

  test("row count passes through ecdf (no drop on duplicates)") {
    val df = Seq(1.0, 1.0, 2.0, 2.0, 2.0).toDF("x")
    assert(Normalize.ecdf(df, "x").count() === 5L)
  }

  test("winsorize clamps both tails at the interpolated percentiles") {
    // 1..100: p10 = 10.9, p90 = 90.1 (linear interpolation at (n-1)p)
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val got = Normalize.winsorize(df, "x", pLo = 0.1, pHi = 0.9)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1.0) - 10.9) < 1e-9)   // low tail clamped up
    assert(math.abs(got(100.0) - 90.1) < 1e-9) // high tail clamped down
    assert(got(50.0) === 50.0)                 // interior untouched
  }

  test("winsorize preserves row count and leaves the source column") {
    val df = Seq(-100.0, 1.0, 2.0, 3.0, 900.0).toDF("x")
    val out = Normalize.winsorize(df, "x", 0.25, 0.75)
    assert(out.count() === 5L)
    assert(out.columns.toSeq === Seq("x", "w"))
    // clamped output never exceeds the original extremes
    val w = out.select("w").collect().map(_.getDouble(0))
    assert(w.min >= -100.0 && w.max <= 900.0)
  }

  test("winsorize approx variant tracks the exact one on smooth data") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val exact = Normalize.winsorize(df, "x", 0.01, 0.99)
      .agg(sum("w")).head().getDouble(0)
    val approx = Normalize.winsorize(df, "x", 0.01, 0.99, approx = true)
      .agg(sum("w")).head().getDouble(0)
    assert(math.abs(exact - approx) / exact < 0.01)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: closed case with one wild value") {
    // group g: values 1..9 (median 5, adev 0..4, MAD 2) plus one wild 1000
    // n=10: median of 1..9,1000 = 5.5; adevs 4.5,3.5,...,0.5,994.5 → MAD 2.5
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 1000.0)))
      .toDF("k", "v")
    val out = Outliers.madOutliers(df, "k", "v", k = 3.0).head()
    assert(out.getAs[Long]("n") === 10L)
    assert(out.getAs[Double]("median") === 5.5)
    assert(out.getAs[Double]("mad") === 2.5)
    // threshold = 3 * 1.4826 * 2.5 = 11.1195; only 1000 exceeds it
    assert(out.getAs[Long]("n_outliers") === 1L)
  }

  test("madOutliers: robustness — the wild value does not mask itself") {
    // classic failure of mean/sigma: with n=10 and one huge value the
    // z-score threshold can swallow the outlier; MAD must not
    val vals = Seq.fill(9)(10.0) :+ 1e6
    val df = vals.map(("g", _)).toDF("k", "v")
    val out = Outliers.madOutliers(df, "k", "v").head()
    assert(out.getAs[Double]("mad") === 0.0)
    assert(out.getAs[Long]("n_outliers") === 1L) // MAD=0 rule: != median
  }

  test("madOutliers: no outliers in a tight group; groups are independent") {
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 500.0))).toDF("k", "v")
    val m = Outliers.madOutliers(df, "k", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_outliers")).toMap
    assert(m("a") === 0L)
    assert(m("b") === 1L)
  }

  test("mahalanobis matches a local 2x2 closed-form computation") {
    val data = Seq((1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.2),
      (5.0, 9.8), (2.5, 5.0), (3.5, 7.1))
    val df = data.toDF("x", "y")
    val got = Outliers.mahalanobis(df, Seq("x", "y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // local reference
    val n = data.size.toDouble
    val mx = data.map(_._1).sum / n
    val my = data.map(_._2).sum / n
    def cov(f: ((Double, Double)) => Double, g: ((Double, Double)) => Double) =
      (data.map(p => f(p) * g(p)).sum -
        data.map(f).sum * data.map(g).sum / n) / (n - 1)
    val (sxx, syy, sxy) = (cov(_._1, _._1), cov(_._2, _._2), cov(_._1, _._2))
    val det = sxx * syy - sxy * sxy
    data.foreach { case (x, y) =>
      val (dx, dy) = (x - mx, y - my)
      val expect = (syy * dx * dx - 2 * sxy * dx * dy + sxx * dy * dy) / det
      assert(math.abs(got((x, y)) - expect) < 1e-9, (x, y))
    }
  }

  test("mahalanobis: an off-ridge point outscores on-ridge points") {
    // y ~ 2x ridge plus one point inside the marginal ranges but off-ridge
    val base = (1 to 20).map(i => (i.toDouble, 2.0 * i + (i % 3) * 0.1))
    val off = (10.0, 2.0) // x typical, y typical-range, correlation broken
    val df = (base :+ off).toDF("x", "y")
    val got = Outliers.mahalanobis(df, Seq("x", "y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val ridgeMax = base.map(got(_)).max
    assert(got(off) > 4 * ridgeMax, "off-ridge point must dominate")
  }

  test("mahalanobis guards its output column and rank") {
    val df = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 5.0)).toDF("x", "md2")
    intercept[IllegalArgumentException] {
      Outliers.mahalanobis(df, Seq("x", "md2"))
    }
    intercept[IllegalArgumentException] {
      Outliers.mahalanobis(df.limit(2), Seq("x", "md2"), "out")
    }
  }
}

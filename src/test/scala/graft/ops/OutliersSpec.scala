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
}

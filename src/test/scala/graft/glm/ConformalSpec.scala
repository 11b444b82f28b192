package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("lmIntervals: q is the calibration residual percentile; bands are ±q") {
    val out = Conformal.lmIntervals(li, Seq("l_quantity"),
      "l_extendedprice", "l_orderkey", alpha = 0.1)
    val rows = out.select("prediction", "conf_lo", "conf_hi").limit(50)
      .collect()
    val widths = rows.map(r => (r.getDouble(0) - r.getDouble(1),
      r.getDouble(2) - r.getDouble(0)))
    // symmetric, constant width everywhere
    widths.foreach { case (lo, hi) => assert(math.abs(lo - hi) < 1e-9) }
    assert(widths.map(_._1).distinct.length === 1)
    val q = widths.head._1
    // q equals the engine percentile of calibration absolute residuals
    val ref = out.filter(col("is_calib"))
      .withColumn("ar", abs(col("l_extendedprice") - col("prediction")))
      .agg(expr("percentile(ar, 0.9)")).head().getDouble(0)
    assert(math.abs(q - ref) < 1e-9)
  }

  test("lmIntervals: empirical coverage on the calibration set is ~1-alpha") {
    val out = Conformal.lmIntervals(li, Seq("l_quantity"),
      "l_extendedprice", "l_orderkey", alpha = 0.2)
    val calib = out.filter(col("is_calib"))
    val n = calib.count().toDouble
    val covered = calib.filter(col("l_extendedprice") >= col("conf_lo") &&
      col("l_extendedprice") <= col("conf_hi")).count().toDouble
    assert(covered / n >= 0.78 && covered / n <= 0.88,
      s"coverage ${covered / n} not near 0.8")
  }

  test("lmIntervals: smaller alpha gives wider intervals") {
    def width(a: Double): Double = {
      val r = Conformal.lmIntervals(li, Seq("l_quantity"),
        "l_extendedprice", "l_orderkey", alpha = a)
        .select((col("conf_hi") - col("conf_lo")).as("w")).head()
      r.getDouble(0)
    }
    assert(width(0.05) > width(0.3))
  }

  test("lmIntervals rejects bad parameters") {
    intercept[IllegalArgumentException] {
      Conformal.lmIntervals(li, Seq("l_quantity"), "l_extendedprice",
        "l_orderkey", alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Conformal.lmIntervals(li, Seq("l_quantity"), "l_extendedprice",
        "l_orderkey", calibSixteenths = 16)
    }
  }
}

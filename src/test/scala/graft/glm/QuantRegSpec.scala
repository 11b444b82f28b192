package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantRegSpec extends SparkSpec {
  import spark.implicits._

  // y = 2x + 1 + e with e ∈ {−3, 0, +3} equally often: the conditional
  // median is exactly 2x + 1; the 1/3 and 2/3 quantile bands sit at ±3
  private def fixture = (for {
    x <- 1 to 30; e <- Seq(-3.0, 0.0, 3.0)
  } yield (x.toDouble, 2.0 * x + 1.0 + e)).toDF("x", "y")

  test("median regression recovers the symmetric-noise line") {
    val m = QuantReg.fit(fixture, Seq("x"), "y", tau = 0.5)
    assert(math.abs(m.coefs(1) - 2.0) < 0.02, s"slope ${m.coefs(1)}")
    assert(math.abs(m.coefs(0) - 1.0) < 0.5, s"intercept ${m.coefs(0)}")
  }

  test("quantile ordering: tau=0.8 line sits above tau=0.2") {
    val lo = QuantReg.fit(fixture, Seq("x"), "y", tau = 0.2)
    val hi = QuantReg.fit(fixture, Seq("x"), "y", tau = 0.8)
    // compare fitted values at x = 15 (mid-range)
    val at15 = (m: QuantReg.QuantRegModel) => m.coefs(0) + 15.0 * m.coefs(1)
    assert(at15(hi) - at15(lo) > 3.0,
      s"expected a clear band gap, got ${at15(lo)} vs ${at15(hi)}")
  }

  test("pinball loss beats the OLS line under asymmetric noise") {
    // heavy one-sided outliers pull OLS up; the median line resists
    val df = (for { x <- 1 to 40 } yield {
      val e = if (x % 4 == 0) 50.0 else 0.0
      (x.toDouble, x + e)
    }).toDF("x", "y")
    val med = QuantReg.fit(df, Seq("x"), "y", tau = 0.5)
    val ols = LM.fit(df, Seq("x"), "y")
    val olsPred = lit(ols.coefs(0)) + col("x") * ols.coefs(1)
    def pin(pred: org.apache.spark.sql.Column): Double = {
      val r = col("y") - pred
      df.agg(avg(greatest(lit(0.5) * r, lit(-0.5) * r))).head().getDouble(0)
    }
    assert(med.pinball < pin(olsPred))
    // and the median line tracks y = x, not the outliers
    assert(math.abs(med.coefs(1) - 1.0) < 0.05)
  }

  test("predict is a pure projection; model fields consistent") {
    val m = QuantReg.fit(fixture, Seq("x"), "y", tau = 0.5)
    val out = m.predict(fixture.limit(3))
    assert(out.columns.contains("prediction"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(m.iters == 6 && m.tau == 0.5)
  }

  test("fit is deterministic and partition-invariant on the grid") {
    val a = QuantReg.fit(fixture.repartition(1), Seq("x"), "y", 0.5)
    val b = QuantReg.fit(fixture.repartition(7), Seq("x"), "y", 0.5)
    assert(a.coefs.toSeq == b.coefs.toSeq) // 1e-8-grid quantized
  }
}

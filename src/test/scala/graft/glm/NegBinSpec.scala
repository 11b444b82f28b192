package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegBinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic NB(mu=2, theta=2) sample: expected-frequency histogram
  // p(k) = (k+1) * 0.25 * 0.5^k  (Gamma(k+2)/(k! Gamma(2)) = k+1)
  private def nbData = {
    val rows = (0 to 14).flatMap { k =>
      val pk = (k + 1) * 0.25 * math.pow(0.5, k)
      Seq.fill(math.round(2000 * pk).toInt)((1.0, k.toDouble))
    }
    rows.toDF("x", "y")
  }

  test("moment theta recovers the dispersion of NB(2, 2) data") {
    val m = NegBin.fit(nbData, Seq("x"), "y", outerIters = 4,
      newtonSteps = 3, intercept = false)
    assert(math.abs(m.theta - 2.0) < 0.5,
      s"theta should approach 2, got ${m.theta}")
    val mu = math.exp(m.model.coefs(0))
    assert(math.abs(mu - 2.0) < 0.1, s"mu should approach 2, got $mu")
  }

  test("Poisson (equidispersed) data drives theta upward without a root") {
    val pois = (0 to 12).flatMap { k =>
      val pk = math.exp(-2.0) * math.pow(2.0, k) /
        (1 to k).map(_.toDouble).product.max(1.0)
      Seq.fill(math.round(2000 * pk).toInt)((1.0, k.toDouble))
    }.toDF("x", "y")
    val m = NegBin.fit(pois, Seq("x"), "y", outerIters = 3,
      newtonSteps = 3, intercept = false)
    assert(m.theta > 20.0,
      s"no overdispersion -> theta escapes upward, got ${m.theta}")
  }

  test("fit is deterministic and partition-invariant (theta on the 1e-8 grid)") {
    def run(df: org.apache.spark.sql.DataFrame) = {
      val m = NegBin.fit(df, Seq("x"), "y", outerIters = 2, newtonSteps = 2,
        intercept = false)
      (m.theta, math.rint(m.model.coefs(0) * 1e6) / 1e6)
    }
    assert(run(nbData) === run(nbData.repartition(13)))
  }

  test("fixed theta negbin GLM is the inner loop: same mu at the fitted theta") {
    val m = NegBin.fit(nbData, Seq("x"), "y", outerIters = 3,
      newtonSteps = 3, intercept = false)
    val fixed = GLM.fit(nbData, Seq("x"), "y",
      family = f"negbin(${m.theta}%.8f)", intercept = false)
    assert(math.abs(m.model.coefs(0) - fixed.coefs(0)) < 1e-9)
  }
}

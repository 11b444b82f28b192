package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PoissonSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic Poisson data: log μ = 0.5 + 0.8·x1 − 0.4·x2. */
  private lazy val pois = {
    val rng = new scala.util.Random(7)
    def samplePoisson(lambda: Double): Double = {
      // Knuth's method (lambda < ~30 here)
      val l = math.exp(-lambda)
      var k = 0
      var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      k.toDouble
    }
    (1 to 3000).map { i =>
      val x1 = rng.nextDouble() * 2 - 1
      val x2 = rng.nextDouble() * 2
      val mu = math.exp(0.5 + 0.8 * x1 - 0.4 * x2)
      (i, x1, x2, samplePoisson(mu))
    }.toDF("id", "x1", "x2", "y")
  }

  test("poisson log-link fit recovers the generating coefficients") {
    val m = GLM.fit(pois, Seq("x1", "x2"), "y", family = "poisson")
    assert(m.family === "poisson" && m.link.name === "log")
    assert(math.abs(m.coefs(0) - 0.5) < 0.1, s"b0=${m.coefs(0)}")
    assert(math.abs(m.coefs(1) - 0.8) < 0.1, s"b1=${m.coefs(1)}")
    assert(math.abs(m.coefs(2) - (-0.4)) < 0.1, s"b2=${m.coefs(2)}")
    assert(m.deviance < m.nullDeviance)
    assert(m.iter >= 2 && m.iter <= 25)
    assert(m.aic > 0)
  }

  test("intercept-only poisson mean is exactly ybar") {
    val m = GLM.fit(pois.withColumn("one", lit(1.0)), Seq("one"), "y",
      family = "poisson", intercept = false)
    val yBar = pois.agg(avg("y")).head().getDouble(0)
    assert(math.abs(math.exp(m.coefs(0)) - yBar) < 1e-7)
    assert(math.abs(m.nullDeviance - m.deviance) < 1e-6)
  }

  test("poisson fit is invariant to partitioning") {
    val a = GLM.fit(pois.repartition(1), Seq("x1", "x2"), "y", family = "poisson")
    val b = GLM.fit(pois.repartition(11), Seq("x1", "x2"), "y", family = "poisson")
    (0 until 3).foreach(i => assert(math.abs(a.coefs(i) - b.coefs(i)) < 1e-8))
  }

  test("predictions are positive rates; summary renders the family") {
    val m = GLM.fit(pois, Seq("x1", "x2"), "y", family = "poisson")
    val preds = m.predict(pois.limit(50)).select("prediction")
      .collect().map(_.getDouble(0))
    assert(preds.forall(_ > 0))
    assert(m.summary.contains("poisson"))
  }

  test("binomial path is unchanged by the family refactor (regression guard)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("is_r", when($"l_returnflag" === "R", 1.0).otherwise(0.0))
    val m = GLM.fit(li, Seq("l_quantity", "l_discount"), "is_r")
    assert(m.family === "binomial" && m.link.name === "logit")
    assert(m.deviance < m.nullDeviance && m.iter < 30)
  }
}

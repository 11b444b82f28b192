package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZeroInflSpec extends SparkSpec {
  import spark.implicits._

  // deterministic ZIP sample: expected-frequency histograms, no RNG.
  // Cell x=0: Poisson(1) counts + 200 structural zeros; cell x=1:
  // Poisson(3) counts + 200 structural zeros → π_true ≈ 200/700 = 0.286.
  private def pois(lam: Double, n: Int): Seq[Int] =
    (0 to 12).flatMap { k =>
      val pk = math.exp(-lam) * math.pow(lam, k) /
        (1 to k).map(_.toDouble).product.max(1.0)
      Seq.fill(math.round(n * pk).toInt)(k)
    }
  private def zipData = {
    val c0 = pois(1.0, 500).map(y => (0.0, y.toDouble)) ++
      Seq.fill(200)((0.0, 0.0))
    val c1 = pois(3.0, 500).map(y => (1.0, y.toDouble)) ++
      Seq.fill(200)((1.0, 0.0))
    (c0 ++ c1).toDF("x", "y")
  }

  test("EM recovers the structural-zero share and the cell means") {
    val m = ZeroInfl.fitZip(zipData, Seq("x"), "y", emIters = 12)
    assert(math.abs(m.pi - 200.0 / 700.0) < 0.06,
      s"pi should approach ~0.286, got ${m.pi}")
    val mu0 = math.exp(m.count.coefs(0))
    val mu1 = math.exp(m.count.coefs(0) + m.count.coefs(1))
    assert(math.abs(mu0 - 1.0) < 0.15, s"mu0 ~ 1, got $mu0")
    assert(math.abs(mu1 - 3.0) < 0.35, s"mu1 ~ 3, got $mu1")
  }

  test("pure Poisson data drives pi toward zero") {
    val pure = pois(2.0, 1000).map(y => (1.0, y.toDouble)).toDF("x", "y")
      .withColumn("x", lit(1.0))
    val m = ZeroInfl.fitZip(pure, Seq("x"), "y", emIters = 12,
      intercept = false)
    assert(m.pi < 0.05, s"no structural zeros -> pi ~ 0, got ${m.pi}")
  }

  test("fit is deterministic and partition-invariant on the 6-digit grid") {
    def run(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val m = ZeroInfl.fitZip(df, Seq("x"), "y", emIters = 4)
      (math.rint(m.pi * 1e6) / 1e6,
        math.rint(m.count.coefs(0) * 1e6) / 1e6)
    }
    assert(run(zipData) === run(zipData.repartition(13)))
  }

  test("predict emits E[y] = (1-pi)·mu and a coherent p_zero") {
    val m = ZeroInfl.fitZip(zipData, Seq("x"), "y", emIters = 6)
    val rows = m.predict(zipData.select("x").distinct())
      .select($"x", $"prediction", $"p_zero").collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val mu0 = math.exp(m.count.coefs(0))
    assert(math.abs(rows(0.0)._1 - (1 - m.pi) * mu0) < 1e-9)
    rows.values.foreach { case (_, pz) =>
      assert(pz >= m.pi - 1e-12 && pz <= 1.0)
    }
    // the x=0 cell has more zeros than its count mean implies
    assert(rows(0.0)._2 > rows(1.0)._2)
  }
}

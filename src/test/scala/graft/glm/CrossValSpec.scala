package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossValSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = {
    val rng = new scala.util.Random(23)
    (1 to 600).map { i =>
      val x1 = rng.nextDouble() * 10
      val x2 = rng.nextDouble() * 4
      val y = 1.0 + 2.5 * x1 - 0.7 * x2 + rng.nextGaussian() * 0.8
      (i, x1, x2, y)
    }.toDF("id", "x1", "x2", "y")
  }

  private val fold = pmod(col("id"), lit(3)).cast("int")

  test("complement-Gram out-of-fold fits equal literal per-fold refits") {
    val cv = CrossVal.lmCV(data, Seq("x1", "x2"), "y", fold)
      .orderBy("fold").collect()
    assert(cv.length === 3)
    (0 until 3).foreach { f =>
      val train = data.filter(fold =!= f)
      val test = data.filter(fold === f)
      val m = LM.fit(train, Seq("x1", "x2"), "y")
      val mseRef = m.predict(test)
        .agg(avg(pow(col("y") - col("prediction"), 2))).head().getDouble(0)
      val row = cv(f)
      assert(row.getInt(0) === f)
      assert(row.getLong(1) === train.count())
      assert(row.getLong(2) === test.count())
      val mse = row.getDouble(3)
      assert(math.abs(mse - mseRef) < 1e-8 * (1 + mseRef), s"fold $f: $mse vs $mseRef")
      assert(math.abs(row.getDouble(4) - math.sqrt(mseRef)) < 1e-8)
    }
  }

  test("weighted CV threads the weight into the complement fits") {
    val weighted = data.withColumn("w", lit(1.0) + pmod(col("id"), lit(4)))
    val cv = CrossVal.lmCV(weighted, Seq("x1"), "y", fold,
      weightCol = Some("w")).orderBy("fold").collect()
    val f = 1
    val train = weighted.filter(fold =!= f)
    val m = LM.fit(train, Seq("x1"), "y", weightCol = Some("w"))
    val mseRef = m.predict(weighted.filter(fold === f))
      .agg(avg(pow(col("y") - col("prediction"), 2))).head().getDouble(0)
    assert(math.abs(cv(f).getDouble(3) - mseRef) < 1e-8 * (1 + mseRef))
  }

  test("two folds is the minimum; a constant fold column is rejected") {
    intercept[IllegalArgumentException] {
      CrossVal.lmCV(data, Seq("x1"), "y", lit(0))
    }
  }
}

class ElasticNetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = {
    val rng = new scala.util.Random(31)
    (1 to 500).map { i =>
      val x1 = rng.nextDouble() * 10
      val x2 = rng.nextDouble() * 4
      val x3 = rng.nextDouble() // pure noise feature
      val y = 2.0 + 3.0 * x1 - 1.5 * x2 + rng.nextGaussian() * 0.5
      (i, x1, x2, x3, y)
    }.toDF("id", "x1", "x2", "x3", "y")
  }

  test("lambda = 0 recovers OLS") {
    val ols = LM.fit(data, Seq("x1", "x2"), "y")
    val en = ElasticNet.fit(data, Seq("x1", "x2"), "y", lambda = 0.0)
    (0 until 3).foreach(i => assert(math.abs(en.coefs(i) - ols.coefs(i)) < 1e-8,
      s"coef $i: ${en.coefs(i)} vs ${ols.coefs(i)}"))
    assert(math.abs(en.r2 - ols.r2) < 1e-10)
  }

  test("single-predictor lasso equals the soft-threshold closed form") {
    val rows = data.select($"x1", $"y").collect()
    val n = rows.length.toDouble
    val (xs, ys) = (rows.map(_.getDouble(0)), rows.map(_.getDouble(1)))
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cxx = xs.map(x => (x - mx) * (x - mx)).sum
    val cxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val lam = math.abs(cxy) / n * 0.4 // thresholds but does not kill
    val en = ElasticNet.fit(data, Seq("x1"), "y", lambda = lam)
    val b1Ref = math.signum(cxy) * math.max(0.0, math.abs(cxy) / n - lam) / (cxx / n)
    assert(math.abs(en.coefs(1) - b1Ref) < 1e-10, s"${en.coefs(1)} vs $b1Ref")
    assert(math.abs(en.coefs(0) - (my - b1Ref * mx)) < 1e-10)
    assert(en.iter <= 3) // p = 1 converges in one sweep
  }

  test("large lambda selects everything out; moderate lambda drops the noise feature") {
    val dead = ElasticNet.fit(data, Seq("x1", "x2", "x3"), "y", lambda = 1e9)
    assert(dead.nZero === 3)
    assert(math.abs(dead.coefs(0) -
      data.agg(avg($"y")).head().getDouble(0)) < 1e-8) // b0 = ybar
    // x3 is noise: a lambda too small to kill the real slopes zeroes x3 only
    val sel = ElasticNet.fit(data, Seq("x1", "x2", "x3"), "y", lambda = 0.5)
    assert(sel.coefs(3) === 0.0, s"noise coef survived: ${sel.coefs(3)}")
    assert(sel.coefs(1) != 0.0 && sel.coefs(2) != 0.0)
  }

  test("path equals independent per-lambda fits, in the caller's order") {
    val lams = Seq(0.3, 5.0, 1.2) // deliberately unsorted
    val ms = ElasticNet.path(data, Seq("x1", "x2", "x3"), "y", lams)
    assert(ms.map(_.lambda) === lams)
    lams.zip(ms).foreach { case (lam, pm) =>
      val single = ElasticNet.fit(data, Seq("x1", "x2", "x3"), "y", lam)
      (0 until 4).foreach(i =>
        assert(math.abs(pm.coefs(i) - single.coefs(i)) < 1e-9,
          s"lambda $lam coef $i: ${pm.coefs(i)} vs ${single.coefs(i)}"))
    }
  }

  test("alpha = 0 coordinate descent matches LM.fitRidge (lambda scaled by n)") {
    val lamRaw = 80.0
    val ridge = LM.fitRidge(data, Seq("x1", "x2"), "y", lambda = lamRaw)
    val en = ElasticNet.fit(data, Seq("x1", "x2"), "y",
      lambda = lamRaw / 500.0, alpha = 0.0)
    (0 until 3).foreach(i => assert(math.abs(en.coefs(i) - ridge.coefs(i)) < 1e-8,
      s"coef $i: ${en.coefs(i)} vs ${ridge.coefs(i)}"))
  }
}

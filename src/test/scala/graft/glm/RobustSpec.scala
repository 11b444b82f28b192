package graft.glm

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  // clean line y = 2 + 3x with a few gross outliers appended
  private def cleanAndDirty = {
    val clean = (1 to 200).map { i =>
      val x = i / 20.0
      (x, 2.0 + 3.0 * x + (if (i % 2 == 0) 0.05 else -0.05))
    }
    val outliers = Seq((2.0, 500.0), (5.0, 480.0), (8.0, 520.0))
    (clean, clean ++ outliers)
  }

  test("with a huge delta the Huber fixed point is exactly OLS") {
    val (_, dirty) = cleanAndDirty
    val df = dirty.toDF("x", "y")
    val h = Robust.huber(df, Seq("x"), "y", delta = 1e9)
    val ols = LM.fit(df, Seq("x"), "y")
    assert(math.abs(h.coef(0) - ols.coefs(0)) < 1e-9)
    assert(math.abs(h.coef(1) - ols.coefs(1)) < 1e-9)
  }

  test("gross outliers barely move Huber where they drag OLS away") {
    val (clean, dirty) = cleanAndDirty
    val dfDirty = dirty.toDF("x", "y")
    val olsClean = LM.fit(clean.toDF("x", "y"), Seq("x"), "y")
    val olsDirty = LM.fit(dfDirty, Seq("x"), "y")
    val h = Robust.huber(dfDirty, Seq("x"), "y")
    // the three +500 outliers drag the OLS intercept by several units;
    // Huber must stay on the clean line for BOTH coefficients
    assert(math.abs(h.coef(0) - olsClean.coefs(0)) < 0.05,
      s"huber intercept ${h.coef(0)} vs clean ${olsClean.coefs(0)}")
    assert(math.abs(h.coef(1) - olsClean.coefs(1)) < 0.05,
      s"huber slope ${h.coef(1)} vs clean ${olsClean.coefs(1)}")
    assert(math.abs(olsDirty.coefs(0) - olsClean.coefs(0)) > 1.0,
      s"OLS intercept should be visibly dragged: ${olsDirty.coefs(0)}")
    assert(h.scale > 0 && h.iters >= 2 && h.n === dirty.size.toLong)
  }

  test("huber is invariant to partitioning") {
    // the exact-percentile scale is partition-invariant; the Gram sums
    // reassociate across partitions, so equality is to float tolerance
    val (_, dirty) = cleanAndDirty
    val a = Robust.huber(dirty.toDF("x", "y"), Seq("x"), "y")
    val b = Robust.huber(dirty.toDF("x", "y").repartition(7), Seq("x"), "y")
    assert(math.abs(a.coef(0) - b.coef(0)) < 1e-9)
    assert(math.abs(a.coef(1) - b.coef(1)) < 1e-9)
  }

  test("degenerate exact fit (scale 0) falls back to unweighted OLS") {
    val exact = (1 to 50).map(i => (i.toDouble, 1.0 + 2.0 * i)).toDF("x", "y")
    val h = Robust.huber(exact, Seq("x"), "y")
    assert(math.abs(h.coef(0) - 1.0) < 1e-8 && math.abs(h.coef(1) - 2.0) < 1e-8)
  }
}

package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import graft.SparkSpec
import org.apache.spark.sql.functions._

class LMSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic data: y = 2 + 3·x1 − 1.5·x2 + noise(seeded). */
  private lazy val data = {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      val x1 = rng.nextDouble() * 10
      val x2 = rng.nextDouble() * 4
      val y = 2.0 + 3.0 * x1 - 1.5 * x2 + rng.nextGaussian() * 0.5
      (i, x1, x2, y)
    }
    rows.toDF("id", "x1", "x2", "y")
  }

  /** Local reference solve on collected data (straightforward normal eqs). */
  private def localFit(xs: Array[Array[Double]], y: Array[Double]): BDV[Double] = {
    val n = xs.length; val p = xs.head.length
    val x = BDM.tabulate(n, p)((i, j) => xs(i)(j))
    val yv = BDV(y)
    (x.t * x) \ (x.t * yv)
  }

  test("coefficients match a local solve") {
    val m = LM.fit(data, Seq("x1", "x2"), "y")
    val local = localFit(
      data.select($"x1", $"x2").collect().map(r => Array(1.0, r.getDouble(0), r.getDouble(1))),
      data.select($"y").collect().map(_.getDouble(0)))
    (0 until 3).foreach(i => assert(math.abs(m.coefs(i) - local(i)) < 1e-8,
      s"coef $i: ${m.coefs(i)} vs ${local(i)}"))
    assert(math.abs(m.coefs(0) - 2.0) < 0.2)
    assert(math.abs(m.coefs(1) - 3.0) < 0.05)
    assert(math.abs(m.coefs(2) - (-1.5)) < 0.05)
  }

  test("fit is invariant to partitioning") {
    val a = LM.fit(data.repartition(1), Seq("x1", "x2"), "y")
    val b = LM.fit(data.repartition(13), Seq("x1", "x2"), "y")
    (0 until 3).foreach(i => assert(math.abs(a.coefs(i) - b.coefs(i)) < 1e-9))
    assert(math.abs(a.r2 - b.r2) < 1e-12)
  }

  test("perfect fit has r2 = 1 and near-zero sigma") {
    val exact = data.withColumn("yy", lit(1.0) + col("x1") * 2.0)
    val m = LM.fit(exact, Seq("x1"), "yy")
    assert(math.abs(m.r2 - 1.0) < 1e-12)
    assert(m.sigma < 1e-6)
    assert(math.abs(m.coefs(0) - 1.0) < 1e-9)
    assert(math.abs(m.coefs(1) - 2.0) < 1e-9)
  }

  test("summary statistics are sane") {
    val m = LM.fit(data, Seq("x1", "x2"), "y")
    assert(m.r2 > 0.99)
    assert(m.fStat > 1000)
    assert(m.pValues(1) < 1e-10)
    assert(m.summary.contains("R-squared"))
  }

  test("predict appends prediction and preserves rows; missing cols become 0") {
    val m = LM.fit(data, Seq("x1", "x2"), "y")
    val scored = m.predict(data)
    assert(scored.count() == 500)
    assert(scored.columns.contains("prediction"))
    // dropping x2 at scoring time = x2 treated as 0
    val one = m.predict(data.select($"id", $"x1").limit(1))
    val r = one.select($"x1", $"prediction").head()
    val expected = m.coefs(0) + m.coefs(1) * r.getDouble(0)
    assert(math.abs(r.getDouble(1) - expected) < 1e-12)
  }

  test("weight 2 is equivalent to row duplication (WLS)") {
    val w2 = data.withColumn("w", when($"id" % 2 === 0, 2.0).otherwise(1.0))
    val dup = data.union(data.filter($"id" % 2 === 0))
    val a = LM.fit(w2, Seq("x1", "x2"), "y", weightCol = Some("w"))
    val b = LM.fit(dup, Seq("x1", "x2"), "y")
    (0 until 3).foreach(i => assert(math.abs(a.coefs(i) - b.coefs(i)) < 1e-9))
  }

  test("fitFormula with categorical dummies on real parquet") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val m = LM.fitFormula(cust, "c_acctbal ~ c_nationkey + c_mktsegment")
    // 1 intercept + 1 numeric + 4 dummies (5 segments, k-1)
    assert(m.xnames.length == 6)
    assert(m.xnames.count(_.startsWith("c_mktsegment_")) == 4)
    assert(m.n == 150)
  }

  test("fitFormula numeric interaction equals a manual product column") {
    val manual = LM.fit(data.withColumn("x1x2", $"x1" * $"x2"),
      Seq("x1", "x2", "x1x2"), "y")
    val viaFormula = LM.fitFormula(data, "y ~ x1 * x2")
    assert(viaFormula.xnames.toSeq ==
      Seq("(Intercept)", "x1", "x2", "x1:x2"))
    (0 until 4).foreach(i =>
      assert(math.abs(viaFormula.coefs(i) - manual.coefs(i)) < 1e-9,
        s"coef $i: ${viaFormula.coefs(i)} vs ${manual.coefs(i)}"))
    assert(math.abs(viaFormula.r2 - manual.r2) < 1e-12)
  }

  test("fitFormula a*b equals a + b + a:b spelled out") {
    val a = LM.fitFormula(data, "y ~ x1 * x2")
    val b = LM.fitFormula(data, "y ~ x1 + x2 + x1:x2")
    assert(a.xnames.toSeq == b.xnames.toSeq)
    (0 until 4).foreach(i => assert(a.coefs(i) === b.coefs(i)))
  }

  test("fitFormula numeric:factor interaction equals manual dummy products") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val m = LM.fitFormula(cust, "c_acctbal ~ c_nationkey * c_mktsegment")
    // intercept + nationkey + 4 dummies + 4 slope-shift interactions
    assert(m.xnames.length == 10)
    assert(m.xnames.count(_.contains(":")) == 4)
    // manual: encode the dummies, multiply by the numeric, fit directly
    val lv = ModelMatrix.levels(cust, Seq("c_mktsegment"))("c_mktsegment")
    val dummies = lv.drop(1).toSeq
    val enc = dummies.foldLeft(cust) { (df, l) =>
      df.withColumn(s"d_$l",
          when($"c_mktsegment" === l, 1.0).otherwise(0.0))
        .withColumn(s"i_$l",
          when($"c_mktsegment" === l, 1.0).otherwise(0.0) * $"c_nationkey")
    }
    val manual = LM.fit(enc,
      Seq("c_nationkey") ++ dummies.map("d_" + _) ++ dummies.map("i_" + _),
      "c_acctbal")
    (0 until 10).foreach(i =>
      assert(math.abs(m.coefs(i) - manual.coefs(i)) < 1e-8,
        s"coef $i (${m.xnames(i)}): ${m.coefs(i)} vs ${manual.coefs(i)}"))
  }

  test("no-intercept fit") {
    val m = LM.fit(data, Seq("x1"), "y", intercept = false)
    assert(m.xnames.toSeq == Seq("x1"))
    // slope absorbs the intercept; just check it solved and r2 is defined
    assert(m.coefs(0) > 2.5 && m.coefs(0) < 4.0)
  }

  test("predictWithSe matches an independent local computation (R predict.lm)") {
    val m = LM.fit(data, Seq("x1", "x2"), "y")
    // independent reference: rebuild (X'X)^-1 from collected rows with
    // plain breeze, not the model's stored kernel
    val rows = data.select("x1", "x2", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = rows.length
    val x = BDM.tabulate(n, 3)((i, j) =>
      j match { case 0 => 1.0; case 1 => rows(i)._1; case 2 => rows(i)._2 })
    val ixtx = breeze.linalg.inv(x.t * x)
    val got = m.predictWithSe(data, interval = "confidence")
      .select("x1", "x2", "prediction", "se_fit", "lwr", "upr")
      .collect()
    val tq = new org.apache.commons.math3.distribution.TDistribution((n - 3).toDouble)
      .inverseCumulativeProbability(0.975)
    got.foreach { r =>
      val x0 = BDV(1.0, r.getDouble(0), r.getDouble(1))
      val seRef = m.sigma * math.sqrt(x0 dot (ixtx * x0))
      assert(math.abs(r.getDouble(3) - seRef) < 1e-8 * (1 + seRef))
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - tq * seRef)) < 1e-6)
      assert(math.abs(r.getDouble(5) - (r.getDouble(2) + tq * seRef)) < 1e-6)
    }
    // prediction intervals are strictly wider than confidence intervals
    // and cover nearly all in-sample observations at the 95% level
    val pi = m.predictWithSe(data, interval = "prediction")
      .select(col("y"), col("lwr"), col("upr"),
        (col("upr") - col("lwr")).as("w")).collect()
    val ci = got.map(r => r.getDouble(5) - r.getDouble(4))
    pi.map(_.getDouble(3)).zip(ci).foreach { case (wp, wc) => assert(wp > wc) }
    val covered = pi.count(r =>
      r.getDouble(0) >= r.getDouble(1) && r.getDouble(0) <= r.getDouble(2))
    assert(covered >= (0.9 * n).toInt, s"PI covered $covered of $n")
  }

  test("save/load round-trips the model bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-model").toString
    try {
      val m = LM.fit(data, Seq("x1", "x2"), "y")
      m.save(spark, s"$dir/m")
      val back = LM.load(spark, s"$dir/m")
      assert(back.xnames.toSeq === m.xnames.toSeq)
      assert(back.coefs === m.coefs && back.stdErr === m.stdErr)
      assert(back.sigma === m.sigma && back.r2 === m.r2 &&
        back.adjR2 === m.adjR2 && back.fStat === m.fStat && back.n === m.n)
      assert(back.summary === m.summary)
      // the loaded model scores identically, standard errors included
      val a = m.predict(data).select("prediction").collect().map(_.getDouble(0))
      val b = back.predict(data).select("prediction").collect().map(_.getDouble(0))
      assert(a === b)
      assert(back.xtxInv === m.xtxInv)
      val sa = m.predictWithSe(data).select("se_fit").collect().map(_.getDouble(0))
      val sb = back.predictWithSe(data).select("se_fit").collect().map(_.getDouble(0))
      assert(sa === sb)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("weighted prediction interval uses sigma^2/w + se_fit^2 (R predict.lm weights=)") {
    val m = LM.fit(data, Seq("x1", "x2"), "y")
    val weighted = data.withColumn("w", lit(1.0) + col("id") % 4)
    val rows = m.predictWithSe(weighted, interval = "prediction", weightCol = Some("w"))
      .select("se_fit", "lwr", "upr", "w", "prediction").collect()
    val tq = new org.apache.commons.math3.distribution.TDistribution(m.dfResidual.toDouble)
      .inverseCumulativeProbability(0.975)
    rows.foreach { r =>
      val se = r.getDouble(0); val w = r.getDouble(3)
      // se_fit = sigma*sqrt(quad)  =>  quad = (se/sigma)^2
      val half = tq * math.sqrt(m.sigma * m.sigma / w + se * se)
      assert(math.abs(r.getDouble(2) - (r.getDouble(4) + half)) < 1e-8)
      assert(math.abs(r.getDouble(1) - (r.getDouble(4) - half)) < 1e-8)
    }
  }

  test("load tolerates a pre-xtx_inv save; only predictWithSe then fails") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-legacy").toString
    try {
      val m = LM.fit(data, Seq("x1", "x2"), "y")
      m.save(spark, s"$dir/m")
      // simulate a model persisted before the kernel column existed
      spark.read.parquet(s"$dir/m").drop("xtx_inv")
        .coalesce(1).write.parquet(s"$dir/legacy")
      val back = LM.load(spark, s"$dir/legacy")
      val a = m.predict(data).select("prediction").collect().map(_.getDouble(0))
      val b = back.predict(data).select("prediction").collect().map(_.getDouble(0))
      assert(a === b)
      assert(back.summary === m.summary)
      val e = intercept[IllegalArgumentException] {
        back.predictWithSe(data).collect()
      }
      assert(e.getMessage.contains("xtx_inv"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("wide-p se_fit (closure-UDF quadratic form) matches a local computation") {
    // 18 features + intercept = p 19 > unrollMaxP 16 -> the UDF path
    val rng = new scala.util.Random(11)
    val wide = (1 to 300).map { _ =>
      val xs = Array.fill(18)(rng.nextDouble())
      (xs, xs.sum * 2.0 + rng.nextGaussian() * 0.1)
    }
    val df = wide.map { case (xs, y) => (xs(0), xs(1), xs(2), xs(3), xs(4), xs(5),
      xs(6), xs(7), xs(8), xs(9), xs(10), xs(11), xs(12), xs(13), xs(14), xs(15),
      xs(16), xs(17), y) }
      .toDF((1 to 18).map(i => s"f$i") :+ "y": _*)
    val feats = (1 to 18).map(i => s"f$i")
    val m = LM.fit(df, feats, "y")
    assert(m.p === 19)
    val x = BDM.tabulate(wide.length, 19)((i, j) =>
      if (j == 0) 1.0 else wide(i)._1(j - 1))
    val ixtx = breeze.linalg.inv(x.t * x)
    val got = m.predictWithSe(df).select(feats.map(col) :+ col("se_fit"): _*).collect()
    got.take(20).foreach { r =>
      val x0 = BDV(1.0 +: (0 until 18).map(r.getDouble).toArray: _*)
      val seRef = m.sigma * math.sqrt(x0 dot (ixtx * x0))
      assert(math.abs(r.getDouble(18) - seRef) < 1e-6 * (1 + seRef))
    }
  }

  test("wide-path treeAggregate agrees with expression path") {
    // force the wide path by exceeding maxExprWidth with dummy features
    val cols = (1 to 70).map(i => (col("x1") * lit(i * 0.01)).as(s"f$i"))
    val wide = data.select((Seq($"y", $"x1", $"x2") ++ cols): _*)
    val gExpr = Gram.normal(wide, Seq(lit(1.0), col("x1"), col("x2")), col("y"))
    val gWide = Gram.normal(wide, (Seq(lit(1.0), col("x1"), col("x2")) ++
      (1 to 70).map(i => col(s"f$i"))), col("y"))
    assert(math.abs(gExpr.xtx(1, 2) - gWide.xtx(1, 2)) < 1e-6)
    assert(gExpr.n == gWide.n)
  }

  test("diagnostics match the simple-regression closed forms; hat sums to p") {
    val m = LM.fit(data, Seq("x1"), "y")
    val d = m.diagnostics(data)
      .select($"x1", $"y", $"residual", $"hat", $"std_resid",
        $"student_resid", $"cooks_d").collect()
    val n = d.length.toDouble
    val xs = d.map(_.getDouble(0))
    val mx = xs.sum / n
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum
    val dfe = n - 2.0
    // independent per-row closed forms: h = 1/n + (x−x̄)²/Sxx, rstandard,
    // rstudent with the leave-one-out σ, Cook's D
    d.take(50).foreach { r =>
      val (x, y, e, h) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val hRef = 1.0 / n + (x - mx) * (x - mx) / sxx
      assert(math.abs(h - hRef) < 1e-10, s"hat: $h vs $hRef")
      val stdRef = e / (m.sigma * math.sqrt(1.0 - hRef))
      assert(math.abs(r.getDouble(4) - stdRef) < 1e-8)
      val s2i = (dfe * m.sigma * m.sigma - e * e / (1.0 - hRef)) / (dfe - 1.0)
      assert(math.abs(r.getDouble(5) - e / math.sqrt(s2i * (1.0 - hRef))) < 1e-8)
      assert(math.abs(r.getDouble(6) - stdRef * stdRef / 2.0 * hRef / (1.0 - hRef)) < 1e-10)
    }
    assert(math.abs(d.map(_.getDouble(3)).sum - m.p) < 1e-8) // Σh = p
  }

  test("diagnostics under WLS use weighted leverage and scaled residuals") {
    val weighted = data.withColumn("w", lit(1.0) + col("id") % 4)
    val m = LM.fit(weighted, Seq("x1", "x2"), "y", weightCol = Some("w"))
    val rows = m.diagnostics(weighted, weightCol = Some("w"))
      .select($"hat", $"std_resid").collect()
    assert(math.abs(rows.map(_.getDouble(0)).sum - m.p) < 1e-8) // Σ wᵢhᵢ* = p
    // standardized residuals of a well-specified fit are ~N(0,1): the
    // scale check guards the √w factor (unweighted residuals would be off)
    val sd = math.sqrt(rows.map(r => math.pow(r.getDouble(1), 2)).sum / rows.length)
    assert(sd > 0.8 && sd < 1.2, s"std_resid scale $sd")
  }

  test("ridge at lambda=0 equals OLS; lambda>0 shrinks and matches a local solve") {
    val ols = LM.fit(data, Seq("x1", "x2"), "y")
    val r0 = LM.fitRidge(data, Seq("x1", "x2"), "y", lambda = 0.0)
    (0 until 3).foreach(i => assert(math.abs(r0.coefs(i) - ols.coefs(i)) < 1e-10))
    assert(math.abs(r0.sigma - ols.sigma) < 1e-10)
    assert(math.abs(r0.stdErr(1) - ols.stdErr(1)) < 1e-10) // sandwich → plain at λ=0

    val lam = 50.0
    val m = LM.fitRidge(data, Seq("x1", "x2"), "y", lambda = lam)
    val rows = data.select($"x1", $"x2", $"y").collect()
    val x = BDM.tabulate(rows.length, 3)((i, j) =>
      if (j == 0) 1.0 else rows(i).getDouble(j - 1))
    val yv = BDV(rows.map(_.getDouble(2)))
    val pen = x.t * x
    pen(1, 1) += lam; pen(2, 2) += lam
    val local = pen \ (x.t * yv)
    (0 until 3).foreach(i => assert(math.abs(m.coefs(i) - local(i)) < 1e-8,
      s"ridge coef $i: ${m.coefs(i)} vs ${local(i)}"))
    // shrinkage: penalized slopes are strictly smaller in magnitude
    assert(math.abs(m.coefs(1)) < math.abs(ols.coefs(1)))
    assert(math.abs(m.coefs(2)) < math.abs(ols.coefs(2)))
  }
}

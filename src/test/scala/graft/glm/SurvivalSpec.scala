package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook curve with right censoring") {
    // t=1 event, t=2 censored, t=3 event, t=4 event, t=5 censored
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 0))
      .toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev").orderBy("t")
      .select("t", "n_risk", "d", "c", "survival").collect()
    assert(out.map(_.getDouble(0)).toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(out.map(_.getLong(1)).toSeq === Seq(5L, 4L, 3L, 2L, 1L))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L, 1L, 1L, 0L))
    val s = out.map(_.getDouble(4))
    assert(math.abs(s(0) - 0.8) < 1e-12)
    assert(math.abs(s(1) - 0.8) < 1e-12)            // censoring: no drop
    assert(math.abs(s(2) - 0.8 * 2.0 / 3.0) < 1e-12)
    assert(math.abs(s(3) - 0.8 * 2.0 / 3.0 * 0.5) < 1e-12)
    assert(math.abs(s(4) - s(3)) < 1e-12)
  }

  test("kaplanMeier: ties at one time are handled in a single factor") {
    // two events and one censor at t=2 among 5 at risk
    val df = Seq((1.0, 1), (2.0, 1), (2.0, 1), (2.0, 0), (3.0, 1))
      .toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev").orderBy("t")
      .select("t", "n_risk", "d", "survival").collect()
    assert(out.map(_.getDouble(0)).toSeq === Seq(1.0, 2.0, 3.0))
    assert(out.map(_.getLong(1)).toSeq === Seq(5L, 4L, 1L))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L, 1L))
    val s = out.map(_.getDouble(3))
    assert(math.abs(s(0) - 0.8) < 1e-12)
    assert(math.abs(s(1) - 0.8 * 0.5) < 1e-12)
    assert(math.abs(s(2) - 0.0) < 1e-12)            // last at-risk fails
  }

  test("kaplanMeier: no censoring reduces to the empirical survivor function") {
    val df = (1 to 10).map(i => (i.toDouble, 1)).toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev").orderBy("t")
      .select("t", "survival").collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getDouble(1) - (10.0 - (i + 1)) / 10.0) < 1e-12)
    }
  }

  test("kaplanMeier: grouped curves are independent") {
    val df = (Seq((1.0, 1), (2.0, 1)).map { case (t, e) => ("a", t, e) } ++
      Seq((1.0, 0), (3.0, 1)).map { case (t, e) => ("b", t, e) })
      .toDF("g", "dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev", Seq("g"))
      .orderBy("g", "t").select("g", "survival").collect()
    assert(math.abs(out(0).getDouble(1) - 0.5) < 1e-12)  // a: 1/2 survive t=1
    assert(math.abs(out(1).getDouble(1) - 0.0) < 1e-12)  // a: none at t=2
    assert(math.abs(out(2).getDouble(1) - 1.0) < 1e-12)  // b: censored at t=1
    assert(math.abs(out(3).getDouble(1) - 0.0) < 1e-12)  // b: last fails
  }

  test("nelsonAalen: textbook cumulative hazard with censoring") {
    // t=1 event (n=5), t=2 censored, t=3 event (n=3), t=4 event (n=2)
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("dur", "ev")
    val out = Survival.nelsonAalen(df, "dur", "ev").orderBy("t")
      .select("t", "n_risk", "d", "c", "cum_hazard", "var_hazard")
      .collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(4L, 3L, 2L, 1L))
    val h = out.map(_.getDouble(4))
    assert(math.abs(h(0) - 0.25) < 1e-12)
    assert(math.abs(h(1) - 0.25) < 1e-12)            // censoring: flat
    assert(math.abs(h(2) - (0.25 + 0.5)) < 1e-12)
    assert(math.abs(h(3) - (0.25 + 0.5 + 1.0)) < 1e-12)
    val v = out.map(_.getDouble(5))
    assert(math.abs(v(3) - (1.0 / 16 + 1.0 / 4 + 1.0)) < 1e-12)
  }

  test("nelsonAalen: exp(-H) tracks the KM survivor for small hazards") {
    // many at-risk, few events: S ≈ exp(-H) to first order
    val df = ((1 to 3).map(t => (t.toDouble, 1)) ++
      (1 to 97).map(_ => (10.0, 0))).toDF("dur", "ev")
    val na = Survival.nelsonAalen(df, "dur", "ev")
      .filter(col("t") === 3.0).select("cum_hazard").head().getDouble(0)
    val km = Survival.kaplanMeier(df, "dur", "ev")
      .filter(col("t") === 3.0).select("survival").head().getDouble(0)
    assert(math.abs(math.exp(-na) - km) < 1e-3)
  }

  test("nelsonAalen: grouped curves accumulate independently") {
    val df = (Seq((1.0, 1), (2.0, 1)).map { case (t, e) => ("a", t, e) } ++
      Seq((1.0, 1)).map { case (t, e) => ("b", t, e) })
      .toDF("g", "dur", "ev")
    val out = Survival.nelsonAalen(df, "dur", "ev", Seq("g"))
      .orderBy("g", "t").select("g", "cum_hazard").collect()
    assert(math.abs(out(0).getDouble(1) - 0.5) < 1e-12)        // a, t=1
    assert(math.abs(out(1).getDouble(1) - 1.5) < 1e-12)        // a, t=2
    assert(math.abs(out(2).getDouble(1) - 1.0) < 1e-12)        // b, t=1
  }

  test("rmst: closed step integral with censoring and a tail segment") {
    // events at 1 (n=4) and 3 (n=2); censored at 2 and 4
    // S: [0,1)=1, [1,2)=3/4, [2,3)=3/4, [3,4)=3/8
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0)).toDF("dur", "ev")
    val r5 = Survival.rmst(df, "dur", "ev", tau = 5.0).head()
    // segments: 1·1 + .75·1 + .75·1 + .375·1 + tail .375·(5−4)
    assert(math.abs(r5.getAs[Double]("rmst") -
      (1.0 + 0.75 + 0.75 + 0.375 + 0.375)) < 1e-12)
    assert(r5.getAs[Long]("n") === 4L && r5.getAs[Long]("n_events") === 2L)
  }

  test("rmst: tau inside the curve truncates segments exactly") {
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0)).toDF("dur", "ev")
    val r = Survival.rmst(df, "dur", "ev", tau = 2.5).head()
    // 1·1 + .75·1 + .75·0.5, no tail
    assert(math.abs(r.getAs[Double]("rmst") - (1.0 + 0.75 + 0.375)) < 1e-12)
  }

  test("rmst with no censoring equals the capped sample mean") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).map((_, 1)).toDF("dur", "ev")
    val r = Survival.rmst(df, "dur", "ev", tau = 100.0).head()
    assert(math.abs(r.getAs[Double]("rmst") - 2.5) < 1e-12)
  }

  test("competingRisks: Aalen–Johansen closed case with censoring") {
    // t=1 cause1, t=2 cause2, t=3 censored, t=4 cause1
    val df = Seq((1.0, 1), (2.0, 2), (3.0, 0), (4.0, 1)).toDF("t", "c")
    val out = Survival.competingRisks(df, "t", "c")
      .orderBy("cause", "t").collect()
      .map(r => (r.getInt(1), r.getDouble(0)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    assert(out((1, 1.0)) === ((4L, 0.25)))
    assert(math.abs(out((1, 4.0))._2 - 0.75) < 1e-12)
    assert(out((1, 4.0))._1 === 1L)
    assert(math.abs(out((2, 2.0))._2 - 0.25) < 1e-12)
    // censored-only times carry no CIF rows
    assert(!out.keySet.exists(_._2 == 3.0))
  }

  test("competingRisks: total incidence never exceeds 1 and causes sum to 1-KM") {
    val df = Seq((1.0, 1), (2.0, 2), (3.0, 1), (4.0, 2), (5.0, 0),
      (6.0, 1)).toDF("t", "c")
    val cif = Survival.competingRisks(df, "t", "c")
    val lastPerCause = cif.groupBy("cause")
      .agg(max("cif").as("m")).collect().map(_.getDouble(1))
    val total = lastPerCause.sum
    val km = Survival.kaplanMeier(
      df.select(col("t").as("dur"), (col("c") =!= 0).cast("int").as("ev")),
      "dur", "ev")
      .orderBy(col("t").desc).select("survival").head().getDouble(0)
    assert(total <= 1.0 + 1e-12)
    assert(math.abs(total - (1.0 - km)) < 1e-12)
  }

  test("competingRisks with a single cause reduces to 1 - KM") {
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("t", "c")
    val cif = Survival.competingRisks(df, "t", "c")
      .orderBy("t").collect().map(r => r.getDouble(0) -> r.getDouble(4)).toMap
    val km = Survival.kaplanMeier(
      df.select(col("t").as("dur"), (col("c") =!= 0).cast("int").as("ev")),
      "dur", "ev")
      .orderBy("t").collect()
      .map(r => r.getDouble(0) -> r.getDouble(4)).toMap
    cif.foreach { case (t, v) => assert(math.abs(v - (1.0 - km(t))) < 1e-12, t) }
  }

  test("aftExponential: saturated binary design hits the cell-rate MLE") {
    // cell x=0: events 2, exposure 10 → rate 0.2; x=1: 3 events, exp 5
    val df = Seq(
      (4.0, 1, 0), (3.0, 1, 0), (2.0, 0, 0), (1.0, 0, 0),
      (1.0, 1, 1), (2.0, 1, 1), (1.5, 1, 1), (0.5, 0, 1)
    ).toDF("dur", "ev", "x")
    val m = Survival.aftExponential(df, "dur", "ev", Seq("x"))
    val g0 = math.log(2.0 / 10.0); val g1 = math.log(3.0 / 5.0)
    assert(math.abs(m.coefs(0) - (-g0)) < 1e-8)
    assert(math.abs(m.coefs(1) - (-(g1 - g0))) < 1e-8)
    // analytic information SEs: 1/sqrt(e0), sqrt(1/e0 + 1/e1)
    assert(math.abs(m.se(0) - 1.0 / math.sqrt(2.0)) < 1e-8)
    assert(math.abs(m.se(1) - math.sqrt(1.0 / 2 + 1.0 / 3)) < 1e-8)
    assert(m.n == 8 && m.events == 5)
    // median prediction at x=0: exp(-g0)·ln2 = 5·ln2
    val med = m.predictMedian(Seq(0).toDF("x")).head().getDouble(1)
    assert(math.abs(med - 5.0 * math.log(2.0)) < 1e-6)
  }

  test("aftExponential fails loudly on non-positive durations") {
    val df = Seq((0.0, 1, 0), (2.0, 1, 1)).toDF("dur", "ev", "x")
    val e = intercept[IllegalArgumentException] {
      Survival.aftExponential(df, "dur", "ev", Seq("x"))
    }
    assert(e.getMessage.contains("strictly positive"))
  }

  test("aftExponentialByGroup: per-group fits equal per-subset fits") {
    val rows = Seq(
      // group "a": cells (2 ev / 10), (3 ev / 5); group "b": different mix
      ("a", 4.0, 1, 0), ("a", 3.0, 1, 0), ("a", 2.0, 0, 0), ("a", 1.0, 0, 0),
      ("a", 1.0, 1, 1), ("a", 2.0, 1, 1), ("a", 1.5, 1, 1), ("a", 0.5, 0, 1),
      ("b", 2.0, 1, 0), ("b", 6.0, 0, 0), ("b", 1.0, 1, 1), ("b", 3.0, 1, 1)
    )
    val df = rows.toDF("g", "dur", "ev", "x")
    val grouped = Survival.aftExponentialByGroup(df, Seq("g"), "dur", "ev",
        Seq("x")).orderBy("g").collect()
    for ((g, i) <- Seq("a", "b").zipWithIndex) {
      val sub = rows.filter(_._1 == g)
      val single = Survival.aftExponential(
        sub.toDF("g", "dur", "ev", "x"), "dur", "ev", Seq("x"))
      assert(math.abs(grouped(i).getAs[Double]("beta_intercept") -
        single.coefs(0)) < 1e-8, g)
      assert(math.abs(grouped(i).getAs[Double]("beta_x") -
        single.coefs(1)) < 1e-8, g)
      assert(math.abs(grouped(i).getAs[Double]("se_x") -
        single.se(1)) < 1e-8, g)
    }
  }

  // deterministic Weibull(shape, scale=1) quantile sample: the MLE on a
  // quantile-matched sample sits close to the true parameters
  private def weibullQuantiles(n: Int, shape: Double): Seq[Double] =
    (1 to n).map { i =>
      val p = (i - 0.5) / n
      math.pow(-math.log1p(-p), 1.0 / shape)
    }

  test("aftWeibull recovers shape and a planted AFT effect") {
    val base = weibullQuantiles(200, 2.0)
    // x = 1 stretches time by e^{0.7} — the AFT shift
    val rows = base.map(t => (t, 1, 0)) ++
      base.map(t => (t * math.exp(0.7), 1, 1))
    val m = Survival.aftWeibull(rows.toDF("dur", "ev", "x"),
      "dur", "ev", Seq("x"))
    assert(math.abs(m.shape - 2.0) < 0.1, s"shape=${m.shape}")
    assert(math.abs(m.coefs(1) - 0.7) < 0.05, s"gamma_x=${m.coefs(1)}")
    assert(math.abs(m.coefs(0)) < 0.05, s"gamma_0=${m.coefs(0)}")
  }

  test("aftWeibull reduces to the exponential fit when shape = 1") {
    val base = weibullQuantiles(200, 1.0)
    val rows = base.map(t => (t, 1, 0)) ++
      base.map(t => (t * 2.0, 1, 1))
    val df = rows.toDF("dur", "ev", "x")
    val w = Survival.aftWeibull(df, "dur", "ev", Seq("x"))
    val e = Survival.aftExponential(df, "dur", "ev", Seq("x"))
    assert(math.abs(w.shape - 1.0) < 0.08, s"shape=${w.shape}")
    assert(math.abs(w.coefs(0) - e.coefs(0)) < 0.05)
    assert(math.abs(w.coefs(1) - e.coefs(1)) < 0.02)
  }

  test("aftWeibull handles censoring and counts events") {
    val rows = weibullQuantiles(100, 1.5).zipWithIndex.map { case (t, i) =>
      // censor every 4th observation at its (earlier) time
      if (i % 4 == 0) (t * 0.5, 0, i % 2) else (t, 1, i % 2)
    }
    val m = Survival.aftWeibull(rows.toDF("dur", "ev", "x"),
      "dur", "ev", Seq("x"))
    assert(m.n === 100L && m.events === 75L)
    assert(m.shape > 0.5 && m.shape < 3.0)
  }

  test("aftWeibull median prediction matches the closed form") {
    val base = weibullQuantiles(120, 2.0)
    val rows = base.map(t => (t, 1, 0)) ++ base.map(t => (t * 2, 1, 1))
    val df = rows.toDF("dur", "ev", "x")
    val m = Survival.aftWeibull(df, "dur", "ev", Seq("x"))
    val got = m.predictMedian(df.select("x").distinct()).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val exp0 = math.exp(m.coefs(0)) *
      math.pow(math.log(2.0), m.scale)
    assert(math.abs(got(0) - exp0) < 1e-12)
    assert(math.abs(got(1) - exp0 * math.exp(m.coefs(1))) < 1e-10)
  }

  test("aftWeibull is partition-invariant (quantized shape alternation)") {
    val rows = weibullQuantiles(150, 1.7).zipWithIndex
      .map { case (t, i) => (t * (1 + i % 3), i % 3 min 1, i % 2) }
    val df = rows.toDF("dur", "ev", "x")
    val a = Survival.aftWeibull(df.repartition(1), "dur", "ev", Seq("x"))
    val b = Survival.aftWeibull(df.repartition(7), "dur", "ev", Seq("x"))
    // the shape path is EXACT (1e-8 grid quantization absorbs the
    // partition-order ulps); the IRLS betas — like every GLM fit — agree
    // to summation-order precision, far inside the 6-digit output grid
    assert(a.scale === b.scale)
    a.coefs.zip(b.coefs).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9) }
  }

  test("aftWeibull rejects non-positive durations loudly") {
    intercept[IllegalArgumentException] {
      Survival.aftWeibull(Seq((0.0, 1, 0), (1.0, 1, 1)).toDF("dur", "ev", "x"),
        "dur", "ev", Seq("x"))
    }
  }
}

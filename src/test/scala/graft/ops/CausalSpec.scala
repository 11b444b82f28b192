package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("ivWald recovers the structural effect under confounding") {
    // u confounds x and y; z shifts x only. True effect of x on y is 2.
    // x = z + u, y = 2x + 3u  →  OLS of y on x is biased; IV is exact.
    val rows = for (z <- 0 to 1; u <- -2 to 2; rep <- 1 to 3)
      yield (z.toDouble, z + u.toDouble, 2.0 * (z + u) + 3.0 * u)
    val df = rows.toDF("z", "x", "y")
    val r = Causal.ivWald(df, "y", "x", "z").head()
    assert(math.abs(r.getAs[Double]("beta_iv") - 2.0) < 1e-12)
    // reduced form / first stage ratio IS beta_iv
    assert(math.abs(r.getAs[Double]("itt") /
      r.getAs[Double]("first_stage") - 2.0) < 1e-12)
  }

  test("ivWald: null beta when the instrument is irrelevant; grouped") {
    val df = Seq((0.0, 1.0, 5.0, "a"), (1.0, 1.0, 6.0, "a"),
      (0.0, 1.0, 7.0, "b"), (1.0, 1.0, 8.0, "b"))
      .toDF("z", "x", "y", "g")
    val out = Causal.ivWald(df, "y", "x", "z", groupCols = Seq("g"))
      .orderBy("g").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("beta_iv"))))
  }

  test("cuped removes covariate imbalance exactly when y = x") {
    // y = x with NO arm effect, but arm 1 drew systematically higher x:
    // theta = cov(x, x)/var(x) = 1, so the adjusted diff must be exactly 0
    // while the naive diff reads the imbalance (2.0)
    val rows = Seq.tabulate(40) { i =>
      val arm = i % 2
      val x = if (arm == 0) i % 5 else i % 5 + 2
      (arm, x.toDouble, x.toDouble)
    }
    val df = rows.toDF("arm", "x", "y")
    val out = Causal.cuped(df, "y", "x", "arm").orderBy("arm").collect()
    val naive = out(1).getAs[Double]("mean_y") - out(0).getAs[Double]("mean_y")
    val adj = out(1).getAs[Double]("mean_y_adj") -
      out(0).getAs[Double]("mean_y_adj")
    assert(math.abs(naive - 2.0) < 1e-12) // pure imbalance
    assert(math.abs(adj) < 1e-12)         // removed exactly (θ = 1)
  }

  test("cuped with a useless covariate changes nothing") {
    val df = Seq((0, 1.0, 2.0), (0, 1.0, 4.0), (1, 1.0, 5.0), (1, 1.0, 7.0))
      .toDF("arm", "x", "y")
    // var(x) = 0 → theta is NaN/undefined; guard: constant covariate
    // means mean_x(arm) − mean_x(pooled) = 0, so use x with variance but
    // zero correlation instead
    val df2 = Seq((0, 1.0, 2.0), (0, -1.0, 2.0), (1, 1.0, 5.0),
      (1, -1.0, 5.0)).toDF("arm", "x", "y")
    val out = Causal.cuped(df2, "y", "x", "arm").orderBy("arm").collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean_y") -
        r.getAs[Double]("mean_y_adj")) < 1e-12)
    }
  }

  test("regressionDiscontinuity finds a planted jump, ignores slope") {
    // y = 0.5·(r − 10) + 4·[r ≥ 10]: slope both sides 0.5, jump 4
    val rows = (0 to 200).map { i =>
      val r = i / 10.0
      (r, 0.5 * (r - 10.0) + (if (r >= 10.0) 4.0 else 0.0))
    }
    val df = rows.toDF("run", "y")
    val out = Causal.regressionDiscontinuity(df, "run", "y",
      cutoff = 10.0, bandwidth = 5.0).head()
    assert(math.abs(out.getAs[Double]("tau") - 4.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("slope_l") - 0.5) < 1e-9)
    assert(math.abs(out.getAs[Double]("slope_r") - 0.5) < 1e-9)
    // bandwidth excludes points outside ±5
    assert(out.getAs[Long]("n_l") + out.getAs[Long]("n_r") == 101)
  }

  test("estimators are partition-invariant") {
    val rows = for (z <- 0 to 1; u <- -2 to 2; rep <- 1 to 3)
      yield (z.toDouble, z + u.toDouble, 2.0 * (z + u) + 3.0 * u)
    val df = rows.toDF("z", "x", "y")
    val a = Causal.ivWald(df.repartition(1), "y", "x", "z").head()
    val b = Causal.ivWald(df.repartition(7), "y", "x", "z").head()
    assert(a.getAs[Double]("beta_iv") == b.getAs[Double]("beta_iv"))
  }

  test("policyValue: closed IPS/SNIPS/ESS case") {
    // two matched rows at different propensities, one mismatch:
    // IPS = (1/0.5 + 1/0.25)/3 = 2, SNIPS = 6/6 = 1,
    // ESS = (2000+4000)²/(2000²+4000²) = 1.8
    val df = Seq(
      ("a", 0.5, 1.0, "a"), ("a", 0.25, 1.0, "a"), ("b", 0.5, 9.0, "a")
    ).toDF("act", "p", "r", "tgt")
    val row = Causal.policyValue(df, "act", "p", "r", "tgt").head()
    assert(row.getLong(0) === 3L && row.getLong(1) === 2L)
    assert(row.getDouble(2) === 2.0)
    assert(row.getDouble(3) === 1.0)
    assert(row.getDouble(4) === 1.8)
  }

  test("policyValue: uniform propensities make SNIPS the matched mean") {
    val df = Seq(("a", 0.2, 2.0, "a"), ("a", 0.2, 4.0, "a"),
      ("b", 0.2, 100.0, "a")).toDF("act", "p", "r", "tgt")
    val row = Causal.policyValue(df, "act", "p", "r", "tgt").head()
    assert(row.getDouble(3) === 3.0) // (2+4)/2 — p cancels
    assert(row.getDouble(4) === 2.0) // uniform weights: ESS = n_matched
  }

  test("policyValue rejects non-positive propensities loudly") {
    val df = Seq(("a", 0.0, 1.0, "a")).toDF("act", "p", "r", "tgt")
    val e = intercept[Exception] {
      Causal.policyValue(df, "act", "p", "r", "tgt").collect()
    }
    assert(e.getMessage != null)
  }

  test("policyValue rejects NEGATIVE propensities loudly (even unmatched)") {
    // p = -1 on a NON-matching row: the guard must still fire — a
    // dropped-aggregate guard would let this through and return ips=-1
    val df = Seq(("a", 0.5, 1.0, "a"), ("b", -1.0, 1.0, "a"))
      .toDF("act", "p", "r", "tgt")
    val e = intercept[Exception] {
      Causal.policyValue(df, "act", "p", "r", "tgt").collect()
    }
    assert(e.getMessage != null)
  }

  test("policyValue rejects null propensities loudly") {
    // a null p row must fail, not be silently dropped from the weight
    // sums while still counted in n (which would bias IPS downward)
    val df = Seq(("a", Some(0.5), 1.0, "a"), ("a", None, 1.0, "a"))
      .toDF("act", "p", "r", "tgt")
    val e = intercept[Exception] {
      Causal.policyValue(df, "act", "p", "r", "tgt").collect()
    }
    assert(e.getMessage != null)
  }

  test("policyValue is partition-invariant on real events") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("p", when(col("event_type") === "click", 0.4)
        .otherwise(0.2))
      .withColumn("tgt", when(col("value") > 10, lit("click"))
        .otherwise(lit("view")))
    val run = (n: Int) => Causal.policyValue(ev.repartition(n),
      "event_type", "p", "value", "tgt").collect().toSeq
    assert(run(1) === run(7))
  }
}

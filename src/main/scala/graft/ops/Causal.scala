package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form causal estimators — the single-covariate designs where the
  * answer is a handful of moment ratios, so training is ONE conditional
  * aggregation and the arithmetic replays exactly on any engine.
  *
  * Completes the causal toolkit next to `Matching.psMatch` (ATT),
  * `Matching.ipwAte` (ATE), `Hypothesis.diffInDiff` (parallel trends) and
  * `Eval.upliftByTile` (evaluation): instrumental variables for unobserved
  * confounding, CUPED for experiment variance reduction, and regression
  * discontinuity for cutoff-assigned treatments.
  *
  * All slope/intercept forms use the cross-moment identity
  *   b = (n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx),  a = (Σy − b·Σx) / n
  * in exactly this operation order (sums are exact when inputs are exact;
  * the divisions are the only rounding sites), mirroring q233's Zipf OLS.
  *
  * Distribution: each estimator is one groupBy (or one global) aggregation
  * with conditional sums — map-side combinable, no window, no join against
  * the fact table (CUPED joins its two MODEL-sized frames). Nothing here
  * has a data-sized driver or shuffle footprint beyond the single agg.
  */
object Causal {

  private def d(c: String): Column = col(c).cast("double")

  /** Instrumental-variables (Wald / just-identified 2SLS) effect of
    * endogenous `xCol` on `yCol` using instrument `zCol`, per group.
    *
    * beta_iv = cov(z, y) / cov(z, x) — computed as the ratio of the two
    * cross-moment numerators (the shared 1/n² cancels). Also reports the
    * reduced form (`itt`, slope of y on z) and the `first_stage` (slope of
    * x on z) whose ratio beta_iv is; a weak instrument shows up as a
    * near-zero first stage. `beta_iv` is null when cov(z, x) = 0.
    */
  def ivWald(df: DataFrame, yCol: String, xCol: String, zCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val y = d(yCol); val x = d(xCol); val z = d(zCol)
    val n = count(lit(1)).cast("double")
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(z).as("sz"), sum(y).as("sy"), sum(x).as("sx"),
      sum(z * y).as("szy"), sum(z * x).as("szx"), sum(z * z).as("szz"))
    val nn = col("n").cast("double")
    val num = nn * col("szy") - col("sz") * col("sy")
    val den = nn * col("szx") - col("sz") * col("sx")
    val varz = nn * col("szz") - col("sz") * col("sz")
    agg.select(
      (groupCols.map(col) :+ col("n") :+
        when(varz =!= 0.0, num / varz).as("itt") :+
        when(varz =!= 0.0, den / varz).as("first_stage") :+
        when(den =!= 0.0, num / den).as("beta_iv")): _*)
  }

  /** CUPED variance-reduced experiment readout (Deng et al. 2013): adjust
    * each arm's mean outcome by the pooled regression of `yCol` on the
    * pre-experiment covariate `xCol`,
    *   mean_y_adj(arm) = mean_y(arm) − θ·(mean_x(arm) − mean_x(pooled)),
    * θ = cov(x, y)/var(x) pooled over all arms. Unbiased because
    * randomization makes E[mean_x(arm)] equal across arms; variance drops
    * by the squared correlation.
    *
    * Output: one row per arm — (arm, n, mean_y, mean_x, mean_y_adj) —
    * built from one global aggregate broadcast onto one per-arm aggregate.
    */
  def cuped(df: DataFrame, yCol: String, xCol: String,
      armCol: String): DataFrame = {
    val y = d(yCol); val x = d(xCol)
    val g = df.agg(count(lit(1)).as("gn"), sum(x).as("gsx"),
      sum(y).as("gsy"), sum(x * y).as("gsxy"), sum(x * x).as("gsxx"))
    val gn = col("gn").cast("double")
    val theta = (gn * col("gsxy") - col("gsx") * col("gsy")) /
      (gn * col("gsxx") - col("gsx") * col("gsx"))
    val byArm = df.groupBy(col(armCol).as("arm")).agg(
      count(lit(1)).as("n"), sum(y).as("sy"), sum(x).as("sx"))
    val nn = col("n").cast("double")
    byArm.crossJoin(broadcast(g.select(theta.as("theta"),
        (col("gsx") / gn).as("gmx"))))
      .select(col("arm"), col("n"),
        (col("sy") / nn).as("mean_y"),
        (col("sx") / nn).as("mean_x"),
        (col("sy") / nn - col("theta") * (col("sx") / nn - col("gmx")))
          .as("mean_y_adj"))
  }

  /** Sharp regression discontinuity (rectangular kernel, local linear):
    * within `bandwidth` of `cutoff` on `runCol`, fit y = a + b·(run −
    * cutoff) separately on each side (treatment = run ≥ cutoff); the
    * effect is the jump of the two intercepts at the cutoff,
    * tau = lim_right − lim_left.
    *
    * One pass: a single aggregation with side-conditional sums (no
    * groupBy key at all), pure closed-form arithmetic on the one-row
    * result.
    */
  def regressionDiscontinuity(df: DataFrame, runCol: String, yCol: String,
      cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0.0, s"bandwidth must be > 0, got $bandwidth")
    val run = d(runCol); val y = d(yCol)
    val x = run - lit(cutoff)
    val in = abs(x) <= lit(bandwidth)
    val right = run >= lit(cutoff)
    def side(s: Boolean, c: Column) =
      sum(when(in && (if (s) right else !right), c).otherwise(lit(0.0)))
    def sideN(s: Boolean) =
      sum(when(in && (if (s) right else !right), 1L).otherwise(0L))
    val agg = df.agg(
      sideN(false).as("n_l"), side(false, y).as("sy_l"),
      side(false, x).as("sx_l"), side(false, x * y).as("sxy_l"),
      side(false, x * x).as("sxx_l"),
      sideN(true).as("n_r"), side(true, y).as("sy_r"),
      side(true, x).as("sx_r"), side(true, x * y).as("sxy_r"),
      side(true, x * x).as("sxx_r"))
    def fit(sfx: String) = {
      val nn = col("n_" + sfx).cast("double")
      val b = (nn * col("sxy_" + sfx) - col("sx_" + sfx) * col("sy_" + sfx)) /
        (nn * col("sxx_" + sfx) - col("sx_" + sfx) * col("sx_" + sfx))
      val a = (col("sy_" + sfx) - b * col("sx_" + sfx)) / nn
      (a, b)
    }
    val (al, bl) = fit("l"); val (ar, br) = fit("r")
    agg.select(col("n_l"), col("n_r"),
      bl.as("slope_l"), br.as("slope_r"),
      al.as("lim_l"), ar.as("lim_r"), (ar - al).as("tau"))
  }

  /** Offline policy evaluation — IPS and SNIPS (Horvitz–Thompson /
    * self-normalized importance sampling; Swaminathan & Joachims 2015):
    * estimate a TARGET policy's value from LOGGED (action, propensity,
    * reward) data without deploying it — the counterfactual readout
    * every bandit/RLHF data pipeline wants before a policy swap.
    *
    *   IPS   = (1/n) Σ 1[a = π(x)] · r / p
    *   SNIPS = Σ 1[a = π(x)] · r/p  /  Σ 1[a = π(x)] / p
    *   ESS   = (Σ w)² / Σ w²,  w = 1[match]/p  (how many effective
    *           samples the match set carries — low ESS = high variance;
    *           computed on MILLI-quantized weights — ESS is
    *           scale-invariant in w and the squared milli sums stay
    *           inside a long past 10¹⁰ rows)
    *
    * ONE aggregation. Per-row weights quantize to integer micro-units
    * BEFORE the sum (the q266 DSIR discipline), so every sum is an
    * exact long and the estimates replay bit-for-bit on any engine and
    * partitioning; the only float ops are the final pinned divisions.
    * Rows with null or non-positive propensity are REQUIRED absent,
    * loudly — silently dropping them would bias the estimate.
    *
    * @param targetActionCol the action π would take for the row
    * @return one row: (n, n_matched, ips, snips, ess) — 6-digit grid
    */
  def policyValue(df: DataFrame, actionCol: String, propensityCol: String,
      rewardCol: String, targetActionCol: String): DataFrame = {
    val p = col(propensityCol).cast("double")
    val mtch = col(actionCol) === col(targetActionCol)
    // The guard rides `keep`, the condition every summed column consumes:
    // assert_true is null on success, so `guard.isNull && mtch` evaluates
    // the assert for EVERY row (And evaluates its left operand first) and
    // no optimizer rule can prune it the way a dropped first(...) was.
    val guard = assert_true(p.isNotNull && p > 0.0,
      lit(s"non-positive or null $propensityCol"))
    val keep = guard.isNull && mtch
    val rw = round(col(rewardCol).cast("double") / p * 1e6).cast("long")
    val iw = round(lit(1.0) / p * 1e6).cast("long")
    // ESS weights quantize at 1e3, not 1e6: ESS is scale-invariant in w
    // and the squared milli sum stays inside a long past 1e10 rows
    val wm = round(lit(1.0) / p * 1e3).cast("long")
    df.agg(
      count(lit(1)).as("n"),
      sum(when(keep, 1L).otherwise(0L)).as("n_matched"),
      sum(when(keep, rw).otherwise(0L)).as("__srw"),
      sum(when(keep, iw).otherwise(0L)).as("__siw"),
      sum(when(keep, wm).otherwise(0L)).as("__swm"),
      sum(when(keep, wm * wm).otherwise(0L)).as("__swm2"))
      .select(col("n"), col("n_matched"),
        round(col("__srw").cast("double") / 1e6 / col("n").cast("double"),
          6).as("ips"),
        round(when(col("__siw") > 0,
          col("__srw").cast("double") / col("__siw").cast("double")), 6)
          .as("snips"),
        round(when(col("__swm2") > 0,
          col("__swm").cast("double") * col("__swm") /
            col("__swm2").cast("double")), 6).as("ess"))
  }
}

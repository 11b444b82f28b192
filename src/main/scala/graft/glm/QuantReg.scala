package graft.glm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quantile regression — the conditional-quantile companion to
  * [[LM]] (conditional mean) and [[Robust]] (Huber M-estimation): fits
  * x'β to the τ-th quantile of y by minimizing the pinball loss
  * ρ_τ(r) = r·(τ − 1{r<0}).
  *
  * Algorithm: iteratively reweighted least squares on the smoothed loss
  * (Schnabel's scheme; the classic practical solver before interior
  * point): each step solves a WEIGHTED least-squares problem with
  *   w_i = |τ − 1{r_i < 0}| / max(|r_i|, δ_t)
  * at the current residuals, with a smoothing CONTINUATION δ_1 = mean
  * |OLS residual| shrinking geometrically per step (a fixed tiny δ gets
  * stuck on whatever interpolating line the start finds — any line
  * through p+1 points is a stationary point at δ → 0). Each step is
  * exactly ONE pass of the existing fused [[Gram]] aggregation with w as
  * a literal-β column expression, the same per-iteration shape as GLM
  * IRLS. Driver state is the p-vector β; data is scanned once per
  * iteration, never materialized.
  *
  * Determinism: β is quantized to the 1e-8 grid after every solve
  * (floor(β·1e8 + 0.5)/1e8 — the NegBin θ-grid trick), so the weight
  * expressions replay identically across engines and partitionings up to
  * the documented double-sum tolerance. At τ = 0.5 (median regression)
  * the weight is sign-free (τ = 1−τ), removing the one genuinely
  * discontinuous dependence on residual sign near zero — the gate query
  * uses exactly that.
  *
  * Fixed iteration count (no data-dependent stopping) keeps the
  * fixed-point replayable as unrolled oracle CTEs.
  */
object QuantReg {

  final case class QuantRegModel(tau: Double, xCols: Seq[String],
      coefs: Array[Double], iters: Int, pinball: Double) {
    /** coefs(0) is the intercept; coefs(i) pairs with xCols(i−1). */
    def predictExpr: Column =
      xCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double") * lit(coefs(i + 1))
      }.foldLeft(lit(coefs(0)): Column)(_ + _)

    def predict(df: DataFrame, outputCol: String = "prediction"): DataFrame =
      df.withColumn(outputCol, predictExpr)
  }

  /** 1e-8-grid quantization, floor(x·1e8 + 0.5) — identical on any engine
    * (round() tie conventions differ; floor does not).
    */
  private def q8(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8

  /** @param iters    reweighted steps AFTER the OLS initialization
    * @param deltaMin floor for the smoothing parameter
    * @param shrink   per-iteration smoothing decay: δ starts at the mean
    *                 absolute OLS residual (the data's own scale) and is
    *                 multiplied by `shrink` each step — the standard
    *                 continuation that keeps early iterations convex-ish
    *                 and lets late ones pin the true quantile fit. A
    *                 FIXED small δ instead gets stuck on whatever
    *                 interpolating line the start finds (any line through
    *                 p+1 points is a stationary point at δ → 0).
    */
  def fit(df: DataFrame, xCols: Seq[String], yCol: String, tau: Double,
      iters: Int = 6, deltaMin: Double = 1e-6,
      shrink: Double = 0.1): QuantRegModel = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    require(tau > 0 && tau < 1, s"tau must be in (0, 1), got $tau")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(deltaMin > 0, s"deltaMin must be > 0, got $deltaMin")
    require(shrink > 0 && shrink < 1, s"shrink must be in (0, 1), got $shrink")
    val xs = lit(1.0) +: xCols.map(col(_).cast("double"))
    val y = col(yCol).cast("double")

    def solve(w: Column): Array[Double] = {
      val g = Gram.normal(df, xs, y, w)
      LinAlg.solvePD(g.xtx, g.xty).toArray.map(q8)
    }
    def residual(beta: Array[Double]): Column =
      y - xs.zip(beta).map { case (c, b) => c * graft.functions.stableLit(b) }
        .reduce(_ + _)

    var beta = solve(lit(1.0)) // OLS start
    // smoothing scale = mean |OLS residual|, quantized so it replays
    var dlt = math.max(deltaMin,
      q8(df.agg(avg(abs(residual(beta)))).head().getDouble(0)))
    for (_ <- 1 to iters) {
      val r = residual(beta)
      val w = when(r >= 0, lit(tau)).otherwise(lit(1.0 - tau)) /
        greatest(abs(r), lit(dlt))
      beta = solve(w)
      dlt = math.max(deltaMin, dlt * shrink)
    }
    val r = residual(beta)
    val pinball = df.agg(avg(greatest(lit(tau) * r, lit(tau - 1.0) * r)))
      .head().getDouble(0)
    QuantRegModel(tau, xCols, beta, iters, pinball)
  }
}

package graft.glm

import breeze.linalg.{DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Robust (Huber M-estimator) linear regression — OLS whose loss turns
  * linear past `delta` robust-scale units, so gross outliers pull with
  * bounded force instead of quadratically.
  *
  * IRLS on the same one-pass [[Gram]] kernel as [[LM]]: each iteration
  * recomputes the robust scale (MAD of current residuals via a bounded
  * `percentile_approx` sketch) and the Huber weights
  *
  *   w(r) = min(1, delta·s / |r|)
  *
  * as literal-β column expressions, then runs ONE weighted Gram
  * aggregation — two small jobs per iteration (scale + Gram), cluster
  * traffic O(p²) doubles each, no driver data. With `delta` large enough
  * that no residual is downweighted the fixed point IS the OLS solution
  * (the q149 gate); with outliers present the slope stays near the clean
  * trend where OLS is dragged away (RobustSpec).
  */
object Robust {

  final case class HuberModel(names: Array[String], coefs: BDV[Double],
      scale: Double, iters: Int, n: Long) {
    def coef(i: Int): Double = coefs(i)
  }

  /** @param delta  Huber tuning constant in robust-scale units (1.345 is
    *               the classic 95%-Gaussian-efficiency choice)
    * @param approxScale false (default) = exact `percentile` median for
    *               the MAD scale — partition-invariant and deterministic,
    *               right for fits that must reproduce bit-for-bit, but its
    *               aggregation buffer holds the residual values (the q33
    *               exact-percentile trade). true = `percentile_approx`
    *               sketch — bounded memory, the 100 TB path; the sketch
    *               merge is partition-order sensitive, so refits on a
    *               repartitioned frame may differ in the last weights ulp
    */
  def huber(df: DataFrame, xCols: Seq[String], yCol: String,
      delta: Double = 1.345, intercept: Boolean = true,
      maxIter: Int = 25, tol: Double = 1e-8,
      approxScale: Boolean = false): HuberModel = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    require(xCols.nonEmpty, "at least one feature column required")
    require(delta > 0 && maxIter >= 1 && tol > 0)
    val xs: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++
        xCols.map(c => col(c).cast(DoubleType))
    val names = ((if (intercept) Seq("(Intercept)") else Nil) ++ xCols).toArray
    val y = col(yCol).cast(DoubleType)
    val p = xs.size

    // iteration 0: plain OLS start
    var g = Gram.normal(df, xs, y)
    require(g.n > p, s"need more rows (${g.n}) than parameters ($p)")
    var beta = LinAlg.solvePD(g.xtx, g.xty)
    var scale = 0.0
    var iter = 1
    var converged = false
    while (iter < maxIter && !converged) {
      val resid = y - xs.zipWithIndex.map { case (x, i) => x * graft.functions.stableLit(beta(i)) }
        .reduce(_ + _)
      // robust scale: 1.4826·MAD about zero of the current residuals
      // (consistency factor for gaussian noise, the Outliers convention)
      val med =
        if (approxScale) percentile_approx(col("__abs_r"), lit(0.5), lit(10000))
        else expr("percentile(__abs_r, 0.5)")
      scale = 1.4826 * df.withColumn("__abs_r", abs(resid))
        .agg(med).head().getDouble(0)
      val wExpr =
        if (scale <= 0) lit(1.0) // degenerate: >50% of rows fit exactly
        else least(lit(1.0), lit(delta) * scale / abs(resid))
      g = Gram.normal(df, xs, y, wExpr)
      val next = LinAlg.solvePD(g.xtx, g.xty)
      val delta2 = (0 until p).map(i => math.abs(next(i) - beta(i)) /
        (math.abs(beta(i)) + 1e-10)).max
      beta = next
      converged = delta2 < tol
      iter += 1
    }
    HuberModel(names, beta, scale, iter, g.n)
  }
}

package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** L1/L2-regularized least squares (lasso / elastic net) whose ONLY
  * cluster work is the same single Gram pass as [[LM.fit]].
  *
  * Objective (glmnet's, without its internal standardization):
  *
  *   (1/2S)·Σ w_i (y_i − β₀ − x_iᵀβ)²  +  λ·( α‖β‖₁ + (1−α)/2·‖β‖₂² )
  *
  * with S = Σw (= n for unit weights — glmnet's 1/2n) and the intercept
  * unpenalized. Cyclic coordinate descent runs entirely
  * driver-side on the p×p Gram ("covariance updates" — Friedman, Hastie &
  * Tibshirani 2010, §2): the stationarity condition for coordinate j needs
  * only XᵀWX and XᵀWy, so after the one distributed aggregation the fit
  * costs zero additional cluster passes regardless of iteration count —
  * the property that makes regularization-path sweeps cheap at 100 TB
  * (each extra λ is a driver-side re-solve, warm-started).
  *
  *   β_j ← S( ρ_j / Sw , λα ) / ( C_jj / Sw + λ(1−α) ),
  *   ρ_j = C_xy(j) − Σ_{k≠j} C_xx(j,k)·β_k,     S = soft-threshold,
  *
  * where C_xx / C_xy are the weighted second moments CENTERED about the
  * weighted means when an intercept is present (centering makes the
  * intercept exactly β₀ = ȳ_w − Σβ_j x̄_w(j), so it never enters the
  * penalty). Columns are NOT rescaled: pass standardized features if
  * glmnet's `standardize=TRUE` behavior is wanted.
  *
  * The reference has no regularized fits; this is the natural extension of
  * its OLS (reference: LM.scala:241-274) once the Gram is the primitive.
  */
object ElasticNet {

  final class ENetModel(
      val xnames: Array[String],
      val yname: String,
      val intercept: Boolean,
      val coefs: BDV[Double], // intercept first when present
      val lambda: Double,
      val alpha: Double,
      val sse: Double,
      val r2: Double,
      val n: Long,
      val iter: Int) extends Serializable {

    def p: Int = coefs.length
    def featureNames: Array[String] = if (intercept) xnames.drop(1) else xnames

    /** Count of exactly-zero (selected-out) coefficients. */
    def nZero: Int = {
      val start = if (intercept) 1 else 0
      (start until p).count(i => coefs(i) == 0.0)
    }

    def predictionExpr: Column = {
      val terms = featureNames.zipWithIndex.map { case (nm, i) =>
        col(nm).cast(DoubleType) * lit(coefs(if (intercept) i + 1 else i))
      }
      terms.foldLeft(if (intercept) lit(coefs(0)) else lit(0.0))(_ + _)
    }

    def predict(df: DataFrame, outputCol: String = "prediction"): DataFrame =
      ModelMatrix.matchCols(featureNames.toSeq, df)
        .withColumn(outputCol, predictionExpr)
  }

  @inline private def soft(z: Double, g: Double): Double =
    if (z > g) z - g else if (z < -g) z + g else 0.0

  /** Centered (or raw, when no intercept) second moments + metadata,
    * derived driver-side from one [[Gram.normal]] pass.
    */
  private final case class Moments(
      cxx: BDM[Double], cxy: BDV[Double], cyy: Double,
      mx: BDV[Double], my: Double, sw: Double, n: Long)

  private def moments(
      df: DataFrame,
      xCols: Seq[String],
      yCol: String,
      intercept: Boolean,
      weightCol: Option[String]): Moments = {
    val xsRaw = xCols.map(c => col(c).cast(DoubleType))
    val w = weightCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))
    // one Gram pass over RAW features + an all-ones slot when intercepting:
    // the centered moments fall out driver-side from the same sums
    val xs = (if (intercept) Seq(lit(1.0)) else Nil) ++ xsRaw
    val g = Gram.normal(df, xs, col(yCol).cast(DoubleType), w)
    val k = xCols.size
    val off = if (intercept) 1 else 0
    val sw = if (intercept) g.xtx(0, 0) else g.wSum
    val mx = BDV.tabulate(k)(j => if (intercept) g.xtx(0, j + off) / sw else 0.0)
    val my = if (intercept) g.xty(0) / sw else 0.0
    val cxx = BDM.tabulate(k, k) { (i, j) =>
      g.xtx(i + off, j + off) - (if (intercept) sw * mx(i) * mx(j) else 0.0)
    }
    val cxy = BDV.tabulate(k)(j =>
      g.xty(j + off) - (if (intercept) sw * mx(j) * my else 0.0))
    val cyy = g.yty - (if (intercept) sw * my * my else 0.0)
    Moments(cxx, cxy, cyy, mx, my, sw, g.n)
  }

  /** Cyclic coordinate descent with covariance updates; `beta` is mutated
    * in place (warm starting across a λ path). Returns iterations used.
    */
  private def cdSolve(m: Moments, lambda: Double, alpha: Double,
      beta: BDV[Double], maxIter: Int, tol: Double): Int = {
    val k = beta.length
    // residual correlation maintained incrementally:
    // rho_j = cxy_j − (cxx·β)_j + cxx_jj·β_j
    val cxxBeta = m.cxx * beta
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      var maxDelta = 0.0
      var j = 0
      while (j < k) {
        val rho = m.cxy(j) - cxxBeta(j) + m.cxx(j, j) * beta(j)
        val denom = m.cxx(j, j) / m.sw + lambda * (1.0 - alpha)
        val bNew =
          if (denom <= 0.0) 0.0
          else soft(rho / m.sw, lambda * alpha) / denom
        val d = bNew - beta(j)
        if (d != 0.0) {
          var i = 0
          while (i < k) { cxxBeta(i) += m.cxx(i, j) * d; i += 1 }
          beta(j) = bNew
          val scale = math.max(1.0, math.abs(bNew))
          if (math.abs(d) / scale > maxDelta) maxDelta = math.abs(d) / scale
        }
        j += 1
      }
      it += 1
      if (maxDelta < tol) converged = true
    }
    it
  }

  private def finish(m: Moments, names: Array[String], yCol: String,
      intercept: Boolean, beta: BDV[Double], lambda: Double, alpha: Double,
      it: Int): ENetModel = {
    val sse = math.max(0.0,
      m.cyy - 2.0 * (beta dot m.cxy) + (beta dot (m.cxx * beta)))
    val r2 = if (m.cyy > 0) 1.0 - sse / m.cyy else Double.NaN
    val full =
      if (intercept) BDV((m.my - (beta dot m.mx)) +: beta.toArray: _*)
      else beta.copy
    new ENetModel(names, yCol, intercept, full, lambda, alpha, sse, r2, m.n, it)
  }

  /** Fit by cyclic coordinate descent over the one-pass Gram.
    *
    * @param lambda  total penalty strength (glmnet λ; 0 → OLS)
    * @param alpha   L1 mixing: 1 = lasso, 0 = ridge-by-CD, between = elastic net
    */
  def fit(
      df: DataFrame,
      xCols: Seq[String],
      yCol: String,
      lambda: Double,
      alpha: Double = 1.0,
      intercept: Boolean = true,
      weightCol: Option[String] = None,
      maxIter: Int = 10000,
      tol: Double = 1e-12): ENetModel = {
    require(xCols.nonEmpty, "at least one feature column required")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val names = ((if (intercept) Seq("(Intercept)") else Nil) ++ xCols).toArray
    val m = moments(df, xCols, yCol, intercept, weightCol)
    val beta = BDV.zeros[Double](xCols.size)
    val it = cdSolve(m, lambda, alpha, beta, maxIter, tol)
    finish(m, names, yCol, intercept, beta, lambda, alpha, it)
  }

  /** Regularization path: one model per λ from ONE distributed Gram pass.
    * λs are solved in DESCENDING order with warm starts (the glmnet
    * pathwise strategy — each solution seeds the next, so late path points
    * converge in a few sweeps); results return in the caller's λ order.
    * Cluster cost is identical to a single [[fit]] no matter how many λs.
    */
  def path(
      df: DataFrame,
      xCols: Seq[String],
      yCol: String,
      lambdas: Seq[Double],
      alpha: Double = 1.0,
      intercept: Boolean = true,
      weightCol: Option[String] = None,
      maxIter: Int = 10000,
      tol: Double = 1e-12): Seq[ENetModel] = {
    require(xCols.nonEmpty, "at least one feature column required")
    require(lambdas.nonEmpty, "at least one lambda required")
    require(lambdas.forall(_ >= 0.0), "lambdas must be >= 0")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val names = ((if (intercept) Seq("(Intercept)") else Nil) ++ xCols).toArray
    val m = moments(df, xCols, yCol, intercept, weightCol)
    val beta = BDV.zeros[Double](xCols.size)
    val fits = lambdas.zipWithIndex.sortBy(-_._1).map { case (lam, idx) =>
      val it = cdSolve(m, lam, alpha, beta, maxIter, tol)
      idx -> finish(m, names, yCol, intercept, beta, lam, alpha, it)
    }
    fits.sortBy(_._1).map(_._2)
  }
}

package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group least squares: one independent OLS/WLS fit PER GROUP KEY,
  * solved entirely inside the aggregation pipeline — millions of groups,
  * zero driver involvement.
  *
  * This is the custom-UDAF realization of the Gram kernel (SURVEY.md §4:
  * "one `Aggregator`... Catalyst cannot synthesize a fused outer-product
  * aggregate"): the buffer is the packed upper-triangular XᵀWX plus XᵀWy,
  * yᵀWy, Σwy, Σw, n — exactly the `reduceNormal` contract of the reference
  * (reference: utils.scala:58-64) — merged element-wise, so Spark gives
  * map-side partial aggregation and the shuffle carries one p²-sized buffer
  * per (partition, group), never row data. The per-group solve runs in the
  * aggregate's `finish` on whichever executor owns the group.
  */
object GroupedLM {

  /** Buffer layout: [n, Σw, Σwy, yᵀWy | XᵀWy (p) | upper-tri XᵀWX]. */
  private def bufLen(p: Int): Int = 4 + p + p * (p + 1) / 2

  /** Aggregator over rows of `array(x1..xp, y, w)`. `finish` emits
    * [β (p) | r², n, sigma | diag((XᵀWX)⁻¹) (p) | packed upper-tri
    * (XᵀWX)⁻¹ (p(p+1)/2)] or all-NaN (β/kernel parts) for singular/
    * underdetermined groups; the inverse diagonal feeds the per-group
    * standard errors se_j = σ·sqrt(diag_j), the packed kernel the
    * per-row scoring standard errors ([[predictWithSe]]).
    */
  private final class GramAgg(p: Int, intercept: Boolean,
      ridge: Double = 0.0)
      extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val pp = if (intercept) p + 1 else p
    private val nUp = pp * (pp + 1) / 2

    def zero: Array[Double] = new Array[Double](bufLen(pp))

    def reduce(b: Array[Double], in: Seq[Double]): Array[Double] = {
      val x = new Array[Double](pp)
      if (intercept) x(0) = 1.0
      var i = 0
      while (i < p) { x(if (intercept) i + 1 else i) = in(i); i += 1 }
      val y = in(p)
      val w = in(p + 1)
      b(0) += 1.0
      b(1) += w
      b(2) += w * y
      b(3) += w * y * y
      i = 0
      var k = 4 + pp
      while (i < pp) {
        val wxi = w * x(i)
        b(4 + i) += wxi * y
        var j = i
        while (j < pp) { b(k) += wxi * x(j); k += 1; j += 1 }
        i += 1
      }
      b
    }

    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(b: Array[Double]): Seq[Double] = {
      val n = b(0)
      val out = new Array[Double](2 * pp + 3 + nUp)
      // n == pp is exactly-determined: a well-defined zero-residual fit
      // (what DuckDB's regr_slope/regr_intercept returns for 2 points /
      // 1 feature). Only underdetermined groups are hopeless — unless the
      // solve is ridge-penalized, which is PD (hence defined) for any n.
      if (n < pp && ridge == 0.0) {
        java.util.Arrays.fill(out, Double.NaN)
        out(pp + 1) = n
        return out.toSeq
      }
      val xtx = BDM.zeros[Double](pp, pp)
      var k = 4 + pp
      var i = 0
      while (i < pp) {
        var j = i
        while (j < pp) { xtx(i, j) = b(k); xtx(j, i) = b(k); k += 1; j += 1 }
        xtx(i, i) += ridge
        i += 1
      }
      val xty = BDV.tabulate(pp)(i => b(4 + i))
      try {
        val beta = LinAlg.solvePD(xtx, xty)
        val inv = LinAlg.invPD(xtx)
        // exactly-determined groups have zero residual by construction —
        // force it so r2 is exactly 1 instead of 1 ± float noise. Under
        // ridge the OLS identity sse = yᵀy − βᵀXᵀy picks up a λ‖β‖² term
        // (from (XᵀX+λI)β = Xᵀy).
        val sse =
          if (n == pp && ridge == 0.0) 0.0
          else math.max(0.0, b(3) - (beta dot xty) - ridge * (beta dot beta))
        val tss = if (intercept) b(3) - b(2) * b(2) / b(1) else b(3)
        i = 0
        while (i < pp) {
          out(i) = beta(i)
          out(pp + 3 + i) = inv(i, i)
          i += 1
        }
        out(pp) = if (tss > 0) 1.0 - sse / tss else Double.NaN
        out(pp + 1) = n
        // zero residual degrees of freedom → sigma undefined (matches R lm)
        out(pp + 2) = if (n > pp) math.sqrt(sse / (n - pp)) else Double.NaN
        // packed upper-tri kernel, row-major: feeds predictWithSe
        k = 2 * pp + 3
        i = 0
        while (i < pp) {
          var j = i
          while (j < pp) { out(k) = inv(i, j); k += 1; j += 1 }
          i += 1
        }
      } catch {
        case _: Exception =>
          java.util.Arrays.fill(out, Double.NaN)
          out(pp + 1) = n
      }
      out.toSeq
    }

    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Fit y ~ X independently within every group of `keyCols`.
    *
    * @param kernel when true, append a `kernel` column holding the packed
    *               upper-triangular (XᵀWX)⁻¹ (p(p+1)/2 doubles per group)
    *               — the input [[predictWithSe]] needs for per-row scoring
    *               standard errors. Off by default so existing consumers
    *               see an unchanged schema.
    * @param ridge  L2 penalty λ added to the XᵀWX diagonal before the
    *               solve (per-group ridge regression; the building block
    *               [[graft.ops.Factorize.als]] alternates). With λ > 0
    *               the solve is defined for ANY group size — no NaN
    *               underdetermined rows — and r2/sigma/se_* describe the
    *               PENALIZED fit.
    * @return one row per group: keyCols ++ (b_0.. coefficient columns named
    *         after the features, with `b_intercept` first when intercept),
    *         plus r2, n_rows, sigma, and matching `se_*` standard errors
    *         (σ·sqrt(diag((XᵀWX)⁻¹))). Groups with n ≤ p or singular XᵀX
    *         get NaN coefficients.
    */
  def fit(
      df: DataFrame,
      keyCols: Seq[String],
      xCols: Seq[String],
      yCol: String,
      intercept: Boolean = true,
      weightCol: Option[String] = None,
      kernel: Boolean = false,
      ridge: Double = 0.0): DataFrame = {
    require(keyCols.nonEmpty && xCols.nonEmpty)
    require(ridge >= 0.0, s"ridge must be >= 0, got $ridge")
    val p = xCols.size
    val pp = if (intercept) p + 1 else p
    val agg = udaf(new GramAgg(p, intercept, ridge))
    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val input = array((xCols.map(c => col(c).cast("double")) :+
      col(yCol).cast("double")) :+ w: _*)
    val names = (if (intercept) Seq("b_intercept") else Nil) ++ xCols.map("b_" + _)
    val fitted = df.groupBy(keyCols.map(col): _*)
      .agg(agg(input).as("fit"))
    val outCols = keyCols.map(col) ++
      names.zipWithIndex.map { case (nm, i) => element_at(col("fit"), i + 1).as(nm) } ++
      Seq(
        element_at(col("fit"), names.size + 1).as("r2"),
        element_at(col("fit"), names.size + 2).cast("long").as("n_rows"),
        element_at(col("fit"), names.size + 3).as("sigma")) ++
      // se_j = σ·sqrt(diag((XᵀWX)⁻¹)_j) — appended last so positional
      // consumers of the original columns are unaffected
      names.zipWithIndex.map { case (nm, i) =>
        (element_at(col("fit"), names.size + 3) *
          sqrt(element_at(col("fit"), names.size + 4 + i)))
          .as("se_" + nm.stripPrefix("b_")) } ++
      (if (kernel)
        Seq(slice(col("fit"), 2 * pp + 4, pp * (pp + 1) / 2).as("kernel"))
      else Nil)
    fitted.select(outCols: _*)
  }

  /** Score `df` with per-row prediction standard errors from a per-group
    * fit — the grouped twin of [[LMModel.predictWithSe]] (R `predict.lm`
    * per group), with the same shape as [[GroupedGLM.predict]]: the fit
    * frame (one row per group, `fit(..., kernel = true)` output) is
    * broadcast-joined on the group key, and prediction, se_fit and the
    * optional confidence/prediction interval are all column expressions
    * over the joined coefficients — no UDF anywhere, no driver state,
    * any number of groups. (The per-group t-quantile is the native
    * codegen'd [[graft.functions.TQuantile]] expression, evaluated over
    * the betas frame — one row per group — before the broadcast.)
    *
    * Rows of groups absent from `betas` or with NaN/undefined kernels
    * score NaN, marking them unscorable rather than dropping them.
    */
  def predictWithSe(betas: DataFrame, df: DataFrame, keyCols: Seq[String],
      xCols: Seq[String], intercept: Boolean = true,
      interval: String = "none", level: Double = 0.95): DataFrame = {
    require(Seq("none", "confidence", "prediction").contains(interval),
      s"interval must be none|confidence|prediction, got $interval")
    require(betas.columns.contains("kernel"),
      "betas frame has no `kernel` column — fit with kernel = true")
    val p = xCols.size
    val pp = if (intercept) p + 1 else p
    val coefCols = (if (intercept) Seq("b_intercept") else Nil) ++ xCols.map("b_" + _)
    // per-group t quantile for the interval: the native t_quantile
    // expression over the one-row-per-group betas frame only (never the
    // data frame); df <= 0 (n <= pp) yields NaN, the unscorable marker
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val qt = call_function("t_quantile",
      (col("n_rows") - pp).cast("double"),
      lit(1.0 - (1.0 - level) / 2.0))
    val slim = betas.select((keyCols.map(col) ++ coefCols.map(col) ++ Seq(
      col("sigma").as("__sigma"), col("kernel").as("__kernel"),
      qt.as("__tq"))): _*)
    val joined = df.join(broadcast(slim), keyCols, "left")
    val xs: Seq[Column] = (if (intercept) Seq(lit(1.0)) else Nil) ++
      xCols.map(c => col(c).cast("double"))
    val pred = coefCols.map(col).zip(xs).map { case (b, x) => b * x }.reduce(_ + _)
    // x₀ᵀK x₀ from the packed upper-tri kernel: element_at chains stay in
    // codegen; index of (i,j), i ≤ j, row-major = i·pp − i(i−1)/2 + (j−i)
    def kAt(i: Int, j: Int): Column =
      element_at(col("__kernel"), i * pp - i * (i - 1) / 2 + (j - i) + 1)
    var quad: Column = lit(0.0)
    for (i <- 0 until pp; j <- i until pp)
      quad = quad + (if (i == j) kAt(i, i) * xs(i) * xs(i)
                     else kAt(i, j) * xs(i) * xs(j) * 2.0)
    val seFit = col("__sigma") * sqrt(quad)
    // absent group -> null coefficients/kernel -> null result; surface as
    // NaN (same convention as GroupedGLM.predict)
    def nn(c: Column): Column = coalesce(c, lit(Double.NaN))
    val base = joined.withColumn("prediction", nn(pred))
      .withColumn("se_fit", nn(seFit))
    val out =
      if (interval == "none") base
      else {
        val half =
          if (interval == "confidence") col("__tq") * col("se_fit")
          else col("__tq") * col("__sigma") * sqrt(lit(1.0) + quad)
        base.withColumn("lwr", nn(col("prediction") - half))
          .withColumn("upr", nn(col("prediction") + half))
      }
    out.drop(coefCols :+ "__sigma" :+ "__kernel" :+ "__tq": _*)
  }
}

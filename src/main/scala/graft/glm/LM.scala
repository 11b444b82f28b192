package graft.glm

import breeze.linalg.{DenseVector => BDV}
import org.apache.commons.math3.distribution.{FDistribution, TDistribution}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Ordinary / weighted least squares on a single DataFrame.
  *
  * Re-expression of the reference's `LM` (reference: LM.scala:241-274 `fit`,
  * LM.scala:29-61 `predict`, LM.scala:66-137 `SummaryLM`) with the
  * partition-dependent dual-DataFrame API removed (see SURVEY.md §1): one
  * DataFrame holds features and label, there is a single code path for any
  * partitioning, and the entire fit — coefficients, SSE, R², F, std errors —
  * comes out of **one** distributed aggregation pass:
  *
  *   given (XᵀWX, XᵀWy, yᵀWy, Σwy, Σw) from [[Gram.normal]]:
  *     β    = (XᵀWX)⁻¹ XᵀWy              (driver Cholesky)
  *     SSE  = yᵀWy − βᵀXᵀWy              (normal-equations identity)
  *     TSS  = yᵀWy − (Σwy)²/Σw
  *     R²   = 1 − SSE/TSS,  F = ((TSS−SSE)/(p−1)) / (SSE/(n−p))
  *     se_j = sqrt(SSE/(n−p) · ((XᵀWX)⁻¹)_jj)
  *
  * versus the reference's 2 data passes + 2 `count()` jobs + a ySums collect
  * (reference: LM.scala:245-252,160-176). Scoring is a pure `withColumn`
  * projection with literal coefficients — no collect, no zipWithIndex jobs
  * (reference: LM.scala:39-61 collects single-partition data to the driver
  * and round-trips it).
  */
final class LMModel(
    val xnames: Array[String],
    val yname: String,
    val intercept: Boolean,
    val coefs: BDV[Double],
    val stdErr: BDV[Double],
    val sigma: Double,
    val r2: Double,
    val adjR2: Double,
    val fStat: Double,
    val n: Long,
    /** (XᵀWX)⁻¹ — the unscaled coefficient covariance kernel, kept for
      * per-row scoring standard errors (p×p, driver-local).
      */
    val xtxInv: breeze.linalg.DenseMatrix[Double])
    extends Serializable {

  /** Number of fitted parameters (including intercept). */
  def p: Int = coefs.length
  def dfResidual: Long = n - p
  def dfModel: Int = p - 1

  def tValues: BDV[Double] = BDV.tabulate(p)(i => coefs(i) / stdErr(i))

  def pValues: BDV[Double] = {
    val t = new TDistribution(dfResidual.toDouble)
    BDV.tabulate(p)(i => 2.0 * (1.0 - t.cumulativeProbability(math.abs(tValues(i)))))
  }

  def fPValue: Double =
    if (dfModel <= 0) Double.NaN
    else 1.0 - new FDistribution(dfModel.toDouble, dfResidual.toDouble).cumulativeProbability(fStat)

  /** Names of the feature columns expected at scoring time (no intercept). */
  def featureNames: Array[String] = if (intercept) xnames.drop(1) else xnames

  /** ŷ as a column expression with literal coefficients — codegen-friendly,
    * usable on batch or streaming DataFrames alike.
    */
  def predictionExpr: Column = {
    val terms = featureNames.zipWithIndex.map { case (nm, i) =>
      col(nm).cast(DoubleType) * lit(coefs(if (intercept) i + 1 else i))
    }
    val linear = terms.foldLeft(if (intercept) lit(coefs(0)) else lit(0.0))(_ + _)
    linear
  }

  /** Score `df`: missing training columns are added as 0.0 (matchCols
    * semantics, reference: utils.scala:21-33), prediction appended as a new
    * column — the input rows are preserved, unlike the reference's
    * `(index, value)` output (reference: LM.scala:27,48-49).
    */
  def predict(df: DataFrame, outputCol: String = "prediction"): DataFrame =
    ModelMatrix.matchCols(featureNames.toSeq, df).withColumn(outputCol, predictionExpr)

  /** x₀ᵀ(XᵀWX)⁻¹x₀ — the variance quadratic form behind scoring standard
    * errors ([[LinAlg.quadFormExpr]]: unrolled codegen'd expression for
    * small p, one closure UDF above it so wide-p plans stay O(p)).
    */
  private def varQuadExpr: Column = {
    require(!xtxInv(0, 0).isNaN,
      "this model has no (XᵀWX)⁻¹ kernel (loaded from a pre-xtx_inv save?) — " +
        "refit or re-save with the current version to use predictWithSe")
    val xs: Array[Column] =
      (if (intercept) Array(lit(1.0)) else Array.empty[Column]) ++
        featureNames.map(nm => col(nm).cast(DoubleType))
    LinAlg.quadFormExpr(xtxInv, xs)
  }

  /** Score with per-row standard errors and intervals, R `predict.lm`
    * semantics: `se_fit` = σ·sqrt(x₀ᵀ(XᵀWX)⁻¹x₀); `interval = "confidence"`
    * bounds the MEAN response (± t·se_fit), `"prediction"` bounds a NEW
    * observation (± t·σ·sqrt(1/w + x₀ᵀ(XᵀWX)⁻¹x₀), where w is the new
    * observation's prior weight from `weightCol` — R's
    * `predict.lm(..., weights=)`; unit weight when absent); `"none"` adds
    * only `prediction` and `se_fit`. Everything is a literal-coefficient
    * column expression — scoring cost is one codegen'd projection at any
    * scale.
    */
  def predictWithSe(df: DataFrame, interval: String = "none",
      level: Double = 0.95, weightCol: Option[String] = None): DataFrame = {
    require(Seq("none", "confidence", "prediction").contains(interval),
      s"interval must be none|confidence|prediction, got $interval")
    require(level > 0 && level < 1, s"level must be in (0,1), got $level")
    val scored = predict(df).withColumn("se_fit", lit(sigma) * sqrt(varQuadExpr))
    if (interval == "none") scored
    else {
      val tq = new TDistribution(dfResidual.toDouble)
        .inverseCumulativeProbability(1.0 - (1.0 - level) / 2.0)
      val invW = weightCol.map(c => lit(1.0) / col(c).cast(DoubleType)).getOrElse(lit(1.0))
      val half =
        if (interval == "confidence") lit(tq) * col("se_fit")
        else lit(tq * sigma) * sqrt(invW + varQuadExpr)
      scored
        .withColumn("lwr", col("prediction") - half)
        .withColumn("upr", col("prediction") + half)
    }
  }

  /** Per-row influence diagnostics — R's `hatvalues` / `rstandard` /
    * `rstudent` / `cooks.distance` as ONE literal-kernel codegen'd
    * projection (no residual materialization, no second pass):
    *
    *   h_i        = w_i·x_iᵀ(XᵀWX)⁻¹x_i                (leverage; Σh = p)
    *   std_resid  = e_i√w_i / (σ̂·√(1−h_i))            (rstandard)
    *   student    = e_i√w_i / (σ̂₍ᵢ₎·√(1−h_i)),         (rstudent)
    *     σ̂₍ᵢ₎² = (dfe·σ̂² − w_i e_i²/(1−h_i)) / (dfe−1)  (leave-one-out σ)
    *   cooks_d    = (std_resid²/p) · h_i/(1−h_i)
    *
    * `df` must carry the label column; `weightCol` must be the training
    * weights for a WLS fit (unit otherwise). The reference has no influence
    * measures at all — this is the summary-table half of R lm the reference
    * skipped (reference: LM.scala:66-137 stops at coefficient stats).
    */
  def diagnostics(df: DataFrame, weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))
    val e = col(yname).cast(DoubleType) - col("prediction")
    val h = w * varQuadExpr
    val dfe = dfResidual.toDouble
    // guard h→1 (exactly-determined rows): residual is 0 there and R
    // returns NaN for the scaled residuals — 1−h stays in the denominator
    val oneMinusH = lit(1.0) - h
    val std = e * sqrt(w) / (lit(sigma) * sqrt(oneMinusH))
    val sig2LOO = (lit(dfe * sigma * sigma) - w * e * e / oneMinusH) / lit(dfe - 1.0)
    predict(df)
      .withColumn("residual", e)
      .withColumn("hat", h)
      .withColumn("std_resid", std)
      .withColumn("student_resid", e * sqrt(w) / sqrt(sig2LOO * oneMinusH))
      .withColumn("cooks_d", (std * std / lit(p.toDouble)) * (h / oneMinusH))
  }

  def formulaString: String = s"$yname ~ ${featureNames.mkString(" + ")}" +
    (if (intercept) "" else " - 1")

  /** Persist the model as a one-row parquet dataset: pure Spark API, no
    * extra serialization format, readable by any engine (the schema IS the
    * model state). Round-trips bit-exactly — see [[LM.load]].
    */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    // xtx_inv stored row-major; square of length p² (p = coefs length)
    Seq((xnames.toSeq, yname, intercept, coefs.toArray.toSeq,
        stdErr.toArray.toSeq, sigma, r2, adjR2, fStat, n,
        (for (i <- 0 until p; j <- 0 until p) yield xtxInv(i, j)).toSeq))
      .toDF("xnames", "yname", "intercept", "coefs", "std_err",
        "sigma", "r2", "adj_r2", "f_stat", "n", "xtx_inv")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** R-style printed summary (reference: LM.scala:66-137). */
  def summary: String = {
    import NumFormat._
    val sb = new StringBuilder
    sb ++= s"Call:\nlm(formula = $formulaString)\n\n"
    sb ++= "Coefficients:\n"
    sb ++= f"${""}%-20s${"Estimate"}%13s${"Std. Error"}%13s${"t value"}%13s${"Pr(>|t|)"}%13s\n"
    val tv = tValues; val pv = pValues
    xnames.indices.foreach { i =>
      sb ++= f"${xnames(i)}%-20s${cell(coefs(i))}${cell(stdErr(i))}${cell(tv(i))}${cell(pv(i))} ${stars(pv(i))}\n"
    }
    sb ++= "---\n"
    sb ++= s"Residual standard error: ${sigDigits(sigma, 6)} on $dfResidual degrees of freedom\n"
    sb ++= s"Multiple R-squared: ${sigDigits(r2, 6)}, Adjusted R-squared: ${sigDigits(adjR2, 6)}\n"
    sb ++= s"F-statistic: ${sigDigits(fStat, 6)} on $dfModel and $dfResidual DF, p-value: ${sigDigits(fPValue, 6)}\n"
    sb.result()
  }
}

object LM {

  /** Load a model persisted by [[LMModel.save]]. Models saved before the
    * `xtx_inv` column existed still load (scoring, summary, save all work);
    * only `predictWithSe` needs the kernel and fails with a clear message
    * on such a model (the NaN sentinel is checked there).
    */
  def load(spark: SparkSession, path: String): LMModel = {
    val df = spark.read.parquet(path)
    val r = df.head()
    def d(name: String) = r.getSeq[Double](r.fieldIndex(name)).toArray
    val coefs = d("coefs")
    val p = coefs.length
    val flat =
      if (df.columns.contains("xtx_inv")) d("xtx_inv")
      else Array.fill(p * p)(Double.NaN)
    new LMModel(
      r.getSeq[String](r.fieldIndex("xnames")).toArray,
      r.getString(r.fieldIndex("yname")),
      r.getBoolean(r.fieldIndex("intercept")),
      BDV(coefs), BDV(d("std_err")),
      r.getDouble(r.fieldIndex("sigma")),
      r.getDouble(r.fieldIndex("r2")),
      r.getDouble(r.fieldIndex("adj_r2")),
      r.getDouble(r.fieldIndex("f_stat")),
      r.getLong(r.fieldIndex("n")),
      // stored row-major; Breeze tabulate indexes (row, col)
      breeze.linalg.DenseMatrix.tabulate(p, p)((i, j) => flat(i * p + j)))
  }

  /** Fit y ~ X by (weighted) least squares.
    *
    * @param df        input data; feature/label columns must be numeric
    * @param xCols     feature column names
    * @param yCol      label column name
    * @param intercept prepend an all-ones column (named "(Intercept)")
    * @param weightCol optional observation-weight column (WLS,
    *                  reference: utils.scala:70-112)
    */
  def fit(
      df: DataFrame,
      xCols: Seq[String],
      yCol: String,
      intercept: Boolean = true,
      weightCol: Option[String] = None): LMModel = {
    require(xCols.nonEmpty, "at least one feature column required")
    val xs: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++ xCols.map(c => col(c).cast(DoubleType))
    val names = ((if (intercept) Seq("(Intercept)") else Nil) ++ xCols).toArray
    val w = weightCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))

    val g = Gram.normal(df, xs, col(yCol).cast(DoubleType), w)
    val p = g.p
    require(g.n > p, s"need more rows (${g.n}) than parameters ($p)")

    val beta = LinAlg.solvePD(g.xtx, g.xty)
    val sse = math.max(0.0, g.yty - (beta dot g.xty))
    val tss = if (intercept) g.yty - g.ySum * g.ySum / g.wSum else g.yty
    val ssm = tss - sse
    val dfe = (g.n - p).toDouble
    val sigma2 = sse / dfe
    val ixtx = LinAlg.invPD(g.xtx)
    val se = BDV.tabulate(p)(i => math.sqrt(sigma2 * ixtx(i, i)))
    val r2 = if (tss > 0) ssm / tss else Double.NaN
    val adjR2 = 1.0 - (1.0 - r2) * (g.n - (if (intercept) 1 else 0)).toDouble / dfe
    val f = if (p > 1) (ssm / (p - 1)) / sigma2 else Double.NaN

    new LMModel(names, yCol, intercept, beta, se, math.sqrt(sigma2), r2, adjR2, f, g.n, ixtx)
  }

  /** L2-regularized (ridge) least squares off the SAME single Gram pass as
    * [[fit]] — the penalty is a driver-side diagonal add, so regularization
    * costs zero extra cluster work:
    *
    *   β = (XᵀWX + λ·I′)⁻¹ XᵀWy,   I′ = identity with a 0 in the intercept
    *                                slot (the intercept is never penalized)
    *
    * Textbook penalized normal equations on the raw (unstandardized)
    * columns — NOT MASS::lm.ridge, which rescales x by population SDs
    * first; standardize beforehand if that behavior is wanted. λ = 0
    * reduces bit-exactly to [[fit]] (spec-gated).
    *
    * Reported inference follows the classical fixed-λ results:
    * SSE uses the full quadratic yᵀWy − 2βᵀXᵀWy + βᵀ(XᵀWX)β (the OLS
    * normal-equations shortcut is INVALID for a penalized β), σ̂² = SSE/(n−p),
    * and std errors come from the sandwich σ̂²·(XᵀWX+λI′)⁻¹XᵀWX(XᵀWX+λI′)⁻¹.
    * The stored scoring kernel is that sandwich (sans σ²), so
    * `predictWithSe` gives the ridge-correct se.fit.
    */
  def fitRidge(
      df: DataFrame,
      xCols: Seq[String],
      yCol: String,
      lambda: Double,
      intercept: Boolean = true,
      weightCol: Option[String] = None): LMModel = {
    require(xCols.nonEmpty, "at least one feature column required")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val xs: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++ xCols.map(c => col(c).cast(DoubleType))
    val names = ((if (intercept) Seq("(Intercept)") else Nil) ++ xCols).toArray
    val w = weightCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))

    val g = Gram.normal(df, xs, col(yCol).cast(DoubleType), w)
    val p = g.p
    require(g.n > p, s"need more rows (${g.n}) than parameters ($p)")

    val pen = g.xtx.copy
    val start = if (intercept) 1 else 0
    for (i <- start until p) pen(i, i) += lambda
    val beta = LinAlg.solvePD(pen, g.xty)
    val sse = math.max(0.0,
      g.yty - 2.0 * (beta dot g.xty) + (beta dot (g.xtx * beta)))
    val tss = if (intercept) g.yty - g.ySum * g.ySum / g.wSum else g.yty
    val dfe = (g.n - p).toDouble
    val sigma2 = sse / dfe
    val ipen = LinAlg.invPD(pen)
    val sandwich = ipen * g.xtx * ipen
    val se = BDV.tabulate(p)(i => math.sqrt(sigma2 * sandwich(i, i)))
    val r2 = if (tss > 0) (tss - sse) / tss else Double.NaN
    val adjR2 = 1.0 - (1.0 - r2) * (g.n - (if (intercept) 1 else 0)).toDouble / dfe
    val f = if (p > 1) ((tss - sse) / (p - 1)) / sigma2 else Double.NaN

    new LMModel(names, yCol, intercept, beta, se, math.sqrt(sigma2), r2, adjR2, f,
      g.n, sandwich)
  }

  /** Formula front-end: dummy-encodes string columns via [[ModelMatrix]]
    * then fits (reference: R/pkg/R/LM.R:24-44 `sparkLM`). Interaction terms
    * (`x1:x2`, `x1*x2`) expand per [[ModelMatrix.termColumns]].
    */
  def fitFormula(df: DataFrame, formula: String, weightCol: Option[String] = None): LMModel = {
    val f0 = Formula.parse(formula).resolve(df.columns.filterNot(weightCol.contains).toSeq)
    val base = f0.baseColumns
    val dropped = ModelMatrix.naDrop(df.select(
      ((f0.response +: base) ++ weightCol).distinct.map(col): _*))
    val stringCols = base.filter(c =>
      dropped.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val lv = ModelMatrix.levels(dropped, stringCols)
    val feats = ModelMatrix.termColumns(f0.terms, lv)
    val encoded = dropped.select(
      col(f0.response).cast("double").as(f0.response) +:
        (feats.map(_._2) ++ weightCol.map(c => col(c).cast("double").as(c))): _*)
    fit(encoded, feats.map(_._1), f0.response, f0.intercept, weightCol)
  }
}

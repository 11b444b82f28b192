package graft.glm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals for the LM: distribution-free
  * coverage from a held-out calibration set. Fit on the training split,
  * take the (1−α) quantile q of the calibration set's absolute
  * residuals, and report ŷ ± q — under exchangeability the interval
  * covers with probability ≥ 1−α regardless of the error distribution
  * (unlike the Gaussian `predictWithSe` bands, which lean on normality).
  *
  * Split discipline is the repo's content-keyed md5 convention (q63/q97):
  * deterministic, partition-invariant, reproducible on any engine. The
  * quantile follows the engine `percentile` interpolation convention
  * (the q33-proven cross-engine contract) — the finite-sample
  * ⌈(1−α)(n+1)⌉/n correction is omitted, which at calibration sizes in
  * the thousands changes q by O(1/n) (documented trade; pass a slightly
  * smaller α to re-tighten).
  *
  * Cluster cost: the LM fit's one Gram pass + one calibration quantile
  * aggregation; scoring is a pure literal-β projection.
  */
object Conformal {

  /** @param idCol       content key for the train/calibration split
    * @param calibSixteenths how many md5 sixteenths form the calibration
    *                    set (4 = 25%)
    * @param alpha       miscoverage rate (0.1 → 90% intervals)
    * @return input rows plus (prediction, conf_lo, conf_hi, is_calib)
    */
  def lmIntervals(df: DataFrame, features: Seq[String], target: String,
      idCol: String, alpha: Double = 0.1,
      calibSixteenths: Int = 4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    require(calibSixteenths >= 1 && calibSixteenths <= 15,
      s"need 1 <= calibSixteenths <= 15, got $calibSixteenths")
    val digit: Column =
      substring(md5(col(idCol).cast("string")), 32, 1)
    val cut = "0123456789abcdef".charAt(calibSixteenths).toString
    val isCalib = digit < cut
    val model = LM.fit(df.filter(!isCalib), features, target)
    val scored = model.predict(df)
    val q = scored.filter(isCalib)
      .withColumn("__ar", abs(col(target) - col("prediction")))
      .agg(expr(s"percentile(__ar, ${1.0 - alpha})"))
      .head().getDouble(0)
    scored
      .withColumn("conf_lo", col("prediction") - lit(q))
      .withColumn("conf_hi", col("prediction") + lit(q))
      .withColumn("is_calib", isCalib)
  }
}

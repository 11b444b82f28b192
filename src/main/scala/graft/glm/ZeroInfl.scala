package graft.glm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zero-inflated Poisson regression (Lambert 1992): counts that mix a
  * point mass at zero (probability π — "structural" zeros: users who
  * never could convert, documents that never could match) with a
  * Poisson(μ = exp(xβ)) count process. A plain Poisson GLM on such data
  * biases μ down and calls the lack of fit overdispersion; ZIP separates
  * the two mechanisms.
  *
  * Fit by EM with a scalar zero-inflation probability:
  *  - E-step: for observed zeros, z = π / (π + (1−π)e^{−μ}) — the
  *    posterior probability the zero is structural (positive counts have
  *    z = 0 by construction);
  *  - M-step: π = mean(z), and β from a weighted Poisson GLM with
  *    prior weights 1 − z — EXACTLY [[GLM.fit]]'s `weightCol`, so the
  *    count component reuses the fused-Gram IRLS machinery unchanged.
  *
  * Spark shape per EM round: ONE scoring projection (μ from literal
  * coefficients), ONE scalar aggregate (π), one [[GLM.fit]] (IRLS over
  * the persisted working frame). No driver state beyond (π, β); any
  * data size. Fixed `emIters` keeps the fit deterministic — both the
  * engine and the oracle converge to the same EM fixed point, compared
  * on the 6-digit grid (the q226/q260 discipline).
  */
object ZeroInfl {

  /** @param pi    zero-inflation probability (structural-zero share)
    * @param count the Poisson count component (μ = exp(xβ))
    */
  final case class ZipModel(pi: Double, count: GLMModel, emIters: Int) {

    /** Score: `prediction` = E[y] = (1−π)·μ, `p_zero` = π + (1−π)e^{−μ}
      * — both pure column expressions over the literal-coefficient μ.
      */
    def predict(df: DataFrame, outputCol: String = "prediction"): DataFrame =
      count.predict(df, "__mu")
        .withColumn(outputCol, lit(1.0 - pi) * col("__mu"))
        .withColumn("p_zero", lit(pi) + lit(1.0 - pi) * exp(-col("__mu")))
        .drop("__mu")
  }

  /** Fit by `emIters` EM rounds from (π = 0.25, β = the plain Poisson
    * fit). `yCol` must be a non-negative count.
    */
  def fitZip(df: DataFrame, xCols: Seq[String], yCol: String,
      emIters: Int = 6, intercept: Boolean = true,
      tol: Double = 1e-10): ZipModel = {
    require(emIters >= 1, s"need emIters >= 1, got $emIters")
    import org.apache.spark.storage.StorageLevel
    val work0 = df.select((xCols.map(col) :+
        col(yCol).cast("double").as("__y")): _*)
      .filter(col("__y").isNotNull && col("__y") >= 0)
    // Sufficient-stats collapse for the WHOLE EM alternation: every EM
    // quantity — the E-step z (a function of the row's (x, y>0) only),
    // π (a weighted mean of z), and the weighted Poisson Gram — depends
    // on the data through the (x…, y) pattern alone, so a discrete
    // design collapses ~6·(IRLS+2) full-data passes into ONE. See
    // [[SuffStats]] for the gate.
    val collapsed = SuffStats.collapse(work0, "__cnt")
    val cntCol = collapsed.map(_ => "__cnt")
    val work = collapsed.map(_.view)
      .getOrElse(work0.persist(StorageLevel.MEMORY_AND_DISK))
    try {
      var pi = 0.25
      var model = GLM.fit(work, xCols, "__y", family = "poisson",
        intercept = intercept, tol = tol, computeStats = false,
        countCol = cntCol)
      for (it <- 1 to emIters) {
        // E-step with the PREVIOUS (π, β); M-step refreshes both
        val withZ = model.predict(work, "__mu")
          .withColumn("__z", when(col("__y") > 0, lit(0.0))
            .otherwise(graft.functions.stableLit(pi) /
              (graft.functions.stableLit(pi) + graft.functions.stableLit(1.0 - pi) * exp(-col("__mu")))))
          .withColumn("__w", lit(1.0) - col("__z"))
        // π = mean(z) over OBSERVATIONS (count-weighted when collapsed)
        pi = cntCol match {
          case Some(c) =>
            val r = withZ.agg(sum(col("__z") * col(c)), sum(col(c))).head()
            r.getDouble(0) / r.getDouble(1)
          case None => withZ.agg(avg("__z")).head().getDouble(0)
        }
        // warm-start at the previous round's β (same per-round MLE fixed
        // point, far fewer IRLS passes — β barely moves between rounds)
        // and skip the derived-statistics jobs on all but the last round
        model = GLM.fit(withZ, xCols, "__y", family = "poisson",
          weightCol = Some("__w"), intercept = intercept, tol = tol,
          initCoefs = Some(model.coefs), computeStats = it == emIters,
          countCol = cntCol)
      }
      ZipModel(pi, model, emIters)
    } finally {
      work.unpersist()
      collapsed.foreach(_.unpersist())
    }
  }
}

package graft.glm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Negative-binomial regression with ESTIMATED dispersion — the
  * `MASS::glm.nb` workflow: alternate the negbin(θ) GLM fit (IRLS at
  * the current θ) with a θ update until both settle. The θ update is
  * the Pearson moment estimator (Breslow 1984): solve
  *
  *   f(θ) = Σ (y − μ)² / (μ + μ²/θ) − (n − p) = 0
  *
  * by Newton steps (f is strictly increasing in θ with
  * f′(θ) = Σ (y−μ)²·μ² / (θ²·(μ + μ²/θ)²) > 0, so the root is unique
  * when the data are overdispersed). The moment estimator replaces R's
  * ML θ (whose score needs digamma sums — fine on a driver, but not
  * replayable as relational arithmetic); both estimate the same
  * quantity and agree closely under the model.
  *
  * Spark shape: each Newton step is ONE two-sum aggregation with θ as a
  * literal; each outer round is one [[GLM.fit]] (warm-started, stats
  * skipped until the last). θ is quantized to the 1e-8 grid after every
  * step so the whole alternation is engine-replayable — fixed rounds,
  * fixed steps, deterministic fixed point (the q275 discipline).
  *
  * Underdispersed data (f < 0 for all θ) drives θ upward without a
  * root — Poisson is the θ → ∞ limit, so a huge θ̂ is the correct
  * reading, not an error.
  */
object NegBin {

  final case class NegBinModel(theta: Double, model: GLMModel,
      outerIters: Int) {
    /** μ scoring via the count component. */
    def predict(df: DataFrame, outputCol: String = "prediction"): DataFrame =
      model.predict(df, outputCol)
  }

  private def quantize(t: Double): Double = math.rint(t * 1e8) / 1e8

  /** @param outerIters  GLM-refit rounds (θ re-enters the IRLS weights)
    * @param newtonSteps θ Newton steps per round, each one aggregation
    * @param initTheta   starting dispersion (R default-ish: 1)
    */
  def fit(df: DataFrame, xCols: Seq[String], yCol: String,
      outerIters: Int = 4, newtonSteps: Int = 3, initTheta: Double = 1.0,
      intercept: Boolean = true, tol: Double = 1e-10): NegBinModel = {
    require(outerIters >= 1 && newtonSteps >= 1, "need >= 1 iteration")
    require(initTheta > 0, s"initTheta must be > 0, got $initTheta")
    import org.apache.spark.storage.StorageLevel
    val work0 = df.select((xCols.map(col) :+
        col(yCol).cast("double").as("__y")): _*)
      .filter(col("__y").isNotNull && col("__y") >= 0)
    // Sufficient-stats collapse for the whole alternation: the Newton
    // sums and the negbin IRLS both depend on the data only through the
    // (x…, y) pattern, so a discrete design collapses
    // outerIters·(newtonSteps + IRLS) full-data passes into one grouping
    // pass. See [[SuffStats]] for the gate.
    val collapsed = SuffStats.collapse(work0, "__cnt")
    val cntCol = collapsed.map(_ => "__cnt")
    val work = collapsed.map(_.view)
      .getOrElse(work0.persist(StorageLevel.MEMORY_AND_DISK))
    // per-observation aggregate term (count-weighted when collapsed)
    def wc(c: org.apache.spark.sql.Column) =
      cntCol.map(n => c * col(n)).getOrElse(c)
    try {
      var theta = quantize(initTheta)
      def famName = f"negbin($theta%.8f)"
      var model = GLM.fit(work, xCols, "__y", family = famName,
        intercept = intercept, tol = tol, computeStats = false,
        countCol = cntCol)
      val p = model.p
      for (r <- 1 to outerIters) {
        val scored = model.predict(work, "__mu")
        for (_ <- 1 to newtonSteps) {
          // explicit products, not pow(): x*x is the same IEEE multiply
          // on every engine, so the oracle mirrors bit-for-bit
          val res = col("__y") - col("__mu")
          val den = col("__mu") + col("__mu") * col("__mu") / graft.functions.stableLit(theta)
          val row = scored.agg(
            sum(wc(res * res / den)).as("s"),
            sum(wc(res * res * col("__mu") * col("__mu") /
              (graft.functions.stableLit(theta) * graft.functions.stableLit(theta) * den * den))).as("sp"),
            cntCol.map(n => sum(col(n)).cast("long"))
              .getOrElse(count(lit(1))).as("n")).head()
          val f = row.getDouble(0) - (row.getLong(2) - p)
          val fp = row.getDouble(1)
          // guard: a vanishing derivative (all-zero residuals) leaves θ
          theta = quantize(math.max(1e-4,
            if (fp > 0) theta - f / fp else theta))
        }
        model = GLM.fit(work, xCols, "__y", family = famName,
          intercept = intercept, tol = tol,
          initCoefs = Some(model.coefs), computeStats = r == outerIters,
          countCol = cntCol)
      }
      NegBinModel(theta, model, outerIters)
    } finally {
      work.unpersist()
      collapsed.foreach(_.unpersist())
    }
  }
}

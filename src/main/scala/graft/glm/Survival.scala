package graft.glm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event estimation: the Kaplan–Meier product-limit survival
  * curve with right censoring — churn, time-to-conversion, component
  * lifetime. Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times tᵢ
  * with dᵢ events among nᵢ still at risk.
  *
  * Execution: ONE (group, duration) aggregation shuffle, then window
  * arithmetic over the per-group curve frame (|distinct durations| rows —
  * orders of magnitude smaller than the data). The running product is
  * computed as exp(Σ ln(1 − d/n)) over the time-ordered frame; the
  * cumulative sum is evaluated sequentially in that same order by any
  * engine, so the result is cross-engine reproducible (unlike a parallel
  * product reduction). The everyone-fails factor (d = n, survival → 0) is
  * handled explicitly with a cumulative flag: Spark's `log(0)` is null
  * (and `sum` would silently skip it) while other engines raise — neither
  * is the product-limit semantics, so the zero never reaches `ln`.
  */
object Survival {

  /** Kaplan–Meier curve, optionally one per group.
    *
    * @param durationCol numeric time-to-event-or-censoring
    * @param eventCol    1 = event observed, 0 = right-censored
    * @return per (group,) distinct duration `t`: (t, n_risk, d, c,
    *         survival) ordered within group by t; censored-only times
    *         carry factor 1 and so just step n_risk down
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val agg = df.groupBy((g :+ col(durationCol).as("t")): _*)
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("c"))
    val wAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrior = Window.partitionBy(g: _*).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(g: _*).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg
      .withColumn("n_risk", sum(col("d") + col("c")).over(wAll) -
        coalesce(sum(col("d") + col("c")).over(wPrior), lit(0L)))
      .withColumn("__z", when(col("d") === col("n_risk"), 1).otherwise(0))
      .withColumn("survival",
        when(max("__z").over(wRun) === 1, lit(0.0))
          .otherwise(exp(sum(
            when(col("d") < col("n_risk"),
              log(lit(1.0) - col("d").cast("double") / col("n_risk")))
              .otherwise(lit(0.0))).over(wRun))))
      .drop("__z")
  }

  /** Two-sample log-rank test: does group 1's survival differ from the
    * rest? At each distinct event time t with n at risk (n₁ in group 1)
    * and d events (d₁ in group 1), the group-1 expectation is E₁ = d·n₁/n
    * and the hypergeometric variance V = d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1);
    * χ² = (Σ(d₁−E₁))² / ΣV on 1 df.
    *
    * Same execution shape as [[kaplanMeier]]: one (duration) aggregation
    * carrying both groups' counts, window risk-set arithmetic over the
    * curve frame, one-row result. Times with d = 0 or n = 1 contribute
    * nothing (their V term is 0).
    *
    * @param groupCol  any column; `groupOneValue` defines membership
    * @return one row: (chi2, obs1, exp1)
    */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
      groupCol: String, groupOneValue: String): DataFrame = {
    val g1 = (col(groupCol) === groupOneValue).cast("long")
    val agg = df.groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, g1).otherwise(lit(0L))).as("d1"),
        count(lit(1)).as("tot"), sum(g1).as("tot1"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wPrior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = agg
      .withColumn("n", sum("tot").over(wAll) -
        coalesce(sum("tot").over(wPrior), lit(0L)))
      .withColumn("n1", sum("tot1").over(wAll) -
        coalesce(sum("tot1").over(wPrior), lit(0L)))
    val frac = col("n1").cast("double") / col("n")
    risk
      .withColumn("e1", col("d") * frac)
      .withColumn("v", when(col("n") > 1,
        col("d") * frac * (lit(1.0) - frac) *
          (col("n") - col("d")).cast("double") / (col("n") - 1))
        .otherwise(lit(0.0)))
      .agg(sum(col("d1") - col("e1")).as("omE"), sum("v").as("sumV"),
        sum("d1").as("obs1"), sum("e1").as("exp1"))
      .select(
        (col("omE") * col("omE") / col("sumV")).as("chi2"),
        col("obs1"), col("exp1"))
  }

  /** Restricted mean survival time: RMST(τ) = ∫₀^τ S(t) dt under the
    * Kaplan–Meier curve — the model-free "average time alive in the
    * first τ" effect measure (preferred where hazards are
    * non-proportional and a Cox ratio misleads).
    *
    * The step-function integral is an ordered pass over the KM frame:
    * each distinct event/censoring time contributes S(t₋)·(min(t, τ) −
    * t_prev); a final tail adds S(t_last)·(τ − t_last) when the curve
    * outlives τ. Same execution class as [[kaplanMeier]].
    *
    * @return one row: (tau, rmst, n, n_events)
    */
  def rmst(df: DataFrame, durationCol: String, eventCol: String,
      tau: Double): DataFrame = {
    require(tau > 0, s"need tau > 0, got $tau")
    val km = kaplanMeier(df, durationCol, eventCol)
    val w = Window.orderBy("t")
    val stepped = km
      .withColumn("__tprev", coalesce(lag("t", 1).over(w), lit(0.0)))
      .withColumn("__sprev", coalesce(lag("survival", 1).over(w), lit(1.0)))
    val seg = sum(when(col("__tprev") < tau,
      col("__sprev") * (least(col("t"), lit(tau)) - col("__tprev")))
      .otherwise(lit(0.0)))
    // the curve's last point via an argmax struct (max on (t, survival)
    // orders by t first — t values are distinct)
    val lastRow = max(struct(col("t"), col("survival")))
    stepped.agg(
      lit(tau).as("tau"),
      (seg + when(lastRow.getField("t") < tau,
        lastRow.getField("survival") * (lit(tau) - lastRow.getField("t")))
        .otherwise(lit(0.0))).as("rmst"),
      sum(col("d") + col("c")).as("n"), sum("d").as("n_events"))
  }

  /** Competing-risks cumulative incidence (Aalen–Johansen): with K
    * mutually exclusive event causes (cause 0 = right-censored), the
    * naive per-cause "1 − KM" overestimates — the correct cause-k
    * incidence is
    *
    *   CIF_k(t) = Σ_{s ≤ t} S(s⁻) · d_{k,s} / n_s
    *
    * where S(s⁻) is the ALL-CAUSE Kaplan–Meier just before s. Same
    * execution shape as [[kaplanMeier]]: ONE (duration, cause)
    * aggregation pivoted to per-cause counts, risk sets by the
    * prior-rows window identity, S(s⁻) as the exclusive ordered
    * ln-cumsum, CIF as an ordered cumsum per cause — all windows over
    * the distinct-time frame.
    *
    * @param causeCol integer cause: 0 = censored, 1..K = event causes
    * @return per distinct time and cause k ≥ 1: (t, cause, n_risk, d,
    *         cif); Σ_k CIF_k(∞) ≤ 1 (the all-cause failure probability)
    */
  def competingRisks(df: DataFrame, durationCol: String,
      causeCol: String): DataFrame = {
    val agg = df.groupBy(col(durationCol).as("t"), col(causeCol).as("cause"))
      .agg(count(lit(1)).as("cnt"))
    val byT = agg.groupBy("t")
      .agg(sum("cnt").as("tot"),
        sum(when(col("cause") =!= 0, col("cnt")).otherwise(0L)).as("d_all"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wPrior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    // S(t⁻): exclusive all-cause KM product via ordered ln-cumsum
    val risked = byT
      .withColumn("n_risk", sum("tot").over(wAll) -
        coalesce(sum("tot").over(wPrior), lit(0L)))
      .withColumn("s_minus", exp(coalesce(sum(
        when(col("d_all") < col("n_risk"),
          log(lit(1.0) - col("d_all").cast("double") / col("n_risk")))
          .otherwise(lit(0.0))).over(wPrior), lit(0.0))))
    val wCum = Window.partitionBy("cause").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.filter(col("cause") =!= 0)
      .join(risked.select(col("t"), col("n_risk"), col("s_minus")), "t")
      .withColumn("cif", sum(col("s_minus") *
        col("cnt").cast("double") / col("n_risk")).over(wCum))
      .select(col("t"), col("cause"), col("n_risk"),
        col("cnt").as("d"), col("cif"))
  }

  /** Nelson–Aalen cumulative-hazard estimator, optionally one curve per
    * group: H(t) = Σ_{s≤t} d_s/n_s with the standard variance estimate
    * Σ d_s/n_s² (Aalen 1978). The hazard view of the same right-censored
    * data [[kaplanMeier]] models as survival — H relates to S by
    * S ≈ exp(−H), and the increments d/n are the raw hazard rates a
    * proportional-hazards fit consumes.
    *
    * Execution shape is exactly [[kaplanMeier]]'s: ONE (group, duration)
    * aggregation to the curve frame, risk sets by the prior-rows window
    * identity, then ordered cumulative sums over per-group
    * distinct-duration frames (each partition is one curve — bounded by
    * the time grid, never the data; same caveat as KM for a single group
    * with a continuous clock at extreme scale).
    *
    * @param durationCol numeric time-to-event-or-censoring
    * @param eventCol    1 = event observed, 0 = right-censored
    * @return per (group,) distinct duration: (t, n_risk, d, c,
    *         cum_hazard, var_hazard); censored-only times step n_risk
    *         down and leave the hazard flat
    */
  def nelsonAalen(df: DataFrame, durationCol: String, eventCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val agg = df.groupBy((g :+ col(durationCol).as("t")): _*)
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("c"))
    val wAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrior = Window.partitionBy(g: _*).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(g: _*).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg
      .withColumn("n_risk", sum(col("d") + col("c")).over(wAll) -
        coalesce(sum(col("d") + col("c")).over(wPrior), lit(0L)))
      .withColumn("cum_hazard",
        sum(col("d").cast("double") / col("n_risk")).over(wRun))
      .withColumn("var_hazard",
        sum(col("d").cast("double") /
          (col("n_risk").cast("double") * col("n_risk"))).over(wRun))
  }

  /** Fitted exponential accelerated-failure-time model: log T = x'β + W
    * (W standard extreme value, scale fixed at 1). `coefs(0)` is the
    * intercept, on the LOG-TIME scale: positive β_j ⇒ covariate j
    * lengthens survival by the factor exp(β_j).
    */
  final case class AftExpModel(features: Seq[String],
      coefs: Array[Double], se: Array[Double], n: Long, events: Long) {
    /** Median survival time: exp(x'β)·ln 2 — a pure projection. */
    def predictMedianExpr: org.apache.spark.sql.Column = {
      val linear = features.tail.zipWithIndex
        .map { case (f, i) => col(f).cast("double") * lit(coefs(i + 1)) }
        .foldLeft(lit(coefs(0)): org.apache.spark.sql.Column)(_ + _)
      exp(linear) * lit(math.log(2.0))
    }
    def predictMedian(df: DataFrame,
        outputCol: String = "median_time"): DataFrame =
      df.withColumn(outputCol, predictMedianExpr)
  }

  /** Exponential accelerated-failure-time regression (parametric
    * survival — R `survreg(dist = "exponential")`): the PARAMETRIC
    * companion to the semi-parametric [[Cox]], completing the family
    * (KM / Nelson–Aalen / Aalen–Johansen / RMST / log-rank / Cox / AFT).
    *
    * Fit by the classic identity: the exponential-AFT censored
    * likelihood equals a POISSON GLM of the event indicator on the
    * covariates with offset log(duration) — so training IS the existing
    * fused-Gram IRLS ([[GLM.fit]]), one aggregation per iteration,
    * and the AFT coefficients are the NEGATED Poisson coefficients
    * (hazard up = time down). Standard errors carry over unchanged.
    *
    * Durations must be strictly positive (the offset is log t) — the fit
    * fails loudly otherwise rather than silently dropping rows.
    */
  def aftExponential(df: DataFrame, durationCol: String, eventCol: String,
      xCols: Seq[String]): AftExpModel = {
    require(xCols.nonEmpty, "need at least one covariate")
    val minDur = df.agg(min(col(durationCol).cast("double"))).head()
    require(!minDur.isNullAt(0) && minDur.getDouble(0) > 0.0,
      s"durations must be strictly positive (offset is log t); " +
        s"min = ${minDur.get(0)} — filter or shift zero durations upstream")
    val work = df.select((xCols.map(col) :+
      col(eventCol).cast("double").as("__ev") :+
      log(col(durationCol).cast("double")).as("__logt")): _*)
    val m = GLM.fit(work, xCols, "__ev", family = "poisson",
      offsetCol = Some("__logt"))
    val evRow = work.agg(count(lit(1)), sum("__ev")).head()
    AftExpModel("(Intercept)" +: xCols,
      m.coefs.toArray.map(-_), m.stdErr.toArray,
      evRow.getLong(0), evRow.getDouble(1).toLong)
  }

  /** Fitted Weibull AFT model: log T = x'γ + σW (W standard extreme
    * value) — R `survreg(dist = "weibull")`'s parametrization. `coefs`
    * are the AFT γ (log-time scale, intercept first); `scale` is σ =
    * 1/shape.
    */
  final case class AftWeibullModel(features: Seq[String],
      coefs: Array[Double], scale: Double, n: Long, events: Long) {
    def shape: Double = 1.0 / scale
    /** Median survival time exp(x'γ)·(ln 2)^σ — a pure projection. */
    def predictMedianExpr: org.apache.spark.sql.Column = {
      val linear = features.tail.zipWithIndex
        .map { case (f, i) => col(f).cast("double") * lit(coefs(i + 1)) }
        .foldLeft(lit(coefs(0)): org.apache.spark.sql.Column)(_ + _)
      exp(linear) * lit(math.pow(math.log(2.0), scale))
    }
    def predictMedian(df: DataFrame,
        outputCol: String = "median_time"): DataFrame =
      df.withColumn(outputCol, predictMedianExpr)
  }

  /** Weibull accelerated-failure-time regression — `survreg`'s DEFAULT
    * distribution, generalizing [[aftExponential]] with an estimated
    * shape k (AFT scale σ = 1/k): hazard λ(t) = k·t^{k−1}·e^{x'β},
    * so the cumulative-hazard term is exp(x'β + k·log t) — a Poisson
    * GLM of the event indicator with offset k·log t, the SAME identity
    * as the exponential case, just at the current shape.
    *
    * Alternation (the [[NegBin.fit]] θ discipline): each round runs the
    * warm-started fused-Gram Poisson IRLS at the current k, then
    * `newtonSteps` Newton updates of k — each ONE aggregation with
    * (β, k) as literals over exact per-row arithmetic:
    *   f(k)  = Σd·(1/k) + Σd·log t − Σ μ·log t,     μ = e^{x'β + k·log t}
    *   f'(k) = −Σd/k² − Σ μ·(log t)²
    * k is quantized to the 1e-8 grid after every step so the alternation
    * replays bit-exactly in any engine (a free-running float k would
    * drift by ulps across engines and diverge the subsequent refits).
    * AFT output: γ = −β/k, σ = 1/k. Stats are skipped on all but the
    * final refit (the ZeroInfl warm-start trick).
    */
  def aftWeibull(df: DataFrame, durationCol: String, eventCol: String,
      xCols: Seq[String], rounds: Int = 6,
      newtonSteps: Int = 2): AftWeibullModel = {
    // round 1's withColumn uses stable_lit BEFORE the first GLM.fit (which
    // registers) — analysis would throw on a plain session without this
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    require(xCols.nonEmpty, "need at least one covariate")
    require(rounds >= 1 && newtonSteps >= 1,
      s"need rounds >= 1 and newtonSteps >= 1, got $rounds/$newtonSteps")
    val minDur = df.agg(min(col(durationCol).cast("double"))).head()
    require(!minDur.isNullAt(0) && minDur.getDouble(0) > 0.0,
      s"durations must be strictly positive (the hazard term is t^k); " +
        s"min = ${minDur.get(0)} — filter or shift zero durations upstream")
    def quantize(x: Double): Double = math.rint(x * 1e8) / 1e8
    val work = df.select((xCols.map(col) :+
      col(eventCol).cast("double").as("__ev") :+
      log(col(durationCol).cast("double")).as("__lt")): _*).persist()
    try {
      var k = 1.0
      var betas: Option[breeze.linalg.DenseVector[Double]] = None
      var model: GLMModel = null
      for (r <- 1 to rounds) {
        val offs = work.withColumn("__off", col("__lt") * graft.functions.stableLit(k))
        model = GLM.fit(offs, xCols, "__ev", family = "poisson",
          offsetCol = Some("__off"), initCoefs = betas,
          computeStats = r == rounds)
        betas = Some(model.coefs)
        val b = model.coefs.toArray
        val eta = xCols.zipWithIndex
          .map { case (c, i) => col(c).cast("double") * graft.functions.stableLit(b(i + 1)) }
          .foldLeft(graft.functions.stableLit(b(0)): org.apache.spark.sql.Column)(_ + _)
        for (_ <- 1 to newtonSteps) {
          val mu = exp(eta + col("__lt") * graft.functions.stableLit(k))
          val row = work.agg(
            sum("__ev").as("d"),
            sum(col("__ev") * col("__lt")).as("dlt"),
            sum(mu * col("__lt")).as("mlt"),
            sum(mu * col("__lt") * col("__lt")).as("mlt2")).head()
          val (d, dlt, mlt, mlt2) = (row.getDouble(0), row.getDouble(1),
            row.getDouble(2), row.getDouble(3))
          val f = d / k + dlt - mlt
          val fp = -d / (k * k) - mlt2
          k = quantize(math.max(1e-4, if (fp < 0) k - f / fp else k))
        }
      }
      val evRow = work.agg(count(lit(1)), sum("__ev")).head()
      AftWeibullModel("(Intercept)" +: xCols,
        model.coefs.toArray.map(bi => -bi / k), 1.0 / k,
        evRow.getLong(0), evRow.getDouble(1).toLong)
    } finally { work.unpersist(blocking = false); () }
  }

  /** Per-segment exponential AFT — one independent parametric survival
    * model per key (the thousands-of-segments regime: per-cohort,
    * per-product, per-region time-to-event effects). Same Poisson-offset
    * identity as [[aftExponential]], fitted by the [[GroupedGLM]] grouped
    * IRLS: betas broadcast-joined per iteration, per-group solve inside
    * the aggregate finish, no driver state. AFT coefficients are the
    * negated per-group Poisson ones; SEs carry over.
    *
    * @return one row per group: keyCols ++ beta_intercept,
    *         beta_<feature>..., se_intercept, se_<feature>..., n_rows
    */
  def aftExponentialByGroup(df: DataFrame, keyCols: Seq[String],
      durationCol: String, eventCol: String,
      xCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(xCols.nonEmpty, "need at least one covariate")
    val minDur = df.agg(min(col(durationCol).cast("double"))).head()
    require(!minDur.isNullAt(0) && minDur.getDouble(0) > 0.0,
      s"durations must be strictly positive (offset is log t); " +
        s"min = ${minDur.get(0)} — filter or shift zero durations upstream")
    val work = df.select((keyCols.map(col) ++ xCols.map(col) :+
      col(eventCol).cast("double").as("__ev") :+
      log(col(durationCol).cast("double")).as("__logt")): _*)
    val fitted = GroupedGLM.fit(work, keyCols, xCols, "__ev",
      family = "poisson", offsetCol = Some("__logt"))
    fitted.select((keyCols.map(col) :+
      (-col("b_intercept")).as("beta_intercept")) ++
      xCols.map(c => (-col(s"b_$c")).as(s"beta_$c")) ++
      (col("se_intercept") +:
        xCols.map(c => col(s"se_$c"))) :+ col("n_rows"): _*)
  }
}

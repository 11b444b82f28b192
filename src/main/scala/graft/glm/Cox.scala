package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cox proportional-hazards regression (Cox 1972) with both standard
  * tie conventions — the time-to-event regression that closes the
  * survival family ([[Survival.kaplanMeier]] / [[Survival.nelsonAalen]]
  * describe, [[Survival.logRank]] tests, Cox explains with covariates).
  *
  * Partial log-likelihood (Breslow):
  *   ℓ(β) = Σ_t [ sβ_t − d_t · ln S0(t) ],
  * with per-distinct-time event count d_t, event covariate sum s_t,
  * risk-set sums S0(t) = Σ_{T_j ≥ t} w_j, S1(t) = Σ x_j w_j,
  * S2(t) = Σ x_j x_jᵀ w_j, w_j = exp(x_jᵀβ). Newton–Raphson on the
  * driver: U = Σ_t [s_t − d_t·S1/S0], H = Σ_t d_t·[S2/S0 − (S1/S0)(S1/S0)ᵀ].
  *
  * Efron ties (`ties = "efron"`, THE default here as in R `coxph` —
  * `"breslow"` remains the option): the d_t tied events at t each see the risk set
  * with the tied group progressively discounted. With event-only sums
  * E0/E1/E2 (same shape as S0/S1/S2 but over the rows failing AT t) and
  * S0ₗ = S0 − (l/d)·E0, l = 0..d−1:
  *   ℓ_t = sβ_t − Σ_l ln S0ₗ,  U_t = s_t − Σ_l (S1 − (l/d)E1)/S0ₗ,
  *   H_t = Σ_l [ (S2 − (l/d)E2)/S0ₗ − ((S1 − (l/d)E1)/S0ₗ)⊗² ].
  * The inner Σ_l runs as an `explode(sequence(0, d−1))` over the
  * EVENT-TIME frame — total fan-out = Σ d_t = n_events rows, keyed by
  * time, never a driver loop; untied times (d = 1) reduce to Breslow
  * exactly.
  *
  * Execution (the IRLS discipline, one cluster pass per iteration):
  *  1. w, x·w, x x·w terms are literal-β column expressions — codegen'd,
  *     recomputed each iteration on the persisted input;
  *  2. ONE groupBy(duration) collapses the data to the distinct-time
  *     frame (risk sets change only at distinct times);
  *  3. the suffix sums S0/S1/S2 run through the two-level
  *     [[graft.ops.Cumulative.runningSums]] pass ordered by −duration
  *     (no single-task window; p(p+3)/2+1 cumulated columns);
  *  4. ONE aggregation reduces the time frame to the p + p(p+1)/2 + 1
  *     Newton scalars (the Gram-pass contract: only O(p²) reaches the
  *     driver).
  *
  * Convergence: |Δℓ| < tol (the reference's deviance-change criterion,
  * GLM.scala:281 analog). Standard errors from the inverse of the final
  * observed information.
  */
object Cox {

  final case class CoxModel(features: Seq[String], beta: Array[Double],
      se: Array[Double], loglik: Double, nullLoglik: Double, nEvents: Long,
      n: Long, iter: Int) {

    /** Relative risk exp(xᵀβ) as a pure projection. */
    def predictRisk(df: DataFrame, outputCol: String = "risk"): DataFrame = {
      val eta = features.zip(beta).map { case (f, b) => col(f) * lit(b) }
        .reduce(_ + _)
      df.withColumn(outputCol, exp(eta))
    }
  }


  /** @param strataCol optional stratification column: each stratum keeps
    *                  its OWN baseline hazard (risk sets never cross
    *                  strata) while β is shared — the standard fix when
    *                  proportionality holds within but not across groups.
    *                  Stratified suffix sums run as stratum-partitioned
    *                  windows over per-stratum distinct-time frames (the
    *                  grouped-KM caveat class); the unstratified path
    *                  keeps the two-level global pass.
    * @param ties      `"efron"` (the DEFAULT, matching R `coxph` — an
    *                  R-ported model fits identically without touching
    *                  this knob) or `"breslow"` (the simpler convention
    *                  most textbooks derive; SAS `phreg`'s default).
    *                  Identical fits when no two events share a
    *                  duration.
    */
  def fit(df: DataFrame, durationCol: String, eventCol: String,
      features: Seq[String], tol: Double = 1e-8, maxIter: Int = 25,
      strataCol: Option[String] = None,
      ties: String = "efron"): CoxModel = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    require(features.nonEmpty, "need at least one covariate")
    require(ties == "breslow" || ties == "efron",
      s"ties must be 'breslow' or 'efron', got '$ties'")
    val efron = ties == "efron"
    val p = features.length
    // pack (j, k), j <= k, into the row-major upper-triangular flat index
    def triIdx(j: Int, k: Int): Int = j * (2 * p - j + 1) / 2 + (k - j)
    val x = features.map(f => col(f).cast("double"))
    val strat = strataCol.map(c => col(c).as("__st")).toSeq
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        x.map(_.isNotNull).reduce(_ && _))
      .select((strat ++ (col(durationCol).cast("double").as("__t") +:
        col(eventCol).cast("int").as("__e") +: x.zipWithIndex.map {
          case (c, i) => c.as(s"__x$i") })): _*)
      .persist()
    val timeKeys: Seq[org.apache.spark.sql.Column] =
      if (strataCol.isDefined) Seq(col("__st"), col("__t"))
      else Seq(col("__t"))
    // suffix sums over duration within each stratum: the two-level global
    // pass when unstratified; stratum-partitioned windows otherwise.
    // The range-bucket edges depend only on the distinct-time
    // distribution, which is LOOP-INVARIANT — computed once here instead
    // of one approxQuantile data pass per Newton iteration (r15)
    lazy val timeEdges = Some(graft.ops.Cumulative.bucketEdges(
      base.select((-col("__t")).as("__ord")).distinct(), "__ord"))
    def suffix(byT: DataFrame, cols: Seq[String]): DataFrame =
      if (strataCol.isEmpty)
        graft.ops.Cumulative.runningSums(
          byT.withColumn("__ord", -col("__t")), "__ord", cols,
          edges = timeEdges)
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__st").orderBy(col("__t").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        cols.foldLeft(byT) { (d, c) =>
          d.withColumn(s"${c}_cum", sum(c).over(w)) }
      }
    val counts = base.agg(count(lit(1)), sum(when(col("__e") === 1, 1L)
      .otherwise(0L))).head()
    val (n, nEvents) = (counts.getLong(0), counts.getLong(1))
    require(nEvents > 0, "no events observed")

    var beta = BDV.zeros[Double](p)
    var lastLl = Double.NegativeInfinity
    var ll = 0.0
    var iter = 0
    var converged = false
    var hess: BDM[Double] = null
    while (iter < maxIter && !converged) {
      val eta: Column = (0 until p).map(i =>
        col(s"__x$i") * graft.functions.stableLit(beta(i))).reduce(_ + _)
      val w = exp(eta)
      // per-distinct-time collapse: risk-set terms + event terms
      val aggExprs =
        Seq(sum(w).as("w0")) ++
        (0 until p).map(i => sum(col(s"__x$i") * w).as(s"w1_$i")) ++
        (for (j <- 0 until p; k <- j until p) yield
          sum(col(s"__x$j") * col(s"__x$k") * w).as(s"w2_${triIdx(j, k)}")) ++
        Seq(sum(when(col("__e") === 1, 1L).otherwise(0L)).as("d"),
          sum(when(col("__e") === 1, eta).otherwise(lit(0.0))).as("se_eta")) ++
        (0 until p).map(i => sum(when(col("__e") === 1, col(s"__x$i"))
          .otherwise(lit(0.0))).as(s"sx_$i")) ++
        // Efron needs the event-only w-sums at each time (the tied group
        // being discounted) — same groupBy, three more fused sums
        (if (!efron) Nil else
          Seq(sum(when(col("__e") === 1, w).otherwise(lit(0.0))).as("e0")) ++
          (0 until p).map(i => sum(when(col("__e") === 1,
            col(s"__x$i") * w).otherwise(lit(0.0))).as(s"e1_$i")) ++
          (for (j <- 0 until p; k <- j until p) yield
            sum(when(col("__e") === 1, col(s"__x$j") * col(s"__x$k") * w)
              .otherwise(lit(0.0))).as(s"e2_${triIdx(j, k)}")))
      // the distinct-time frame feeds the in-bucket window pass AND the
      // bucket-totals pass — persist it so the 14-sum groupBy runs once
      // per iteration, not once per consumer (r15)
      val byT = base.groupBy(timeKeys: _*)
        .agg(aggExprs.head, aggExprs.tail: _*)
        .persist()
      val cumCols = Seq("w0") ++ (0 until p).map(i => s"w1_$i") ++
        (0 until p * (p + 1) / 2).map(i => s"w2_$i")
      val cum = suffix(byT, cumCols)
      // ONE reduction to the Newton scalars; event-time rows only
      val s0 = col("w0_cum")
      val evt = cum.filter(col("d") > 0)
      val row = if (!efron) {
        val finalExprs =
          Seq(sum(col("se_eta") - col("d") * log(s0)).as("ll")) ++
          (0 until p).map(i => sum(col(s"sx_$i") -
            col("d") * col(s"w1_${i}_cum") / s0).as(s"u_$i")) ++
          (for (j <- 0 until p; k <- j until p) yield
            sum(col("d") * (col(s"w2_${triIdx(j, k)}_cum") / s0 -
              (col(s"w1_${j}_cum") / s0) * (col(s"w1_${k}_cum") / s0)))
              .as(s"h_${triIdx(j, k)}"))
        evt.agg(finalExprs.head, finalExprs.tail: _*).head()
      } else {
        // Σ_l over the tied group: explode l = 0..d−1 on the event-time
        // frame (fan-out Σ d_t = n_events, keyed by time); the per-time
        // constants se_eta/sx spread as /d so the l-sum restores them
        val evtL = evt.withColumn("__l",
          explode(sequence(lit(0L), col("d") - 1)))
        val dD = col("d").cast("double")
        val frac = col("__l").cast("double") / dD
        val s0l = s0 - frac * col("e0")
        def s1l(i: Int) = col(s"w1_${i}_cum") - frac * col(s"e1_$i")
        val finalExprs =
          Seq(sum(col("se_eta") / dD - log(s0l)).as("ll")) ++
          (0 until p).map(i => sum(col(s"sx_$i") / dD -
            s1l(i) / s0l).as(s"u_$i")) ++
          (for (j <- 0 until p; k <- j until p) yield
            sum((col(s"w2_${triIdx(j, k)}_cum") -
              frac * col(s"e2_${triIdx(j, k)}")) / s0l -
              (s1l(j) / s0l) * (s1l(k) / s0l)).as(s"h_${triIdx(j, k)}"))
        evtL.agg(finalExprs.head, finalExprs.tail: _*).head()
      }
      byT.unpersist(blocking = false)
      ll = row.getDouble(0)
      val u = BDV.tabulate(p)(i => row.getDouble(1 + i))
      val h = BDM.zeros[Double](p, p)
      for (j <- 0 until p; k <- j until p) {
        val v = row.getDouble(1 + p + triIdx(j, k))
        h(j, k) = v; h(k, j) = v
      }
      hess = h
      iter += 1
      if (math.abs(ll - lastLl) < tol) converged = true
      else {
        lastLl = ll
        beta = beta + LinAlg.solvePD(h, u)
      }
    }
    // null partial loglik: β = 0 ⇒ w = 1, S0 = n at risk (per stratum);
    // Efron: E0 = d, so S0ₗ = n_risk − l
    val byT0 = base.groupBy(timeKeys: _*)
      .agg(count(lit(1)).cast("double").as("w0"),
        sum(when(col("__e") === 1, 1L).otherwise(0L)).as("d"))
    val cum0 = suffix(byT0, Seq("w0"))
    val evt0 = cum0.filter(col("d") > 0)
    val ll0 =
      if (!efron)
        evt0.agg(sum(-col("d") * log(col("w0_cum")))).head().getDouble(0)
      else evt0
        .withColumn("__l", explode(sequence(lit(0L), col("d") - 1)))
        .agg(sum(-log(col("w0_cum") - col("__l").cast("double"))))
        .head().getDouble(0)
    base.unpersist(blocking = false)
    val se = LinAlg.invDiag(hess).toArray.map(math.sqrt)
    CoxModel(features, beta.toArray, se, ll, ll0, nEvents, n, iter)
  }
}

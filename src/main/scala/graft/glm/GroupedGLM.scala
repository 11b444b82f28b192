package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group GLM: one independent IRLS fit PER GROUP KEY — the
  * grouped-data extension of [[GLM]] (reference fits ONE model per call;
  * per-segment models are the at-scale workload this engine adds, same as
  * [[GroupedLM]] for OLS).
  *
  * Design (100 TB shape): coefficients live in a small (one row per group)
  * DataFrame, never on the driver. Each IRLS iteration broadcast-joins the
  * current betas onto the data, runs ONE grouped aggregation whose buffer
  * is the per-group weighted Gram (computed against that group's OWN
  * beta), and solves the p×p system per group inside the aggregate's
  * `finish` on whichever executor owns the group. Only a single scalar
  * (the count of still-unconverged groups) reaches the driver per
  * iteration. Convergence is PER GROUP: a converged group freezes and its
  * rows drop out of the join map-side, so slow groups don't force
  * whole-data passes for everyone. Shuffle traffic is one p²-sized buffer
  * per (partition, active group) — map-side partial aggregation, never
  * row data.
  *
  * Families: binomial-logit (canonical IRLS: w = μ(1−μ), z = η+(y−μ)/w;
  * reference: GLM.scala:190-204, 282-291), poisson-log (w = μ,
  * z = η+(y−μ)/μ), and gaussian-identity (one-step least squares). Groups
  * that are underdetermined or singular yield NaN coefficients, like
  * [[GroupedLM]].
  */
object GroupedGLM {

  private val Eps = 1e-10

  private val FamGaussian = 0
  private val FamBinomial = 1
  private val FamPoisson = 2
  private val FamGamma = 3

  // link codes: binomial takes logit/probit/cloglog, gamma takes log
  // (default, like the single GLM) or inverse (R's canonical); poisson and
  // gaussian use their canonical link only
  private val LnkLogit = 0
  private val LnkProbit = 1
  private val LnkCloglog = 2
  private val LnkLog = 3
  private val LnkInverse = 4

  // same commons-math Φ/Φ⁻¹ the single-model probit uses (Links.pnorm/
  // qnorm) — per-subset parity requires the identical implementation
  private val stdNormal =
    new org.apache.commons.math3.distribution.NormalDistribution(0.0, 1.0)

  /** Buffer: [n, dev, ll | XᵀWz (pp) | upper-tri XᵀWX]. Input rows are
    * `array(x_1..x_p, y, m, offset, weight, beta_0..beta_{pp-1})` — beta
    * rides on the row from the broadcast join, so the aggregation is a
    * single self-contained pass. m (binomial trials), offset (known η
    * shift) and weight (prior case weight) default to 1/0/1 literals when
    * the caller has none — a fixed row layout keeps ONE aggregator path.
    */
  /** `init = true` is the first IRLS pass: μ comes from the family's
    * μ-from-y start (reference: GLM.scala:263 "init μ = ȳ"-style; here
    * R's per-row inits), not from the (zero) incoming beta — log links
    * diverge from a flat start on large-scale responses.
    */
  private final class GlmGramAgg(p: Int, intercept: Boolean, fam: Int,
      lnk: Int, init: Boolean)
      extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val pp = if (intercept) p + 1 else p
    private val nUp = pp * (pp + 1) / 2

    def zero: Array[Double] = new Array[Double](3 + pp + nUp)

    // y·ln(y/μ) with the 0·ln0 = 0 convention (deviance terms)
    @inline private def ylog(y: Double, mu: Double): Double =
      if (y > 0) y * math.log(y / mu) else 0.0

    def reduce(b: Array[Double], in: Seq[Double]): Array[Double] = {
      val x = new Array[Double](pp)
      if (intercept) x(0) = 1.0
      var i = 0
      while (i < p) { x(if (intercept) i + 1 else i) = in(i); i += 1 }
      val y = in(p)
      val m = in(p + 1)
      val off = in(p + 2)
      val pw = in(p + 3)
      // η of the INCOMING beta (offset included); unused on the init pass
      var eta = off
      if (!init) {
        i = 0
        while (i < pp) { eta += x(i) * in(p + 4 + i); i += 1 }
      }
      // the normal equations regress the OFFSET-FREE working response
      // z − off on X, exactly like the single-model GLM (GLM.scala:217)
      var w = pw
      var z = y
      var dev = 0.0
      var ll = 0.0
      // the repo's ONE log-gamma (shared with the GLM column path)
      def lgamma(v: Double): Double = graft.functions.LogGamma.lgamma(v)
      fam match {
        case FamBinomial =>
          // y = successes in [0, m]; μ ∈ (0, m); the link (logit default,
          // probit, cloglog) decides η↔μ and dη/dμ, mirroring LinkFn
          val mu0 =
            if (init) m * (y + 0.5) / (m + 1.0)
            else lnk match {
              case LnkProbit => m * stdNormal.cumulativeProbability(eta)
              case LnkCloglog => m * (1.0 - math.exp(-math.exp(eta)))
              case _ => m / (1.0 + math.exp(-eta))
            }
          // clamp to [m·eps, m(1−eps)] like Family.BinomialFamily.clampMu
          val mu = math.max(m * Eps, math.min(m * (1.0 - Eps), mu0))
          val fr = mu / m
          if (init) {
            eta = (lnk match {
              case LnkProbit => stdNormal.inverseCumulativeProbability(fr)
              case LnkCloglog => math.log(-math.log1p(-fr))
              case _ => math.log(fr / (1.0 - fr))
            }) + off
          }
          val lp = lnk match { // dη/dμ, as in Links.scala
            case LnkProbit =>
              val q = stdNormal.inverseCumulativeProbability(fr)
              1.0 / (m * (math.exp(-0.5 * q * q) / math.sqrt(2.0 * math.Pi)))
            case LnkCloglog => 1.0 / ((mu - m) * math.log1p(-fr))
            case _ => m / (mu * (m - mu))
          }
          val vb = mu * (m - mu) / m // binomial variance V(μ)
          w = pw / (vb * lp * lp)
          z = eta + (y - mu) * lp - off
          // deviance/loglik of the INCOMING beta (lag the update by one
          // iteration, like the single GLM's lastGram convention)
          dev = pw * 2.0 * (ylog(y, mu) + ylog(m - y, m - mu))
          ll = pw * (lgamma(m + 1.0) - lgamma(y + 1.0) - lgamma(m - y + 1.0) +
            y * math.log(fr) + (m - y) * math.log1p(-fr))
        case FamPoisson =>
          val mu = if (init) y + 0.1 else math.max(Eps, math.exp(eta))
          if (init) eta = math.log(mu) + off
          w = pw * mu
          z = eta + (y - mu) / mu - off
          dev = pw * 2.0 * (ylog(y, mu) - (y - mu))
          ll = pw * (y * math.log(mu) - mu - lgamma(y + 1.0))
        case FamGamma =>
          // y must be > 0. log link: V = μ², l' = 1/μ → w = pw,
          // z = η + (y−μ)/μ. inverse (canonical) link: η = 1/μ,
          // l' = −1/μ² → w = pw·μ², z = η − (y−μ)/μ² (same expressions as
          // the single GLM's LinkFn("inverse"))
          val mu =
            if (init) math.max(y, Eps)
            else if (lnk == LnkInverse) 1.0 / math.max(Eps, eta)
            else math.max(Eps, math.exp(eta))
          if (lnk == LnkInverse) {
            if (init) eta = 1.0 / mu + off
            w = pw * mu * mu
            z = eta - (y - mu) / (mu * mu) - off
          } else {
            if (init) eta = math.log(mu) + off
            z = eta + (y - mu) / mu - off
          }
          dev = pw * 2.0 * (-math.log(y / mu) + (y - mu) / mu)
          ll = pw * (-math.log(mu) - y / mu) // unit shape, like GammaFamily
        case _ =>
          // gaussian identity: one-step weighted least squares on y − off.
          // The ll slot accumulates Σ ln(w): R's logLik.glm(gaussian)
          // profiles σ̂² = Σw(y−μ)²/n, giving ll = ½(Σ ln w − n(ln(2πσ̂²)+1))
          // — assembled in finish() from this slot, dev and n
          z = y - off
          dev = pw * (y - eta) * (y - eta)
          ll = math.log(pw)
      }
      b(0) += 1.0
      b(1) += dev
      b(2) += ll
      i = 0
      var k = 3 + pp
      while (i < pp) {
        val wxi = w * x(i)
        b(3 + i) += wxi * z
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

    /** [new beta (pp) | dev(old beta) | n | diag((XᵀWX)⁻¹) (pp) | ll(old
      * beta) | packed upper-tri (XᵀWX)⁻¹ (pp(pp+1)/2)] — NaN beta/diag/
      * kernel for groups whose normal equations are underdetermined or
      * singular. The inverse diagonal feeds per-group standard errors
      * (sqrt(dispersion · diag) at convergence, like the single GLM's
      * lastGram-based SEs); ll feeds loglik/AIC; the packed kernel feeds
      * per-row scoring standard errors ([[GroupedGLM.predictWithSe]]).
      */
    def finish(b: Array[Double]): Seq[Double] = finishBuf(fam, pp, b)

    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Per-group solve shared by the UDAF and the native-expression path:
    * buffer [n, dev, ll | XᵀWz (pp) | upper-tri XᵀWX] → the finish layout
    * documented on [[GlmGramAgg.finish]]. Runs once per GROUP (post-
    * aggregation), never per row.
    */
  private def finishBuf(fam: Int, pp: Int, b: Array[Double]): Seq[Double] = {
    val nUp = pp * (pp + 1) / 2
    val n = b(0)
    val out = new Array[Double](2 * pp + 3 + nUp)
    out(pp) = b(1)
    out(pp + 1) = n
    // gaussian: profile σ̂² = dev/n into the R-convention log-likelihood
    // (b(2) carries Σ ln w, zero when unweighted); others: Σ per-row ll
    out(2 * pp + 2) =
      if (fam == FamGaussian && n > 0)
        0.5 * (b(2) - n * (math.log(2.0 * math.Pi * b(1) / n) + 1.0))
      else b(2)
    if (n < pp || !java.lang.Double.isFinite(b(1))) {
      java.util.Arrays.fill(out, 0, pp, Double.NaN)
      java.util.Arrays.fill(out, pp + 2, 2 * pp + 2, Double.NaN)
      java.util.Arrays.fill(out, 2 * pp + 3, out.length, Double.NaN)
      return out.toSeq
    }
    val xtx = BDM.zeros[Double](pp, pp)
    var k = 3 + pp
    var i = 0
    while (i < pp) {
      var j = i
      while (j < pp) { xtx(i, j) = b(k); xtx(j, i) = b(k); k += 1; j += 1 }
      i += 1
    }
    val xtz = BDV.tabulate(pp)(i => b(3 + i))
    try {
      val beta = LinAlg.solvePD(xtx, xtz)
      val inv = LinAlg.invPD(xtx)
      i = 0
      while (i < pp) {
        out(i) = beta(i)
        out(pp + 2 + i) = inv(i, i)
        i += 1
      }
      k = 2 * pp + 3
      i = 0
      while (i < pp) {
        var j = i
        while (j < pp) { out(k) = inv(i, j); k += 1; j += 1 }
        i += 1
      }
    } catch {
      case _: Exception =>
        java.util.Arrays.fill(out, 0, pp, Double.NaN)
        java.util.Arrays.fill(out, pp + 2, 2 * pp + 2, Double.NaN)
        java.util.Arrays.fill(out, 2 * pp + 3, out.length, Double.NaN)
    }
    out.toSeq
  }

  /** Native (whole-stage-codegen) per-row Gram expressions for the
    * grouped IRLS pass — the r15 replacement for the per-row
    * [[GlmGramAgg]] UDAF on the hot data pass (guide §4: built-in
    * expressions over UDAF). Produces the SAME buffer layout
    * [n, dev, ll | XᵀWz (pp) | upper-tri XᵀWX] as the UDAF, term for
    * term in the same evaluation order, as plain `sum(...)` aggregates
    * with map-side partial aggregation; the per-GROUP solve stays in
    * [[finishBuf]] behind a post-aggregation UDF (one call per group,
    * never per row). None for the links whose μ↔η needs commons-math
    * Φ/Φ⁻¹ parity (probit, cloglog) or the gamma inverse link — those
    * keep the UDAF path.
    */
  private def nativeBufCols(p: Int, intercept: Boolean, fam: Int, lnk: Int,
      init: Boolean, cnt: Option[Column] = None): Option[Seq[Column]] = {
    val supported = (fam, lnk) match {
      case (FamBinomial, LnkLogit) => true
      case (FamPoisson, _) => true // poisson is always log link
      case (FamGamma, LnkLog) => true
      case (FamGaussian, _) => true // identity link only
      case _ => false
    }
    if (!supported) return None
    val pp = if (intercept) p + 1 else p
    val xy = col("xy")
    // x-vector element i (intercept first), mirroring GlmGramAgg.reduce
    def xE(i: Int): Column =
      if (intercept) { if (i == 0) lit(1.0) else element_at(xy, i) }
      else element_at(xy, i + 1)
    val y = element_at(xy, p + 1)
    val m = element_at(xy, p + 2)
    val off = element_at(xy, p + 3)
    val pw = element_at(xy, p + 4)
    def bE(i: Int): Column = element_at(col("beta"), i + 1)
    // η of the INCOMING beta (unused on the init pass)
    val etaIn = (0 until pp).foldLeft(off)((acc, i) => acc + xE(i) * bE(i))
    def lgamma(c: Column): Column = call_function("lgamma", c)
    def ylog(a: Column, b: Column): Column =
      when(a > 0, a * log(a / b)).otherwise(lit(0.0))
    // (w, z, dev, ll) per family — the exact column twins of the UDAF's
    // per-row arithmetic (same operation order)
    val (w, z, dev, ll) = fam match {
      case FamBinomial =>
        val mu0 =
          if (init) m * (y + lit(0.5)) / (m + lit(1.0))
          else m / (lit(1.0) + exp(-etaIn))
        val mu = greatest(m * lit(Eps), least(m * lit(1.0 - Eps), mu0))
        val fr = mu / m
        val eta =
          if (init) log(fr / (lit(1.0) - fr)) + off else etaIn
        val lp = m / (mu * (m - mu))
        val vb = mu * (m - mu) / m
        (pw / (vb * lp * lp),
          eta + (y - mu) * lp - off,
          pw * lit(2.0) * (ylog(y, mu) + ylog(m - y, m - mu)),
          pw * (lgamma(m + lit(1.0)) - lgamma(y + lit(1.0)) -
            lgamma(m - y + lit(1.0)) + y * log(fr) + (m - y) * log1p(-fr)))
      case FamPoisson =>
        val mu = if (init) y + lit(0.1) else greatest(lit(Eps), exp(etaIn))
        val eta = if (init) log(mu) + off else etaIn
        (pw * mu,
          eta + (y - mu) / mu - off,
          pw * lit(2.0) * (ylog(y, mu) - (y - mu)),
          pw * (y * log(mu) - mu - lgamma(y + lit(1.0))))
      case FamGamma =>
        val mu = if (init) greatest(y, lit(Eps)) else greatest(lit(Eps), exp(etaIn))
        val eta = if (init) log(mu) + off else etaIn
        (pw,
          eta + (y - mu) / mu - off,
          pw * lit(2.0) * (-log(y / mu) + (y - mu) / mu),
          pw * (-log(mu) - y / mu))
      case _ => // gaussian identity: one-step weighted least squares
        val eta = if (init) off else etaIn
        (pw, y - off, pw * (y - eta) * (y - eta), log(pw))
    }
    def wx(i: Int): Column = w * xE(i)
    // per-row terms, replication-count-weighted when the data side is
    // collapsed to (pattern, count) sufficient statistics
    def wc(c: Column): Column = cnt.map(c * _).getOrElse(c)
    Some(Seq(
      cnt.map(c => sum(c)).getOrElse(count(lit(1)).cast("double")),
      sum(wc(dev)), sum(wc(ll))) ++
      (0 until pp).map(i => sum(wc(wx(i) * z))) ++
      (for (i <- 0 until pp; j <- i until pp) yield sum(wc(wx(i) * xE(j)))))
  }

  /** Fit one GLM per group of `keyCols`.
    *
    * @param family "binomial" (logit link; `yCol` is successes in [0, m] —
    *               0/1 without `mCol`), "poisson" (log link; `yCol` is a
    *               count), "gamma" (log link; `yCol` must be > 0), or
    *               "gaussian" (identity link)
    * @param mCol      binomial trials column (binomial only; defaults to 1)
    * @param offsetCol known-offset column added to η (defaults to 0) —
    *                  same semantics as the single-model GLM.fit
    * @param weightCol prior case-weight column (defaults to 1): scales the
    *                  IRLS weights and the deviance contributions
    * @param nullDeviance also fit the intercept-only null model per group
    *        (one extra grouped IRLS, broadcast-joined back) and append a
    *        `null_deviance` column — the denominator of the per-group
    *        pseudo-R² (1 − deviance/null_deviance) used to screen thousands
    *        of segment models
    * @param kernel append a `kernel` column with the packed upper-tri
    *        (XᵀWX)⁻¹ at convergence (p(p+1)/2 doubles per group) — the
    *        input [[predictWithSe]] needs. Off by default so existing
    *        consumers see an unchanged schema.
    * @return one row per group: keyCols ++ coefficient columns
    *         (`b_intercept` first when intercept, then `b_<feature>`),
    *         matching `se_intercept`/`se_<feature>` standard errors
    *         (sqrt(dispersion · diag((XᵀWX)⁻¹)) at convergence), deviance,
    *         n_rows, n_iter (the PER-GROUP iteration count — the pass this
    *         group's deviance stabilized at; groups converge and freeze
    *         independently), loglik, aic = −2·loglik + 2k (k = p, plus the
    *         profiled σ̂² for gaussian — loglik/aic follow R's logLik.glm/
    *         AIC.glm conventions exactly, gaussian included) (+
    *         null_deviance when requested). NaN coefficients/SEs mark
    *         underdetermined/singular groups.
    */
  def fit(
      df: DataFrame,
      keyCols: Seq[String],
      xCols: Seq[String],
      yCol: String,
      family: String = "binomial",
      linkName: String = "",
      intercept: Boolean = true,
      mCol: Option[String] = None,
      offsetCol: Option[String] = None,
      weightCol: Option[String] = None,
      maxIter: Int = 25,
      tol: Double = 1e-10,
      checkpointDir: Option[String] = None,
      nullDeviance: Boolean = false,
      kernel: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && xCols.nonEmpty && maxIter >= 1)
    val fam = family match {
      case "binomial" => FamBinomial
      case "poisson" => FamPoisson
      case "gamma" => FamGamma
      case "gaussian" => FamGaussian
      case other => throw new IllegalArgumentException(
        s"GroupedGLM supports binomial|poisson|gamma|gaussian, got $other")
    }
    require(mCol.isEmpty || fam == FamBinomial,
      "mCol (binomial trials) only applies to the binomial family")
    val lnk = (fam, linkName.toLowerCase) match {
      case (FamBinomial, "" | "canonical" | "logit") => LnkLogit
      case (FamBinomial, "probit") => LnkProbit
      case (FamBinomial, "cloglog") => LnkCloglog
      case (FamGamma, "" | "log") => LnkLog // default log, like the single GLM
      case (FamGamma, "canonical" | "inverse") => LnkInverse
      case (FamPoisson, "" | "canonical" | "log") => LnkLog
      case (FamGaussian, "" | "canonical" | "identity") => LnkLogit // unused
      case (_, other) => throw new IllegalArgumentException(
        s"unsupported link '$other' for family $family (binomial: " +
          "logit|probit|cloglog; gamma: log|inverse; poisson: log; " +
          "gaussian: identity)")
    }
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val p = xCols.size
    val pp = if (intercept) p + 1 else p
    val agg = udaf(new GlmGramAgg(p, intercept, fam, lnk, init = false))
    val aggInit = udaf(new GlmGramAgg(p, intercept, fam, lnk, init = true))
    // per-GROUP solve for the native-expression path (post-aggregation;
    // the data pass itself is pure codegen'd sums)
    val finishUdf = udf((b: Seq[Double]) => finishBuf(fam, pp, b.toArray))
    // same durability contract as Dedup.connectedComponents: reliable
    // checkpoint() when a dir is configured (long fits on a real cluster
    // must survive executor loss), localCheckpoint as local-mode default.
    // Checkpointer frees each superseded generation as soon as the next
    // one is materialized — files/blocks stay O(betas), not O(iterations).
    val cp = new graft.Checkpointer(df.sparkSession, checkpointDir)
    val keys = keyCols.map(col)
    val assembled0 = df.select(keys :+
      array(xCols.map(c => col(c).cast("double")) ++ Seq(
        col(yCol).cast("double"),
        mCol.map(c => col(c).cast("double")).getOrElse(lit(1.0)),
        offsetCol.map(c => col(c).cast("double")).getOrElse(lit(0.0)),
        weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))): _*)
        .as("xy"): _*)
    // Sufficient-stats collapse of the DATA side (see [[SuffStats]]):
    // on a discrete design every per-group IRLS pass — at any scale —
    // aggregates over (key, pattern) rows with the count as a
    // replication weight. Only taken on the native-expression path (the
    // UDAF cannot replicate rows).
    val nativeOk = nativeBufCols(p, intercept, fam, lnk, init = false).isDefined
    val collapsed =
      if (nativeOk) SuffStats.collapse(assembled0, "__cnt") else None
    val cntOpt = collapsed.map(_ => col("__cnt"))
    val assembled = collapsed.map(_.view).getOrElse(assembled0.persist())

    // Per-group state frame (one row per group, riding the generation
    // chain): beta, previous deviance, last stats, a `frozen` convergence
    // flag and the iteration the group last computed at. Convergence is
    // PER GROUP — a group whose relative deviance change drops under `tol`
    // freezes: its rows stop flowing into the broadcast join (inner join
    // against the ACTIVE betas drops them map-side) and its Gram is never
    // recomputed, so one slow group no longer forces whole-data iterations
    // for the millions-of-groups regime. Frozen rows pass through each
    // generation unchanged (the state is one row per group — copying it is
    // free next to the data pass it saves).
    // The zero betas are placeholders — iteration 0 runs the init
    // aggregator, which derives η from y per family and ignores them.
    val nUp = pp * (pp + 1) / 2
    var state = cp(assembled.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .select(keys ++ Seq(
        array(Seq.fill(pp)(lit(0.0)): _*).as("beta"),
        lit(Double.MaxValue).as("dev"),
        lit(0L).as("n"),
        array(Seq.fill(pp)(lit(Double.NaN)): _*).as("vdiag"),
        lit(0.0).as("ll"),
        array(Seq.fill(nUp)(lit(Double.NaN)): _*).as("kernel"),
        lit(false).as("frozen"),
        lit(0).as("n_iter")): _*))
    var iter = 0
    var remaining = 1L
    while (iter < maxIter && remaining > 0) {
      val active = state.filter(!col("frozen"))
      // ONE broadcast per iteration: the previous deviance rides along
      // with the betas (r15 — the r14 shape re-joined a second broadcast
      // of `active` post-aggregation just to fetch it) and passes through
      // the group aggregation as first(), so assessment needs no join
      val joined = assembled.join(
        broadcast(active.select(keys ++ Seq(col("beta"),
          col("dev").as("__prev")): _*)), keyCols)
      // hot data pass: native codegen'd sums when the family/link is
      // expressible (the bench families), the UDAF otherwise
      val stepRaw = nativeBufCols(p, intercept, fam, lnk, init = iter == 0,
          cnt = cntOpt) match {
        case Some(cols) =>
          val named = (cols :+ (first(col("__prev")): Column)).zipWithIndex
            .map { case (c, i) => c.as(s"__c$i") }
          joined.groupBy(keys: _*)
            .agg(named.head, named.tail: _*)
            .select(keys ++ Seq(finishUdf(
              array(cols.indices.map(i => col(s"__c$i")): _*)).as("buf"),
              col(s"__c${cols.size}").as("__prev")): _*)
        case None =>
          joined.groupBy(keys: _*)
            .agg((if (iter == 0) aggInit else agg)(
              concat(col("xy"), col("beta"))).as("buf"),
              first(col("__prev")).as("__prev"))
      }
      val step = stepRaw
        .select(keys ++ Seq(
          slice(col("buf"), 1, pp).as("beta"),
          element_at(col("buf"), pp + 1).as("dev"),
          element_at(col("buf"), pp + 2).cast("long").as("n"),
          slice(col("buf"), pp + 3, pp).as("vdiag"),
          element_at(col("buf"), 2 * pp + 3).as("ll"),
          slice(col("buf"), 2 * pp + 4, nUp).as("kernel"),
          col("__prev")): _*)
      // assess each recomputed group against ITS OWN previous deviance;
      // singular (NaN-beta) groups freeze immediately — they can never
      // converge and must not keep forcing data passes
      val assessed = step
        .withColumn("frozen", isnan(element_at(col("beta"), 1)) ||
          abs(col("__prev") - col("dev")) / (abs(col("dev")) + 0.1) < lit(tol))
        .withColumn("n_iter", lit(iter + 1))
        .drop("__prev")
      state = cp(state.filter(col("frozen"))
        .unionByName(assessed.select(state.columns.map(col): _*)))
      // one scalar to the driver per iteration: how many groups still move
      remaining = state.filter(!col("frozen")).count()
      iter += 1
    }
    assembled.unpersist(blocking = false)
    collapsed.foreach(_.unpersist())
    cp.close() // the final generation backs the state frame and stays alive
    val lastFit = state

    val names = (if (intercept) Seq("b_intercept") else Nil) ++ xCols.map("b_" + _)
    // dispersion for the SEs: fixed 1 for binomial/poisson; the
    // deviance-based estimate dev/(n−p) for gaussian (= RSS/(n−p), exactly
    // WLS sigma²) and gamma (R's summary.glm uses the Pearson moment
    // estimator instead, so gamma SEs differ slightly from R's)
    val disp = fam match {
      case FamGaussian | FamGamma => col("dev") / (col("n") - lit(pp)).cast("double")
      case _ => lit(1.0)
    }
    val fitOut = lastFit.select(keys ++
      names.zipWithIndex.map { case (nm, i) => element_at(col("beta"), i + 1).as(nm) } ++
      names.zipWithIndex.map { case (nm, i) =>
        sqrt(element_at(col("vdiag"), i + 1) * disp).as("se_" + nm.stripPrefix("b_")) } ++
      Seq(col("dev").as("deviance"), col("n").as("n_rows"),
        col("n_iter"), col("ll").as("loglik"),
        // gaussian AIC counts the profiled σ̂² as a parameter (R AIC.glm)
        (col("ll") * -2.0 +
          lit(2.0 * (if (fam == FamGaussian) pp + 1 else pp))).as("aic")) ++
      // packed upper-tri (XᵀWX)⁻¹ per group, for predictWithSe
      (if (kernel) Seq(col("kernel")) else Nil): _*)
    if (!nullDeviance) fitOut
    else {
      // intercept-only null model by pure reuse: a constant feature with
      // intercept=false is exactly the per-group null fit; its converged
      // deviance broadcast-joins back (one row per group)
      val nd = fit(df.withColumn("__one", lit(1.0)), keyCols, Seq("__one"), yCol,
        family = family, linkName = linkName, intercept = false, mCol = mCol,
        offsetCol = offsetCol, weightCol = weightCol, maxIter = maxIter,
        tol = tol, checkpointDir = checkpointDir)
        .select(keys :+ col("deviance").as("null_deviance"): _*)
      fitOut.join(broadcast(nd), keyCols)
    }
  }

  /** R-formula front-end for grouped fits, mirroring [[GLM.fitFormula]]:
    * resolve the formula against the non-key columns, dummy-encode string
    * feature terms with GLOBAL k−1 lexicographic levels (one pass over the
    * whole frame — every group gets the SAME encoded columns, so the
    * per-group models stay comparable even when a group is missing a
    * level), drop NA rows, then [[fit]]. Interaction terms (`x1:x2`,
    * `x1*x2`) expand per [[ModelMatrix.termColumns]] — against the same
    * global levels, so interactions with string terms stay comparable
    * across groups too.
    */
  def fitFormula(df: DataFrame, keyCols: Seq[String], formula: String,
      family: String = "binomial", linkName: String = "",
      mCol: Option[String] = None, offsetCol: Option[String] = None,
      weightCol: Option[String] = None,
      maxIter: Int = 25, tol: Double = 1e-10,
      checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val special = keyCols.toSet ++ mCol ++ offsetCol ++ weightCol
    val f0 = Formula.parse(formula)
      .resolve(df.columns.toSeq.filterNot(special.contains))
    val extras = Seq(mCol, offsetCol, weightCol).flatten.distinct
    val base = f0.baseColumns
    val sel = ModelMatrix.naDrop(df.select(
      (keyCols ++ (f0.response +: base) ++ extras).distinct.map(col): _*))
    val stringCols = base.filter(c => sel.schema(c).dataType == StringType)
    val lv = ModelMatrix.levels(sel, stringCols)
    val feats = ModelMatrix.termColumns(f0.terms, lv)
    val encoded = sel.select(
      keyCols.map(col) ++ Seq(col(f0.response)) ++ feats.map(_._2) ++
        extras.map(col): _*)
    fit(encoded, keyCols, feats.map(_._1), f0.response, family = family,
      linkName = linkName, intercept = f0.intercept, mCol = mCol,
      offsetCol = offsetCol, weightCol = weightCol, maxIter = maxIter,
      tol = tol, checkpointDir = checkpointDir)
  }

  /** Score `df` with a per-group coefficient frame produced by [[fit]]
    * (also works on [[GroupedLM.fit]] output with `family = "gaussian"`):
    * broadcast-join the betas on the group key and evaluate
    * μ = link⁻¹(Σ bᵢ·xᵢ + offset) as a pure column expression — no UDF,
    * no driver state, scoring pipelines with the scan at any scale. The
    * betas frame is one row per group (small by construction) and is
    * broadcast; rows of groups absent from `betas` (or with NaN
    * coefficients) score NaN, marking them unscorable rather than silently
    * dropping them.
    */
  def predict(betas: DataFrame, df: DataFrame, keyCols: Seq[String],
      xCols: Seq[String], family: String = "binomial",
      linkName: String = "", intercept: Boolean = true,
      mCol: Option[String] = None, offsetCol: Option[String] = None,
      outputCol: String = "prediction"): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val coefCols = (if (intercept) Seq("b_intercept") else Nil) ++ xCols.map("b_" + _)
    val slim = betas.select((keyCols ++ coefCols).map(col): _*)
    val joined = df.join(broadcast(slim), keyCols, "left")
    val terms = xCols.map(c => col("b_" + c) * col(c).cast("double"))
    val eta0 = terms.foldLeft(
      if (intercept) col("b_intercept") else lit(0.0))(_ + _)
    val eta = offsetCol.map(c => eta0 + col(c).cast("double")).getOrElse(eta0)
    val m = mCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    // μ = link⁻¹(η): the same LinkFn expressions the single GLM scores with
    // (binomial μ is expected successes — the probability when m = 1)
    val resolved = if (linkName.nonEmpty) linkName else family match {
      case "binomial" => "logit"
      case "poisson" | "gamma" => "log"
      case "gaussian" => "identity"
      case other => throw new IllegalArgumentException(
        s"GroupedGLM supports binomial|poisson|gamma|gaussian, got $other")
    }
    val mu = LinkFn(resolved).inverse(eta, m)
    // absent group -> null coefficients -> null eta; surface as NaN
    joined.withColumn(outputCol, coalesce(mu, lit(Double.NaN)))
      .drop(coefCols: _*)
  }

  /** Score with per-row DELTA-METHOD standard errors from a per-group fit
    * — [[GLMModel.predictWithSe]] for grouped models, the same shape as
    * [[GroupedLM.predictWithSe]]: the `fit(..., kernel = true)` frame is
    * broadcast-joined on the group key, and prediction + se_fit are column
    * expressions over the joined coefficients and packed per-group
    * (XᵀWX)⁻¹ — no UDF, no driver state, any number of groups. On the link
    * scale se_η = sqrt(disp_g · x₀ᵀK_g x₀) with disp_g = 1 for binomial/
    * poisson and the per-group deviance estimate dev/(n−p) for gaussian/
    * gamma (the same dispersion the fit's `se_*` columns use); on the
    * response scale se_μ = se_η · |dμ/dη|. `prediction` is always μ, like
    * [[predict]]. Rows of groups absent from `betas` score NaN.
    */
  def predictWithSe(betas: DataFrame, df: DataFrame, keyCols: Seq[String],
      xCols: Seq[String], family: String = "binomial",
      linkName: String = "", intercept: Boolean = true,
      mCol: Option[String] = None, offsetCol: Option[String] = None,
      scale: String = "link"): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    require(Seq("link", "response").contains(scale),
      s"scale must be link|response, got $scale")
    require(betas.columns.contains("kernel"),
      "betas frame has no `kernel` column — fit with kernel = true")
    val p = xCols.size
    val pp = if (intercept) p + 1 else p
    val coefCols = (if (intercept) Seq("b_intercept") else Nil) ++ xCols.map("b_" + _)
    val dispG = family match {
      case "gaussian" | "gamma" =>
        col("deviance") / (col("n_rows") - lit(pp)).cast("double")
      case _ => lit(1.0)
    }
    val slim = betas.select(keyCols.map(col) ++ coefCols.map(col) ++ Seq(
      col("kernel").as("__kernel"), dispG.as("__disp")): _*)
    val joined = df.join(broadcast(slim), keyCols, "left")
    val xs: Seq[Column] = (if (intercept) Seq(lit(1.0)) else Nil) ++
      xCols.map(c => col(c).cast("double"))
    val eta0 = coefCols.map(col).zip(xs).map { case (b, x) => b * x }.reduce(_ + _)
    val eta = offsetCol.map(c => eta0 + col(c).cast("double")).getOrElse(eta0)
    val m = mCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val resolved = if (linkName.nonEmpty) linkName else family match {
      case "binomial" => "logit"
      case "poisson" | "gamma" => "log"
      case "gaussian" => "identity"
      case other => throw new IllegalArgumentException(
        s"GroupedGLM supports binomial|poisson|gamma|gaussian, got $other")
    }
    val link = LinkFn(resolved)
    val mu = link.inverse(eta, m)
    // x₀ᵀK x₀ from the packed upper-tri kernel (same indexing as
    // GroupedLM.predictWithSe) — element_at chains stay in codegen
    def kAt(i: Int, j: Int): Column =
      element_at(col("__kernel"), i * pp - i * (i - 1) / 2 + (j - i) + 1)
    var quad: Column = lit(0.0)
    for (i <- 0 until pp; j <- i until pp)
      quad = quad + (if (i == j) kAt(i, i) * xs(i) * xs(i)
                     else kAt(i, j) * xs(i) * xs(j) * 2.0)
    val seLink = sqrt(col("__disp") * quad)
    val se = if (scale == "link") seLink else seLink / abs(link.lprime(mu, m))
    joined.withColumn("prediction", coalesce(mu, lit(Double.NaN)))
      .withColumn("se_fit", coalesce(se, lit(Double.NaN)))
      .drop(coefCols :+ "__kernel" :+ "__disp": _*)
  }

  /** Per-row residuals against each row's OWN group model — the grouped
    * twin of [[GLMModel.residuals]] (response / pearson / deviance /
    * working, R `residuals.glm` formulas), built on the same
    * broadcast-join scoring path as [[predict]]: one codegen'd projection,
    * no driver state. Rows of groups absent from `betas` get NaN.
    */
  def residuals(betas: DataFrame, df: DataFrame, keyCols: Seq[String],
      xCols: Seq[String], yCol: String, rtype: String = "deviance",
      family: String = "binomial", linkName: String = "",
      intercept: Boolean = true, mCol: Option[String] = None,
      offsetCol: Option[String] = None,
      outputCol: String = "residual"): DataFrame = {
    require(Seq("response", "pearson", "deviance", "working").contains(rtype),
      s"rtype must be response|pearson|deviance|working, got $rtype")
    val scored = predict(betas, df, keyCols, xCols, family, linkName,
      intercept, mCol, offsetCol, outputCol = "__mu")
    val fam = Family(family)
    val resolved = if (linkName.nonEmpty) linkName else family match {
      case "binomial" => "logit"
      case "poisson" | "gamma" => "log"
      case "gaussian" => "identity"
      case other => throw new IllegalArgumentException(
        s"GroupedGLM supports binomial|poisson|gamma|gaussian, got $other")
    }
    val m = mCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val mu = col("__mu")
    val y = col(yCol).cast("double")
    val raw = y - mu
    val resid = rtype match {
      case "response" => raw
      case "pearson"  => raw / sqrt(fam.variance(mu, m))
      case "deviance" => signum(raw) * sqrt(greatest(fam.deviance(y, mu, m), lit(0.0)))
      case "working"  => raw * LinkFn(resolved).lprime(mu, m)
    }
    scored.withColumn(outputCol, coalesce(resid, lit(Double.NaN))).drop("__mu")
  }
}

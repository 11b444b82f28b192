package graft.glm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exponential-family definitions for the IRLS fitter: variance function,
  * unit deviance, log-likelihood, starting values and mean clamping, each
  * as codegen-friendly column expressions.
  *
  * The reference implements binomial only (its family dispatch is vacuous —
  * reference: GLM.scala:95-99,486-490); Poisson is an extension the same
  * IRLS machinery supports with just these five expressions swapped.
  */
sealed trait Family extends Serializable {
  def name: String
  def defaultLink: String
  def variance(mu: Column, m: Column): Column
  def deviance(y: Column, mu: Column, m: Column): Column
  def logLik(y: Column, mu: Column, m: Column): Column
  def initMu(y: Column, m: Column): Column
  def clampMu(mu: Column, m: Column): Column
}

object Family {
  private val TweedieRe = """tweedie\((\d+(?:\.\d+)?)\)""".r
  private val NegBinRe = """(?:negbin|negative-binomial)\((\d+(?:\.\d+)?)\)""".r

  def apply(name: String): Family = name.toLowerCase match {
    case "binomial"                      => BinomialFamily
    case "poisson"                       => PoissonFamily
    case "gaussian"                      => GaussianFamily
    case "gamma"                         => GammaFamily
    case "inverse-gaussian" | "inverse.gaussian" => InverseGaussianFamily
    case "quasipoisson"                  => QuasiPoissonFamily
    case "quasibinomial"                 => QuasiBinomialFamily
    case "tweedie"                       => TweedieFamily(1.5)
    case TweedieRe(p)                    => TweedieFamily(p.toDouble)
    case NegBinRe(th)                    => NegBinFamily(th.toDouble)
    case other => throw new IllegalArgumentException(
      s"unknown family: $other (binomial | poisson | gaussian | gamma | " +
        "inverse-gaussian | quasipoisson | quasibinomial | tweedie(p) | " +
        "negbin(theta))")
  }

  private val eps = 1e-10

  case object BinomialFamily extends Family {
    val name = "binomial"
    val defaultLink = "logit"
    def variance(mu: Column, m: Column): Column = mu * (lit(1.0) - mu / m)
    def deviance(y: Column, mu: Column, m: Column): Column =
      (y * log(greatest(y, lit(1.0)) / mu) +
        (m - y) * log(greatest(m - y, lit(1.0)) / (m - mu))) * 2.0
    def logLik(y: Column, mu: Column, m: Column): Column =
      GLM.logChoose(m, y) + y * log(mu / m) + (m - y) * log(lit(1.0) - mu / m)
    def initMu(y: Column, m: Column): Column = m * (y + 0.5) / (m + 1.0)
    def clampMu(mu: Column, m: Column): Column =
      greatest(least(mu, m * (1.0 - eps)), m * eps)
  }

  case object PoissonFamily extends Family {
    val name = "poisson"
    val defaultLink = "log"
    def variance(mu: Column, m: Column): Column = mu
    // 2·Σ[y·ln(y/μ) − (y−μ)], with the y = 0 term's y·ln(y/μ) → 0
    def deviance(y: Column, mu: Column, m: Column): Column =
      (when(y > 0, y * log(y / mu)).otherwise(lit(0.0)) - (y - mu)) * 2.0
    // y·ln μ − μ − ln y!
    def logLik(y: Column, mu: Column, m: Column): Column =
      y * log(mu) - mu - GLM.logFactorial(y)
    def initMu(y: Column, m: Column): Column = y + 0.1
    // lower bound keeps log/1/μ finite; upper bound keeps exp(η) from
    // overflowing during early IRLS steps on extreme starts
    def clampMu(mu: Column, m: Column): Column =
      greatest(least(mu, lit(1e15)), lit(eps))
  }

  /** Gaussian with identity link: V(μ) = 1, deviance = RSS, so IRLS reduces
    * to one unweighted least-squares solve — GLM(gaussian) ≡ LM.fit (tested
    * as a property). The `logLik` COLUMN here is the per-row unit-dispersion
    * term (−½(ln 2π + (y−μ)²)); the fitters do not sum it — GLM.fit and
    * GroupedGLM profile σ̂² = RSS/n R-style (logLik.glm) from the converged
    * deviance instead, so reported loglik/AIC match R's exactly.
    */
  case object GaussianFamily extends Family {
    val name = "gaussian"
    val defaultLink = "identity"
    def variance(mu: Column, m: Column): Column = lit(1.0)
    def deviance(y: Column, mu: Column, m: Column): Column = (y - mu) * (y - mu)
    def logLik(y: Column, mu: Column, m: Column): Column =
      ((y - mu) * (y - mu) + math.log(2.0 * math.Pi)) * -0.5
    def initMu(y: Column, m: Column): Column = y
    def clampMu(mu: Column, m: Column): Column = mu
  }

  /** Gamma with log link (default here — the canonical inverse link is also
    * available and neither needs clamping tricks under log). Requires y > 0.
    * 2·Σ[−ln(y/μ) + (y−μ)/μ]; logLik at unit shape (exponential): −ln μ − y/μ.
    */
  case object GammaFamily extends Family {
    val name = "gamma"
    val defaultLink = "log"
    def variance(mu: Column, m: Column): Column = mu * mu
    def deviance(y: Column, mu: Column, m: Column): Column =
      (lit(0.0) - log(y / mu) + (y - mu) / mu) * 2.0
    def logLik(y: Column, mu: Column, m: Column): Column =
      lit(0.0) - log(mu) - y / mu
    def initMu(y: Column, m: Column): Column = y
    def clampMu(mu: Column, m: Column): Column = greatest(mu, lit(eps))
  }

  /** Inverse-gaussian: V(μ) = μ³, unit deviance (y−μ)²/(μ²y), canonical
    * link 1/μ². Requires y > 0. The `logLik` COLUMN is only the per-row
    * −(3/2)·ln y data term; GLM.fit assembles R's profiled-dispersion
    * log-likelihood −½[Σw·(ln(2π·D/Σw)+1) + 3·Σ(w·ln y)] from it (the
    * exact inverse of R's aic.invgauss, with the dispersion counted as a
    * parameter in the AIC like gaussian's σ²).
    */
  case object InverseGaussianFamily extends Family {
    val name = "inverse-gaussian"
    val defaultLink = "inverse-square"
    def variance(mu: Column, m: Column): Column = mu * mu * mu
    def deviance(y: Column, mu: Column, m: Column): Column =
      (y - mu) * (y - mu) / (mu * mu * y)
    def logLik(y: Column, mu: Column, m: Column): Column = log(y) * -1.5
    def initMu(y: Column, m: Column): Column = y
    def clampMu(mu: Column, m: Column): Column = greatest(mu, lit(eps))
  }

  /** Quasi-likelihood twins: identical estimating equations (same β̂ as the
    * parent family — same IRLS expressions verbatim), but the dispersion is
    * ESTIMATED (Pearson/df) instead of fixed at 1, so R reports scaled
    * standard errors and `NA` log-likelihood/AIC. GLM.fit keys the NaN
    * loglik and the predictWithSe dispersion factor off the name.
    */
  case object QuasiPoissonFamily extends Family {
    val name = "quasipoisson"
    val defaultLink = PoissonFamily.defaultLink
    def variance(mu: Column, m: Column): Column = PoissonFamily.variance(mu, m)
    def deviance(y: Column, mu: Column, m: Column): Column = PoissonFamily.deviance(y, mu, m)
    def logLik(y: Column, mu: Column, m: Column): Column = lit(Double.NaN)
    def initMu(y: Column, m: Column): Column = PoissonFamily.initMu(y, m)
    def clampMu(mu: Column, m: Column): Column = PoissonFamily.clampMu(mu, m)
  }

  case object QuasiBinomialFamily extends Family {
    val name = "quasibinomial"
    val defaultLink = BinomialFamily.defaultLink
    def variance(mu: Column, m: Column): Column = BinomialFamily.variance(mu, m)
    def deviance(y: Column, mu: Column, m: Column): Column = BinomialFamily.deviance(y, mu, m)
    def logLik(y: Column, mu: Column, m: Column): Column = lit(Double.NaN)
    def initMu(y: Column, m: Column): Column = BinomialFamily.initMu(y, m)
    def clampMu(mu: Column, m: Column): Column = BinomialFamily.clampMu(mu, m)
  }

  /** Tweedie with variance power p ∈ (1, 2) (compound Poisson-gamma: y ≥ 0
    * with positive mass at zero — the insurance/claims-cost family). Unit
    * deviance 2[y²⁻ᵖ/((1−p)(2−p)) − y·μ¹⁻ᵖ/(1−p) + μ²⁻ᵖ/(2−p)] (each term
    * well-defined at y = 0 for p < 2). The log-likelihood is an infinite
    * series with no closed form (R needs `tweedie::dtweedie`), so loglik/
    * AIC are NaN and the dispersion is Pearson-estimated, quasi-style —
    * exactly how R's `statmod::tweedie` family behaves inside `glm`.
    */
  final case class TweedieFamily(power: Double) extends Family {
    require(power > 1.0 && power < 2.0,
      s"tweedie variance power must be in (1, 2), got $power")
    val name = s"tweedie($power)"
    val defaultLink = "log"
    def variance(mu: Column, m: Column): Column = pow(mu, power)
    def deviance(y: Column, mu: Column, m: Column): Column =
      (pow(y, 2.0 - power) / ((1.0 - power) * (2.0 - power))
        - y * pow(mu, 1.0 - power) / (1.0 - power)
        + pow(mu, 2.0 - power) / (2.0 - power)) * 2.0
    def logLik(y: Column, mu: Column, m: Column): Column = lit(Double.NaN)
    def initMu(y: Column, m: Column): Column = greatest(y, lit(0.1))
    def clampMu(mu: Column, m: Column): Column =
      greatest(least(mu, lit(1e15)), lit(eps))
  }

  /** Negative binomial with FIXED shape θ (R's `MASS::negative.binomial
    * (theta)` family — `glm.nb`'s inner loop at a given θ): V(μ) = μ + μ²/θ,
    * log link default. Unit deviance 2[y·ln(y/μ) − (y+θ)·ln((y+θ)/(μ+θ))];
    * log-likelihood ln Γ(y+θ) − ln Γ(θ) − ln Γ(y+1) + y·ln(μ/(μ+θ)) +
    * θ·ln(θ/(μ+θ)) (the θ-profiling outer loop of glm.nb is out of scope —
    * pass the θ you want).
    */
  final case class NegBinFamily(theta: Double) extends Family {
    require(theta > 0, s"negbin theta must be > 0, got $theta")
    val name = s"negbin($theta)"
    val defaultLink = "log"
    def variance(mu: Column, m: Column): Column = mu + mu * mu / theta
    def deviance(y: Column, mu: Column, m: Column): Column =
      (when(y > 0, y * log(y / mu)).otherwise(lit(0.0)) -
        (y + theta) * log((y + theta) / (mu + theta))) * 2.0
    def logLik(y: Column, mu: Column, m: Column): Column =
      GLM.logGammaRatio(y, lit(theta)) - GLM.logFactorial(y) +
        y * log(mu / (mu + theta)) + lit(theta) * log(lit(theta) / (mu + theta))
    def initMu(y: Column, m: Column): Column = y + 0.1
    def clampMu(mu: Column, m: Column): Column =
      greatest(least(mu, lit(1e15)), lit(eps))
  }
}

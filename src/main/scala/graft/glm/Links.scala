package graft.glm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binomial link functions as *column-expression builders*, so each IRLS
  * quantity is a single codegen'd projection instead of the reference's
  * Breeze matrix passes (reference: GLM.scala:190-251).
  *
  * Each link provides, for mean μ and binomial denominator m:
  *   link(μ)      = η                           (reference: e.g. GLM.scala:190-194)
  *   inverse(η)   = μ                           (reference: GLM.scala:200-204)
  *   lprime(μ)    = dη/dμ                       (reference: GLM.scala:195-199)
  *
  * Logit and cloglog are pure `log`/`exp` SQL expressions (whole-stage
  * codegen). Probit needs Φ and Φ⁻¹, which have no SQL builtin — those
  * compose the native codegen'd [[graft.functions.Erfc]]/
  * [[graft.functions.ErfInv]] expressions (bit-identical to the
  * commons-math3 NormalDistribution the former scalar UDFs called;
  * reference uses the same Gaussian icdf approach, GLM.scala:207-234);
  * the Gaussian pdf φ IS expressible natively.
  */
sealed trait LinkFn extends Serializable {
  def name: String
  def link(mu: Column, m: Column): Column
  def inverse(eta: Column, m: Column): Column
  def lprime(mu: Column, m: Column): Column
}

object LinkFn {

  def apply(name: String): LinkFn = name.toLowerCase match {
    case "logit"    => Logit
    case "probit"   => Probit
    case "cloglog"  => Cloglog
    case "log"      => Log
    case "identity" => Identity
    case "inverse"  => Inverse
    case "sqrt"     => Sqrt
    case "inverse-square" | "1/mu^2" => InverseSquare
    case other      => throw new IllegalArgumentException(s"unknown link: $other")
  }

  private val Sqrt2 = math.sqrt(2.0)

  /** Φ (standard normal CDF) as a native column expression — replicates
    * commons-math3 `NormalDistribution(0,1).cumulativeProbability`
    * bit-for-bit on every REAL input (the 40σ cutoff, then
    * `0.5 · erfc(−x/√2)` through the same static `Erf.erfc` the
    * distribution object calls), so this rewrite of the former scalar
    * UDF changes no fitted value. NaN needs an explicit guard: Spark's
    * NaN ordering makes `abs(NaN) > 40` TRUE and `NaN < 0` FALSE, so
    * without it the cutoff branch would map NaN to 1.0 where
    * `cumulativeProbability(NaN)` returns NaN — and a silently-finite
    * probit μ would hide a diverged η. Requires the graft function
    * registry ([[graft.plans.GraftExtensions.ensureRegistered]]) —
    * every GLM fit/score entry point registers it.
    */
  def pnorm(x: Column): Column =
    when(isnan(x), lit(Double.NaN))
      .when(abs(x) > 40.0, when(x < 0.0, lit(0.0)).otherwise(lit(1.0)))
      .otherwise(lit(0.5) * call_function("erfc", negate(x) / Sqrt2))

  /** Φ⁻¹ (standard normal quantile) as a native column expression —
    * commons-math3 `inverseCumulativeProbability` is exactly
    * `√2 · erfInv(2p − 1)`; same static call, bit-identical. Out-of-range
    * p yields NaN (the UDF threw); probit's μ/m ∈ (0,1) never hits it.
    */
  def qnorm(x: Column): Column =
    lit(Sqrt2) * call_function("erfinv", x * 2.0 - 1.0)

  /** φ (standard normal pdf) — native expression, codegen'd. */
  def dnorm(x: Column): Column = exp(x * x * -0.5) / math.sqrt(2.0 * math.Pi)

  /** Φ via the Zelen–Severo rational approximation (Abramowitz & Stegun
    * 26.2.17, |ε| < 7.5e-8) as a pure column expression. NOT used by the fit
    * path (which uses the exact native Φ expression above); it exists so a
    * probit-shaped deviance is expressible in plain SQL on BOTH engines of
    * the oracle gate — the identical literal arithmetic evaluates
    * bit-identically in Spark and DuckDB, which no pair of independent
    * erf/Φ library implementations guarantees.
    */
  def pnormApprox(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * ax)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) + t * (lit(1.781477937) +
      t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val phi = exp(ax * ax * lit(-0.5)) * lit(0.3989422804014327)
    val upper = lit(1.0) - phi * poly
    when(x >= 0, upper).otherwise(lit(1.0) - upper)
  }

  case object Logit extends LinkFn {
    val name = "logit"
    def link(mu: Column, m: Column): Column = log(mu / (m - mu))
    def inverse(eta: Column, m: Column): Column = m / (exp(-eta) + 1.0)
    def lprime(mu: Column, m: Column): Column = m / (mu * (m - mu))
  }

  case object Probit extends LinkFn {
    val name = "probit"
    def link(mu: Column, m: Column): Column = qnorm(mu / m)
    def inverse(eta: Column, m: Column): Column = m * pnorm(eta)
    def lprime(mu: Column, m: Column): Column = lit(1.0) / (m * dnorm(qnorm(mu / m)))
  }

  /** log link (canonical for Poisson); m is ignored. */
  case object Log extends LinkFn {
    val name = "log"
    def link(mu: Column, m: Column): Column = log(mu)
    def inverse(eta: Column, m: Column): Column = exp(eta)
    def lprime(mu: Column, m: Column): Column = lit(1.0) / mu
  }

  /** identity link (canonical for gaussian); m is ignored. */
  case object Identity extends LinkFn {
    val name = "identity"
    def link(mu: Column, m: Column): Column = mu
    def inverse(eta: Column, m: Column): Column = eta
    def lprime(mu: Column, m: Column): Column = lit(1.0)
  }

  /** inverse link 1/μ (canonical for gamma); m is ignored. */
  case object Inverse extends LinkFn {
    val name = "inverse"
    def link(mu: Column, m: Column): Column = lit(1.0) / mu
    def inverse(eta: Column, m: Column): Column = lit(1.0) / eta
    def lprime(mu: Column, m: Column): Column = lit(-1.0) / (mu * mu)
  }

  /** sqrt link η = √μ (R's poisson variance-stabilizing option); m ignored. */
  case object Sqrt extends LinkFn {
    val name = "sqrt"
    def link(mu: Column, m: Column): Column = sqrt(mu)
    def inverse(eta: Column, m: Column): Column = eta * eta
    def lprime(mu: Column, m: Column): Column = lit(0.5) / sqrt(mu)
  }

  /** inverse-square link η = 1/μ² (canonical for inverse-gaussian; R's
    * `1/mu^2`); m ignored. The inverse floors η at 1e-12: a working-
    * response step can transiently drive η ≤ 0 on extreme rows, where
    * 1/√η would poison the next Gram with NaN (same role as the family
    * mean clamps — invisible at convergence, where η > 0 by construction).
    */
  case object InverseSquare extends LinkFn {
    val name = "inverse-square"
    def link(mu: Column, m: Column): Column = lit(1.0) / (mu * mu)
    def inverse(eta: Column, m: Column): Column =
      lit(1.0) / sqrt(greatest(eta, lit(1e-12)))
    def lprime(mu: Column, m: Column): Column = lit(-2.0) / (mu * mu * mu)
  }

  case object Cloglog extends LinkFn {
    val name = "cloglog"
    def link(mu: Column, m: Column): Column = log(-log(lit(1.0) - mu / m))
    def inverse(eta: Column, m: Column): Column = m * (lit(1.0) - exp(-exp(eta)))
    def lprime(mu: Column, m: Column): Column = lit(1.0) / ((mu - m) * log(lit(1.0) - mu / m))
  }
}

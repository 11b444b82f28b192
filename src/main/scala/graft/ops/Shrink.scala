package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical-Bayes shrinkage estimators — the "don't trust small-n
  * rates" readout every per-key metric report needs: a key with 1/1
  * successes is not a 100% performer, it is the prior plus one
  * observation.
  */
object Shrink {

  /** Beta-binomial empirical-Bayes rate shrinkage (the classic shrunk
    * CTR/conversion estimate): collapse events to per-key (successes x,
    * trials n), fit a Beta(α, β) prior to the per-key RATES by method
    * of moments, and report each key's posterior mean
    * (x + α)/(n + α + β).
    *
    * Determinism discipline: per-key rates MICRO-quantize
    * (r = x·10⁶ div n, exact integer division) before the moment sums,
    * so the rate mean and the squared sum are exact integers
    * (Decimal(38,0) for the squares) on any partitioning; α, β and the
    * posterior are pinned float expressions over those integers. The
    * moment fit treats keys equally (the standard quick MoM on rates,
    * not the n-weighted likelihood fit — documented choice).
    *
    * Degenerate priors — fewer than 2 keys, zero rate variance, or a
    * method-of-moments concentration ≤ 0 (variance at least the
    * Bernoulli maximum) — yield NULL α/β and a NULL shrunk rate rather
    * than a silently unshrunk one.
    *
    * Scale shape: ONE key collapse (the only data-sized shuffle), one
    * one-row moment reduce, one broadcast cross join back.
    *
    * @param successCol boolean-like (true/1 = success)
    * @return per key: (keyCol, n, x, rate, alpha, beta, shrunk_rate) —
    *         rate/alpha/beta/shrunk on the 6-digit grid
    */
  def betaBinomial(df: DataFrame, keyCol: String,
      successCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val y = col(successCol).cast("boolean")
    val byKey = df
      .filter(col(keyCol).isNotNull && y.isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(y, 1L).otherwise(0L)).as("x"))
      .withColumn("__r", expr("(x * 1000000L) div n"))
    val moments = byKey.agg(
      count(lit(1)).as("__k"),
      sum("__r").as("__sr"),
      sum((col("__r").cast(dec) * col("__r").cast(dec))).as("__sr2"))
    // every division sits inside a guard branch: ANSI mode throws
    // DIVIDE_BY_ZERO even for doubles, so the degenerate cases (one
    // key, zero variance) must never evaluate the ratio at all
    val kD = col("__k").cast("double")
    val mu = col("__sr").cast("double") / kD / 1e6
    val v = when(col("__k") >= 2,
      (col("__sr2").cast("double") -
        col("__sr").cast("double") * col("__sr").cast("double") / kD) /
        (kD - 1.0) / 1e12)
    val m = when(v > 0.0, mu * (lit(1.0) - mu) / v - lit(1.0))
    val alpha = when(m > 0.0, mu * m)
    val beta = when(m > 0.0, (lit(1.0) - mu) * m)
    byKey.crossJoin(broadcast(moments))
      .select(col(keyCol), col("n"), col("x"),
        round(col("__r").cast("double") / 1e6, 6).as("rate"),
        round(alpha, 6).as("alpha"),
        round(beta, 6).as("beta"),
        round((col("x").cast("double") + alpha) /
          (col("n").cast("double") + alpha + beta), 6).as("shrunk_rate"))
  }
}

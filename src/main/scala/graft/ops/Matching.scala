package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Propensity-score matching (with replacement) — the causal-inference
  * step that pairs each treated unit with its nearest control on a
  * score, so outcome differences over the matched frame estimate the
  * ATT (Rosenbaum & Rubin 1983).
  *
  * Scale stance: matching is STRATIFIED — the caller supplies strata
  * columns (calendar buckets, coarse score quantiles, region…) and the
  * nearest-control search runs per stratum via [[AsofJoin.nearestJoin]]
  * (one keyed shuffle + per-key sort, no global sort, no pairwise
  * blow-up). Unstratified global matching would funnel every row
  * through one ordered partition — the exact pattern this engine's plan
  * sweep rejects; at 100 TB you stratify (standard practice anyway:
  * exact-match on coarse covariates, nearest on the score within).
  *
  * Matching is WITH replacement (a control can serve several treated
  * units) — the deterministic, embarrassingly-parallel variant; ties in
  * distance break to the lower score (earlier in score order).
  */
object Matching {

  /** @param caliper  optional max |score difference|; treated units with
    *                 no control inside it stay unmatched (null control)
    * @return one row per treated unit: strataCols…, treated id/score,
    *         `control_<idCol>`, `control_score`, `score_diff`
    *         (control − treated, null when unmatched)
    */
  def psMatch(df: DataFrame, strataCols: Seq[String], treatCol: String,
      scoreCol: String, idCol: String,
      caliper: Option[Double] = None): DataFrame = {
    require(strataCols.nonEmpty,
      "matching must be stratified — pass at least one stratum column " +
        "(coarse score quantiles work when nothing natural exists)")
    val treated = df.filter(col(treatCol).cast("int") === 1)
      .select((strataCols.map(col) :+ col(idCol) :+
        col(scoreCol).cast("double").as("__score")): _*)
    // nearestJoin needs the right side unique per (strata, score):
    // controls sharing a score are interchangeable except for identity —
    // keep the minimum id (deterministic, partition-invariant)
    val controls = df.filter(col(treatCol).cast("int") === 0)
      .groupBy((strataCols.map(col) :+
        col(scoreCol).cast("double").as("control_score")): _*)
      .agg(min(col(idCol)).as(s"control_$idCol"))
    AsofJoin.nearestJoin(treated, controls, strataCols,
        "__score", "control_score",
        Seq(s"control_$idCol", "control_score"), caliper)
      .withColumnRenamed("__score", "score")
      .withColumnRenamed("nearest_dist", "score_diff")
  }

  /** Inverse-propensity-weighted ATE (Horvitz–Thompson weights 1/e and
    * 1/(1−e) with Hájek normalization — the normalization makes the
    * estimate identical to the stabilized-weight form, since the
    * stabilizing constants cancel) — [[psMatch]]'s estimator
    * sibling: instead of pairing units it reweights them so the treated
    * and control groups both look like the full population, and the
    * weighted outcome difference estimates the AVERAGE TREATMENT EFFECT.
    *
    * Propensities are the saturated nonparametric fit over the strata
    * cells: e(s) = share treated in cell s — exactly the MLE a logistic
    * regression on the cell dummies would produce, with no iteration and
    * an exact closed replay. Cells where e ∈ {0, 1} (positivity
    * violations: nobody/everybody treated) cannot be reweighted; their
    * rows are excluded and counted.
    *
    * Scale shape: ONE cell aggregation (≤ distinct-strata rows,
    * broadcast back) + ONE weighted aggregate — no iteration, no window,
    * no driver state.
    *
    * @return one row: (n_used, n_treated, n_control, ate_ipw,
    *         mean_treated, mean_control, n_excluded) — means are the
    *         Hájek-normalized weighted means; ate_ipw their difference
    */
  def ipwAte(df: DataFrame, strataCols: Seq[String], treatCol: String,
      outcomeCol: String): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    val base = df.select((strataCols.map(col) :+
        col(treatCol).cast("int").as("__t") :+
        col(outcomeCol).cast("double").as("__y")): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    val cells = base.groupBy(strataCols.map(col): _*)
      .agg((sum("__t").cast("double") / count(lit(1))).as("__e"))
    val w = base.join(broadcast(cells), strataCols)
      .filter(col("__e") > 0.0 && col("__e") < 1.0)
      .withColumn("__w", when(col("__t") === 1, lit(1.0) / col("__e"))
        .otherwise(lit(1.0) / (lit(1.0) - col("__e"))))
    val excluded = base.join(broadcast(cells), strataCols)
      .filter(col("__e") === 0.0 || col("__e") === 1.0)
      .agg(count(lit(1)).as("n_excluded"))
    w.agg(
        count(lit(1)).as("n_used"),
        sum(col("__t")).cast("long").as("n_treated"),
        sum(lit(1) - col("__t")).cast("long").as("n_control"),
        (sum(when(col("__t") === 1, col("__w") * col("__y"))
            .otherwise(lit(0.0))) /
          sum(when(col("__t") === 1, col("__w")).otherwise(lit(0.0))))
          .as("mean_treated"),
        (sum(when(col("__t") === 0, col("__w") * col("__y"))
            .otherwise(lit(0.0))) /
          sum(when(col("__t") === 0, col("__w")).otherwise(lit(0.0))))
          .as("mean_control"))
      .withColumn("ate_ipw", col("mean_treated") - col("mean_control"))
      .crossJoin(broadcast(excluded))
      .select("n_used", "n_treated", "n_control", "ate_ipw",
        "mean_treated", "mean_control", "n_excluded")
  }

  /** Doubly-robust AIPW ATE (augmented inverse-propensity weighting,
    * Robins/Rotnitzky/Zhao 1994 — the modern default ATE estimator):
    * combines a saturated propensity model on `psCols` with a saturated
    * outcome model on `omCols`; consistent if EITHER stratification
    * captures the confounding (the two covariate sets are deliberately
    * independent arguments — with identical sets AIPW degenerates to the
    * stratified estimator and the robustness is vacuous).
    *
    *   ψ_i = m₁(x) − m₀(x) + t·(y − m₁)/e − (1−t)·(y − m₀)/(1−e)
    *   ATE = mean ψ
    *
    * Execution: TWO cell collapses (propensity shares on psCols; per-arm
    * outcome means on omCols) broadcast back, ONE scoring scan, ONE
    * mean. Rows in positivity-violating propensity cells (e ∈ {0, 1})
    * or in outcome cells missing an arm are excluded and counted — the
    * [[ipwAte]] convention.
    *
    * @return one row: (n_used, n_excluded, ate_aipw, mean_psi_treated —
    *         diagnostic arm means of ψ's correction terms omitted)
    */
  def aipwAte(df: DataFrame, psCols: Seq[String], omCols: Seq[String],
      treatCol: String, outcomeCol: String): DataFrame = {
    require(psCols.nonEmpty && omCols.nonEmpty,
      "need at least one propensity and one outcome stratum column")
    val base = df.select(((psCols ++ omCols).distinct.map(col) :+
        col(treatCol).cast("int").as("__t") :+
        col(outcomeCol).cast("double").as("__y")): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    val ps = base.groupBy(psCols.map(col): _*)
      .agg((sum("__t").cast("double") / count(lit(1))).as("__e"))
    val om = base.groupBy(omCols.map(col): _*)
      .agg(
        (sum(when(col("__t") === 1, col("__y"))) /
          sum(when(col("__t") === 1, 1.0))).as("__m1"),
        (sum(when(col("__t") === 0, col("__y"))) /
          sum(when(col("__t") === 0, 1.0))).as("__m0"))
    val joined = base
      .join(broadcast(ps), psCols)
      .join(broadcast(om), omCols)
    val ok = col("__e") > 0.0 && col("__e") < 1.0 &&
      col("__m1").isNotNull && col("__m0").isNotNull
    val psi = (col("__m1") - col("__m0")) +
      (col("__t").cast("double") * (col("__y") - col("__m1")) /
        col("__e")) -
      ((lit(1.0) - col("__t").cast("double")) *
        (col("__y") - col("__m0")) / (lit(1.0) - col("__e")))
    joined.agg(
      sum(when(ok, 1L).otherwise(0L)).as("n_used"),
      sum(when(ok, 0L).otherwise(1L)).as("n_excluded"),
      (sum(when(ok, psi)) / sum(when(ok, 1.0))).as("ate_aipw"))
  }
}

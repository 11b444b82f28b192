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
}

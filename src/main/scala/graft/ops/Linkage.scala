package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage: Fellegi–Sunter (1969) match scoring over
  * a blocked candidate-pair frame (the step after [[FuzzyJoin]]-style
  * blocking — turn per-field agreements into one calibrated match score).
  *
  * For each comparison field f with match probability m_f (P(agree |
  * same entity) — supplied by the caller, it is domain knowledge) and
  * chance-agreement probability u_f (P(agree | different entities) —
  * estimated from the candidate pairs themselves, which are
  * overwhelmingly non-matches in any realistic blocking), the evidence
  * weight is log2(m_f/u_f) on agreement and log2((1−m_f)/(1−u_f)) on
  * disagreement; the pair score is the sum over fields — the classic
  * log-likelihood-ratio form.
  *
  * u_f uses the 0.5-adjusted share (Σa + ½)/(n + 1) (the WOE/q180
  * smoothing), so all-agree and none-agree fields stay finite.
  *
  * Execution: ONE aggregation over the pair frame produces the k
  * per-field u values (a one-row broadcast); the score is then a pure
  * codegen'd projection — no further shuffle, nothing driver-side but
  * the k-sized u row.
  */
object Linkage {

  /** @param agreementCols boolean/0-1 columns, one per compared field
    * @param m             per-field match probabilities, aligned with
    *                      `agreementCols`, each in (0, 1)
    * @return input plus `fs_score` (4-digit grid)
    */
  def fellegiSunter(pairs: DataFrame, agreementCols: Seq[String],
      m: Seq[Double]): DataFrame = {
    require(agreementCols.nonEmpty, "need at least one agreement column")
    require(m.length == agreementCols.length,
      s"m has ${m.length} entries for ${agreementCols.length} fields")
    require(m.forall(v => v > 0 && v < 1), s"m values must be in (0, 1): $m")
    val uRow = pairs.agg(
      count(lit(1)).as("__n"),
      agreementCols.map(c =>
        sum(col(c).cast("int")).as(s"__a_$c")): _*)
    val withU = pairs.crossJoin(broadcast(uRow))
    val log2 = math.log(2.0)
    val terms = agreementCols.zip(m).map { case (c, mf) =>
      val u = (col(s"__a_$c").cast("double") + 0.5) /
        (col("__n").cast("double") + 1.0)
      when(col(c).cast("boolean"),
        log(lit(mf) / u) / log2).otherwise(
        log(lit(1.0 - mf) / (lit(1.0) - u)) / log2)
    }
    withU
      .withColumn("fs_score", round(terms.reduce(_ + _), 4))
      .drop(col("__n"))
      .drop(agreementCols.map(c => s"__a_$c"): _*)
  }
}

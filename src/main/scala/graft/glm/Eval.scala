package graft.glm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation at scale: ROC AUC and calibration, the two
  * numbers a scoring pipeline reports after every fit.
  *
  * Both reduce the data in ONE distributed aggregation (by distinct score
  * or by score bin) before any ordered arithmetic; the ordered pass itself
  * is the two-level [[graft.ops.Cumulative]] prefix sum, so even
  * continuous scores (distinct frame ~n rows) never funnel into a single
  * task. Counts stay integral until a final division, so the results are
  * exact and cross-engine reproducible.
  */
object Eval {

  /** ROC AUC by the tie-aware Mann–Whitney identity: with per-distinct-
    * score positive/negative counts (p_s, n_s) taken in increasing score
    * order, AUC = Σ_s p_s · (N_below(s) + n_s/2) / (P · N) — each
    * positive beats the negatives scored below it and half the negatives
    * tied with it.
    *
    * One groupBy(score) shuffle reduces the data; the cumulative pass runs
    * over the distinct-score frame. Doubling avoids fractional halves:
    * the numerator is Σ p_s · (2·N_below + n_s) — integral, exact — and
    * one division by 2PN at the end produces the float.
    *
    * @return a single row (auc, n_pos, n_neg)
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("n"))
    // two-level cumulative (graft.ops.Cumulative): continuous scores leave
    // the distinct frame ~n rows, so the prefix pass must stay parallel —
    // N_below = inclusive running sum minus the row's own count
    graft.ops.Cumulative.runningSums(byScore, "s", Seq("n"))
      .withColumn("nb", col("n_cum") - col("n"))
      .agg(sum(col("p") * (lit(2) * col("nb") + col("n"))).as("num2"),
        sum("p").as("n_pos"), sum("n").as("n_neg"))
      .select(
        (col("num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Reliability curve over fixed-width score bins on [lo, hi): bin i
    * covers [lo + i·w, lo + (i+1)·w), scores at/above hi clamp into the
    * last bin so the range is a closed cover. ONE aggregation; the mean
    * score and positive fraction divide integral/exact sums once.
    *
    * @return (bin, n, mean_score, frac_pos) for non-empty bins
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins >= 1 && hi > lo, "need nBins >= 1 and hi > lo")
    val w = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col(scoreCol) - lo) / w).cast("int"), lit(0)), lit(nBins - 1))
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        (sum(col(scoreCol)) / count(lit(1))).as("mean_score"),
        (sum(when(col(labelCol) === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("frac_pos"))
  }

  /** [[calibration]] for UNBOUNDED / unknown-range scores: bin edges are
    * the approximate score quantiles (GK sketch via `approxQuantile` — one
    * extra distributed pass, nBins−1 doubles to the driver), so every bin
    * holds ≈ n/nBins rows whatever the distribution. Bin i is the count of
    * edges ≤ score — a literal comparison ladder, fully codegen'd; the
    * aggregation pass is identical to [[calibration]].
    *
    * @return (bin, n, mean_score, frac_pos) for non-empty bins
    */
  def calibrationQuantile(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int, relativeError: Double = 1e-3): DataFrame = {
    require(nBins >= 1, "need nBins >= 1")
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val edges = df.stat.approxQuantile(scoreCol, probs, relativeError)
      .distinct.sorted
    val bin = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col(scoreCol) > e, 1).otherwise(0)
    }
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        (sum(col(scoreCol)) / count(lit(1))).as("mean_score"),
        (sum(when(col(labelCol) === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("frac_pos"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier scoring: median / MAD (median absolute
  * deviation), the standard robust alternative to mean/σ z-scores — one
  * wild value cannot drag the threshold the way it drags a standard
  * deviation.
  *
  * Uses EXACT medians (Spark's sort-based `percentile`), which buffer a
  * group's values during aggregation — the same deliberate trade as the
  * q33 exact-percentile gate; for billion-row groups swap in
  * `percentile_approx` (the q58 pattern) at the two call sites. The
  * per-group medians frame is tiny and broadcast back, so the data is
  * scanned three times but never reshuffled by anything except the group
  * key.
  */
object Outliers {

  /** Per-group robust outlier summary.
    *
    * score(x) = |x − median| / (1.4826 · MAD); rows with score > `k` are
    * outliers (1.4826 makes MAD consistent for the normal distribution).
    * Groups with MAD = 0 (over half the values identical) report outliers
    * as the count of values different from the median, matching the
    * score → ∞ limit.
    *
    * @return (group, n, median, mad, n_outliers)
    */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("median"))
    val dev = df.join(broadcast(med), keyCol)
      .withColumn("__adev", abs(col(valCol) - col("median")))
    val mad = dev.groupBy(col(keyCol))
      .agg(first("median").as("median"), expr("percentile(__adev, 0.5)").as("mad"))
    dev.drop("median").join(broadcast(mad), keyCol)
      .withColumn("__thr", lit(k) * lit(1.4826) * col("mad"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        first("median").as("median"),
        first("mad").as("mad"),
        sum(when((col("mad") > 0 && col("__adev") > col("__thr")) ||
          (col("mad") === 0 && col("__adev") > 0), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}

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

  /** Multivariate outlier scoring: squared Mahalanobis distance
    * d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) against the columns' own sample
    * covariance — the joint-distribution outlier test (a row can be
    * unremarkable per column yet far off the correlation ridge; d² is
    * what sees it). Under normality d² ~ χ²(k), so flag at the χ²
    * quantile of choice downstream.
    *
    * Execution is the Gram discipline: ONE fused aggregation collects
    * n + k means + k(k+1)/2 second moments (a (k²+k)-double driver row),
    * the k×k inverse is driver math, and the scoring pass is
    * [[graft.glm.LinAlg.quadFormExpr]] — literal-kernel multiply-adds
    * inside whole-stage codegen, no join, no second shuffle.
    *
    * @return input rows plus `outputCol` = d² (sample covariance,
    *         n−1 denominator)
    */
  def mahalanobis(df: DataFrame, cols: Seq[String],
      outputCol: String = "md2"): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(!df.columns.contains(outputCol),
      s"output column '$outputCol' already exists")
    import breeze.linalg.{DenseMatrix => BDM}
    def x(c: String) = col(c).cast("double")
    val k = cols.size
    val moments =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(x(c)).as(s"s_$c")) ++
      (for (i <- 0 until k; j <- i until k) yield
        sum(x(cols(i)) * x(cols(j))).as(s"q_${i}_$j"))
    val row = df.agg(moments.head, moments.tail: _*).head()
    val n = row.getLong(0).toDouble
    require(n > k, s"need more rows ($n) than columns ($k)")
    val sums = cols.indices.map(i => row.getDouble(1 + i)).toArray
    val cov = BDM.zeros[Double](k, k)
    var idx = 1 + k
    for (i <- 0 until k; j <- i until k) {
      val c = (row.getDouble(idx) - sums(i) * sums(j) / n) / (n - 1)
      cov(i, j) = c; cov(j, i) = c
      idx += 1
    }
    val inv = graft.glm.LinAlg.invPD(cov)
    val centered = cols.indices.map(i =>
      x(cols(i)) - lit(sums(i) / n)).toArray
    df.withColumn(outputCol,
      graft.glm.LinAlg.quadFormExpr(inv, centered))
  }
}

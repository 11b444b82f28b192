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

  /** Average precision (area under the precision–recall curve by the
    * step-wise threshold sum, sklearn's `average_precision_score`
    * convention): walking thresholds down the distinct scores,
    *
    *   AP = Σ_s (p_s / P) · TP_s / (TP_s + FP_s)
    *
    * where p_s is the positive count AT score s and TP_s / FP_s are the
    * positive/negative counts at or ABOVE s. Same shape as [[auc]]: ONE
    * groupBy(score) shuffle, then the two-level [[graft.ops.Cumulative]]
    * prefix pass over the distinct-score frame — descending cumulatives
    * come from the ascending pass and the grand totals, so no second
    * sort order is needed. Per-term arithmetic is a fixed rational
    * expression of integral counts; only the final Σ over distinct scores
    * reassociates, so callers round AP like any distributed float sum.
    *
    * @return a single row (ap, n_pos, n)
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("p"),
        count(lit(1)).as("c"))
    val totals = byScore.agg(sum("p").as("pt"), sum("c").as("ct"))
    graft.ops.Cumulative.runningSums(byScore, "s", Seq("p", "c"))
      .crossJoin(broadcast(totals))
      // at-or-above counts: total minus the strictly-below prefix
      .withColumn("tp", col("pt") - (col("p_cum") - col("p")))
      .withColumn("tot", col("ct") - (col("c_cum") - col("c")))
      .agg(sum(col("p") * col("tp") /
          (col("tot") * col("pt").cast("double"))).as("ap"),
        max(col("pt")).as("n_pos"), max(col("ct")).as("n"))
  }

  /** Confusion-matrix metrics for a LIST of decision thresholds in ONE
    * scan: per threshold τ the rule is positive ⇔ score ≥ τ. The single
    * aggregation emits (TP, predicted-positive) per τ plus the global
    * (P, n); FP/FN/TN and precision/recall/F1/accuracy are arithmetic on
    * that one row, inline-unpivoted to a |thresholds|-row frame. No
    * per-threshold pass, no data-sized shuffle — one map-side-combined
    * scalar agg whatever the threshold count.
    *
    * @return (threshold, tp, fp, fn, tn, precision, recall, f1, accuracy),
    *         one row per threshold, in input threshold order
    */
  def thresholdMetrics(df: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val pos = col(labelCol) === 1
    val aggCols = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(sum(when(col(scoreCol) >= t && pos, 1L).otherwise(0L)).as(s"tp_$i"),
        sum(when(col(scoreCol) >= t, 1L).otherwise(0L)).as(s"pp_$i"))
    } ++ Seq(sum(when(pos, 1L).otherwise(0L)).as("p_tot"),
      count(lit(1)).as("n_tot"))
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"tp_$i").as("tp"),
        col(s"pp_$i").as("pp"))
    }
    one.select(inline(array(rows: _*)), col("p_tot"), col("n_tot"))
      .withColumn("fp", col("pp") - col("tp"))
      .withColumn("fn", col("p_tot") - col("tp"))
      .withColumn("tn", col("n_tot") - col("pp") - col("fn"))
      .withColumn("precision", col("tp") / col("pp").cast("double"))
      .withColumn("recall", col("tp") / col("p_tot").cast("double"))
      .withColumn("f1", lit(2.0) * col("tp") / (col("pp") + col("p_tot")))
      .withColumn("accuracy", (col("tp") + col("tn")) / col("n_tot").cast("double"))
      .select("threshold", "tp", "fp", "fn", "tn",
        "precision", "recall", "f1", "accuracy")
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
  /** Isotonic (monotone non-decreasing) calibration by
    * pool-adjacent-violators over score bins — the standard
    * classifier-recalibration step where [[calibration]] merely reports
    * the reliability curve.
    *
    * Distributed part: ONE fixed-width-bin aggregation (identical
    * binning to [[calibration]]) reduces the data to ≤ nBins (n, pos)
    * rows. PAV then runs on the DRIVER over that bounded frame (the
    * Gram-pass discipline: only bin-count-sized state crosses the
    * boundary, never data) — exact pooling, no iteration over rows.
    * The pooled rates rejoin the bin frame as a broadcast literal frame.
    *
    * @return per occupied bin: (bin, n, frac_pos, iso_rate) with
    *         iso_rate monotone non-decreasing in bin
    */
  def isotonicCalibration(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins >= 1 && hi > lo, "need nBins >= 1 and hi > lo")
    val w = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col(scoreCol) - lo) / w).cast("int"), lit(0)), lit(nBins - 1))
    val binned = df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("pos"))
    // ≤ nBins rows to the driver — bounded by the bin grid, not the data
    val rows = binned.orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // pool adjacent violators: merge any pool whose rate falls below its
    // predecessor's until rates are non-decreasing
    val pools = scala.collection.mutable.ArrayBuffer
      .empty[(List[Int], Long, Long)]
    rows.foreach { case (b, n, p) =>
      pools += ((List(b), n, p))
      var merged = true
      while (merged && pools.length >= 2) {
        val (bs2, n2, p2) = pools(pools.length - 1)
        val (bs1, n1, p1) = pools(pools.length - 2)
        if (p2.toDouble * n1 < p1.toDouble * n2) { // rate2 < rate1, exact
          pools.remove(pools.length - 1)
          pools(pools.length - 1) = (bs1 ++ bs2, n1 + n2, p1 + p2)
        } else merged = false
      }
    }
    val iso = pools.flatMap { case (bs, n, p) =>
      bs.map(b => (b, p.toDouble / n))
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val isoFrame = iso.toDF("bin", "iso_rate")
    binned
      .withColumn("frac_pos", col("pos").cast("double") / col("n"))
      .join(broadcast(isoFrame), "bin")
      .select(col("bin"), col("n"), col("frac_pos"), col("iso_rate"))
  }

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

package graft.glm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** [[auc]] per group in one pass — per-segment discrimination (the
    * fairness/monitoring companion to [[groupFairness]]: equal overall
    * AUC can hide a segment where the model cannot rank at all).
    *
    * Same doubled-numerator Mann–Whitney identity; the cumulative runs
    * as a GROUP-PARTITIONED window over each group's distinct-score
    * frame (bounded by the per-group score support — the grouped-KM
    * caveat class; for one group with continuous scores use the global
    * [[auc]]'s two-level pass).
    *
    * @return per group: (groupCol, auc, n_pos, n_neg) — auc null for
    *         single-class groups
    */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("n"))
    val wCum = Window.partitionBy(groupCol).orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("nb", sum("n").over(wCum) - col("n"))
      .groupBy(col(groupCol))
      .agg(sum(col("p") * (lit(2) * col("nb") + col("n"))).as("num2"),
        sum("p").as("n_pos"), sum("n").as("n_neg"))
      .select(col(groupCol),
        round(when(col("n_pos") > 0 && col("n_neg") > 0,
          col("num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))), 6).as("auc"),
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

  /** Murphy (1973) decomposition of the Brier score over fixed-width
    * probability bins: BS = REL − RES + UNC with
    *
    *   REL = Σ n_k (s̄_k − ō_k)² / N   (calibration error — want small)
    *   RES = Σ n_k (ō_k − ō)² / N     (discrimination — want large)
    *   UNC = ō (1 − ō)                (irreducible base-rate variance)
    *
    * alongside the exact row-level Brier mean((s − y)²). ONE aggregation
    * pass: per-bin (n, pos, Σs, Σs², Σs·y) plus grand totals; everything
    * downstream is arithmetic on the nBins-row frame. (The identity
    * holds exactly only when forecasts are constant within bins; the gap
    * between `brier` and `rel − res + unc` is the reported
    * `within_bin_var`.)
    *
    * @return one row: (n, brier, reliability, resolution, uncertainty,
    *         within_bin_var)
    */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int, lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(nBins >= 1 && hi > lo, "need nBins >= 1 and hi > lo")
    val w = (hi - lo) / nBins
    val s = col(scoreCol).cast("double")
    val y = when(col(labelCol) === 1, 1L).otherwise(0L)
    val bin = least(greatest(
      floor((s - lo) / w).cast("int"), lit(0)), lit(nBins - 1))
    val byBin = df.groupBy(bin.as("__b"))
      .agg(count(lit(1)).as("n"), sum(y).as("pos"),
        sum(s).as("ss"), sum(s * s).as("ss2"),
        sum(when(col(labelCol) === 1, s).otherwise(lit(0.0))).as("ssy"))
    val tot = byBin.agg(sum("n").as("__N"), sum("pos").as("__P"))
    val sbar = col("ss") / col("n")
    val obar = col("pos").cast("double") / col("n")
    val obarAll = col("__P").cast("double") / col("__N")
    byBin.crossJoin(broadcast(tot))
      .agg(
        first(col("__N")).as("n"),
        round(sum(col("ss2") - lit(2.0) * col("ssy") +
          col("pos").cast("double")).cast("double") / first(col("__N")), 6)
          .as("brier"),
        round(sum(col("n") * (sbar - obar) * (sbar - obar)) /
          first(col("__N")), 6).as("reliability"),
        round(sum(col("n") * (obar - obarAll) * (obar - obarAll)) /
          first(col("__N")), 6).as("resolution"),
        round(first(obarAll * (lit(1.0) - obarAll)), 6).as("uncertainty"),
        round(sum(col("ss2") - col("n") * sbar * sbar) / first(col("__N")), 6)
          .as("within_bin_var"))
  }

  /** Expected Calibration Error (the LLM-eval calibration headline:
    * confidence-weighted mean |accuracy − confidence| over fixed-width
    * probability bins; [[brierDecomposition]]'s reliability term is the
    * squared cousin, [[calibration]] the per-bin detail this reduces):
    *
    *   ECE = Σ_b (n_b/N) · |acc_b − conf_b|,  MCE = max_b |acc_b − conf_b|
    *
    * Scores are REQUIRED in [0, 1] loudly and MICRO-quantized (round to
    * 1e−6) before any sum, so per-bin confidence totals are exact longs
    * and bins are integer arithmetic — (s_micro·B) div 10⁶, clamped —
    * that replays bit-for-bit. Per-bin gaps are pinned rational
    * expressions of exact integers; only the final Σ over ≤ nBins terms
    * reassociates (the mantelHaenszel K-strata float-sum class) →
    * 6-digit grid.
    *
    * @return one row: (n, n_bins_used, ece, mce)
    */
  def expectedCalibrationError(df: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 64, s"need 1 <= nBins <= 64, got $nBins")
    val s = col(scoreCol).cast("double")
    val guard = assert_true(s.isNotNull && s >= 0.0 && s <= 1.0,
      lit(s"$scoreCol must be a probability in [0, 1]"))
    // the guard rides the quantized score every aggregate consumes
    val sMicro = when(guard.isNull, round(s * 1e6).cast("long"))
    val y = when(col(labelCol) === 1, 1L).otherwise(0L)
    val bin = least(expr(s"(__sm * $nBins) div 1000000"),
      lit(nBins - 1L))
    val byBin = df.select(sMicro.as("__sm"), y.as("__y"))
      .groupBy(bin.as("__b"))
      .agg(count(lit(1)).as("n"), sum("__sm").as("sm"),
        sum("__y").as("pos"))
    val tot = byBin.agg(sum("n").as("__N"))
    val gap = abs(col("pos").cast("double") / col("n").cast("double") -
      col("sm").cast("double") / col("n").cast("double") / 1e6)
    byBin.crossJoin(broadcast(tot))
      .agg(first(col("__N")).as("n"),
        count(lit(1)).as("n_bins_used"),
        round(sum(gap * col("n").cast("double")) /
          first(col("__N")).cast("double"), 6).as("ece"),
        round(max(gap), 6).as("mce"))
  }

  /** Gains / lift table: rank by score DESCENDING, cut into `nTiles`
    * population tiles, report per-tile capture and cumulative lift — the
    * campaign-targeting readout ("the top decile captures 34% of
    * responders at 3.4× lift").
    *
    * Scale shape: distinct-score collapse, the two-level descending
    * [[graft.ops.Cumulative.runningSums]] pass, tile = ceil(T·cum/N)
    * rank shares (ties share a tile — a total function of the score,
    * q202's discipline), then per-tile aggregation + windows over the
    * T-row tile frame. Exact integers until the final ratio grid.
    *
    * @return per tile: (tile, n, n_pos, cum_n, cum_pos, capture, lift)
    */
  def gainsTable(df: DataFrame, scoreCol: String, labelCol: String,
      nTiles: Int = 10): DataFrame = {
    require(nTiles >= 1, "need nTiles >= 1")
    val byS = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("pos"))
    val cum = graft.ops.Cumulative.runningSums(byS, "__s", Seq("n", "pos"),
      descending = true)
    val tot = byS.agg(sum("n").as("__N"), sum("pos").as("__P"))
    val tiled = cum.crossJoin(broadcast(tot))
      .withColumn("tile", ceil(lit(nTiles.toDouble) *
        col("n_cum").cast("double") / col("__N").cast("double")).cast("int"))
    val byTile = tiled.groupBy("tile")
      .agg(sum("n").as("n"), sum("pos").as("n_pos"),
        first("__N").as("__N"), first("__P").as("__P"))
    val wc = Window.orderBy("tile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byTile
      .withColumn("cum_n", sum("n").over(wc))
      .withColumn("cum_pos", sum("n_pos").over(wc))
      .select(col("tile"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        round(when(col("__P") > 0,
          col("cum_pos").cast("double") / col("__P")), 6).as("capture"),
        round(when(col("__P") > 0,
          (col("cum_pos").cast("double") / col("cum_n")) /
            (col("__P").cast("double") / col("__N"))), 6).as("lift"))
  }

  /** Uplift / Qini table — the treatment-model companion to
    * [[gainsTable]]: rank the population by the uplift score (descending),
    * cut into `nTiles` equal-count tiles, and report at each cumulative
    * depth the treated/control response rates, their difference
    * (`uplift`), and the Qini value
    * `cum_treat_pos − cum_ctrl_pos · cum_n_treat / cum_n_ctrl` —
    * incremental conversions versus a scaled control. A model that
    * targets persuadables front-loads the Qini curve; random targeting
    * is linear to the same endpoint.
    *
    * Scale shape: score-collapse (like [[gainsTable]]) → the two-level
    * [[graft.ops.Cumulative]] pass for tiling → per-tile sums with
    * windows over the ≤ nTiles frame. Counts stay exact integers until
    * the 6-digit ratio grid.
    *
    * @return per tile: (tile, n, cum_n_treat, cum_pos_treat, cum_n_ctrl,
    *         cum_pos_ctrl, uplift, qini) — uplift/qini null when a
    *         cumulative arm is empty
    */
  def upliftByTile(df: DataFrame, scoreCol: String, treatCol: String,
      labelCol: String, nTiles: Int = 10): DataFrame = {
    require(nTiles >= 1, "need nTiles >= 1")
    val byS = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(treatCol) === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col(treatCol) === 1 && col(labelCol) === 1, 1L)
          .otherwise(0L)).as("post"),
        sum(when(col(treatCol) === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col(treatCol) === 0 && col(labelCol) === 1, 1L)
          .otherwise(0L)).as("posc"))
    val cum = graft.ops.Cumulative.runningSums(byS, "__s", Seq("n"),
      descending = true)
    val tot = byS.agg(sum("n").as("__N"))
    val tiled = cum.crossJoin(broadcast(tot))
      .withColumn("tile", ceil(lit(nTiles.toDouble) *
        col("n_cum").cast("double") / col("__N").cast("double")).cast("int"))
    val byTile = tiled.groupBy("tile")
      .agg(sum("n").as("n"), sum("nt").as("nt"), sum("post").as("post"),
        sum("nc").as("nc"), sum("posc").as("posc"))
    val wc = Window.orderBy("tile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cnt = byTile
      .withColumn("cum_n_treat", sum("nt").over(wc))
      .withColumn("cum_pos_treat", sum("post").over(wc))
      .withColumn("cum_n_ctrl", sum("nc").over(wc))
      .withColumn("cum_pos_ctrl", sum("posc").over(wc))
    cnt.select(col("tile"), col("n"),
      col("cum_n_treat"), col("cum_pos_treat"),
      col("cum_n_ctrl"), col("cum_pos_ctrl"),
      round(when(col("cum_n_treat") > 0 && col("cum_n_ctrl") > 0,
        col("cum_pos_treat").cast("double") / col("cum_n_treat") -
          col("cum_pos_ctrl").cast("double") / col("cum_n_ctrl")), 6)
        .as("uplift"),
      round(when(col("cum_n_ctrl") > 0,
        col("cum_pos_treat").cast("double") -
          col("cum_pos_ctrl").cast("double") * col("cum_n_treat") /
            col("cum_n_ctrl")), 6).as("qini"))
  }

  /** Qini COEFFICIENT — the scalar area readout over [[upliftByTile]]'s
    * curve (Radcliffe 2007): trapezoid area between the incremental-
    * gains curve Q(k) = yT(k) − yC(k)·nT(k)/nC(k) (cutoffs walking down
    * the score) and the random-targeting diagonal 0 → Q(N). Positive =
    * the score ranks persuadables ahead of sure things; 0 = no better
    * than random (a constant score scores exactly 0 by construction
    * here — the trapezoid convention, unlike the step convention, has
    * no single-cutoff artifact).
    *
    * Lag-free trapezoids: the previous cutoff's curve value is a pure
    * function of (cum − current-row) counts, so both trapezoid corners
    * come from ONE descending [[graft.ops.Cumulative]] pass — no global
    * lag window. Curve values MICRO-quantize before the area sum
    * (exact Decimal(38,0) terms in any order); the area and the
    * diagonal are pinned float expressions. Control-free prefixes take
    * the ncc = 0 convention Q = yT (the correction term 0).
    *
    * @return one row: (n, n_treat, n_ctrl, uplift_total, qini) — the
    *         absolute-count curve scaled per capita (area / N), 6-digit
    *         grid
    */
  def qiniCoefficient(df: DataFrame, scoreCol: String, treatCol: String,
      labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val byS = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(treatCol) === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col(treatCol) === 1 && col(labelCol) === 1, 1L)
          .otherwise(0L)).as("yt"),
        sum(when(col(treatCol) === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col(treatCol) === 0 && col(labelCol) === 1, 1L)
          .otherwise(0L)).as("yc"))
    val cum = graft.ops.Cumulative.runningSums(byS, "__s",
      Seq("nt", "yt", "nc", "yc"), descending = true)
    // micro-quantized curve value at a (ntc, ytc, ncc, ycc) cutoff
    def qq(ntc: Column, ytc: Column, ncc: Column, ycc: Column): Column =
      round((ytc.cast("double") -
        when(ncc > 0, ycc.cast("double") * ntc.cast("double") /
          ncc.cast("double")).otherwise(lit(0.0))) * 1e6).cast("long")
    val here = qq(col("nt_cum"), col("yt_cum"), col("nc_cum"),
      col("yc_cum"))
    val prev = qq(col("nt_cum") - col("nt"), col("yt_cum") - col("yt"),
      col("nc_cum") - col("nc"), col("yc_cum") - col("yc"))
    val agg = cum.select(col("n"), col("nt"), col("nc"),
        ((prev + here).cast(dec) * col("n").cast(dec)).cast(dec)
          .as("__a"),
        here.as("__qq"), col("__s"))
      .agg(sum("n").as("n"), sum("nt").as("n_treat"),
        sum("nc").as("n_ctrl"), sum("__a").as("__area2"),
        min_by(col("__qq"), col("__s")).as("__qtot"))
    agg.select(col("n"), col("n_treat"), col("n_ctrl"),
      round(col("__qtot").cast("double") / 1e6, 6).as("uplift_total"),
      round(when(col("n") > 0,
        col("__area2").cast("double") / 2.0 /
          (col("n").cast("double") * 1e6) -
          col("__qtot").cast("double") / 2.0 / 1e6), 6).as("qini"))
  }

  /** [[qiniCoefficient]] per SEGMENT — uplift-model quality sliced by a
    * grouping key (campaign, country, cohort): does the model rank
    * persuadables well EVERYWHERE, or is the global Qini carried by one
    * segment? Identical arithmetic to the global readout — micro-quantized
    * curve corners, lag-free prev = cum − current, exact Decimal(38,0)
    * area sums — but the cumulative pass is a (segment)-PARTITIONED
    * window, which scales by keys like any groupBy (the global two-level
    * Cumulative machinery exists only to avoid an UNPARTITIONED window;
    * per-segment windows never funnel). One keyed collapse + one keyed
    * window + one keyed reduce.
    *
    * @return per segment: (segCol, n, n_treat, n_ctrl, uplift_total,
    *         qini) — same conventions as [[qiniCoefficient]]
    */
  def qiniBySegment(df: DataFrame, segCol: String, scoreCol: String,
      treatCol: String, labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val byS = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(segCol).as("__seg"),
        col(scoreCol).cast("double").as("__s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(treatCol) === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col(treatCol) === 1 && col(labelCol) === 1, 1L)
          .otherwise(0L)).as("yt"),
        sum(when(col(treatCol) === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col(treatCol) === 0 && col(labelCol) === 1, 1L)
          .otherwise(0L)).as("yc"))
    val w = Window.partitionBy("__seg").orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Seq("nt", "yt", "nc", "yc").foldLeft(byS) { (d, c) =>
      d.withColumn(s"${c}_cum", sum(col(c)).over(w))
    }
    def qq(ntc: Column, ytc: Column, ncc: Column, ycc: Column): Column =
      round((ytc.cast("double") -
        when(ncc > 0, ycc.cast("double") * ntc.cast("double") /
          ncc.cast("double")).otherwise(lit(0.0))) * 1e6).cast("long")
    val here = qq(col("nt_cum"), col("yt_cum"), col("nc_cum"),
      col("yc_cum"))
    val prev = qq(col("nt_cum") - col("nt"), col("yt_cum") - col("yt"),
      col("nc_cum") - col("nc"), col("yc_cum") - col("yc"))
    val agg = cum.select(col("__seg"), col("n"), col("nt"), col("nc"),
        ((prev + here).cast(dec) * col("n").cast(dec)).cast(dec)
          .as("__a"),
        here.as("__qq"), col("__s"))
      .groupBy("__seg")
      .agg(sum("n").as("n"), sum("nt").as("n_treat"),
        sum("nc").as("n_ctrl"), sum("__a").as("__area2"),
        min_by(col("__qq"), col("__s")).as("__qtot"))
    agg.select(col("__seg").as(segCol), col("n"), col("n_treat"),
      col("n_ctrl"),
      round(col("__qtot").cast("double") / 1e6, 6).as("uplift_total"),
      round(when(col("n") > 0,
        col("__area2").cast("double") / 2.0 /
          (col("n").cast("double") * 1e6) -
          col("__qtot").cast("double") / 2.0 / 1e6), 6).as("qini"))
  }

  /** Group-fairness audit of a binary classifier: per protected group,
    * selection rate (demographic parity), TPR (equal opportunity) and
    * FPR (equalized odds), each with its ratio to the group-wise MAX
    * (the "80% rule" reads `rate_ratio ≥ 0.8`).
    *
    * ONE conditional-count aggregation per group; the max-reference
    * ratios are windows over the group-cardinality frame. Exact
    * integers until the ratio grid.
    *
    * @return per group: (groupCol, n, n_pos_label, selection_rate, tpr,
    *         fpr, rate_ratio, tpr_ratio)
    */
  def groupFairness(df: DataFrame, groupCol: String, labelCol: String,
      predCol: String): DataFrame = {
    val y = col(labelCol) === 1
    val p = col(predCol) === 1
    val byG = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(y, 1L).otherwise(0L)).as("n_pos_label"),
        sum(when(p, 1L).otherwise(0L)).as("__sel"),
        sum(when(y && p, 1L).otherwise(0L)).as("__tp"),
        sum(when(!y && p, 1L).otherwise(0L)).as("__fp"))
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val sel = col("__sel").cast("double") / col("n")
    val tpr = when(col("n_pos_label") > 0,
      col("__tp").cast("double") / col("n_pos_label"))
    val fpr = when(col("n") > col("n_pos_label"),
      col("__fp").cast("double") / (col("n") - col("n_pos_label")))
    byG
      .withColumn("selection_rate", round(sel, 6))
      .withColumn("tpr", round(tpr, 6))
      .withColumn("fpr", round(fpr, 6))
      .withColumn("rate_ratio", round(sel / max(sel).over(w), 6))
      .withColumn("tpr_ratio", round(tpr / max(tpr).over(w), 6))
      .select(col(groupCol), col("n"), col("n_pos_label"),
        col("selection_rate"), col("tpr"), col("fpr"),
        col("rate_ratio"), col("tpr_ratio"))
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

  /** Multiclass classifier evaluation: per-class precision / recall /
    * F1 (one-vs-rest) plus a `__macro__` summary row — the K-class
    * counterpart of [[thresholdMetrics]] (use [[graft.ops.Contingency]]
    * for the full confusion matrix itself).
    *
    * ONE (label, pred) aggregation collapses the data to ≤ K² cells;
    * margins and metrics are arithmetic over that bounded frame. Classes
    * that appear only as a prediction still get a row (recall null);
    * each macro average runs over the classes where that metric is
    * defined (SQL avg-skips-null semantics, reproducible cross-engine).
    *
    * @return per class + '__macro__': (class, n_true, n_pred, tp,
    *         precision, recall, f1) on the 6-digit grid
    */
  def multiclassMetrics(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val cells = df
      .filter(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).cast("string").as("__l"),
        col(predCol).cast("string").as("__p"))
      .agg(count(lit(1)).as("__n"))
    val byTrue = cells.groupBy(col("__l").as("class"))
      .agg(sum("__n").as("n_true"),
        sum(when(col("__p") === col("__l"), col("__n")).otherwise(0L))
          .as("tp"))
    val byPred = cells.groupBy(col("__p").as("class"))
      .agg(sum("__n").as("n_pred"))
    val perClass = byTrue.join(byPred, Seq("class"), "full_outer")
      .select(col("class"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", when(col("n_pred") > 0,
        col("tp").cast("double") / col("n_pred")))
      .withColumn("recall", when(col("n_true") > 0,
        col("tp").cast("double") / col("n_true")))
      .withColumn("f1", when(col("n_pred") > 0 && col("n_true") > 0 &&
          col("tp") > 0,
        lit(2.0) * col("tp") / (col("n_pred") + col("n_true")))
        .otherwise(when(col("n_pred") > 0 && col("n_true") > 0, lit(0.0))))
    val macroRow = perClass.agg(
      lit("__macro__").as("class"),
      sum("n_true").as("n_true"), sum("n_pred").as("n_pred"),
      sum("tp").as("tp"),
      avg("precision").as("precision"), avg("recall").as("recall"),
      avg("f1").as("f1"))
    perClass.unionByName(macroRow)
      .select(col("class"), col("n_true"), col("n_pred"), col("tp"),
        round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"),
        round(col("f1"), 6).as("f1"))
  }

  /** Cohen's kappa (1960) — chance-corrected agreement between two
    * categorical raters (annotator QA for labeling pipelines, model-vs-
    * model agreement):
    *
    *   κ = (p_o − p_e) / (1 − p_e),  p_o = Σ_c n_cc / N,
    *   p_e = Σ_c (row_c · col_c) / N²
    *
    * ONE (rater1, rater2) cell aggregation (≤ K² rows leave the
    * shuffle); the marginal products are arithmetic on the cell frame.
    * All inputs to the final divisions are exact integers.
    *
    * @return one row: (n, po, pe, kappa) — kappa null when p_e = 1
    *         (both raters constant and equal: agreement is undefined)
    */
  def cohensKappa(df: DataFrame, rater1Col: String,
      rater2Col: String): DataFrame = {
    val cells = df
      .filter(col(rater1Col).isNotNull && col(rater2Col).isNotNull)
      .groupBy(col(rater1Col).cast("string").as("__a"),
        col(rater2Col).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rows = cells.groupBy(col("__a").as("__c"))
      .agg(sum("__n").as("__ra"))
    val cols_ = cells.groupBy(col("__b").as("__c"))
      .agg(sum("__n").as("__rb"))
    val agree = cells.filter(col("__a") === col("__b"))
      .agg(coalesce(sum("__n"), lit(0L)).as("__agree"))
    val tot = cells.agg(sum("__n").as("__tot"))
    // Σ row_c·col_c over the (<= K)-row marginal frames; products in
    // DOUBLE — long·long would ANSI-overflow at 100 TB row counts, and
    // the <= K-term double sum is exact far beyond any rounding grid
    val cross = rows.join(cols_, Seq("__c"), "inner")
      .agg(coalesce(sum(col("__ra").cast("double") * col("__rb")),
        lit(0.0)).as("__cross"))
    agree.crossJoin(tot).crossJoin(cross)
      .select(col("__tot").as("n"),
        (col("__agree").cast("double") / col("__tot")).as("po"),
        (col("__cross") / (col("__tot").cast("double") * col("__tot")))
          .as("pe"))
      .withColumn("kappa", when(col("pe") < 1.0,
        (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
  }
}

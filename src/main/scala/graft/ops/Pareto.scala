package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto / ABC contribution analysis: rank keys by their share of a
  * total and classify them A (the head that carries `aPct`% of mass),
  * B (up to `bPct`%), C (the tail) — the inventory/revenue-concentration
  * staple, and for corpus work the "which sources carry 80% of tokens"
  * question.
  *
  * Scale shape: per-key totals are ONE aggregation; the cumulative runs
  * on the DISTINCT-total frame through the two-level
  * [[Cumulative.runningSums]] pass (keys with equal totals share one
  * rank and one class — the only well-defined choice), so no data-sized
  * frame ever funnels through a single-task window. Class boundaries
  * compare exact integers (cents × percent), so classification cannot
  * flake on a float grid.
  */
object Pareto {

  /** @param aPct head boundary in whole percent (default 80)
    * @param bPct A+B boundary in whole percent (default 95)
    * @return (key, total, share, cum_share, abc_class): totals descend;
    *         share/cum_share on a 6-digit grid; `cum_share` is the share
    *         of all keys with totals ≥ this key's (ties included)
    */
  def abcClassify(df: DataFrame, keyCol: String, valueCol: String,
      aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(aPct >= 1 && bPct > aPct && bPct <= 100,
      s"need 1 <= aPct < bPct <= 100, got $aPct/$bPct")
    val cents = round(col(valueCol) * 100, 0).cast("long")
    val totals = df.groupBy(col(keyCol).as("key"))
      .agg(sum(cents).as("v"))
    // distinct-total collapse: nk keys share total v → one cumulative rank
    val byV = totals.groupBy("v")
      .agg(count(lit(1)).as("__nk"))
      .withColumn("__vsum", col("v") * col("__nk"))
      .withColumn("__negv", -col("v"))
    val cum = Cumulative.runningSums(byV, "__negv", Seq("__vsum"))
      .select(col("v").as("__cv"), col("__vsum_cum"))
    val grand = totals.agg(sum("v").as("__grand"))
    totals.join(cum, col("v") === col("__cv"))
      .crossJoin(broadcast(grand))
      .select(col("key"), (col("v") / 100.0).as("total"),
        round(col("v").cast("double") / col("__grand"), 6).as("share"),
        round(col("__vsum_cum").cast("double") / col("__grand"), 6)
          .as("cum_share"),
        // integer boundary test: cum·100 ≤ pct·grand — no float grid
        when(col("__vsum_cum") * 100 <= col("__grand") * aPct, "A")
          .when(col("__vsum_cum") * 100 <= col("__grand") * bPct, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Hill tail-index estimator (Hill 1975) — the principled power-law
    * exponent readout next to [[graft.ops.TextOps.zipfFit]]'s OLS line:
    * over the top k order statistics of a POSITIVE measure (token
    * frequencies, degree counts, source sizes),
    *
    *   α̂ = k / Σ_{i=1..k} ln(x_(i) / x_(k+1))
    *
    * — the tail is Pareto(α) iff the log-excesses are Exponential(α).
    * Heavier tail = smaller α; natural-language token frequencies run
    * α ≈ 1 (Zipf).
    *
    * Determinism: the top-(k+1) cut is a TakeOrdered on value DESC —
    * ties at the boundary are value-equal, so the selected VALUE
    * multiset (all the estimator reads) is total-order-free; each log
    * excess is micro-quantized before the sum, so the sum is an exact
    * long in any order. One pinned division emits α̂.
    *
    * Scale shape: TakeOrdered (per-partition heaps, never a sort
    * shuffle) to a (k+1)-row frame; everything after is one tiny agg.
    *
    * @param k tail size, REQUIRED 2..4096 (the order-statistics frame
    *          is model-sized by contract)
    * @return one row: (k, n_tail, threshold, alpha) — n_tail = rows
    *         actually available (k when the data has ≥ k+1 positive
    *         rows, loudly smaller otherwise → alpha null below 2);
    *         threshold = x_(k+1); alpha on the 6-digit grid
    */
  def hillEstimator(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 4096, s"need 2 <= k <= 4096, got $k")
    val v = col(valueCol).cast("double")
    val top = df.filter(v.isNotNull && v > 0.0)
      .select(v.as("__v"))
      .orderBy(col("__v").desc)
      .limit(k + 1)
    val thr = top.agg(min("__v").as("__thr"), count(lit(1)).as("__m"))
    top.crossJoin(broadcast(thr))
      .select(col("__v"), col("__thr"), col("__m"),
        when(col("__v") > col("__thr"),
          round(log(col("__v") / col("__thr")) * 1e6).cast("long"))
          .otherwise(0L).as("__lx"))
      .agg(any_value(col("__thr")).as("threshold"),
        any_value(col("__m")).as("__m"),
        sum("__lx").as("__s"))
      .select(lit(k).as("k"), (col("__m") - 1).cast("long").as("n_tail"),
        col("threshold"),
        // __s = 0 means every tail value ties the threshold (a constant
        // tail has no finite tail index) — null, and never a 0-divisor
        // under ANSI
        round(when(col("__m") - 1 >= 2 && col("__s") > 0L,
          (col("__m") - 1).cast("double") /
            (col("__s").cast("double") / 1e6)), 6).as("alpha"))
  }
}

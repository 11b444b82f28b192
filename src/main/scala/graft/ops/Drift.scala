package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two dataset snapshots — the
  * check a training pipeline runs when a new crawl/dump lands: has the
  * feature (or label/language/source mix) moved enough to retrain or to
  * quarantine the batch?
  *
  * Population Stability Index over bins/categories:
  *
  *   PSI = Σ_b (p_ref(b) − p_cur(b)) · ln(p_ref(b) / p_cur(b))
  *
  * (≥ 0; common practice reads <0.1 stable, 0.1–0.25 moderate, >0.25
  * shifted.) Empty bins are floored at `eps` before the log — the standard
  * smoothing, documented because it is part of the metric's value, not an
  * implementation detail.
  *
  * Scale shape: each side reduces to per-bin counts with ONE aggregation
  * (map-side combined); the PSI itself is arithmetic on two k-row frames
  * joined by bin. Numeric binning with EXPLICIT cut points is a pure
  * codegen'd projection; `psiAuto` derives the cuts from the reference's
  * `approx_percentile` sketch (bounded memory — the 100 TB path), at the
  * cost of sketch-determined cut points.
  */
object Drift {

  private val defaultEps = 1e-6

  /** Bin index for explicit ascending cut points: k+1 bins for k cuts
    * (bin i = (cuts(i-1), cuts(i)]; values ≤ first cut → bin 0, values >
    * last cut → bin k). NULL values get their own bin −1 so missingness
    * drift is measured, not dropped.
    */
  private def binExpr(valueCol: String, cuts: Seq[Double]) = {
    val x = col(valueCol).cast("double")
    val base = cuts.zipWithIndex.foldLeft(when(x.isNull, lit(-1))) {
      case (acc, (c, i)) => acc.when(x <= c, lit(i))
    }
    base.otherwise(lit(cuts.size))
  }

  private def proportions(df: DataFrame, bin: org.apache.spark.sql.Column) =
    countsToProportions(binnedCounts(df, bin))

  private def binnedCounts(df: DataFrame, bin: org.apache.spark.sql.Column) =
    df.groupBy(bin.as("bin")).agg(count(lit(1)).as("c"))

  /** The ONE count→proportion normalization both the batch and streaming
    * PSI paths share — bit-for-bit parity depends on this staying single.
    */
  private def countsToProportions(c: DataFrame) = {
    val tot = c.agg(sum("c").as("t"))
    c.crossJoin(tot).select(col("bin"), (col("c") / col("t")).as("p"))
  }

  /** Exact per-bin counts for explicit numeric cuts — streaming-safe:
    * ONE aggregation whose state is at most cuts.size + 2 rows, however
    * long the stream ([[graft.streaming.StreamOps.psiStream]] builds the
    * live drift monitor on this).
    */
  def binCounts(df: DataFrame, valueCol: String,
      cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty, "at least one cut point required")
    require(cuts == cuts.sorted, "cut points must be ascending")
    binnedCounts(df, binExpr(valueCol, cuts))
  }

  /** PSI off two pre-aggregated (bin, c) count frames — the readout half
    * of the streaming monitor; identical arithmetic to [[psi]].
    */
  def psiOfCounts(refCounts: DataFrame, curCounts: DataFrame,
      eps: Double = defaultEps): DataFrame =
    psiOf(countsToProportions(refCounts), countsToProportions(curCounts), eps)

  /** PSI of `cur` against `ref` over explicit numeric cut points.
    * Returns one row: psi, n_bins (bins populated on either side).
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      cuts: Seq[Double], eps: Double = defaultEps): DataFrame = {
    require(cuts.nonEmpty, "at least one cut point required")
    require(cuts == cuts.sorted, "cut points must be ascending")
    val bin = binExpr(valueCol, cuts)
    psiOf(proportions(ref, bin), proportions(cur, bin), eps)
  }

  /** PSI over a categorical column: every category (and NULL) is its own
    * bin; categories absent from one side are floored at `eps`.
    */
  def categoricalPsi(ref: DataFrame, cur: DataFrame, catCol: String,
      eps: Double = defaultEps): DataFrame = {
    val bin = coalesce(col(catCol).cast("string"), lit("__null__"))
    psiOf(proportions(ref, bin), proportions(cur, bin), eps)
  }

  /** PSI with cut points taken from the REFERENCE side's quantile sketch
    * (`approx_percentile`, bounded memory) — the at-scale auto-binning
    * path; the cut points are sketch-determined, so gate-style exactness
    * belongs to [[psi]] with explicit cuts.
    */
  def psiAuto(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 10, eps: Double = defaultEps): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val qs = (1 until bins).map(_.toDouble / bins)
    val cuts = ref.select(percentile_approx(col(valueCol).cast("double"),
        array(qs.map(lit(_)): _*), lit(10000)).as("q"))
      .head().getSeq[Double](0).distinct.sorted
    psi(ref, cur, valueCol, cuts, eps)
  }

  /** Jensen–Shannon divergence (nats) between the two sides' categorical
    * distributions — PSI's bounded, symmetric sibling (0 ≤ JSD ≤ ln 2, no
    * eps flooring needed: absent categories contribute p·ln 2 exactly):
    *
    *   JSD = ½ KL(P ‖ M) + ½ KL(Q ‖ M),  M = ½(P + Q)
    *
    * Same shape as [[categoricalPsi]]: one count aggregation per side,
    * arithmetic on the joined category frames.
    *
    * @return one row (jsd, n_bins)
    */
  def jsd(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    val bin = coalesce(col(catCol).cast("string"), lit("__null__"))
    val joined = proportions(ref, bin).withColumnRenamed("p", "p_ref")
      .join(proportions(cur, bin).withColumnRenamed("p", "p_cur"),
        Seq("bin"), "full_outer")
    val p = coalesce(col("p_ref"), lit(0.0))
    val q = coalesce(col("p_cur"), lit(0.0))
    val m = (p + q) / 2
    // x·ln(x/m) with the 0·ln0 = 0 convention (when x = 0 the term is 0)
    def kl(x: org.apache.spark.sql.Column) =
      when(x > 0, x * log(x / m)).otherwise(lit(0.0))
    joined.agg(
      ((sum(kl(p)) + sum(kl(q))) / 2).as("jsd"),
      count(lit(1)).as("n_bins"))
  }

  private def psiOf(pRef: DataFrame, pCur: DataFrame, eps: Double): DataFrame = {
    val joined = pRef.withColumnRenamed("p", "p_ref")
      .join(pCur.withColumnRenamed("p", "p_cur"), Seq("bin"), "full_outer")
    val a = greatest(coalesce(col("p_ref"), lit(0.0)), lit(eps))
    val b = greatest(coalesce(col("p_cur"), lit(0.0)), lit(eps))
    joined.agg(
      sum((a - b) * log(a / b)).as("psi"),
      count(lit(1)).as("n_bins"))
  }

  /** 1-Wasserstein (earth mover's) distance between two empirical
    * distributions of an INTEGRAL column — the drift metric that, unlike
    * [[psi]]'s binned ratio and KS's max gap, weighs HOW FAR the mass
    * moved: W₁ = ∫|F_ref − F_cur| dv. Binning-free and exact: the two
    * sides collapse to one distinct-value count frame (ONE shuffle, the
    * ksTest shape), CDF numerators ride the two-level
    * [[Cumulative.runningSums]] pass, the inter-value gap comes from one
    * lead window over that COLLAPSED frame, and every |F_a·n_b −
    * F_b·n_a|·gap term is exact — summed in Decimal(38,0) so 128-bit
    * integer totals survive any scale — with ONE pinned division at the
    * end.
    *
    * @param valueCol integral (cents-quantized) column — REQUIRED; a
    *                 float column must be quantized by the caller first
    * @return one row: (n_ref, n_cur, w1) — w1 on the 6-digit grid, in
    *         the column's integral units
    */
  def wasserstein1(ref: DataFrame, cur: DataFrame,
      valueCol: String): DataFrame = {
    // integrality guard: per-row cast-and-compare, throws on floats
    val guard = (c: Column) => assert_true(c.cast("long").cast("double")
      === c.cast("double"), lit(s"$valueCol must be integral"))
    val tagged = ref.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("v"), lit(1L).as("__a"),
        lit(0L).as("__b"), guard(col(valueCol)).as("__g"))
      .unionByName(cur.filter(col(valueCol).isNotNull)
        .select(col(valueCol).cast("long").as("v"), lit(0L).as("__a"),
          lit(1L).as("__b"), guard(col(valueCol)).as("__g")))
      .drop("__g")
    val byV = tagged.groupBy("v")
      .agg(sum("__a").as("ca"), sum("__b").as("cb"))
    val totals = byV.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val cums = Cumulative.runningSums(byV, "v", Seq("ca", "cb"))
    val gap = lead("v", 1).over(Window.orderBy("v")) - col("v")
    // the term frame is empty when only one distinct value exists (the
    // degenerate identical-point case) — totals stay authoritative
    val termSum = cums
      .withColumn("__gap", gap)
      .filter(col("__gap").isNotNull)
      .crossJoin(broadcast(totals))
      .agg(sum(abs(col("ca_cum") * col("nb") - col("cb_cum") * col("na"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        col("__gap")).as("__s"))
    totals.crossJoin(broadcast(termSum))
      .select(col("na").as("n_ref"), col("nb").as("n_cur"),
        round(coalesce(col("__s"), lit(0)).cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 6)
          .as("w1"))
  }
}

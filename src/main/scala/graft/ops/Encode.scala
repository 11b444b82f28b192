package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-safe feature encoding for model training data.
  *
  * Target encoding replaces a high-cardinality categorical with the mean of
  * the target over that category — but the naive version leaks each row's
  * own label into its feature. The standard fix is OUT-OF-FOLD means: rows
  * are assigned to k deterministic folds, and each row's encoding uses only
  * the target sums from the OTHER folds.
  *
  * Distribution: ONE groupBy(category, fold) aggregation builds the
  * (k·|categories|)-row sums frame; window sums over it yield per-category
  * totals; the complement arithmetic (total − own fold) is pure column
  * math on that tiny frame; one broadcast-able equi-join on
  * (category, fold) carries the encoding back. No shuffle of the fact
  * table beyond the one aggregation — the q97 CrossVal fold discipline
  * applied to encoding.
  */
object Encode {

  /** Deterministic md5-keyed fold id in [0, k) — the q97/q63 convention:
    * content-keyed, partition-invariant, no RNG.
    */
  private def foldOf(idCol: String, k: Int) =
    pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(k.toLong)).cast("int")

  /** Out-of-fold target encoding with additive smoothing toward the
    * out-of-fold GLOBAL mean:
    *
    *   enc(cat, fold) = (S_cat − s_fold + m·g_fold) / (N_cat − n_fold + m)
    *
    * where g_fold = (S − s_all,fold)/(N − n_all,fold) is the global target
    * mean excluding the row's fold (so even the prior is leak-free), and
    * `m` is the smoothing pseudo-count (m=0 → raw out-of-fold mean; a
    * category seen only in the row's own fold then falls back to g_fold).
    *
    * Output: the input rows plus `outputCol` (the encoding) and `fold`.
    */
  /** @param foldCol optional caller-supplied integer fold column (the
    *                 CrossVal convention — any content-keyed expression);
    *                 defaults to the md5(id)-mod-k assignment
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      idCol: String, k: Int = 5, smoothing: Double = 0.0,
      outputCol: String = "te",
      foldCol: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    require(smoothing >= 0.0, s"smoothing must be >= 0, got $smoothing")
    // injected columns must not silently shadow caller data (r7 advice)
    require(!df.columns.contains("fold"),
      "input already has a 'fold' column — rename it or pass foldCol")
    require(!df.columns.contains(outputCol),
      s"input already has a '$outputCol' column — pick another outputCol")
    val y = col(targetCol).cast("double")
    val withFold = df.withColumn("fold", foldCol.getOrElse(foldOf(idCol, k)))
    // (category, fold) sums — the ONLY aggregation over the fact table
    val cf = withFold.groupBy(col(catCol).as("te_cat"), col("fold").as("te_fold"))
      .agg(count(lit(1)).as("n_cf"), sum(y).as("s_cf"))
    val wCat = Window.partitionBy("te_cat")
    val wAll = Window.partitionBy()
    val enc = cf
      .withColumn("n_cat", sum("n_cf").over(wCat))
      .withColumn("s_cat", sum("s_cf").over(wCat))
      // per-fold ALL-category sums for the global out-of-fold prior: the
      // window runs over the tiny (cat × fold) frame, never the fact rows
      .withColumn("n_fold_all",
        sum("n_cf").over(Window.partitionBy("te_fold")))
      .withColumn("s_fold_all",
        sum("s_cf").over(Window.partitionBy("te_fold")))
      .withColumn("n_all", sum("n_cf").over(wAll))
      .withColumn("s_all", sum("s_cf").over(wAll))
      .withColumn("g_oof",
        (col("s_all") - col("s_fold_all")) / (col("n_all") - col("n_fold_all")))
      .withColumn("denom", col("n_cat") - col("n_cf") + lit(smoothing))
      .withColumn(outputCol,
        when(col("denom") > 0,
          (col("s_cat") - col("s_cf") + lit(smoothing) * col("g_oof")) /
            col("denom"))
          .otherwise(col("g_oof")))
      .select("te_cat", "te_fold", outputCol)
    // null-safe on the category (plain === drops null-category rows and
    // breaks the row-count passthrough — r7 advice); NO broadcast hint:
    // the encoding frame is (k·|categories|)-sized, and high-cardinality
    // categoricals are exactly target encoding's use case, so the join
    // strategy is left to AQE's measured-size runtime choice
    withFold.join(enc,
      withFold(catCol) <=> enc("te_cat") && withFold("fold") === enc("te_fold"))
      .drop("te_cat", "te_fold")
  }

  /** Weight-of-evidence table for a categorical against a binary target —
    * the credit-scoring encoding and its information value:
    *
    *   woe(c) = ln( ((pos_c + 0.5)/pos) / ((neg_c + 0.5)/neg) )
    *   iv_term(c) = ((pos_c + 0.5)/pos − (neg_c + 0.5)/neg) · woe(c)
    *
    * with the conventional 0.5 adjustment so single-class categories stay
    * finite. ONE category aggregation; totals come from window sums over
    * the category frame (no second scan); Σ iv_term is the column's
    * information value. Null categories form their own row (they carry
    * signal); null targets are rejected by the cast contract.
    *
    * @param targetCol 0/1 (or boolean) target
    * @return (category, n, n_pos, woe, iv_term) — woe/iv_term on a
    *         6-digit grid
    */
  def woe(df: DataFrame, catCol: String, targetCol: String): DataFrame = {
    val y = col(targetCol).cast("double")
    val cat = df.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(y).cast("long").as("n_pos"))
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val posShare = (col("n_pos") + 0.5) / col("__pos")
    val negShare = (col("n") - col("n_pos") + 0.5) / col("__neg")
    cat
      .withColumn("__pos", sum("n_pos").over(all))
      .withColumn("__neg", (sum("n").over(all) - col("__pos")))
      .select(col("category"), col("n"), col("n_pos"),
        // all-one-class targets have no evidence scale at all: null out
        round(when(col("__pos") > 0 && col("__neg") > 0,
          log(posShare / negShare)), 6).as("woe"),
        round(when(col("__pos") > 0 && col("__neg") > 0,
          (posShare - negShare) * log(posShare / negShare)), 6)
          .as("iv_term"))
  }
}

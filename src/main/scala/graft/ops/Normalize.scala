package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature scaling for training data — the three normalizations a model
  * pipeline applies before fitting, each as one aggregation plus a pure
  * projection (no per-row state, no driver data).
  *
  * [[zscore]] and [[minmax]] reduce to a one-row stats frame joined back
  * as a broadcast cross join. [[ecdf]] (quantile normalization) needs the
  * value's rank: one groupBy(value) collapse, the two-level
  * [[Cumulative]] prefix pass for the cumulative counts, and a join back
  * on the value — the strategy left to AQE (distinct-value-sized frame,
  * same reasoning as Hypothesis.spearman).
  */
object Normalize {

  /** (x − μ)/σ (population σ; σ=0 → 0.0 so constant columns stay finite). */
  def zscore(df: DataFrame, valueCol: String,
      outputCol: String = "z"): DataFrame = {
    val x = col(valueCol).cast("double")
    val stats = df.agg(count(x).as("__n"), sum(x).as("__s"),
      sum(x * x).as("__q"))
      .select((col("__s") / col("__n")).as("__mean"),
        sqrt(greatest(col("__q") / col("__n") -
          pow(col("__s") / col("__n"), 2), lit(0.0))).as("__sd"))
    df.crossJoin(broadcast(stats))
      .withColumn(outputCol,
        when(col("__sd") > 0, (x - col("__mean")) / col("__sd"))
          .otherwise(lit(0.0)))
      .drop("__mean", "__sd")
  }

  /** (x − min)/(max − min) into [0, 1] (degenerate range → 0.0). */
  def minmax(df: DataFrame, valueCol: String,
      outputCol: String = "scaled"): DataFrame = {
    val x = col(valueCol).cast("double")
    val stats = df.agg(min(x).as("__lo"), max(x).as("__hi"))
    df.crossJoin(broadcast(stats))
      .withColumn(outputCol,
        when(col("__hi") > col("__lo"),
          (x - col("__lo")) / (col("__hi") - col("__lo")))
          .otherwise(lit(0.0)))
      .drop("__lo", "__hi")
  }

  /** Empirical CDF transform: x → P(X ≤ x) = (#rows ≤ x)/n — rank
    * normalization onto (0, 1], monotone and outlier-immune. Ties share
    * one ECDF value (the inclusive count), matching SQL
    * `cume_dist()` exactly.
    */
  def ecdf(df: DataFrame, valueCol: String,
      outputCol: String = "ecdf"): DataFrame = {
    val x = col(valueCol).cast("double")
    val byV = df.select(x.as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__cnt"))
    val withCum = Cumulative.runningSums(byV, "__v", Seq("__cnt"))
    val total = byV.agg(sum("__cnt").as("__n"))
    val mapped = withCum.crossJoin(broadcast(total))
      .select(col("__v"),
        (col("__cnt_cum").cast("double") / col("__n")).as(outputCol))
    df.join(mapped, x <=> col("__v")).drop("__v")
  }

  /** Winsorization: clamp into the [pLo, pHi] exact interpolated
    * percentile interval — the standard outlier-limiting transform before
    * moment-based statistics. Exact `percentile` is a sort-based
    * aggregation (the q33 trade — the right oracle twin); pass
    * `approx = true` for the bounded-memory `percentile_approx` sketch at
    * extreme scale (the q58 pattern: same shape, rows-only guarantees).
    * One aggregation to a one-row bounds frame, broadcast, pure clamp
    * projection.
    */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double = 0.01,
      pHi: Double = 0.99, outputCol: String = "w",
      approx: Boolean = false): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad bounds [$pLo, $pHi]")
    val x = col(valueCol).cast("double")
    val (qLo, qHi) =
      if (approx) (percentile_approx(x, lit(pLo), lit(10000)),
        percentile_approx(x, lit(pHi), lit(10000)))
      else (percentile(x, lit(pLo)), percentile(x, lit(pHi)))
    val bounds = df.agg(qLo.as("__lo"), qHi.as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outputCol, least(greatest(x, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}

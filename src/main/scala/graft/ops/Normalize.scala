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
}

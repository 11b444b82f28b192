package graft.glm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-explanation readouts. Both are pure aggregation shapes: for the
  * model classes in this repo (linear/GLM coefficients, tree/boosted
  * literal-CASE scorers) explanations need no per-row model evaluation
  * service — an intervention is just another column expression, so global
  * importance and effect curves come out of ONE scan each.
  */
object Explain {

  /** Exact Shapley attribution for a LINEAR model: for f(x) = β₀ + Σβⱼxⱼ
    * the Shapley value of feature j on row x is φⱼ(x) = βⱼ·(xⱼ − x̄ⱼ)
    * exactly (linearity makes every coalition ordering agree). This
    * returns the GLOBAL importance table: per feature, mean |φ| and its
    * share of the total.
    *
    * Two passes: one means aggregate, one fused mean-absolute-deviation
    * aggregate with the means as literals. Output rows ordered as
    * `xCols`; `share` divides by the xCols-ordered sum.
    *
    * @param coefs coefs(0) = intercept (ignored by attribution),
    *              coefs(j) pairs with xCols(j−1) — the [[LM]] layout
    */
  def linearAttribution(df: DataFrame, xCols: Seq[String],
      coefs: Array[Double]): DataFrame = {
    require(coefs.length == xCols.length + 1,
      s"need ${xCols.length + 1} coefs (intercept first), got ${coefs.length}")
    val spark = df.sparkSession
    val meansRow = df.agg(
      avg(col(xCols.head).cast("double")).as("m0"),
      xCols.tail.zipWithIndex.map { case (c, i) =>
        avg(col(c).cast("double")).as(s"m${i + 1}") }: _*).head()
    val means = xCols.indices.map(reqDouble(meansRow, _, "feature mean"))
    val devRow = df.agg(
      avg(abs(col(xCols.head).cast("double") - lit(means(0)))).as("d0"),
      xCols.tail.zipWithIndex.map { case (c, i) =>
        avg(abs(col(c).cast("double") - lit(means(i + 1)))).as(s"d${i + 1}")
      }: _*).head()
    val rows = xCols.zipWithIndex.map { case (c, j) =>
      val beta = coefs(j + 1)
      (c, beta, math.abs(beta) * reqDouble(devRow, j, s"mean |$c - mean|"))
    }
    val total = rows.map(_._3).sum // xCols order — mirrored by oracles
    import spark.implicits._
    rows.map { case (c, b, m) => (c, b, m, m / total) }
      .toDF("feature", "beta", "mean_abs_phi", "share")
  }

  /** Partial dependence: PD(g) = mean over rows of the model score with
    * the intervened feature forced to g (Friedman 2001). `scoreAt(g)`
    * must build the scoring expression with the grid literal substituted
    * — e.g. `g => boosted.predictMicroExprWith(f => if (f == "x") g
    * else col(f))`. ONE aggregation evaluates the whole grid: each grid
    * point is one aggregate column, so the data is scanned once however
    * fine the grid.
    */
  def partialDependence(df: DataFrame, grid: Seq[Double],
      scoreAt: Column => Column): DataFrame = {
    require(grid.nonEmpty, "need at least one grid value")
    val spark = df.sparkSession
    val aggs = grid.zipWithIndex.map { case (g, i) =>
      avg(scoreAt(lit(g))).as(s"pd_$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    import spark.implicits._
    grid.zipWithIndex.map { case (g, i) =>
        (g, reqDouble(row, i, s"partial dependence at grid $g")) }
      .toDF("value", "pd")
  }

  /** Loud failure on the null an empty frame / all-null column yields
    * from an `avg` aggregate, instead of a bare NullPointerException.
    */
  private def reqDouble(row: org.apache.spark.sql.Row, i: Int,
      what: String): Double = {
    require(!row.isNullAt(i),
      s"$what is null — empty input or all-null feature column")
    row.getDouble(i)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted order statistics — quantiles where each row carries a mass
  * (token counts, revenue, sampling weights). Spark's `percentile`
  * family is unweighted; the scalable weighted form is a distinct-value
  * collapse + cumulative mass pass.
  *
  * Convention: the weighted q-quantile is the SMALLEST value whose
  * cumulative weight reaches q·W (the inverted-CDF / lower-quantile
  * definition — exact, no interpolation, so the result is always an
  * observed value and cross-engine reproducible).
  *
  * Execution: ONE groupBy(value) shuffle reduces the data to the
  * distinct-value frame; the cumulative runs through the two-level
  * [[Cumulative.runningSums]] pass (no single-task data window); all
  * |qs| selections are conditional-min expressions in ONE aggregation
  * of that frame. With integral weights every comparison is exact.
  */
object Weighted {

  /** @param qs quantile levels in (0, 1]
    * @return (q, value) — one row per requested level; null value only
    *         when the total weight is 0
    */
  def weightedQuantiles(df: DataFrame, valueCol: String, weightCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantile levels must be in (0, 1]: $qs")
    val byV = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(sum(col(weightCol)).as("__w"))
    val cum = Cumulative.runningSums(byV, "__v", Seq("__w"))
    // grand = total mass off the COLLAPSED frame — reading max(__w_cum)
    // would execute the whole two-level cumulative chain a second time
    val grand = byV.agg(sum("__w").as("__grand"))
    val picks = qs.zipWithIndex.map { case (q, i) =>
      min(when(col("__w_cum").cast("double") >=
        lit(q) * col("__grand").cast("double"), col("__v"))).as(s"__p_$i")
    }
    val one = cum.crossJoin(broadcast(grand))
      .agg(picks.head, picks.tail: _*)
    one.select(inline(array(qs.zipWithIndex.map { case (q, i) =>
      struct(lit(q).as("q"), col(s"__p_$i").as("value"))
    }: _*)))
  }
}

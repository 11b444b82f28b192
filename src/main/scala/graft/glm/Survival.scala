package graft.glm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event estimation: the Kaplan–Meier product-limit survival
  * curve with right censoring — churn, time-to-conversion, component
  * lifetime. Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times tᵢ
  * with dᵢ events among nᵢ still at risk.
  *
  * Execution: ONE (group, duration) aggregation shuffle, then window
  * arithmetic over the per-group curve frame (|distinct durations| rows —
  * orders of magnitude smaller than the data). The running product is
  * computed as exp(Σ ln(1 − d/n)) over the time-ordered frame; the
  * cumulative sum is evaluated sequentially in that same order by any
  * engine, so the result is cross-engine reproducible (unlike a parallel
  * product reduction). The everyone-fails factor (d = n, survival → 0) is
  * handled explicitly with a cumulative flag: Spark's `log(0)` is null
  * (and `sum` would silently skip it) while other engines raise — neither
  * is the product-limit semantics, so the zero never reaches `ln`.
  */
object Survival {

  /** Kaplan–Meier curve, optionally one per group.
    *
    * @param durationCol numeric time-to-event-or-censoring
    * @param eventCol    1 = event observed, 0 = right-censored
    * @return per (group,) distinct duration `t`: (t, n_risk, d, c,
    *         survival) ordered within group by t; censored-only times
    *         carry factor 1 and so just step n_risk down
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val agg = df.groupBy((g :+ col(durationCol).as("t")): _*)
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("c"))
    val wAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrior = Window.partitionBy(g: _*).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(g: _*).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg
      .withColumn("n_risk", sum(col("d") + col("c")).over(wAll) -
        coalesce(sum(col("d") + col("c")).over(wPrior), lit(0L)))
      .withColumn("__z", when(col("d") === col("n_risk"), 1).otherwise(0))
      .withColumn("survival",
        when(max("__z").over(wRun) === 1, lit(0.0))
          .otherwise(exp(sum(
            when(col("d") < col("n_risk"),
              log(lit(1.0) - col("d").cast("double") / col("n_risk")))
              .otherwise(lit(0.0))).over(wRun))))
      .drop("__z")
  }
}

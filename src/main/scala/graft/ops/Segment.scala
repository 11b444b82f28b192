package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Customer-value segmentation: RFM (recency / frequency / monetary)
  * scoring — the standard marketing-analytics operator over an order or
  * event fact.
  *
  * Per key: recency = days between the key's last activity and the
  * GLOBAL last activity; frequency = row count; monetary = amount summed
  * in integral cents (exact — never a float summation channel). Each
  * metric is then scored into rank-based quartiles 1..4.
  *
  * Quartiles are CUMULATIVE-SHARE ranks, not `ntile`: score(v) =
  * ceil(4·cum(v)/n) where cum(v) counts keys with metric ≤ v. Ties share
  * a score (a total function of the VALUE — deterministic and
  * engine-reproducible, where ntile splits ties by physical order), and
  * the arithmetic is an integer ratio through one IEEE division — exact
  * cross-engine (the true value is at least 1/n from the next integer,
  * 11 orders of magnitude above the division's ulp for any real key
  * count).
  *
  * Execution: ONE keyed aggregation to the per-key frame; per metric,
  * a distinct-value collapse + the two-level [[Cumulative.runningSums]]
  * pass (no single-task data window) + one value equi-join back — all
  * shuffles carry (key) or (distinct metric value), never data².
  *
  * Score orientation: 4 is always "best" — most recent, most frequent,
  * highest spend.
  */
object Segment {

  /** @param keyCol    entity (customer) key
    * @param tsCol     activity timestamp (date or timestamp)
    * @param amountCol monetary amount (cast to cents internally)
    * @return (key, recency_days, frequency, monetary_cents, r_score,
    *         f_score, m_score, rfm) — `rfm` is the concatenated "432"
    *         segment label
    */
  def rfm(df: DataFrame, keyCol: String, tsCol: String,
      amountCol: String): DataFrame = {
    val base0 = df.groupBy(col(keyCol).as("key"))
      .agg(max(col(tsCol)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(round(col(amountCol) * 100).cast("long")).as("monetary_cents"))
    val ref = base0.agg(max("__last").as("__ref"))
    val base = base0.crossJoin(broadcast(ref))
      .withColumn("recency_days",
        datediff(col("__ref"), col("__last")).cast("long"))
      .drop("__last", "__ref")

    // rank-based quartile map for one metric: distinct values → cum key
    // count → ceil(4·cum/n); joined back by value (AQE sizes the join)
    def scoreMap(metric: String, ascIsBest: Boolean): DataFrame = {
      val dist = base.groupBy(col(metric).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val cum = Cumulative.runningSums(dist, "__v", Seq("__c"))
      val n = cum.agg(sum("__c").as("__n"))
      val q = cum.crossJoin(broadcast(n)).select(col("__v"),
        ceil(lit(4.0) * col("__c_cum").cast("double") /
          col("__n").cast("double")).cast("int").as("__q"))
      // ascending cum: low values land in group 1. recency: low = best
      // → score = 5 - q; frequency/monetary: high = best → score = q
      q.select(col("__v"),
        (if (ascIsBest) lit(5) - col("__q") else col("__q")).as("__s"))
    }

    val rMap = scoreMap("recency_days", ascIsBest = true)
    val fMap = scoreMap("frequency", ascIsBest = false)
    val mMap = scoreMap("monetary_cents", ascIsBest = false)
    base
      .join(rMap.withColumnRenamed("__s", "r_score"),
        col("recency_days") === rMap("__v")).drop("__v")
      .join(fMap.withColumnRenamed("__s", "f_score"),
        col("frequency") === fMap("__v")).drop("__v")
      .join(mMap.withColumnRenamed("__s", "m_score"),
        col("monetary_cents") === mMap("__v")).drop("__v")
      .withColumn("rfm", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .withColumnRenamed("key", keyCol)
  }

  /** Cohort lifetime-value curve: entities grouped by their FIRST
    * activity month (the cohort), revenue accumulated by months-since
    * (the age) — the standard LTV/retention-revenue matrix.
    *
    * Month arithmetic is exact integers (year·12 + month), revenue sums
    * as integral cents; the cumulative runs per cohort over age-bounded
    * partitions (≤ the observation span in months — a calendar-sized
    * window, never data). Shuffles: one (key) agg for cohorts, one
    * (cohort, age) agg, one cohort-keyed window.
    *
    * @return (cohort, age_months, n_orders, revenue_cents,
    *         cum_revenue_cents) — cohort as the month's first day
    */
  def cohortLtv(df: DataFrame, keyCol: String, tsCol: String,
      amountCol: String): DataFrame = {
    val monthIdx = (year(col(tsCol)) * 12 + month(col(tsCol))).cast("long")
    val rows = df.select(col(keyCol).as("key"), monthIdx.as("__m"),
      date_trunc("month", col(tsCol)).as("__month"),
      round(col(amountCol) * 100).cast("long").as("__cents"))
    val cohorts = rows.groupBy("key")
      .agg(min("__m").as("__cm"), min("__month").as("cohort"))
    val byAge = rows.join(cohorts, "key")
      .groupBy(col("cohort"), (col("__m") - col("__cm")).as("age_months"))
      .agg(count(lit(1)).as("n_orders"), sum("__cents").as("revenue_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort").orderBy("age_months")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    byAge.withColumn("cum_revenue_cents", sum("revenue_cents").over(w))
  }
}

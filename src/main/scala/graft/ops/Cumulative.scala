package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe ordered running sums — the building block under ECDFs, ROC
  * curves and average ranks, where the naive formulation is
  * `Window.orderBy(v)` with no partition: correct, but a SINGLE task sorts
  * and scans the whole frame. Fine when the frame is a few thousand
  * distinct scores; a scale-killer when the values are continuous and the
  * "reduced" distinct frame is still ~n rows.
  *
  * [[runningSums]] is the classic two-level prefix sum instead:
  *
  *  1. range-partition the frame by the order column (explicit partition
  *     count, so AQE never re-splits it) and take per-bucket running sums
  *     with an ordinary partitioned window — parallel, codegen'd;
  *  2. aggregate one total row per bucket (a bucket-count-sized frame),
  *     turn those into exclusive per-bucket offsets with a window over
  *     that TINY frame (the only single-task ordered pass, sized at the
  *     bucket count, never the data), and broadcast-join the offsets back.
  *
  * The result equals the global running sum exactly — integer/float sums
  * reassociate across buckets only at bucket boundaries, the same
  * partial-aggregation contract every distributed `sum` already makes.
  */
object Cumulative {

  /** Appends `<c>_cum` (inclusive running sum ordered by `orderCol`) for
    * each column in `valueCols`. Rows with equal `orderCol` values are one
    * rank: callers collapse duplicates first (groupBy(v)), which every
    * call site in this repo does.
    *
    * @param numPartitions range-bucket count; 0 → the session's shuffle
    *                      parallelism
    */
  def runningSums(df: DataFrame, orderCol: String, valueCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val nPart = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // explicit partition count = "user-specified" to AQE, which therefore
    // neither coalesces nor re-splits it: the bucket ids are stable across
    // the two consumers below (window pass + totals pass) of one exchange
    val bucketed = df.repartitionByRange(nPart, col(orderCol))
      .withColumn("__b", spark_partition_id())
    val wIn = Window.partitionBy("__b").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(bucketed) { (d, c) =>
      d.withColumn(s"${c}_cum", sum(c).over(wIn))
    }
    val totals = bucketed.groupBy("__b")
      .agg(sum(valueCols.head).as(s"__t_${valueCols.head}"),
        valueCols.tail.map(c => sum(c).as(s"__t_$c")): _*)
    // the ONE unpartitioned ordered pass: bucket-count rows, not data rows
    val wOff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("__b") +:
      valueCols.map(c => coalesce(sum(s"__t_$c").over(wOff), lit(0L))
        .as(s"__o_$c")): _*)
    val joined = local.join(broadcast(offsets), "__b")
    valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_cum", col(s"${c}_cum") + col(s"__o_$c"))
        .drop(s"__o_$c")
    }.drop("__b")
  }
}

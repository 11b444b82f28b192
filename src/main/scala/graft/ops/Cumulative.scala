package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  *  1. split the frame into range buckets and take per-bucket running
  *     sums with an ordinary partitioned window — parallel, codegen'd;
  *  2. aggregate one total row per bucket (a bucket-count-sized frame),
  *     turn those into exclusive per-bucket offsets with a window over
  *     that TINY frame (the only single-task ordered pass, sized at the
  *     bucket count, never the data), and broadcast-join the offsets back.
  *
  * The bucket id is a PURE FUNCTION OF THE VALUE — a comparison ladder
  * over approximate-quantile edges fetched once to the driver — never
  * `spark_partition_id()` over a `repartitionByRange`. The frame is
  * consumed twice (window pass + totals pass), and nothing guarantees
  * Spark reuses one exchange for both: when it does not, each execution
  * of a range exchange SAMPLES ITS OWN BOUNDARIES, the two passes
  * disagree on which rows belong to which bucket, and the offsets
  * silently corrupt the result. Value-deterministic bucketing makes the
  * two passes agree on any physical plan, at the cost of one extra
  * `approxQuantile` pass (nPart−1 doubles to the driver) at build time.
  *
  * The result equals the global running sum exactly — integer/float sums
  * reassociate across buckets only at bucket boundaries, the same
  * partial-aggregation contract every distributed `sum` already makes.
  */
object Cumulative {

  /** Quantile-edge comparison ladder: bucket = #edges strictly passed in
    * the walk direction. Null order values route to the first bucket
    * ascending (Spark ASC = NULLS FIRST) and the last bucket descending
    * (DESC = NULLS LAST), matching the in-bucket window's null placement.
    */
  private def bucketExpr(df: DataFrame, orderCol: String, nPart: Int,
      descending: Boolean, preEdges: Option[Array[Double]]): Column = {
    val edges = preEdges.getOrElse(bucketEdges(df, orderCol, nPart))
    val ladder =
      if (descending)
        edges.foldLeft(lit(0)) { (acc, e) =>
          acc + when(col(orderCol) < e, 1).otherwise(0) }
      else
        edges.foldLeft(lit(0)) { (acc, e) =>
          acc + when(col(orderCol) > e, 1).otherwise(0) }
    if (descending) when(col(orderCol).isNull, lit(edges.length)).otherwise(ladder)
    else ladder
  }

  /** The range-bucket edges [[runningSums]] derives from `orderCol`'s
    * distribution — exposed so ITERATIVE callers whose order column is
    * loop-invariant (Cox's distinct event times) can compute them ONCE
    * and pass them to every round's [[runningSums]] call instead of
    * paying an approxQuantile data pass per iteration.
    */
  def bucketEdges(df: DataFrame, orderCol: String,
      numPartitions: Int = 0): Array[Double] = {
    val nPart = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val probs = (1 until nPart).map(_.toDouble / nPart).toArray
    if (probs.isEmpty) Array.empty[Double]
    else df.stat.approxQuantile(orderCol, probs, 0.01).distinct.sorted
  }

  private def runningAgg(df: DataFrame, orderCol: String,
      valueCols: Seq[String], descending: Boolean, numPartitions: Int,
      suffix: String, aggFn: String => Column,
      combine: (Column, Column) => Column,
      preEdges: Option[Array[Double]]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val nPart = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val bucketed = df.withColumn("__b",
      bucketExpr(df, orderCol, nPart, descending, preEdges))
    val sortExpr = if (descending) col(orderCol).desc else col(orderCol).asc
    val wIn = Window.partitionBy("__b").orderBy(sortExpr)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(bucketed) { (d, c) =>
      d.withColumn(s"$c$suffix", aggFn(c).over(wIn))
    }
    val totals = bucketed.groupBy("__b")
      .agg(aggFn(valueCols.head).as(s"__t_${valueCols.head}"),
        valueCols.tail.map(c => aggFn(c).as(s"__t_$c")): _*)
    // buckets are numbered in walk order either way, so the offset pass
    // always scans ascending bucket ids — bucket-count rows, never data
    val wOff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("__b") +:
      valueCols.map(c => aggFn(s"__t_$c").over(wOff).as(s"__o_$c")): _*)
    val joined = local.join(broadcast(offsets), "__b")
    valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"$c$suffix", combine(col(s"$c$suffix"), col(s"__o_$c")))
        .drop(s"__o_$c")
    }.drop("__b")
  }

  /** Appends `<c>_cum` (inclusive running sum ordered by `orderCol`) for
    * each column in `valueCols`. Rows with equal `orderCol` values are one
    * rank: callers collapse duplicates first (groupBy(v)), which every
    * call site in this repo does. `orderCol` must be numeric (the bucket
    * edges come from `approxQuantile`).
    *
    * @param numPartitions range-bucket count; 0 → the session's shuffle
    *                      parallelism
    */
  def runningSums(df: DataFrame, orderCol: String, valueCols: Seq[String],
      numPartitions: Int = 0, descending: Boolean = false,
      edges: Option[Array[Double]] = None): DataFrame =
    runningAgg(df, orderCol, valueCols, descending, numPartitions,
      suffix = "_cum", aggFn = c => sum(c),
      // first bucket's offset is null → contribute 0
      combine = (l, o) => l + coalesce(o, lit(0L)),
      preEdges = edges)

  /** Appends `<c>_cummin` (inclusive running MIN ordered by `orderCol`,
    * optionally descending) for each column in `valueCols` — the same
    * two-level bucket structure as [[runningSums]] with `min` as the
    * combine. Unlike sums, min is fully associative-commutative over
    * floats too, so the result is bit-identical to the single-window form
    * on any bucketing.
    *
    * The descending variant is the suffix-min building block (e.g.
    * Benjamini–Hochberg step-up: q_i = min over all LARGER p of c_j).
    */
  def runningMins(df: DataFrame, orderCol: String, valueCols: Seq[String],
      descending: Boolean = false, numPartitions: Int = 0,
      edges: Option[Array[Double]] = None): DataFrame =
    runningAgg(df, orderCol, valueCols, descending, numPartitions,
      suffix = "_cummin", aggFn = c => min(c),
      // Spark's least skips nulls, so the first bucket's null offset is a
      // no-op rather than poisoning the min
      combine = (l, o) => least(l, o),
      preEdges = edges)
}

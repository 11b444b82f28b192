package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): approximate
  * per-key counts in FIXED memory — d·w integer counters regardless of
  * key cardinality. The bounded-memory companion to
  * [[TopK.heavyHitters]] (which keeps candidate keys) and the counting
  * sibling of `approx_count_distinct`'s HLL (which only sizes the key
  * set): estimate(k) = min over d rows of counter[r][h_r(k)], always an
  * OVER-estimate (collisions only add), within εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Unlike HLL, the sketch is exactly replayable: hashes are md5-derived
  * (the engine-reproducible q236 mapping) and counters are exact
  * integer sums, so estimates are bit-identical on any engine and any
  * partitioning — the sketch gets a full hash-equality oracle, not a
  * tolerance band.
  *
  * Scale shape: the build explodes each row into its d (row, col) cells,
  * but hash partial aggregation collapses every partition to ≤ d·w cells
  * before the shuffle — the exchange carries O(partitions · d · w)
  * counter rows, never data. Estimation joins the ≤ d·w-row sketch
  * (broadcast) against the probe keys: one narrow broadcast join + one
  * min-agg per key.
  */
object Sketch {

  /** Row-r column index of `key`: md5("r#key") mod width. */
  private def cell(r: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("#", r, key)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the d×w counter table from one pass over `df`.
    *
    * @param weightCol optional non-negative integral weight (count each
    *                  row `weight` times); default 1 per row
    * @return occupied cells only: (row, col, counter) — absent cells
    *         are zero
    */
  def countMin(df: DataFrame, keyCol: String, width: Int, depth: Int,
      weightCol: Option[String] = None): DataFrame = {
    require(width >= 2, s"need width >= 2, got $width")
    require(depth >= 1, s"need depth >= 1, got $depth")
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    // ONE scan: explode each row into its d cells; hash partial
    // aggregation collapses a partition to ≤ d·w cells pre-shuffle
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), w.as("__w"))
      .withColumn("row", explode(array((0 until depth).map(lit): _*)))
      .select(col("row"), cell(col("row"), col("__k"), width).as("col"),
        col("__w"))
      .groupBy("row", "col").agg(sum("__w").as("counter"))
  }

  /** Point-estimate the count of every key in `keys` from a built
    * sketch: min over the d rows of the key's counter (0 when the cell
    * is unoccupied — the key was never seen). The sketch (≤ d·w rows,
    * bounded by construction) broadcasts.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame = {
    require(width >= 2 && depth >= 1)
    val probes = keys.select(col(keyCol))
      .withColumn("row", explode(array((0 until depth).map(lit): _*)))
      .withColumn("col", cell(col("row"), col(keyCol), width))
    probes.join(broadcast(sketch), Seq("row", "col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("counter"), lit(0L))).as("estimate"))
  }
}

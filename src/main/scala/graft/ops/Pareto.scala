package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto / ABC contribution analysis: rank keys by their share of a
  * total and classify them A (the head that carries `aPct`% of mass),
  * B (up to `bPct`%), C (the tail) — the inventory/revenue-concentration
  * staple, and for corpus work the "which sources carry 80% of tokens"
  * question.
  *
  * Scale shape: per-key totals are ONE aggregation; the cumulative runs
  * on the DISTINCT-total frame through the two-level
  * [[Cumulative.runningSums]] pass (keys with equal totals share one
  * rank and one class — the only well-defined choice), so no data-sized
  * frame ever funnels through a single-task window. Class boundaries
  * compare exact integers (cents × percent), so classification cannot
  * flake on a float grid.
  */
object Pareto {

  /** @param aPct head boundary in whole percent (default 80)
    * @param bPct A+B boundary in whole percent (default 95)
    * @return (key, total, share, cum_share, abc_class): totals descend;
    *         share/cum_share on a 6-digit grid; `cum_share` is the share
    *         of all keys with totals ≥ this key's (ties included)
    */
  def abcClassify(df: DataFrame, keyCol: String, valueCol: String,
      aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(aPct >= 1 && bPct > aPct && bPct <= 100,
      s"need 1 <= aPct < bPct <= 100, got $aPct/$bPct")
    val cents = round(col(valueCol) * 100, 0).cast("long")
    val totals = df.groupBy(col(keyCol).as("key"))
      .agg(sum(cents).as("v"))
    // distinct-total collapse: nk keys share total v → one cumulative rank
    val byV = totals.groupBy("v")
      .agg(count(lit(1)).as("__nk"))
      .withColumn("__vsum", col("v") * col("__nk"))
      .withColumn("__negv", -col("v"))
    val cum = Cumulative.runningSums(byV, "__negv", Seq("__vsum"))
      .select(col("v").as("__cv"), col("__vsum_cum"))
    val grand = totals.agg(sum("v").as("__grand"))
    totals.join(cum, col("v") === col("__cv"))
      .crossJoin(broadcast(grand))
      .select(col("key"), (col("v") / 100.0).as("total"),
        round(col("v").cast("double") / col("__grand"), 6).as("share"),
        round(col("__vsum_cum").cast("double") / col("__grand"), 6)
          .as("cum_share"),
        // integer boundary test: cum·100 ≤ pct·grand — no float grid
        when(col("__vsum_cum") * 100 <= col("__grand") * aPct, "A")
          .when(col("__vsum_cum") * 100 <= col("__grand") * bPct, "B")
          .otherwise("C").as("abc_class"))
  }
}

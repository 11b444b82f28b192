package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record consolidation — the last step of entity resolution:
  * once duplicate records are clustered (fuzzy pairs → connected
  * components, the q120/q73 stack), each cluster must collapse to ONE
  * canonical record. The standard survivorship rule is per-attribute
  * majority vote: the most frequent non-null value wins, ties break
  * toward the smallest value — a total order, so consolidation is
  * deterministic on any engine and any partitioning.
  *
  * Execution: attributes are melted to (cluster, attr, value) rows —
  * ONE Expand pass over the input, the Profile.summarize discipline —
  * counted in ONE aggregation, ranked by a keyed window over the
  * (cluster, attr, value) vote frame, and pivoted back with a fixed
  * when-ladder projection. Nothing is ever cluster-count × attribute
  * sized; every shuffle carries vote rows.
  */
object Consolidate {

  /** One canonical row per cluster: each of `attrCols` becomes its
    * cluster's majority non-null value (ties → smallest), cast to string
    * for the vote (mixed attribute types share one melt column — the
    * golden record is a string view, the usual survivorship contract).
    * Clusters where an attribute is all-null yield null.
    *
    * @return (clusterCol, n_records, <attrCols...>)
    */
  def goldenRecord(df: DataFrame, clusterCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val votes = df.select(col(clusterCol).as("__cl"),
        inline(array(attrCols.map(a =>
          struct(lit(a).as("__attr"),
            col(a).cast("string").as("__value"))): _*)))
      .filter(col("__value").isNotNull)
      .groupBy("__cl", "__attr", "__value")
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy("__cl", "__attr")
      .orderBy(col("__n").desc, col("__value"))
    val winners = votes.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
    val sizes = df.groupBy(col(clusterCol).as("__cl"))
      .agg(count(lit(1)).as("n_records"))
    val picks = attrCols.map(a =>
      max(when(col("__attr") === a, col("__value"))).as(a))
    val golden = winners.groupBy("__cl").agg(picks.head, picks.tail: _*)
    sizes.join(golden, Seq("__cl"), "left")
      .select(col("__cl").as(clusterCol) +: col("n_records") +:
        attrCols.map(col): _*)
  }
}

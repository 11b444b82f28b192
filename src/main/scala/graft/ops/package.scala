package graft

import org.apache.spark.sql.DataFrame

package object ops {

  /** Spread a narrow input across the cluster before per-row-expensive
    * stages. A single-file (single-row-group) parquet source arrives as ONE
    * partition no matter how many cores exist, serializing every signature/
    * scoring kernel downstream; at real scale inputs have many splits and
    * this is a no-op. The round-robin shuffle of the (small) input costs
    * far less than running the kernels on one core. The class, when to
    * apply it and when not to, and the plan-level regression net that
    * pins it (PlanSpec check 6) are documented in COVERAGE.md §"The
    * fanOut class".
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else df.repartition(target)
  }
}

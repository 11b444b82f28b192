package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts in ONE aggregation
  * pass (Spark plans the multi-column `countDistinct` set through a single
  * Expand — k columns cost one scan with a ×k row expansion, not k scans),
  * unpivoted to one row per column. The first data-quality pass a pipeline
  * runs on an unknown 100 TB table; exact distincts — swap
  * `approx_count_distinct` in at scale for the HLL++ version (the
  * q60/q61 twin pattern).
  */
object Profile {

  /** @return (column, n_rows, n_nulls, n_distinct) — one row per requested
    *         column; `n_distinct` counts non-null values
    */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(cols.forall(df.columns.contains), "unknown column requested")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"), countDistinct(col(c)).as(s"__nd_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // single-row frame → one output row per column (tiny, driver-free)
    val structs = array(cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))
    }: _*)
    row.select(explode(structs).as("p")).select("p.*")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout writers: cluster data on disk so scans can skip it.
  *
  * Parquet readers prune at two granularities — file level (Spark compares
  * the predicate against each file's footer min/max) and row-group level
  * (the parquet reader does the same per row group). Both only bite when
  * rows with nearby key values sit in the same file, which a shuffled
  * write actively destroys: after a hash shuffle every file spans the full
  * key range and no range predicate can skip anything. At 100 TB the
  * difference between "scan 3 of 4000 files" and "scan all of them" is
  * this write-side clustering, not anything the reader can recover later.
  */
object Layout {

  /** Write `df` as parquet range-clustered on `clusterCols`:
    * `repartitionByRange` gives each output file a narrow slice of the key
    * space (boundaries from reservoir sampling) and `sortWithinPartitions`
    * orders rows inside each file so row-group statistics are narrow too.
    * Range predicates on the leading cluster column then skip whole files
    * via footer stats — the 1-D special case of z-ordering, with no custom
    * reader needed.
    *
    * Skew note: `repartitionByRange` samples the key distribution, so a
    * hot key value lands in one (oversized) partition rather than
    * poisoning every file; pathological single-value skew should be
    * bucketed by a secondary column appended to `clusterCols`.
    */
  def writeRangeClustered(df: DataFrame, path: String,
      clusterCols: Seq[String], numFiles: Int): Unit = {
    require(clusterCols.nonEmpty && numFiles >= 1)
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}

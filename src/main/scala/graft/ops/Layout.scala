package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Write `df` as parquet z-ordered on `clusterCols`: every row gets a
    * z-value by bit-interleaving each column's equi-depth bucket rank, and
    * the data is range-partitioned and sorted by that z-value. Because the
    * interleave gives every column bits at every scale, a file's footer
    * min/max stays narrow on EACH cluster column — predicates on ANY of
    * them (not just the leading one, the range-clustered limitation) skip
    * files. The multi-column generalization of [[writeRangeClustered]].
    *
    * Bucket ranks are equi-depth (quantile boundaries from
    * `approxQuantile`, one driver-side pass), not linear min-max scaling,
    * so a skewed column still spreads across its 2^`bitsPerCol` buckets.
    * The z-value is computed by a closure UDF (binary search into the
    * boundary arrays + bit interleave — a literal-expression equivalent
    * would be 2^bits comparisons per row, interpreted); it runs once per
    * row on the write side only and never appears in the written schema.
    *
    * Cluster columns must be numeric, date, or timestamp (anything that
    * casts to double losslessly enough to rank on).
    */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int, bitsPerCol: Int = 12): Unit = {
    require(clusterCols.size >= 2,
      "z-order needs >= 2 cluster columns (use writeRangeClustered for 1)")
    require(numFiles >= 1 && bitsPerCol >= 1 &&
      bitsPerCol * clusterCols.size <= 62)
    import org.apache.spark.sql.types._
    val asDouble: Seq[Column] = clusterCols.map { c =>
      df.schema(c).dataType match {
        case DateType => col(c).cast(IntegerType).cast(DoubleType)
        case TimestampType | TimestampNTZType =>
          col(c).cast(LongType).cast(DoubleType)
        case _: NumericType => col(c).cast(DoubleType)
        case other => throw new IllegalArgumentException(
          s"z-order column $c has unsupported type $other")
      }
    }
    val nB = 1 << bitsPerCol
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    val ranked = df.select(asDouble.zipWithIndex.map {
      case (c, i) => c.as(s"__zc$i") }: _*)
    // one pass computes every column's boundaries (approxQuantile takes
    // multiple columns); nulls rank lowest (bucket 0)
    val bounds: Array[Array[Double]] = ranked.stat.approxQuantile(
      clusterCols.indices.map(i => s"__zc$i").toArray, probs, 0.001)
    val k = clusterCols.size
    val zUdf = udf { (vs: Seq[java.lang.Double]) =>
      val idx = new Array[Int](k)
      var c = 0
      while (c < k) {
        idx(c) =
          if (vs(c) == null) 0
          else {
            val b = bounds(c)
            var lo = 0; var hi = b.length // bucket = #boundaries <= v
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (b(mid) <= vs(c)) lo = mid + 1 else hi = mid
            }
            lo
          }
        c += 1
      }
      // interleave: bit i of column c lands at position i*k + (k-1-c),
      // so all columns share the high-order bits equally
      var z = 0L
      var bit = 0
      while (bit < bitsPerCol) {
        c = 0
        while (c < k) {
          z |= ((idx(c) >>> bit) & 1L) << (bit * k + (k - 1 - c))
          c += 1
        }
        bit += 1
      }
      z
    }
    df.withColumn("__z", zUdf(array(asDouble: _*)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the single latest right row
  * with equal keys and `right.ts <= left.ts` — an operator Spark lacks
  * natively.
  *
  * Spark-first formulation: encode both sides into ONE keyed, time-sorted
  * relation and carry the right side's values forward with a
  * `last(..., ignoreNulls)` running window, then keep the left rows. Cost
  * is one shuffle on the join keys and a per-key sort — no range-join
  * explosion, no per-row probing — which is exactly the shape that
  * survives 100 TB (it is how stream-table temporal joins execute).
  *
  * Ties: a right row at exactly left.ts IS visible (sorts before the left
  * row), matching ASOF `>=` semantics. Right rows must be unique per
  * (keys, ts) for a deterministic result.
  */
object AsofJoin {

  /** @param valueCols right-side columns to attach to each left row
    *                  (names must not collide with left columns)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty)
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      "valueCols must not collide with left columns")

    // The carried payload is ONE struct per right row (null only on left
    // placeholder rows), so last(ignoreNulls) keys on right-row PRESENCE:
    // a matching right row whose value column is genuinely NULL still wins,
    // instead of being skipped in favor of an older row's value.
    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(v => right.schema(v)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(keyCols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rvType).as("__rv"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(keyCols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__rv"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col("__rv").getField(v).as(v)): _*)
  }
}

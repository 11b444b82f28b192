package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance: fold a stream of keyed changes into a
  * snapshot (upsert with latest-wins + delete tombstones) and build
  * slowly-changing-dimension type-2 validity intervals. The lakehouse
  * table-maintenance pair: at 100 TB these run as ONE wide shuffle on the
  * merge key — no driver state, no per-key loops — and the per-key winner
  * selection is a window `row_number`, which Spark executes with partial
  * sort spilling rather than materializing groups.
  */
object Merge {

  /** Latest-wins upsert: apply `changes` on top of `snapshot` and return
    * the new snapshot. Per key the row with the highest `versionCol` wins
    * (ties broken toward the change side — `isChange` is the secondary
    * sort key, so re-applying the same version deterministically prefers
    * the change row); a winning change row whose `deleteCol` is true is a
    * tombstone and the key disappears.
    *
    * Both inputs must share the snapshot's schema (minus `deleteCol`,
    * which only the change side carries; pass `lit(false)` for plain
    * upserts). One union + one keyed window shuffle; output columns are
    * the snapshot's.
    */
  def upsertLatest(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String,
      deleteCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one merge key")
    val outCols = snapshot.columns.toSeq
    val del = deleteCol match {
      case Some(c) => col(c).cast("boolean")
      case None    => lit(false)
    }
    val base = snapshot.select(outCols.map(col): _*)
      .withColumn("__del", lit(false)).withColumn("__chg", lit(0))
    val chg = changes.select((outCols.map(col) :+ del.as("__del")): _*)
      .withColumn("__chg", lit(1))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__chg").desc)
    base.unionByName(chg)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__del"))
      .select(outCols.map(col): _*)
  }

  /** Slowly-changing-dimension type-2 history: turn a keyed change log
    * into validity intervals. Each version row becomes
    * `[valid_from, valid_to)` with `valid_to` = the next version's
    * timestamp (null while current) and an `is_current` flag.
    * One keyed window shuffle; ties on `tsCol` are broken by
    * `tieBreakCol` so colliding timestamps still produce a deterministic
    * interval chain.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreakCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieBreakCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}

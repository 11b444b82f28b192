package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison: classify every key of two table versions as
  * added / removed / changed / unchanged — the audit primitive behind
  * data-pipeline regression checks, CDC validation, and slowly-changing
  * reference data review.
  *
  * ONE keyed full-outer shuffle; the value comparison is a fused
  * null-safe conjunction over the shared non-key columns (codegen'd, no
  * row hashing — hash comparison would false-match on collisions and
  * false-differ on logically-equal values of different types).
  */
object Diff {

  /** Row-level diff of `newDf` against `oldDf` on `keys`.
    *
    * Both sides must share a schema (same non-key columns — checked);
    * keys are compared null-safely, so a null key component matches a
    * null key component.
    *
    * Keys are assumed unique per snapshot (the primary-key contract this
    * op exists to audit); duplicate keys multiply full-outer rows the
    * way any equi-join would.
    *
    * @return one row per key present on either side: key columns +
    *         `diff_status` ∈ added|removed|changed|unchanged
    */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(valueCols.sorted.sameElements(
      newDf.columns.filterNot(keys.contains).sorted),
      "old and new snapshots must share their non-key columns")
    val o = oldDf.select(
      keys.map(k => col(k).as(s"__ok_$k")) ++
        valueCols.map(c => col(c).as(s"__ov_$c")) :+
        lit(1).as("__in_old"): _*)
    val n = newDf.select(
      keys.map(k => col(k).as(s"__nk_$k")) ++
        valueCols.map(c => col(c).as(s"__nv_$c")) :+
        lit(1).as("__in_new"): _*)
    val keyEq = keys.map(k => col(s"__ok_$k") <=> col(s"__nk_$k"))
      .reduce(_ && _)
    val same = valueCols.map(c => col(s"__ov_$c") <=> col(s"__nv_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyEq, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"__nk_$k"), col(s"__ok_$k")).as(k)) :+
          when(col("__in_old").isNull, lit("added"))
            .when(col("__in_new").isNull, lit("removed"))
            .when(same, lit("unchanged"))
            .otherwise(lit("changed")).as("diff_status"): _*)
  }

  /** Per-column change breakdown over the keys present on BOTH sides:
    * for each shared non-key column, how many matched keys changed it
    * (null-safe comparison). One keyed inner-join shuffle + one
    * conditional-sum aggregation; the melt to long form is a fixed
    * `inline` projection of the one-row counts.
    *
    * @return (column, n_changed, n_matched) — one row per non-key column
    */
  def columnChanges(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "need at least one non-key column")
    require(valueCols.sorted.sameElements(
      newDf.columns.filterNot(keys.contains).sorted),
      "old and new snapshots must share their non-key columns")
    val o = oldDf.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"__ov_$c")): _*)
    val nw = newDf.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"__nv_$c")): _*)
    val counts = o.join(nw, keys).agg(
      count(lit(1)).as("__n"),
      valueCols.map(c =>
        sum(when(!(col(s"__ov_$c") <=> col(s"__nv_$c")), 1L).otherwise(0L))
          .as(s"__c_$c")): _*)
    counts.select(inline(array(valueCols.map(c =>
        struct(lit(c).as("column"), col(s"__c_$c").as("n_changed"),
          col("__n").as("n_matched"))): _*)))
  }

  /** The one-row rollup of [[tableDiff]]: counts per status. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame =
    tableDiff(oldDf, newDf, keys)
      .agg(
        sum(when(col("diff_status") === "added", 1).otherwise(0)).as("n_added"),
        sum(when(col("diff_status") === "removed", 1).otherwise(0)).as("n_removed"),
        sum(when(col("diff_status") === "changed", 1).otherwise(0)).as("n_changed"),
        sum(when(col("diff_status") === "unchanged", 1).otherwise(0)).as("n_unchanged"))
}

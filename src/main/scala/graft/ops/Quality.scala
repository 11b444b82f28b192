package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ-style contract a
  * pipeline asserts on every ingested batch before it reaches training:
  * nulls, key uniqueness, value ranges, format patterns, referential
  * integrity.
  *
  * Scale shape: every row-local rule (not-null / range / pattern) costs a
  * conditional sum and the Unique rules a `countDistinct`, all fused into
  * ONE aggregation pass over the table (the Profile.summarize discipline
  * — k rules, one scan). Only ForeignKey rules need joins: one left-anti
  * count each against the (usually broadcastable) key side, strategy left
  * to AQE.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** `col` must not be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** `cols` must be unique together; violations = rows beyond the first
    * of each duplicated key (NULL-keyed rows group like any value).
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Non-null values must match the (Java/RE2-common) regex via `rlike`
    * (unanchored find — anchor explicitly for full-string matches).
    */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = s"matches($col)"
  }
  /** Every non-null `fkCol` value must exist in `dim`'s `pkCol`. */
  final case class ForeignKey(dim: DataFrame, fkCol: String, pkCol: String,
      dimName: String) extends Rule {
    def name = s"foreign_key($fkCol->$dimName.$pkCol)"
  }

  /** One row per rule, in the given rule order: (rule, violations).
    * `violations == 0` means the expectation holds.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val scalarRules = rules.filter(!_.isInstanceOf[ForeignKey])
    val fkRules = rules.collect { case f: ForeignKey => f }

    def violationAgg(r: Rule): Column = r match {
      case NotNull(c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L))
      case Unique(cols) =>
        count(lit(1)) - countDistinct(struct(cols.map(col): _*))
      case InRange(c, lo, hi) =>
        sum(when(col(c).isNotNull &&
          !(col(c).cast("double") >= lo && col(c).cast("double") <= hi),
          1L).otherwise(0L))
      case Matches(c, re) =>
        sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
      case _: ForeignKey =>
        throw new IllegalStateException("FK handled separately")
    }

    val scalarReport: Option[DataFrame] =
      if (scalarRules.isEmpty) None
      else {
        val aggs = scalarRules.zipWithIndex.map { case (r, i) =>
          violationAgg(r).as(s"__v_$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val structs = array(scalarRules.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"),
            col(s"__v_$i").cast("long").as("violations"))
        }: _*)
        Some(one.select(explode(structs).as("r")).select("r.*"))
      }
    val fkReports = fkRules.map { f =>
      val keys = f.dim.select(col(f.pkCol).as("__pk")).distinct()
      df.select(col(f.fkCol).as("__fk")).filter(col("__fk").isNotNull)
        .join(keys, col("__fk") === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(f.name).as("rule"), col("violations"))
    }
    (scalarReport.toSeq ++ fkReports).reduce(_ unionByName _)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Student-t quantile `t_quantile(df, p)` as a native codegen'd Catalyst
  * expression — retires the repo's last scalar MATH UDF (the per-group
  * interval width in [[graft.glm.GroupedLM.predictWithSe]], which ran a
  * commons-math `TDistribution` closure over the one-row-per-group betas
  * frame).
  *
  * Numerics delegate to [[TQuantile.quantile]] (commons-math3
  * `TDistribution.inverseCumulativeProbability` — the incomplete-beta
  * solver both the interpreted and generated paths call through the same
  * static forwarder, so they are identical by construction). This is
  * model-frame math by contract: one evaluation per GROUP, never per data
  * row — the cost of constructing the distribution object per call is
  * irrelevant at that cardinality, and the expression keeps the scoring
  * projection UDF-free.
  *
  * Contract: df ≤ 0 (or NaN) → NaN, matching the old UDF's unscorable
  * marker; p outside (0, 1) → NaN (the UDF's caller never passes one).
  */
case class TQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE, DOUBLE), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "t_quantile"

  override def nullSafeEval(a: Any, b: Any): Any =
    TQuantile.quantile(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TQuantile.quantile($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TQuantile = copy(left = newLeft, right = newRight)
}

object TQuantile {
  /** The single scalar entry point (the expression's interpreted eval and
    * the generated Java both call this static forwarder).
    */
  def quantile(df: Double, p: Double): Double =
    if (df > 0.0 && p > 0.0 && p < 1.0)
      new org.apache.commons.math3.distribution.TDistribution(df)
        .inverseCumulativeProbability(p)
    else Double.NaN

  /** Registration builder: cast-any-numeric-to-double like the built-in
    * math functions do.
    */
  def ofAny(left: Expression, right: Expression): TQuantile =
    TQuantile(Cast(left, DoubleType), Cast(right, DoubleType))
}

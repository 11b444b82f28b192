package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The error-function family as native codegen'd Catalyst expressions —
  * erf, erfc and erf⁻¹, delegating to commons-math3's public static
  * `Erf.erf` / `Erf.erfc` / `Erf.erfInv` (regularized-incomplete-gamma
  * and rational-polynomial implementations), so interpreted and codegen
  * paths hit the identical library entry points.
  *
  * These retire the repo's LAST per-data-row scalar UDFs: the probit
  * link's Φ/Φ⁻¹ (reference computes the Gaussian icdf per row through
  * Breeze objects, sparkGLM GLM.scala:207-234) now compose these
  * expressions as plain column arithmetic inside whole-stage codegen —
  * commons-math's `NormalDistribution.cumulativeProbability` is exactly
  * `0.5·erfc(−x/√2)` (with a 40σ cutoff) and
  * `inverseCumulativeProbability` is exactly `√2·erfInv(2p−1)`, so the
  * rewrite is bit-identical to the UDFs it replaces.
  *
  * Like [[LogGamma]], the expressions require a DOUBLE child
  * (AbstractDataType is private[sql]); the `ofAny` builders wrap any
  * numeric argument in a Cast for SQL-text callers.
  */
private[graft] trait ErfLike extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE, got ${child.dataType.simpleString}")
}

/** erf(x) = 2/√π ∫₀ˣ e^(−t²) dt. */
case class Erf(child: Expression) extends ErfLike {
  override def prettyName: String = "erf"
  protected override def nullSafeEval(v: Any): Any =
    org.apache.commons.math3.special.Erf.erf(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.commons.math3.special.Erf.erf($c)")
  override protected def withNewChildInternal(newChild: Expression): Erf =
    copy(child = newChild)
}

object Erf {
  def ofAny(child: Expression): Erf = Erf(Cast(child, DoubleType))
}

/** erfc(x) = 1 − erf(x), computed directly (accurate for large x where
  * 1 − erf(x) would cancel to 0).
  */
case class Erfc(child: Expression) extends ErfLike {
  override def prettyName: String = "erfc"
  protected override def nullSafeEval(v: Any): Any =
    org.apache.commons.math3.special.Erf.erfc(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.commons.math3.special.Erf.erfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Erfc =
    copy(child = newChild)
}

object Erfc {
  def ofAny(child: Expression): Erfc = Erfc(Cast(child, DoubleType))
}

/** erf⁻¹(x) on (−1, 1); ±1 → ±∞, |x| > 1 → NaN (commons-math contract). */
case class ErfInv(child: Expression) extends ErfLike {
  override def prettyName: String = "erfinv"
  protected override def nullSafeEval(v: Any): Any =
    org.apache.commons.math3.special.Erf.erfInv(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.commons.math3.special.Erf.erfInv($c)")
  override protected def withNewChildInternal(newChild: Expression): ErfInv =
    copy(child = newChild)
}

object ErfInv {
  def ofAny(child: Expression): ErfInv = ErfInv(Cast(child, DoubleType))
}

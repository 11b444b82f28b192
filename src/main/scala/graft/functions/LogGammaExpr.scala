package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** ln Γ(x) as a native codegen'd Catalyst expression — the ONE shared
  * log-gamma in the repo. The GLM binomial/Poisson/negative-binomial
  * log-likelihood terms (log C(m,y), ln y!, ln Γ(y+θ) − ln Γ(θ);
  * reference computes them per-row through Breeze distribution objects,
  * sparkGLM GLM.scala:132-159) compose this expression as plain column
  * arithmetic, and [[graft.glm.GroupedGLM]]'s per-group Aggregator calls
  * the same [[LogGamma.lgamma]] entry point — retiring the scalar UDFs
  * that previously carried this math outside whole-stage codegen.
  *
  * Numerics delegate to commons-math3's Lanczos `Gamma.logGamma` (a
  * public static method, so the generated Java calls it directly) —
  * interpreted and codegen paths hit the identical implementation.
  *
  * The expression itself requires a DOUBLE child (AbstractDataType is
  * private[sql], so the implicit-cast traits are unavailable out of
  * tree); [[LogGamma.ofAny]] is the registration builder that wraps any
  * numeric argument in a Cast, giving SQL-text callers the usual
  * coercion.
  */
case class LogGamma(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "lgamma"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE, got ${child.dataType.simpleString}")

  protected override def nullSafeEval(v: Any): Any =
    LogGamma.lgamma(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.commons.math3.special.Gamma.logGamma($c)")

  override protected def withNewChildInternal(newChild: Expression): LogGamma =
    copy(child = newChild)
}

object LogGamma {
  /** The single scalar entry point (JVM-side callers: GroupedGLM's
    * in-Aggregator IRLS; the expression's interpreted eval).
    */
  def lgamma(x: Double): Double =
    org.apache.commons.math3.special.Gamma.logGamma(x)

  /** Registration builder: cast-any-numeric-to-double like the built-in
    * math functions do.
    */
  def ofAny(child: Expression): LogGamma = LogGamma(Cast(child, DoubleType))
}

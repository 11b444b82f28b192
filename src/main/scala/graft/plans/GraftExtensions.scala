package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ArrayDot, Erf, Erfc, ErfInv, JaroWinkler, LogGamma, PQCodes, PQPartialDists, StableLit, TQuantile}

/** Engine extensions, injected via the public `SparkSessionExtensions` hook
  * (`.withExtensions(new GraftExtensions)` on the builder, or
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Registers the native expressions so they resolve in SQL text and via
  * `functions.call_function`:
  *   SELECT array_dot(a, b) FROM t
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  private type Descriptor = (FunctionIdentifier, ExpressionInfo,
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression)

  private def binary(name: String, cls: Class[_],
      mk: (org.apache.spark.sql.catalyst.expressions.Expression,
           org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, s"$name takes exactly 2 arguments")
      mk(children.head, children(1))
    })

  private def unary(name: String, cls: Class[_],
      mk: org.apache.spark.sql.catalyst.expressions.Expression =>
        org.apache.spark.sql.catalyst.expressions.Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 1, s"$name takes exactly 1 argument")
      mk(children.head)
    })

  private[graft] val descriptors: Seq[Descriptor] = Seq(
    unary("lgamma", classOf[LogGamma], LogGamma.ofAny),
    unary("erf", classOf[Erf], Erf.ofAny),
    unary("erfc", classOf[Erfc], Erfc.ofAny),
    unary("erfinv", classOf[ErfInv], ErfInv.ofAny),
    binary("array_dot", classOf[ArrayDot], ArrayDot.apply),
    binary("t_quantile", classOf[TQuantile], TQuantile.ofAny),
    binary("pq_codes", classOf[PQCodes], PQCodes.apply),
    binary("pq_partial_dists", classOf[PQPartialDists], PQPartialDists.apply),
    binary("jaro_winkler", classOf[JaroWinkler], JaroWinkler.apply),
    unary("stable_lit", classOf[StableLit], StableLit.apply))

  /** Idempotent per-session registration for sessions not built with
    * `.withExtensions` (e.g. one handed to us by a driver harness).
    */
  def ensureRegistered(spark: SparkSession): Unit = descriptors.foreach {
    case (id, info, builder) =>
      if (!spark.catalog.functionExists(id.funcName)) {
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
  }
}

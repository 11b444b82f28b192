package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.ArrayDot

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
    ext.injectFunction(GraftExtensions.arrayDotDescriptor)
  }
}

object GraftExtensions {
  private[graft] val arrayDotDescriptor = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, "array_dot takes exactly 2 arguments")
      ArrayDot(children.head, children(1))
    })

  /** Idempotent per-session registration for sessions not built with
    * `.withExtensions` (e.g. one handed to us by a driver harness).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val (id, info, builder) = arrayDotDescriptor
    if (!spark.catalog.functionExists(id.funcName)) {
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}

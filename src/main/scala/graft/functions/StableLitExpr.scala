package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}

/** A scalar literal that is NOT foldable and whose generated code reads
  * the value from the codegen `references` array instead of inlining it
  * as a source constant.
  *
  * Why it exists: iterative fits (IRLS, EM, Lloyd, Newton) push the
  * current driver-side coefficients into each data pass as literals.
  * Plain `lit(β)` inlines the double into the generated Java source, so
  * every iteration produces a NEW source string and pays a fresh janino
  * compilation of the whole fused stage (50–300 ms per stage of pure
  * driver time the executors never see). Routing the value through
  * `references` keeps the generated source IDENTICAL across iterations,
  * so iteration 2+ hit Spark's codegen cache; only the reference object
  * changes. `foldable = false` is the load-bearing bit — a foldable
  * wrapper would be constant-folded by the optimizer straight back into
  * an inlined `Literal`.
  *
  * The arithmetic is bit-identical to `lit(v)`: both paths evaluate the
  * same value; only where the constant is stored changes.
  *
  * Supported child types: DOUBLE, LONG, INT, STRING (all this engine's
  * loops need). The child must be foldable; it is evaluated once on the
  * driver. Use the [[graft.functions]] package helpers or
  * `call_function("stable_lit", lit(v))` (requires
  * [[graft.plans.GraftExtensions]] registered on the session).
  */
case class StableLit(child: Expression) extends UnaryExpression {

  override def prettyName: String = "stable_lit"
  override def dataType: DataType = child.dataType
  override def foldable: Boolean = false
  override def nullable: Boolean = child.nullable

  // Normally the child is a Literal for the whole plan's life. Some
  // analyzer/optimizer rewrites may temporarily or permanently swap in a
  // non-foldable equivalent — then the wrapper degrades gracefully to
  // pass-through evaluation (losing only the cache-stability bonus, not
  // correctness).
  private def constant: Boolean = child.foldable

  private lazy val value: Any =
    if (constant) child.eval(InternalRow.empty) else null

  override def eval(input: InternalRow): Any =
    if (constant) value else child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    if (!constant) {
      val c = child.genCode(ctx)
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    } else if (value == null) {
      // null constant: rare (a null β never reaches a data pass), but keep
      // the expression total; the zero default matches the java type
      val zero = dataType match {
        case DoubleType => "0.0"
        case LongType => "0L"
        case IntegerType => "0"
        case StringType => "null"
      }
      val jt = dataType match {
        case DoubleType => "double"
        case LongType => "long"
        case IntegerType => "int"
        case StringType => "org.apache.spark.unsafe.types.UTF8String"
      }
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        $jt ${ev.value} = $zero;""")
    } else {
      val (refObj, cls, unbox) = dataType match {
        case DoubleType =>
          (java.lang.Double.valueOf(value.asInstanceOf[Double]),
            "java.lang.Double", ".doubleValue()")
        case LongType =>
          (java.lang.Long.valueOf(value.asInstanceOf[Long]),
            "java.lang.Long", ".longValue()")
        case IntegerType =>
          (java.lang.Integer.valueOf(value.asInstanceOf[Int]),
            "java.lang.Integer", ".intValue()")
        case StringType =>
          (value, "org.apache.spark.unsafe.types.UTF8String", "")
      }
      val ref = ctx.addReferenceObj("stableLit", refObj, cls)
      ev.copy(code = code"", isNull = FalseLiteral,
        value = JavaCode.expression(s"$ref$unbox", dataType))
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | LongType | IntegerType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stable_lit supports DOUBLE/LONG/INT/STRING, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): StableLit =
    copy(child = newChild)
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

package object functions {

  /** Iteration-stable scalar literal (see [[graft.functions.StableLit]]):
    * arithmetic-identical to `lit(v)` but codegen reads the value from the
    * references array, so driver loops that re-plan with fresh
    * coefficients every round reuse one compiled stage instead of paying
    * a janino compilation per iteration. Requires the graft extensions
    * registered on the session ([[graft.plans.GraftExtensions]]).
    */
  private[graft] def stableLit(v: Double): Column =
    call_function("stable_lit", lit(v))

  /** [[stableLit]] for per-round string constants (e.g. a loop index
    * entering a hash-draw seed). */
  private[graft] def stableLitS(v: String): Column =
    call_function("stable_lit", lit(v))

  /** [[stableLit]] for per-round int constants (type-preserving — the
    * output column stays INT). */
  private[graft] def stableLitI(v: Int): Column =
    call_function("stable_lit", lit(v))
}

package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group least squares: one independent OLS/WLS fit PER GROUP KEY,
  * solved entirely inside the aggregation pipeline — millions of groups,
  * zero driver involvement.
  *
  * This is the custom-UDAF realization of the Gram kernel (SURVEY.md §4:
  * "one `Aggregator`... Catalyst cannot synthesize a fused outer-product
  * aggregate"): the buffer is the packed upper-triangular XᵀWX plus XᵀWy,
  * yᵀWy, Σwy, Σw, n — exactly the `reduceNormal` contract of the reference
  * (reference: utils.scala:58-64) — merged element-wise, so Spark gives
  * map-side partial aggregation and the shuffle carries one p²-sized buffer
  * per (partition, group), never row data. The per-group solve runs in the
  * aggregate's `finish` on whichever executor owns the group.
  */
object GroupedLM {

  /** Buffer layout: [n, Σw, Σwy, yᵀWy | XᵀWy (p) | upper-tri XᵀWX]. */
  private def bufLen(p: Int): Int = 4 + p + p * (p + 1) / 2

  /** Aggregator over rows of `array(x1..xp, y, w)`. `finish` emits
    * [β (p) | r², n, sigma | diag((XᵀWX)⁻¹) (p)] or all-NaN (β/diag parts)
    * for singular/underdetermined groups; the inverse diagonal feeds the
    * per-group standard errors se_j = σ·sqrt(diag_j).
    */
  private final class GramAgg(p: Int, intercept: Boolean)
      extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val pp = if (intercept) p + 1 else p
    private val nUp = pp * (pp + 1) / 2

    def zero: Array[Double] = new Array[Double](bufLen(pp))

    def reduce(b: Array[Double], in: Seq[Double]): Array[Double] = {
      val x = new Array[Double](pp)
      if (intercept) x(0) = 1.0
      var i = 0
      while (i < p) { x(if (intercept) i + 1 else i) = in(i); i += 1 }
      val y = in(p)
      val w = in(p + 1)
      b(0) += 1.0
      b(1) += w
      b(2) += w * y
      b(3) += w * y * y
      i = 0
      var k = 4 + pp
      while (i < pp) {
        val wxi = w * x(i)
        b(4 + i) += wxi * y
        var j = i
        while (j < pp) { b(k) += wxi * x(j); k += 1; j += 1 }
        i += 1
      }
      b
    }

    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(b: Array[Double]): Seq[Double] = {
      val n = b(0)
      val out = new Array[Double](2 * pp + 3)
      // n == pp is exactly-determined: a well-defined zero-residual fit
      // (what DuckDB's regr_slope/regr_intercept returns for 2 points /
      // 1 feature). Only underdetermined groups are hopeless.
      if (n < pp) {
        java.util.Arrays.fill(out, Double.NaN)
        out(pp + 1) = n
        return out.toSeq
      }
      val xtx = BDM.zeros[Double](pp, pp)
      var k = 4 + pp
      var i = 0
      while (i < pp) {
        var j = i
        while (j < pp) { xtx(i, j) = b(k); xtx(j, i) = b(k); k += 1; j += 1 }
        i += 1
      }
      val xty = BDV.tabulate(pp)(i => b(4 + i))
      try {
        val beta = LinAlg.solvePD(xtx, xty)
        val inv = LinAlg.invDiag(xtx)
        // exactly-determined groups have zero residual by construction —
        // force it so r2 is exactly 1 instead of 1 ± float noise
        val sse = if (n == pp) 0.0 else math.max(0.0, b(3) - (beta dot xty))
        val tss = if (intercept) b(3) - b(2) * b(2) / b(1) else b(3)
        i = 0
        while (i < pp) {
          out(i) = beta(i)
          out(pp + 3 + i) = inv(i)
          i += 1
        }
        out(pp) = if (tss > 0) 1.0 - sse / tss else Double.NaN
        out(pp + 1) = n
        // zero residual degrees of freedom → sigma undefined (matches R lm)
        out(pp + 2) = if (n > pp) math.sqrt(sse / (n - pp)) else Double.NaN
      } catch {
        case _: Exception =>
          java.util.Arrays.fill(out, Double.NaN)
          out(pp + 1) = n
      }
      out.toSeq
    }

    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Fit y ~ X independently within every group of `keyCols`.
    *
    * @return one row per group: keyCols ++ (b_0.. coefficient columns named
    *         after the features, with `b_intercept` first when intercept),
    *         plus r2, n_rows, sigma, and matching `se_*` standard errors
    *         (σ·sqrt(diag((XᵀWX)⁻¹))). Groups with n ≤ p or singular XᵀX
    *         get NaN coefficients.
    */
  def fit(
      df: DataFrame,
      keyCols: Seq[String],
      xCols: Seq[String],
      yCol: String,
      intercept: Boolean = true,
      weightCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty && xCols.nonEmpty)
    val p = xCols.size
    val agg = udaf(new GramAgg(p, intercept))
    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val input = array((xCols.map(c => col(c).cast("double")) :+
      col(yCol).cast("double")) :+ w: _*)
    val names = (if (intercept) Seq("b_intercept") else Nil) ++ xCols.map("b_" + _)
    val fitted = df.groupBy(keyCols.map(col): _*)
      .agg(agg(input).as("fit"))
    val outCols = keyCols.map(col) ++
      names.zipWithIndex.map { case (nm, i) => element_at(col("fit"), i + 1).as(nm) } ++
      Seq(
        element_at(col("fit"), names.size + 1).as("r2"),
        element_at(col("fit"), names.size + 2).cast("long").as("n_rows"),
        element_at(col("fit"), names.size + 3).as("sigma")) ++
      // se_j = σ·sqrt(diag((XᵀWX)⁻¹)_j) — appended last so positional
      // consumers of the original columns are unaffected
      names.zipWithIndex.map { case (nm, i) =>
        (element_at(col("fit"), names.size + 3) *
          sqrt(element_at(col("fit"), names.size + 4 + i)))
          .as("se_" + nm.stripPrefix("b_")) }
    fitted.select(outCols: _*)
  }
}

package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV, cholesky, inv}

/** Driver-local dense solves for the (small, p×p) normal equations.
  *
  * The reference inverts XᵀX explicitly (reference: LM.scala:197,225,
  * utils.scala:75,108). We solve via Cholesky (XᵀWX is symmetric PD for full
  * column rank X, positive w) for numerical stability, falling back to a
  * general LU solve if the factorization fails; the explicit inverse is
  * computed only once, for the standard-error diagonal.
  */
object LinAlg {

  /** Solve a·x = b for symmetric positive-definite `a`. */
  def solvePD(a: BDM[Double], b: BDV[Double]): BDV[Double] =
    try {
      val l = cholesky(a)
      // forward substitution: l·z = b
      val p = a.rows
      val z = BDV.zeros[Double](p)
      var i = 0
      while (i < p) {
        var s = b(i)
        var j = 0
        while (j < i) { s -= l(i, j) * z(j); j += 1 }
        z(i) = s / l(i, i)
        i += 1
      }
      // back substitution: lᵀ·x = z
      val x = BDV.zeros[Double](p)
      i = p - 1
      while (i >= 0) {
        var s = z(i)
        var j = i + 1
        while (j < p) { s -= l(j, i) * x(j); j += 1 }
        x(i) = s / l(i, i)
        i -= 1
      }
      x
    } catch {
      case _: Exception => a \ b
    }

  /** Diagonal of a⁻¹ for symmetric PD `a` (for coefficient std errors). */
  def invDiag(a: BDM[Double]): BDV[Double] = {
    val ia = inv(a)
    BDV.tabulate(a.rows)(i => ia(i, i))
  }

  /** Full a⁻¹ for symmetric PD `a` — the p×p covariance kernel kept on
    * fitted models for per-row scoring standard errors (p is small; the
    * inverse is computed once on the driver).
    */
  def invPD(a: BDM[Double]): BDM[Double] = inv(a)

  /** x₀ᵀ·K·x₀ as a per-row column expression — the variance quadratic form
    * behind scoring standard errors ([[graft.glm.LMModel.predictWithSe]]
    * and the GLM twin). Small p: unrolled literal-kernel expression, p²
    * multiply-adds per row, fully codegen'd. Wide p (> `unrollMaxP`): one
    * closure UDF carrying the p×p kernel, keeping the Catalyst tree O(p)
    * (an unrolled 40-feature fit would inject ~1,600 literal nodes into
    * analysis/codegen).
    */
  def quadFormExpr(k: BDM[Double],
      xs: Array[org.apache.spark.sql.Column],
      unrollMaxP: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, lit, udf}
    val p = xs.length
    require(k.rows == p && k.cols == p, s"kernel ${k.rows}x${k.cols} vs p=$p")
    if (p <= unrollMaxP) {
      var acc: org.apache.spark.sql.Column = lit(0.0)
      var i = 0
      while (i < p) {
        acc = acc + lit(k(i, i)) * xs(i) * xs(i)
        var j = i + 1
        while (j < p) {
          acc = acc + lit(2.0 * k(i, j)) * xs(i) * xs(j)
          j += 1
        }
        i += 1
      }
      acc
    } else {
      val kk = Array.tabulate(p, p)((i, j) => k(i, j))
      val quad = udf { (x: Seq[Double]) =>
        var acc = 0.0
        var i = 0
        while (i < x.length) {
          acc += kk(i)(i) * x(i) * x(i)
          var j = i + 1
          while (j < x.length) { acc += 2.0 * kk(i)(j) * x(i) * x(j); j += 1 }
          i += 1
        }
        acc
      }
      quad(array(xs: _*))
    }
  }
}

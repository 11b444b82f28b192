package graft.glm

/** Number formatting used by model summaries.
  *
  * Semantics follow the reference's rounding helpers
  * (reference: utils.scala:120-143 `roundDigits` / `sigDigits`): round to a
  * fixed number of decimal digits, and round to a number of *significant*
  * digits. Kept bit-compatible so golden-output summary tests are stable.
  */
object NumFormat {

  /** Round `x` to `d` decimal digits (half-up, like BigDecimal). */
  def roundDigits(x: Double, d: Int): Double = {
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Round `x` to `d` significant digits. */
  def sigDigits(x: Double, d: Int): Double = {
    if (x == 0.0 || x.isNaN || x.isInfinite) x
    else {
      val magnitude = math.floor(math.log10(math.abs(x))).toInt
      roundDigits(x, d - 1 - magnitude)
    }
  }

  /** Fixed-width cell for coefficient tables. */
  def cell(x: Double, d: Int = 6, width: Int = 13): String = {
    val s =
      if (x.isNaN) "NaN"
      else if (math.abs(x) >= 1e5 || (x != 0 && math.abs(x) < 1e-4)) f"$x%.4e"
      else sigDigits(x, d).toString
    s.reverse.padTo(width, ' ').reverse
  }

  /** R-style significance stars for a p-value. */
  def stars(p: Double): String =
    if (p < 0.001) "***"
    else if (p < 0.01) "**"
    else if (p < 0.05) "*"
    else if (p < 0.1) "."
    else ""
}

package graft.glm

/** R-style model formula, the grammar subset the reference's R front-end
  * supports (reference: R/pkg/R/utils.R:8-22): `y ~ x1 + x2 [+ 1 | - 1]`,
  * plus `.` for "all other columns".
  *
  *  - terms are separated by `+` / `-`
  *  - a bare `1` term adds the intercept (the default), `- 1` removes it
  *  - `.` expands to every column except the response (resolved at fit time)
  */
final case class Formula(response: String, terms: Seq[String], intercept: Boolean) {

  /** Expand a `.` term against a concrete column list. */
  def resolve(columns: Seq[String]): Formula =
    if (!terms.contains(".")) this
    else {
      val explicit = terms.filter(_ != ".")
      val dot = columns.filterNot(c => c == response || explicit.contains(c))
      copy(terms = (explicit ++ dot).distinct)
    }

  override def toString: String = {
    val rhs = (terms ++ (if (intercept) Nil else Seq("- 1"))).mkString(" + ")
    s"$response ~ ${if (rhs.isEmpty) "1" else rhs}"
  }
}

object Formula {

  def parse(formula: String): Formula = {
    val parts = formula.split("~")
    require(parts.length == 2, s"formula must contain exactly one '~': $formula")
    val response = parts(0).trim
    require(response.nonEmpty, s"formula has no response: $formula")

    // Tokenize the RHS into (sign, term) pairs.
    var intercept = true
    val terms = Seq.newBuilder[String]
    var sign = '+'
    val tokens = parts(1).split("(?=[+-])").map(_.trim).filter(_.nonEmpty)
    tokens.foreach { tokRaw =>
      val (s, tok) =
        if (tokRaw.startsWith("+")) ('+', tokRaw.drop(1).trim)
        else if (tokRaw.startsWith("-")) ('-', tokRaw.drop(1).trim)
        else (sign, tokRaw)
      sign = '+'
      tok match {
        case ""  => // stray sign, e.g. trailing
        case "1" => intercept = s == '+'
        case "0" => if (s == '+') intercept = false
        case t =>
          require(s == '+', s"only '1' may be removed with '-' (got '- $t')")
          terms += t
      }
    }
    Formula(response, terms.result().distinct, intercept)
  }
}

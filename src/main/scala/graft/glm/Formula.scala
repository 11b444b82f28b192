package graft.glm

/** R-style model formula. The grammar covers the subset the reference's R
  * front-end supports (reference: R/pkg/R/utils.R:8-22) — `y ~ x1 + x2
  * [+ 1 | - 1]`, plus `.` for "all other columns" — extended with R's
  * interaction operators, which the reference grammar lacks but any
  * per-segment modeling user reaches for immediately:
  *
  *  - terms are separated by `+` / `-`
  *  - a bare `1` term adds the intercept (the default), `- 1` removes it
  *  - `.` expands to every column except the response (resolved at fit time)
  *  - `a:b` is an interaction term (the product of the encoded columns of
  *    `a` and `b`; for a categorical component, one product per dummy —
  *    R's `:` semantics under k−1 treatment coding)
  *  - `a*b` is crossing: main effects plus all interactions —
  *    `a*b` ≡ `a + b + a:b`, `a*b*c` ≡ all seven non-empty subsets
  *
  * An interaction term is represented as its component names joined with
  * `:`; [[Formula.components]] splits one back apart.
  */
final case class Formula(response: String, terms: Seq[String], intercept: Boolean) {

  /** Every base column the terms reference (interaction components
    * flattened, duplicates removed) — the columns to select/NA-drop/encode.
    */
  def baseColumns: Seq[String] = terms.flatMap(Formula.components).distinct

  /** Expand a `.` term against a concrete column list. */
  def resolve(columns: Seq[String]): Formula =
    if (!terms.contains(".")) this
    else {
      val explicit = terms.filter(_ != ".")
      val used = explicit.flatMap(Formula.components).toSet
      val dot = columns.filterNot(c => c == response || used.contains(c))
      copy(terms = (explicit ++ dot).distinct)
    }

  override def toString: String = {
    val rhs = (terms ++ (if (intercept) Nil else Seq("- 1"))).mkString(" + ")
    s"$response ~ ${if (rhs.isEmpty) "1" else rhs}"
  }
}

object Formula {

  /** Components of one term: `"a:b"` → `Seq("a", "b")`; a plain term is a
    * single component.
    */
  def components(term: String): Seq[String] =
    term.split(":").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Expand one `*`-crossed token into R's term set: every non-empty subset
    * of the factors, ordered by interaction order then position —
    * `a*b` → a, b, a:b (R `expand.formula` ordering).
    */
  private def crossTerms(factors: Seq[String]): Seq[String] = {
    val n = factors.length
    (1 to n).flatMap { size =>
      (1 until (1 << n)).iterator
        .filter(mask => Integer.bitCount(mask) == size)
        .map(mask => factors.zipWithIndex.collect {
          case (f, i) if ((mask >> i) & 1) == 1 => f
        }.mkString(":"))
        .toSeq
    }
  }

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
          if (t.contains("*")) {
            val factors = t.split("\\*").iterator.map(_.trim).filter(_.nonEmpty).toSeq
            require(factors.forall(!_.contains(":")),
              s"cannot mix ':' inside a '*' crossing: $t")
            require(factors.nonEmpty, s"empty '*' crossing: $t")
            terms ++= crossTerms(factors)
          } else {
            val comps = components(t)
            require(comps.nonEmpty, s"empty term: '$t'")
            require(comps.distinct == comps,
              s"interaction term repeats a component: $t")
            terms += comps.mkString(":")
          }
      }
    }
    Formula(response, terms.result().distinct, intercept)
  }
}

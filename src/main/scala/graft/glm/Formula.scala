package graft.glm

/** R-style model formula. The grammar covers the subset the reference's R
  * front-end supports (reference: R/pkg/R/utils.R:8-22) — `y ~ x1 + x2
  * [+ 1 | - 1]`, plus `.` for "all other columns" — extended with R's
  * interaction operators and arithmetic transforms, which the reference
  * grammar lacks but any R modeling user reaches for immediately:
  *
  *  - terms are separated by `+` / `-` (at paren depth 0)
  *  - a bare `1` term adds the intercept (the default), `- 1` removes it
  *  - `.` expands to every column except the response (resolved at fit time)
  *  - `a:b` is an interaction term (the product of the encoded columns of
  *    `a` and `b`; for a categorical component, one product per dummy —
  *    R's `:` semantics under k−1 treatment coding)
  *  - `a*b` is crossing: main effects plus all interactions —
  *    `a*b` ≡ `a + b + a:b`, `a*b*c` ≡ all seven non-empty subsets
  *  - transform terms: `log(x)`, `log1p(x)`, `log2(x)`, `log10(x)`,
  *    `exp(x)`, `sqrt(x)`, `abs(x)`, and R's protector `I(expr)` with
  *    `+ - * / ^` arithmetic and numeric literals inside (`I(x^2)`,
  *    `I(x1 + x2)`) — see [[FormulaExpr]]. A transform is numeric
  *    (never dummy-encoded) and composes with `:`/`*`. Domain errors
  *    (e.g. `log` of a non-positive value) follow Spark semantics
  *    (null), which the downstream NA handling does NOT re-scan —
  *    transform before the formula if the domain needs cleaning.
  *
  * An interaction term is represented as its component names joined with
  * `:`; [[Formula.components]] splits one back apart (at depth 0 only).
  */
final case class Formula(response: String, terms: Seq[String], intercept: Boolean) {

  /** Every base column the terms reference (interaction components
    * flattened, transform arguments resolved, duplicates removed) — the
    * columns to select/NA-drop/encode.
    */
  def baseColumns: Seq[String] =
    terms.flatMap(Formula.components).flatMap { c =>
      if (Formula.isTransform(c)) FormulaExpr.referenced(c) else Seq(c)
    }.distinct

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

  /** A component that is a transform expression (`log(x)`, `I(...)`)
    * rather than a plain column name.
    */
  def isTransform(component: String): Boolean = component.contains("(")

  /** Split `s` on any of `seps` occurring at paren depth 0. The
    * separator characters are dropped; empty pieces are kept (callers
    * filter).
    */
  private[glm] def splitTop(s: String, seps: Set[Char]): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach { ch =>
      if (ch == '(') { depth += 1; cur += ch }
      else if (ch == ')') { depth -= 1; cur += ch }
      else if (depth == 0 && seps(ch)) { out += cur.result(); cur.clear() }
      else cur += ch
    }
    require(depth == 0, s"unbalanced parentheses in: $s")
    out += cur.result()
    out.result()
  }

  /** Components of one term: `"a:b"` → `Seq("a", "b")` (split at depth 0,
    * so `log(x):z` → `log(x)`, `z`); a plain term is a single component.
    */
  def components(term: String): Seq[String] =
    splitTop(term, Set(':')).map(_.trim).filter(_.nonEmpty)

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

    // Tokenize the RHS into (sign, term) pairs — sign splits happen at
    // paren depth 0 only, so `I(x - y)` stays one token.
    var intercept = true
    val terms = Seq.newBuilder[String]
    val rhs = parts(1)
    val signed = Seq.newBuilder[(Char, String)]
    locally {
      val cur = new StringBuilder
      var depth = 0
      var sign = '+'
      def flush(next: Char): Unit = {
        val t = cur.result().trim
        if (t.nonEmpty) signed += ((sign, t))
        cur.clear(); sign = next
      }
      rhs.foreach { ch =>
        if (ch == '(') { depth += 1; cur += ch }
        else if (ch == ')') { depth -= 1; cur += ch }
        else if (depth == 0 && (ch == '+' || ch == '-')) flush(ch)
        else cur += ch
      }
      require(depth == 0, s"unbalanced parentheses in formula: $formula")
      flush('+')
    }
    signed.result().foreach { case (s, tok) =>
      tok match {
        case "1" => intercept = s == '+'
        case "0" => if (s == '+') intercept = false
        case t =>
          require(s == '+', s"only '1' may be removed with '-' (got '- $t')")
          if (splitTop(t, Set('*')).length > 1) {
            val factors = splitTop(t, Set('*')).map(_.trim).filter(_.nonEmpty)
            require(factors.forall(f => components(f).length == 1),
              s"cannot mix ':' inside a '*' crossing: $t")
            require(factors.nonEmpty, s"empty '*' crossing: $t")
            factors.filter(isTransform).foreach(FormulaExpr.referenced) // validate
            terms ++= crossTerms(factors)
          } else {
            val comps = components(t)
            require(comps.nonEmpty, s"empty term: '$t'")
            require(comps.distinct == comps,
              s"interaction term repeats a component: $t")
            comps.filter(isTransform).foreach(FormulaExpr.referenced) // validate
            terms += comps.mkString(":")
          }
      }
    }
    Formula(response, terms.result().distinct, intercept)
  }
}

/** Recursive-descent parser for formula transform expressions — the
  * arithmetic allowed inside `I(...)` and the unary math transforms:
  *
  *   expr   := term (('+' | '-') term)*
  *   term   := factor (('*' | '/') factor)*
  *   factor := '-' factor | atom ('^' factor)?    (right-associative;
  *             '^' binds TIGHTER than unary '-', matching R: -x^2 is
  *             -(x^2), not (-x)^2)
  *   atom   := number | ident | fn '(' expr ')' | '(' expr ')'
  *   fn     := I | log | log1p | log2 | log10 | exp | sqrt | abs
  *
  * Produces a Catalyst [[org.apache.spark.sql.Column]] — every transform
  * stays a codegen'd projection expression; nothing leaves the SQL
  * engine.
  */
object FormulaExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.{functions => F}

  private val funcs: Map[String, Column => Column] = Map(
    "I" -> identity[Column], "log" -> F.log, "log1p" -> F.log1p,
    "log2" -> F.log2, "log10" -> F.log10, "exp" -> F.exp,
    "sqrt" -> F.sqrt, "abs" -> F.abs)

  /** Parse `s` into a Column (columns referenced are cast to double). */
  def column(s: String): Column = new Parser(s).parseAll()._1

  /** The plain column names `s` references, in first-use order. */
  def referenced(s: String): Seq[String] = new Parser(s).parseAll()._2

  private final class Parser(s: String) {
    private var pos = 0
    private val refs = scala.collection.mutable.LinkedHashSet.empty[String]

    def parseAll(): (Column, Seq[String]) = {
      val c = expr()
      skipWs()
      require(pos == s.length,
        s"unexpected '${s.substring(pos)}' in formula expression: $s")
      (c, refs.toSeq)
    }

    private def peek: Char = if (pos < s.length) s.charAt(pos) else ' '
    private def skipWs(): Unit =
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def expr(): Column = {
      var c = term()
      skipWs()
      while (peek == '+' || peek == '-') {
        val op = peek; pos += 1
        val r = term()
        c = if (op == '+') c + r else c - r
        skipWs()
      }
      c
    }

    private def term(): Column = {
      var c = factor()
      skipWs()
      while (peek == '*' || peek == '/') {
        val op = peek; pos += 1
        val r = factor()
        c = if (op == '*') c * r else c / r
        skipWs()
      }
      c
    }

    private def factor(): Column = {
      skipWs()
      // unary minus lives HERE, below '^', so -x^2 = -(x^2) as in R
      if (peek == '-') { pos += 1; -factor() }
      else {
        val b = atom()
        skipWs()
        if (peek == '^') { pos += 1; F.pow(b, factor()) } else b
      }
    }

    private def atom(): Column = {
      skipWs()
      if (peek == '(') {
        pos += 1
        val c = expr()
        skipWs()
        require(peek == ')', s"expected ')' at $pos in: $s")
        pos += 1
        c
      } else if (peek.isDigit || peek == '.') {
        val start = pos
        while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.'))
          pos += 1
        F.lit(s.substring(start, pos).toDouble)
      } else {
        require(peek.isLetter || peek == '_',
          s"expected a column, number or function at $pos in: $s")
        val start = pos
        while (pos < s.length && (s.charAt(pos).isLetterOrDigit ||
          s.charAt(pos) == '_')) pos += 1
        val name = s.substring(start, pos)
        skipWs()
        if (peek == '(') {
          val fn = funcs.getOrElse(name, throw new IllegalArgumentException(
            s"unknown formula function '$name' in: $s " +
              s"(supported: ${funcs.keys.toSeq.sorted.mkString(", ")})"))
          pos += 1
          val arg = expr()
          skipWs()
          require(peek == ')', s"expected ')' at $pos in: $s")
          pos += 1
          fn(arg)
        } else {
          refs += name
          F.col(name).cast("double")
        }
      }
    }
  }
}

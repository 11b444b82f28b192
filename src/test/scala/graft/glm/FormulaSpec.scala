package graft.glm

import graft.SparkSpec

class FormulaSpec extends SparkSpec {

  test("basic terms") {
    val f = Formula.parse("y ~ x1 + x2")
    assert(f.response == "y")
    assert(f.terms == Seq("x1", "x2"))
    assert(f.intercept)
  }

  test("remove intercept with - 1") {
    assert(!Formula.parse("y ~ x1 - 1").intercept)
    assert(!Formula.parse("y ~ x1 + 0").intercept)
    assert(Formula.parse("y ~ x1 + 1").intercept)
  }

  test("dot expansion") {
    val f = Formula.parse("y ~ .").resolve(Seq("y", "a", "b"))
    assert(f.terms == Seq("a", "b"))
  }

  test("dot plus explicit dedups") {
    val f = Formula.parse("y ~ a + .").resolve(Seq("y", "a", "b"))
    assert(f.terms == Seq("a", "b"))
  }

  test("rejects malformed") {
    intercept[IllegalArgumentException](Formula.parse("y ~ x ~ z"))
    intercept[IllegalArgumentException](Formula.parse("y ~ x1 - x2"))
  }

  test("interaction term a:b") {
    val f = Formula.parse("y ~ x1 + a : b")
    assert(f.terms == Seq("x1", "a:b"))
    assert(f.baseColumns == Seq("x1", "a", "b"))
  }

  test("crossing a*b expands to main effects + interaction") {
    assert(Formula.parse("y ~ a*b").terms == Seq("a", "b", "a:b"))
    // a*b is shorthand for a + b + a:b — spelling it out is identical
    assert(Formula.parse("y ~ a + b + a:b").terms ==
      Formula.parse("y ~ a * b").terms)
  }

  test("three-way crossing a*b*c gives all seven subsets") {
    assert(Formula.parse("y ~ a*b*c").terms ==
      Seq("a", "b", "c", "a:b", "a:c", "b:c", "a:b:c"))
  }

  test("crossing dedups against explicit terms") {
    assert(Formula.parse("y ~ a + a*b").terms == Seq("a", "b", "a:b"))
  }

  test("dot expansion skips interaction components") {
    val f = Formula.parse("y ~ a:b + .").resolve(Seq("y", "a", "b", "c"))
    assert(f.terms == Seq("a:b", "c"))
  }

  test("rejects a repeated component and ':' inside '*'") {
    intercept[IllegalArgumentException](Formula.parse("y ~ a:a"))
    intercept[IllegalArgumentException](Formula.parse("y ~ a*(b:c)").terms)
    intercept[IllegalArgumentException](Formula.parse("y ~ a*b:c"))
  }

  test("transform terms parse whole: log(x), I(x^2), I(x + y)") {
    val f = Formula.parse("y ~ log(x) + I(z^2)")
    assert(f.terms == Seq("log(x)", "I(z^2)"))
    assert(f.baseColumns == Seq("x", "z"))
    // '+'/'-' inside I(...) are NOT term separators
    val g = Formula.parse("y ~ I(a + b) + I(a - b)")
    assert(g.terms == Seq("I(a + b)", "I(a - b)"))
    assert(g.baseColumns == Seq("a", "b"))
    // transforms compose with ':' interactions
    val h = Formula.parse("y ~ log(x):z")
    assert(h.terms == Seq("log(x):z"))
    assert(h.baseColumns == Seq("x", "z"))
  }

  test("transform expressions reject unknown functions and garbage") {
    intercept[IllegalArgumentException](Formula.parse("y ~ poly(x, 2)"))
    intercept[IllegalArgumentException](Formula.parse("y ~ log(x"))
    intercept[IllegalArgumentException](Formula.parse("y ~ I(x ++ 2)"))
  }

  test("FormulaExpr evaluates arithmetic on literals correctly") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).toDF("__i")
    def evalD(s: String): Double =
      df.select(FormulaExpr.column(s).as("v")).head().getDouble(0)
    assert(math.abs(evalD("I(2 + 3 * 4)") - 14.0) < 1e-12)
    assert(math.abs(evalD("I(2 ^ 3 ^ 2)") - 512.0) < 1e-12) // right-assoc
    assert(math.abs(evalD("I((2 + 3) * 4)") - 20.0) < 1e-12)
    assert(math.abs(evalD("I(-2 + 10 / 4)") - 0.5) < 1e-12)
    assert(math.abs(evalD("log(exp(1))") - 1.0) < 1e-12)
    assert(math.abs(evalD("sqrt(abs(0 - 9))") - 3.0) < 1e-12)
    // R precedence: '^' binds tighter than unary '-', so -x^2 = -(x^2)
    assert(math.abs(evalD("I(-3 ^ 2)") - (-9.0)) < 1e-12)
    assert(math.abs(evalD("I((-3) ^ 2)") - 9.0) < 1e-12)
    assert(math.abs(evalD("I(2 ^ -1)") - 0.5) < 1e-12)
    assert(math.abs(evalD("I(-2 * 3 ^ 2)") - (-18.0)) < 1e-12)
  }

  test("LM golden fit with transformed terms: y ~ log(x) + I(z^2)") {
    import spark.implicits._
    // golden coefficients from an offline least-squares solve of the
    // same design (intercept, ln x, z²)
    val rows = Seq((1.0, 0.5, 2.1), (2.0, 1.0, 3.4), (3.0, 1.5, 4.9),
      (4.0, 2.0, 7.0), (5.0, 2.5, 9.6), (6.0, 3.0, 12.7),
      (7.0, 3.5, 16.3), (8.0, 4.0, 20.4))
    val df = rows.toDF("x", "z", "y")
    val m = LM.fitFormula(df, "y ~ log(x) + I(z^2)")
    assert(m.featureNames.toSeq === Seq("log(x)", "I(z^2)"))
    assert(math.abs(m.coefs(0) - 1.8400505561) < 1e-8, s"${m.coefs(0)}")
    assert(math.abs(m.coefs(1) - 0.6170774233) < 1e-8, s"${m.coefs(1)}")
    assert(math.abs(m.coefs(2) - 1.0810928337) < 1e-8, s"${m.coefs(2)}")
    assert(m.r2 > 0.9999)
  }
}

package graft.glm

import org.scalatest.funsuite.AnyFunSuite

class FormulaSpec extends AnyFunSuite {

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
}

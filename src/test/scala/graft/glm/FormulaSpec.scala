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
}

package graft.ast

import org.scalatest.funsuite.AnyFunSuite

/** Parser unit tests — pure JVM, no Spark (SURVEY §7.1 step 1). */
class FormulaParserSpec extends AnyFunSuite {
  private def p(s: String) = FormulaParser.parse(s)

  test("precedence: mul binds tighter than add") {
    assert(p("a + b * c") == Bin("+", Var("a"), Bin("*", Var("b"), Var("c"))))
  }
  test("precedence: power right-assoc and tighter than unary minus") {
    assert(p("a ** b ** c") ==
      Bin("**", Var("a"), Bin("**", Var("b"), Var("c"))))
    // python: -2**2 == -(2**2)
    assert(p("-a ** 2") == Unary("-", Bin("**", Var("a"), Num(2))))
    // python: a ** -b
    assert(p("a ** -b") == Bin("**", Var("a"), Unary("-", Var("b"))))
  }
  test("parentheses and division") {
    assert(p("(a + b) / (c / d) + b") ==
      Bin("+", Bin("/", Bin("+", Var("a"), Var("b")), Bin("/", Var("c"), Var("d"))), Var("b")))
  }
  test("floordiv and mod tokens") {
    assert(p("a // b % c") == Bin("%", Bin("//", Var("a"), Var("b")), Var("c")))
  }
  test("comparisons loosest above bool ops") {
    assert(p("a + 1 > b & c < d") ==
      Bin("&", Bin(">", Bin("+", Var("a"), Num(1)), Var("b")), Bin("<", Var("c"), Var("d"))))
  }
  test("scientific literals") {
    assert(p("1.5e-3 + 2E2") == Bin("+", Num(0.0015), Num(200.0)))
  }
  test("function calls") {
    assert(p("log(a) + arctan2(b, c)") ==
      Bin("+", Call("log", List(Var("a"))), Call("arctan2", List(Var("b"), Var("c")))))
  }
  test("method calls chain") {
    assert(p("i.fillna(0) * a") ==
      Bin("*", Method(Var("i"), "fillna", List(Num(0))), Var("a")))
    assert(p("a.clip(1, 2).abs()") ==
      Method(Method(Var("a"), "clip", List(Num(1), Num(2))), "abs", Nil))
    assert(p("a.sum()") == Method(Var("a"), "sum", Nil))
  }
  test("free variables") {
    assert(p("(a+b)/(c/d) + b").freeVariables == Set("a", "b", "c", "d"))
    assert(p("1 + 2").freeVariables == Set.empty[String])
  }
  test("containsOp finds division and power anywhere") {
    assert(p("a + b / c").containsOp("/"))
    assert(!p("a + b * c").containsOp("/"))
    assert(p("a.pow(2)").containsOp("**"))
  }
  test("chained comparisons desugar to conjunctions (python semantics)") {
    assert(p("a < b < c") ==
      Bin("&", Bin("<", Var("a"), Var("b")), Bin("<", Var("b"), Var("c"))))
    assert(p("a <= b < c == d") ==
      Bin("&",
        Bin("&", Bin("<=", Var("a"), Var("b")), Bin("<", Var("b"), Var("c"))),
        Bin("==", Var("c"), Var("d"))))
    // a single comparison is unchanged
    assert(p("a < b") == Bin("<", Var("a"), Var("b")))
  }
  test("syntax errors raise") {
    assertThrows[FormulaSyntaxException](p("a +"))
    assertThrows[FormulaSyntaxException](p("a @ b"))
    assertThrows[FormulaSyntaxException](p("(a"))
    assertThrows[FormulaSyntaxException](p("a b"))
  }
  test("numeric literal holds at most one point (method on float literal)") {
    // found by FormulaParserPropSpec: the scanner used to eat "3.25." as
    // one malformed number instead of 3.25 · dot · method
    assert(p("3.25.sum") == Method(Num(3.25), "sum", Nil))
    assert(p("1.5.clip(0, 1)") ==
      Method(Num(1.5), "clip", List(Num(0), Num(1))))
    assert(p("2.5") == Num(2.5)) // plain decimals unchanged
  }
}

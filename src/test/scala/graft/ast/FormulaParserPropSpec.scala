package graft.ast

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the formula parser: any generated AST, rendered with
  * full parentheses, parses back to the identical tree — across the whole
  * operator/function/method surface, arbitrary nesting, and numeric
  * literal shapes. Complements the example-based FormulaParserSpec. */
object FormulaParserPropSpec extends Properties("FormulaParser") {

  private val binOps =
    Seq("+", "-", "*", "/", "%", "//", "**", ">", "<", ">=", "<=", "==", "!=", "&", "|")
  private val fns1 = Seq("log", "exp", "sqrt", "abs", "sin", "cos", "tan")
  private val fns2 = Seq("arctan2")
  private val methods0 = Seq("sum", "mean", "abs", "T")
  private val methods1 = Seq("fillna", "pow")
  private val methods2 = Seq("clip")

  private val genName: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(3, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  // non-negative finite literals only: a leading '-' is a unary op to the
  // tokenizer, so negativity is generated as Unary("-", _)
  private val genNum: Gen[Num] = Gen.oneOf(
    Gen.choose(0, 10000).map(n => Num(n.toDouble)),
    Gen.choose(0.0, 1e6).map(Num(_)),
    Gen.oneOf(1e-8, 0.5, 3.25, 1e10).map(Num(_)))

  private def genAst(depth: Int): Gen[FormulaAst] =
    if (depth <= 0) Gen.oneOf(genNum, genName.map(Var(_)))
    else Gen.frequency(
      2 -> genNum,
      2 -> genName.map(Var(_)),
      4 -> (for {
        op <- Gen.oneOf(binOps)
        l <- genAst(depth - 1); r <- genAst(depth - 1)
      } yield Bin(op, l, r)),
      2 -> (for {
        op <- Gen.oneOf("-", "+", "~")
        e <- genAst(depth - 1)
      } yield Unary(op, e)),
      1 -> (for {
        fn <- Gen.oneOf(fns1); a <- genAst(depth - 1)
      } yield Call(fn, List(a))),
      1 -> (for {
        fn <- Gen.oneOf(fns2); a <- genAst(depth - 1); b <- genAst(depth - 1)
      } yield Call(fn, List(a, b))),
      1 -> (for {
        m <- Gen.oneOf(methods0); t <- genAst(depth - 1)
      } yield Method(t, m, Nil)),
      1 -> (for {
        m <- Gen.oneOf(methods1); t <- genAst(depth - 1); a <- genAst(depth - 1)
      } yield Method(t, m, List(a))),
      1 -> (for {
        m <- Gen.oneOf(methods2); t <- genAst(depth - 1)
        a <- genAst(depth - 1); b <- genAst(depth - 1)
      } yield Method(t, m, List(a, b))))

  /** Fully-parenthesized rendering: re-parse must reproduce the tree. */
  private def render(a: FormulaAst): String = a match {
    case Num(v)        => if (v == v.floor && v.abs < 1e15) v.toLong.toString
                          else v.toString
    case Var(n)        => n
    case Unary(op, e)  => s"($op${render(e)})"
    case Bin(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case Call(f, as)   => s"$f(${as.map(render).mkString(", ")})"
    // method targets parenthesized: "5.sum" is a lexing error in python
    // (trailing-dot float + name), "(5).sum" is the unambiguous form
    case Method(t, m, Nil) => s"(${render(t)}).$m"
    case Method(t, m, as)  => s"(${render(t)}).$m(${as.map(render).mkString(", ")})"
  }

  /** Numbers survive a render→parse cycle up to double round-trip. */
  private def astEq(a: FormulaAst, b: FormulaAst): Boolean = (a, b) match {
    case (Num(x), Num(y))        => x == y || math.abs(x - y) <= math.ulp(x)
    case (Var(n), Var(m))        => n == m
    case (Unary(o1, e1), Unary(o2, e2)) => o1 == o2 && astEq(e1, e2)
    case (Bin(o1, l1, r1), Bin(o2, l2, r2)) => o1 == o2 && astEq(l1, l2) && astEq(r1, r2)
    case (Call(f1, a1), Call(f2, a2)) =>
      f1 == f2 && a1.length == a2.length && a1.zip(a2).forall((astEq _).tupled)
    case (Method(t1, m1, a1), Method(t2, m2, a2)) =>
      m1 == m2 && astEq(t1, t2) &&
        a1.length == a2.length && a1.zip(a2).forall((astEq _).tupled)
    case _ => false
  }

  property("render->parse round-trip") = Prop.forAll(genAst(4)) { ast =>
    val s = render(ast)
    val parsed = FormulaParser.parse(s)
    Prop(astEq(parsed, ast)) :| s"rendered: $s\nparsed:   $parsed\nexpected: $ast"
  }

  property("freeVariables = the rendered identifiers minus fn/method names") =
    Prop.forAll(genAst(4)) { ast =>
      def vars(a: FormulaAst): Set[String] = a match {
        case Num(_) => Set.empty
        case Var(n) => Set(n)
        case Unary(_, e) => vars(e)
        case Bin(_, l, r) => vars(l) ++ vars(r)
        case Call(_, as) => as.flatMap(vars).toSet
        case Method(t, _, as) => vars(t) ++ as.flatMap(vars)
      }
      FormulaParser.parse(render(ast)).freeVariables == vars(ast)
    }

  property("binary precedence: a OP1 b OP2 c groups by table") = {
    val tight = Seq("*", "/", "%", "//")
    val loose = Seq("+", "-")
    Prop.forAll(Gen.oneOf(loose), Gen.oneOf(tight)) { (lo, hi) =>
      // a lo b hi c == a lo (b hi c); a hi b lo c == (a hi b) lo c
      FormulaParser.parse(s"a $lo b $hi c") ==
        Bin(lo, Var("a"), Bin(hi, Var("b"), Var("c"))) &&
      FormulaParser.parse(s"a $hi b $lo c") ==
        Bin(lo, Bin(hi, Var("a"), Var("b")), Var("c"))
    }
  }

  property("** is right-associative and tighter than unary minus") =
    Prop.forAll(Gen.choose(1, 9), Gen.choose(1, 9)) { (x, y) =>
      FormulaParser.parse(s"a ** b ** c") ==
        Bin("**", Var("a"), Bin("**", Var("b"), Var("c"))) &&
      FormulaParser.parse(s"-$x ** $y") ==
        Unary("-", Bin("**", Num(x.toDouble), Num(y.toDouble)))
    }
}

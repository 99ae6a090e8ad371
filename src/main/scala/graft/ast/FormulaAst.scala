package graft.ast

/** Formula-DSL abstract syntax tree.
  *
  * The reference's formula language is "whatever `pd.eval` accepts"
  * (reference: src/ssb_coefficient_maker/coeff_maker.py:766) — element-wise
  * arithmetic over named matrices/vectors with python precedence, math
  * functions, and a small set of pandas method calls
  * (SURVEY.md §2.2 E1–E12). We parse to our own AST; no sympy, no Catalyst
  * involvement at this layer (pure JVM, unit-testable without Spark).
  */
sealed trait FormulaAst {
  /** Free variable names referenced by this expression (SURVEY §2.5 F2). */
  def freeVariables: Set[String] = this match {
    case Num(_)              => Set.empty
    case Str(_)              => Set.empty
    case ListLit(items)      => items.flatMap(_.freeVariables).toSet
    case Var(n)              => Set(n)
    case Unary(_, e)         => e.freeVariables
    case Bin(_, l, r)        => l.freeVariables ++ r.freeVariables
    case Call(_, args)       => args.flatMap(_.freeVariables).toSet
    case Method(t, _, args)  => t.freeVariables ++ args.flatMap(_.freeVariables)
    case Kw(_, v)            => v.freeVariables
  }

  /** True if the tree contains the given binary operator (e.g. "/", "**"). */
  def containsOp(op: String): Boolean = this match {
    case Num(_)             => false
    case Str(_)             => false
    case ListLit(items)     => items.exists(_.containsOp(op))
    case Var(_)             => false
    case Unary(_, e)        => e.containsOp(op)
    case Bin(o, l, r)       => o == op || l.containsOp(op) || r.containsOp(op)
    case Call(_, args)      => args.exists(_.containsOp(op))
    case Method(t, m, args) =>
      (op == "**" && m == "pow") || t.containsOp(op) || args.exists(_.containsOp(op))
    case Kw(_, v)           => v.containsOp(op)
  }
}

final case class Num(v: Double) extends FormulaAst
/** python string literal ('...' or "..."), r11 — only meaningful as a
  * method argument (e.g. rank(method='min')); any arithmetic use is a
  * clean compile-time TypeError, matching pd.eval */
final case class Str(v: String) extends FormulaAst
/** python list literal [a, b, ...] (r11) — only meaningful as a method
  * argument (e.g. isin([1, 2])); elements must compile to scalars */
final case class ListLit(items: List[FormulaAst]) extends FormulaAst
final case class Var(name: String) extends FormulaAst
/** op ∈ {"-", "+", "~"} */
final case class Unary(op: String, e: FormulaAst) extends FormulaAst
/** op ∈ {+ - * / % // ** > < >= <= == != & |} */
final case class Bin(op: String, l: FormulaAst, r: FormulaAst) extends FormulaAst
/** math function call, e.g. log(a), arctan2(a, b) (SURVEY §2.2 E9) */
final case class Call(fn: String, args: List[FormulaAst]) extends FormulaAst
/** whitelisted method call, e.g. a.fillna(0), a.clip(1, 2), a.sum() (E10/E11) */
final case class Method(target: FormulaAst, name: String, args: List[FormulaAst])
    extends FormulaAst
/** keyword argument inside a call's arg list, e.g. min_periods=2 in
  * a.rolling(5, min_periods=2) (r10; python call syntax — only ever a
  * child of Method/Call args, never a standalone expression) */
final case class Kw(name: String, value: FormulaAst) extends FormulaAst

/** Raised on malformed formulas; mirrors the reference's decorated
  * SyntaxError path (coeff_maker.py:784-788). */
final class FormulaSyntaxException(msg: String) extends RuntimeException(msg)

/** Hand-rolled recursive-descent parser (SURVEY §2.5 F1).
  *
  * Precedence (loosest→tightest), matching python/pd.eval intent:
  *   `|`  <  `&`  <  comparisons  <  `+ -`  <  `* / % //`  <  unary `- + ~`
  *   <  `**` (right-assoc, exponent may carry unary)  <  postfix `.method(...)`
  */
object FormulaParser {

  private final case class Tok(kind: String, text: String, pos: Int)

  def parse(formula: String): FormulaAst = {
    val toks = tokenize(formula)
    val p = new P(toks, formula)
    val e = p.parseOr()
    p.expectEnd()
    e
  }

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) { i += 1 }
      else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val start = i
        // a numeric literal holds at most ONE point (python lexer rule):
        // "3.25.sum" must tokenize as 3.25 · dot · sum (method call on a
        // float literal), not as the malformed number "3.25."
        var seenDot = false
        while (i < n && (s(i).isDigit || (s(i) == '.' && !seenDot))) {
          if (s(i) == '.') seenDot = true
          i += 1
        }
        if (i < n && (s(i) == 'e' || s(i) == 'E')) {
          var j = i + 1
          if (j < n && (s(j) == '+' || s(j) == '-')) j += 1
          if (j < n && s(j).isDigit) { i = j; while (i < n && s(i).isDigit) i += 1 }
        }
        out += Tok("num", s.substring(start, i), start)
      } else if (c == '\'' || c == '"') {
        // python string literal: same-quote terminated, no escape
        // sequences (formula strings are identifiers like 'min' /
        // 'dense'; an embedded quote has no use case and would silently
        // change meaning — reject unterminated cleanly instead)
        val q = c
        val start = i
        i += 1
        while (i < n && s(i) != q) i += 1
        if (i >= n) throw new FormulaSyntaxException(
          s"Unterminated string literal starting at position $start in formula: $s")
        out += Tok("str", s.substring(start + 1, i), start)
        i += 1
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Tok("ident", s.substring(start, i), start)
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        two match {
          case "**" | "//" | ">=" | "<=" | "==" | "!=" =>
            out += Tok("op", two, i); i += 2
          case _ =>
            c match {
              case '+' | '-' | '*' | '/' | '%' | '>' | '<' | '&' | '|' | '~' |
                   '=' =>
                // bare '=' never parses as an operator — it only ever
                // forms a keyword argument (ident '=' expr) inside a
                // call's arg list (r10); anywhere else it surfaces as a
                // clean "Unexpected token '='"
                out += Tok("op", c.toString, i); i += 1
              case '(' => out += Tok("lparen", "(", i); i += 1
              case ')' => out += Tok("rparen", ")", i); i += 1
              case '[' => out += Tok("lbracket", "[", i); i += 1
              case ']' => out += Tok("rbracket", "]", i); i += 1
              case ',' => out += Tok("comma", ",", i); i += 1
              case '.' => out += Tok("dot", ".", i); i += 1
              case other =>
                throw new FormulaSyntaxException(
                  s"Unexpected character '$other' at position $i in formula: $s")
            }
        }
      }
    }
    out.result()
  }

  private final class P(toks: Vector[Tok], src: String) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    private def advance(): Tok = { val t = toks(i); i += 1; t }
    private def peekOp(ops: Set[String]): Option[String] =
      peek.collect { case Tok("op", t, _) if ops(t) => t }

    def expectEnd(): Unit =
      peek.foreach(t => throw new FormulaSyntaxException(
        s"Unexpected token '${t.text}' at position ${t.pos} in formula: $src"))

    def parseOr(): FormulaAst = {
      var l = parseAnd()
      while (peekOp(Set("|")).isDefined) { advance(); l = Bin("|", l, parseAnd()) }
      l
    }
    private def parseAnd(): FormulaAst = {
      var l = parseCmp()
      while (peekOp(Set("&")).isDefined) { advance(); l = Bin("&", l, parseCmp()) }
      l
    }
    // python chained-comparison semantics: `a < b < c` ≡ `(a < b) & (b < c)`
    // (operands are pure expressions here, so re-referencing `b` is safe)
    private def parseCmp(): FormulaAst = {
      val cmpOps = Set(">", "<", ">=", "<=", "==", "!=")
      val first = parseAdd()
      val ops = scala.collection.mutable.ListBuffer[String]()
      val operands = scala.collection.mutable.ListBuffer[FormulaAst](first)
      var op = peekOp(cmpOps)
      while (op.isDefined) {
        advance(); ops += op.get; operands += parseAdd()
        op = peekOp(cmpOps)
      }
      if (ops.isEmpty) first
      else ops.toList.zipWithIndex
        .map { case (o, k) => Bin(o, operands(k), operands(k + 1)): FormulaAst }
        .reduceLeft((acc, c) => Bin("&", acc, c))
    }
    private def parseAdd(): FormulaAst = {
      var l = parseMul()
      var op = peekOp(Set("+", "-"))
      while (op.isDefined) {
        advance(); l = Bin(op.get, l, parseMul())
        op = peekOp(Set("+", "-"))
      }
      l
    }
    private def parseMul(): FormulaAst = {
      var l = parseUnary()
      var op = peekOp(Set("*", "/", "%", "//"))
      while (op.isDefined) {
        advance(); l = Bin(op.get, l, parseUnary())
        op = peekOp(Set("*", "/", "%", "//"))
      }
      l
    }
    // python: u_expr ::= power | "-" u_expr ; power ::= primary ["**" u_expr]
    private def parseUnary(): FormulaAst =
      peekOp(Set("-", "+", "~")) match {
        case Some(op) => advance(); Unary(op, parseUnary())
        case None     => parsePower()
      }
    private def parsePower(): FormulaAst = {
      val base = parsePostfix()
      if (peekOp(Set("**")).isDefined) { advance(); Bin("**", base, parseUnary()) }
      else base
    }
    private def parsePostfix(): FormulaAst = {
      var e = parseAtom()
      while (peek.exists(_.kind == "dot")) {
        advance()
        val name = peek match {
          case Some(Tok("ident", t, _)) => advance(); t
          case other => throw new FormulaSyntaxException(
            s"Expected method name after '.', got ${other.map(_.text).getOrElse("<end>")} in: $src")
        }
        val args =
          if (peek.exists(_.kind == "lparen")) parseArgs()
          else Nil // attribute access like `.T` — parsed, rejected at compile
        e = Method(e, name, args)
      }
      e
    }
    private def peekAt(off: Int): Option[Tok] =
      if (i + off < toks.length) Some(toks(i + off)) else None

    /** One call argument: `ident = expr` is a keyword argument (python
      * call syntax, r10 — e.g. rolling(5, min_periods=2)), anything else
      * a positional expression. */
    private def parseArg(): FormulaAst =
      (peek, peekAt(1)) match {
        case (Some(Tok("ident", kw, _)), Some(Tok("op", "=", _))) =>
          advance(); advance()
          Kw(kw, parseOr())
        case _ => parseOr()
      }

    private def parseArgs(): List[FormulaAst] = {
      advance() // '('
      if (peek.exists(_.kind == "rparen")) { advance(); return Nil }
      val args = scala.collection.mutable.ListBuffer[FormulaAst]()
      args += parseArg()
      while (peek.exists(_.kind == "comma")) { advance(); args += parseArg() }
      peek match {
        case Some(Tok("rparen", _, _)) => advance()
        case other => throw new FormulaSyntaxException(
          s"Expected ')', got ${other.map(_.text).getOrElse("<end>")} in: $src")
      }
      args.toList
    }
    private def parseAtom(): FormulaAst =
      peek match {
        case Some(Tok("num", t, _))   => advance(); Num(t.toDouble)
        case Some(Tok("str", t, _))   => advance(); Str(t)
        case Some(Tok("lbracket", _, _)) =>
          advance()
          val items = scala.collection.mutable.ListBuffer[FormulaAst]()
          if (!peek.exists(_.kind == "rbracket")) {
            items += parseOr()
            while (peek.exists(_.kind == "comma")) { advance(); items += parseOr() }
          }
          peek match {
            case Some(Tok("rbracket", _, _)) => advance(); ListLit(items.toList)
            case other => throw new FormulaSyntaxException(
              s"Expected ']', got ${other.map(_.text).getOrElse("<end>")} in: $src")
          }
        case Some(Tok("ident", t, _)) =>
          advance()
          if (peek.exists(_.kind == "lparen")) Call(t, parseArgs()) else Var(t)
        case Some(Tok("lparen", _, _)) =>
          advance()
          val e = parseOr()
          peek match {
            case Some(Tok("rparen", _, _)) => advance(); e
            case other => throw new FormulaSyntaxException(
              s"Expected ')', got ${other.map(_.text).getOrElse("<end>")} in: $src")
          }
        case other =>
          throw new FormulaSyntaxException(
            s"Unexpected ${other.map(t => s"token '${t.text}'").getOrElse("end of input")} in formula: $src")
      }
  }
}

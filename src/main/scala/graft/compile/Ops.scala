package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Element-wise operator semantics with numpy/pandas float64 parity
  * (SURVEY.md §2.2 E1–E9).
  *
  * Spark's SQL semantics intentionally deviate from IEEE 754 in places the
  * reference (pandas/numpy) does not:
  *   - double `x / 0`  → NULL in Spark (non-ANSI), but ±Inf/NaN in numpy;
  *   - `x % 0`         → NULL in Spark, NaN in numpy; `%` sign follows the
  *                       dividend in Spark (C-style) but the divisor in
  *                       python/numpy;
  *   - NaN compares as the LARGEST double and NaN == NaN is true in Spark;
  *                       numpy: every comparison with NaN is false except !=;
  *   - `log/log10/log1p` of out-of-domain input → NULL in Spark; numpy gives
  *                       -Inf at the boundary and NaN below it;
  *   - `floor/ceil` on double → LongType in Spark; numpy keeps float64.
  *
  * Every wrapper below restores the numpy behavior using only codegen'd
  * built-ins (`when/otherwise`, `isnan`, arithmetic) — the whole expression
  * tree stays inside WholeStageCodegen; no UDFs (SURVEY §4.3).
  */
object Ops {

  private val nan = lit(Double.NaN)
  private val posInf = lit(Double.PositiveInfinity)
  private val negInf = lit(Double.NegativeInfinity)

  /** A cell is invalid iff NULL, NaN or ±Inf (V1, coeff_maker.py:143-185).
    * (In standard mode nulls never escape ingest; after an alignment
    * full-outer join they mark row-misses and read as NaN.)
    */
  def invalid(c: Column): Column =
    c.isNull || isnan(c) || c === posInf || c === negInf

  /** null → NaN (row-miss from an alignment join reads as NaN). */
  def denull(c: Column): Column = coalesce(c, nan)

  // ---- arithmetic ---------------------------------------------------------

  def add(l: Column, r: Column): Column = l + r
  def sub(l: Column, r: Column): Column = l - r
  def mul(l: Column, r: Column): Column = l * r

  /** IEEE division: x/0 → ±Inf, 0/0 and NaN/0 → NaN (numpy semantics). */
  def div(l: Column, r: Column): Column =
    when(r === 0.0,
      when(isnan(l) || l === 0.0, nan)
        .when(l > 0.0, posInf)
        .otherwise(negInf))
      .otherwise(l / r)

  /** python float modulo: sign follows divisor; x % 0 → NaN. */
  def mod(l: Column, r: Column): Column =
    when(r === 0.0 || isnan(l) || isnan(r), nan)
      .otherwise(((l % r) + r) % r)

  /** python floor division: floor(x / y) with IEEE division. */
  def floorDiv(l: Column, r: Column): Column = floorD(div(l, r))

  /** numpy `**`: Math.pow semantics match numpy.power on float64. */
  def pow2(l: Column, r: Column): Column = pow(l, r)

  def neg(c: Column): Column = -c

  // ---- comparisons (numpy: NaN makes everything false except !=) ----------

  private def cmpGuard(l: Column, r: Column)(raw: Column): Column =
    when(isnan(l) || isnan(r), lit(false)).otherwise(raw)

  def gt(l: Column, r: Column): Column  = cmpGuard(l, r)(l > r)
  def lt(l: Column, r: Column): Column  = cmpGuard(l, r)(l < r)
  def geq(l: Column, r: Column): Column = cmpGuard(l, r)(l >= r)
  def leq(l: Column, r: Column): Column = cmpGuard(l, r)(l <= r)
  def eq(l: Column, r: Column): Column  = cmpGuard(l, r)(l === r)
  def neq(l: Column, r: Column): Column =
    when(isnan(l) || isnan(r), lit(true)).otherwise(l =!= r)

  def and(l: Column, r: Column): Column = l && r
  def or(l: Column, r: Column): Column  = l || r
  def not(c: Column): Column            = !c

  // ---- math functions (E9) ------------------------------------------------

  /** floor keeping float64. Spark's floor(double) returns LONG, which
    * (a) loses NaN/Inf and (b) CLAMPS at ±2^63 — floor(1.3e19) would come
    * back as Long.MaxValue. Any double with |x| ≥ 2^52 is already integral
    * in float64, so it passes through untouched and the long-returning
    * floor only runs where it is exact. (Found by OpsPropSpec.) */
  private val TwoPow52 = 4503599627370496.0 // 2^52
  def floorD(c: Column): Column =
    when(isnan(c) || abs(c) >= TwoPow52, c)
      .otherwise(floor(c).cast("double"))

  def ceilD(c: Column): Column =
    when(isnan(c) || abs(c) >= TwoPow52, c)
      .otherwise(ceil(c).cast("double"))

  /** numpy log: log(0) → -Inf, log(x<0) → NaN (Spark: NULL for both). */
  def logN(c: Column): Column =
    when(c === 0.0, negInf).when(c < 0.0, nan).otherwise(log(c))

  def log10N(c: Column): Column =
    when(c === 0.0, negInf).when(c < 0.0, nan).otherwise(log10(c))

  def log1pN(c: Column): Column =
    when(c === -1.0, negInf).when(c < -1.0, nan).otherwise(log1p(c))

  /** The E9 function table: 1:1 numpy ufunc → codegen'd Spark function. */
  val functions: Map[String, Column => Column] = Map(
    "sin" -> sin, "cos" -> cos, "tan" -> tan,
    "arcsin" -> asin, "arccos" -> acos, "arctan" -> atan,
    "sinh" -> sinh, "cosh" -> cosh, "tanh" -> tanh,
    "arcsinh" -> asinh, "arccosh" -> acosh, "arctanh" -> atanh,
    "log" -> logN, "log10" -> log10N, "log1p" -> log1pN,
    "exp" -> exp, "expm1" -> expm1,
    "sqrt" -> sqrt, "abs" -> abs,
    "floor" -> floorD, "ceil" -> ceilD,
  )

  val functions2: Map[String, (Column, Column) => Column] = Map(
    "arctan2" -> ((l: Column, r: Column) => atan2(l, r)),
  )

  /** Driver-side doubles for the 2-arg E9 functions (Vec∘Vec / Vec∘scalar /
    * scalar∘scalar operand kinds — same dispatch table as [[functions2]]). */
  val scalarFns2: Map[String, (Double, Double) => Double] = Map(
    "arctan2" -> ((y: Double, x: Double) => math.atan2(y, x)),
  )

  def scalarFn2(fn: String): (Double, Double) => Double =
    scalarFns2.getOrElse(fn,
      throw new IllegalArgumentException(s"Unknown 2-arg function '$fn'"))

  // ---- driver-side doubles (Vec ∘ Vec / scalar paths, SURVEY §2.3 A3) -----

  /** The same semantics on plain doubles; Java doubles already match numpy. */
  def scalarBin(op: String, l: Double, r: Double): Double = op match {
    case "+"  => l + r
    case "-"  => l - r
    case "*"  => l * r
    case "/"  => l / r // JVM double division is IEEE: x/0 → ±Inf, 0/0 → NaN
    case "%"  => if (r == 0.0 || l.isNaN || r.isNaN) Double.NaN
                 else { val m = l % r; if (m != 0 && ((m < 0) != (r < 0))) m + r else m }
    case "//" => math.floor(l / r)
    case "**" => math.pow(l, r)
    case other => throw new IllegalArgumentException(s"scalar op $other")
  }

  def scalarFn(fn: String, x: Double): Double = fn match {
    case "sin" => math.sin(x); case "cos" => math.cos(x); case "tan" => math.tan(x)
    case "arcsin" => math.asin(x); case "arccos" => math.acos(x)
    case "arctan" => math.atan(x)
    case "sinh" => math.sinh(x); case "cosh" => math.cosh(x)
    case "tanh" => math.tanh(x)
    case "arcsinh" => math.log(x + math.sqrt(x * x + 1))
    case "arccosh" => if (x < 1) Double.NaN else math.log(x + math.sqrt(x * x - 1))
    case "arctanh" => 0.5 * math.log((1 + x) / (1 - x))
    case "log" => math.log(x); case "log10" => math.log10(x)
    case "log1p" => math.log1p(x)
    case "exp" => math.exp(x); case "expm1" => math.expm1(x)
    case "sqrt" => math.sqrt(x); case "abs" => math.abs(x)
    case "floor" => math.floor(x); case "ceil" => math.ceil(x)
    case other => throw new IllegalArgumentException(s"Unknown function '$other'")
  }
}

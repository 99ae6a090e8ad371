package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unbounded-exponent arbitrary-precision decimal arithmetic — the value
  * layer of the engine's "unbounded ADP" mode (SURVEY §7.4(5) closure).
  *
  * The reference's ADP mode is mpmath `mpf` — binary floating point with an
  * UNBOUNDED exponent — so its own tests instantiate 1e-30/1e30 and demand
  * `small * large * small == 1e-16` to relative error < 1e-40
  * (reference: tests/test_FormulaEvaluator_pt2.py:383-409, 578-645).
  * Spark's `DecimalType(38, s)` is a fixed-point geometry: it cannot hold
  * 1e30 and 1e-30 simultaneously, which is why the engine's default ADP
  * mode documents that regime as out of contract. This family closes the
  * gap: cells are canonical decimal STRINGS and the arithmetic runs on
  * `java.math.BigDecimal`, whose exponent is a 32-bit scale — effectively
  * unbounded for any physical dataset. `+ - *` are EXACT (no rounding at
  * all — stronger than mpf); `/` rounds to the session's
  * `decimal_precision` significant digits (HALF_EVEN), mirroring the
  * reference's `mp.dps = decimal_precision` contract.
  *
  * Every expression implements real `doGenCode` (one static call into the
  * same kernel `eval` uses) so projections stay inside WholeStageCodegen —
  * the same discipline as [[DotProduct]]. Division by zero yields NULL, the
  * ADP invalid marker (identical to the bounded-decimal mode's `try_divide`
  * semantics), so the validation subsystem (V1–V9) works unchanged.
  */
object BigDecMath {

  def parse(s: UTF8String): java.math.BigDecimal =
    try new java.math.BigDecimal(s.toString.trim)
    catch {
      case _: NumberFormatException =>
        throw new NumberFormatException(
          s"could not convert string '$s' to an arbitrary-precision decimal " +
            "(unbounded ADP mode ingests numeric columns or exact decimal " +
            "strings; see reference coeff_maker.py:633-638)")
    }

  /** Canonical form: trailing zeros stripped (so 2E-30 == 2.0E-30 == the
    * string both engines print), signed zero collapsed to "0". */
  def out(b: java.math.BigDecimal): UTF8String = {
    if (b.signum == 0) return UTF8String.fromString("0")
    UTF8String.fromString(b.stripTrailingZeros.toString)
  }

  def norm(x: UTF8String): UTF8String = out(parse(x))
  def neg(x: UTF8String): UTF8String = out(parse(x).negate)
  def abs(x: UTF8String): UTF8String = out(parse(x).abs)
  def add(l: UTF8String, r: UTF8String): UTF8String = out(parse(l).add(parse(r)))
  def sub(l: UTF8String, r: UTF8String): UTF8String = out(parse(l).subtract(parse(r)))
  def mul(l: UTF8String, r: UTF8String): UTF8String = out(parse(l).multiply(parse(r)))

  /** Division at `prec` significant digits, HALF_EVEN; x/0 → null (the ADP
    * invalid marker — bounded-decimal mode's try_divide does the same). */
  def div(l: UTF8String, r: UTF8String, prec: Int): UTF8String = {
    val d = parse(r)
    if (d.signum == 0) null
    else out(parse(l).divide(d,
      new java.math.MathContext(prec, java.math.RoundingMode.HALF_EVEN)))
  }

  /** Remainder (exact); x%0 → null. Sign follows the dividend (Java) — the
    * formula layer never routes python-`%` here without a guard. */
  def mod(l: UTF8String, r: UTF8String): UTF8String = {
    val d = parse(r)
    if (d.signum == 0) null else out(parse(l).remainder(d))
  }

  /** Three-way numeric compare (scale-insensitive: 2E-30 == 2.0E-30). */
  def cmp(l: UTF8String, r: UTF8String): Int = parse(l).compareTo(parse(r))
}

private[functions] trait BdStringResult { self: Expression =>
  override def dataType: DataType = StringType
  def checkStr(ts: DataType*): TypeCheckResult =
    if (ts.forall(_ == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects string operands, got ${ts.map(_.simpleString).mkString(", ")}")
}

/** Canonicalize (and parse-check) a decimal string cell. */
case class BdNorm(child: Expression) extends UnaryExpression with BdStringResult {
  override def checkInputDataTypes(): TypeCheckResult = checkStr(child.dataType)
  override def nullSafeEval(x: Any): Any = BigDecMath.norm(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigDecMath.norm($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class BdNeg(child: Expression) extends UnaryExpression with BdStringResult {
  override def checkInputDataTypes(): TypeCheckResult = checkStr(child.dataType)
  override def nullSafeEval(x: Any): Any = BigDecMath.neg(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigDecMath.neg($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class BdAbs(child: Expression) extends UnaryExpression with BdStringResult {
  override def checkInputDataTypes(): TypeCheckResult = checkStr(child.dataType)
  override def nullSafeEval(x: Any): Any = BigDecMath.abs(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigDecMath.abs($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

private[functions] abstract class BdBinary extends BinaryExpression with BdStringResult {
  override def checkInputDataTypes(): TypeCheckResult =
    checkStr(left.dataType, right.dataType)
  /** java source for the kernel call over operands (a, b). */
  def kernel(a: String, b: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => kernel(a, b))
}

case class BdAdd(left: Expression, right: Expression) extends BdBinary {
  override def nullSafeEval(l: Any, r: Any): Any =
    BigDecMath.add(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  def kernel(a: String, b: String) = s"graft.functions.BigDecMath.add($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class BdSub(left: Expression, right: Expression) extends BdBinary {
  override def nullSafeEval(l: Any, r: Any): Any =
    BigDecMath.sub(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  def kernel(a: String, b: String) = s"graft.functions.BigDecMath.sub($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class BdMul(left: Expression, right: Expression) extends BdBinary {
  override def nullSafeEval(l: Any, r: Any): Any =
    BigDecMath.mul(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  def kernel(a: String, b: String) = s"graft.functions.BigDecMath.mul($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Division and remainder can return null on a zero divisor even for
  * non-null inputs, so they use nullSafeCodeGen with a result-null check
  * instead of defineCodeGen. */
case class BdDiv(left: Expression, right: Expression, prec: Int)
    extends BinaryExpression with BdStringResult {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkStr(left.dataType, right.dataType)
  override def nullSafeEval(l: Any, r: Any): Any =
    BigDecMath.div(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], prec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.BigDecMath.div($a, $b, $prec);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class BdMod(left: Expression, right: Expression)
    extends BinaryExpression with BdStringResult {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkStr(left.dataType, right.dataType)
  override def nullSafeEval(l: Any, r: Any): Any =
    BigDecMath.mod(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.BigDecMath.mod($a, $b);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Numeric three-way compare on decimal strings → int (-1/0/1). The
  * comparison operators compose on top (`bd_cmp(a,b) < 0` etc.), keeping
  * one kernel instead of six expressions. */
case class BdCmp(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bd_cmp expects string operands, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def nullSafeEval(l: Any, r: Any): Any =
    BigDecMath.cmp(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BigDecMath.cmp($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Exact BigDecimal sum over a decimal-string column (nulls skipped; empty
  * input sums to "0" — pandas' skipna sum). Fixed-size state (one
  * BigDecimal) per partition; merges associatively, so map-side partial
  * aggregation works as usual. */
case class BdSum(child: Expression,
                 mutableAggBufferOffset: Int = 0,
                 inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.math.BigDecimal] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bd_sum expects string, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.math.BigDecimal =
    java.math.BigDecimal.ZERO

  override def update(buf: java.math.BigDecimal, input: InternalRow): java.math.BigDecimal = {
    val v = child.eval(input)
    if (v == null) buf
    else buf.add(BigDecMath.parse(v.asInstanceOf[UTF8String]))
  }

  override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
    a.add(b)

  override def eval(buf: java.math.BigDecimal): Any = BigDecMath.out(buf)

  override def serialize(buf: java.math.BigDecimal): Array[Byte] =
    buf.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  override def deserialize(bytes: Array[Byte]): java.math.BigDecimal =
    new java.math.BigDecimal(
      new String(bytes, java.nio.charset.StandardCharsets.US_ASCII))

  override def withNewMutableAggBufferOffset(offset: Int): BdSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BdSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BdSum =
    copy(child = cs.head)
}

/** Column-level API for the unbounded-decimal family. */
object BigDec {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)
  private def col(x: Expression): Column = GraftColumnBridge.column(x)

  def norm(c: Column): Column = col(BdNorm(e(c)))
  def neg(c: Column): Column = col(BdNeg(e(c)))
  def abs(c: Column): Column = col(BdAbs(e(c)))
  def add(l: Column, r: Column): Column = col(BdAdd(e(l), e(r)))
  def sub(l: Column, r: Column): Column = col(BdSub(e(l), e(r)))
  def mul(l: Column, r: Column): Column = col(BdMul(e(l), e(r)))
  def div(l: Column, r: Column, prec: Int): Column = col(BdDiv(e(l), e(r), prec))
  def mod(l: Column, r: Column): Column = col(BdMod(e(l), e(r)))
  def cmp(l: Column, r: Column): Column = col(BdCmp(e(l), e(r)))
  def sum(c: Column): Column = col(BdSum(e(c)).toAggregateExpression())

  /** Canonical decimal string for a driver-side double (shortest decimal
    * representation — `BigDecimal.valueOf`, the same mapping Spark's
    * double→string cast uses). */
  def litOf(v: Double): String = {
    require(!v.isNaN && !v.isInfinite,
      "unbounded ADP mode has no NaN/Inf cells (invalid = NULL)")
    BigDecMath.out(java.math.BigDecimal.valueOf(v)).toString
  }
}

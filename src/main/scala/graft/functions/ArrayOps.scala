package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for embedding arithmetic.
  *
  * Spark has no native dot product; the `zip_with`+`aggregate` composition
  * is semantically right but runs INTERPRETED (per-element Expression.eval
  * with boxing — measured ~1.5 ms per 64-dim pair when it lands in a join's
  * bound condition). These expressions run a compiled Scala loop over the
  * unsafe array data instead (~0.2 µs), the (b)-tier extension path from
  * SURVEY §4.3 / the Spark guide's preference order.
  */

/** Double-precision dot product of two float/double array columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elems(t: DataType, a: ArrayData): Array[Double] = t match {
    case ArrayType(FloatType, _)  => a.toFloatArray().map(_.toDouble)
    case _                        => a.toDoubleArray()
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = elems(left.dataType, l.asInstanceOf[ArrayData])
    val b = elems(right.dataType, r.asInstanceOf[ArrayData])
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Order-independent exact dot product: each pairwise double product is
  * rounded to DECIMAL(38,30) (identical to Spark's double→decimal cast:
  * BigDecimal.valueOf, i.e. the shortest decimal representation — exact at
  * scale 30) and summed exactly; the decimal total is returned as a double.
  * Bit-equivalent to
  * `aggregate(zip_with(a,b,(x,y)->cast(x*y as decimal(38,30))),0,+).cast(double)`
  * but ~1000× faster. */
case class DotProductExact(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elems(t: DataType, a: ArrayData): Array[Double] = t match {
    case ArrayType(FloatType, _)  => a.toFloatArray().map(_.toDouble)
    case _                        => a.toDoubleArray()
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = elems(left.dataType, l.asInstanceOf[ArrayData])
    val b = elems(right.dataType, r.asInstanceOf[ArrayData])
    val n = math.min(a.length, b.length)
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      acc = acc.add(java.math.BigDecimal.valueOf(a(i) * b(i)))
      i += 1
    }
    acc.doubleValue()
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Engine-portable rolling hash of a string array (one compiled loop per
  * row; the HOF formulation evaluates md5 per element INTERPRETED, measured
  * ~70× slower). Per token: h = md5_60("0:" + token) % 2^20 (first 15 md5
  * hex digits as a long); acc' = (acc * 1000003 + h) % 2^40. Every step is
  * exact signed-64 arithmetic any SQL engine reproduces. */
case class PortableRollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      md.reset()
      val bytes = md.digest(
        ("0:" + arr.getUTF8String(i).toString).getBytes("UTF-8"))
      // first 15 hex digits = top 60 bits of the first 8 digest bytes
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (bytes(j) & 0xFFL); j += 1 }
      h = h >>> 4 // drop the 16th hex digit
      acc = (acc * 1000003L + h % 1048576L) % 1099511627776L
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Static hash helpers callable from generated Java (no companion class, so
  * scalac emits static forwarders and codegen can reference
  * `graft.functions.GraftHash.md5Long60(...)` directly). */
object GraftHash {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(utf8) as a long — identical to
    * `conv(substring(md5(x),1,15),16,10)::long` (16 hex digits = the first
    * 8 digest bytes as an unsigned 64-bit value; dropping the 16th digit is
    * a `>>> 4`), without the hex-string/substring/bigint-parse detour. */
  def md5Long60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val b = md.digest(s.getBytes)
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (b(j) & 0xFFL); j += 1 }
    h >>> 4
  }
}

/** Engine-portable 60-bit string hash (SURVEY §2.9 dedup operators): the
  * first 15 hex digits of md5 as a long, with REAL whole-stage codegen —
  * the built-in `conv(substring(md5(x),1,15),16,10)` chain allocates a hex
  * string, a substring and a radix-parse per row; this compiles to one
  * static call. */
case class Md5Long60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_long60 expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(in: Any): Any =
    GraftHash.md5Long60(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.md5Long60($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object ArrayOps {
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Fast double dot product (compiled loop). */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(expr(a), expr(b)))

  /** Exact, order-independent dot product (decimal-summed, as double). */
  def dot_product_exact(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExact(expr(a), expr(b)))

  /** Portable rolling hash over a string-array column (compiled loop). */
  def rolling_hash_portable(a: Column): Column =
    GraftColumnBridge.column(PortableRollingHash(expr(a)))

  /** Portable 60-bit md5 hash of a string column (codegen'd static call). */
  def md5_long60(c: Column): Column =
    GraftColumnBridge.column(Md5Long60(expr(c)))
}

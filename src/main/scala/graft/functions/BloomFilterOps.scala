package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter runtime join pruning: the semi-join-reduction pattern that
  * matters at 100 TB. Build a Bloom filter over the (already-filtered) dim
  * side's join keys with a DISTRIBUTED aggregate, ship the few-MB bits to
  * every fact task, and drop non-joining fact rows INSIDE the scan stage —
  * before they pay the shuffle. The subsequent real join removes the false
  * positives, so results are exactly the plain join's (the oracle is the
  * plain join SQL); the bloom changes only where rows die.
  *
  * The membership probe is a compiled Catalyst expression with real
  * `doGenCode` (the filter object rides along via `addReferenceObj`), so
  * the probe stays inside whole-stage codegen next to the scan.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects bigint/int, got ${t.simpleString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(in: Any): Any = in match {
    case l: java.lang.Long => compute(l)
    case i: java.lang.Integer => compute(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute((long) $c)")
  }

  def compute(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object BloomFilterOps {

  /** Serialize a built filter for shipment inside the expression tree. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column probe over a pre-built filter. */
  def might_contain(key: Column, bf: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(key), toBytes(bf)))

  /** Pre-filter `fact` to rows whose `factKey` might join `dim`'s `dimKey`:
    * builds the filter distributed (treeAggregate under
    * `DataFrameStatFunctions.bloomFilter` — partial filters OR-merged, only
    * the bits reach the driver), then applies the compiled probe as a
    * scan-stage filter. False positives pass through (by design — the real
    * join drops them); false negatives cannot occur. */
  def bloomPrefilter(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(might_contain(fact(factKey), bf))
  }
}

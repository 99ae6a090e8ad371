package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-feature linear text classifier inference (the fastText shape:
  * Joulin et al., "Bag of Tricks for Efficient Text Classification", EACL
  * 2017) as ONE compiled pass per document — the scan-speed quality-
  * classifier gate every large pretraining pipeline runs over its corpus
  * (reference capability class: SURVEY §2.9 text-quality scoring).
  *
  * Features are the document's unigrams plus (optionally) adjacent-token
  * bigrams, hashed into `dim` buckets with the engine-portable 60-bit md5
  * ([[GraftHash.md5Long60]], domain-tagged `"f:" + feature`). The weight of
  * bucket b is itself derived from the portable hash —
  * `md5_long60(seed + ":" + b) % 2001 - 1000`, an integer in [-1000, 1000]
  * representing a fixed-point weight w_b = that/1000 — so the "model" is
  * fully determined by (dim, seed) and any SQL engine reproduces it without
  * shipping a weight file. The weight TABLE (dim entries) is materialized
  * once per executor (transient lazy), so scoring costs one md5 per
  * feature, not two.
  *
  * Returns `struct(n_feats: long, milli: long)` where milli = Σ_features
  * (1000·w_bucket) — an EXACT integer sum (no float accumulation), so the
  * mean score `milli / (1000·n_feats)` is one double division that every
  * engine rounds identically. Downstream keeps/drops on `milli > 0`
  * (sign of the mean) — no sigmoid needed for a gate, and integer
  * comparison is bit-exact where `exp()` is libm-dependent.
  *
  * Scale shape: a narrow projection — no explode, no shuffle, no UDF; with
  * real codegen below it fuses into the scan stage at any corpus size. */
case class HashedLinearScore(child: Expression, dim: Int, seed: String,
                             bigrams: Boolean = true)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(dim > 0, s"dim must be positive, got $dim")

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("milli", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_linear_score expects array<string>, got ${t.simpleString}")
    }

  // weight table: dim integers in [-1000, 1000], derived once per executor
  // from the portable hash — never shipped, always reproducible
  @transient private lazy val weights: Array[Int] = {
    val w = new Array[Int](dim)
    var b = 0
    while (b < dim) {
      w(b) = (GraftHash.md5Long60(
        UTF8String.fromString(seed + ":" + b)) % 2001L - 1000L).toInt
      b += 1
    }
    w
  }

  override def nullSafeEval(in: Any): Any = compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedLinearScore", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  private def bucketWeight(feature: String): Int =
    weights((GraftHash.md5Long60(
      UTF8String.fromString("f:" + feature)) % dim).toInt)

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var milli = 0L
    var feats = 0L
    var i = 0
    var prev: String = null
    while (i < n) {
      val tok = arr.getUTF8String(i).toString
      milli += bucketWeight(tok)
      feats += 1
      if (bigrams && prev != null) {
        milli += bucketWeight(prev + " " + tok)
        feats += 1
      }
      prev = tok
      i += 1
    }
    InternalRow(feats, milli)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object Classifier {
  /** Column API: fastText-shape hashed linear score of a token-array
    * column. Returns struct(n_feats, milli); score = milli/(1000·n_feats). */
  def hashed_linear_score(toks: Column, dim: Int, seed: String,
                          bigrams: Boolean = true): Column =
    GraftColumnBridge.column(
      HashedLinearScore(GraftColumnBridge.expression(toks), dim, seed, bigrams))
}

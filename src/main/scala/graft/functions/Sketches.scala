package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k minimum values) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002; unbiased
  * estimator per Beyer et al., SIGMOD 2007) as a custom
  * `TypedImperativeAggregate`.
  *
  * The corpus-profiling question "how many distinct tokens / shingles /
  * urls are in this 100 TB dataset?" is the canonical sketch use case:
  * `count(distinct x)` shuffles the ENTIRE key domain (every distinct
  * value crosses the wire at least once), while this sketch keeps the k
  * smallest distinct hash values per partition — a bounded, mergeable
  * summary of ≤ k longs per partition through the shuffle, k ~ 1024.
  *
  * Contract: input is an already-hashed LONG column (the engine-portable
  * [[ArrayOps.md5_long60]], uniform on [0, 2^60)). The aggregate returns
  * the sorted ascending array of the k smallest DISTINCT hash values
  * (fewer if the input has < k distinct values). The estimator is then
  * plain arithmetic any engine reproduces bit-identically: with
  * u = h_(k) / 2^60 the normalized k-th minimum,
  * `distinct ≈ (k-1) / u` — and when fewer than k distinct values exist
  * the array length IS the exact distinct count.
  *
  * Exactly reproducible (not just approximately): the k smallest distinct
  * hashes of a dataset are a well-defined set, so a SQL oracle computes
  * the identical array via `SELECT DISTINCT h ORDER BY h LIMIT k` — the
  * sketch's accuracy-vs-k tradeoff is a separate, analytic fact. */
case class KMinValues(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmin_values expects a long (pre-hashed) column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      // TreeSet.add is a no-op on duplicates, so only evict on real growth
      if (buf.add(v) && buf.size() > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinValues =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValues =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KMinValues = copy(child = cs.head)
}

object Sketches {
  /** Column API: the k smallest distinct values of a pre-hashed long
    * column, sorted ascending (the KMV distinct-count sketch state). */
  def kmin_values(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      KMinValues(GraftColumnBridge.expression(c), k).toAggregateExpression())
}

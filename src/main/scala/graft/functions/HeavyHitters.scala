package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (Misra & Gries, "Finding repeated
  * elements", Sci. Comput. Program. 2(2), 1982; merge step per Agarwal et
  * al., "Mergeable summaries", PODS 2012) as a custom
  * `TypedImperativeAggregate` — the aggregate-function extension tier. The
  * classic question at corpus
  * scale ("which domains / languages / tokens dominate the training data?")
  * needs frequent items over billions of rows; an exact groupBy-count
  * materializes the full key domain through a shuffle, while this sketch
  * keeps AT MOST `capacity` counters per partition, merges them
  * associatively (map-side partial aggregation works as usual), and ships
  * `capacity` entries per partition instead of the domain.
  *
  * Guarantees (standard Misra–Gries):
  *  - every item with true frequency > n/(capacity+1) is in the summary;
  *  - each reported count is a LOWER bound, short by at most the total
  *    decrement `err` (also reported): count ≤ true ≤ count + err;
  *  - when the distinct-key count never exceeds `capacity`, no decrements
  *    happen and every count is EXACT — which is what makes the operator
  *    oracle-checkable on a bounded domain.
  *
  * Returns `struct<items: map<string, long>, err: long>`: item →
  * lower-bound count plus the summary's error bound as its own field —
  * a struct rather than a reserved in-map key, so a legitimate input item
  * can never collide with (or masquerade as) the error bound.
  */
case class MisraGries(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGries.Summary] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", MapType(StringType, LongType), nullable = false),
    StructField("err", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters expects string, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(new java.util.HashMap[String, Long](), 0L)

  override def update(buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) MisraGries.add(buf, v.asInstanceOf[UTF8String].toString, 1L, capacity)
    buf
  }

  override def merge(buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      MisraGries.add(buf, e.getKey, e.getValue, capacity)
    }
    buf.err += other.err
    buf
  }

  override def eval(buf: MisraGries.Summary): Any = {
    val n = buf.counts.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    InternalRow(
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals)),
      buf.err)
  }

  override def serialize(buf: MisraGries.Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.err)
    out.writeInt(buf.counts.size())
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val err = in.readLong()
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    new MisraGries.Summary(m, err)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MisraGries = copy(child = cs.head)
}

object MisraGries {
  /** Mutable sketch state: item → lower-bound count + accumulated error. */
  final class Summary(val counts: java.util.HashMap[String, Long], var err: Long)

  /** Add `w` occurrences of `item`; on overflow decrement ALL counters by
    * the minimum surviving count (the batched Misra–Gries step — exact
    * w.r.t. the one-at-a-time formulation's guarantees). */
  private[functions] def add(buf: Summary, item: String, w: Long, capacity: Int): Unit = {
    val cur = buf.counts.get(item)
    if (buf.counts.containsKey(item)) {
      buf.counts.put(item, cur + w)
    } else if (buf.counts.size() < capacity) {
      buf.counts.put(item, w)
    } else {
      // find the smallest count among residents and the newcomer
      var dec = w
      val it0 = buf.counts.values().iterator()
      while (it0.hasNext) { dec = math.min(dec, it0.next()) }
      // decrement everyone; drop zeros; newcomer keeps w - dec if positive
      val it = buf.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - dec
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
      if (w - dec > 0) buf.counts.put(item, w - dec)
      buf.err += dec
    }
  }
}

object HeavyHitters {
  /** Column API: Misra–Gries heavy-hitters summary of a string column.
    * Returns struct(items: map<item, lower-bound count>, err: error bound). */
  def heavy_hitters(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      MisraGries(GraftColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}

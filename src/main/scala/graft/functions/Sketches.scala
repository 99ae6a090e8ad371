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

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * custom `TypedImperativeAggregate`: `depth × width` counter cells; row j
  * of an item with base hash h increments cell `((a_j·h + b_j) mod P) mod
  * width` (the same universal-hash family over the Mersenne prime P =
  * 2^31−1 as the portable minhash); a point estimate is the MIN over the
  * item's depth cells — an upper bound on the true count, within
  * ε·N (ε = e/width) with probability 1 − e^−depth.
  *
  * The 100 TB use case is frequency estimation over an unbounded key
  * domain (tokens, URLs, n-grams): `groupBy(key).count` shuffles every
  * distinct key, while this sketch carries a FIXED depth·width block of
  * longs per partition through the shuffle, merged by elementwise add.
  *
  * Exactly reproducible: cell values are sums of per-item counts over a
  * deterministic hash partition of the key domain — order-independent and
  * SQL-expressible (the oracle recomputes every cell from exact per-key
  * counts and the same md5-derived hashes).
  *
  * Contract: input is the base hash `md5_long60(key) mod P` (already
  * reduced mod P); params are (a_j, b_j) pairs, one per depth row.
  * Output: the flattened long[depth·width] cell array, row-major. */
case class CountMinSketch(child: Expression, width: Int,
                          params: Seq[(Long, Long)],
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0, s"width must be positive, got $width")
  require(params.nonEmpty, "need at least one (a, b) hash-row param")
  private def depth: Int = params.length

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min expects a long (pre-hashed) column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        val (a, b) = params(j)
        buf(j * width + (((a * h + b) % GraftHash.UhPrime) % width).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CountMinSketch = copy(child = cs.head)
}

/** KLL-style streaming quantile sketch (Karnin, Lang, Liberty, "Optimal
  * quantile approximation in streams", FOCS 2016 — simplified: uniform
  * per-level capacity, deterministic alternating compaction instead of
  * random offsets) as a custom `TypedImperativeAggregate`.
  *
  * The 100 TB question "what are the p50/p90/p99 document lengths of this
  * corpus?" cannot run as an exact sort at scale; `percentile` collects
  * every value per group. This sketch keeps ≤ capacity values per level
  * (level ℓ values each standing for 2^ℓ originals): memory is
  * O(capacity · log(n / capacity)) and the shuffle carries the bounded
  * level arrays, never the data.
  *
  * Compaction: when a level fills, it is sorted and every other element
  * is promoted to the next level (the parity alternates per level
  * compaction, so the up/down bias cancels). Deterministic — but in the
  * compacting regime the result depends on merge order, like every
  * deterministic mergeable quantile sketch; the rank-error bound
  * (ScalaTest: ≲ 2·H/capacity with H levels) holds for any order.
  *
  * Oracle contract (the [[MisraGries]] discipline): when a group's total
  * count stays ≤ capacity, level 0 never compacts and holds EVERY value,
  * so the reported quantile — the smallest value whose cumulative weight
  * reaches ceil(p·W) — is exactly the sorted value at rank ceil(p·n):
  * SQL-expressible via one rank window. */
case class KllQuantiles(child: Expression, capacity: Int, probs: Seq[Double],
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllQuantiles.Sketch] {

  require(capacity >= 8, s"capacity must be >= 8, got $capacity")
  require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
    s"probs must be in (0, 1], got $probs")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles expects double, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KllQuantiles.Sketch =
    new KllQuantiles.Sketch(capacity)

  override def update(buf: KllQuantiles.Sketch, input: InternalRow): KllQuantiles.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllQuantiles.Sketch,
                     other: KllQuantiles.Sketch): KllQuantiles.Sketch = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KllQuantiles.Sketch): Any =
    new GenericArrayData(buf.quantiles(probs))

  override def serialize(buf: KllQuantiles.Sketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllQuantiles.Sketch =
    KllQuantiles.Sketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KllQuantiles = copy(child = cs.head)
}

object KllQuantiles {
  /** Level ℓ holds values of weight 2^ℓ; level 0 is the raw stream. */
  final class Sketch(val capacity: Int) {
    private[functions] var levels =
      scala.collection.mutable.ArrayBuffer(
        new scala.collection.mutable.ArrayBuffer[Double](16))
    // per-level compaction parity: alternating keep-even / keep-odd makes
    // the promotion bias cancel across compactions
    private[functions] var parity = scala.collection.mutable.ArrayBuffer(false)

    def add(v: Double): Unit = { levels(0) += v; compactFrom(0) }

    private def compactFrom(start: Int): Unit = {
      // Scan every level, not just until the first under-capacity one:
      // after mergeFrom a higher level can be over capacity while level 0
      // is not, and leaving it uncompacted breaks the O(capacity·log)
      // memory bound (and serializes oversized buffers).
      var l = start
      while (l < levels.length) {
        if (levels(l).length >= capacity) {
          if (l + 1 >= levels.length) {
            levels += new scala.collection.mutable.ArrayBuffer[Double](16)
            parity += false
          }
          val buf = levels(l)
          val sorted = buf.toArray
          java.util.Arrays.sort(sorted)
          val keepOdd = parity(l)
          parity(l) = !keepOdd
          val from = if (keepOdd) 1 else 0
          // An odd-length buffer pairs only its first length-1 elements;
          // the unpaired last element stays at this level whatever the
          // parity. (Promoting it doubles its weight: 2^(l+1) instead of
          // 2^l, inflating total weight by 2^l per compaction.)
          val odd = sorted.length % 2 == 1
          val pairedEnd = if (odd) sorted.length - 1 else sorted.length
          var i = from
          val up = levels(l + 1)
          while (i < pairedEnd) { up += sorted(i); i += 2 }
          buf.clear()
          if (odd) buf += sorted(sorted.length - 1)
        }
        l += 1
      }
    }

    def mergeFrom(other: Sketch): Unit = {
      var l = 0
      while (l < other.levels.length) {
        if (l >= levels.length) {
          levels += new scala.collection.mutable.ArrayBuffer[Double](16)
          parity += false
        }
        levels(l) ++= other.levels(l)
        l += 1
      }
      compactFrom(0)
    }

    /** Smallest value whose cumulative weight reaches ceil(p·W), per p.
      * Exact-rank semantics when nothing has compacted (all weight 1). */
    def quantiles(probs: Seq[Double]): Array[Double] = {
      var total = 0L
      var l = 0
      while (l < levels.length) { total += levels(l).length.toLong << l; l += 1 }
      if (total == 0L) return probs.map(_ => Double.NaN).toArray
      val n = levels.iterator.map(_.length).sum
      val vals = new Array[Double](n)
      val wts = new Array[Long](n)
      var i = 0
      l = 0
      while (l < levels.length) {
        val b = levels(l)
        var j = 0
        while (j < b.length) { vals(i) = b(j); wts(i) = 1L << l; i += 1; j += 1 }
        l += 1
      }
      // sort (value, weight) pairs by value
      val idx = Array.range(0, n).sortBy(vals(_))
      probs.map { p =>
        val target = math.ceil(p * total).toLong
        var cum = 0L
        var k = 0
        var out = vals(idx(n - 1))
        var found = false
        while (k < n && !found) {
          cum += wts(idx(k))
          if (cum >= target) { out = vals(idx(k)); found = true }
          k += 1
        }
        out
      }.toArray
    }

    def toBytes: Array[Byte] = {
      val sz = 8 + levels.iterator.map(b => 5 + 8 * b.length).sum
      val bb = java.nio.ByteBuffer.allocate(sz)
      bb.putInt(capacity)
      bb.putInt(levels.length)
      var l = 0
      while (l < levels.length) {
        bb.put(if (parity(l)) 1.toByte else 0.toByte)
        bb.putInt(levels(l).length)
        levels(l).foreach(bb.putDouble)
        l += 1
      }
      bb.array()
    }
  }

  object Sketch {
    def fromBytes(bytes: Array[Byte]): Sketch = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val s = new Sketch(bb.getInt())
      val nLevels = bb.getInt()
      s.levels.clear(); s.parity.clear()
      var l = 0
      while (l < nLevels) {
        s.parity += (bb.get() == 1.toByte)
        val n = bb.getInt()
        val buf = new scala.collection.mutable.ArrayBuffer[Double](math.max(16, n))
        var i = 0
        while (i < n) { buf += bb.getDouble(); i += 1 }
        s.levels += buf
        l += 1
      }
      s
    }
  }
}

object Sketches {
  /** Column API: the k smallest distinct values of a pre-hashed long
    * column, sorted ascending (the KMV distinct-count sketch state). */
  def kmin_values(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      KMinValues(GraftColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API: Count-Min sketch cells (row-major long[depth·width]) of a
    * pre-hashed (`md5_long60 mod P`) long column. */
  def count_min(c: Column, width: Int, params: Seq[(Long, Long)]): Column =
    GraftColumnBridge.column(
      CountMinSketch(GraftColumnBridge.expression(c), width, params)
        .toAggregateExpression())

  /** Column API: KLL quantile estimates of a double column, one per prob —
    * exact sorted-rank values while the group stays ≤ capacity. */
  def kll_quantiles(c: Column, capacity: Int, probs: Seq[Double]): Column =
    GraftColumnBridge.column(
      KllQuantiles(GraftColumnBridge.expression(c), capacity, probs)
        .toAggregateExpression())
}

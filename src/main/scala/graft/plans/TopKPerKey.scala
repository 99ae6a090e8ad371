package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, Expression, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Grouped top-k as a first-class operator — the full (c)-tier extension
  * path: custom `LogicalPlan` node → `SparkStrategy` → two custom
  * `SparkPlan`s, registered through `SparkSessionExtensions`
  * ([[GraftExtensions]]).
  *
  * The built-in way to take the k first rows per key is a window
  * `row_number` + filter, which plans as ONE exchange followed by a FULL
  * per-partition sort: every row of every key is shuffled, then sorted,
  * and the k-filter only runs afterwards. This operator plans as
  *
  * {{{ TopKFinal(k) <- Exchange(hash by key) <- TopKPartial(k) }}}
  *
  * — per-partition bounded heaps BEFORE the shuffle cut each partition to
  * ≤ k rows per key (the map-side-combine shape aggregation gets for
  * free), the exchange moves only survivors, and the final heaps merge
  * them with O(keys·k) memory and no sort of anything but the k winners.
  * At 100 TB with a bounded key domain, the shuffle shrinks from |rows|
  * to ≤ |partitions|·|keys|·k regardless of skew — a hot key costs k rows
  * per upstream partition, not its full row count.
  *
  * The rank column (1-based, in `order`) is appended so the operator is a
  * drop-in for the `row_number <= k` idiom. `order` must be a total order
  * (add a tiebreak) for deterministic results — same contract as the
  * window formulation.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is DEFINED here, not consumed from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      val maxPartialKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("graft.topk.maxPartialKeys", "4000000").toInt
      TopKFinalExec(keys, order, k, rankAttr,
        TopKPartialExec(keys, order, k, planLater(child), maxPartialKeys)) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap machinery: retain the k first rows per key under
  * `order` from a partition iterator. A max-heap of size ≤ k per key — the
  * heap root is the WORST retained row, so admission is one comparison and
  * eviction is O(log k). */
private[plans] trait TopKHeaps { self: UnaryExecNode =>
  def keys: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  /** Heap entries must be UnsafeRow (hashable map keys, cheap copy), but a
    * child plan may emit other InternalRows (e.g. ExternalRDDScan). The
    * identity projection converts those; rows already Unsafe skip it. */
  protected def unsafeConverter(): InternalRow => UnsafeRow = {
    lazy val toUnsafe = UnsafeProjection.create(child.output, child.output)
    (row: InternalRow) => row match {
      case u: UnsafeRow => u
      case other => toUnsafe(other)
    }
  }

  protected def heapsOf(iter: Iterator[InternalRow])
      : java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]] = {
    val keyProj = UnsafeProjection.create(keys, child.output)
    val asUnsafe = unsafeConverter()
    val ord = RowOrdering.create(order, child.output)
    // PriorityQueue root = max under `ord` = the row to evict first
    val revCmp = new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
    }
    val heaps =
      new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](k, revCmp)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) {
        heap.add(asUnsafe(row).copy())
      } else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(asUnsafe(row).copy())
      }
    }
    heaps
  }

  protected def drainSorted(heap: java.util.PriorityQueue[UnsafeRow])
      : Array[UnsafeRow] = {
    val arr = new Array[UnsafeRow](heap.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // max-heap → fill backwards
    arr
  }
}

/** Pre-shuffle partial: cut each upstream partition to ≤ k rows per key.
  * No distribution requirement — runs wherever the data already is.
  *
  * Memory safety valve: the heaps are on-heap and do not spill, so a
  * near-unique key domain (where "k per key" filters almost nothing)
  * would otherwise buffer the whole partition. Past `maxPartialKeys`
  * distinct keys the operator DEGRADES to pass-through for the rest of
  * the partition — emitting a superset of each key's top-k is always
  * correct here (the final operator filters exactly), it just stops
  * saving shuffle volume, which a near-unique key domain wasn't going to
  * allow anyway. The final operator's heap memory is O(keys-in-partition
  * × k) and is the real sizing contract: this operator targets BOUNDED
  * key domains (per category / user / stratum); for a near-unique key,
  * rank over a window instead. */
case class TopKPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, child: SparkPlan,
                           maxPartialKeys: Int = 4000000)
    extends UnaryExecNode with TopKHeaps {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      import scala.jdk.CollectionConverters._
      val keyProj = UnsafeProjection.create(keys, child.output)
      val asUnsafe = unsafeConverter()
      val ord = RowOrdering.create(order, child.output)
      val revCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      val heaps =
        new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var passThrough = List.empty[Iterator[InternalRow]]
      var degraded = false
      while (iter.hasNext && !degraded) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size >= maxPartialKeys) {
            // near-unique keys: stop absorbing, ship the rest as-is
            degraded = true
            passThrough = List(Iterator.single(
              asUnsafe(row).copy(): InternalRow) ++ iter)
          } else {
            heap = new java.util.PriorityQueue[UnsafeRow](k, revCmp)
            heaps.put(key.copy(), heap)
          }
        }
        if (!degraded) {
          if (heap.size < k) heap.add(asUnsafe(row).copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(asUnsafe(row).copy())
          }
        }
      }
      heaps.values().iterator().asScala
        .flatMap(h => drainSorted(h).iterator.map(r => r: InternalRow)) ++
        passThrough.iterator.flatten
    }
  override protected def withNewChildInternal(c: SparkPlan): TopKPartialExec =
    copy(child = c)
}

/** Post-shuffle final: merge the per-partition survivors of each key,
  * emit the k winners with their 1-based rank. */
case class TopKFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
                         k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode with TopKHeaps {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    (if (keys.isEmpty) AllTuples else ClusteredDistribution(keys)) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      import scala.jdk.CollectionConverters._
      val proj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions
        .SpecificInternalRow(Seq(LongType))
      heapsOf(iter).values().iterator().asScala.flatMap { h =>
        drainSorted(h).iterator.zipWithIndex.map { case (row, i) =>
          rankRow.setLong(0, i + 1L)
          proj(joined(row, rankRow))
        }
      }
    }
  override protected def withNewChildInternal(c: SparkPlan): TopKFinalExec =

    copy(child = c)
}

/** Column-API entry point. */
object TopKPerKey {
  /** Idempotently register the planner strategy on a session that was not
    * built with [[GraftExtensions]] (extraStrategies is the runtime
    * registration hook; extensions-built sessions get it at construction). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        TopKPerKeyStrategy +: spark.experimental.extraStrategies

  /** The k first rows per key under `orderBy` (must be a total order for
    * determinism), with a 1-based rank column appended.
    *
    * Key and order expressions are RESOLVED against the input frame by
    * borrowing the analyzer's own work (a throwaway select / sort): Spark 4
    * Columns are lazy column nodes, and a custom logical node gets no
    * node-specific resolution rule. */
  def apply(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
            k: Int, rankCol: String = "__rank__"): DataFrame = {
    ensureStrategy(df.sparkSession)
    val child = df.queryExecution.analyzed
    val keys =
      if (partitionBy.isEmpty) Nil
      else df.select(partitionBy: _*).queryExecution.analyzed match {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.map {
            case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
            case e => e
          }
        case other => throw new IllegalArgumentException(
          s"cannot resolve partition keys from plan ${other.nodeName}")
      }
    val ord = df.sort(orderBy: _*).queryExecution.analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order
      case other => throw new IllegalArgumentException(
        s"cannot resolve sort order from plan ${other.nodeName}")
    }
    val rank = AttributeReference(rankCol, LongType, nullable = false)()
    GraftColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keys, ord, k, rank, child))
  }
}

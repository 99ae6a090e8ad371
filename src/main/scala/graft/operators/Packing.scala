package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: assign documents to fixed
  * token-budget packs ("concat and chunk" — the standard preprocessing step
  * that turns a document stream into fixed-length training sequences).
  *
  * The core primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM over an ordered
  * column. The naive formulation — `sum() over (order by id)` with no
  * partition key — collapses the whole corpus into ONE window partition
  * (Spark plans a single-task sort), which is the canonical 100 TB
  * plan-killer. This operator runs the textbook two-phase scan instead:
  *
  *   1. range-partition by the order key and sort within partitions (one
  *      shuffle, fully parallel);
  *   2. per-partition token totals — `spark_partition_id` groupBy, a few
  *      hundred rows — collected and prefix-summed on the driver;
  *   3. a second fully-parallel pass adds each partition's running sum to
  *      its broadcast base offset.
  *
  * Wall-clock is two narrow passes + one tiny collect at ANY scale; no
  * stage ever sees more than its own partition.
  */
object Packing {

  /** Whitespace token count — same parity formula as
    * [[TextAnalysis.tokenCount]] (single-space-delimited corpus). */
  private def tokenCount(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long")

  /** (id, n_tokens, start_offset, pack_id) per document, ordered by `idCol`:
    * `start_offset` is the exclusive prefix sum of token counts and
    * `pack_id = start_offset / budget` — the pack in which the document
    * STARTS under contiguous packing (documents may span pack boundaries;
    * the trainer's chunker handles the carry, as usual for concat-and-chunk).
    */
  def packContiguous(docs: DataFrame, budget: Long,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val toks = docs
      .select(col(idCol).cast("long").as("id"),
        tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
    // phase 1: per-partition totals (range partitioner may produce fewer
    // than `parts` partitions on small inputs — index by actual id)
    val totals = toks
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var s = 0L
        it.foreach(s += _._2)
        Iterator.single((pid, s))
      }
      .collect().toMap
    val nParts = toks.rdd.getNumPartitions
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L)).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    // phase 2: running sum + broadcast base offset, still ordered
    toks.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = bc.value(pid)
      it.map { case (id, n) =>
        val start = acc
        acc += n
        (id, n, start)
      }
    }.toDF("id", "n_tokens", "start_offset")
      // integer floor division (both operands non-negative longs) — no
      // double round-trip, bit-exact in any engine
      .withColumn("pack_id", expr(s"start_offset div ${budget}L"))
  }

  /** Per-pack summary: documents per pack and the pack's token load
    * (the tail pack may be short; every other pack's `tokens_started`
    * clusters around `budget` when documents are small vs the budget). */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens_started"))

  /** Length-bucketed batch assignment — the padding-waste lever of every
    * fixed-shape training loop: documents are grouped into token-length
    * buckets of `bucketWidth`, and each bucket is cut into deterministic
    * `batchSize`-document batches in id order. Batching within a length
    * bucket bounds per-batch padding to `bucketWidth − 1` tokens per
    * document, versus up-to-longest-document waste under random batching.
    *
    * Scale shape: token counts are a scan-stage projection; the per-bucket
    * contiguous position comes from the GROUPED distributed prefix
    * ([[Prefix.runningAgg]] with `partitionCols = bucket`) — one hash
    * exchange, distributed WITHIN each bucket, so a dominant length bucket
    * (most corpora cluster hard around the median length) cannot
    * serialize onto one task the way a per-bucket `row_number` window
    * would. Deterministic: position is the global id-order rank within
    * the bucket, independent of partitioning.
    *
    * Returns (id, n_tokens, bucket, batch_in_bucket). */
  def lengthBatches(docs: DataFrame, bucketWidth: Long, batchSize: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(batchSize > 0, "batchSize must be positive")
    // a silent cast("long") would turn a non-numeric id into NULL, whose
    // rows then receive arbitrary non-reproducible positions — reject the
    // column type up front (the shuffleOrder discipline) and fail loudly
    // on a NULL id
    val idType = docs.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idType),
      s"lengthBatches requires an integral id column; '$idCol' is $idType")
    val toks = docs
      .select(coalesce(col(idCol).cast("long"),
          raise_error(lit(s"lengthBatches: NULL id in '$idCol'")).cast("long"))
        .as("id"),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div ${bucketWidth}L"))
      .withColumn("__one", lit(1L))
    Prefix.runningAgg(toks, col("id"), Seq("__one"), Seq("sum"), Seq("__cum"),
        partitionCols = Seq("bucket"))
      .select(col("id"), col("n_tokens"), col("bucket"),
        expr(s"(__cum - 1) div ${batchSize}L").as("batch_in_bucket"))
  }
}

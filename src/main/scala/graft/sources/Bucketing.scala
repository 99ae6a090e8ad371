package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table storage layout: pre-shuffling a table ONCE at write time
  * so every later join or aggregation on the bucket key plans with ZERO
  * exchanges. This is the 100 TB co-location mechanism — a corpus that is
  * joined on the same key by every downstream consumer (docs by doc_id,
  * orders by custkey, signatures by id) should pay its shuffle once, at
  * ingest, not once per query.
  *
  * Mechanics: `bucketBy(n, key)` records the bucket spec in the catalog;
  * Catalyst then reports the scan's output partitioning as
  * `HashPartitioning(key, n)`, which satisfies the ClusteredDistribution
  * required by equi-joins and hash aggregates on that key (or any
  * superset of it), so EnsureRequirements inserts no Exchange. Two tables
  * bucketed the SAME way on their join keys sort-merge-join scan-to-scan.
  *
  * The write repartitions by the bucket key first so each bucket lands in
  * ONE file: Spark's bucket id and repartition both hash with Murmur3, so
  * a writer task holds complete buckets — without this, every writer task
  * emits a file per bucket it sees (k·n small files) and the sorted-bucket
  * metadata can't feed the join's sort requirement.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered
    * in the session catalog as `table` at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String): Unit =
    df.repartition(buckets, col(key))
      .write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two same-bucketed catalog tables. With both sides bucketed
    * `buckets`-way on their join key, the physical plan is
    * scan → sort-merge-join with NO Exchange on either side (asserted in
    * BucketingSpec); a groupBy on the join key on top also re-uses the
    * bucket partitioning. */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
                       rightTable: String, leftKey: String,
                       rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}

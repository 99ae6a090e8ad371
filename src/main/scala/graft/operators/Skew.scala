package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers sort-merge
  * joins with statistics at runtime; these are the explicit forms for when
  * a hot key is KNOWN (the 100 TB playbook: a handful of keys holding a
  * double-digit percentage of rows — null-ish ids, default buckets,
  * bot users).
  *
  *  - [[saltedAggregate]]: two-phase aggregation — partial per (key, salt),
  *    final per key. The first shuffle spreads a hot key over `salt`
  *    reducers; the second moves only `salt` pre-aggregated rows per key.
  *  - [[saltedJoin]]: inner equi-join where the LEFT (large, skewed) side
  *    gets a deterministic salt from its non-key columns and the RIGHT
  *    (small) side is replicated `salt` ways — each hot-key partition
  *    becomes `salt` tractable partitions.
  */
object Skew {

  /** Retry-deterministic salt. monotonically_increasing_id would spread
    * better (row-unique) but depends on within-partition row ORDER: after a
    * fetch failure, a recomputed map task can see shuffle output in a
    * different order, re-salting rows into different (key, salt) reduce
    * partitions than the lost output — silent double-count/loss
    * (SPARK-23207 class). xxhash64 over the row's columns plus
    * spark_partition_id is order-independent: the hash is pure, and a row's
    * partition is fixed by the upstream partitioning (file split or hash),
    * not by fetch order. Constant-valued hot rows still spread because at
    * scale a hot key spans many input partitions; only identical rows
    * WITHIN one partition share a salt, which skews spread but never
    * correctness. */
  private def deterministicSalt(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*) +
      spark_partition_id().cast("long"), lit(salt.toLong))

  /** Two-phase salted sum/count aggregation over `valueCol` grouped by
    * `key`. Equivalent to `df.groupBy(key).agg(sum, count)` for any input;
    * the intermediate (key, salt) grain bounds any single reducer's load. */
  def saltedAggregate(df: DataFrame, key: String, valueCol: String,
                      salt: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt__", deterministicSalt(df, salt))
    salted
      .groupBy(col(key), col("__salt__"))
      .agg(sum(col(valueCol)).as("__psum__"), count(lit(1)).as("__pcnt__"))
      .groupBy(col(key))
      .agg(sum(col("__psum__")).as("sum_value"),
        sum(col("__pcnt__")).cast("long").as("n"))
  }

  /** Inner equi-join with the small side replicated across `salt` copies.
    * Result equals `left.join(right, key)`; every hot left key spreads over
    * `salt` shuffle partitions instead of one. Salt source is
    * retry-deterministic (see [[deterministicSalt]]). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val spark = left.sparkSession
    val saltValues = spark.range(salt).select(col("id").cast("int").as("__salt__"))
    val l = left.withColumn("__salt__", deterministicSalt(left, salt).cast("int"))
    val r = right.crossJoin(broadcast(saltValues))
    l.join(r, Seq(key, "__salt__")).drop("__salt__")
  }
}

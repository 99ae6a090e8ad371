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

  /** Two-phase salted sum/count aggregation over `valueCol` grouped by
    * `key`. Equivalent to `df.groupBy(key).agg(sum, count)` for any input;
    * the intermediate (key, salt) grain bounds any single reducer's load. */
  def saltedAggregate(df: DataFrame, key: String, valueCol: String,
                      salt: Int = 16): DataFrame = {
    // Salt from a ROW-UNIQUE source, not the row's values: the archetypal
    // skew case is a hot key whose rows carry a constant/default value —
    // any value-derived hash maps every hot row to the SAME salt and
    // defeats the operator. monotonically_increasing_id is unique per row
    // (partition id << 33 | row offset), so hot-key rows round-robin over
    // all `salt` buckets regardless of content — and it's cheaper than
    // hashing the row (no per-column hash, no decimal byte extraction).
    val salted = df.withColumn("__salt__",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    salted
      .groupBy(col(key), col("__salt__"))
      .agg(sum(col(valueCol)).as("__psum__"), count(lit(1)).as("__pcnt__"))
      .groupBy(col(key))
      .agg(sum(col("__psum__")).as("sum_value"),
        sum(col("__pcnt__")).cast("long").as("n"))
  }

  /** Inner equi-join with the small side replicated across `salt` copies.
    * Result equals `left.join(right, key)`; every hot left key spreads over
    * `salt` shuffle partitions instead of one. Salt source is row-unique
    * (see [[saltedAggregate]]) so constant-valued hot rows still spread. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val spark = left.sparkSession
    val saltValues = spark.range(salt).select(col("id").cast("int").as("__salt__"))
    val l = left.withColumn("__salt__",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = right.crossJoin(broadcast(saltValues))
    l.join(r, Seq(key, "__salt__")).drop("__salt__")
  }
}

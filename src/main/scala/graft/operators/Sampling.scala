package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** Deterministic sampling for training-data pipelines (the reference is
  * sampling-free — SURVEY §2.8 — but rebalancing over-represented strata is
  * table stakes for corpus curation at 100 TB).
  *
  * All operators hash a row's ID instead of drawing randomness:
  *  - reproducible across runs, engines, partitionings and retries (a task
  *    retry must not change the sample — `rand()` does);
  *  - embarrassingly parallel: the Bernoulli forms are a stateless filter
  *    in the scan stage, no shuffle at all, so they scale linearly and
  *    compose with predicate pushdown;
  *  - the fixed-size per-stratum form needs exactly one shuffle (the same
  *    hash-partition + per-key sort a grouped top-k pays).
  *
  * The hash is the portable 60-bit md5 (compiled, codegen'd), so any SQL
  * engine reproduces the exact sample for cross-checking.
  */
object Sampling {

  private val Buckets = 1073741824L // 2^30

  /** Deterministic uniform in [0, 1): portable md5 of "seed:id" mapped to
    * 2^30 buckets. Collision-free with respect to the sampling decision —
    * each distinct id lands in exactly one bucket in every engine. */
  def hashUniform(idCol: Column, seed: Int = 42): Column =
    (ArrayOps.md5_long60(concat(lit(s"$seed:"), idCol.cast("string")))
      % lit(Buckets)).cast("double") / lit(Buckets.toDouble)

  /** Bernoulli sample: keep each row iff hashUniform(id) < fraction.
    * A pure filter — no shuffle, pushes into the scan stage. */
  def sample(df: DataFrame, idCol: String, fraction: Double,
             seed: Int = 42): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.filter(hashUniform(col(idCol), seed) < lit(fraction))
  }

  /** Stratified Bernoulli sample: per-stratum keep-fractions (strata not
    * listed keep `default`). Same stateless-filter shape as [[sample]]:
    * the fraction table is tiny and compiles to a CASE expression, so the
    * whole operator stays inside the scan's codegen stage — at 100 TB this
    * is the downsampling pass that runs at read bandwidth. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 fractions: Map[String, Double], default: Double = 1.0,
                 seed: Int = 42): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol), seed) < frac)
  }

  /** Fixed-size per-stratum sample: exactly min(n, |stratum|) rows per
    * stratum, chosen by hash order (deterministic "random" order with id
    * tiebreak). Runs on the custom [[graft.plans.TopKPerKey]] operator:
    * per-partition bounded heaps cut every upstream partition to ≤ n rows
    * per stratum BEFORE the shuffle, so the exchange moves samples, not
    * the corpus — the window row_number formulation this replaces shuffled
    * and fully sorted every row. */
  def takePerStratum(df: DataFrame, strataCol: String, idCol: String,
                     n: Int, seed: Int = 42): DataFrame = {
    require(n > 0, "n must be positive")
    graft.plans.TopKPerKey(df, Seq(col(strataCol)),
        Seq(hashUniform(col(idCol), seed), col(idCol)), n)
      .drop("__rank__")
  }

  /** Mixture targeting: downsample so the surviving corpus hits TARGET
    * PROPORTIONS across strata (the static data-mixing pass of an LLM
    * pretraining pipeline — "the mix should be 50% web, 30% code, 20%
    * books" — as opposed to [[stratified]], which applies given
    * keep-fractions). Solves for the per-stratum fractions with maximal
    * retention: cap = min over strata of n_s / w_s, keep_s =
    * cap·w_s / n_s ≤ 1, then applies the same hash filter as
    * [[stratified]]. Strata with zero/unlisted weight are dropped.
    *
    * Shape: one tiny per-stratum count agg (map-side combined), a 1-row
    * min-aggregate broadcast, a broadcast join of the per-stratum
    * fraction table, and the stateless hash filter — the corpus itself is
    * never shuffled, so this runs at read bandwidth at 100 TB. */
  def mixture(df: DataFrame, strataCol: String, idCol: String,
              weights: Map[String, Double], seed: Int = 42): DataFrame = {
    require(weights.values.forall(_ >= 0) && weights.values.sum > 0,
      "weights must be non-negative with a positive sum")
    val wsum = weights.values.sum
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(f / wsum)).otherwise(acc)
    }
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", w).filter(col("__w") > 0)
    val cap = counts.agg(min(col("__n") / col("__w")).as("__cap"))
    val frac = counts.crossJoin(broadcast(cap))
      .select(col(strataCol),
        least(lit(1.0), col("__cap") * col("__w") / col("__n")).as("__frac"))
    df.join(broadcast(frac), Seq(strataCol))
      .filter(hashUniform(col(idCol), seed) < col("__frac"))
      .drop("__frac")
  }

  /** Deterministic train/val/test split: each row's assignment is a pure
    * function of its id (and seed), so the split is stable across runs,
    * retries, engines and corpus growth — adding documents never reshuffles
    * existing assignments (the property date- or position-based splits
    * lack). Stateless projection: no shuffle, scan-stage codegen. */
  def split3(df: DataFrame, idCol: String, trainFrac: Double = 0.8,
             valFrac: Double = 0.1, seed: Int = 42): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"invalid split fractions ($trainFrac, $valFrac)")
    val u = hashUniform(col(idCol), seed)
    df.withColumn("split",
      when(u < lit(trainFrac), lit("train"))
        .when(u < lit(trainFrac + valFrac), lit("val"))
        .otherwise(lit("test")))
  }
}

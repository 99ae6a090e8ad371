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

  /** Deterministic weighted priority sample: the n rows with the smallest
    * `hashUniform(id) / weight` key — rows with larger weights draw
    * proportionally smaller keys, so selection probability rises with
    * weight (the priority-sampling family; this is the division-keyed
    * variant, chosen over the classical u^(1/w) exponent form because
    * IEEE division is EXACTLY rounded and therefore bit-identical in any
    * engine, while pow/log are libm-dependent). Same id + seed + weight →
    * same sample, independent of partitioning, cluster size, or retries.
    *
    * Shape: a stateless scan-stage projection followed by a global top-n
    * (TakeOrdered: per-partition bounded heaps, then an n-row driver
    * merge) — the corpus is never shuffled or sorted, so this runs at
    * read bandwidth at 100 TB for any n that fits on the driver.
    *
    * Returns (idCol, weightCol, key) ordered by (key, id). */
  def weightedPriority(df: DataFrame, idCol: String, weightCol: String,
                       n: Int, seed: Int = 42): DataFrame = {
    require(n > 0, "n must be positive")
    // a NULL weight would yield a NULL key, which sorts FIRST and silently
    // fills the sample with exactly the rows that have no weight; a
    // non-positive weight flips the priority order — fail the job loudly
    // instead (the shuffleOrder discipline)
    val w = col(weightCol).cast("double")
    val guarded = when(w.isNull || w <= 0.0,
        raise_error(lit(s"weightedPriority: NULL or non-positive weight " +
          s"in '$weightCol'")).cast("double"))
      .otherwise(w)
    df.select(col(idCol), col(weightCol),
        (hashUniform(col(idCol), seed) / guarded).as("key"))
      .orderBy(col("key"), col(idCol))
      .limit(n)
  }

  /** Token-budget corpus selection: walk the rows in ascending `orderKey`
    * (= priority) order and keep the prefix whose INCLUSIVE running
    * `tokensCol` total stays within `budget` — "fill a 10B-token budget
    * with the best documents", the final cut of every pretraining data
    * plan. The caller encodes priority into a single numeric key whose
    * values are UNIQUE (e.g. `doc_id - quality·C` for a constant C larger
    * than any id), so the walk order — and therefore the cut — is total
    * and engine-identical.
    *
    * Shape: the running total is the two-phase distributed prefix
    * ([[Prefix.runningAgg]]): one range exchange + per-partition partials
    * + a fully parallel second pass — never a single-partition window —
    * and the budget cut is a stateless filter on the materialized running
    * column. Returns all input columns plus `cum_tokens`. */
  def tokenBudget(df: DataFrame, orderKey: Column, tokensCol: String,
                  budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    Prefix.runningAgg(df.withColumn("__bkey", orderKey), col("__bkey"),
        Seq(tokensCol), Seq("sum"), Seq("cum_tokens"))
      .filter(col("cum_tokens") <= budget)
      // re-select the caller's columns: the prefix machinery's join put
      // its internal slice id first in the column order
      .select(df.columns.map(col) :+ col("cum_tokens"): _*)
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

  /** Temperature-scaled mixture sampling (α = 0.5): per-stratum keep
    * fractions proportional to `sqrt(n_s) / n_s`, scaled so the expected
    * kept total is `budgetFrac` of the corpus — the standard
    * low-resource-upweighting rebalance (small sources keep a larger
    * share than their raw frequency). α is fixed at 0.5 because
    * `sqrt` is correctly-rounded IEEE in every engine, while `pow(n, α)`
    * is libm-dependent at the ULP level and would break cross-engine
    * reproducibility of the derived fractions.
    *
    * Determinism: the stratum weights are `sqrt` rounded to 6 and summed
    * as DECIMAL (order-independent); the final fraction is a fixed
    * left-to-right double expression; the per-row keep test is the same
    * portable-hash filter as [[sample]]. Scale shape: one tiny groupBy,
    * two broadcast joins, then a stateless scan-stage filter. */
  def temperatureMixture(df: DataFrame, strataCol: String, idCol: String,
                         budgetFrac: Double, seed: Int = 42): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac $budgetFrac not in (0,1]")
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val dbl = org.apache.spark.sql.types.DoubleType
    val cnt = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wt", round(sqrt(col("__n").cast(dbl)), 6).cast(dec))
    val tot = cnt.agg(sum(col("__n")).as("__ntot"), sum(col("__wt")).as("__wtot"))
    val frac = cnt.crossJoin(broadcast(tot))
      .select(col(strataCol),
        least(lit(1.0),
          lit(budgetFrac) * col("__ntot").cast(dbl) * col("__wt").cast(dbl) /
            (col("__wtot").cast(dbl) * col("__n").cast(dbl))).as("__frac"))
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

  /** DSIR-shape importance scores (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score each
    * raw-corpus document by how target-like its hashed-unigram
    * distribution is. Per hash bucket b, the log importance ratio of the
    * add-one-smoothed unigram DISTRIBUTIONS is
    * `lr_b = ln( ((tgt_b+1)/(tgt_tot+B)) / ((raw_b+1)/(raw_tot+B)) )`,
    * B = bucket count — without the total normalization a target that is a
    * subset of raw scores every bucket ≤ 0. A document's score is the sum
    * of `lr` over its token instances (the sequence log-likelihood ratio);
    * `score_tok = score / n_tokens` removes the length confound (smoothing
    * gives every token a small negative bias, so longer docs sum lower),
    * and `keep` selects docs whose per-token score beats the corpus mean —
    * compared by exact decimal cross-multiplication
    * (`score_tok · n_docs > Σ score_tok`), so the boundary is
    * order-independent and engine-exact.
    *
    * Scale shape — the raw corpus is scanned and tokenized exactly ONCE:
    * the scan aggregates straight to per-(doc, bucket) counts (map-side
    * combined, keyed by (id, bucket)), which are materialized via
    * `localCheckpoint` and reused for BOTH sides — raw bucket totals are a
    * second tiny aggregate OVER THE COUNTS (≤ `buckets` result rows, never
    * the corpus again), and per-doc scores are a decimal sum of
    * `count · lr` over the same counts with the ≤`buckets`-row weight
    * table broadcast. The target sample (small by definition) aggregates
    * the same way. Nothing wider than (doc_id, bucket, long) is ever
    * shuffled. Determinism: `ln` is rounded to 6 places per BUCKET
    * (bounded rounding sites, the e9_log convention), then summed as
    * DECIMAL — order-independent and engine-exact.
    *
    * @param target the in-domain sample (its ids need not be disjoint from
    *               `raw`); only its token distribution is used
    * @return (doc_id, n_tokens, score, score_tok,
    *         keep = score_tok above corpus mean) per raw document
    */
  def dsirScores(raw: DataFrame, target: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(idCol).as("__id"),
          explode(split(col(textCol), " ")).as("__tok"))
        .select(col("__id"),
          pmod(ArrayOps.md5_long60(concat(lit("0:"), col("__tok"))),
            lit(buckets.toLong)).as("__b"))
    // ONE corpus scan: aggregate straight to per-(doc, bucket) counts and
    // pin them (localCheckpoint + count, the duplicateGroups pattern at
    // [[Dedup.duplicateGroups]]) — bucket totals AND per-doc scores both
    // derive from this materialized frame, so the full-corpus
    // explode+tokenize subtree executes exactly once.
    val rawDoc = bucketed(raw)
      .groupBy(col("__id"), col("__b")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val rawCnt = rawDoc.groupBy(col("__b")).agg(sum(col("__c")).as("__raw"))
    val tgtCnt = bucketed(target).groupBy(col("__b")).agg(count(lit(1)).as("__tgt"))
    // totals are 1-row broadcast aggregates (the scalar-subquery shape)
    val rawTot = rawCnt.agg(sum(col("__raw")).as("__rt"))
    val tgtTot = tgtCnt.agg(sum(col("__tgt")).as("__gt"))
    val weights = rawCnt.join(tgtCnt, Seq("__b"), "full_outer")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("__b"),
        round(log(
          ((coalesce(col("__tgt"), lit(0L)) + 1).cast("double") /
            (col("__gt") + buckets.toLong).cast("double")) /
          ((coalesce(col("__raw"), lit(0L)) + 1).cast("double") /
            (col("__rt") + buckets.toLong).cast("double"))), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__lr"))
    val perDoc = rawDoc.join(broadcast(weights), Seq("__b"))
      .groupBy(col("__id").as(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * col("__lr")).as("__sdec"))
      // score_tok = TRUE round-half-up of the exact rational score/n in
      // INTEGER arithmetic (r14): the sum is decimal-exact at scale 6, so
      // S6 = score·10⁶ is an exact long and ⌊(2·|S6| + n)/(2n)⌋ is the
      // half-up quotient with zero float involvement. The sf0.1 pass
      // caught why round(double÷long, 6) cannot be the contract: doc 2415
      // has score/n = −1.071875/50, EXACTLY on the 6-dp half-quantum,
      // while the double quotient sits 2e-9 quanta off it — Spark's
      // exact-decimal rounding and an engine that multiplies by 10⁶
      // before rounding (DuckDB) disagree on such cells at any data scale.
      .withColumn("score", col("__sdec").cast("double"))
      .withColumn("__s6", (col("__sdec") * lit(1000000L)).cast("long"))
      .withColumn("__st6", expr(
        "CASE WHEN __s6 >= 0 THEN (2*__s6 + n_tokens) DIV (2*n_tokens) " +
          "ELSE -((2*(-__s6) + n_tokens) DIV (2*n_tokens)) END"))
      .withColumn("score_tok", col("__st6") / lit(1000000.0))
    // keep = above-mean score_tok, compared in pure integers
    val stats = perDoc.agg(
      sum(col("__st6")).as("__s"),
      count(lit(1)).as("__n"))
    perDoc.crossJoin(broadcast(stats))
      .withColumn("keep", col("__st6") * col("__n") > col("__s"))
      .drop("__s", "__n", "__sdec", "__s6", "__st6")
  }

  /** Deterministic global shuffle with MATERIALIZED positions: every row
    * gets its contiguous 0-based rank in the portable-hash order
    * (h = md5_long60("seed:id"), id tiebreak) — the training-order
    * permutation a pretraining run writes out once and replays.
    *
    * Scale shape: the naive `row_number() OVER (ORDER BY h)` collapses the
    * corpus into ONE window partition; this runs the same two-phase
    * distributed prefix as [[Packing.packContiguous]] instead — range
    * partition + in-partition sort (one shuffle), per-partition COUNTS
    * (nParts rows) collected and scanned into base offsets, then a second
    * fully-parallel pass. The permutation is partition-boundary-independent
    * (global rank by (h, id)), so it is stable across cluster sizes,
    * retries and engines. */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // a silent cast("long") would turn a non-numeric or NULL id into NULL,
    // which nulls the hash (concat with NULL) and hands the row an
    // arbitrary, non-reproducible position — reject the column type up
    // front and fail the job loudly on a NULL id instead
    val idType = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idType),
      s"shuffleOrder requires an integral id column; '$idCol' is $idType")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = df
      .select(coalesce(col(idCol).cast("long"),
        raise_error(lit(s"shuffleOrder: NULL id in '$idCol'")).cast("long"))
        .as("id"))
      .withColumn("h", ArrayOps.md5_long60(
        concat(lit(s"$seed:"), col("id").cast("string"))))
      .repartitionByRange(parts, col("h"), col("id"))
      .sortWithinPartitions(col("h"), col("id"))
      .as[(Long, Long)]
      // two passes read this frame (counts, then positions) and
      // repartitionByRange adds a bounds-sampling job on top — pin the
      // sorted frame once (the duplicateGroups/DSIR pattern) so the hash +
      // exchange + sort run exactly once
      .localCheckpoint()
    val counts = keyed.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      Iterator.single((pid, it.size.toLong))
    }.collect().toMap
    val nParts = keyed.rdd.getNumPartitions
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L)).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    keyed.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var pos = bc.value(pid)
      it.map { case (id, _) =>
        val p = pos; pos += 1; (id, p)
      }
    }.toDF(idCol, "pos")
  }
}

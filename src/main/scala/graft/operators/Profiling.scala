package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Dataset profiling: per-column statistics in ONE pass over the data.
  *
  * The profile of every requested column — row count, null count, distinct
  * count, min/max, decimal-exact mean — is computed by a single aggregate
  * (multi-column `count(DISTINCT x)`s expand map-side via Catalyst's Expand,
  * everything else is an ordinary partial aggregate), so the input is
  * scanned exactly once no matter how many columns are profiled. The 1-row
  * aggregate is then exploded into one output row per column — a driver-size
  * pivot of an already-tiny result, not a data-size operation.
  *
  * At 100 TB the plan is the same: one scan, map-side partials, a 1-row
  * final aggregate; the Expand multiplies rows by #distinct-columns before
  * the partial agg absorbs them, which is the standard price of exact
  * multi-column distinct counts (swap in HLL sketches when approximate
  * counts are acceptable).
  *
  * Reference scope: the reference library has no profiling surface
  * (`/root/reference/src/ssb_coefficient_maker/coeff_maker.py` exposes only
  * formula evaluation); this is one of the requested training-pipeline
  * additions (data-quality profiling before curation).
  */
object Profiling {

  /** A data-quality constraint for [[constraintSuite]] (r9 session 3).
    * The taxonomy follows the unit-tests-for-data shape of Amazon Deequ
    * (Schelter et al., VLDB 2018): each constraint measures a METRIC in
    * [0,1] and passes when the metric reaches its threshold. */
  sealed trait Check { def name: String; def threshold: Double }
  /** Fraction of rows whose `col` is non-null. */
  final case class Complete(name: String, col: String,
                            threshold: Double = 1.0) extends Check
  /** Fraction of rows satisfying an arbitrary boolean predicate —
    * bounds, set membership, regex shape, cross-column invariants. A
    * NULL predicate counts as a violation (three-valued logic made
    * strict, the conservative reading for data quality). */
  final case class Satisfies(name: String, predicate: Column,
                             threshold: Double = 1.0) extends Check
  /** Distinct (cols)-tuples / rows — 1.0 iff the tuple is a key. */
  final case class Unique(name: String, cols: Seq[String],
                          threshold: Double = 1.0) extends Check
  /** Fraction of rows whose `col` appears in `ref.refCol` — referential
    * integrity measured, not assumed. */
  final case class RefIn(name: String, col: String, ref: DataFrame,
                         refCol: String, threshold: Double = 1.0)
      extends Check

  /** Deequ-style constraint verification: one output row per check —
    * (check, metric, passed) ordered by check name, metric rounded to 6.
    *
    * Scale shape: ALL scalar checks (completeness + predicate fractions)
    * fold into ONE aggregate pass over the frame (tree-reduced indicator
    * means — adding a check adds a column to the projection, never a
    * pass); each Unique adds one exact distinct aggregate (Expand +
    * partial agg, the [[profile]] discipline); each RefIn one
    * equi-join against the DISTINCT reference keys + an indicator mean
    * (shuffle-keyed both sides, no driver collection). The per-check
    * 1-row frames union into a ≤ |checks|-row result — driver-size by
    * construction. */
  def constraintSuite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "constraintSuite needs at least one check")
    val scalars = checks.collect {
      case c: Complete => (c.name, col(c.col).isNotNull, c.threshold)
      case s: Satisfies => (s.name, s.predicate, s.threshold)
    }
    val frames = scala.collection.mutable.ListBuffer.empty[DataFrame]
    if (scalars.nonEmpty) {
      val aggs = scalars.map { case (n, pred, _) =>
        avg(when(pred, 1.0).otherwise(0.0)).as(s"__m_$n")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      frames += one.select(explode(array(scalars.map { case (n, _, th) =>
        struct(lit(n).as("check"),
          round(col(s"__m_$n"), 6).as("metric"),
          (col(s"__m_$n") >= th - 1e-9).as("passed"))
      }: _*)).as("r")).select(col("r.*"))
    }
    checks.foreach {
      case u: Unique =>
        frames += df.agg(
          (count_distinct(struct(u.cols.map(col): _*)).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("m"))
          .select(lit(u.name).as("check"), round(col("m"), 6).as("metric"),
            (col("m") >= u.threshold - 1e-9).as("passed"))
      case r: RefIn =>
        val refKeys = r.ref.select(col(r.refCol).as("__ref_key")).distinct()
        frames += df.select(col(r.col).as("__k"))
          .join(refKeys, col("__k") === col("__ref_key"), "left")
          .agg(avg(when(col("__ref_key").isNotNull, 1.0).otherwise(0.0))
            .as("m"))
          .select(lit(r.name).as("check"), round(col("m"), 6).as("metric"),
            (col("m") >= r.threshold - 1e-9).as("passed"))
      case _ => ()
    }
    frames.reduce(_ unionByName _).orderBy(col("check"))
  }

  /** Profile `cols` (numeric) of `df`: one row per column with
    * (column, n_rows, n_nulls, n_distinct, min_v, max_v, mean_v).
    * Sums go through DECIMAL(18,2) so the mean is exact and
    * order-independent; mean is rounded to 6 places.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast(DoubleType).as(s"__min_$c"),
        max(col(c)).cast(DoubleType).as(s"__max_$c"),
        sum(col(c).cast(DecimalType(18, 2))).as(s"__sum_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        round(col(s"__sum_$c").cast(DoubleType) / col(s"__nn_$c"), 6).as("mean_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Pairwise Pearson correlation (and population covariance) of every
    * column pair in ONE pass: a single aggregate computes all sums,
    * square-sums and cross-sums EXACTLY (inputs are 2-decimal
    * money/quantity columns, so products have exactly 4 decimals — no
    * float accumulation anywhere), then the 1-row result explodes into one
    * row per pair and the corr/cov formulas run in double arithmetic with
    * a FIXED operation order any engine reproduces bit-identically.
    *
    * r11 hot-path replan (the SCALE30X_r11 #1 absolute tail: 27.3 s at
    * 30× for 10 decimal products per row): cells quantize ONCE to
    * integer cents (the same decimal(18,2) HALF_UP the r8 version
    * applied, shifted ×100 — an exact long), and every product is a
    * primitive LONG multiply whose sum accumulates as THREE 20-bit
    * digit sums (p = (p>>40)·2^40 + ((p>>20)&M)·2^20 + (p&M), exact for
    * signed p — arithmetic shift + mask) — pure codegen'd long
    * arithmetic in the agg buffer, no BigDecimal anywhere in the scan.
    * The 1-row recombination rebuilds the exact decimal sum and divides
    * the scale shift back out in decimal (exact, single final rounding
    * to double — bit-identical to the r8 decimal sums). Digit sums stay
    * inside a long up to ~8e12 rows (ANSI sum would raise, not corrupt,
    * past it); |cents| must fit ~2^23 digits-wise (decimal(18,2) inputs
    * ≤ 1e7 by the catalog's money/quantity domain — products ≤ 1.25e14
    * < 2^47, whose top digit fits 2^7).
    *
    * Same scale shape as [[profile]]: one scan, map-side partials, a 1-row
    * final aggregate; the pair count is quadratic in #columns (driver-side
    * expression count), never in data. Columns are assumed non-null
    * (profile first — n_nulls is its first output). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val dec = DecimalType(18, 2)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val cents = df.select(cols.map(c =>
      (col(c).cast(dec) * 100).cast(LongType).as(c)): _*)
    // two's-complement 20-bit digit split (NOT `/`, which is Spark's
    // fractional Divide): e == (e>>40)·2^40 + ((e>>20)&M)·2^20 + (e&M)
    // holds exactly for SIGNED e because shiftright is arithmetic and
    // the masked digits are non-negative < 2^20 — three primitive
    // codegen ops per digit, cheaper than div/mod
    val M = (1L << 20) - 1
    val B0 = 1L << 20; val B1 = 1L << 40
    def digitSums(e: Column, tag: String): Seq[Column] = Seq(
      sum(e.bitwiseAND(lit(M))).as(s"${tag}_d0"),
      sum(shiftright(e, 20).bitwiseAND(lit(M))).as(s"${tag}_d1"),
      sum(shiftright(e, 40)).as(s"${tag}_d2"))
    val aggs: Seq[Column] =
      (count(lit(1)).cast(DoubleType).as("__n") +:
        cols.flatMap(c => digitSums(col(c), s"__s_$c"))) ++
        cols.flatMap(c => digitSums(col(c) * col(c), s"__q_$c")) ++
        pairs.flatMap { case (a, b) =>
          digitSums(col(a) * col(b), s"__p_${a}_$b")
        }
    val one0 = cents.agg(aggs.head, aggs.tail: _*)
    // recombine each digit triple into the exact decimal sum, shift the
    // cents scale back out (decimal division by the literal — exact at
    // these scales), and round to double ONCE (= the r8 sums bit for bit)
    val big = DecimalType(38, 0)
    def comb(tag: String, shift: Long): Column =
      ((col(s"${tag}_d0").cast(big) +
        col(s"${tag}_d1").cast(big) * lit(B0) +
        col(s"${tag}_d2").cast(big) * lit(B1)) / lit(shift))
        .cast(DoubleType)
    val one = one0.select(col("__n") +: (
      cols.map(c => comb(s"__s_$c", 100L).as(s"__s_$c")) ++
        cols.map(c => comb(s"__q_$c", 10000L).as(s"__q_$c")) ++
        pairs.map { case (a, b) =>
          comb(s"__p_${a}_$b", 10000L).as(s"__p_${a}_$b")
        }): _*)
    val rows = pairs.map { case (a, b) =>
      val (n, sa, sb) = (col("__n"), col(s"__s_$a"), col(s"__s_$b"))
      val (qa, qb, p) = (col(s"__q_$a"), col(s"__q_$b"), col(s"__p_${a}_$b"))
      struct(
        lit(a).as("col_x"), lit(b).as("col_y"),
        round((n * p - sa * sb) /
          sqrt((n * qa - sa * sa) * (n * qb - sb * sb)), 6).as("corr_v"),
        round((n * p - sa * sb) / (n * n), 6).as("cov_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Equi-width histogram of a numeric column with a running CDF: one
    * map-side-combined groupBy on `floor(v / width)` (a scan-stage
    * projection), then cumulative counts by a window over the BOUNDED
    * bin table — never the rows. Only non-empty bins are emitted (the
    * sparse convention; the CDF is still exact because cum sums skip no
    * mass). */
  def histogram(df: DataFrame, valCol: String, width: Double): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    val bins = df
      .select(floor(col(valCol) / width).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val cum = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    bins.select(col("bin"), (col("bin") * width).as("lo"), col("n"),
      sum(col("n")).over(cum).as("cum_n"),
      round(sum(col("n")).over(cum).cast("double") /
        sum(col("n")).over(all), 6).as("cdf"))
  }

  /** Population Stability Index between two samples of `valCol` — the
    * standard corpus-version drift monitor (is today's crawl shaped like
    * the one the model was trained on?). `bins` fixed equi-width bins on
    * [lo, hi); out-of-range values clamp to the edge bins so both sides
    * see the identical binning. Laplace (+1 per bin) smoothing keeps
    * empty bins finite. PSI = Σ (pA−pB)·ln(pA/pB); <0.1 stable, >0.25
    * drifted (the conventional thresholds).
    *
    * Scale shape: each side collapses to ≤`bins` counted rows in one
    * map-side-combined aggregate (the corpora are never joined); the bin
    * grid join and the PSI fold run over the BOUNDED bin frame (the
    * prof_hist pattern). Determinism: shares and logs rounded to 6, the
    * PSI sum folded as DECIMAL — order-independent and engine-exact.
    *
    * Returns per-bin rows (bin, n_a, n_b, p_a, p_b, contrib, psi) with
    * the total replicated per row. */
  def psiDrift(dfA: DataFrame, dfB: DataFrame, valCol: String,
               bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo")
    val spark = dfA.sparkSession
    val width = (hi - lo) / bins
    def binned(df: DataFrame, as: String): DataFrame = df
      .select(least(lit(bins - 1), greatest(lit(0),
        floor((col(valCol) - lo) / width).cast("int"))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val grid = spark.range(bins).select(col("id").cast("int").as("bin"))
    val joined = grid
      .join(binned(dfA, "n_a"), Seq("bin"), "left")
      .join(binned(dfB, "n_b"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val all = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // smoothed shares over the bounded bin frame; 6-dp rounding makes the
    // double arithmetic engine-identical, the decimal fold makes the sum
    // order-independent
    val pA = round((col("n_a") + 1).cast("double") /
      (sum(col("n_a")).over(all) + bins).cast("double"), 6)
    val pB = round((col("n_b") + 1).cast("double") /
      (sum(col("n_b")).over(all) + bins).cast("double"), 6)
    val contrib = round((pA - pB) * round(log(pA / pB), 6), 9)
      .cast(org.apache.spark.sql.types.DecimalType(28, 12))
    // the binned two-sample KS statistic rides along for free: max gap
    // between the RAW (unsmoothed, KS convention) cumulative shares
    val cum = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cdfGap = abs(
      round(sum(col("n_a")).over(cum).cast("double") /
        sum(col("n_a")).over(all).cast("double"), 6) -
      round(sum(col("n_b")).over(cum).cast("double") /
        sum(col("n_b")).over(all).cast("double"), 6))
    // two stages: windows may not nest, so the per-bin gap/contribution
    // materialize first and the whole-frame folds run over them
    joined
      .select(col("bin"), col("n_a"), col("n_b"),
        pA.as("p_a"), pB.as("p_b"), contrib.as("__cd"),
        round(cdfGap, 6).as("__gap"))
      .select(col("bin"), col("n_a"), col("n_b"), col("p_a"), col("p_b"),
        col("__cd").cast("double").as("contrib"),
        round(sum(col("__cd")).over(all).cast("double"), 6).as("psi"),
        round(max(col("__gap")).over(all), 6).as("ks"))
  }

  /** Per-source corpus datacard — the one-table summary a curation run
    * publishes alongside the data (the "data card"): document and token
    * volumes, exact-duplicate exposure (corpus-wide fingerprint classes,
    * attributed to each source that holds a copy), short-doc fraction,
    * English share.
    *
    * Shape: one narrow scan projection (token count + md5 fingerprint are
    * codegen'd row-local ops), one fingerprint groupBy whose fanout is
    * bounded by duplicate-class sizes, a join back on the fingerprint,
    * and a final map-side-combined aggregate into |sources| rows — two
    * shuffles total, nothing driver-side. All fractions round to 6 over
    * exact integer counts, so any engine reproduces them bit-for-bit. */
  def corpusCard(docs: DataFrame, shortTokens: Long = 25,
                 sourceCol: String = "source", langCol: String = "lang",
                 textCol: String = "text"): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"),
      col(langCol).as("lang"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      md5(col(textCol)).as("__fp"))
    val dupCounts = base.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
    val isDup = when(col("__n") > 1, 1L).otherwise(0L)
    base.join(dupCounts, Seq("__fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6)
          .as("avg_tokens"),
        sum(isDup).as("n_dup_docs"),
        round(sum(isDup).cast("double") / count(lit(1)), 6).as("dup_frac"),
        sum(when(col("n_tokens") < shortTokens, 1L).otherwise(0L))
          .as("n_short"),
        round(sum(when(col("lang") === "en", 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("en_frac"))
  }

  /** Shannon entropy of two categorical columns plus their mutual
    * information and the normalized MI — the feature-redundancy /
    * label-leakage probe a dataset audit runs ("does this column already
    * encode the label?"). NMI = MI / √(H(A)·H(B)) ∈ [0, 1].
    *
    * Scale shape: three bounded aggregates (distinct values of A, of B,
    * and of the (A, B) pairs — the categorical-cardinality contract, like
    * the PSI bins), each folded with the engine-exact discipline: 6-dp
    * shares, 6-dp logs, 9-dp contributions summed through DECIMAL(28,12)
    * (order-independent), final 6-dp round. One row out. */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    def entropy(c: String, alias: String): DataFrame = {
      val cnt = df.groupBy(col(c)).agg(count(lit(1)).as("n"))
      val tot = sum(col("n")).over(all)
      val p = round(col("n").cast(DoubleType) / tot.cast(DoubleType), 6)
      cnt.select(round(-p * round(log(p), 6), 9)
          .cast(DecimalType(28, 12)).as("c"))
        .agg(round(sum(col("c")).cast(DoubleType), 6).as(alias))
    }
    val joint = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("nab"))
    val tot = sum(col("nab")).over(all)
    val wa = Window.partitionBy(col("a")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wb = Window.partitionBy(col("b")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val pxy = round(col("nab").cast(DoubleType) / tot.cast(DoubleType), 6)
    val px = round(sum(col("nab")).over(wa).cast(DoubleType) /
      tot.cast(DoubleType), 6)
    val py = round(sum(col("nab")).over(wb).cast(DoubleType) /
      tot.cast(DoubleType), 6)
    val mi = joint
      .select(round(pxy * round(log(pxy / (px * py)), 6), 9)
        .cast(DecimalType(28, 12)).as("c"))
      .agg(round(sum(col("c")).cast(DoubleType), 6).as("mi"))
    entropy(colA, "h_a").crossJoin(entropy(colB, "h_b")).crossJoin(mi)
      .withColumn("nmi", when(col("h_a") > 0 && col("h_b") > 0,
        round(col("mi") / round(sqrt(col("h_a") * col("h_b")), 6), 6)))
  }
}

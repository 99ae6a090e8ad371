package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.FormulaEvaluator
import graft.compile._
import graft.model._
import graft.operators._

/** The driver-contract query catalog: one entry per implemented operator
  * from SURVEY.md §2 plus the training-data pipeline operators, each with a
  * DuckDB-oracle SQL mirror where the semantics are SQL-expressible.
  *
  * Determinism rules (so Spark and DuckDB hash-match bit-for-bit):
  *  - float sums that can have >2 addends go through DECIMAL (exact,
  *    order-independent), then cast to double;
  *  - any result touching libm functions (sqrt/pow/ln/exp) is rounded to 6
  *    places on BOTH sides;
  *  - oracle queries never divide by zero (DuckDB 1.0 yields NULL, not Inf)
  *    and never take `%` of negatives (DuckDB is C-style, numpy is python-
  *    style) — those semantics are covered by the ScalaTest goldens instead.
  */
object QueryCatalog {

  // ---- shared matrix derivation over lineitem -----------------------------
  // One wide base (single scan + single shuffle) → four matrix views sharing
  // it, so formulas compile join-free. Columns per linenumber j ∈ 1..4:
  //   qj  quantity sum (NULL hole where the order has no line j)
  //   ej  extendedprice/1000 via DECIMAL(18,2) sum (exact), cast double
  //   pj  quantity sum filled with 0, +1 → strictly positive
  //   zj  quantity sum filled with 0

  val J: Range = 1 to 4
  private val labels = J.map(j => s"c$j")

  // The 39 driver queries share this derived base; without reuse each one
  // re-pays the lineitem scan + groupBy shuffle (twice, with an eager stats
  // pass). Persisting the ~20 MB result once is exactly what a user running
  // a query batch over one shared input would do — and at 100 TB the same
  // role is played by writing the base out bucketed by __row_id__.
  private val wideCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  def wide(spark: SparkSession, sfDir: String): DataFrame =
    wideCache.getOrElseUpdate((spark, sfDir), {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      // Right-size the CACHED base's partition count from the data volume,
      // not the shuffle width: the aggregation runs at full parallelism,
      // but the ~16-column result is tiny relative to lineitem (sf0.1:
      // 147k rows ≈ 20 MB), and every one of the ~40 formula queries that
      // scan this cache pays per-TASK scheduling overhead — 32 near-empty
      // partitions cost ~0.15 s/job on scheduling alone. One partition per
      // ~250k rows keeps partitions in the 10s-of-MB band (the same sizing
      // maxPartitionBytes enforces for file scans) and GROWS with the
      // data: 1 at sf0.1, 6 at 10×, full width at 100 TB.
      // row estimate from parquet metadata (count-star is footer-only);
      // orders ≈ lineitem / 4 — sizing needs the magnitude, not exactness
      val parts = math.max(1L, li.count() / 4 / 250000L).toInt
      val ln = col("l_linenumber")
      val aggs =
        J.map(j => sum(when(ln === j, col("l_quantity"))).as(s"q$j")) ++
        J.map(j => (sum(when(ln === j, col("l_extendedprice").cast(DecimalType(18, 2))))
          .cast(DoubleType) / 1000.0).as(s"e$j")) ++
        J.map(j => (coalesce(sum(when(ln === j, col("l_quantity"))), lit(0.0)) + 1.0)
          .as(s"p$j")) ++
        J.map(j => coalesce(sum(when(ln === j, col("l_quantity"))), lit(0.0)).as(s"z$j"))
      li.groupBy(col("l_orderkey").as("__row_id__")).agg(aggs.head, aggs.tail: _*)
        .repartition(parts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  def registry(spark: SparkSession, sfDir: String): Map[String, NamedData] = {
    val w = wide(spark, sfDir)
    Map(
      "qty"   -> Matrix(w, "__row_id__", labels.zip(J.map(j => s"q$j"))),
      // single-column view of q1 — the Series-shaped operand the r9
      // nlargest/nsmallest/value_counts methods need (pandas' DataFrame
      // forms require a columns= argument the formula language can't say)
      "qone"  -> Matrix(w, "__row_id__", Seq("c1").zip(Seq("q1"))),
      "price" -> Matrix(w, "__row_id__", labels.zip(J.map(j => s"e$j"))),
      "pos"   -> Matrix(w, "__row_id__", labels.zip(J.map(j => s"p$j"))),
      "zro"   -> Matrix(w, "__row_id__", labels.zip(J.map(j => s"z$j"))),
      "w"     -> Vec(IndexedSeq(10.0, 20.0, 30.0, 40.0), labels.toIndexedSeq),
      "va"    -> Vec(IndexedSeq(1.0, 2.0, 3.0, 4.0), labels.toIndexedSeq),
      // matmul right operand (E12): rows keyed by qty's COLUMN labels —
      // the coefficient matrix of a column-space linear transform
      "mm"    -> Matrix.of(spark.createDataFrame(
        java.util.List.of(
          Row("c1", 1.0, 1.0), Row("c2", 2.0, 4.0),
          Row("c3", 3.0, 9.0), Row("c4", 4.0, 16.0)),
        StructType(Seq(StructField("__row_id__", StringType),
          StructField("d1", DoubleType), StructField("d2", DoubleType)))),
        "__row_id__", Seq("d1", "d2")))
  }

  /** The matching DuckDB WITH-clause. */
  val W: String = {
    def qsum(j: Int) = s"sum(CASE WHEN l_linenumber=$j THEN l_quantity END)"
    val cols = (
      J.map(j => s"${qsum(j)} AS q$j") ++
      J.map(j => s"(CAST(sum(CASE WHEN l_linenumber=$j THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE))/1000.0 AS e$j") ++
      J.map(j => s"coalesce(${qsum(j)},0)+1.0 AS p$j") ++
      J.map(j => s"coalesce(${qsum(j)},0) AS z$j")).mkString(", ")
    s"WITH w AS (SELECT l_orderkey AS __row_id__, $cols FROM lineitem GROUP BY 1)"
  }

  /** SQL fill: NULL/NaN/Inf → 0 (the engine's V4 projection). */
  def F(e: String): String =
    s"CASE WHEN ($e) IS NULL OR isnan($e) OR isinf($e) THEN 0.0 ELSE ($e) END"

  /** Oracle for a 4-column matrix query over the wide base. */
  def matSql(cell: Int => String): String =
    s"$W SELECT __row_id__, ${J.map(j => s"${cell(j)} AS c$j").mkString(", ")} " +
      "FROM w ORDER BY __row_id__"

  /** ewm oracle scaffolding (r10): the engine's ewm family is EXACT
    * (unbounded history + pandas carry), so the mirror computes the
    * finite-horizon weighted stat only at VALID target cells — where the
    * dropped tail is < 1e-12 of the kept mass — and carries it across
    * holes with last_value(IGNORE NULLS). `beta` is the 1−α base as a
    * SQL expression evaluating to the identical IEEE double; `h` the
    * horizon in positions, which must exceed the data's longest
    * per-column hole run by the tail margin. */
  private def ewmOracle(h: Int, cellOf: Int => String,
                        fin: (String, Int) => String, dp: Int = 6): String = {
    val cells = J.map(j => s"${cellOf(j)} AS m$j").mkString(", ")
    val outs = J.map { j =>
      val carried = s"last_value(m$j IGNORE NULLS) OVER (ORDER BY e.rn)"
      F(s"round(${fin(carried, j)}, $dp)") + s" AS c$j"
    }.mkString(", ")
    s"""$W, p AS (SELECT *,
       |  row_number() OVER (ORDER BY __row_id__) AS rn FROM w),
       |e AS (SELECT a.rn, $cells
       |  FROM p a JOIN p b ON b.rn BETWEEN a.rn - ${h - 1} AND a.rn
       |  GROUP BY a.rn, ${J.map(j => s"a.q$j").mkString(", ")})
       |SELECT p.__row_id__, $outs
       |FROM e JOIN p ON e.rn = p.rn ORDER BY p.__row_id__""".stripMargin
  }

  private def ewmWsum(beta: String, j: Int, expr: String) =
    s"sum(CASE WHEN b.q$j IS NOT NULL THEN pow(($beta), a.rn - b.rn)" +
      s"$expr END)"

  /** `dp`: deep-history decays (large com) accumulate ~1e-12 relative
    * multiply-chain-vs-pow noise between the exact engine and the
    * truncated mirror — at 6 dp a 60k-cell frame has even odds of one
    * cell straddling a rounding quantum, so large-com queries round to
    * 5 on both sides. */
  def ewmMeanOracle(beta: String, h: Int, dp: Int = 6,
                    minp: Int = 0): String =
    ewmOracle(h, j =>
      s"CASE WHEN a.q$j IS NOT NULL THEN " +
        s"${ewmWsum(beta, j, s" * b.q$j")} / ${ewmWsum(beta, j, "")} END",
      (carried, j) =>
        if (minp <= 0) carried
        // the pandas min_periods gate: valid observations so far >= m
        else s"CASE WHEN count(p.q$j) OVER (ORDER BY p.rn ROWS BETWEEN " +
          s"UNBOUNDED PRECEDING AND CURRENT ROW) >= $minp " +
          s"THEN $carried END",
      dp)

  /** pandas bias=False weighted variance over the horizon window: biased
    * moment form (safe here — cell magnitudes are O(100), and every
    * surviving pairwise weight product exceeds the fp noise because the
    * horizon covers the longest hole run with margin), corrected by
    * W1²/(W1²−ΣW²); ≥ 2 valid cells or NULL → carried. */
  def ewmVarOracle(beta: String, h: Int, std: Boolean): String =
    ewmOracle(h, { j =>
      val w1 = ewmWsum(beta, j, "")
      val s1 = ewmWsum(beta, j, s" * b.q$j")
      val s2 = ewmWsum(beta, j, s" * b.q$j * b.q$j")
      val w2 = ewmWsum(beta, j, s" * pow(($beta), a.rn - b.rn)")
      s"CASE WHEN a.q$j IS NOT NULL AND count(b.q$j) >= 2 " +
        s"AND ($w1)*($w1) - ($w2) > 0 THEN " +
        s"greatest(($s2)/($w1) - (($s1)/($w1))*(($s1)/($w1)), 0) " +
        s"* ($w1)*($w1) / (($w1)*($w1) - ($w2)) END"
    }, (carried, _) => if (std) s"sqrt($carried)" else carried)

  /** Pairwise ewm cov/corr mirror (r11 session 5): weighted moments over
    * the q/e PAIR-valid cells within the truncated horizon, bias=False
    * correction W1²/(W1²−ΣW²) (cancelling in corr), emitted at pair-valid
    * anchors with ≥ 2 pairs and carried across holes with
    * last_value(IGNORE NULLS) — the ewmVarOracle shape with the
    * pair-masked weight kernel. */
  def ewmCovOracle(beta: String, h: Int, corr: Boolean,
                   dp: Int = 6): String = {
    val cells = J.map { j =>
      def ws(expr: String) =
        s"sum(CASE WHEN b.q$j IS NOT NULL AND b.e$j IS NOT NULL THEN " +
          s"pow(($beta), a.rn - b.rn)$expr END)"
      val w1 = ws("")
      val w2 = ws(s" * pow(($beta), a.rn - b.rn)")
      val sx = ws(s" * b.q$j"); val sy = ws(s" * b.e$j")
      val sxy = ws(s" * b.q$j * b.e$j")
      val cnt = s"count(CASE WHEN b.q$j IS NOT NULL AND " +
        s"b.e$j IS NOT NULL THEN 1 END)"
      val covB = s"(($sxy)/($w1) - (($sx)/($w1))*(($sy)/($w1)))"
      val core =
        if (!corr) s"$covB * ($w1)*($w1) / (($w1)*($w1) - ($w2))"
        else {
          val sx2 = ws(s" * b.q$j * b.q$j")
          val sy2 = ws(s" * b.e$j * b.e$j")
          val vx = s"(($sx2)/($w1) - (($sx)/($w1))*(($sx)/($w1)))"
          val vy = s"(($sy2)/($w1) - (($sy)/($w1))*(($sy)/($w1)))"
          s"$covB / sqrt(($vx) * ($vy))"
        }
      s"CASE WHEN a.q$j IS NOT NULL AND a.e$j IS NOT NULL " +
        s"AND $cnt >= 2 AND ($w1)*($w1) - ($w2) > 0 " +
        s"THEN $core END AS m$j"
    }.mkString(", ")
    val outs = J.map { j =>
      val carried = s"last_value(m$j IGNORE NULLS) OVER (ORDER BY e.rn)"
      F(s"round($carried, $dp)") + s" AS c$j"
    }.mkString(", ")
    val anchors = J.flatMap(j => Seq(s"a.q$j", s"a.e$j")).mkString(", ")
    s"""$W, p AS (SELECT *,
       |  row_number() OVER (ORDER BY __row_id__) AS rn FROM w),
       |e AS (SELECT a.rn, $cells
       |  FROM p a JOIN p b ON b.rn BETWEEN a.rn - ${h - 1} AND a.rn
       |  GROUP BY a.rn, $anchors)
       |SELECT p.__row_id__, $outs
       |FROM e JOIN p ON e.rn = p.rn ORDER BY p.__row_id__""".stripMargin
  }

  /** adjust=False mirror (r11): the recursion y = (1−α)y + αx unrolls to
    * weights coef_b·∏_{b<c≤a} κ_c over VALID cells, κ_c = f^gap/(f^gap+α)
    * (the per-valid-step contraction, ≤ f) and coef_b = 1−κ_b (the global
    * first obs keeps coef 1). The product telescopes through a running
    * log-sum S, so the horizon join needs only exp(S_a − S_b) — truncated
    * at `vh` VALID steps (tail ≤ f^vh), normalized by the kept mass d1.
    * bias=False var corrects by d1²/(d1² − d2), exactly pandas'
    * sum_wt²/(sum_wt² − sum_wt2); singleton anchors read NULL (d1² = d2)
    * and the hole carry is the same last_value(IGNORE NULLS) as the
    * adjust=True mirrors. Deep chains round at 5 dp (the ewmbig
    * precedent). */
  def ewmAdjOracle(alpha: Double, vh: Int, stat: String,
                   dp: Int = 5): String = {
    val f = s"(1.0 - $alpha)"
    val mexpr =
      if (stat == "mean") "n1/d1"
      else "CASE WHEN d1*d1 - d2 > 1e-12 THEN " +
        "greatest(n2/d1 - (n1/d1)*(n1/d1), 0) * d1*d1 / (d1*d1 - d2) END"
    val cells = J.map { j =>
      s"""v$j AS (SELECT rn, q$j AS x,
         |    row_number() OVER (ORDER BY rn) AS vi,
         |    rn - lag(rn) OVER (ORDER BY rn) AS gap
         |  FROM p WHERE q$j IS NOT NULL),
         |s$j AS (SELECT rn, x, vi,
         |    CASE WHEN vi = 1 THEN 1.0
         |         ELSE 1.0 - pow($f, gap)/(pow($f, gap) + $alpha) END
         |      AS coef,
         |    sum(CASE WHEN vi = 1 THEN 0.0
         |        ELSE ln(pow($f, gap)/(pow($f, gap) + $alpha)) END)
         |      OVER (ORDER BY vi) AS S FROM v$j),
         |e$j AS (SELECT a.rn, $mexpr AS m$j FROM (
         |  SELECT a0.rn,
         |    sum(b.coef * exp(a0.S - b.S) * b.x) AS n1,
         |    sum(b.coef * exp(a0.S - b.S)) AS d1,
         |    sum(b.coef * exp(a0.S - b.S) * b.x * b.x) AS n2,
         |    sum(b.coef * b.coef * exp(2.0*(a0.S - b.S))) AS d2
         |  FROM s$j a0 JOIN s$j b ON b.vi BETWEEN a0.vi - ${vh - 1} AND a0.vi
         |  GROUP BY a0.rn) a)""".stripMargin
    }.mkString(",\n")
    val outs = J.map { j =>
      val carried = s"last_value(t$j.m$j IGNORE NULLS) OVER (ORDER BY p.rn)"
      val fin = if (stat == "std") s"sqrt($carried)" else carried
      F(s"round($fin, $dp)") + s" AS c$j"
    }.mkString(", ")
    val joins = J.map(j => s"LEFT JOIN e$j t$j ON t$j.rn = p.rn")
      .mkString(" ")
    s"""$W, p AS (SELECT *,
       |  row_number() OVER (ORDER BY __row_id__) AS rn FROM w),
       |$cells
       |SELECT p.__row_id__, $outs
       |FROM p $joins
       |ORDER BY p.__row_id__""".stripMargin
  }

  // ---- query runner helpers ----------------------------------------------

  /** Evaluate a formula over the shared registry; matrix results are ordered
    * by row id; optionally rounded (float-function queries) and cast to
    * double (decimal mode).
    *
    * `nudge` shifts the value by a tiny ε BEFORE rounding — applied
    * IDENTICALLY in the paired oracle SQL. Rationale (r12, the e11_ecov
    * red row): integer quantities × cent prices make covariances whose
    * exact rational value TERMINATES at `x.xxxxxx5` — ON the 6-dp
    * rounding boundary, closer to it than one double ULP (measured
    * 5e-15 abs at a 274.0048235 cell), so no engine can deterministically
    * round them and any cross-engine hash flips a coin. ε = 1e-9 moves
    * the boundary 10⁻³ quanta — ~10⁴× the few-ULP cross-engine delta of
    * the exact Welford scan, 10⁻³× the quantum — making the comparison
    * deterministic without weakening the precision it certifies. */
  /** Quantum-margin audit (r13, the r12 verdict's #8 stretch): when the
    * `graft.audit.margins` system property is set, every `roundTo`
    * [[formulaQuery]] ALSO measures how close its pre-rounded (nudged)
    * cells come to a half-quantum rounding boundary — the e11_ecov
    * failure class, where a terminating `x.xxxxxx5` value sits within one
    * double ULP of the boundary and cross-engine hashes flip coins. The
    * dump ([[graft.Verify]]) resets before each query, reads after, and
    * emits `quantum_margins.json`, so a future DATA change parking a new
    * query on a boundary surfaces in the dump instead of as a red driver
    * round. Margin unit: quanta (1.0 = one rounding step; 0.5 = exactly
    * between boundaries, the safest possible). Off by default — zero cost
    * outside audit runs. */
  @volatile private[graft] var lastQuantumMargin: Option[Double] = None
  private[graft] def resetQuantumMargin(): Unit = lastQuantumMargin = None
  private def auditMargins: Boolean =
    java.lang.Boolean.getBoolean("graft.audit.margins")

  private def recordQuantumMargin(df: DataFrame, cols: Seq[Column],
                                  dp: Int, nudge: Double): Unit = {
    val scale = math.pow(10.0, dp)
    val mins = cols.map { c =>
      val y = (if (nudge == 0.0) c else c + lit(nudge)) * lit(scale)
      val fr = y - floor(y)
      // NaN → null (min skips); |y| ≥ 1e15 is past double integer
      // precision where every value is exactly integral — not a boundary
      min(when(!isnan(fr) && abs(y) < lit(1e15), abs(fr - lit(0.5))))
    }
    val r = df.agg(mins.head, mins.tail: _*).head()
    val vals = (0 until r.length)
      .filterNot(r.isNullAt).map(r.getDouble)
    if (vals.nonEmpty) {
      val m = vals.min
      lastQuantumMargin = Some(lastQuantumMargin.fold(m)(math.min(m, _)))
    }
  }

  def formulaQuery(formula: String, fill: Boolean = true,
                   roundTo: Option[Int] = None, adp: Boolean = false,
                   nudge: Double = 0.0)
                  (spark: SparkSession, sfDir: String): DataFrame = {
    val ev = new FormulaEvaluator(registry(spark, sfDir),
      adpEnabled = adp, fillInvalid = fill)
    ev.evaluateFormula(formula) match {
      case MatrixResult(df, rowId, lbls, _) =>
        val raw = lbls.map(l =>
          if (adp) col(l).cast(DoubleType) else col(l))
        if (auditMargins && roundTo.isDefined)
          recordQuantumMargin(df, raw, roundTo.get, nudge)
        val out = lbls.zip(raw).map { case (l, c0) =>
          roundTo.fold(c0)(n =>
            round(if (nudge == 0.0) c0 else c0 + lit(nudge), n)).as(l)
        }
        df.select((col(rowId) +: out): _*).orderBy(col(rowId))
      case RowResult(df, lbls) =>
        if (auditMargins && roundTo.isDefined)
          recordQuantumMargin(df, lbls.map(col), roundTo.get, nudge = 0.0)
        roundTo.fold(df)(n => df.select(lbls.map(l => round(col(l), n).as(l)): _*))
      case VecResult(v) =>
        spark.createDataFrame(java.util.List.of(Row.fromSeq(v.values)),
          StructType(v.labels.map(l => StructField(l, DoubleType))))
      case ScalarResult(x) =>
        spark.createDataFrame(java.util.List.of(Row(x)),
          StructType(Seq(StructField("value", DoubleType))))
    }
  }

  /** Validation-stats query (V2/V3 as data): single-pass aggregate. */
  def statsQuery(formula: String)(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = new FormulaEvaluator(registry(spark, sfDir), fillInvalid = true)
    val MatrixResult(df, _, lbls, _) = ev.evaluateRaw(formula): @unchecked
    val st = ev.validator.stats(df, lbls)
    spark.createDataFrame(
      java.util.List.of(Row(st.invalidCount, st.totalCells, st.hasNan, st.hasInf)),
      StructType(Seq(
        StructField("invalid_count", LongType), StructField("total_cells", LongType),
        StructField("has_nan", BooleanType), StructField("has_inf", BooleanType))))
  }

  // documents/embeddings are shared by the dedup/similarity/text queries:
  // cache the (small) tables once per session, spread across all cores —
  // the driver parquet is single-row-group, so an uncached scan is ONE task.
  private val tblCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  private def cachedTable(spark: SparkSession, path: String): DataFrame =
    tblCache.getOrElseUpdate((spark, path),
      spark.read.parquet(path)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def docs(spark: SparkSession, sfDir: String): DataFrame =
    cachedTable(spark, s"$sfDir/documents.parquet")
  def embs(spark: SparkSession, sfDir: String): DataFrame =
    cachedTable(spark, s"$sfDir/embeddings.parquet")

  /** events.parquet with an appended epoch-µs BIGINT column `tu`, tolerant
    * of every physical timestamp encoding the driver has shipped:
    * TIMESTAMP(NANOS) (readable only as LongType under the legacy
    * nanosAsLong flag — truncated ns→µs), TIMESTAMP(MICROS) (Spark 4 reads
    * it as TIMESTAMP_NTZ), or a tz-aware TIMESTAMP.
    *
    * Fast path for the µs encoding: parquet stores it as plain INT64, so a
    * user-schema read with `ts: LongType` yields raw epoch-µs with ZERO
    * per-row conversion — `tu` rides the scan for free. Because Spark's
    * schema can't distinguish MICROS from MILLIS (both read TIMESTAMP_NTZ),
    * a one-row min() cross-check against the session-timezone-free NTZ
    * epoch-diff guards the unit before trusting the raw read; on mismatch
    * (a millis file) the compiled timestampdiff projection is used instead.
    * The decision (and the frame) is cached per (session, data dir). */
  private val evCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  def eventsWithTu(spark: SparkSession, sfDir: String): DataFrame =
    evCache.getOrElseUpdate((spark, sfDir), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$sfDir/events.parquet"
      val raw = spark.read.parquet(path)
      val withTu = raw.schema("ts").dataType match {
        case LongType => raw.withColumn("tu", expr("ts div 1000"))
        case TimestampNTZType =>
          val ntzUs =
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          val longSchema = StructType(raw.schema.map(f =>
            if (f.name == "ts") StructField("ts", LongType, f.nullable) else f))
          val asLong = spark.read.schema(longSchema).parquet(path)
          val rawMin = asLong.agg(min(col("ts"))).head()
          val ntzMin = raw.agg(min(ntzUs)).head()
          if (!rawMin.isNullAt(0) && !ntzMin.isNullAt(0) &&
              rawMin.getLong(0) == ntzMin.getLong(0))
            asLong.withColumn("tu", col("ts"))
          else raw.withColumn("tu", ntzUs)
        case _ => raw.withColumn("tu", unix_micros(col("ts")))
      }
      // r14 (guide §1/§6): the driver parquet is single-row-group, so an
      // uncached events scan is ONE task and every downstream per-row
      // stage — ev_jarr's JSON parse above all (1.1 s single-task at
      // sf0.1, 7.2 s at 100×, LINEAR because the serial scan gates it) —
      // runs serial at every scale. The [[cachedTable]] discipline docs/
      // embs already use (repartition across cores + persist once per
      // session) parallelizes all nine ev_* consumers and the cdc_*
      // pair, exactly the shared-ingest pattern of a real query batch.
      withTu.repartition(spark.sparkContext.defaultParallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Portable 32-slot minhash signatures, shared by the three dedup queries
    * (signature computation is the dominant cost of the LSH pipeline; the
    * banding join re-runs per query and is cheap). */
  private val sigCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  def sig32(spark: SparkSession, sfDir: String): DataFrame =
    sigCache.getOrElseUpdate((spark, sfDir),
      Dedup.minhashSignatures(docs(spark, sfDir), "text", "doc_id",
          n = 3, k = 32, portable = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** LSH candidate pairs, shared by dd_minhash / dd_groups / dd_jaccard.
    * ONE banding-join pipeline runs at the loosest threshold any consumer
    * needs (0.1); tighter thresholds are filters over the cached pairs —
    * the LSH threshold only gates the final est-Jaccard predicate, so a
    * shared superset is exact for every derived threshold (the same
    * batch-user pattern as [[sig32]]: compute candidates once, consume
    * them from several queries). */
  private val pairsCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  def pairs01(spark: SparkSession, sfDir: String): DataFrame =
    pairsCache.getOrElseUpdate((spark, sfDir),
      Dedup.minhashLsh(docs(spark, sfDir), threshold = 0.1, portable = true,
          precomputedSig = Some(sig32(spark, sfDir)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  def pairs02(spark: SparkSession, sfDir: String): DataFrame =
    pairs01(spark, sfDir).filter(col("est_jaccard") >= 0.2)

  /** Blocked all-pairs cosine at threshold 0.25 over the embeddings,
    * shared by sim_block / sim_knn / gr_pagerank directly and by dd_embed
    * as a filtered superset (its 0.3 threshold gates only the final
    * rounded score, so `sim >= 0.3` over the 0.25 pair set is exact) —
    * the same compute-candidates-once pattern as [[pairs01]]. */
  private val bpCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  def blockPairs025(spark: SparkSession, sfDir: String): DataFrame =
    bpCache.getOrElseUpdate((spark, sfDir),
      Similarity.blockedAllPairs(embs(spark, sfDir), "label", 0.25)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The 1-bit binary-quantization frames shared by sim_binq / sim_rerank
    * / sim_brecall (r9): (probes, pairs) — probe codes+embeddings
    * broadcast against the corpus codes+embeddings, with the per-pair
    * Hamming distance. The pair frame is a scan-stage projection of the
    * corpus (the broadcast is ~25 rows); every consumer ranks it on the
    * bounded-heap TopKPerKey operator. */
  def binqPairs(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    import graft.functions.ArrayOps
    val coded = embs(spark, sfDir).select(col("vec_id"), col("embedding"),
      ArrayOps.sign_pack32(col("embedding"), 0).as("lo"),
      ArrayOps.sign_pack32(col("embedding"), 1).as("hi"))
    val probes = coded.where(col("vec_id") % 199 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qemb"),
        col("lo").as("qlo"), col("hi").as("qhi"))
    val pairs = coded.where(col("vec_id") % 199 =!= 0)
      .crossJoin(broadcast(probes))
      .withColumn("ham",
        (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
          bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("int"))
    (probes, pairs)
  }

  /** Exact decimal-scored cosine of (embedding, qemb), rounded 6dp — the
    * scoring chain shared by sim_rerank's rerank stage and sim_brecall's
    * exact reference list. */
  def binqCosine: Column = {
    import graft.functions.ArrayOps
    round(
      ArrayOps.dot_product_exact(col("embedding"), col("qemb")) /
        (sqrt(ArrayOps.dot_product_exact(col("qemb"), col("qemb"))) *
          sqrt(ArrayOps.dot_product_exact(col("embedding"),
            col("embedding")))), 6)
  }

  /** Product-quantization codes + codebooks (m = 4 subspaces over the
    * 64-dim embeddings, k = 16 cells, 2 Lloyd iterations — the
    * [[graft.operators.Similarity.kmeans]] determinism discipline per
    * subspace), shared by sim_pq / sim_adc: training is the dominant
    * cost, both queries consume the SAME model (the kmeansAsg pattern).
    * The code frame is persisted — it is the PQ value proposition
    * (m small ints per vector instead of d floats). */
  private val pqCache = scala.collection.concurrent.TrieMap[
    (SparkSession, String),
    (DataFrame, IndexedSeq[Map[Int, Seq[Double]]])]()
  def pqModel(spark: SparkSession, sfDir: String)
      : (DataFrame, IndexedSeq[Map[Int, Seq[Double]]]) =
    pqCache.getOrElseUpdate((spark, sfDir), {
      val (codes, books) =
        Similarity.productQuantize(embs(spark, sfDir), m = 4, k = 16, iters = 2)
      (codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        books)
    })

  /** kNN graph (k=3, threshold 0.25) over the shared 0.25 pair set —
    * shared by sim_knn / gr_pagerank / gr_tri, which all rank the same
    * neighbors; the per-query work on top is a sort, the PageRank
    * iterations, or the triangle joins. */
  private val knnCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  def knnEdges(spark: SparkSession, sfDir: String): DataFrame =
    knnCache.getOrElseUpdate((spark, sfDir),
      Similarity.knnGraph(embs(spark, sfDir), "label", k = 3,
          threshold = 0.25,
          precomputedPairs = Some(blockPairs025(spark, sfDir)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The NN-Descent refined graph (k=5, 6 rounds over the knnEdges seed),
    * shared by sim_nnd / sim_nndrecall — the 6-round iteration dominates
    * both, and a batch user builds the index once (the
    * blockPairs025/knnEdges discipline). nnDescent already ends in a
    * localCheckpoint, so no extra persist is needed. */
  private val nndCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  def nndGraph(spark: SparkSession, sfDir: String): DataFrame =
    nndCache.getOrElseUpdate((spark, sfDir),
      Similarity.nnDescent(embs(spark, sfDir), "label", k = 5, rounds = 6,
          seedThreshold = 0.25,
          precomputedSeed = Some(knnEdges(spark, sfDir)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** k-means(4, 3) assignments over the embeddings, shared by
    * clu_kmeans / dd_semantic / clu_sample (the clustering is the dominant
    * cost — 4 corpus passes — and all three consume the SAME model; the
    * per-query work on top is a sort, a pair join, or a top-k). */
  private val kmeansCache = scala.collection.concurrent.TrieMap[
    (SparkSession, String), (DataFrame, Map[Int, Seq[Double]])]()
  /** Assignments AND final centroids (r9 session 2: sim_ivfpq needs the
    * centroids to route probes to their nProbe nearest cells). */
  def kmeansModel(spark: SparkSession, sfDir: String)
      : (DataFrame, Map[Int, Seq[Double]]) =
    kmeansCache.getOrElseUpdate((spark, sfDir), {
      val (asg, cents) = Similarity.kmeans(embs(spark, sfDir), k = 4, iters = 3)
      (asg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        cents)
    })
  def kmeansAsg(spark: SparkSession, sfDir: String): DataFrame =
    kmeansModel(spark, sfDir)._1

  /** orders + customer written ONCE per session as 8-bucket catalog tables
    * on the customer key (graft.sources.Bucketing): the pay-the-shuffle-at-
    * ingest layout. Returns the (ordersTable, customerTable) names; the
    * j_bucket query joins + aggregates on them with zero exchanges below
    * the final sort. */
  private val bucketedCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), (String, String)]()
  def bucketedOrdersCustomer(spark: SparkSession, sfDir: String): (String, String) =
    bucketedCache.getOrElseUpdate((spark, sfDir), {
      // the tag carries BOTH the data dir and the session identity: the
      // cache is keyed per (session, sfDir), so without the session
      // component a second session in the same JVM would re-run
      // writeBucketed with mode=overwrite on catalog names and tmpdir
      // files the first session may still be reading
      val tag = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(sfDir).toLong & 0xffffffffL) +
        "_" + java.lang.Integer.toHexString(System.identityHashCode(spark))
      val (ot, ct) = (s"g_orders_b_$tag", s"g_customer_b_$tag")
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_$tag"
      graft.sources.Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/orders.parquet"), ot, s"$base/orders",
        buckets = 8, key = "o_custkey")
      graft.sources.Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/customer.parquet"), ct, s"$base/customer",
        buckets = 8, key = "c_custkey")
      (ot, ct)
    })

  // ---- pipeline-operator SQL helpers (mirrors of TextAnalysis) ------------

  def occSql(expr: String, pat: String): String = {
    val esc = pat.replace("'", "''")
    s"CAST((length($expr) - length(replace($expr, '$esc', ''))) / ${pat.length} AS BIGINT)"
  }
  def wordOccSql(word: String): String = occSql(s"' ' || text || ' '", s" $word ")
  val tokSql: String = s"CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{Matrix, NamedData}

/** Round-7 probes (VERDICT r6 asks #1/#4/#6):
  *
  *  - `rankwide`: `.rank()` on 4/50/100-column matrices — compile + plan
  *    wall and physical-plan size. The r6 concern is PLAN growth (one
  *    value-equality join per column), not data scale; this measures
  *    where (if anywhere) analysis time or plan size blows up.
  *  - `lpa_cadence`: labelPropagation at iters=8/16 on the 10× kNN graph
  *    under localCheckpoint cadence 1 (every round, current) vs 4 (the
  *    pageRank-measured optimum) — pin the winner.
  *  - `seqshift`: e11_shift / e11_diff at 1× vs 10× AFTER the r7
  *    narrow-prefix re-plan — the r6 wide self-join measured 2.25×/2.90×;
  *    done-criterion is ≤ ~1.5×.
  *
  * Usage: runMain graft.ProbeR7 [outPath]. Expects /tmp/graft_sf1 (10×)
  * from ScaleGen for the lpa/seqshift sections.
  * Gate sections with SPARK_GRAFT_PROBE_ONLY=rankwide,lpa_cadence,seqshift.
  */
object ProbeR7 {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  /** min of 3 passes — the host suffers transient CPU-steal storms */
  private def best(f: => Unit): Double = (1 to 3).map(_ => time(f)).min

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("PROBE_r7.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf1x = "/root/testdata/sf0.1"
    val sf10 = "/tmp/graft_sf1"

    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def want(section: String): Boolean = only.forall(_.contains(section))

    if (want("rankwide")) {
      // deterministic pseudo-random int cells (≤997 distinct per column:
      // the value-count domain rank's join-back is bounded by)
      def widthProbe(width: Int): Map[String, Any] = {
        val n = 200000L
        val labels = (0 until width).map(i => s"c$i")
        val df = spark.range(n).select(
          (col("id").as("__row_id__") +: labels.zipWithIndex.map { case (c, i) =>
            pmod(hash(col("id") * lit(i + 1)), lit(997)).cast("double").as(c)
          }): _*)
        val ev = new graft.api.FormulaEvaluator(
          Map[String, NamedData]("m" -> Matrix.of(df, "__row_id__", labels)))
        var res: graft.compile.MatrixResult = null
        val tCompile = time {
          res = ev.evaluateRaw("m.rank()")
            .asInstanceOf[graft.compile.MatrixResult]
        }
        var planChars = 0
        val tPlan = time {
          planChars = res.df.queryExecution.executedPlan.toString.length
        }
        val tExec = best {
          res.df.write.format("noop").mode("overwrite").save()
        }
        System.err.println(s"[probe] rankwide w=$width compile=$tCompile " +
          s"plan=$tPlan exec=$tExec planChars=$planChars")
        Map("compile_s" -> tCompile, "plan_s" -> tPlan, "exec_s" -> tExec,
          "plan_chars" -> planChars)
      }
      out += "rank_wide" -> Map(
        "w4" -> widthProbe(4), "w50" -> widthProbe(50), "w100" -> widthProbe(100))
    }

    if (want("cumwide")) {
      // the OTHER sequential E11 methods at 100 columns: cumsum runs ONE
      // runningAgg (no per-column joins) and shift ONE positional join —
      // neither should share rank's pre-fix compile explosion
      def probe(formula: String): Map[String, Any] = {
        val labels = (0 until 100).map(i => s"c$i")
        val df = spark.range(200000L).select(
          (col("id").as("__row_id__") +: labels.zipWithIndex.map { case (c, i) =>
            pmod(hash(col("id") * lit(i + 1)), lit(997)).cast("double").as(c)
          }): _*)
        val ev = new graft.api.FormulaEvaluator(
          Map[String, NamedData]("m" -> Matrix.of(df, "__row_id__", labels)))
        var res: graft.compile.MatrixResult = null
        val tCompile = time {
          res = ev.evaluateRaw(formula).asInstanceOf[graft.compile.MatrixResult]
        }
        val tPlan = time { res.df.queryExecution.executedPlan }
        val tExec = best {
          res.df.write.format("noop").mode("overwrite").save()
        }
        System.err.println(s"[probe] cumwide $formula compile=$tCompile " +
          s"plan=$tPlan exec=$tExec")
        Map("compile_s" -> tCompile, "plan_s" -> tPlan, "exec_s" -> tExec)
      }
      out += "cum_wide100" -> Map(
        "cumsum" -> probe("m.cumsum()"),
        "shift" -> probe("m.shift(2)"),
        "cumprod" -> probe("m.cumprod()"))
    }

    if (want("rankrules")) {
      // attribute the w100 optimizer wall (rank_wide: ~30 s plan_s) to
      // specific Catalyst rules via RuleExecutor's global metrics
      val width = 100
      val labels = (0 until width).map(i => s"c$i")
      val df = spark.range(200000L).select(
        (col("id").as("__row_id__") +: labels.zipWithIndex.map { case (c, i) =>
          pmod(hash(col("id") * lit(i + 1)), lit(997)).cast("double").as(c)
        }): _*)
      val ev = new graft.api.FormulaEvaluator(
        Map[String, NamedData]("m" -> Matrix.of(df, "__row_id__", labels)))
      val res = ev.evaluateRaw("m.rank()")
        .asInstanceOf[graft.compile.MatrixResult]
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val tPlan = time { res.df.queryExecution.executedPlan }
      val report = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      // report lines: "<rule name> <nanos> <runs> ..." — keep the top 8
      val top = report.linesIterator
        .filter(_.trim.matches(".*\\d+.*"))
        .toSeq.drop(2).take(10)
      System.err.println(s"[probe] rankrules plan=$tPlan")
      top.foreach(l => System.err.println(s"[probe]   $l"))
      out += "rank_rules_w100" -> Map("plan_s" -> tPlan)
    }

    if (want("rankscale")) {
      // (a) the USER-FACING global ranking rule at 1× vs 10× rows: a
      // naive rank() over a Graft-extended session must scale like the
      // grouped prefix, not like the single-partition window it replaces.
      // (b) the stacked wide-rank path (>16 cols) at 1× vs 10× rows.
      val ext = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .appName("graft-rankscale").getOrCreate()
      def userRank(n: Long): Double = {
        val df = ext.range(n).select(
          (org.apache.spark.sql.functions.pmod(col("id") * 37, lit(9973)))
            .as("k"), col("id").as("payload"))
        best { df.withColumn("r", org.apache.spark.sql.functions.rank()
            .over(org.apache.spark.sql.expressions.Window.orderBy(col("k"))))
          .write.format("noop").mode("overwrite").save() }
      }
      def wideRank(n: Long): Double = {
        val labels = (0 until 24).map(i => s"c$i")
        val df = ext.range(n).select(
          (col("id").as("__row_id__") +: labels.zipWithIndex.map { case (c, i) =>
            pmod(hash(col("id") * lit(i + 1)), lit(997)).cast("double").as(c)
          }): _*)
        val ev = new graft.api.FormulaEvaluator(
          Map[String, NamedData]("m" -> Matrix.of(df, "__row_id__", labels)))
        val res = ev.evaluateRaw("m.rank()")
          .asInstanceOf[graft.compile.MatrixResult]
        best { res.df.write.format("noop").mode("overwrite").save() }
      }
      // the single-partition window the rule replaces, on a PLAIN session
      def naiveRank(n: Long): Double = {
        val df = spark.range(n).select(
          (org.apache.spark.sql.functions.pmod(col("id") * 37, lit(9973)))
            .as("k"), col("id").as("payload"))
        best { df.withColumn("r", org.apache.spark.sql.functions.rank()
            .over(org.apache.spark.sql.expressions.Window.orderBy(col("k"))))
          .write.format("noop").mode("overwrite").save() }
      }
      val u1 = userRank(500000L); val u10 = userRank(5000000L)
      val n1 = naiveRank(500000L); val n10 = naiveRank(5000000L)
      val w1 = wideRank(200000L); val w10 = wideRank(2000000L)
      out += "rank_scale" -> Map(
        "user_rank_1x" -> u1, "user_rank_10x" -> u10,
        "user_rank_ratio" -> u10 / u1,
        "naive_window_1x" -> n1, "naive_window_10x" -> n10,
        "speedup_10x" -> n10 / u10,
        "wide24_1x" -> w1, "wide24_10x" -> w10, "wide24_ratio" -> w10 / w1)
      System.err.println(s"[probe] rankscale user $u1->$u10 naive $n1->$n10 " +
        s"wide24 $w1->$w10")
    }

    if (want("lpa_cadence")) {
      val edges = QueryCatalog.knnEdges(spark, sf10)
        .select(col("id").as("src"), col("nbr").as("dst"))
        .localCheckpoint() // exclude kNN construction from the measurement
      def run(iters: Int, every: Int): Double =
        best { operators.Graph.labelPropagation(edges, iters, every).count() }
      val r = scala.collection.immutable.ListMap(
        "i8_every1" -> run(8, 1), "i8_every4" -> run(8, 4),
        "i16_every1" -> run(16, 1), "i16_every4" -> run(16, 4))
      out += "lpa_cadence" -> (r ++ Map(
        "i8_ratio_4v1" -> r("i8_every4") / r("i8_every1"),
        "i16_ratio_4v1" -> r("i16_every4") / r("i16_every1")))
      System.err.println(s"[probe] lpa_cadence $r")
    }

    if (want("r7ops")) {
      // the three new r7 shapes: a tree-reduce (e11_min), a zero-shuffle
      // literal-coefficient projection (e12_matmat), and a per-row codec
      // map (mm_gif) — all must be ~linear-flat at 10× data
      def q(name: String, dir: String): Double =
        best { SparkEntry.queries(name)(spark, dir).count() }
      QueryCatalog.wide(spark, sf1x).count()
      QueryCatalog.wide(spark, sf10).count()
      QueryCatalog.docs(spark, sf1x).count()
      QueryCatalog.docs(spark, sf10).count()
      val r = scala.collection.immutable.ListMap(
        "min_1x" -> q("e11_min", sf1x), "min_10x" -> q("e11_min", sf10),
        "matmat_1x" -> q("e12_matmat", sf1x), "matmat_10x" -> q("e12_matmat", sf10),
        "gif_1x" -> q("mm_gif", sf1x), "gif_10x" -> q("mm_gif", sf10))
      out += "r7ops" -> (r ++ Map(
        "min_ratio" -> r("min_10x") / r("min_1x"),
        "matmat_ratio" -> r("matmat_10x") / r("matmat_1x"),
        "gif_ratio" -> r("gif_10x") / r("gif_1x")))
      System.err.println(s"[probe] r7ops $r")
    }

    if (want("spans")) {
      // dd_span / dd_despan at 1× vs 10× docs: per-doc bounded window
      // frames + a distinct-window-bounded fingerprint groupBy — both
      // must track the corpus ~linearly
      def q(name: String, dir: String): Double =
        best { SparkEntry.queries(name)(spark, dir).count() }
      QueryCatalog.docs(spark, sf1x).count()
      QueryCatalog.docs(spark, sf10).count()
      val s1 = q("dd_span", sf1x); val s10 = q("dd_span", sf10)
      val c1 = q("dd_despan", sf1x); val c10 = q("dd_despan", sf10)
      out += "spans" -> Map(
        "span_1x" -> s1, "span_10x" -> s10, "span_ratio" -> s10 / s1,
        "despan_1x" -> c1, "despan_10x" -> c10, "despan_ratio" -> c10 / c1)
      System.err.println(s"[probe] spans $s1->$s10 despan $c1->$c10")
    }

    if (want("seqshift")) {
      def q(name: String, dir: String): Double =
        best { SparkEntry.queries(name)(spark, dir).count() }
      QueryCatalog.wide(spark, sf1x).count()
      QueryCatalog.wide(spark, sf10).count()
      val s1 = q("e11_shift", sf1x); val s10 = q("e11_shift", sf10)
      val d1 = q("e11_diff", sf1x); val d10 = q("e11_diff", sf10)
      out += "seqshift" -> Map(
        "shift_1x" -> s1, "shift_10x" -> s10, "shift_ratio" -> s10 / s1,
        "diff_1x" -> d1, "diff_10x" -> d10, "diff_ratio" -> d10 / d1)
      System.err.println(s"[probe] shift $s1->$s10 diff $d1->$d10")
    }

    def js(v: Any): String = v match {
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => "\"" + k + "\":" + js(x) }.mkString("{", ",", "}")
      case d: Double => BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.toPlainString
      case i: Int => i.toString
      case s => "\"" + s + "\""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (js(out) + "\n").getBytes("UTF-8"))
    System.err.println(s"[probe] written to $outPath")
    spark.stop()
  }
}

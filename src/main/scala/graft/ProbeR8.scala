package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 probes (VERDICT r7 asks #2/#3):
  *
  *  - `zipfbal`: slice balance of `Prefix.runningAgg` on a HEAVILY skewed
  *    (Zipf-like, top value ≈ 50% of rows) order domain — the r7 caveat
  *    was that equi-width slice boundaries track the order column's VALUE
  *    distribution, concentrating parallelism toward the skew. The r8
  *    sampled-quantile boundaries + tie-hash split must hold per-slice
  *    row counts near n/parts where equi-width collapses. Also times the
  *    user-facing `row_number() OVER (ORDER BY zipf)` rewrite at 1×/5×
  *    rows on a Graft-extended session (the GlobalRowNumberRule path).
  *
  * Usage: runMain graft.ProbeR8 [outPath].
  * Gate sections with SPARK_GRAFT_PROBE_ONLY=zipfbal,...
  */
object ProbeR8 {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  /** min of 3 passes — the host suffers transient CPU-steal storms */
  private def best(f: => Unit): Double = (1 to 3).map(_ => time(f)).min

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("PROBE_r8.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def want(section: String): Boolean = only.forall(_.contains(section))

    if (want("zipfbal")) {
      val parts = 32
      // deterministic Zipf-like order column: P(z ≥ k) ≈ 1/k over
      // 1..1e6 — the single value 1 holds ~half of all rows, value 2
      // another ~17%, so equi-width boundaries put ~everything in slice 0
      def zipfDf(n: Long) = spark.range(n).select(
        col("id").as("rid"),
        floor(lit(1000000.0) /
          (lit(1.0) + pmod(xxhash64(col("id")), lit(1000000L))
            .cast("double"))).cast("double").as("z"),
        lit(1L).as("one"))

      def histStats(h: Map[Int, Long], n: Long): Map[String, Any] = {
        val mean = n.toDouble / parts
        val mx = if (h.isEmpty) 0L else h.values.max
        Map("slices_used" -> h.size,
          "max_rows" -> mx.toInt,
          "max_over_mean" -> mx / mean)
      }

      val n1 = 2000000L
      val df = zipfDf(n1)
      // r8 sampled-quantile slices with full-row tie entropy (what
      // GlobalRowNumberRule passes)
      val quant = operators.Prefix.withSliceId(df, col("z"), Seq("one"),
          Nil, descending = false, nullsLast = false,
          tieCols = operators.Prefix.entropyCols(df), parts)
        .groupBy("__pfx_pid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // the old equi-width mapping, computed inline for comparison
      val b = df.agg(min("z").as("lo"), max("z").as("hi")).collect()(0)
      val (lo, hi) = (b.getDouble(0), b.getDouble(1))
      val width = df.select(least(lit(parts - 1),
          floor((col("z") - lit(lo)) / lit(hi - lo) * parts).cast("int"))
          .as("pid"))
        .groupBy("pid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      System.err.println(s"[probe] zipfbal quantile=${histStats(quant, n1)} " +
        s"equiwidth=${histStats(width, n1)}")

      // user-facing rewrite wall: row_number over the zipf order on an
      // extended session, 1× vs 5× rows (structure check: no
      // single-partition window, wall ~linear)
      val ext = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .appName("graft-zipfbal").getOrCreate()
      def userRn(n: Long): Double = {
        val d = ext.range(n).select(
          col("id").as("rid"),
          floor(lit(1000000.0) /
            (lit(1.0) + pmod(xxhash64(col("id")), lit(1000000L))
              .cast("double"))).cast("double").as("z"))
        best { d.withColumn("rn", row_number()
            .over(org.apache.spark.sql.expressions.Window.orderBy(col("z"))))
          .write.format("noop").mode("overwrite").save() }
      }
      val u1 = userRn(2000000L); val u5 = userRn(10000000L)
      out += "zipf_balance" -> Map(
        "n" -> n1.toInt,
        "quantile" -> histStats(quant, n1),
        "equiwidth" -> histStats(width, n1),
        "user_rownum_2m_s" -> u1, "user_rownum_10m_s" -> u5,
        "user_rownum_5x_ratio" -> u5 / u1)
      System.err.println(s"[probe] zipfbal user_rownum $u1 -> $u5")
    }

    if (want("shiftdecomp")) {
      // decompose the single-pass shift cost at 1×/10×: (a) the eager
      // compile phase (slice sample + edge collect), (b) the lazy
      // execution (exchange + sort + mapPartitions), vs the r7 positional
      // join on identical input
      def decomp(dir: String): Map[String, Any] = {
        val w = QueryCatalog.wide(spark, dir)
        w.count() // warm the cache
        val vals = Seq("q1", "q2", "q3", "q4")
        val outs = vals.map(_ + "_sh")
        var shifted: org.apache.spark.sql.DataFrame = null
        val tCompile = time {
          shifted = operators.Prefix.positionalLag(
            w, "__row_id__", col("__row_id__"), vals, 2, outs)
        }
        val tExec = best {
          shifted.write.format("noop").mode("overwrite").save()
        }
        System.err.println(s"[probe] shiftdecomp $dir compile=$tCompile exec=$tExec")
        Map("compile_s" -> tCompile, "exec_s" -> tExec)
      }
      out += "shift_decomp" -> Map(
        "sf1x" -> decomp("/root/testdata/sf0.1"),
        "sf10x" -> decomp("/tmp/graft_sf1"))

    }

    if (want("shiftstages")) {
      // micro-stages on the 10× frame: how much is slicing, exchange+sort,
      // and the mapPartitions row conversion each contributing?
      val w10 = QueryCatalog.wide(spark, "/tmp/graft_sf1"); w10.count()
      val parts = 32
      val sliced = operators.Prefix.withSliceId(
        w10.withColumn("__lag_ord", col("__row_id__")), col("__lag_ord"),
        Seq("q1", "q2", "q3", "q4"), Nil, descending = false,
        nullsLast = false, tieCols = Seq(col("__row_id__")), parts)
      val tSlice = best { sliced.write.format("noop").mode("overwrite").save() }
      System.err.println("[probe] PLAN-BEGIN\n" +
        sliced.queryExecution.executedPlan.toString.linesIterator
          .map(_.take(200)).take(60).mkString("\n") + "\n[probe] PLAN-END")
      val sorted = sliced.repartition(parts, col("__pfx_pid"))
        .sortWithinPartitions(col("__pfx_pid").asc,
          col("__lag_ord").asc_nulls_first, col("__row_id__").asc)
      val tSort = best { sorted.write.format("noop").mode("overwrite").save() }
      val schema = sorted.schema
      implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
        org.apache.spark.sql.Encoders.row(schema)
      val mapped = sorted.mapPartitions(it => it)
      val tMap = best { mapped.write.format("noop").mode("overwrite").save() }
      System.err.println(s"[probe] stages slice=$tSlice sort=$tSort map=$tMap")
      out += "shift_stages_10x" -> Map(
        "slice_s" -> tSlice, "sort_s" -> tSort, "ident_map_s" -> tMap)

      // bisect the slice cost: base scan alone, + tie hash, + the sample
      // subtree alone, + broadcast join with a constant bucket
      val tBase = best { w10.write.format("noop").mode("overwrite").save() }
      val tie = xxhash64(col("__row_id__"), lit("__pfx_tie"))
      val tTie = best { w10.select(col("*"), tie.as("__t"))
        .write.format("noop").mode("overwrite").save() }
      val narrow = w10.select(col("__row_id__").cast("double").as("__pfx_o"),
        tie.as("__pfx_t")).where(col("__pfx_o").isNotNull)
      val samp = narrow.withColumn("__pfx_h",
          xxhash64(col("__pfx_o"), col("__pfx_t"), lit("__pfx_h")))
        .orderBy(col("__pfx_h"), col("__pfx_o"), col("__pfx_t")).limit(32 * 256)
      val tSamp = best { samp.write.format("noop").mode("overwrite").save() }
      val allS = samp.agg(sort_array(collect_list(struct(
        col("__pfx_o").as("o"), col("__pfx_t").as("t")))).as("__pfx_all"))
      val tAgg = best { allS.write.format("noop").mode("overwrite").save() }
      System.err.println(
        s"[probe] bisect base=$tBase tie=$tTie samp=$tSamp agg=$tAgg")
      out += "shift_bisect_10x" -> Map("base_s" -> tBase, "tie_s" -> tTie,
        "samp_s" -> tSamp, "agg_s" -> tAgg)

      // crossJoin anatomy: literal 1-row build vs the computed bounds row
      val lit1 = spark.range(1).select(lit(1.0).as("b1"))
      val tX1 = best { w10.crossJoin(broadcast(lit1)).drop("b1")
        .write.format("noop").mode("overwrite").save() }
      val litW = spark.range(1).select(
        (1 until 32).flatMap(i => Seq(lit(i.toDouble).as(s"bo_$i"),
          lit(i.toLong).as(s"bt_$i"))): _*)
      val tX62 = best { w10.crossJoin(broadcast(litW))
        .drop(litW.columns: _*)
        .write.format("noop").mode("overwrite").save() }
      val ko = col("__row_id__").cast("double")
      val bucketLit = (1 until 32).map { i =>
        (col(s"bo_$i") < ko).cast("int") }.reduceLeft(_ + _)
      val tXB = best { w10.crossJoin(broadcast(litW))
        .withColumn("__pid", bucketLit).drop(litW.columns: _*)
        .write.format("noop").mode("overwrite").save() }
      System.err.println(s"[probe] xjoin lit1=$tX1 lit62=$tX62 bucket=$tXB")

      // the real slice pipeline with surgical substitutions
      import org.apache.spark.sql.DataFrame
      def sliceVariant(pidExpr: Boolean, literalBnds: Boolean): Double = {
        val okey = "__lag_ord"
        val df = w10.withColumn(okey, col("__row_id__"))
        val ord = col(okey).cast("double")
        val ordFinite = when(isnan(ord), lit(null)).otherwise(ord)
        val tie = xxhash64(col("__row_id__"), lit("__pfx_tie"))
        val narrow = df.select(ordFinite.as("__pfx_o"), tie.as("__pfx_t"))
          .where(col("__pfx_o").isNotNull)
        val samp = narrow.withColumn("__pfx_h",
            xxhash64(col("__pfx_o"), col("__pfx_t"), lit("__pfx_h")))
          .orderBy(col("__pfx_h"), col("__pfx_o"), col("__pfx_t"))
          .limit(32 * 256)
        val allSorted = samp.agg(sort_array(collect_list(struct(
          col("__pfx_o").as("o"), col("__pfx_t").as("t")))).as("__pfx_all"))
        val bndCols = (1 until 32).flatMap { i =>
          val n = size(col("__pfx_all"))
          val idx = least(n, greatest(lit(1),
            floor(n * lit(i) / lit(32)).cast("int")))
          val b = when(n > 0, element_at(col("__pfx_all"), idx))
          Seq(b.getField("o").as(s"__pfx_bo_$i"),
            b.getField("t").as(s"__pfx_bt_$i"))
        }
        val bndsReal = allSorted.select(bndCols: _*)
        val bnds: DataFrame =
          if (!literalBnds) bndsReal
          else {
            val r = bndsReal.collect()(0)
            spark.range(1).select(bndsReal.columns.zipWithIndex.map {
              case (c, i) => lit(r.get(i)).as(c) }: _*)
          }
        val keyed = df.withColumn("__pfx_ko", ord).withColumn("__pfx_kt", tie)
        val ko = col("__pfx_ko"); val kt = col("__pfx_kt")
        val bucket = (1 until 32).map { i =>
          (col(s"__pfx_bo_$i") < ko ||
            (col(s"__pfx_bo_$i") === ko && col(s"__pfx_bt_$i") <= kt))
            .cast("int")
        }.reduceLeft(_ + _)
        val pid = if (pidExpr)
          when(ko.isNull, lit(0)).when(isnan(ko), lit(31))
            .otherwise(coalesce(bucket, lit(0)))
          else lit(0)
        val outDf = keyed.crossJoin(broadcast(bnds))
          .withColumn("__pfx_pid", pid)
          .drop(("__pfx_ko" +: "__pfx_kt" +: (1 until 32).flatMap(i =>
            Seq(s"__pfx_bo_$i", s"__pfx_bt_$i"))): _*)
        best { outDf.write.format("noop").mode("overwrite").save() }
      }
      val tRealReal = sliceVariant(pidExpr = true, literalBnds = false)
      val tLitB = sliceVariant(pidExpr = true, literalBnds = true)
      val tNoPid = sliceVariant(pidExpr = false, literalBnds = false)
      System.err.println(
        s"[probe] variants real=$tRealReal litbnds=$tLitB nopid=$tNoPid")
    }

    if (want("r8ops")) {
      // the round's new query shapes at 1× vs 10× data: cross-corpus span
      // join, typed JSON extraction, JPEG decode map — plus two quantile-
      // slice prefix consumers to show the sample-pass overhead is a
      // fixed constant, not a data-scaled term
      val sf1x = "/root/testdata/sf0.1"; val sf10 = "/tmp/graft_sf1"
      def q(name: String, dir: String): Double =
        best { SparkEntry.queries(name)(spark, dir).count() }
      QueryCatalog.docs(spark, sf1x).count()
      QueryCatalog.docs(spark, sf10).count()
      QueryCatalog.wide(spark, sf1x).count()
      QueryCatalog.wide(spark, sf10).count()
      val names = Seq("dd_spanref", "ev_jstruct", "ev_jarr", "mm_jpeg",
        "e11_cumsum", "smp_budget")
      val r = scala.collection.immutable.ListMap(names.flatMap { n =>
        val a = q(n, sf1x); val b = q(n, sf10)
        System.err.println(f"[probe] r8ops $n $a%.3f -> $b%.3f (${b / a}%.2f)")
        Seq(s"${n}_1x" -> a, s"${n}_10x" -> b, s"${n}_ratio" -> b / a)
      }: _*)
      out += "r8ops" -> r
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

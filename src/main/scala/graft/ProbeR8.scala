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

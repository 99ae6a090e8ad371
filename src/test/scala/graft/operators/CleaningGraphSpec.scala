package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.functions.BloomFilterOps

/** The round-4 wave-3 operators: profiling, winsorization, z-score
  * anomalies, entity resolution, bloom join pruning, PageRank. */
class CleaningGraphSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)

  private lazy val valsDf = {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    // group a: 1..20 (p05 = 1, p95 = 19); group b: constant 5s
    val rows = (1 to 20).map(i => Row("a", i.toDouble)) ++
      Seq.fill(6)(Row("b", 5.0))
    df(schema, rows)
  }

  test("profile: one row per column, exact stats incl. nulls") {
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType)))
    val d = df(schema,
      Seq(Row(1.0, 10.0), Row(2.0, null), Row(2.0, 30.0), Row(null, 10.0)))
    val p = Profiling.profile(d, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = p("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 1 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 2.0)
    assert(math.abs(x.getDouble(6) - 5.0 / 3) < 1e-6)
    val y = p("y")
    assert(y.getLong(2) == 1 && y.getLong(3) == 2 && y.getDouble(5) == 30.0)
  }

  test("winsorize: thresholds are rank-selected existing values; clip bounds hold") {
    val w = Cleaning.winsorize(valsDf, "g", "v", 0.05, 0.95)
    val a = w.filter(col("g") === "a")
    val (lo, hi) = (a.agg(min("p_lo")).head.getDouble(0),
      a.agg(max("p_hi")).head.getDouble(0))
    assert(lo == 1.0 && hi == 19.0) // ceil(20*.05)=1st, ceil(20*.95)=19th
    assert(a.filter(col("__winsorized") < lo || col("__winsorized") > hi).count() == 0)
    assert(w.count() == valsDf.count()) // winsorization never drops rows
    // constant group: p_lo = p_hi = the value, everything clips to itself
    val b = w.filter(col("g") === "b")
    assert(b.agg(min("__winsorized"), max("__winsorized")).head ==
      Row(5.0, 5.0))
  }

  test("zscoreAnomalies: flags the planted outlier; constant key yields none") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    val d = df(schema,
      (1 to 20).map(_ => Row("u", 10.0)) ++ Seq(Row("u", 100.0)) ++
        Seq.fill(5)(Row("c", 7.0))) // constant key: variance 0 → no rows
    val out = Cleaning.zscoreAnomalies(d, "k", "v", z = 2.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(r.fieldIndex("k")) == "u")
    assert(r.getDouble(r.fieldIndex("v")) == 100.0)
    assert(r.getDouble(r.fieldIndex("zscore")) > 2.0)
  }

  test("madOutliers: robust to the outlier mass that drowns plain z-scores") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    // five huge outliers among twenty inliers: the classic case where the
    // outliers inflate mean/std enough to hide themselves from zscore,
    // while median/MAD stay pinned to the inlier mass
    val d = df(schema,
      (1 to 20).map(i => Row("u", 10.0 + (i % 5))) ++
        (1 to 5).map(_ => Row("u", 1000.0)) ++
        Seq.fill(4)(Row("c", 7.0))) // constant key: MAD 0 → no rows
    val robust = Cleaning.madOutliers(d, "k", "v").collect()
    assert(robust.length == 5, s"expected the 5 planted outliers, got ${robust.length}")
    assert(robust.forall(r => r.getDouble(r.fieldIndex("v")) == 1000.0))
    assert(robust.forall(r =>
      math.abs(r.getDouble(r.fieldIndex("robust_z"))) > 3.5))
    // the plain z-score at the same strictness misses ALL of them: std is
    // inflated to ~370 by the outliers themselves
    val plain = Cleaning.zscoreAnomalies(d, "k", "v", z = 3.5).collect()
    assert(plain.isEmpty, s"plain z-score should drown, got ${plain.length}")
  }

  test("groupedPercentile equals exact percentile, without its growing buffer (r9)") {
    // rank-selection over grouped value counts must reproduce Spark's
    // Percentile bit-for-bit (same pos = q(n-1) interpolation, doubles
    // converted at the same point) across odd/even counts, duplicates,
    // NULLs and decimal inputs — while aggregating with fixed-size state
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    val rows = (1 to 23).map(i => Row("a", (i * 37 % 11) + i / 7.0)) ++
      (1 to 10).map(i => Row("b", i.toDouble)) ++
      Seq(Row("b", null), Row("c", 5.0))
    val d = df(schema, rows)
    for (q <- Seq(0.0, 0.25, 0.5, 0.73, 1.0)) {
      val exact = d.groupBy(col("k"))
        .agg(percentile(col("v"), lit(q)).as("p")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val mine = Cleaning.groupedPercentile(d, "k", col("v"), q, "p")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(mine == exact, s"q=$q: $mine vs $exact")
    }
    // decimal input: conversion to double at the interpolation point
    val dd = d.select(col("k"), col("v").cast(DecimalType(10, 2)).as("v"))
    val exactD = dd.groupBy(col("k"))
      .agg(percentile(col("v"), lit(0.5)).as("p")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val mineD = Cleaning.groupedPercentile(dd, "k", col("v"), 0.5, "p")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mineD == exactD, s"decimal: $mineD vs $exactD")
    // and the madOutliers plan must carry NO object-aggregate percentile
    val plan = Cleaning.madOutliers(d, "k", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"),
      s"madOutliers must not plan the growing-buffer Percentile:\n$plan")
    // q = 0 must stay on the exact path even when the distinct budget
    // would delegate to the sketch (whose rank selection needs q > 0) —
    // r10 ADVICE: the same query must not crash by data cardinality
    spark.conf.set("graft.percentile.approxAboveDistinct", "1")
    try {
      val q0 = Cleaning.groupedPercentile(d, "k", col("v"), 0.0, "p")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exact0 = d.groupBy(col("k"))
        .agg(min(col("v")).as("p")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(q0 == exact0, s"q=0 under budget: $q0 vs $exact0")
    } finally spark.conf.unset("graft.percentile.approxAboveDistinct")
  }

  test("kCore: peels the tail, keeps the cycle; converged output degrees " +
      "all >= k") {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    // triangle {1,2,3} with a 2-hop tail 3-4-5: the 2-core is exactly
    // the triangle (peel 5 with deg 1, then 4 with deg 1)
    val edges = df(schema, Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 1L),
      Row(3L, 4L), Row(4L, 5L)))
    val core = graft.operators.Graph.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    // k above the max degree empties the graph
    assert(graft.operators.Graph.kCore(edges, k = 4, rounds = 2).count() == 0)
  }

  test("kCore: the fixpoint early exit is invisible in the result — " +
      "extra rounds past convergence change nothing") {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    // the same triangle + 2-hop tail: converges after 3 peels (5 drops,
    // then 4, then the survivor set repeats) — rounds=16 must produce the
    // BIT-IDENTICAL (id, deg) set the fixed 3-round iterate produces,
    // because alive_r ⊆ alive_{r−1} makes equal counts equal sets
    val edges = df(schema, Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 1L),
      Row(3L, 4L), Row(4L, 5L)))
    val at3 = graft.operators.Graph.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at16 = graft.operators.Graph.kCore(edges, k = 2, rounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at3 == at16, s"early exit diverged: $at3 vs $at16")
    assert(at16 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("entity resolution: distance-1 variants match their master, the 4-edit class is rejected") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val dirty = EntityResolution.dirtyCustomers(cust)
    val m = EntityResolution.matchBlocked(dirty, cust, maxDist = 2)
    val matched = m.collect()
    // every match resolves a dirty record to its own master (id - 10M)
    assert(matched.nonEmpty)
    matched.foreach { r =>
      assert(r.getLong(r.fieldIndex("dirty_id")) - 10000000L ==
        r.getLong(r.fieldIndex("master_id")))
      assert(r.getInt(r.fieldIndex("dist")) <= 2)
    }
    // exactly the custkey%3 ∈ {0,1} classes match; the Zzzz class never does
    val expected = dirty.filter((col("dirty_id") - 10000000L) % 3 =!= 2).count()
    assert(matched.length == expected)
  }

  test("bloom prefilter: no false negatives, real pruning, join result unchanged") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val pre = BloomFilterOps.bloomPrefilter(o, "o_custkey", cust, "c_custkey",
      expectedItems = 10000L, fpp = 0.01)
    val preN = pre.count()
    assert(preN < o.count(), "bloom should prune non-joining fact rows")
    def joined(fact: org.apache.spark.sql.DataFrame) =
      fact.join(cust.select("c_custkey"), fact("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)), sum(col("o_totalprice").cast(DecimalType(18, 2))))
        .head
    assert(joined(pre) == joined(o), "pruning must not change the join result")
  }

  test("chunkDupStats: exact duplicate docs share every chunk; unique docs share none") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val shared = (1 to 16).map(i => s"w$i").mkString(" ")
    val d = df(schema, Seq(
      Row(1L, shared), Row(2L, shared), // identical → every chunk dup
      Row(3L, (1 to 16).map(i => s"u$i").mkString(" ")))) // unique tokens
    val out = Dedup.chunkDupStats(d, "text", "doc_id", chunkSize = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)) && out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("ewmaFiniteHorizon: hand-computed 2^-j weighting, series-start normalization") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("t", LongType),
      StructField("v", DoubleType)))
    val d = df(schema, Seq(Row("a", 1L, 4.0), Row("a", 2L, 8.0), Row("a", 3L, 2.0)))
    val out = TimeSeries.ewmaFiniteHorizon(d, "k", Seq(col("t")), "v", taps = 2)
      .collect().map(r => r.getLong(r.fieldIndex("t")) ->
        r.getDouble(r.fieldIndex("ewma"))).toMap
    assert(out(1L) == 4.0) // first row: only itself
    assert(out(2L) == 6.666667) // round6((8 + 0.5·4) / 1.5)
    assert(out(3L) == 4.0) // (2 + 0.5·8) / 1.5 exact
  }

  test("pageRank: conserves mass on a cycle (uniform fixpoint), ranks central node highest") {
    val vs = df(StructType(Seq(StructField("id", LongType))),
      (0L to 3L).map(Row(_)))
    val cyc = df(StructType(Seq(StructField("src", LongType), StructField("dst", LongType))),
      Seq(Row(0L, 1L), Row(1L, 2L), Row(2L, 3L), Row(3L, 0L)))
    val pr = Graph.pageRank(vs, cyc, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a directed cycle's stationary distribution is uniform: 1/4 each
    pr.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9))
    // star: everyone points at 0, 0 points at 1
    val star = df(StructType(Seq(StructField("src", LongType), StructField("dst", LongType))),
      Seq(Row(1L, 0L), Row(2L, 0L), Row(3L, 0L), Row(0L, 1L)))
    val pr2 = Graph.pageRank(vs, star, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr2(0L) > pr2(1L) && pr2(1L) > pr2(2L))
    assert(math.abs(pr2(2L) - pr2(3L)) < 1e-12) // symmetric leaves tie
  }
}

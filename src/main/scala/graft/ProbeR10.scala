package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 scale probes:
  *  - `lshacct`: the r9 VERDICT weak flag — sim_lsh's 100× wall was
  *    CLAIMED output-bound without output accounting. This section
  *    measures, per scale (1×/10×/30×/100×): the bounded-cell size
  *    distribution (max cell, cells over the cap — must be ZERO above
  *    depth-reachable splits after the r10 recursive boundCells),
  *    candidate pairs (Σ n·(n−1)/2 over cells — the exact join fanout),
  *    output rows, and the query wall, so "wall ≈ output growth" is a
  *    measurement tying wall to candidate/output rows, not a claim.
  *  - `ewmscale`: the r10 exact ewm scan (mean/var) and the min_periods
  *    rolling family at 10× — the winewm O(horizon) ring is gone; the
  *    scan is O(1)/row, so ratios should sit in the positional-lag band.
  *  - `rollcold`: fresh-JVM rep decomposition of the fused window family
  *    after the r10 monomorphic emit split (the r9 shared winEmit read
  *    6.8/3.1/1.9 s across reps at 10× — C2 warming on a megamorphic
  *    method; per-mode closures should pull rep 1 toward rep 3).
  *  - `madkll`: groupedPercentile's KLL fallback above the distinct-count
  *    budget on an ALL-DISTINCT value domain (the adversarial shape where
  *    exact rank-selection state grows with the data): walls for exact vs
  *    sketch at 2M/20M rows and sketch-only at 80M — flat per-group state
  *    at any cardinality.
  *
  * Scaled tables come from ScaleGen at /tmp/graft_sf{1,3,10}. Gate
  * sections with SPARK_GRAFT_PROBE_ONLY=lshacct,ewmscale,rollcold,madkll.
  */
object ProbeR10 {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(f: => Unit): Double = (1 to 3).map(_ => time(f)).min

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("PROBE_r10.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def want(section: String): Boolean = only.forall(_.contains(section))
    val sf1x = "/root/testdata/sf0.1"
    val scales = Seq("1x" -> sf1x, "10x" -> "/tmp/graft_sf1",
      "30x" -> "/tmp/graft_sf3", "100x" -> "/tmp/graft_sf10")

    if (want("lshacct")) {
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      for ((tag, dir) <- scales
           if new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val e = QueryCatalog.embs(spark, dir)
        val nRows = e.count()
        // cell accounting from the SAME bounded split the query joins on
        val cells = operators.Similarity.lshCells(e, nPlanes = 6,
            idCol = "vec_id", embCol = "embedding", seed = 42L,
            exact = true, maxBucketSize = 1024, subPlanes = 8)
          .groupBy(col("__kb"), col("__kd"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_cells"), max(col("n")).as("max_cell"),
            sum(when(col("n") > 1024, 1L).otherwise(0L)).as("over_cap"),
            sum((col("n") * (col("n") - 1) / 2).cast("long"))
              .as("cand_pairs"))
          .head()
        val outRows = SparkEntry.queries("sim_lsh")(spark, dir).count()
        val wall = best { SparkEntry.queries("sim_lsh")(spark, dir).count() }
        System.err.println(f"[probe] lshacct $tag rows=$nRows " +
          s"cells=${cells.getLong(0)} max_cell=${cells.getLong(1)} " +
          s"over_cap=${cells.getLong(2)} cand_pairs=${cells.getLong(3)} " +
          f"out_rows=$outRows wall=$wall%.2f")
        r += s"${tag}_rows" -> nRows
        r += s"${tag}_cells" -> cells.getLong(0)
        r += s"${tag}_max_cell" -> cells.getLong(1)
        r += s"${tag}_cells_over_cap" -> cells.getLong(2)
        r += s"${tag}_candidate_pairs" -> cells.getLong(3)
        r += s"${tag}_output_rows" -> outRows
        r += s"${tag}_wall" -> wall
      }
      out += "lshacct" -> r
    }

    if (want("ewmscale")) {
      val sf10 = "/tmp/graft_sf1"
      def q(name: String, dir: String): Double =
        best { SparkEntry.queries(name)(spark, dir).count() }
      QueryCatalog.wide(spark, sf1x).count()
      QueryCatalog.wide(spark, sf10).count()
      val names = Seq("e11_ewm", "e11_ewmbig", "e11_ewvar", "e11_rmp",
        "e11_rmpv")
      val r = scala.collection.immutable.ListMap(names.flatMap { n =>
        val a = q(n, sf1x); val b = q(n, sf10)
        System.err.println(f"[probe] ewmscale $n $a%.3f -> $b%.3f (${b / a}%.2f)")
        Seq(s"${n}_1x" -> a, s"${n}_10x" -> b, s"${n}_ratio" -> b / a)
      }: _*)
      out += "ewmscale" -> r
    }

    if (want("rollcold")) {
      val sf10 = "/tmp/graft_sf1"
      QueryCatalog.wide(spark, sf10).count()
      // order is part of the measurement: whichever fused-lag query runs
      // FIRST pays the family's shared one-time cost (slice-sample plan,
      // heap codegen, exchange warmup); set SPARK_GRAFT_ROLLCOLD_FIRST
      // to move a different query to the front and show the wall follows
      // the position, not the aggregate mode
      val base = Seq("e11_rmean", "e11_rmed", "e11_ewm", "e11_shift")
      val names = sys.env.get("SPARK_GRAFT_ROLLCOLD_FIRST")
        .fold(base)(f => f +: base.filterNot(_ == f))
      for (n <- names) {
        val reps = (1 to 3).map(_ =>
          time { SparkEntry.queries(n)(spark, sf10).count() })
        System.err.println(f"[probe] rollcold $n " +
          reps.map(r => f"$r%.2f").mkString(" "))
        out += s"rollcold_$n" -> reps.toList
      }
    }

    if (want("r10scale")) {
      // the round's new surface at 30×/100× lineitem (exact ewm scan,
      // min_periods windows) and the NN-Descent build at 10×/30×
      // embeddings (single-shot — the 6-round index build IS the query)
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      for ((tag, dir) <- Seq("1x" -> sf1x, "30x" -> "/tmp/graft_sf3",
             "100x" -> "/tmp/graft_sf10")
           if new java.io.File(s"$dir/lineitem.parquet").exists()) {
        QueryCatalog.wide(spark, dir).count()
        for (n <- Seq("e11_ewm", "e11_ewvar", "e11_rmp")) {
          val t = best { SparkEntry.queries(n)(spark, dir).count() }
          r += s"${n}_$tag" -> t
          System.err.println(f"[probe] r10scale $n $tag $t%.2f")
        }
      }
      for ((tag, dir) <- Seq("1x" -> sf1x, "10x" -> "/tmp/graft_sf1",
             "30x" -> "/tmp/graft_sf3")
           if new java.io.File(s"$dir/embeddings.parquet").exists()) {
        QueryCatalog.embs(spark, dir).count()
        val t = time { SparkEntry.queries("sim_nnd")(spark, dir).count() }
        r += s"sim_nnd_$tag" -> t
        System.err.println(f"[probe] r10scale sim_nnd $tag $t%.2f")
      }
      out += "r10scale" -> r
    }

    if (want("nndsample")) {
      // the ρ-sampling knob at the superlinear corner: unsampled 100×
      // reads 793 s (candidates are LINEAR — 39M pairs/round at 200k
      // nodes — but the vector-carrying candidate exchange outgrows
      // executor memory and spills ~2× superlinearly); sampleDeg = 8
      // caps the 2-hop expansion at 64 candidates/node
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      for ((tag, dir) <- Seq("30x" -> "/tmp/graft_sf3",
             "100x" -> "/tmp/graft_sf10")
           if new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val e = QueryCatalog.embs(spark, dir); e.count()
        QueryCatalog.knnEdges(spark, dir).count()
        val t = time {
          operators.Similarity.nnDescent(e, "label", k = 5, rounds = 6,
            seedThreshold = 0.25,
            precomputedSeed = Some(QueryCatalog.knnEdges(spark, dir)),
            sampleDeg = 8).count()
        }
        r += s"sampled8_$tag" -> t
        System.err.println(f"[probe] nndsample $tag $t%.2f")
      }
      // quality under sampling at 1×: recall@3 on the probe nodes
      val e1 = QueryCatalog.embs(spark, sf1x)
      val probes = e1.where(col("vec_id") % 199 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("qe"))
      val pairs = e1.crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("id"))
        .select(col("id"), col("vec_id").as("nbr"),
          round(operators.Similarity.dotExact(col("embedding"), col("qe")) /
            (sqrt(operators.Similarity.dotExact(col("embedding"),
              col("embedding"))) *
              sqrt(operators.Similarity.dotExact(col("qe"), col("qe")))), 6)
            .as("sim"))
      val exact = graft.plans.TopKPerKey(pairs, Seq(col("id")),
        Seq(col("sim").desc, col("nbr")), 3).select(col("id"), col("nbr"))
      for (sd <- Seq(0, 8)) {
        val nnd = operators.Similarity.nnDescent(e1, "label", k = 5,
            rounds = 6, seedThreshold = 0.25,
            precomputedSeed = Some(QueryCatalog.knnEdges(spark, sf1x)),
            sampleDeg = sd)
          .select(col("id"), col("nbr"))
        val hits = nnd.join(exact, Seq("id", "nbr")).count()
        val tot = exact.count()
        r += s"recall_sd$sd" -> (hits.toDouble / tot)
        System.err.println(s"[probe] nndsample recall sd=$sd $hits/$tot")
      }
      out += "nndsample" -> r
    }

    if (want("madkll")) {
      // all-distinct value domain: every row its own value, 3 groups —
      // the exact rank selection walks n distinct (group, value) pairs;
      // the KLL path's per-group state is O(capacity·log n) at ANY n
      def mk(n: Long) = spark.range(n)
        .select((col("id") % 3).cast("string").as("k"),
          (col("id") * 1.0 + (col("id") % 7) * 0.1).as("v"))
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      // force the percentile VALUES (a bare count() lets column pruning
      // delete the rank-selection windows from the plan)
      def run(n: Long): Double = best {
        operators.Cleaning.groupedPercentile(mk(n), "k", col("v"), 0.5,
          "m").agg(sum(col("m"))).head()
      }
      for (n <- Seq(2000000L, 20000000L)) {
        val exact = run(n)
        r += s"exact_${n / 1000000}m" -> exact
        System.err.println(f"[probe] madkll exact ${n / 1000000}m $exact%.2f")
      }
      spark.conf.set("graft.percentile.approxAboveDistinct", "100000")
      try {
        for (n <- Seq(2000000L, 20000000L, 80000000L)) {
          val sk = run(n)
          r += s"kll_${n / 1000000}m" -> sk
          System.err.println(f"[probe] madkll kll ${n / 1000000}m $sk%.2f")
        }
      } finally spark.conf.unset("graft.percentile.approxAboveDistinct")
      out += "madkll" -> r
    }

    def js(v: Any): String = ProbeJson.js(v) // locale-safe (r13)
    val json = js(out)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

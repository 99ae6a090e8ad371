package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 scale probes:
  *  - `nnddefault`: the r10 VERDICT weak flag was that NN-Descent's
  *    scale-safe ρ-sampling was opt-in while the DEFAULT (full 2-hop
  *    expansion) was the config that falls over at 100× embeddings
  *    (792.8 s, spill-superlinear). r11 makes `sampleDeg = 0` mean AUTO:
  *    full expansion below `graft.nnd.sampleAboveCorpus` (default 100k —
  *    the measured top of the unsampled-linear band), ρ-sampling at
  *    `graft.nnd.autoSampleDeg` (8) above it. This section runs the
  *    sim_nnd build UNDER THE DEFAULT CONFIG at 1×/10×/30×/100× and
  *    records which mode fired — the 100× row must sit in the sampled
  *    linear band (~278 s measured in PROBE_r10 `nndsample`), not the
  *    793 s spill regime, with no caller knob.
  *  - `ctrfuse`: the r10 VERDICT perf note — `.rolling(7, center=1)`
  *    paid a second positionalLag pass (2.34 s vs e11_rmean's 0.9).
  *    r11 fuses the lead into the trailing slice pass (emit at
  *    i − (n−1)/2 via a pending queue + bounded lookahead edge set).
  *    Done-condition: e11_rctr within ~1.3× of e11_rmean's wall.
  *
  * Scaled tables come from ScaleGen at /tmp/graft_sf{1,3,10}. Gate
  * sections with SPARK_GRAFT_PROBE_ONLY=nnddefault,ctrfuse.
  */
object ProbeR11 {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(f: => Unit): Double = (1 to 3).map(_ => time(f)).min

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("PROBE_r11.json")
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

    if (want("nnddefault")) {
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      val thr = spark.conf.getOption("graft.nnd.sampleAboveCorpus")
        .map(_.toLong).getOrElse(100000L)
      for ((tag, dir) <- Seq("1x" -> sf1x, "10x" -> "/tmp/graft_sf1",
             "30x" -> "/tmp/graft_sf3", "100x" -> "/tmp/graft_sf10")
           if new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val e = QueryCatalog.embs(spark, dir)
        val n = e.count()
        QueryCatalog.knnEdges(spark, dir).count() // seed paid outside
        // the DEFAULT config: sampleDeg = 0 → auto (exact below the
        // corpus threshold, ρ-sampled above it); single-shot — the
        // 6-round build IS the query
        val t = time {
          operators.Similarity.nnDescent(e, "label", k = 5, rounds = 6,
            seedThreshold = 0.25,
            precomputedSeed = Some(QueryCatalog.knnEdges(spark, dir)))
            .count()
        }
        val mode = if (n > thr) "sampled" else "exact"
        r += s"${tag}_rows" -> n
        r += s"${tag}_mode" -> mode
        r += s"${tag}_wall" -> t
        System.err.println(f"[probe] nnddefault $tag rows=$n mode=$mode " +
          f"wall=$t%.2f")
      }
      out += "nnddefault" -> r
    }

    if (want("ctrfuse")) {
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      for ((tag, dir) <- Seq("1x" -> sf1x, "10x" -> "/tmp/graft_sf1")
           if new java.io.File(s"$dir/lineitem.parquet").exists()) {
        QueryCatalog.wide(spark, dir).count()
        for (n <- Seq("e11_rmean", "e11_rctr")) {
          val t = best { SparkEntry.queries(n)(spark, dir).count() }
          r += s"${n}_$tag" -> t
          System.err.println(f"[probe] ctrfuse $n $tag $t%.2f")
        }
      }
      out += "ctrfuse" -> r
    }

    // session 4: the order-statistic quantile reduction (exact rank
    // selection over grouped value counts — the only data-scaled stage
    // is the per-column cumulative window over DISTINCT values), the
    // one-pass percentile-array list form, and an axis=1 projection as
    // the floor reference. Expectation: qlow tracks the DISTINCT count
    // (lineitem quantity sums are low-cardinality, so near-flat), qlist
    // and hsum track the scan linearly.
    if (want("qosreduce")) {
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      for ((tag, dir) <- Seq("1x" -> sf1x, "10x" -> "/tmp/graft_sf1",
             "30x" -> "/tmp/graft_sf3")
           if new java.io.File(s"$dir/lineitem.parquet").exists()) {
        QueryCatalog.wide(spark, dir).count()
        for (n <- Seq("e11_qlow", "e11_qlist", "e11_hsum", "e11_hrank",
            "e11_interp")) {
          val t = best { SparkEntry.queries(n)(spark, dir).count() }
          r += s"${n}_$tag" -> t
          System.err.println(f"[probe] qosreduce $n $tag $t%.2f")
        }
      }
      out += "qosreduce" -> r
    }

    // session 5: the pairwise window cov/corr family — rolling rides
    // the fused single-pass ring (2w inputs, one slice exchange),
    // expanding one running-sum pass, ewm one polarization scan pass
    // (2w var columns). Expectation: all three track the scan linearly
    // (the rolling emit is O(n·w) per row, bounded by the ring gate).
    if (want("paircov")) {
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      for ((tag, dir) <- Seq("1x" -> sf1x, "10x" -> "/tmp/graft_sf1",
             "30x" -> "/tmp/graft_sf3")
           if new java.io.File(s"$dir/lineitem.parquet").exists()) {
        QueryCatalog.wide(spark, dir).count()
        for (n <- Seq("e11_rcov", "e11_rcorr", "e11_ecov", "e11_ewcov",
            "e11_rsem", "e11_ewm", "e11_rmean", "e11_diff")) {
          val t = best { SparkEntry.queries(n)(spark, dir).count() }
          r += s"${n}_$tag" -> t
          System.err.println(f"[probe] paircov $n $tag $t%.2f")
        }
      }
      out += "paircov" -> r
    }

    def js(v: Any): String = ProbeJson.js(v) // locale-safe (r13)
    val json = js(out)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

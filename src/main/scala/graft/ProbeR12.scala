package graft

import org.apache.spark.sql.SparkSession

/** Round-12 probes — the marathon-JVM root cause (r11 VERDICT #4).
  *
  * Final adjudication (PROBE_r12.json `cpuconfound`, measured after the
  * sections below ruled out every JVM mechanism): the r11 "marathon-JVM
  * 4–5× slice inflation" compared the 30× SWEEP (run through
  * `graft.Bench`, whose `SPARK_GRAFT_CPUS` default is **local[4]**)
  * against the fresh-JVM PROBES (every Probe main hardcodes
  * **local[32]**) — a CORE-COUNT confound, not a JVM effect. A fresh-JVM
  * A/B identical but for the cpus knob reproduces the exact ratio: the
  * mapPartitions slice family is CPU-bound and near-linearly
  * core-scalable (e11_ewm 18.7 → 3.2 s, 3.4–5.8× across the family at
  * 8× cores — the RIGHT shape for the 1000-executor posture), while the
  * codegen'd window/prefix ops at this scale are scan/latency-bound
  * (0.85–1.35×). The driver itself benches at cpus=32.
  *
  * The sections below stand as the evidence that eliminated the JVM
  * suspects first:
  *  - `marathon1x` — the exact r11 canonical shape (322 queries × 5
  *    passes, ONE JVM, sf0.1): NO fatigue (pass5/pass1 geomean 0.81
  *    across families), code cache peaks 195 MB < the 240 MB reserve
  *    despite MORE codegen compiles (1,610) than the r11 sweep (636).
  *  - `fatigue30x` — the 30×-data regime with six diverse heavy-ballast
  *    rounds between sentinel re-measures: sentinels flat, and the
  *    code-cache/metaspace/class counters DROP mid-run (full GCs unload
  *    dead codegen classloaders) — no accumulation pathology.
  */
object ProbeR12 {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("PROBE_r12.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def want(section: String): Boolean = only.forall(_.contains(section))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    if (want("fatigue30x")) {
      val dir = "/tmp/graft_sf3"
      if (new java.io.File(s"$dir/lineitem.parquet").exists()) {
        val r = scala.collection.mutable.LinkedHashMap[String, Any]()
        QueryCatalog.wide(spark, dir).count()
        QueryCatalog.docs(spark, dir).count()
        QueryCatalog.embs(spark, dir).count()
        QueryCatalog.sig32(spark, dir).count()
        QueryCatalog.pairs01(spark, dir).count()
        QueryCatalog.blockPairs025(spark, dir).count()
        val sentinels = Seq("e11_rcov", "e11_ewm", "e11_rmean", "e11_diff")
        // diverse heavy ballast (2–8 s at 30× in SCALE30X_r11_s5),
        // spanning hash-agg / join / codec / text / graph / window rank
        val ballast = Seq("dd_simhash", "txt_quantile", "h_q21", "mm_jpeg",
          "sk_join", "cln_winsor", "e11_rankpct", "h_q18", "prof_corr",
          "h_q2", "txt_lm", "txt_tfidf", "ev_jstruct", "e11_rank", "h_q8",
          "gr_kcore", "h_q3", "smp_dsir", "h_q5", "gr_tri", "txt_vocab",
          "dd_chunk", "dd_keep", "agg_cms")
        def snap(): (Long, Long, Long, Long, Long, Long, Long) = {
          val (gc, gct) = Bench.gcStats()
          val (code, meta, jit, cls) = Bench.jitStats()
          val heap = (Runtime.getRuntime.totalMemory -
            Runtime.getRuntime.freeMemory) >> 20
          (gc, gct, code >> 20, meta >> 20, jit / 1000, cls, heap)
        }
        def runSentinels(tag: String): Unit = {
          sentinels.foreach { q =>
            val t = time(SparkEntry.queries(q)(spark, dir).count())
            val (gc, gct, code, meta, jit, cls, heap) = snap()
            r += s"${q}_$tag" -> t
            System.err.println(f"[probe] fatigue30x $q $tag wall=$t%.2f " +
              f"gcT=${gct / 1000.0}%.0fs heap=${heap}M code=${code}M " +
              f"meta=${meta}M jit=${jit}s cls=$cls")
          }
          val (_, gct, code, meta, jit, cls, heap) = snap()
          r += s"gct_$tag" -> gct / 1000.0
          r += s"heap_$tag" -> heap
          r += s"code_$tag" -> code
          r += s"meta_$tag" -> meta
          r += s"jit_$tag" -> jit
          r += s"cls_$tag" -> cls
        }
        // fresh baseline: two reps, record both (rep2 ≈ warm wall)
        runSentinels("fresh1")
        runSentinels("fresh2")
        for (round <- 1 to 6) {
          val bw = time {
            ballast.foreach { q =>
              try SparkEntry.queries(q)(spark, dir).count()
              catch { case _: Throwable => () }
            }
          }
          r += s"ballast_r$round" -> bw
          System.err.println(f"[probe] fatigue30x ballast round $round " +
            f"wall=$bw%.1fs")
          runSentinels(s"r$round")
        }
        out += "fatigue30x" -> r
      } else System.err.println("[probe] fatigue30x: /tmp/graft_sf3 missing")
    }

    // scale walk for the r12 expanding order statistic: runningQuantile's
    // state is O(distinct) per task and the data moves once — walls
    // should scale like the other expanding prefix ops (sublinear in
    // rows at fixed distinct domain, since the emit is O(n log d) work
    // across 32 cores and the exchange dominates)
    if (want("eqscale")) {
      val r = scala.collection.mutable.LinkedHashMap[String, Any]()
      for ((tag, dir) <- Seq("1x" -> "/root/testdata/sf0.1",
             "10x" -> "/tmp/graft_sf1", "30x" -> "/tmp/graft_sf3")
           if new java.io.File(s"$dir/lineitem.parquet").exists()) {
        QueryCatalog.wide(spark, dir).count()
        for (q <- Seq("e11_emed", "e11_eq", "e11_emean", "e11_ecov")) {
          val t = (1 to 2).map(_ =>
            time(SparkEntry.queries(q)(spark, dir).count())).min
          r += s"${q}_$tag" -> t
          System.err.println(f"[probe] eqscale $q $tag $t%.2f")
        }
      }
      out += "eqscale" -> r
    }

    // locale-safe shared emitter (r13 ADVICE — the f"%.3f" original was
    // locale-sensitive and its bare-number heuristic unsound)
    def js(v: Any): String = ProbeJson.js(v)
    val json = js(out)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

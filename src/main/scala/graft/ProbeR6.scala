package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 scale probes (VERDICT r5 asks #2/#6/#8):
  *
  *  - `cumsum`: the distributed-prefix formula methods at 1× vs 10× — the
  *    plan must scale with partitions, not serialize through one window
  *    task (the shape this round removed).
  *  - `setmat`: agg_setmat source-cardinality probe — wall must track the
  *    SOURCE pair count (sketch⊗sketch matrix), not the corpus: 100
  *    sources at 1× corpus vs 20 sources at 1×/10×/30× corpus.
  *  - `curate`: pipe_curate per-stage attribution at 10× vs 30× — which
  *    stage grows, and is any super-linear.
  *
  * Usage: runMain graft.ProbeR6 [outPath]. Expects /tmp/graft_sf1 (10×)
  * and /tmp/graft_sf3 (30×) from ScaleGen; builds /tmp/graft_src100
  * (sf0.1 documents with source remapped to 100 values) itself.
  */
object ProbeR6 {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  /** min of 3 passes — the host suffers transient CPU-steal storms */
  private def best(f: => Long): Double = (1 to 3).map(_ => time(f)).min

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SCALE_r6.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf1x = "/root/testdata/sf0.1"
    val sf10 = "/tmp/graft_sf1"
    val sf30 = "/tmp/graft_sf3"

    // ---- build the 100-source variant (same corpus, remapped source) ----
    val src100 = "/tmp/graft_src100"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$src100/documents.parquet"))) {
      spark.read.parquet(s"$sf1x/documents.parquet")
        .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(100))))
        .write.mode("overwrite").parquet(s"$src100/documents.parquet")
    }

    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def want(section: String): Boolean = only.forall(_.contains(section))

    // ---- r6 batching/chunking ops at 1x vs 10x vs 30x ----------------------
    if (want("newops")) {
      def batch(dir: String): Long =
        SparkEntry.queries("pack_batch")(spark, dir).count()
      def chunks(dir: String): Long =
        SparkEntry.queries("txt_chunks")(spark, dir).count()
      QueryCatalog.docs(spark, sf1x).count(); QueryCatalog.docs(spark, sf10).count()
      QueryCatalog.docs(spark, sf30).count()
      val b1 = best(batch(sf1x)); val b10 = best(batch(sf10)); val b30 = best(batch(sf30))
      val c1 = best(chunks(sf1x)); val c10 = best(chunks(sf10)); val c30 = best(chunks(sf30))
      out += "pack_batch" -> Map("t1x" -> b1, "t10x" -> b10, "t30x" -> b30,
        "ratio30x" -> b30 / b1)
      out += "txt_chunks" -> Map("t1x" -> c1, "t10x" -> c10, "t30x" -> c30,
        "ratio30x" -> c30 / c1)
      System.err.println(s"[probe] pack_batch 1x=$b1 10x=$b10 30x=$b30; " +
        s"txt_chunks 1x=$c1 10x=$c10 30x=$c30")
    }

    // ---- r6 wave-2 ops at 1x vs 10x (vs 30x with wave2x30) ----------------
    if (want("wave2") || want("wave2x30")) {
      val deep = want("wave2x30")
      def q(name: String)(dir: String): Long =
        SparkEntry.queries(name)(spark, dir).count()
      QueryCatalog.docs(spark, sf1x).count()
      QueryCatalog.docs(spark, sf10).count()
      if (deep) QueryCatalog.docs(spark, sf30).count()
      for (name <- Seq("txt_pmi", "prof_card", "smp_res", "cln_impute",
          "gr_cc", "txt_vocab", "smp_budget", "lay_hilbert", "gr_lpa")) {
        val t1 = best(q(name)(sf1x)); val t10 = best(q(name)(sf10))
        val m = scala.collection.mutable.LinkedHashMap[String, Any](
          "t1x" -> t1, "t10x" -> t10, "ratio" -> t10 / t1)
        if (deep) {
          val t30 = best(q(name)(sf30))
          m += "t30x" -> t30; m += "ratio30x" -> t30 / t1
        }
        out += name -> m
        System.err.println(s"[probe] $name 1x=$t1 10x=$t10" +
          (if (deep) s" 30x=${m("t30x")}" else ""))
      }
    }

    if (want("seq")) {
    // ---- cumsum/rank/shift 1x vs 10x ---------------------------------------
    def fq(f: String)(dir: String): Long =
      QueryCatalog.formulaQuery(f)(spark, dir).count()
    QueryCatalog.wide(spark, sf1x).count(); QueryCatalog.wide(spark, sf10).count()
    for ((name, f) <- Seq("cumsum" -> "qty.cumsum()", "rank" -> "qty.rank()",
        "shift" -> "qty.shift(2)", "diff" -> "qty.diff()")) {
      val t1 = best(fq(f)(sf1x)); val t10 = best(fq(f)(sf10))
      out += name -> Map("t1x" -> t1, "t10x" -> t10, "ratio" -> t10 / t1)
      System.err.println(s"[probe] $name 1x=$t1 10x=$t10")
    }
    }

    if (want("seqjobs")) {
      // per-JOB attribution of one shift/diff/cumsum execution at 10× —
      // which Spark job (bounds agg, offsets broadcast, donor broadcast,
      // main pass) carries the wall
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
      val jobs = scala.collection.mutable.LinkedHashMap[Int, (Long, String)]()
      val done = scala.collection.mutable.LinkedHashMap[Int, Long]()
      val stages = scala.collection.mutable.ArrayBuffer[String]()
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          jobs.synchronized { jobs(js.jobId) = (js.time, js.stageInfos.map(_.name).mkString("|").take(80)) }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          done.synchronized { done(je.jobId) = je.time }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
          stages.synchronized {
            val si = sc.stageInfo
            val wall = (for (a <- si.completionTime; b <- si.submissionTime)
              yield (a - b) / 1000.0).getOrElse(-1.0)
            val run = si.taskMetrics.executorRunTime / 1000.0
            if (wall > 0.02)
              stages += f"stage${si.stageId} ${wall}%.3fs run=${run}%.3fs tasks=${si.numTasks} ${si.name.take(60)}"
          }
      }
      QueryCatalog.wide(spark, sf10).count()
      for (f <- Seq("qty.cumsum()", "qty.shift(2)", "qty.diff()")) {
        QueryCatalog.formulaQuery(f)(spark, sf10).count() // warm
        jobs.clear(); done.clear(); stages.clear()
        spark.sparkContext.addSparkListener(l)
        val t = time(QueryCatalog.formulaQuery(f)(spark, sf10).count())
        spark.sparkContext.removeSparkListener(l)
        Thread.sleep(300)
        val rows = jobs.toSeq.sortBy(_._1).map { case (id, (t0, name)) =>
          val d = done.get(id).map(e => (e - t0) / 1000.0).getOrElse(-1.0)
          f"job$id%d ${d}%.3fs $name"
        }.filter(!_.contains(" 0.0"))
        System.err.println(s"[probe] $f total=$t\n  " + rows.mkString("\n  ") +
          "\n  " + stages.mkString("\n  "))
      }
    }

    if (want("setmat")) {
    // ---- agg_setmat source cardinality ------------------------------------
    def setmat(dir: String): Long = SparkEntry.queries("agg_setmat")(spark, dir).count()
    val s20_1 = best(setmat(sf1x))
    val s100_1 = best(setmat(src100))
    val s20_10 = best(setmat(sf10))
    val s20_30 = best(setmat(sf30))
    out += "setmat_sources" -> Map(
      "src20_corpus1x" -> s20_1, "src100_corpus1x" -> s100_1,
      "src20_corpus10x" -> s20_10, "src20_corpus30x" -> s20_30,
      "pairs_20" -> 190, "pairs_100" -> 4950,
      "src_ratio" -> s100_1 / s20_1, "corpus30x_ratio" -> s20_30 / s20_1)
    System.err.println(s"[probe] setmat 20src/1x=$s20_1 100src/1x=$s100_1 " +
      s"20src/10x=$s20_10 20src/30x=$s20_30")
    }

    if (want("curate")) {
    // ---- pipe_curate stage attribution at 10x vs 30x ----------------------
    def stages(dir: String): Map[String, Double] = {
      val dd = QueryCatalog.docs(spark, dir); dd.count() // warm the shared cache
      val tokenStats = () => operators.TextAnalysis.tokenStats(dd).count()
      val lang = () => dd.select(col("doc_id"),
        operators.TextAnalysis.langPred(col("text")).as("lp")).count()
      val pairs = () => QueryCatalog.pairs02(spark, dir).count()
      val groups = () => operators.Dedup.duplicateGroups(dd,
        QueryCatalog.pairs02(spark, dir).select("id1", "id2")).count()
      val full = () => SparkEntry.queries("pipe_curate")(spark, dir).count()
      scala.collection.immutable.ListMap(
        "tokenStats" -> best(tokenStats()),
        "langPred" -> best(lang()),
        "minhashPairs" -> best(pairs()),
        "dupGroups" -> best(groups()),
        "full" -> best(full()))
    }
    val st10 = stages(sf10); val st30 = stages(sf30)
    // the workload driver behind the dedup stages: key-shifted replication
    // duplicates every text across replicas, so the near-dup pair graph
    // grows ~quadratically in the replica count — stage wall must be
    // judged against EDGES, not docs
    val pairs10 = QueryCatalog.pairs02(spark, sf10).count()
    val pairs30 = QueryCatalog.pairs02(spark, sf30).count()
    out += "curate_stages" -> Map("t10x" -> st10, "t30x" -> st30,
      "ratios" -> st10.map { case (k, v) => k -> st30(k) / v },
      "pairs02_10x" -> pairs10.toInt, "pairs02_30x" -> pairs30.toInt,
      "edge_ratio" -> pairs30.toDouble / pairs10)
    System.err.println(s"[probe] curate 10x=$st10")
    System.err.println(s"[probe] curate 30x=$st30")
    }

    def js(v: Any): String = v match {
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => "\"" + k + "\":" + js(x) }.mkString("{", ",", "}")
      case d: Double => BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.toPlainString
      case i: Int => i.toString
      case s => "\"" + s + "\""
    }
    val json = js(out)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    System.err.println(s"[probe] written to $outPath")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: exactly (sfDir, outDir). Extra args are a local
    // convenience: run only the named queries (iteration speed).
    val Array(sfDir, outDir, only @ _*) = args: @unchecked
    // unified posture (r13): default to the host core count like Bench —
    // no evidence producer may default to a different local[N]
    val cpus = Bench.cpusPosture
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // tripwire: count silent whole-stage-codegen fallbacks (Janino 64 KB)
    // across the catalog — see [[graft.plans.CodegenFallbackCounter]]
    graft.plans.CodegenFallbackCounter.install()
    new java.io.File(outDir).mkdirs()
    // r13 (#8): audit every roundTo query's distance to its rounding
    // boundary during the dump — a future data change that parks a query
    // on a half-quantum (the e11_ecov class) surfaces HERE, not as a red
    // driver round. Margins land in quantum_margins.json (unit: quanta).
    System.setProperty("graft.audit.margins", "true")
    val margins = scala.collection.mutable.SortedMap[String, Double]()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only.toSet).toMap
    selected.foreach { case (name, fn) =>
      QueryCatalog.resetQuantumMargin()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        QueryCatalog.lastQuantumMargin.foreach(m => margins(name) = m)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (margins.nonEmpty) {
      val mj = margins.map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3e",
          Double.box(v))
      }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/quantum_margins.json"), mj)
      // two distinct classes: EXACT zero = a cell terminating exactly ON
      // the half boundary (deterministic iff both engines compute the
      // value exactly — the ewadj dyadic family, α=.5 over integer qty,
      // green for 12 rounds because the arithmetic is exact in both
      // engines); small-but-NONZERO = the e11_ecov coin-flip class,
      // where cross-engine ULP noise straddles the boundary.
      val (zeros, nz) = margins.partition(_._2 == 0.0)
      if (zeros.nonEmpty) System.err.println(
        s"[verify] quantum margins: ${zeros.size} queries carry cells " +
          s"terminating exactly ON the boundary (${zeros.keys.mkString(",")})" +
          " — deterministic only while both engines compute them exactly")
      if (nz.nonEmpty) {
        val (mq, mm) = nz.minBy(_._2)
        System.err.println(f"[verify] quantum margins: ${margins.size}%d " +
          f"rounded queries audited; min nonzero = $mm%.3e quanta ($mq)" +
          (if (mm < 1e-7) " — DANGEROUSLY close to a rounding boundary; " +
            "audit vs ULP and consider the ε-nudge protocol" else ""))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(sfDir.stripSuffix("/"))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val fallbacks = graft.plans.CodegenFallbackCounter.count.get()
    System.err.println(s"[verify] codegen compile failures: $fallbacks" +
      (if (fallbacks > 0) " — a stage ran INTERPRETED; grep stderr for" +
        " 'Failed to compile' and shrink the expression" else ""))
    spark.stop()
  }
}

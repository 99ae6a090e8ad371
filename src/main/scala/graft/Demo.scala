package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{CoefficientCalculator, FormulaEvaluator}
import graft.compile._
import graft.model._

/** End-to-end demo of the engine over the driver test data: builds matrices
  * from lineitem (pivot by linenumber), runs formulas through both the
  * single-query and batch APIs, prints results and the physical plan.
  * Usage: runMain graft.Demo [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // one wide base: quantities and prices by linenumber → two matrix views
    // sharing the base ⇒ formulas over them compile join-free
    val aggs =
      (1 to 4).map(j => sum(when(col("l_linenumber") === j, col("l_quantity")))
        .as(s"q$j")) ++
      (1 to 4).map(j => sum(when(col("l_linenumber") === j,
        col("l_extendedprice") / 1000.0)).as(s"e$j")) ++
      (1 to 4).map(j => (coalesce(sum(when(col("l_linenumber") === j,
        col("l_quantity"))), lit(0.0)) + 1.0).as(s"p$j"))
    val wide = li.groupBy(col("l_orderkey").as("__row_id__"))
      .agg(aggs.head, aggs.tail: _*)

    val labels = (1 to 4).map(j => s"c$j")
    val qty = Matrix(wide, "__row_id__", labels.zip((1 to 4).map(j => s"q$j")))
    val price = Matrix(wide, "__row_id__", labels.zip((1 to 4).map(j => s"e$j")))
    val pos = Matrix(wide, "__row_id__", labels.zip((1 to 4).map(j => s"p$j")))
    val weights = Vec(Seq(10.0, 20.0, 30.0, 40.0))

    val registry: Map[String, NamedData] =
      Map("qty" -> qty, "price" -> price, "pos" -> pos, "w" -> weights)

    println("== single query: (qty + price) / pos, fill_invalid=true ==")
    val ev = new FormulaEvaluator(registry, fillInvalid = true, verbose = true)
    val MatrixResult(df, rowId, lbls, _) =
      ev.evaluateFormula("(qty + price) / pos"): @unchecked
    df.orderBy(col(rowId)).show(5)
    println("== physical plan ==")
    df.explain("formatted")

    println("== vector broadcast: qty * w ==")
    ev.evaluateToDf("qty * w").orderBy(col(rowId)).show(3)

    println("== reduction: qty / qty.sum() ==")
    ev.evaluateToDf("qty / qty.sum()").orderBy(col(rowId)).show(3)

    println("== batch calculator (std + decimal) ==")
    val fmSchema = StructType(Seq(StructField("result_name", StringType),
      StructField("formula", StringType)))
    val fm = spark.createDataFrame(java.util.List.of(
      Row("ratio", "qty / pos"), Row("scaled", "qty * w"),
      Row("skipme", ""), Row("missing", "qty + nosuch"),
      Row("combo", "(qty + price) / pos + price")), fmSchema)
    val calc = new CoefficientCalculator(registry, fm,
      adpEnabled = false, fillInvalid = true)
    val out = calc.computeCoefficients()
    println(s"computed: ${out.keys.mkString(", ")}")
    out("combo") match {
      case MatrixResult(d, r, l, _) => d.orderBy(col(r)).show(3)
      case other => println(other)
    }

    println("== bucketed co-location: alignment join without Exchange ==")
    spark.sql("DROP TABLE IF EXISTS demo_bx")
    spark.sql("DROP TABLE IF EXISTS demo_by")
    graft.model.Ingest.writeBucketed(qty, "demo_bx", 8)
    graft.model.Ingest.writeBucketed(pos, "demo_by", 8)
    val bx = Matrix(spark.table("demo_bx"), "__row_id__",
      (1 to 4).map(j => (s"c$j", s"q$j")))
    val by = Matrix(spark.table("demo_by"), "__row_id__",
      (1 to 4).map(j => (s"c$j", s"p$j")))
    val evB = new FormulaEvaluator(
      Map[String, NamedData]("bx" -> bx, "by" -> by), fillInvalid = true)
    val MatrixResult(bdf, _, _, _) = evB.evaluateFormula("bx + by"): @unchecked
    val bplan = bdf.queryExecution.executedPlan.toString
    println(s"join without shuffle: ${!bplan.contains("Exchange")} " +
      s"(plan has SortMergeJoin: ${bplan.contains("SortMergeJoin")})")

    println("== S4 sink: persist all batch results ==")
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_results").toString
    calc.writeResults(out, sinkDir)
    println(s"wrote: ${new java.io.File(sinkDir).list().sorted.mkString(", ")}")
    spark.read.parquet(s"$sinkDir/ratio").orderBy(col("__row_id__")).show(2)

    val calcAdp = new CoefficientCalculator(registry, fm.filter(col("result_name") === "ratio"),
      adpEnabled = true, fillInvalid = true)
    val outAdp = calcAdp.computeCoefficients()
    outAdp("ratio") match {
      case MatrixResult(d, r, _, _) =>
        println(s"ADP result schema: ${d.schema.simpleString}")
        d.orderBy(col(r)).show(3)
      case other => println(other)
    }

    println("== unbounded ADP: BigDecimal cells, mpf extreme-magnitude regime ==")
    val ubpMat = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("__row_id__", LongType),
        StructField("c0", StringType)))
      graft.model.Matrix.of(spark.createDataFrame(java.util.List.of(
        Row(0L, "1e-30"), Row(1L, "1e30")), schema), "__row_id__", Seq("c0"))
    }
    val evUbp = new graft.api.FormulaEvaluator(
      Map("x" -> ubpMat), adpEnabled = true, decimalPrecision = 50,
      unboundedExponent = true)
    evUbp.evaluateFormula("x * x + x") match {
      case MatrixResult(d, r, _, _) =>
        println("x*x + x over {1e-30, 1e30} (exact, DecimalType can't hold either):")
        d.orderBy(col(r)).show(false)
      case other => println(other)
    }

    println("== pipeline operators: near-dup groups over documents ==")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ndPairs = graft.operators.Dedup.minhashLsh(docs, threshold = 0.2)
    val groups = graft.operators.Dedup.duplicateGroups(docs,
      ndPairs.select("id1", "id2"))
    val nGroups = groups.filter(col("id") =!= col("group_id")).count()
    println(s"docs folded into a smaller group: $nGroups")

    println("== as-of join: odd events pick up the latest even event ==")
    val evs = graft.QueryCatalog.eventsWithTu(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("tu"), col("value"))
    val aj = graft.operators.Joins.asofBackward(
      evs.filter(col("event_id") % 2 === 1),
      evs.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("tu"), col("value").as("r_value")),
      Seq("user_id"), "tu", payload = Seq("r_value"))
    aj.orderBy(col("event_id")).show(3)

    println("== custom TopKPerKey operator: top-2 orders per customer ==")
    val topk = graft.plans.TopKPerKey(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 2, rankCol = "rn")
    topk.select("o_custkey", "rn", "o_totalprice")
      .orderBy(col("o_custkey"), col("rn")).show(4)
    println("physical plan (partial heaps -> exchange -> final heaps, no sort):")
    topk.explain()

    println("== data layout: multi-dim min/max pruning, z-order vs hilbert vs 1-D sort ==")
    val pr = graft.operators.Layout.pruneStats(
      evs.select(col("user_id"), col("event_id")),
      "user_id", "event_id", bits = 8, fileShift = 8,
      boxNum = 1, boxDen = 10).head()
    println(s"10%-per-dim box over events: z layout keeps " +
      s"${pr.getAs[Long]("files_kept_z")}/${pr.getAs[Long]("n_files_z")} files " +
      s"(${pr.getAs[Long]("rows_kept_z")} rows scanned), hilbert " +
      s"${pr.getAs[Long]("files_kept_h")} files " +
      s"(${pr.getAs[Long]("rows_kept_h")} rows) vs 1-D sort " +
      s"${pr.getAs[Long]("files_kept_lin")}/${pr.getAs[Long]("n_files_lin")} files " +
      s"(${pr.getAs[Long]("rows_kept_lin")} rows) for " +
      s"${pr.getAs[Long]("rows_matching")} matching rows")

    println("== BPE merge induction: the corpus's first 3 tokenizer merges ==")
    graft.operators.TextAnalysis.bpeMerges(
      spark.read.parquet(s"$sfDir/documents.parquet"), rounds = 3)
      .orderBy(col("round")).show(3, truncate = false)

    println("== token-budget selection: longest-first fill of a 2k-token budget ==")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val bud = graft.operators.Sampling.tokenBudget(docs0,
      col("doc_id") - col("n_tokens") * lit(10000000L), "n_tokens", 2000L)
    // one job, null-safe: an empty selection (first doc alone over budget)
    // must print 0, not NPE on a NULL max
    val budStats = bud.agg(count(lit(1)).as("n"),
      coalesce(max(col("cum_tokens")), lit(0L)).as("used")).head()
    println(s"kept ${budStats.getLong(0)} docs, " +
      s"${budStats.getLong(1)} of 2000 tokens used " +
      "(running total = two-phase distributed prefix, no global window)")

    println("== r7: explicit matmul — a zero-shuffle column-space transform ==")
    val mmDemo = QueryCatalog.formulaQuery("qty.matmul(mm)")(spark, sfDir)
    mmDemo.show(3)
    println("physical plan (pure projection over the base — no join, no exchange):")
    mmDemo.explain()

    println("== r7: GIF89a codec roundtrip (variable-width LZW, pure JVM) ==")
    graft.operators.Multimodal.decodeGif(
        graft.operators.Multimodal.asGifTable(
          spark.read.parquet(s"$sfDir/documents.parquet").limit(3)))
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_r"), 3).as("mean_r"), round(col("mean_g"), 3).as("mean_g"))
      .show(3)

    spark.stop()
  }
}

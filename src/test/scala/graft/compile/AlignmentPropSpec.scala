package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.api.FormulaEvaluator
import graft.model.{Matrix, NamedData}

/** Property tests for the engine's core semantic: DataFrame⊗DataFrame
  * label alignment (SURVEY §2.3 A1 — full-outer on row ids, sorted label
  * union, NaN holes) checked against a driver-side reference
  * implementation over randomized fixtures. */
object AlignmentPropSpec extends Properties("Alignment") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20) // each case runs Spark jobs

  private lazy val spark = graft.SparkSpec.spark

  private val labelPool = Vector("c0", "c1", "c2", "c3", "c4")

  private case class Fix(rows: Map[Long, Map[String, Double]], labels: Seq[String])

  private val genFix: Gen[Fix] = for {
    nLabels <- Gen.choose(1, labelPool.length)
    labels <- Gen.pick(nLabels, labelPool).map(_.sorted.toSeq)
    ids <- Gen.someOf(0L until 8L).suchThat(_.nonEmpty)
    cells <- Gen.listOfN(ids.size * labels.size,
      Gen.oneOf(Gen.choose(-100.0, 100.0), Gen.oneOf(0.0, 1.0, -1.0)))
  } yield {
    val it = cells.iterator
    Fix(ids.map(id => id -> labels.map(l => l -> it.next()).toMap).toMap, labels)
  }

  private def toMatrix(f: Fix): Matrix = {
    val schema = StructType(StructField("__row_id__", LongType) +:
      f.labels.map(l => StructField(l, DoubleType)))
    val data = f.rows.toSeq.sortBy(_._1).map { case (id, m) =>
      Row.fromSeq(id +: f.labels.map(m))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
    Matrix.of(df, "__row_id__", f.labels)
  }

  /** Driver-side reference semantics: sorted label union, id union, NaN
    * for any missing (id, label) cell, IEEE arithmetic. */
  private def expected(a: Fix, b: Fix, op: (Double, Double) => Double)
      : Map[Long, Map[String, Double]] = {
    val labels = (a.labels ++ b.labels).distinct.sorted
    val ids = (a.rows.keySet ++ b.rows.keySet)
    def cell(f: Fix, id: Long, l: String): Double =
      f.rows.get(id).flatMap(_.get(l)).getOrElse(Double.NaN)
    ids.map(id => id -> labels.map(l =>
      l -> op(cell(a, id, l), cell(b, id, l))).toMap).toMap
  }

  private def sameCell(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || x == y ||
      (y != 0 && math.abs(x - y) / math.abs(y) < 1e-12)

  private val ops: Seq[(String, (Double, Double) => Double)] = Seq(
    ("+", _ + _), ("-", _ - _), ("*", _ * _), ("/", _ / _))

  property("a OP b aligns like the reference for random shapes") =
    Prop.forAll(genFix, genFix, Gen.oneOf(ops)) { case (fa, fb, (opStr, opFn)) =>
      val ev = new FormulaEvaluator(
        Map[String, NamedData]("a" -> toMatrix(fa), "b" -> toMatrix(fb)))
      val MatrixResult(df, rowId, labels, _) =
        ev.evaluateRaw(s"a $opStr b"): @unchecked
      val exp = expected(fa, fb, opFn)
      val expLabels = (fa.labels ++ fb.labels).distinct.sorted
      val got = df.collect().map { r =>
        r.getLong(r.fieldIndex(rowId)) -> labels.map { l =>
          val i = r.fieldIndex(l)
          l -> (if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
        }.toMap
      }.toMap
      val labelsOk = labels == expLabels
      val idsOk = got.keySet == exp.keySet
      val cellsOk = labelsOk && idsOk && exp.forall { case (id, m) =>
        m.forall { case (l, v) => sameCell(got(id)(l), v) }
      }
      Prop(cellsOk) :| s"op=$opStr labels=$labels (want $expLabels) " +
        s"ids=${got.keySet} (want ${exp.keySet})"
    }

  property("duplicateGroups = brute-force connected components") = {
    val genEdges = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(0, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges.distinct)
    Prop.forAll(genEdges) { case (n, edges) =>
      // driver truth: min-id connected components
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      def comp(start: Long): Set[Long] = {
        var seen = Set(start); var frontier = List(start)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
            .filterNot(seen)
          seen ++= next; frontier = next
        }
        seen
      }
      val want = (0L until n).map(v => v -> comp(v).min).toMap
      import scala.jdk.CollectionConverters._
      val docs = spark.createDataFrame(
        (0L until n).map(Row(_)).asJava,
        StructType(Seq(StructField("doc_id", LongType))))
      val pairs = spark.createDataFrame(
        (if (edges.isEmpty) Seq.empty[Row]
         else edges.map { case (a, b) => Row(a, b) }).asJava,
        StructType(Seq(StructField("id1", LongType), StructField("id2", LongType))))
      val got = graft.operators.Dedup.duplicateGroups(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the DISTRIBUTED path (forced via driverMaxPairs = 0) must agree —
      // this is the r13 edge-contracting label-propagation loop, fuzzed
      // against the same brute-force components (cliques, chains, forests
      // all arise from the generator)
      val gotLpa = graft.operators.Dedup.duplicateGroups(docs, pairs,
          driverMaxPairs = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == want && gotLpa == want) :|
        s"edges=$edges got=$got lpa=$gotLpa want=$want"
    }
  }
}

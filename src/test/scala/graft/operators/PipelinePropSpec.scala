package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the round-4 pipeline operators against brute-force
  * driver references over randomized fixtures: repetition stats,
  * contamination, mixture targeting, bigram-LM scoring, and the k-means
  * assignment invariant. */
object PipelinePropSpec extends Properties("Pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = graft.SparkSpec.spark
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docsDf(texts: List[String]) = spark.createDataFrame(
    texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
    docSchema)

  // small vocab => plenty of repetition/overlap in generated docs
  private val genDoc: Gen[String] = for {
    n <- Gen.choose(1, 14)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "ba", "x"))
  } yield ws.mkString(" ")

  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genDoc))

  // ---- repetition stats ----

  property("repetitionStats = brute force") = Prop.forAll(genCorpus) { texts =>
    val got = TextAnalysis.repetitionStats(docsDf(texts)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    def round6(x: Double) = math.rint(x * 1e6) / 1e6
    val want = texts.zipWithIndex.map { case (t, i) =>
      val w = t.split(" ", -1)
      val n = w.length
      val wc = w.groupBy(identity).view.mapValues(_.length)
      val dupW = wc.values.filter(_ > 1).sum.toLong
      val bgs = w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val bc = bgs.groupBy(identity).view.mapValues(_.length)
      val nBg = bgs.length.toLong
      val topB = if (bc.isEmpty) 0L else bc.values.max.toLong
      val dupB = bc.values.filter(_ > 1).sum.toLong
      i.toLong -> ((n.toLong, nBg,
        round6(if (n > 0) dupW.toDouble / n else 0.0),
        round6(if (nBg > 0) topB.toDouble / nBg else 0.0),
        round6(if (nBg > 0) dupB.toDouble / nBg else 0.0)))
    }.toMap
    Prop(got == want) :| s"got=$got want=$want texts=$texts"
  }

  // ---- contamination ----

  property("contamination = brute-force n-gram set overlap") =
    Prop.forAll(genCorpus, genCorpus) { (corpusTexts, benchTexts) =>
      def ngrams(t: String): Set[String] = {
        val w = t.split(" ", -1)
        if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
        else Set(t)
      }
      val benchSet = benchTexts.flatMap(ngrams).toSet
      val corpus = docsDf(corpusTexts)
      val bench = spark.createDataFrame(
        benchTexts.zipWithIndex.map { case (t, i) =>
          Row(1000L + i, t) }.asJava, docSchema)
      val got = Dedup.contamination(corpus, bench).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(4)))).toMap
      val want = corpusTexts.zipWithIndex.map { case (t, i) =>
        val ng = ngrams(t)
        val m = ng.count(benchSet)
        i.toLong -> ((ng.size.toLong, m.toLong,
          m.toDouble / ng.size >= 0.5))
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }

  // ---- mixture targeting ----

  private val genStrata: Gen[Map[String, Int]] = for {
    ks <- Gen.someOf(Seq("a", "b", "c", "d")).suchThat(_.nonEmpty)
    ns <- Gen.listOfN(ks.size, Gen.choose(1, 30))
  } yield ks.zip(ns).toMap

  property("mixture: binding stratum kept whole, others downscaled to target") =
    Prop.forAll(genStrata) { strata =>
      val weights = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2) // d unlisted
      val rows = strata.toSeq.flatMap { case (s, n) =>
        (0 until n).map(i => (s, s.hashCode.toLong * 1000 + i))
      }
      val df = spark.createDataFrame(
        rows.map { case (s, id) => Row(id, s) }.asJava,
        StructType(Seq(StructField("doc_id", LongType),
          StructField("source", StringType))))
      val kept = Sampling.mixture(df, "source", "doc_id", weights).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val keptBy = kept.groupBy(_._1).view.mapValues(_.size).toMap
      val present = strata.filter { case (s, _) => weights.contains(s) }
      val ok =
        if (present.isEmpty) Prop(kept.isEmpty)
        else {
          val cap = present.map { case (s, n) => n / weights(s) }.min
          val binding = present.minBy { case (s, n) => n / weights(s) }._1
          Prop(keptBy.getOrElse(binding, 0) == present(binding)) :| s"binding $binding whole" &&
            Prop(!keptBy.contains("d")) :| "unlisted dropped" &&
            Prop(present.forall { case (s, n) => keptBy.getOrElse(s, 0) <= n }) :| "subset" &&
            // expected kept_s = cap*w_s; hash sampling deviates ~binomially.
            // bound loose enough to be deterministic-noise-proof
            Prop(present.forall { case (s, n) =>
              math.abs(keptBy.getOrElse(s, 0) - cap * weights(s)) <=
                math.max(4.0, 0.5 * n)
            }) :| s"proportions $keptBy cap=$cap"
        }
      ok :| s"strata=$strata keptBy=$keptBy"
    }

  // ---- bigram LM ----

  property("bigramLogProb = brute-force corpus MLE (1e-6 tolerance)") =
    Prop.forAll(genCorpus) { texts =>
      val toks = texts.map(_.split(" ", -1).toSeq)
      val bgs = toks.flatMap(w => w.sliding(2).filter(_.length == 2)
        .map(p => (p.head, p.mkString(" "))))
      val cBg = bgs.groupBy(_._2).view.mapValues(_.size).toMap
      val cW1 = bgs.groupBy(_._1).view.mapValues(_.size).toMap
      val want = toks.zipWithIndex.flatMap { case (w, i) =>
        val docBgs = w.sliding(2).filter(_.length == 2)
          .map(p => (p.head, p.mkString(" "))).toSeq
        if (docBgs.isEmpty) None
        else {
          val lps = docBgs.map { case (w1, bg) =>
            val lp = math.log(cBg(bg).toDouble / cW1(w1).toDouble)
            BigDecimal(lp).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          }
          Some(i.toLong -> ((docBgs.size.toLong,
            (lps.sum / docBgs.size).toDouble)))
        }
      }.toMap
      val got = TextAnalysis.bigramLogProb(docsDf(texts)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val ok = got.keySet == want.keySet && want.forall { case (id, (n, s)) =>
        got(id)._1 == n && math.abs(got(id)._2 - s) <= 1e-6
      }
      Prop(ok) :| s"got=$got want=$want texts=$texts"
    }

  // ---- k-means assignment invariant ----

  private val genVecs: Gen[List[Seq[Float]]] = for {
    n <- Gen.choose(2, 12)
    vs <- Gen.listOfN(n, Gen.listOfN(4,
      Gen.choose(-2.0f, 2.0f)).map(_.toSeq))
  } yield vs

  property("kmeans: every assignment is the argmin against returned centroids") =
    Prop.forAll(genVecs, Gen.choose(1, 3)) { (vs, k) =>
      val df = spark.createDataFrame(
        vs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }.asJava,
        StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
      val (asgDf, cents) = Similarity.kmeans(df, k, iters = 2)
      val asg = asgDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      def score(v: Seq[Float], c: Seq[Double]): Double = {
        var n2 = java.math.BigDecimal.ZERO
        c.foreach(x => n2 = n2.add(java.math.BigDecimal.valueOf(x * x)))
        var dot = java.math.BigDecimal.ZERO
        v.zip(c).foreach { case (x, y) =>
          dot = dot.add(java.math.BigDecimal.valueOf(x.toDouble * y)) }
        val raw = n2.doubleValue() - 2.0 * dot.doubleValue()
        BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val ok = vs.zipWithIndex.forall { case (v, i) =>
        val best = cents.toSeq.sortBy(_._1)
          .minBy { case (cell, c) => (score(v, c), cell) }._1
        asg(i.toLong) == best
      }
      Prop(ok && asg.size == vs.size) :| s"asg=$asg cents=${cents.keySet}"
    }
}

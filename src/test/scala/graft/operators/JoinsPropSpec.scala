package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the as-of join family and the range join against
  * brute-force driver references over randomized fixtures — including the
  * duplicate-timestamp, empty-right-side, and tie cases a single oracle
  * fixture can't sweep. */
object JoinsPropSpec extends Properties("Joins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = graft.SparkSpec.spark
  import scala.jdk.CollectionConverters._

  private case class L(key: Long, ts: Long, lid: Long)
  private case class R(key: Long, ts: Long, v: Double, rid: Long)

  private val genFixture: Gen[(List[L], List[R])] = for {
    nKeys <- Gen.choose(1, 3)
    nl <- Gen.choose(1, 12)
    nr <- Gen.choose(0, 12) // right side may be EMPTY
    ls <- Gen.listOfN(nl, for {
      k <- Gen.choose(0L, nKeys - 1L); t <- Gen.choose(0L, 20L)
    } yield (k, t))
    rs <- Gen.listOfN(nr, for {
      k <- Gen.choose(0L, nKeys - 1L); t <- Gen.choose(0L, 20L)
      v <- Gen.choose(-10.0, 10.0)
    } yield (k, t, v))
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => L(k, t, i.toLong) },
    rs.zipWithIndex.map { case ((k, t, v), i) => R(k, t, v, i.toLong) })

  private def leftDf(ls: List[L]) = spark.createDataFrame(
    ls.map(l => Row(l.key, l.ts, l.lid)).asJava,
    StructType(Seq(StructField("key", LongType), StructField("ts", LongType),
      StructField("lid", LongType))))

  private def rightDf(rs: List[R]) = spark.createDataFrame(
    rs.map(r => Row(r.key, r.ts, r.v, r.rid)).asJava,
    StructType(Seq(StructField("key", LongType), StructField("ts", LongType),
      StructField("v", DoubleType), StructField("rid", LongType))))

  private def collectJoin(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.collect().map { r =>
      r.getLong(r.fieldIndex("lid")) ->
        (if (r.isNullAt(r.fieldIndex("rid"))) None
         else Some(r.getLong(r.fieldIndex("rid"))))
    }.toMap

  property("asofBackward = brute force (latest <= ts; rid-max tiebreak)") =
    Prop.forAll(genFixture) { case (ls, rs) =>
      val got = collectJoin(Joins.asofBackward(leftDf(ls), rightDf(rs),
        Seq("key"), "ts", payload = Seq("v", "rid"),
        tieBreak = Some("rid")))
      val want = ls.map { l =>
        val cands = rs.filter(r => r.key == l.key && r.ts <= l.ts)
        l.lid -> (if (cands.isEmpty) None
                  else Some(cands.maxBy(r => (r.ts, r.rid)).rid))
      }.toMap
      Prop(got == want) :| s"got=$got want=$want ls=$ls rs=$rs"
    }

  property("asofForward = brute force (earliest >= ts; rid-min tiebreak)") =
    Prop.forAll(genFixture) { case (ls, rs) =>
      val got = collectJoin(Joins.asofForward(leftDf(ls), rightDf(rs),
        Seq("key"), "ts", payload = Seq("v", "rid"),
        tieBreak = Some("rid")))
      val want = ls.map { l =>
        val cands = rs.filter(r => r.key == l.key && r.ts >= l.ts)
        l.lid -> (if (cands.isEmpty) None
                  else Some(cands.minBy(r => (r.ts, r.rid)).rid))
      }.toMap
      Prop(got == want) :| s"got=$got want=$want ls=$ls rs=$rs"
    }

  property("asofNearest = brute force (min |dt|, backward wins ties)") =
    Prop.forAll(genFixture) { case (ls, rs) =>
      val got = collectJoin(Joins.asofNearest(leftDf(ls), rightDf(rs),
        Seq("key"), "ts", payload = Seq("v", "rid"),
        tieBreak = Some("rid")))
      val want = ls.map { l =>
        val cands = rs.filter(_.key == l.key)
        l.lid -> (if (cands.isEmpty) None
        else {
          val minD = cands.map(r => math.abs(r.ts - l.ts)).min
          val near = cands.filter(r => math.abs(r.ts - l.ts) == minD)
          val bwd = near.filter(_.ts <= l.ts)
          // backward wins ties; tiebreak within a side follows the window
          // order (ts asc, rid asc → backward takes last, forward first)
          val side = if (bwd.nonEmpty) bwd else near
          Some(if (side.exists(_.ts <= l.ts)) side.maxBy(r => (r.ts, r.rid)).rid
               else side.minBy(r => (r.ts, r.rid)).rid)
        })
      }.toMap
      Prop(got == want) :| s"got=$got want=$want ls=$ls rs=$rs"
    }

  property("pointInInterval = brute force, any bucket width") = {
    val genIv = for {
      n <- Gen.choose(0, 8)
      ivs <- Gen.listOfN(n, for {
        lo <- Gen.choose(0.0, 50.0); w <- Gen.choose(0.0, 20.0)
      } yield (lo, lo + w))
      pts <- Gen.listOfN(12, Gen.choose(-5.0, 75.0))
      bw <- Gen.oneOf(0.5, 1.0, 7.3)
    } yield (ivs, pts, bw)
    Prop.forAll(genIv) { case (ivs, pts, bw) =>
      val pDf = spark.createDataFrame(
        pts.zipWithIndex.map { case (p, i) => Row(i.toLong, p) }.asJava,
        StructType(Seq(StructField("pid", LongType), StructField("p", DoubleType))))
      val iDf = spark.createDataFrame(
        ivs.zipWithIndex.map { case ((lo, hi), i) => Row(i.toLong, lo, hi) }.asJava,
        StructType(Seq(StructField("iid", LongType),
          StructField("lo", DoubleType), StructField("hi", DoubleType))))
      val got = Joins.pointInInterval(pDf, "p", iDf, "lo", "hi", bw)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (p, pi) <- pts.zipWithIndex
        ((lo, hi), ii) <- ivs.zipWithIndex
        if p >= lo && p < hi
      } yield (pi.toLong, ii.toLong)).toSet
      Prop(got == want) :| s"bw=$bw got=$got want=$want"
    }
  }

  property("intervalOverlap = brute force; each pair exactly once") = {
    val genIv = for {
      nl <- Gen.choose(0, 8)
      nr <- Gen.choose(0, 8)
      ls <- Gen.listOfN(nl, for {
        lo <- Gen.choose(0.0, 40.0); w <- Gen.choose(0.0, 15.0)
      } yield (lo, lo + w))
      rs <- Gen.listOfN(nr, for {
        lo <- Gen.choose(0.0, 40.0); w <- Gen.choose(0.0, 15.0)
      } yield (lo, lo + w))
      bw <- Gen.oneOf(0.5, 2.0, 9.7)
    } yield (ls, rs, bw)
    Prop.forAll(genIv) { case (ls, rs, bw) =>
      def df(xs: List[(Double, Double)], id: String, lo: String, hi: String) =
        spark.createDataFrame(
          xs.zipWithIndex.map { case ((l, h), i) => Row(i.toLong, l, h) }.asJava,
          StructType(Seq(StructField(id, LongType),
            StructField(lo, DoubleType), StructField(hi, DoubleType))))
      val out = Joins.intervalOverlap(
          df(ls, "lid2", "llo", "lhi"), "llo", "lhi",
          df(rs, "rid2", "rlo", "rhi"), "rlo", "rhi", bw)
        .select("lid2", "rid2").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val want = (for {
        ((llo, lhi), li) <- ls.zipWithIndex
        ((rlo, rhi), ri) <- rs.zipWithIndex
        if llo <= rhi && rlo <= lhi
      } yield (li.toLong, ri.toLong)).toSet
      // set equality AND no duplicate emissions across shared buckets
      Prop(out.toSet == want && out.length == want.size) :|
        s"bw=$bw out=${out.toList} want=$want"
    }
  }
}

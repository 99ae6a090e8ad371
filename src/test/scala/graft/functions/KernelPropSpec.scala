package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the r8 compiled kernels — pure JVM, no Spark
  * session needed: the quantile slice bucket (monotonicity, bounds,
  * equi-height) and the per-row span-dedup kernel against a naive
  * driver reference with independently-computed fingerprints. */
object KernelPropSpec extends Properties("Kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  // ---- QuantileBucket ----------------------------------------------------

  private val genKey: Gen[(Double, Long, Long)] = for {
    o <- Gen.frequency(8 -> Gen.choose(-1000.0, 1000.0),
      2 -> Gen.oneOf(0.0, 1.0, -1.0)) // force order-value ties
    v <- Gen.frequency(7 -> Gen.const(0L), // the common constant surrogate
      3 -> Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
    t <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
  } yield (o, v, t)

  private def sampleArr(keys: Seq[(Double, Long, Long)]): GenericArrayData =
    new GenericArrayData(keys.sorted.map { case (o, v, t) =>
      InternalRow(o, v, t) }.toArray[Any])

  property("bucket is monotone in the composite key and within [0, parts)") =
    Prop.forAll(Gen.listOfN(50, genKey), Gen.listOfN(30, genKey),
      Gen.choose(2, 64)) { (sample, probes, parts) =>
      val arr = sampleArr(sample)
      val buckets = probes.sorted.map { case (o, v, t) =>
        GraftVec.quantileBucket(arr, o, v, t, parts)
      }
      buckets == buckets.sorted &&
        buckets.forall(b => b >= 0 && b < parts)
    }

  property("bucket of every sample element spreads ~equi-height") =
    Prop.forAll(Gen.listOfN(64, genKey)) { sample0 =>
      val sample = sample0.distinct
      val parts = 8
      val arr = sampleArr(sample)
      val counts = sample.groupBy { case (o, v, t) =>
        GraftVec.quantileBucket(arr, o, v, t, parts) }.view.mapValues(_.size)
      // with n distinct sample points over 8 buckets, no bucket may hold
      // more than ceil(n/8) + 1 of the sample's own points
      counts.values.forall(_ <= sample.size / parts + 2)
    }

  property("empty sample is always bucket 0") =
    Prop.forAll(genKey) { case (o, v, t) =>
      GraftVec.quantileBucket(new GenericArrayData(Array.empty[Any]), o, v, t,
        32) == 0
    }

  // ---- SpanRefStats ------------------------------------------------------

  private val genTok: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e", "zz")
  private val genDoc: Gen[List[String]] = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, genTok))

  private def hash(tok: String): Long =
    GraftHash.md5Long60(UTF8String.fromString("0:" + tok)) % 1099511627776L

  /** independent naive fingerprint of the k-window at start p. */
  private def fp(toks: List[String], p: Int, k: Int): (Long, Long) = {
    val h = toks.slice(p, p + k).map(hash)
    val s0 = h.sum
    val s1 = h.zipWithIndex.map { case (x, j) => x * (p + j + 1) }.sum
    (s1 - p.toLong * s0, s0)
  }

  property("span kernel equals the naive reference on random docs") =
    Prop.forAll(genDoc, genDoc, Gen.choose(2, 6)) { (doc, refDoc, k) =>
      val refFps = (0 to refDoc.length - k).map(p => fp(refDoc, p, k)).toSet
      val packed = refFps.toArray.flatMap { case (f1, f0) => Array(f1, f0) }
      val expr = SpanRefStats(
        org.apache.spark.sql.catalyst.expressions.Literal(null), k, packed)
      val arr = new GenericArrayData(
        doc.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = expr.compute(arr)
      // naive reference on the target doc
      val nWin = math.max(0, doc.length - k + 1)
      val dup = (0 until nWin).map(p => refFps.contains(fp(doc, p, k)))
      val covered = doc.indices.map(p =>
        (math.max(0, p - k + 1) to math.min(nWin - 1, p)).exists(s => dup(s)))
      val clean = doc.zip(covered).collect { case (t, false) => t }.mkString(" ")
      got.getLong(0) == nWin &&
        got.getLong(1) == dup.count(identity) &&
        got.getLong(2) == covered.count(identity) &&
        got.getUTF8String(3).toString == clean
    }
}

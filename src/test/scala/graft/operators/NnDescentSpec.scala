package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r10: NN-Descent kNN-graph refinement. The property that matters: the
  * BLOCKED seed graph is block-closed, so a true nearest neighbor living
  * in another block is unreachable by pure neighbor-of-neighbor steps —
  * descent must find it through the deterministic hash-rank exploration
  * edges, and the whole trajectory must be reproducible run to run (the
  * oracle hash-checks the exact lists at sf0.01; this spec pins the
  * structural claims on a constructed corpus). */
class NnDescentSpec extends SparkSpec {

  private def corpus() = {
    // two tight clusters of 4 near-identical vectors each, split ACROSS
    // blocks (2 members per block), plus 12 noise vectors — a node's
    // true top-3 includes cluster-mates in the OTHER block
    val dim = 64
    def vec(base: Double, j: Int): Seq[Float] =
      (0 until dim).map(i =>
        (math.sin(base + i) + 0.001 * j).toFloat)
    val rows =
      (0 until 4).map(j => Row(j.toLong, s"b${j % 2}", vec(1.0, j))) ++
      (4 until 8).map(j => Row(j.toLong, s"b${j % 2}", vec(2.0, j))) ++
      (8 until 20).map(j => Row(j.toLong, s"b${j % 2}", vec(10.0 + j, 0)))
    spark.createDataFrame(
      java.util.List.of(rows: _*),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("label", StringType),
        StructField("embedding", ArrayType(FloatType)))))
  }

  test("descent reaches cross-block true neighbors the seed cannot") {
    val e = corpus()
    val seed = Similarity.knnGraph(e, "label", k = 3, threshold = 0.25)
    val refined = Similarity.nnDescent(e, "label", k = 3, rounds = 3,
      seedThreshold = 0.25)
    // node 0's cluster is {0, 1, 2, 3}; blocks split it as b0 = {0, 2},
    // b1 = {1, 3} — so its true neighbors 1 and 3 live in the OTHER
    // block and are invisible to the blocked seed
    val seed0 = seed.where(col("id") === 0).select("nbr")
      .collect().map(_.getLong(0)).toSet
    assert(!seed0.contains(1L) && !seed0.contains(3L),
      s"seed is blocked, must not see cross-block neighbors: $seed0")
    val ref0 = refined.where(col("id") === 0).select("nbr")
      .collect().map(_.getLong(0)).toSet
    assert(ref0 == Set(1L, 2L, 3L),
      s"descent must recover the full true top-3 of node 0, got $ref0")
  }

  test("ρ-sampling (sampleDeg) still recovers the cross-block cluster " +
      "and stays deterministic") {
    val e = corpus()
    def run() = Similarity.nnDescent(e, "label", k = 3, rounds = 4,
        seedThreshold = 0.25, sampleDeg = 4)
      .orderBy(col("id"), col("sim").desc, col("nbr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val a = run()
    assert(a.sameElements(run()), "sampled runs must be identical")
    // sampling is a disclosed candidate-volume/recall trade: it must
    // still ESCAPE the block (find cross-block cluster mates the seed
    // cannot) even if the full top-3 takes more rounds than unsampled
    val ref0 = a.filter(_._1 == 0L).map(_._2).toSet
    assert((ref0 & Set(1L, 3L)).nonEmpty && ref0.contains(2L),
      s"sampled descent must reach cross-block cluster mates, got $ref0")
  }

  test("auto ρ-sampling (r11): the default enables sampling above the " +
      "corpus threshold, stays exact below it, and sampleDeg = -1 " +
      "forces the full expansion") {
    val e = corpus()
    def run(deg: Int) = Similarity.nnDescent(e, "label", k = 3, rounds = 3,
        seedThreshold = 0.25, sampleDeg = deg)
      .orderBy(col("id"), col("sim").desc, col("nbr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 20-vector corpus, threshold default 100k (the measured top of the
    // unsampled-linear band, PROBE_r10): auto (0) == full (-1)
    assert(run(0).sameElements(run(-1)),
      "below the threshold the auto default must be the exact expansion")
    // force the threshold below the corpus: auto must now equal the
    // explicit autoSampleDeg run (the scale-safe path is the default)
    spark.conf.set("graft.nnd.sampleAboveCorpus", "10")
    spark.conf.set("graft.nnd.autoSampleDeg", "4")
    try assert(run(0).sameElements(run(4)),
      "above the threshold the auto default must ρ-sample at autoSampleDeg")
    finally {
      spark.conf.unset("graft.nnd.sampleAboveCorpus")
      spark.conf.unset("graft.nnd.autoSampleDeg")
    }
  }

  test("the trajectory is deterministic and k-bounded") {
    val e = corpus()
    def run() = Similarity.nnDescent(e, "label", k = 3, rounds = 2,
        seedThreshold = 0.25)
      .orderBy(col("id"), col("sim").desc, col("nbr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val a = run(); val b = run()
    assert(a.sameElements(b), "two runs must produce identical lists")
    val perNode = a.groupBy(_._1).map(_._2.length)
    assert(perNode.forall(_ <= 3), "lists must stay k-bounded")
  }
}

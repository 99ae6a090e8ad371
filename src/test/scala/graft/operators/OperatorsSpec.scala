package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline-operator tests: dedup, similarity, text analysis, multimodal. */
class OperatorsSpec extends SparkSpec {

  private lazy val docs = {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
      (2L, "completely different content about spark engines and data"),
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (4L, "el perro que corre es rapido y la casa es grande"),
      (5L, "12 34 56 apples, oranges; and 7 bananas!"))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        rows.map { case (i, t) => Row(i, t) }).asJava), schema)
  }

  private lazy val embsDf = {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType)))
    val rng = new scala.util.Random(7)
    val base = Array.fill(8)(rng.nextFloat() - 0.5f)
    def jitter(eps: Float) = base.map(v => v + eps * (rng.nextFloat() - 0.5f))
    val rows = Seq(
      Row(0L, base.toSeq, 0), Row(1L, jitter(0.01f).toSeq, 0), // near-dup pair
      Row(2L, Array.fill(8)(rng.nextFloat() - 0.5f).toSeq, 0),
      Row(3L, Array.fill(8)(rng.nextFloat() - 0.5f).toSeq, 1))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 5) // 6 docs, one exact dup
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 0L) // keep min id
  }

  test("kmeans separates two far-apart blobs; deterministic under repartition") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rng = new scala.util.Random(11)
    def near(center: Float) =
      Seq.fill(8)(center + 0.05f * (rng.nextFloat() - 0.5f))
    // ids 0/1 seed the two initial centroids, one from each blob
    val rows = Seq(
      Row(0L, near(1f)), Row(1L, near(-1f)), Row(2L, near(1f)),
      Row(3L, near(-1f)), Row(4L, near(1f)), Row(5L, near(-1f)),
      Row(6L, near(1f)), Row(7L, near(-1f)))
    val embs = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val (asg, cents) = Similarity.kmeans(embs, k = 2, iters = 2)
    val byCell = asg.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(0L, 2L, 4L, 6L).map(byCell) == Set(byCell(0L)), s"$byCell")
    assert(Set(1L, 3L, 5L, 7L).map(byCell) == Set(byCell(1L)), s"$byCell")
    assert(byCell(0L) != byCell(1L), s"$byCell")
    assert(cents.size == 2 && cents.values.forall(_.length == 8))
    // centroid of the +1 blob sits near +1 on every dim
    assert(cents(byCell(0L)).forall(v => v > 0.9 && v < 1.1), cents.toString)
    val (asg2, _) = Similarity.kmeans(embs.repartition(5), k = 2, iters = 2)
    assert(asg2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap == byCell)
  }

  test("pca1 finds the dominant variance direction; deterministic under " +
      "repartition") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rng = new scala.util.Random(7)
    // variance concentrated along axis 0 (±1), noise ~0.05 elsewhere
    val rows = (0L until 40L).map { id =>
      val main = if (id % 2 == 0) 1f else -1f
      Row(id, (main +: Seq.fill(7)(0.05f * (rng.nextFloat() - 0.5f))).toSeq)
    }
    val embs = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val (proj, v) = Similarity.pca1(embs, iters = 2)
    // unit component dominated by axis 0
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, v.toString)
    assert(math.abs(v.head) > 0.99, v.toString)
    // projections split by sign with the parity of the fixture
    val byId = proj.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s0 = math.signum(byId(0L))
    (0L until 40L).foreach { id =>
      val expect = if (id % 2 == 0) s0 else -s0
      assert(math.signum(byId(id)) == expect, s"id=$id ${byId(id)}")
    }
    // bit-identical under repartition (decimal sums are order-free)
    val (proj2, v2) = Similarity.pca1(embs.repartition(7), iters = 2)
    assert(v2 == v)
    assert(proj2.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap == byId)
  }

  test("knn graph: symmetric edges, at most k neighbors, best-first") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rng = new scala.util.Random(17)
    def near(center: Float) =
      Seq.fill(8)(center + 0.05f * (rng.nextFloat() - 0.5f))
    // one block, 4 close vectors + 1 anti-correlated outlier
    val rows = (0L until 4L).map(i => Row(i, near(1f), 0)) :+
      Row(4L, near(-1f), 0)
    val embs = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val got = Similarity.knnGraph(embs, "label", k = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = got.groupBy(_._1)
    assert(!byId.contains(4L), "outlier below threshold has no neighbors")
    assert((0L until 4L).forall(i => byId(i).length == 2), s"$byId")
    // symmetry of the underlying pair set: i->j implies j has an edge to i
    // unless j's top-k is full of better neighbors; with 4 equi-close
    // vectors and k=2 each id appears as a neighbor somewhere
    val nbrs = got.map(_._2).toSet
    assert(nbrs == Set(0L, 1L, 2L, 3L), s"$nbrs")
    // best-first: per id, sims are non-increasing
    byId.values.foreach(es => assert(es.map(_._3).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)), es.mkString(",")))
  }

  test("product quantization: per-subspace codes cluster independently; " +
      "deterministic under repartition") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rng = new scala.util.Random(23)
    def near(c: Float) = Seq.fill(4)(c + 0.05f * (rng.nextFloat() - 0.5f))
    // subspace 0 groups by the FIRST half sign, subspace 1 by the second —
    // and the two groupings disagree on ids 2/3, so codes must be
    // independent per subspace; ids 0/1 seed both subspace codebooks with
    // one centroid from each group
    val rows = Seq(
      Row(0L, (near(1f) ++ near(2f))),   // (+, +)
      Row(1L, (near(-1f) ++ near(-2f))), // (−, −)
      Row(2L, (near(1f) ++ near(-2f))),  // (+, −)
      Row(3L, (near(-1f) ++ near(2f))),  // (−, +)
      Row(4L, (near(1f) ++ near(2f))),   // (+, +)
      Row(5L, (near(-1f) ++ near(-2f)))) // (−, −)
    val embs = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val (codes, books) = Similarity.productQuantize(embs, m = 2, k = 2,
      iters = 2)
    assert(books.length == 2 && books.forall(_.values.forall(_.length == 4)))
    val byId = codes.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // subspace-0 groups: {0,2,4} vs {1,3,5}; subspace-1: {0,3,4} vs {1,2,5}
    assert(byId(0L)._1 == byId(2L)._1 && byId(2L)._1 == byId(4L)._1)
    assert(byId(1L)._1 == byId(3L)._1 && byId(3L)._1 == byId(5L)._1)
    assert(byId(0L)._1 != byId(1L)._1)
    assert(byId(0L)._2 == byId(3L)._2 && byId(3L)._2 == byId(4L)._2)
    assert(byId(1L)._2 == byId(2L)._2 && byId(2L)._2 == byId(5L)._2)
    assert(byId(0L)._2 != byId(1L)._2)
    // codes disagree across subspaces where the fixture says they must
    assert(byId(2L)._1 == byId(0L)._1 && byId(2L)._2 == byId(1L)._2)
    // deterministic under repartition (decimal sums are order-free)
    val (codes2, _) = Similarity.productQuantize(embs.repartition(5),
      m = 2, k = 2, iters = 2)
    assert(codes2.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap == byId)
    // m must divide the dimension
    val bad = intercept[IllegalArgumentException] {
      Similarity.productQuantize(embs, m = 3, k = 2, iters = 1)
    }
    assert(bad.getMessage.contains("divide"))
  }

  test("ADC top-k: probes rank candidates by summed code-cell distances") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rng = new scala.util.Random(29)
    def near(c: Float) = Seq.fill(4)(c + 0.05f * (rng.nextFloat() - 0.5f))
    val rows = Seq(
      Row(0L, (near(1f) ++ near(2f))), Row(1L, (near(-1f) ++ near(-2f))),
      Row(2L, (near(1f) ++ near(-2f))), Row(3L, (near(-1f) ++ near(2f))),
      Row(4L, (near(1f) ++ near(2f))), Row(5L, (near(-1f) ++ near(-2f))))
    val embs = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val (codes, books) = Similarity.productQuantize(embs, m = 2, k = 2,
      iters = 2)
    // probe sits in the (+, +) corner: candidates sharing BOTH nearest
    // cells (0, 4) must rank above single-subspace matches (2, 3), which
    // beat the double mismatches (1, 5)
    val probes = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(
        Seq(Row(100L, (near(1f) ++ near(2f))))).asJava),
      StructType(Seq(StructField("q_id", LongType),
        StructField("qemb", ArrayType(FloatType)))))
    val got = Similarity.adcTopK(codes, probes, books, kTrain = 2, topK = 6)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._3)
    assert(got.length == 6)
    val ranked = got.map(_._1)
    assert(ranked.take(2).toSet == Set(0L, 4L), ranked.mkString(","))
    assert(ranked.slice(2, 4).toSet == Set(2L, 3L), ranked.mkString(","))
    assert(ranked.drop(4).toSet == Set(1L, 5L), ranked.mkString(","))
    // candidates with the same code pair tie on score and break by id
    assert(got(0)._2 == got(1)._2 && got(0)._1 < got(1)._1)
    // scores are non-decreasing down the rank
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("IVFPQ: probes search only their routed coarse cells; " +
      "nProbe = all cells recovers plain ADC") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rng = new scala.util.Random(31)
    def near(c: Float) = Seq.fill(4)(c + 0.05f * (rng.nextFloat() - 0.5f))
    val rows = Seq(
      Row(0L, (near(1f) ++ near(2f))), Row(1L, (near(-1f) ++ near(-2f))),
      Row(2L, (near(1f) ++ near(-2f))), Row(3L, (near(-1f) ++ near(2f))),
      Row(4L, (near(1f) ++ near(2f))), Row(5L, (near(-1f) ++ near(-2f))))
    val embs = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val (codes, books) = Similarity.productQuantize(embs, m = 2, k = 2,
      iters = 2)
    val (asg, cents) = Similarity.kmeans(embs, k = 2, iters = 2)
    // the full-vector coarse cells: second-half distance dominates, so
    // ids {0,3,4} share the (+second-half) cell of id 0
    val byCell = asg.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cell0 = byCell(0L)
    val mates = byCell.filter(_._2 == cell0).keySet
    val probes = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(
        Seq(Row(100L, (near(1f) ++ near(2f))))).asJava),
      StructType(Seq(StructField("q_id", LongType),
        StructField("qemb", ArrayType(FloatType)))))
    // nProbe = 1: only id 0's cell is searched
    val pruned = Similarity.ivfpqTopK(codes, asg, probes, books, cents,
        kTrain = 2, nProbe = 1, topK = 6)
      .collect().map(_.getLong(1)).toSet
    assert(pruned == mates, s"pruned=$pruned mates=$mates")
    // nProbe = every cell: identical ranking to the unpruned ADC search
    val full = Similarity.ivfpqTopK(codes, asg, probes, books, cents,
        kTrain = 2, nProbe = 2, topK = 6)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    val adc = Similarity.adcTopK(codes, probes, books, kTrain = 2, topK = 6)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(full.toSeq.sorted == adc.toSeq.sorted)
  }

  test("new-operator input contracts reject bad arguments cleanly") {
    val e = intercept[IllegalArgumentException] {
      Sampling.mixture(docs, "lang", "doc_id", Map("en" -> -0.1))
    }
    assert(e.getMessage.contains("non-negative"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.mixture(docs, "lang", "doc_id", Map("en" -> 0.0))
    }
    assert(e2.getMessage.contains("positive sum"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.kmeans(embsDf, k = 0, iters = 1)
    }
    assert(e3.getMessage.contains("k > 0"))
  }

  test("semantic dedup groups each blob, keeps min id as representative") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rng = new scala.util.Random(13)
    def near(center: Float) =
      Seq.fill(8)(center + 0.02f * (rng.nextFloat() - 0.5f))
    val rows = Seq(
      Row(0L, near(1f)), Row(1L, near(-1f)), Row(2L, near(1f)),
      Row(3L, near(-1f)), Row(4L, near(1f)), Row(5L, near(-1f)))
    val embs = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val got = Dedup.semanticGroups(embs, k = 2, iters = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cosine within a tight blob ~1, across blobs ~-1: two groups, min-id reps
    assert(got == Map(0L -> 0L, 2L -> 0L, 4L -> 0L,
      1L -> 1L, 3L -> 1L, 5L -> 1L), got.toString)
  }

  test("contamination flags benchmark-overlapping docs and only those") {
    // benchmark = doc 0's text; doc 3 is identical (100% 3-gram overlap),
    // doc 1 shares a long prefix (partial overlap), doc 2 shares nothing
    val bench = docs.filter(col("doc_id") === 0L)
    val corpus = docs.filter(col("doc_id") =!= 0L)
    val got = Dedup.contamination(corpus, bench).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    val (n3, m3, f3) = got(3L)
    assert(n3 == m3 && f3, s"exact dup fully contaminated: ${got(3L)}")
    val (_, m2, f2) = got(2L)
    assert(m2 == 0L && !f2, s"disjoint doc clean: ${got(2L)}")
    val (n1, m1, f1) = got(1L)
    assert(m1 > 0L && m1 < n1 && f1, s"near-dup partially overlaps: ${got(1L)}")
  }

  test("minhash LSH finds near-dup and exact-dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashLsh(docs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated
  }

  test("compiled xx-mode minhash equals the xxhash64 expression formulation") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "ab")).toDF("doc_id", "text")
    val n = 3; val k = 8
    val got = Dedup.minhashSignatures(docs, "text", "doc_id", n, k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    // reference formulation: explode distinct shingles, k seeded
    // xxhash64(lit(seed), shingle) columns, per-doc minima
    val sh = docs.select(col("doc_id"),
      explode(Dedup.shinglesOf(split(col("text"), " "), n)).as("s"))
    val want = sh.groupBy(col("doc_id"))
      .agg(min(xxhash64(lit(0), col("s"))).as("m0"),
        (1 until k).map(seed => min(xxhash64(lit(seed), col("s"))).as(s"m$seed")): _*)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(i => r.getLong(i + 1)).toVector).toMap
    assert(got == want)
  }

  test("compiled simhash equals the lane-packed aggregate formulation, both modes") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "x")).toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val got = Dedup.simhash(docs, portable = portable)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Dedup.simhashAggregated(docs, portable = portable)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"portable=$portable")
    }
  }

  test("ngram jaccard verifies candidates exactly") {
    val cand = Dedup.minhashLsh(docs, threshold = 0.1).select("id1", "id2")
    val j = Dedup.ngramJaccard(docs, cand).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 3L)) == 1.0) // identical shingle sets
    j.get((0L, 1L)).foreach(v => assert(v > 0.5 && v < 1.0))
  }

  test("shingles survive docs shorter than n tokens (ANSI element_at)") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val shorties = spark.createDataFrame(java.util.List.of(
      Row(0L, "one"), Row(1L, "two words"), Row(2L, ""),
      Row(3L, "three word doc"), Row(4L, "one")), schema)
    // n=3 shingles over docs with 1, 2, and 0 tokens must not throw
    val sig = Dedup.minhashSignatures(shorties, "text", "doc_id", n = 3, k = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig.size == 5)
    assert(sig(0L) == sig(4L)) // identical short docs → identical signature
    val pairs = Dedup.minhashLsh(shorties, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
    val cand = Dedup.minhashLsh(shorties, threshold = 0.1).select("id1", "id2")
    Dedup.ngramJaccard(shorties, cand).collect() // must not throw either
  }

  test("simhash: identical docs same hash; near-dups within small hamming") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(1L)) <= 16)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) > 16)
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("simhash degenerate-bucket guard bounds candidates on a hot band") {
    // pathological short/boilerplate corpus: 100 identical docs share ONE
    // simhash, so every quarter is a single hot bucket — ungated that is
    // 4 * C(100,2) raw join rows per band; the cap must drop them all
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val hot = spark.createDataFrame(java.util.List.of(
      (0L until 100L).map(i => Row(i, "lorem ipsum boilerplate")): _*), schema)
    val sim = Dedup.simhash(hot)
    val gated = Dedup.simhashPairs(sim, maxHamming = 8, maxBucketSize = 50)
    assert(gated.count() == 0L,
      "buckets above the cap must contribute no candidate pairs")
    // guard sized above the bucket: full recall returns (hamming 0 pairs)
    val open = Dedup.simhashPairs(sim, maxHamming = 8, maxBucketSize = 100)
    assert(open.count() == 100L * 99 / 2)
    // mixed corpus: a hot bucket must not suppress pairs in SMALL buckets
    val mixed = spark.createDataFrame(java.util.List.of(
      ((0L until 60L).map(i => Row(i, "lorem ipsum boilerplate")) ++
        Seq(Row(200L, "a genuinely distinctive document about spark catalyst"),
            Row(201L, "a genuinely distinctive document about spark catalyst")))
        : _*), schema)
    val kept = Dedup.simhashPairs(Dedup.simhash(mixed), maxHamming = 0,
        maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((200L, 201L)))
  }

  test("cosine: self-similarity 1, near-dup high, exact matches fast path") {
    val out = embsDf.select(col("vec_id"),
      Similarity.cosineExact(col("embedding"), col("embedding")).as("self"))
      .collect().map(r => r.getDouble(1))
    out.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
    val near = Similarity.blockedAllPairs(embsDf, "label", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((0L, 1L)))
  }

  test("blockedAllPairs sub-buckets a dominant block, keeps near-dups") {
    // skewed fixture: ONE block holds all 600 vectors (64-dim, matching the
    // corpus embedding shape the sub-bucket hyperplanes are built for)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType)))
    val rng = new scala.util.Random(11)
    val base = Array.fill(64)(rng.nextFloat() - 0.5f)
    val rows = Seq(Row(0L, base.toSeq, 0),
      Row(1L, base.map(v => v + 0.001f * (rng.nextFloat() - 0.5f)).toSeq, 0)) ++
      (2L until 600L).map(i =>
        Row(i, Array.fill(64)(rng.nextFloat() - 0.5f).toSeq, 0))
    val skewed = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    // threshold -1 passes every candidate → row count == candidate count
    val full = Similarity.blockedAllPairs(skewed, "label", threshold = -1.0,
      maxBlockSize = 100000).count()
    val gated = Similarity.blockedAllPairs(skewed, "label", threshold = -1.0,
      maxBlockSize = 100).count()
    assert(full == 600L * 599 / 2)
    // 600 random vectors over 2^8 sub-buckets: candidates drop by orders of
    // magnitude (expected ~C(600,2)/256 ≈ 700; assert a loose 10× bound)
    assert(gated < full / 10, s"sub-bucketing must bound candidates: $gated")
    // the genuinely-near pair shares every hyperplane sign → still found
    val near = Similarity.blockedAllPairs(skewed, "label", threshold = 0.9,
        maxBlockSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((0L, 1L)))
    // blocks under the cap are untouched: exact all-pairs either way
    val smallA = Similarity.blockedAllPairs(embsDf, "label", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val smallB = Similarity.blockedAllPairs(embsDf, "label", threshold = 0.9,
        maxBlockSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(smallA.contains((0L, 1L)) && smallB.subsetOf(smallA))
  }

  test("int8 quantization: reconstruction within scale/2, top-k recall holds") {
    val qz = Similarity.quantizeInt8(embsDf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toList
    val orig = embsDf.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    qz.foreach { case (id, scale, q) =>
      assert(q.forall(v => v >= -127 && v <= 127), s"id $id: $q")
      orig(id).zip(q).foreach { case (x, v) =>
        assert(math.abs(x - scale * v) <= scale / 2 + 1e-12,
          s"id $id: |$x - $scale*$v| > scale/2")
      }
    }
    // quantized search finds the same top-2 as exact search
    val query = orig(0L).toSeq
    val exact = Similarity.bruteForceTopK(embsDf, query, 2)
      .collect().map(_.getLong(0)).toSeq
    val quant = Similarity.quantizedTopK(
        Similarity.quantizeInt8(embsDf), query, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(quant == exact, s"quantized $quant vs exact $exact")
  }

  test("brute-force top-k returns k best, query itself first") {
    val q = embsDf.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val top = Similarity.bruteForceTopK(embsDf, q, 2).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top(1).getLong(0) == 1L) // the near-dup
  }

  test("ivf: assignment cells are stable and probe finds the near-dup") {
    val cents = Similarity.ivfCentroids(embsDf, 2)
    assert(cents.length == 2)
    val assigned = Similarity.ivfAssign(embsDf, cents)
    val cells = assigned.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(cells(0L) == 0 && cells(1L) == 1) // centroids own their cells
    val q = embsDf.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val top = Similarity.ivfTopK(assigned, cents, q, k = 2, nProbe = 2).collect()
    assert(top.head.getLong(0) == 0L && top(1).getLong(0) == 1L)
    // nProbe=1 recalls only the query's own cell — the IVF trade-off
    val top1 = Similarity.ivfTopK(assigned, cents, q, k = 2, nProbe = 1).collect()
    assert(top1.map(_.getLong(0)).toSet == Set(0L, 2L))
  }

  test("lsh near-dup buckets the jittered pair together") {
    val planes = Similarity.hyperplanes(8, 6)
    val b = embsDf.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), planes).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L)) // tiny jitter: same side of every hyperplane (w.h.p.)
  }

  test("token stats and quality") {
    val st = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(st(0L)._2 == 9)
    val q = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(q(0L) > 0.2) // 'the' twice in 9 tokens
    assert(q(4L) == 0.0) // spanish text: no english stopwords
  }

  test("language id votes") {
    val l = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(l(0L) == "en")
    assert(l(4L) == "es")
  }

  test("pii redact: finds each class once, ordering protects emails from id-run") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val corpus = spark.createDataFrame(java.util.List.of(
      Row(0L, "mail user123456@host.example.com then 192.168.0.1 " +
        "call 555-867-5309 acct 99887766 done"),
      Row(1L, "nothing sensitive here")), schema)
    val r = TextAnalysis.piiRedact(corpus).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // the 6-digit run inside the email must be counted as EMAIL not ID
    assert(r(0L) == ((1L, 1L, 1L, 1L)), s"got ${r(0L)}")
    assert(r(1L) == ((0L, 0L, 0L, 0L)), s"got ${r(1L)}")
  }

  test("repetition stats: hand-computed fractions on a known doc") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val corpus = spark.createDataFrame(java.util.List.of(
      // tokens: a b a b a  → n=5, bigrams: "a b","b a","a b","b a" → n_bg=4
      // every word duplicated (dupw=5/5); every bigram duplicated (4/4);
      // top bigram "a b" (or "b a") count 2 → 2/4
      Row(0L, "a b a b a"),
      // all distinct: zero repetition, bigrams all unique
      Row(1L, "v w x y z"),
      Row(2L, "solo")), schema) // 1 token → no bigrams, fractions 0
    val got = TextAnalysis.repetitionStats(corpus).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(0L) == ((5L, 4L, 1.0, 0.5, 1.0)), s"got ${got(0L)}")
    assert(got(1L) == ((5L, 4L, 0.0, 0.25, 0.0)), s"got ${got(1L)}")
    assert(got(2L) == ((1L, 0L, 0.0, 0.0, 0.0)), s"got ${got(2L)}")
  }

  test("bigram LM score ranks repetitive text above unpredictable text") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // the conditional MLE needs BRANCHING (a w1 followed by several w2s) or
    // every probability degenerates to 1 — doc 2 shuffles the same
    // vocabulary so "the" is followed by many different tokens
    val rng = new scala.util.Random(3)
    val vocab = Seq("the", "quick", "brown", "fox")
    val corpus = spark.createDataFrame(java.util.List.of(
      // repeated phrase: its bigrams dominate the corpus counts
      Row(0L, Seq.fill(20)("the quick brown fox").mkString(" ")),
      Row(1L, Seq.fill(20)("the quick brown fox").mkString(" ")),
      Row(2L, Seq.fill(40)(vocab(rng.nextInt(4))).mkString(" ")),
      Row(3L, "x") // single token: no bigrams, drops out
    ), schema)
    val got = TextAnalysis.bigramLogProb(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!got.contains(3L), "tokenless doc must drop out")
    assert(got(0L) > got(2L),
      s"repetitive ${got(0L)} must beat unpredictable ${got(2L)}")
    assert(got.values.forall(_ <= 0.0), s"log-probs are <= 0: $got")
  }

  test("fingerprint: identical for exact dups, stable prefix length") {
    val fp = TextAnalysis.fingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(3L))
    assert(fp(0L).length == 16 && fp(0L) != fp(1L))
  }

  test("compiled portable rolling hash equals the HOF formulation") {
    // the custom Expression must compute exactly what the (slow) built-in
    // higher-order-function pipeline computes
    val hof = aggregate(
      transform(split(col("text"), " "), t => Dedup.portableHash(0, t) % lit(1048576L)),
      lit(0L), (acc: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =>
        (acc * lit(1000003L) + h) % lit(1099511627776L))
    val both = docs.select(col("doc_id"),
      graft.functions.ArrayOps.rolling_hash_portable(split(col("text"), " ")).as("fast"),
      hof.as("slow")).collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: compiled=${r.getLong(1)} hof=${r.getLong(2)}"))
  }

  test("rolling hash is order-sensitive") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val two = spark.createDataFrame(java.util.List.of(
      Row(0L, "a b c"), Row(1L, "c b a")), schema)
    val h = TextAnalysis.rollingHash(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) != h(1L))
  }

  test("duplicate groups: transitive closure over candidate pairs") {
    val pairSchema = StructType(Seq(StructField("id1", LongType),
      StructField("id2", LongType)))
    // chain 0-1, 1-3 plus untouched 2, 4, 5 → component {0,1,3} labels to 0
    val pairs = spark.createDataFrame(java.util.List.of(
      Row(0L, 1L), Row(1L, 3L)), pairSchema)
    val groups = Dedup.duplicateGroups(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(0L) == 0L && groups(1L) == 0L && groups(3L) == 0L)
    assert(groups(2L) == 2L && groups(4L) == 4L && groups(5L) == 5L)
  }

  test("duplicate groups: a 120-node chain converges within the round cap") {
    // a path graph is the worst case for plain min-label propagation
    // (O(diameter) rounds); pointer-jumping must close it in O(log n)
    val n = 120
    val idSchema = StructType(Seq(StructField("doc_id", LongType)))
    val ids = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        (0 until n).map(i => Row(i.toLong))).asJava), idSchema)
    val pairSchema = StructType(Seq(StructField("id1", LongType),
      StructField("id2", LongType)))
    val chain = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        (0 until n - 1).map(i => Row(i.toLong, i.toLong + 1))).asJava), pairSchema)
    // force the DISTRIBUTED label-propagation path (driverMaxPairs = 0)
    val groups = Dedup.duplicateGroups(ids, chain, maxIters = 12,
        driverMaxPairs = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == n && groups.values.forall(_ == 0L),
      s"chain must fully collapse to label 0: ${groups.filter(_._2 != 0L).take(5)}")
    // the driver union-find path must produce the identical result
    val viaUf = Dedup.duplicateGroups(ids, chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUf == groups)
  }

  test("salted aggregate and join equal their unsalted counterparts") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType)))
    // skewed: key 1 holds most rows
    val rows = (1 to 80).map(i => Row(1L, i.toDouble)) ++
      Seq(Row(2L, 1.0), Row(3L, 2.0))
    val big = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    val agg = Skew.saltedAggregate(big, "k", "v", salt = 8).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(agg(1L) == ((1 to 80).map(_.toDouble).sum, 80L))
    assert(agg(2L) == ((1.0, 1L)) && agg(3L) == ((2.0, 1L)))

    val dimSchema = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType)))
    val dim = spark.createDataFrame(java.util.List.of(
      Row(1L, "one"), Row(2L, "two")), dimSchema)
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8)
      .groupBy(col("k"), col("name")).count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val plain = big.join(dim, "k")
      .groupBy(col("k"), col("name")).count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain && salted((1L, "one")) == 80L)
  }

  test("multimodal: media table schema, features, frames") {
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "media", "meta"))
    val meta = Multimodal.extractMeta(media).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(meta(0L) == 43L) // utf-8 bytes of doc 0
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(0L).length == 16)
    assert(math.abs(feats(0L).sum - 1.0f) < 1e-5) // normalized histogram
    assert(feats(0L) == feats(3L)) // exact dup → identical features
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.forall(_.getLong(2) >= 1))
    val resized = Multimodal.resizeMeta(media, 8, 8)
      .select("meta.width").head().getInt(0)
    assert(resized == 8)
  }

  test("correlationMatrix: exact +1/-1 on linear columns, cov matches") {
    val schema = StructType(Seq(StructField("x", DoubleType),
      StructField("y", DoubleType), StructField("z", DoubleType)))
    // y = 2x + 1 (corr +1), z = -x (corr -1)
    val rows = (1 to 40).map(i => Row(i.toDouble, 2.0 * i + 1, -i.toDouble))
    val df = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val m = Profiling.correlationMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(m(("x", "y"))._1 == 1.0 && m(("x", "z"))._1 == -1.0)
    assert(m(("y", "z"))._1 == -1.0)
    // population cov(x, x·2+1) = 2·var(x); var(1..40) = (40²-1)/12
    val varX = (40.0 * 40.0 - 1.0) / 12.0
    assert(math.abs(m(("x", "y"))._2 - 2.0 * varX) < 1e-6)
  }

  test("triangleCounts: K4 plus a tail, direction/duplicate-blind") {
    // K4 on {0,1,2,3} (4 triangles, each vertex in 3) + tail 3-4-5 (none);
    // edges arrive in mixed directions and with duplicates
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType)))
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 2L), (3L, 0L), (1L, 2L),
      (3L, 1L), (2L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val df = spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(
        edges.map { case (a, b) => Row(a, b) }).asJava), schema)
    val counts = Graph.triangleCounts(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("interpolateLinear: gaps get the line, edges the nearest value") {
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("t", LongType), StructField("v", DoubleType)))
    // key a: buckets 0 and 3 observed (10.0, 40.0) -> 1,2 interpolate to
    // 20, 30; key b: single bucket (flat)
    val rows = Seq(Row("a", 0L, 10.0), Row("a", 3L, 40.0), Row("b", 7L, 5.0))
    val ev = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val out = TimeSeries.interpolateLinear(ev, "k", col("t"), "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("a", 0L)) == ((1L, 10.0)))
    assert(out(("a", 1L)) == ((0L, 20.0)))
    assert(out(("a", 2L)) == ((0L, 30.0)))
    assert(out(("a", 3L)) == ((1L, 40.0)))
    assert(out(("b", 7L)) == ((1L, 5.0)))
  }

  test("shuffleOrder: contiguous permutation, partition-invariant, window-free") {
    def posMap(in: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Sampling.shuffleOrder(in, "doc_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p1 = posMap(docs)
    // exactly the positions 0..n-1, each once
    assert(p1.values.toSeq.sorted == (0L until docs.count()).toSeq)
    // the permutation is a pure function of (seed, id): repartitioning the
    // input must not move anything (retry/cluster-size stability)
    assert(posMap(docs.repartition(7)) == p1)
    assert(posMap(docs.coalesce(1)) == p1)
    // scale shape: no window operator anywhere (the naive row_number form
    // would single-partition the corpus)
    val plan = Sampling.shuffleOrder(docs, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window in shuffleOrder:\n$plan")
  }

  test("temperatureMixture: flattens the mix toward small strata, hits budget") {
    val schema = StructType(Seq(StructField("src", StringType),
      StructField("id", LongType)))
    // 900 rows of "big", 100 of "small": raw share 90/10; sqrt-weights
    // 30/10 -> target share 75/25 of a 40% budget
    val rows = (0L until 900L).map(i => Row("big", i)) ++
      (900L until 1000L).map(i => Row("small", i))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val kept = Sampling.temperatureMixture(df, "src", "id", budgetFrac = 0.4)
      .groupBy(col("src")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    // expected: big 300, small 100 (capped at 1.0 fraction)
    assert(math.abs(total - 400) < 60, s"total $total not near budget 400")
    val smallShare = kept("small").toDouble / total
    assert(smallShare > 0.15, s"small share $smallShare not upweighted above 0.10")
    // deterministic: same call returns the identical set
    val again = Sampling.temperatureMixture(df, "src", "id", budgetFrac = 0.4)
      .agg(count(lit(1))).head.getLong(0)
    assert(again == total.toLong)
  }

  test("meanPool: per-group element-wise means in long form") {
    val pooled = Similarity.meanPool(embsDf, "label").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    val raw = embsDf.collect()
      .map(r => r.getInt(2) -> r.getSeq[Float](1)).groupBy(_._1)
    raw.foreach { case (label, vs) =>
      val n = vs.length
      assert(pooled((label, 0L))._2 == n.toLong)
      val mean0 = vs.map(_._2.head.toDouble).sum / n
      assert(math.abs(pooled((label, 0L))._1 - mean0) < 1e-6)
    }
  }

  test("mutualInformation: copies score NMI ~1, independent columns ~0") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def frame(rows: Seq[(String, String)]) = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map(r => Row(r._1, r._2))).asJava),
      StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
    // b is a pure relabeling of a → MI = H(A) = H(B) → NMI = 1
    val dep = frame((0 until 120).map(i =>
      (s"k${i % 4}", s"v${i % 4}")))
    val d = Profiling.mutualInformation(dep, "a", "b").head()
    assert(math.abs(d.getDouble(d.fieldIndex("h_a")) - math.log(4)) < 1e-3)
    assert(math.abs(d.getDouble(d.fieldIndex("nmi")) - 1.0) < 1e-3,
      s"relabeled column must have NMI ~1, got $d")
    // a and b cycle with coprime periods over a multiple of both → exactly
    // independent → MI 0 (up to the 6dp rounding discipline)
    val ind = frame((0 until 120).map(i => (s"k${i % 4}", s"v${i % 3}")))
    val r = Profiling.mutualInformation(ind, "a", "b").head()
    assert(math.abs(r.getDouble(r.fieldIndex("mi"))) < 1e-3,
      s"independent columns must have MI ~0, got $r")
  }

  test("constraintSuite: metrics, thresholds and the fail surface " +
      "(Deequ-style checks in one scalar pass)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(
          Row(1L, "A", 10.0), Row(2L, "B", 20.0), Row(3L, "A", null),
          Row(3L, "C", 30.0))).asJava),
      StructType(Seq(StructField("id", LongType),
        StructField("flag", StringType), StructField("v", DoubleType))))
    val ref = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(Row(1L), Row(2L))).asJava),
      StructType(Seq(StructField("k", LongType))))
    val out = Profiling.constraintSuite(df, Seq(
      Profiling.Complete("complete_v", "v"),            // 3/4 -> fail
      Profiling.Satisfies("v_bounds", col("v") >= 10 && col("v") <= 30,
        threshold = 0.75),                              // NULL counts out
      Profiling.Satisfies("flag_set", col("flag").isin("A", "B")),
      Profiling.Unique("id_unique", Seq("id")),         // 3 distinct / 4
      Profiling.RefIn("id_in_ref", "id", ref, "k")      // ids 3,3 miss
    )).collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out("complete_v") == ((0.75, false)))
    assert(out("v_bounds") == ((0.75, true))) // threshold met exactly
    assert(out("flag_set") == ((0.75, false)))
    assert(out("id_unique") == ((0.75, false)))
    assert(out("id_in_ref") == ((0.5, false)))
  }

  test("psiDrift: identical samples score ~0, disjoint samples score high") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def frame(vals: Seq[Double]) = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(vals.map(Row(_))).asJava),
      StructType(Seq(StructField("v", DoubleType))))
    val a = frame((0 until 200).map(i => (i % 10) * 10.0))
    val sameRow = Profiling.psiDrift(a, a, "v", bins = 10, lo = 0, hi = 100)
      .select("psi", "ks").head()
    assert(sameRow.getDouble(0) == 0.0 && sameRow.getDouble(1) == 0.0,
      s"identical distributions must score 0, got $sameRow")
    val b = frame((0 until 200).map(i => 50.0 + (i % 5) * 10.0)) // shifted
    val driftRow = Profiling.psiDrift(a, b, "v", bins = 10, lo = 0, hi = 100)
      .select("psi", "ks").head()
    assert(driftRow.getDouble(0) > 0.25,
      s"disjoint-half distributions must flag, got $driftRow")
    // half of a's mass sits below b's support → KS gap 0.5
    assert(driftRow.getDouble(1) == 0.5, s"expected KS 0.5, got $driftRow")
    // out-of-range values clamp to edge bins rather than vanish
    val c = frame(Seq(-50.0, 500.0))
    val rows = Profiling.psiDrift(c, c, "v", bins = 10, lo = 0, hi = 100)
      .orderBy("bin").collect()
    assert(rows.length == 10)
    assert(rows.head.getLong(1) == 1L && rows.last.getLong(1) == 1L)
  }
}

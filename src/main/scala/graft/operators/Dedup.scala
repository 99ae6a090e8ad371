package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH
  * (Broder, "On the resemblance and containment of documents", SEQUENCES
  * 1997; banding per Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
  * ch. 3), SimHash (Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC 2002), and n-gram Jaccard (BASELINE.json
  * north star).
  *
  * Scale design:
  *  - exact dedup is one hash-groupBy (map-side partial agg, one shuffle);
  *  - MinHash signatures are computed ARRAY-NATIVELY per document
  *    (higher-order functions, no explode, no shuffle) — each of the k
  *    hash slots is an `array_min(transform(shingles, xxhash64(seed, _)))`;
  *  - LSH banding turns candidate generation into an equi-join on
  *    (band index, band hash): shuffle keyed by tiny band hashes, which is
  *    exactly the join Catalyst + AQE can re-plan under skew at 100 TB;
  *  - SimHash bit-majorities use one explode+groupBy (the standard shape);
  *  - exact verification (Jaccard / Hamming) runs only on LSH candidates,
  *    never all-pairs.
  */
object Dedup {

  /** Exact dedup: md5-of-text grouping. Returns one row per distinct
    * content: fingerprint, the kept (minimum) id, and the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Engine-portable 60-bit hash: the first 15 hex digits of md5, as a long.
    * Any SQL engine reproduces it (md5 is md5 everywhere; 15 hex digits fit
    * a signed 64-bit int), which makes the hash-based dedup operators
    * cross-checkable against external oracles. ~2-3× slower than xxhash64 —
    * the default paths keep xxhash64; pass `portable = true` to switch. */
  def portableHash(seed: Int, c: Column): Column =
    graft.functions.ArrayOps.md5_long60(concat(lit(s"$seed:"), c))

  /** Universal-hash family over the Mersenne prime 2^31-1: slot k of the
    * portable minhash is (a_k * (md5_60 % P) + b_k) % P. ONE md5 per shingle
    * (its identical subtree is eliminated by codegen CSE) instead of k
    * distinct digests — k distinct md5 inputs measured ~100× slower at
    * sf0.1 (the 32-wide digest projection also blows the codegen method
    * budget). a*h < 2^62 keeps every step inside signed-64 / ANSI-safe. */
  val UhPrime: Long = graft.functions.GraftHash.UhPrime
  def uhParams(k: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42L)
    Seq.fill(k)((1L + rng.nextInt((UhPrime - 1).toInt),
                 rng.nextInt(UhPrime.toInt).toLong))
  }

  private def slotHash(portable: Boolean)(seed: Int, c: Column): Column =
    if (portable) portableHash(seed, c) else xxhash64(lit(seed), c)

  /** Band hash over signature slots: decimal-string concat + md5 when
    * portable (cross-engine), xxhash64 over the raw longs otherwise. */
  private def bandHash(portable: Boolean, band: Int, slots: Seq[Column]): Column =
    if (portable)
      graft.functions.ArrayOps.md5_long60(concat_ws(",",
        (lit(band.toString) +: slots.map(_.cast("string"))): _*))
    else xxhash64((lit(band) +: slots): _*)

  /** Word n-gram shingles from a MATERIALIZED token-array column.
    *
    * The column must be a real (materialized) attribute, not the `split(...)`
    * expression itself: Catalyst's CollapseProject would otherwise inline the
    * split into every `element_at`, re-tokenizing the text 3n× per shingle
    * (measured ~150 ms/document — the difference between seconds and hours
    * at corpus scale). Use [[tokenized]] to get the barrier.
    */
  def shinglesOf(words: Column, n: Int): Column = {
    // short docs (< n tokens): one whole-doc shingle. The `when` guard keeps
    // element_at in-bounds — Spark 4 runs ANSI mode by default, where an
    // out-of-range element_at throws instead of returning NULL.
    val full = transform(sequence(lit(0), size(words) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*))
    array_distinct(
      when(size(words) >= n, full).otherwise(array(concat_ws(" ", words))))
  }

  /** (id, words) with the token array materialized behind a shuffle barrier.
    * The Exchange both stops projection collapse and re-parallelizes
    * single-row-group parquet inputs across all cores. */
  def tokenized(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"), split(col(textCol), " ").as("words"))
      .repartition(col("id"))

  /** MinHash signatures: k min-hashes over each document's shingle set, as
    * (id, sig: array<long>).
    *
    * Portable mode runs the compiled [[graft.functions.MinHashSig]]
    * expression: the entire signature — shingling, one md5 per shingle, k
    * universal-hash slots, k running minima — is ONE per-row loop inside a
    * narrow projection. No explode, no groupBy, no shuffle; at 100 TB the
    * operator is a pure map over the corpus. (The previous
    * explode → k-hash projection → groupBy(id).agg(k mins) pipeline
    * shuffled k longs per document; the higher-order-function formulation
    * ran interpreted with its shingle subtree duplicated k× by
    * CollapseProject — both measured far slower.)
    *
    * xxhash64 mode (portable = false) runs the same compiled expression
    * with per-slot `xxhash64(lit(k), shingle)` hashes — bit-identical to
    * the previous explode+groupBy formulation (asserted in OperatorsSpec)
    * and to the streaming near-dup signatures, with the same zero-shuffle
    * shape as portable mode.
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        n: Int, k: Int, portable: Boolean = false): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.ArrayOps.minhash_sig(
        split(col(textCol), " "), n, uhParams(k), portable).as("sig"))

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * @param bands  number of LSH bands (bands × rowsPerBand = k)
    * @return (id1, id2, est_jaccard) for candidate pairs whose estimated
    *         Jaccard (fraction of matching minhash slots) ≥ threshold
    */
  def minhashLsh(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", n: Int = 3, k: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5,
                 maxBucketSize: Int = 256, portable: Boolean = false,
                 precomputedSig: Option[DataFrame] = None): DataFrame = {
    val rowsPerBand = k / bands
    val sig = precomputedSig
      .getOrElse(minhashSignatures(docs, textCol, idCol, n, k, portable))
    // band hash over the band's slice of the signature
    val banded = sig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        bandHash(portable, b, (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)))): _*))
        .as(Seq("band", "band_hash")))
    // skew guard: a band value shared by a huge fraction of the corpus (a
    // degenerate band) produces O(n²) false-positive pairs — skip those
    // buckets (standard LSH practice; pairs they'd add are near-random)
    val sized = banded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucketSize)
    // candidate id-pairs only (no signatures through the join/dedupe
    // shuffles); re-attach signatures afterwards to estimate jaccard
    val l = sized.select(col("band"), col("band_hash"), col("id").as("id1"))
    val r = sized.select(col("band"), col("band_hash"), col("id").as("id2"))
    val cand = l.join(r, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
    // est. jaccard = matching minhash slots / k. array_intersect runs a
    // compiled set op (vs. interpreted per-element zip_with); cross-slot
    // hash collisions that would distort the positional count are ~2⁻⁶⁴.
    cand
      .join(sig.select(col("id").as("id1"), col("sig").as("sig1")), Seq("id1"))
      .join(sig.select(col("id").as("id2"), col("sig").as("sig2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("sig1"), col("sig2"))).cast("double")
          / lit(k.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs produced by
    * [[minhashLsh]] (verification pass — array_intersect/union on shingle
    * sets, joined back by id; never all-pairs). */
  def ngramJaccard(docs: DataFrame, candidates: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id",
                   n: Int = 3): DataFrame = {
    // compiled shingle loop (word_shingles); the transform()-based
    // shinglesOf runs interpreted per element and needed a shuffle barrier
    // against CollapseProject — a single compiled expression needs neither
    val sh = docs.select(col(idCol).as("jid"),
      graft.functions.ArrayOps.word_shingles(split(col(textCol), " "), n).as("sh"))
    candidates
      .join(sh.withColumnRenamed("jid", "id1").withColumnRenamed("sh", "sh1"), Seq("id1"))
      .join(sh.withColumnRenamed("jid", "id2").withColumnRenamed("sh", "sh2"), Seq("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double")).as("jaccard"))
  }

  /** Character-level verification of candidate pairs: classic Levenshtein
    * over the raw texts — the character-granularity complement to the
    * token-level [[ngramJaccard]] (catches near-dups that differ by
    * in-token edits, which word shingles miss entirely). Spark's built-in
    * `levenshtein` is codegen'd and DuckDB ships the identical function,
    * so the scores are engine-exact with no rounding concerns beyond the
    * final similarity division.
    *
    * Runs ONLY on the LSH candidate set, never all-pairs — per-pair cost
    * is O(len1·len2), so the candidate generator's bucket caps are what
    * bound total work at corpus scale. Returns (id1, id2, edit_dist,
    * edit_sim) with edit_sim = 1 − dist / max(len1, len2, 1). */
  def editDistanceVerify(docs: DataFrame, candidates: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).as("eid"), col(textCol).as("etxt"))
    val dist = levenshtein(col("t1"), col("t2"))
    candidates
      .join(t.withColumnRenamed("eid", "id1").withColumnRenamed("etxt", "t1"),
        Seq("id1"))
      .join(t.withColumnRenamed("eid", "id2").withColumnRenamed("etxt", "t2"),
        Seq("id2"))
      .select(col("id1"), col("id2"),
        dist.cast("long").as("edit_dist"),
        round(lit(1.0) - dist.cast("double") /
          greatest(length(col("t1")), length(col("t2")), lit(1)).cast("double"),
          6).as("edit_sim"))
  }

  /** Benchmark decontamination (the GPT-3 appendix-C / PaLM shape: flag
    * training documents that share n-grams with an evaluation benchmark so
    * they can be dropped before training). For every corpus document:
    * its distinct n-gram count, how many of those n-grams appear ANYWHERE
    * in the benchmark set, the overlap ratio, and a `contaminated` flag at
    * `threshold`.
    *
    * Scale shape — the asymmetry is the whole design: benchmarks are MBs
    * while the corpus is TBs, so the benchmark's distinct n-gram set is
    * built once (explode + distinct over the small side) and broadcast.
    * The broadcast is AQE's decision from the aggregated side's RUNTIME
    * size, not a forced hint — a pathologically large benchmark degrades
    * to a shuffle join instead of OOMing the driver. The corpus side is a
    * narrow compiled-shingle projection + explode, the (usually broadcast)
    * left join, and one map-side-combined groupBy(doc) — the only corpus
    * shuffle is the (id, count) partials. Candidate for 100 TB as-is.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 3,
                    threshold: Double = 0.5, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val shingles = graft.functions.ArrayOps
      .word_shingles(split(col(textCol), " "), n)
    val benchNg = benchmark
      .select(explode(shingles).as("ngram")).distinct()
      .withColumn("hit", lit(1))
    // explode_outer, not explode: word_shingles always yields >= 1 element
    // (whole-doc fallback), and inner explode's pushed-down non-empty
    // filter re-evaluates the shingle expression 2 extra times per row
    val corpusNg = corpus
      .select(col(idCol), shingles.as("ngs"))
      .select(col(idCol), size(col("ngs")).cast("long").as("n_ngrams"),
        explode_outer(col("ngs")).as("ngram"))
    val ratio = col("n_matched").cast("double") / col("n_ngrams").cast("double")
    corpusNg
      .join(benchNg, Seq("ngram"), "left")
      .groupBy(col(idCol))
      .agg(max(col("n_ngrams")).as("n_ngrams"),
        count(col("hit")).as("n_matched"))
      .select(col(idCol), col("n_ngrams"), col("n_matched"),
        round(ratio, 6).as("contam_ratio"),
        (ratio >= threshold).as("contaminated"))
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the embedding
    * space with k-means, then find near-duplicate pairs ONLY within each
    * cluster and resolve them to duplicate groups. The clustering replaces
    * an all-pairs O(n²) search with k independent within-cluster searches —
    * at 100 TB the pair join's blocking key is the learned cell id, whose
    * cardinality (and per-cell bound, via [[Similarity.blockedAllPairs]]'s
    * `maxBlockSize` sub-bucketing) keeps the candidate count linear-ish.
    * Returns (id, group_id) for every vector; keep = id == group_id. */
  def semanticGroups(embs: DataFrame, k: Int, iters: Int, threshold: Double,
                     idCol: String = "vec_id", embCol: String = "embedding",
                     precomputedAsg: Option[DataFrame] = None): DataFrame = {
    val asg = precomputedAsg.getOrElse(
      Similarity.kmeans(embs, k, iters, idCol, embCol)._1)
    val pairs = Similarity.blockedAllPairs(
      embs.join(asg, Seq(idCol)), "cell", threshold, idCol, embCol)
    duplicateGroups(embs, pairs.select("id1", "id2"), idCol)
  }

  /** Resolve near-duplicate candidate PAIRS into duplicate GROUPS:
    * connected components by min-label propagation with pointer-jumping.
    * Each round is (1) a neighbor-min step — one join + one partial-min
    * aggregate — and (2) a path-halving shortcut — look up the label OF
    * the label, so long chains collapse in O(log diameter) rounds instead
    * of O(diameter) (the round count that made 2000-node chains hit the
    * old linear cap). Lineage is cut with localCheckpoint each round, so
    * k rounds stay k plans, not one 2^k plan.
    * Returns (id, group_id = min id in the component) for EVERY doc;
    * singletons map to themselves; `keep = id == group_id`.
    */
  def duplicateGroups(docs: DataFrame, pairs: DataFrame,
                      idCol: String = "doc_id",
                      maxIters: Int = 25,
                      driverMaxPairs: Long = 10000000L): DataFrame = {
    // Round materialization = localCheckpoint + cache + count:
    //  - localCheckpoint cuts LINEAGE (the shortcut self-joins reference the
    //    previous round several times; an uncut logical plan would grow
    //    exponentially in tree size);
    //  - the cache overlay cuts STATS: checkpoint forwards the origin
    //    plan's ESTIMATED sizeInBytes, and join-stat estimation multiplies
    //    child estimates — nested self-joins compound those BigIntegers
    //    round over round until the driver spins multiplying million-digit
    //    numbers in SizeInBytesOnlyStatsPlanVisitor (observed at sf0.1).
    //    A materialized InMemoryRelation reports its ACTUAL size instead,
    //    so every round re-plans from real, small numbers.
    var pinned = List.empty[DataFrame]
    def pin(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      pinned ::= c
      c
    }
    // checkpoint the (possibly expensive) candidate pipeline ONCE, then
    // build the symmetric edge list from the materialized pairs — a union
    // of the raw `pairs` plan would run the whole upstream pipeline twice
    val p0 = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .localCheckpoint()
    // Size-adaptive strategy. LSH banding prunes the pair set by orders of
    // magnitude, so the candidate GRAPH is tiny relative to the corpus —
    // millions of docs typically yield thousands-to-millions of pairs.
    // When the pairs fit comfortably on the driver, path-compressed
    // union-find resolves components in O(E α(E)) with ZERO iterative
    // Spark rounds (each distributed round costs whole jobs of scheduling
    // regardless of data size); the label table then joins back in one
    // broadcast. Graphs above the cutoff take the distributed
    // label-propagation path below.
    val idType = docs.schema(idCol).dataType
    val longIds = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType
    if (longIds && p0.count() <= driverMaxPairs) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent(c); parent(c) = r; c = nxt
        }
        r
      }
      p0.select(col("a").cast("long"), col("b").cast("long"))
        .collect().foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          val (ra, rb) = (find(a), find(b))
          // union by MIN id so the representative IS the group id
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
      val spark = docs.sparkSession
      // snapshot keys first: find() path-compresses (rewrites values) and
      // must not race the iteration
      val labels = parent.keys.toArray.map(x => org.apache.spark.sql.Row(x, find(x)))
      val lblDf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(labels.toSeq).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.LongType))))
      return docs.select(col(idCol).cast("long").as("id"))
        .join(broadcast(lblDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("grp"), col("id")).as("group_id"))
    }
    val edges = pin(p0.union(p0.select(col("b").as("a"), col("a").as("b"))))
    // The per-round frames are label tables, thousands of times smaller
    // than the corpus; whole-stage codegen would janino-compile a fresh
    // (structurally identical, exprId-renamed) stage set EVERY round, and
    // that compilation — not the data — dominates round cost. Disable
    // codegen on a CLONED session (own SQLConf; shared SparkContext and
    // CacheManager) so rounds run interpreted WITHOUT touching the
    // caller's session — a concurrent query there must not silently lose
    // codegen. A round plan is planned under the session of the frame it
    // derives from, so homing the label table in the clone is sufficient.
    val iterSess = docs.sparkSession.newSession()
    iterSess.conf.set("spark.sql.codegen.wholeStage", "false")
    iterSess.conf.set("spark.sql.shuffle.partitions",
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    // iterate ONLY over nodes that appear in a candidate pair — at corpus
    // scale that set is orders of magnitude smaller than the doc table;
    // untouched docs are singletons and get attached in one join at the end
    val lbl0 = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    var lbl = pin(iterSess.createDataFrame(lbl0.rdd, lbl0.schema))
    // one shortcut hop re-labels v with label(label(v)); two hops per
    // round quadruple the collapsed distance (labels are node ids, and
    // label values only ever decrease, so each hop is a lookup join)
    def shortcut(in: DataFrame): DataFrame = {
      val look = in.select(col("id").as("pid"), col("nl").as("plbl"))
      in.join(look, in("nl") === look("pid"), "left")
        .select(in("id"), in("old_lbl"),
          least(col("nl"), coalesce(col("plbl"), col("nl"))).as("nl"))
    }
    var iter = 0
    var converged = false
    // r13: CONTRACT the edge list each round — rewrite endpoints to their
    // current labels, drop self-loops, distinct. Components are invariant
    // under contraction (an edge between two nodes of one component
    // becomes an edge between their labels, which chase the same min),
    // and in the DENSE-duplicate regime — boilerplate pages replicated
    // thousands of times, or the 100× replica corpus where every LSH
    // bucket is an R-clique with R(R−1)/2 candidate pairs — round 1
    // collapses each clique to self-loops and the edge table shrinks
    // geometrically, so later rounds stop re-scanning a pair set that is
    // quadratic in the duplicate density. Sparse chains still converge by
    // the pointer-jumping shortcut exactly as before. (SCALE100X_r13:
    // dd_keep read 26× wall for 3.3× data on the fixed-edge loop once the
    // 27M-pair graph crossed the union-find budget.)
    var curEdges = edges
    // r14 (ADVICE): only the LIVE round's pins stay cached. Each pin()
    // localCheckpoints + materializes (count), so once a round's frames
    // exist they are lineage-independent of their parents — holding every
    // earlier round's snapshot (the round-1 edge list is the largest)
    // until the end of the loop was pure memory pressure at the 100×
    // scale the contraction targets.
    var livePins: List[DataFrame] = List(lbl, curEdges)
    while (!converged && iter < maxIters) {
      val nbrMin = curEdges
        .join(lbl.select(col("id").as("b"), col("lbl").as("nl")), Seq("b"))
        .groupBy(col("a")).agg(min(col("nl")).as("nm"))
      val l1 = lbl.join(nbrMin, lbl("id") === nbrMin("a"), "left")
        .select(lbl("id"), lbl("lbl").as("old_lbl"),
          least(lbl("lbl"), coalesce(col("nm"), lbl("lbl"))).as("nl"))
      val upd = pin(shortcut(shortcut(l1))
        .select(col("id"), col("nl").as("new_lbl"), col("old_lbl")))
      converged = upd.filter(col("new_lbl") =!= col("old_lbl")).isEmpty
      lbl = upd.select(col("id"), col("new_lbl").as("lbl"))
      var nextPins: List[DataFrame] = List(upd)
      if (!converged) {
        val la = lbl.select(col("id").as("a"), col("lbl").as("la"))
        val lb = lbl.select(col("id").as("b"), col("lbl").as("lb"))
        curEdges = pin(curEdges
          .join(la, Seq("a")).join(lb, Seq("b"))
          .select(col("la").as("a"), col("lb").as("b"))
          .filter(col("a") =!= col("b"))
          .distinct())
        nextPins ::= curEdges
      }
      // this round's frames are materialized — the previous round's pins
      // are dead; drop them now (idempotent vs the final sweep)
      livePins.foreach(_.unpersist())
      livePins = nextPins
      iter += 1
    }
    System.err.println(s"[graft] duplicateGroups: $iter rounds" +
      (if (!converged) " (cap reached)" else ""))
    val out = docs.select(col(idCol).as("id"))
      .join(lbl.select(col("id"), col("lbl").as("group_id")), Seq("id"), "left")
      .select(col("id"), coalesce(col("group_id"), col("id")).as("group_id"))
      .localCheckpoint()
    pinned.foreach(_.unpersist())
    out
  }

  /** SimHash: per-bit majority vote of token hashes, computed by the
    * compiled [[graft.functions.SimHash60]] expression — hashing and the
    * majority counters are one per-row loop in a narrow projection; no
    * explode, no groupBy, no shuffle; a pure map at any corpus size.
    * Portable mode: 60 bits of [[portableHash]] (reproducible in any SQL
    * engine — the oracle-checked mode). xxhash mode: 64 bits of
    * `xxhash64(lit(0), token)`, bit-identical to the lane-packed aggregate
    * formulation it replaces (kept below as [[simhashAggregated]] — the
    * reference shape for an engine without custom expressions). */
  def simhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id", portable: Boolean = false): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.ArrayOps.simhash60(split(col(textCol), " "), portable)
        .as("simhash"))

  /** The aggregate SimHash formulation (explode + lane-packed bit sums +
    * groupBy): what the operator compiles to WITHOUT a custom expression.
    * Retained as the parity reference ([[simhash]] must equal it bit for
    * bit — asserted in OperatorsSpec) and as documentation of the
    * map-side-combine shape. */
  def simhashAggregated(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        portable: Boolean = false): DataFrame = {
    val nBits = if (portable) 60 else 64
    // Pack 3 per-bit one-counters into 20-bit lanes of each sum: 3× fewer
    // aggregate buffers (the agg update, not the shuffle, dominates — the
    // shuffle is one long per lane-group per doc either way). Lane counts
    // stay exact for docs up to 2^20 tokens, and the summed packed value
    // stays far under signed-64 (≤ 2^20 · (1 + 2^20 + 2^40) < 2^61), so
    // ANSI-mode sums cannot overflow. Majority per bit = ones·2 > n.
    val lanes = 3
    val laneW = 20
    val nGroups = (nBits + lanes - 1) / lanes
    val tok = tokenized(docs, textCol, idCol)
      .select(col("id"), explode(col("words")).as("tkn"))
      .select(col("id"), slotHash(portable)(0, col("tkn")).as("h"))
    val packedSums = (0 until nGroups).map { g =>
      val laneExprs = (0 until lanes).filter(l => g * lanes + l < nBits).map(l =>
        shiftleft(shiftright(col("h"), g * lanes + l).bitwiseAND(1), laneW * l))
      sum(laneExprs.reduce(_ + _)).as(s"p$g")
    }
    val agg = tok.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), packedSums: _*)
    val sh = (0 until nBits).map { b =>
      val (g, l) = (b / lanes, b % lanes)
      val ones = shiftright(col(s"p$g"), laneW * l).bitwiseAND((1L << laneW) - 1)
      when(ones * 2 > col("n"), shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col("id"), sh.as("simhash"))
  }

  /** SimHash near-dup candidates: band on `bandBits`-wide quarters (any
    * identical quarter ⇒ candidate; guarantees recall for Hamming ≤ 3),
    * then exact Hamming verification via bit_count(xor). Use bandBits = 15
    * with portable 60-bit simhashes.
    *
    * `maxBucketSize` is the degenerate-band guard (same rationale and
    * mechanism as [[minhashLsh]]): short/boilerplate corpora concentrate
    * on a few simhash values — an all-zero quarter shared by b documents
    * contributes b² candidate rows, the one O(n²) blow-up left in the
    * band-join shape. Buckets past the cap are skipped; the pairs they'd
    * contribute are dominated by false positives (a popular band value is
    * by construction uninformative), and any TRUE near-dup pair inside a
    * skipped bucket usually also shares one of its other three quarters. */
  def simhashPairs(sim: DataFrame, maxHamming: Int = 3,
                   bandBits: Int = 16, maxBucketSize: Int = 256): DataFrame = {
    val mask = (1L << bandBits) - 1
    val banded = sim.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * bandBits).bitwiseAND(mask)): _*))
        .as(Seq("band", "band_val")))
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_val"))))
      .filter(col("bucket_n") <= maxBucketSize)
    // ids ONLY through the candidate join and dedup (the raw pair set is
    // the big intermediate — a bucket of b members contributes b² rows per
    // band); the 64-bit simhashes re-attach per DISTINCT pair afterwards
    val l = banded.select(col("band"), col("band_val"), col("id").as("id1"))
    val r = banded.select(col("band"), col("band_val"), col("id").as("id2"))
    val cand = l.join(r, Seq("band", "band_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
    cand
      .join(sim.select(col("id").as("id1"), col("simhash").as("s1")), Seq("id1"))
      .join(sim.select(col("id").as("id2"), col("simhash").as("s2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Chunk-level exact dedup statistics (the RefinedWeb-style "exact
    * substring dedup" at fixed-chunk granularity): split every document
    * into non-overlapping `chunkSize`-token chunks, fingerprint each chunk,
    * and report per document how many of its chunks also occur in ANOTHER
    * document.
    *
    * The chunk fingerprint is an order-sensitive SUM of position-weighted
    * 40-bit token hashes — a plain aggregate, so chunks are formed by a
    * map-side-combinable groupBy with NO collect_list (whose order is
    * nondeterministic) and NO higher-order functions (which run
    * interpreted and re-evaluate inlined subtrees per element). Every step
    * is a hash aggregate or an equi-join on the fingerprint: scan-speed at
    * any corpus size.
    *
    * Returns (idCol, n_chunks, n_dup_chunks, dup_chunk_frac) where a chunk
    * is "dup" when its fingerprint occurs in ≥ 2 DISTINCT documents
    * (internal repetition inside one document is the repetition operator's
    * job, not dedup's). */
  /** Sliding-window exact-substring duplication — the "deduplicating
    * training data" span-removal shape (Lee et al. 2022,
    * arXiv:2107.06499), re-expressed for Spark: every OVERLAPPING k-token
    * window of every document is fingerprinted, and a window is a
    * duplicated span when its fingerprint occurs in ≥ 2 DISTINCT
    * documents. Unlike [[chunkDupStats]] (boundary-aligned chunks), this
    * catches a repeated sentence at ANY token offset. Returns per doc
    * (id, n_windows, n_dup_windows, removable_tokens) where
    * `removable_tokens` counts the token positions covered by at least
    * one duplicated window — the Lee-style removal target. Documents
    * shorter than k tokens have no windows and drop out.
    *
    * Scale shape: the order-sensitive window fingerprint is the PAIR
    * (S1 − pos·S0, S0) of two plain sliding SUMS of position-weighted
    * 40-bit token hashes — Σh·(pos+1) minus pos·Σh re-weights every
    * window to relative offsets 1..k, so equal spans at different
    * offsets collide exactly. That makes the whole operator three
    * bounded per-document window aggregates (frames of width k — never
    * data-scaled partitions) + one fingerprint groupBy (bounded by
    * distinct windows) + an equi-join back; coverage is the per-token
    * k-wide max over dup-start flags (the same count [[removeDupSpans]]
    * removes — overlap-exact even when dup runs sit closer than k−1
    * apart). No suffix array, no higher-order functions, no cross-doc
    * shuffle before the fingerprint aggregate. 40-bit hashes with k ≤ 64
    * keep every intermediate under 2^62 for documents up to 2^16
    * tokens — ANSI-safe, and the identical arithmetic is reproducible in
    * any SQL engine (the oracle mirrors it). */
  /** Shared core: (exploded tokens, per-window-start fingerprints). */
  private def spanStarts(docs: DataFrame, textCol: String, idCol: String,
                         k: Int): (DataFrame, DataFrame) = {
    // k ≤ 64 keeps __s1 = Σ h·(pos+1) inside Long under ANSI: terms are
    // < 2^40 · 2^16 = 2^56, so 64 of them stay < 2^62 (k = 256 would
    // approach 2^64 and overflow on long documents)
    require(k >= 2 && k <= 64, "window size k must be in [2, 64]")
    val tokHash = graft.functions.ArrayOps.md5_long60(
      concat(lit("0:"), col("tok"))) % lit(1099511627776L) // 2^40
    val e = docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("__h", tokHash)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val frame = byDoc.rowsBetween(0, k - 1)
    val starts = e
      .withColumn("__s0", sum(col("__h")).over(frame))
      .withColumn("__s1", sum(col("__h") * (col("pos") + 1)).over(frame))
      .withColumn("__wn", count(lit(1)).over(frame))
      .where(col("__wn") === k)
      .select(col(idCol), col("pos"),
        (col("__s1") - col("pos") * col("__s0")).as("__f1"),
        col("__s0").as("__f0"))
    (e.select(col(idCol), col("pos"), col("tok")), starts)
  }

  /** Shared core: (exploded tokens, dup-flagged window starts). */
  private def spanFlags(docs: DataFrame, textCol: String, idCol: String,
                        k: Int): (DataFrame, DataFrame) = {
    val (tokens, starts) = spanStarts(docs, textCol, idCol, k)
    val freq = starts.groupBy(col("__f1"), col("__f0"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    val flagged = starts.join(freq, Seq("__f1", "__f0"))
      .select(col(idCol), col("pos"),
        when(col("__nd") > 1, 1L).otherwise(0L).as("__dup"))
    (tokens, flagged)
  }

  /** Shared tail: per-doc window counts + the per-token k-wide coverage
    * count (the same count [[removeDupSpans]] removes — overlap-exact). */
  private def spanAggregate(tokens: DataFrame, flagged: DataFrame,
                            idCol: String, k: Int): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    // window counts from the start flags alone (docs shorter than k have
    // no windows and drop out via the inner join below)
    val winStats = flagged.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("__dup")).as("n_dup_windows"))
    // coverage counted EXACTLY as removeDupSpans removes it: a token at
    // position p is covered when any dup window starts in [p−k+1, p] — a
    // k-wide max over the start flags per token, then a sum. (The earlier
    // Σdup + (k−1)·#runs run-fold double-counted the k−1 extension when
    // two maximal runs sat closer than k−1 apart.)
    val joined = tokens.select(col(idCol), col("pos")).join(
      flagged.withColumnRenamed("__dup", "__sdup"),
      Seq(idCol, "pos"), "left")
    val covStats = joined.withColumn("__cov",
        max(coalesce(col("__sdup"), lit(0L)))
          .over(byDoc.rowsBetween(-(k - 1), 0)))
      .groupBy(col(idCol))
      .agg(sum(col("__cov")).as("removable_tokens"))
    winStats.join(covStats, Seq(idCol))
  }

  def spanDupStats(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 8): DataFrame = {
    val (tokens, flagged) = spanFlags(docs, textCol, idCol, k)
    spanAggregate(tokens, flagged, idCol, k)
  }

  /** Cross-corpus span decontamination (the Lee et al. 2022 eval-set
    * shape): flag every k-window of `docs` whose fingerprint occurs
    * ANYWHERE in `reference` — e.g. spans of training documents shared
    * with a benchmark. Returns the [[spanDupStats]] schema per doc. Scale
    * shape: both corpora run the bounded per-doc window fingerprints; the
    * only cross-corpus contact is one equi-join of the target's starts
    * against the reference's DISTINCT fingerprints (bounded by distinct
    * reference windows, broadcast when small). The streaming twin
    * ([[graft.streaming.StreamingOps.spanDupGate]]) compiles the same
    * reference set into a per-row expression — batch-equivalence asserted
    * in StreamingOpsSpec. */
  def spanStatsAgainst(docs: DataFrame, reference: DataFrame,
                       textCol: String, idCol: String,
                       k: Int = 8): DataFrame = {
    val (tokens, starts) = spanStarts(docs, textCol, idCol, k)
    val refFps = spanStarts(reference, textCol, idCol, k)._2
      .select(col("__f1"), col("__f0")).distinct()
      .withColumn("__hit", lit(1L))
    val flagged = starts.join(refFps, Seq("__f1", "__f0"), "left")
      .select(col(idCol), col("pos"),
        when(col("__hit").isNotNull, 1L).otherwise(0L).as("__dup"))
    spanAggregate(tokens, flagged, idCol, k)
  }

  /** The reference corpus's distinct window fingerprints, driver-collected
    * for the streaming gate (pairs packed flat as [f1, f0, f1, f0, …]).
    * Bounded by the benchmark-set contract (MBs of eval data vs TBs of
    * corpus), like the contamination gate's n-gram set. */
  def spanRefFingerprints(reference: DataFrame, textCol: String,
                          idCol: String, k: Int = 8): Array[Long] =
    spanStarts(reference, textCol, idCol, k)._2
      .select(col("__f1"), col("__f0")).distinct()
      .collect().flatMap(r => Array(r.getLong(0), r.getLong(1)))

  /** The ACTION half of [[spanDupStats]]: rewrite each document with every
    * token covered by a cross-doc duplicated k-window REMOVED (the Lee
    * et al. span-removal output). A token at position p is covered when
    * any duplicated window starts in [p−k+1, p] — one more bounded
    * per-doc window (a k-wide max over the start flags, tail positions
    * included via the token⟕start left join). Documents shorter than k
    * have no windows and pass through unchanged; a fully-duplicated
    * document collapses to an empty string (kept, so the caller decides
    * whether to drop it). Token order is restored deterministically by
    * sorting the kept (pos, token) structs — never a bare collect_list
    * order. Returns (id, clean_text, n_tokens, removed_tokens). */
  def removeDupSpans(docs: DataFrame, textCol: String, idCol: String,
                     k: Int = 8): DataFrame = {
    val (tokens, flagged) = spanFlags(docs, textCol, idCol, k)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val joined = tokens.join(
      flagged.withColumnRenamed("__dup", "__sdup"),
      Seq(idCol, "pos"), "left")
    val covered = joined.withColumn("__cov",
      max(coalesce(col("__sdup"), lit(0L)))
        .over(byDoc.rowsBetween(-(k - 1), 0)))
    covered.groupBy(col(idCol))
      .agg(
        // collect_list skips the when()-null entries (covered tokens);
        // array_sort on (pos, tok) structs restores document order
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__cov") === 0L,
            struct(col("pos"), col("tok"))))),
          x => x.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens"),
        sum(col("__cov")).as("removed_tokens"))
  }

  def chunkDupStats(docs: DataFrame, textCol: String, idCol: String,
                    chunkSize: Int = 8): DataFrame = {
    val tokHash = graft.functions.ArrayOps.md5_long60(concat(lit("0:"), col("tok"))) %
      lit(1099511627776L) // 2^40: weighted sum of chunkSize stays < 2^63
    val e = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val chunks = e
      .groupBy(col(idCol), floor(col("pos") / chunkSize).as("ci"))
      .agg(sum((col("pos") % chunkSize + 1) * tokHash).as("chash"))
    val freq = chunks.groupBy(col("chash"))
      .agg(countDistinct(col(idCol)).as("n_docs_with"))
    chunks.join(freq, "chash")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs_with") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_chunk_frac",
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6))
  }
}

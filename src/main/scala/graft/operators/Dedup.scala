package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard (BASELINE.json north star).
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

  /** MinHash signatures: k 64-bit min-hashes over each document's shingle
    * set, as (id, sig: array<long>).
    *
    * Shape: explode shingles (the shingle expression is evaluated ONCE per
    * document by the Generate node), hash k ways in a codegen'd projection,
    * then groupBy(id) with k partial-min aggregates — map-side combine makes
    * the shuffle k longs per document. (A higher-order-function formulation
    * with no shuffle exists but runs interpreted and gets its shingle
    * subtree duplicated k× by CollapseProject — measured orders of magnitude
    * slower. The aggregate barrier here also keeps the plan collapse-proof.)
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        n: Int, k: Int): DataFrame = {
    val sh = tokenized(docs, textCol, idCol)
      .select(col("id"), explode(shinglesOf(col("words"), n)).as("s"))
    val hashed = sh.select(
      (col("id") +: (0 until k).map(seed =>
        xxhash64(lit(seed), col("s")).as(s"h$seed"))): _*)
    val mins = (0 until k).map(seed => min(col(s"h$seed")).as(s"m$seed"))
    hashed.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(seed => col(s"m$seed")): _*).as("sig"))
  }

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * @param bands  number of LSH bands (bands × rowsPerBand = k)
    * @return (id1, id2, est_jaccard) for candidate pairs whose estimated
    *         Jaccard (fraction of matching minhash slots) ≥ threshold
    */
  def minhashLsh(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", n: Int = 3, k: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5,
                 maxBucketSize: Int = 256): DataFrame = {
    val rowsPerBand = k / bands
    val sig = minhashSignatures(docs, textCol, idCol, n, k)
    // band hash = xxhash64 over the band's slice of the signature
    val banded = sig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)): _*))
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
    val sh = tokenized(docs, textCol, idCol)
      .select(col("id").as("jid"), shinglesOf(col("words"), n).as("sh"))
    candidates
      .join(sh.withColumnRenamed("jid", "id1").withColumnRenamed("sh", "sh1"), Seq("id1"))
      .join(sh.withColumnRenamed("jid", "id2").withColumnRenamed("sh", "sh2"), Seq("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double")).as("jaccard"))
  }

  /** 64-bit SimHash: per-bit majority vote of token hashes. One
    * explode+groupBy (map-side combine keeps the shuffle narrow: 64 longs
    * per document). */
  def simhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val tok = tokenized(docs, textCol, idCol)
      .select(col("id"), explode(col("words")).as("tkn"))
      .select(col("id"), xxhash64(col("tkn")).as("h"))
    val bitSums = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"b$b"))
    val agg = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    agg.select(col("id"), sh.as("simhash"))
  }

  /** SimHash near-dup candidates: band on 16-bit quarters (any identical
    * quarter ⇒ candidate; guarantees recall for Hamming distance ≤ 3),
    * then exact Hamming verification via bit_count(xor). */
  def simhashPairs(sim: DataFrame, maxHamming: Int = 3): DataFrame = {
    val banded = sim.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "band_val")))
    val l = banded.select(col("band"), col("band_val"),
      col("id").as("id1"), col("simhash").as("s1"))
    val r = banded.select(col("band"), col("band_val"),
      col("id").as("id2"), col("simhash").as("s2"))
    l.join(r, Seq("band", "band_val"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}

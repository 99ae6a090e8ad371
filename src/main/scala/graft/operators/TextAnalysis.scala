package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north star: language-ID, quality scoring, token counting,
  * document fingerprinting).
  *
  * Scale posture: every operator here is a pure narrow projection — no
  * shuffle, no UDF, fully whole-stage-codegen'd — so it streams at parquet
  * scan speed on any number of executors. Occurrence counts use the
  * length-delta trick (`(len(x) - len(replace(x, p, ''))) / len(p)`), which
  * is deterministic and engine-portable (same semantics in any SQL engine,
  * so results cross-check against the DuckDB oracle bit-for-bit).
  */
object TextAnalysis {

  /** Number of non-overlapping occurrences of literal `pat` in `c`. */
  def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat), lit("")))) / pat.length).cast("long")

  /** Whitespace token count (single-space-delimited corpus). */
  def tokenCount(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long")

  /** Count of whole-token occurrences of `word` (space-padded match). */
  def wordOccurrences(text: Column, word: String): Column =
    occurrences(concat(lit(" "), text, lit(" ")), s" $word ")

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      tokenCount(t).as("n_tokens"),
      ((length(t) - (tokenCount(t) - 1)).cast("double") / tokenCount(t).cast("double"))
        .as("avg_token_len"))
  }

  /** Quality scoring: length, punctuation/digit/stopword ratios — the usual
    * cheap heuristics for corpus filtering. */
  def qualityScore(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t).cast("double")
    val stop = Seq("the", "a", "and", "of", "to", "in", "is", "that")
      .map(w => wordOccurrences(t, w))
      .reduce(_ + _).cast("double")
    val punct = Seq(".", ",", "!", "?", ";", ":")
      .map(p => occurrences(t, p)).reduce(_ + _).cast("double")
    val digits = (0 to 9).map(d => occurrences(t, d.toString)).reduce(_ + _).cast("double")
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(stop / nTok, 6).as("stopword_ratio"),
      round(punct / length(t).cast("double"), 6).as("punct_ratio"),
      round(digits / length(t).cast("double"), 6).as("digit_ratio"),
      round(nTok / length(t).cast("double"), 6).as("token_density"))
  }

  /** Language ID via stopword-marker voting (n-gram-free heuristic: count
    * whole-word markers per language, take the argmax, 'und' if no votes).
    */
  /** Per-language marker-vote scores (reusable column expressions). */
  def langScores(t: Column): Seq[(String, Column)] = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is"),
      "es" -> Seq("el", "la", "los", "que", "es"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "fr" -> Seq("le", "la", "les", "et", "est"))
    markers.map { case (lang, ws) =>
      (lang, ws.map(w => wordOccurrences(t, w)).reduce(_ + _))
    }
  }

  /** Predicted language: argmax of [[langScores]] with deterministic
    * tie-break on language-code order; 'und' when no marker fires.
    *
    * r12 re-plan: the old `reduceLeft(when(b.score > a.score, b), a)`
    * chain embedded each earlier operand TWICE per comparison level
    * (once in the condition, once in the otherwise), so the four score
    * subtrees — 5 occurrence counts each — appeared ~220 times in the
    * final expression: the generated `processNext()` crossed Janino's
    * hard 64 KB method limit and the WHOLE STAGE silently fell back to
    * interpreted execution (3 `CodeGenerator: Failed to compile` events
    * per marathon bench run, all in pipe_curate). `array_max` over an
    * array of (score, lang) structs builds each score subtree ONCE
    * (struct ordering = field order, so ties break on the LATER
    * language — hence codes are attached in REVERSE order with a
    * negated tiebreak index to keep the original earlier-code-wins
    * contract); ~35× smaller expression, codegen-able again. */
  def langPred(t: Column): Column = {
    val scores = langScores(t)
    val best = array_max(array(scores.zipWithIndex.map {
      case ((lang, s), i) =>
        struct(s.as("score"), lit(-i).as("tie"), lit(lang).as("lang"))
    }: _*))
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val outCols = col(idCol) +:
      langScores(t).map { case (l, s) => s.as(s"score_$l") } :+
      langPred(t).as("lang_pred")
    docs.select(outCols: _*)
  }

  /** BPE-ish regex tokenization (GPT-2-style classes: contraction suffixes,
    * letter runs, digit runs, punctuation runs). The pattern avoids
    * lookaround so it means the same thing under Java regex and RE2 —
    * engine-portable by construction. */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\\s']+"

  /** Per-class BPE-ish token counts (codegen'd regexp_count projection). */
  def bpeTokenStats(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val t = lower(col(textCol))
    def cnt(pat: String) = regexp_count(t, lit(pat)).cast("long")
    docs.select(
      col(idCol),
      cnt(BpePattern).as("n_bpe_tokens"),
      cnt("[a-z]+").as("n_alpha_runs"),
      cnt("[0-9]+").as("n_digit_runs"),
      cnt("[^a-z0-9\\s']+").as("n_other_runs"))
  }

  /** Content fingerprint: md5 over lowercased, whitespace-collapsed text.
    * Stable across engines (md5 is md5 everywhere) → usable as an exact-dup
    * key and as the driver-oracle cross-check. */
  def fingerprint(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      substring(md5(lower(regexp_replace(col(textCol), "\\s+", " "))), 1, 16)
        .as("fp"))

  /** PII redaction — the scrub pass a training-data pipeline runs before
    * anything else ships: emails, IPv4s, phone numbers, and long digit
    * runs (account/ID-like) replaced by class tokens, with per-class match
    * counts. Patterns are lookaround-free so Java regex (Spark) and RE2
    * (DuckDB, Go tooling) agree on every match. Each class is counted on
    * the text AFTER the previous class was redacted, so a digit run inside
    * an email is an email, not an ID.
    *
    * Shape: a chain of codegen'd regexp_count/regexp_replace projections —
    * no shuffle, no UDF; at 100 TB this runs fused into the scan. */
  def piiRedact(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val s = piiScrub(docs, textCol, idCol)
    s.select(col(idCol), col("n_email"), col("n_ip"), col("n_phone"),
      col("n_id"),
      length(col("text_clean")).cast("long").as("n_chars_clean"),
      substring(md5(col("text_clean")), 1, 16).as("clean_fp"))
  }

  /** [[piiRedact]]'s composable form: returns the SCRUBBED TEXT itself
    * (`text_clean`) plus the per-class counts, for pipelines whose later
    * stages consume the clean text. Same projection chain, no shuffle. */
  def piiScrub(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val classes = Seq(
      ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
      ("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
      ("phone", "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
      ("id", "[0-9]{6,}", "<ID>"))
    val (counts, cleaned) = classes.foldLeft(
        (Seq.empty[Column], col(textCol))) {
      case ((cs, t), (name, pat, tok)) =>
        (cs :+ regexp_count(t, lit(pat)).cast("long").as(s"n_$name"),
          regexp_replace(t, pat, tok))
    }
    docs.select(col(idCol) +: cleaned.as("text_clean") +: counts: _*)
  }

  /** Gopher-style repetition filters (Rae et al. 2021 table A1): per-doc
    * duplicate-word fraction, duplicate-bigram fraction, and top-bigram
    * share, via the compiled [[graft.functions.RepetitionStats]] expression.
    * The whole operator is one narrow projection — per-doc counts never
    * leave the row, so it runs at scan speed at any corpus size. */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val r = graft.functions.ArrayOps
      .repetition_stats(split(col(textCol), " "))
    docs.select(col(idCol), r.as("r"))
      .select(col(idCol),
        col("r.n_tokens").as("n_tokens"),
        col("r.n_bigrams").as("n_bigrams"),
        round(col("r.dup_word_frac"), 6).as("dup_word_frac"),
        round(col("r.top_bigram_frac"), 6).as("top_bigram_frac"),
        round(col("r.dup_bigram_frac"), 6).as("dup_bigram_frac"))
  }

  /** Corpus bigram language-model score per document — the perplexity-style
    * quality filter (CCNet-shape: score text by how predictable it is under
    * a model trained on the corpus itself; gibberish and boilerplate sit at
    * the extremes). The "model" is the bigram MLE over the corpus:
    * P(w2|w1) = c(w1 w2) / c(w1 ·), and a document's score is its mean
    * bigram log-probability (≤ 0; higher = more predictable).
    *
    * Scale shape: bigram extraction is a narrow projection + explode; the
    * corpus model is ONE map-side-combined (w1, bg) count aggregation with
    * the conditioning total `c(w1 ·)` derived by a sum-window over those
    * grouped counts (bounded by distinct-bigram cardinality — the
    * TfIdf df-via-window shape, measured ~1.5× faster than a second join
    * over the instance table); the per-doc reduce then needs a single
    * equi-join on bg (AQE decides broadcast vs shuffle from the model
    * table's runtime size) and one groupBy. Log-probs round to 9 places
    * then sum through DECIMAL, so the per-doc mean is exact and
    * order-independent — the oracle-parity convention for multi-addend
    * float sums.
    *
    * Documents with fewer than 2 tokens have no bigrams and drop out. */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val toks = Dedup.tokenized(docs, textCol, idCol) // (id, words) + barrier
    val bigrams = toks.select(col("id"),
      explode(when(size(col("words")) >= 2,
        transform(sequence(lit(0), size(col("words")) - 2),
          i => struct(
            element_at(col("words"), i + 1).as("w1"),
            concat_ws(" ", element_at(col("words"), i + 1),
              element_at(col("words"), i + 2)).as("bg"))))
        .otherwise(array().cast("array<struct<w1:string,bg:string>>"))).as("x"))
      .select(col("id"), col("x.w1").as("w1"), col("x.bg").as("bg"))
    val model = bigrams.groupBy(col("w1"), col("bg"))
      .agg(count(lit(1)).as("c_bg"))
      .withColumn("c_w1", sum(col("c_bg")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
      .select(col("bg"),
        round(log(col("c_bg").cast("double") / col("c_w1").cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("lp"))
    bigrams.select(col("id"), col("bg"))
      .join(model, Seq("bg"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6).as("lm_score"))
  }

  /** Collocation mining: the corpus's top-n adjacent word pairs by LIFT —
    * observed bigram probability over the independence expectation,
    * `(c_ab/N_bg) / ((c_a/N_tok)·(c_b/N_tok))` — the exponent-free core of
    * PMI (PMI = log2(lift); log is deliberately NOT applied so every
    * arithmetic step is an exactly-rounded IEEE division/multiply and the
    * score is bit-identical across engines — the weightedPriority
    * convention). Collocation tables drive tokenizer-vocabulary induction
    * and phrase-aware quality scoring in curation pipelines.
    *
    * Scale shape: unigram and bigram counting are map-side-combined
    * aggregates over narrow projections; the unigram table joins TWICE
    * onto the GROUPED bigram table (bounded by distinct-bigram
    * cardinality, not corpus rows; AQE broadcasts when the vocab is
    * small), totals ride in as two 1-row broadcast cross joins, and the
    * top-n is a TakeOrdered (bounded heaps, no global sort). `minCount`
    * floors c_ab so rare-pair noise (lift explodes as counts → 1) never
    * reaches the heap.
    *
    * Returns (w1, w2, c_ab, lift) ordered by (lift desc, w1, w2), lift
    * rounded to 6 for display AFTER the unrounded order is taken. */
  def collocations(docs: DataFrame, n: Int, minCount: Long = 5,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(n > 0 && minCount >= 1, s"need n > 0, minCount >= 1")
    // two corpus passes total (unigram counts, bigram counts) — the
    // corpus itself is NOT pinned (at 100 TB two scan-bandwidth passes
    // beat materializing the tokenized corpus); only the GROUPED tables,
    // bounded by vocab / distinct-bigram cardinality, are pinned because
    // each is read twice (totals fold + join). A plain projection, NOT
    // Dedup.tokenized: its repartition barrier (needed there against
    // per-element HOF re-splitting) would shuffle the full tokenized
    // corpus, and neither consumer here needs it — explode and the
    // compiled shingle kernel each evaluate the split once per row, and
    // both aggregates re-shuffle by their own keys anyway
    val toks = docs.select(col(idCol).as("id"),
      split(col(textCol), " ").as("words"))
    val uni = toks.select(explode(col("words")).as("w"))
    val cW = uni.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      .localCheckpoint() // vocab table: read for totals + joined twice
    // totals fold over the GROUPED tables (vocab/bigram cardinality),
    // never a separate corpus pass
    val nTok = cW.agg(sum(col("c_w")).cast("double").as("n_tok"))
    // compiled every-occurrence shingle kernel (one loop per row) beats
    // the interpreted transform() formulation; 1-token docs are excluded
    // up front — the kernel's whole-doc fallback shingle is not a pair
    val cAbAll = toks
      .filter(size(col("words")) >= 2)
      .select(explode(graft.functions.ArrayOps
        .word_shingles_all(col("words"), 2)).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("c_ab"))
      .localCheckpoint()
    val nBig = cAbAll.agg(sum(col("c_ab")).cast("double").as("n_bg"))
    val cAb = cAbAll.filter(col("c_ab") >= minCount)
      .select(split(col("sh"), " ", 2).as("p"), col("c_ab"))
      .select(element_at(col("p"), 1).as("w1"),
        element_at(col("p"), 2).as("w2"), col("c_ab"))
    val lift = cAb
      .join(cW.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(cW.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
      .withColumn("__lift",
        (col("c_ab").cast("double") / col("n_bg")) /
          ((col("c_a").cast("double") / col("n_tok")) *
           (col("c_b").cast("double") / col("n_tok"))))
    lift.orderBy(col("__lift").desc, col("w1"), col("w2")).limit(n)
      .select(col("w1"), col("w2"), col("c_ab"),
        round(col("__lift"), 6).as("lift"))
  }

  /** BPE merge induction: the first `rounds` merge rules a byte-pair-style
    * tokenizer trainer would learn from this corpus — each round counts
    * adjacent token pairs, takes the most frequent (count desc, pair asc),
    * fuses every non-overlapping occurrence left-to-right, and recounts.
    * Returns one row per round: (round, w1, w2, cnt) with cnt = the pair's
    * frequency at merge time.
    *
    * The corpus rides in a DOUBLED-SEPARATOR representation,
    * `' ' + join(tokens, '  ') + ' '`, which is CLOSED under the merge
    * replace `' w1  w2 ' → ' w1_w2 '`: every token owns its flanking
    * spaces, so directly adjacent repeats ("a b a b") both fuse — plain
    * left-to-right `replace` implements exact greedy BPE application, and
    * `replace` is a literal (regex-free) operation with identical
    * semantics in any engine.
    *
    * Scale shape: one map-side-combined pair-count aggregate (compiled
    * word_shingles kernel) + a 1-row TakeOrdered per round — the standard
    * one-corpus-pass-per-merge trainer cost; each round's replaced corpus
    * is pinned (localCheckpoint) so round r never re-executes rounds
    * 1..r-1's replaces. Driver state is one (w1, w2, count) row per
    * round. */
  def bpeMerges(docs: DataFrame, rounds: Int,
                textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16]")
    val spark = docs.sparkSession
    var cur = docs.select(concat(lit(" "),
      replace(col(textCol), lit(" "), lit("  ")), lit(" ")).as("t"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.sql.Row]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = cur
        .select(split(trim(col("t")), "  ").as("w"))
        // docs fully fused to one token have no pairs (the kernel would
        // emit its whole-doc fallback shingle — not a pair)
        .filter(size(col("w")) >= 2)
        .select(explode(graft.functions.ArrayOps
          .word_shingles_all(col("w"), 2)).as("sh"))
        .groupBy(col("sh")).agg(count(lit(1)).as("c"))
        // joined-string order == (w1, w2) order: tokens never contain a
        // space and ' ' sorts below every token character
        .orderBy(col("c").desc, col("sh")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(w1, w2) = top(0).getString(0).split(" ", 2)
        merges += org.apache.spark.sql.Row(r, w1, w2, top(0).getLong(1))
        if (r < rounds) cur = cur.select(
            replace(col("t"), lit(s" $w1  $w2 "), lit(s" ${w1}_$w2 "))
              .as("t"))
          .localCheckpoint()
        r += 1
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(merges.toSeq).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("round",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("w1",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("w2",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType))))
  }

  /** Canonical text normalization (the pass run before exact dedup so
    * cosmetic variants collapse): lowercase → strip everything but
    * [a-z0-9 ] → collapse runs of spaces → trim. A pure codegen'd
    * projection (three regex passes per row, no shuffle) — at 100 TB this
    * runs at scan bandwidth. Returns the normalized text, its length and
    * its md5 fingerprint (the join key for normalized-dedup). */
  def normalize(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    docs.select(col(idCol), norm.as("norm"),
      length(norm).cast("long").as("n_chars_norm"),
      substring(md5(norm), 1, 16).as("fp_norm"))
  }

  /** Rolling hash over tokens (order-sensitive content signature; array-
    * native fold, no shuffle). Rotate-XOR instead of polynomial multiply so
    * it's overflow-free under ANSI mode. */
  def rollingHash(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    val h = aggregate(toks, lit(0L), (acc: Column, tkn: Column) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(xxhash64(tkn)))
    docs.select(col(idCol), h.as("rolling_hash"))
  }

  /** Engine-portable rolling hash: polynomial accumulation over md5-derived
    * 20-bit token hashes in a 40-bit ring — every step stays far inside
    * signed-64 range, so there is no overflow to guard under ANSI mode and
    * any SQL engine (multiplication, %, md5) reproduces it exactly.
    * acc' = (acc * 1000003 + (md5_60(token) % 2^20)) % 2^40. */
  def rollingHashPortable(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      graft.functions.ArrayOps.rolling_hash_portable(split(col(textCol), " "))
        .as("rolling_hash"))

  /** Document-sharded inverted index: (token, shard) → shard-local document
    * frequency, collection frequency and a fingerprint of the sorted
    * posting list (doc:pos pairs). Doc-partitioned sharding
    * (`shard = doc_id % nShards`) is the layout a distributed index
    * actually stores — each shard indexes a disjoint document subset, so
    * posting lists are bounded by the shard's corpus slice rather than the
    * global term frequency, and the hottest stopword costs each reducer at
    * most 1/nShards of its global postings (term-partitioned layouts put
    * the whole stopword list on one node). One explode + one groupBy with
    * map-side combine; postings are fingerprinted (md5 of the sorted list)
    * so results stay scalar and engine-comparable. */
  def invertedIndex(docs: DataFrame, nShards: Int, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .groupBy(col("tok"), pmod(col("doc"), lit(nShards.toLong)).as("shard"))
      .agg(countDistinct(col("doc")).as("df_shard"),
        count(lit(1)).as("cf_shard"),
        md5(concat_ws(",", sort_array(collect_list(
          concat_ws(":", col("doc"), col("pos")))))).as("postings_fp"))

  /** Overlapping token-window chunking — the RAG / long-document splitting
    * primitive: each document becomes ⌈max(0, n−chunk)/step⌉ + 1 windows of
    * `chunkTokens` tokens advancing by `step = chunkTokens − overlap`, so
    * consecutive chunks share `overlap` tokens and no token is dropped
    * (the final window may be short). A document shorter than one chunk
    * yields exactly one window.
    *
    * Scale shape: a pure scan-stage projection + generator — the token
    * array is materialized ONCE per row in the projection beneath the
    * generate (never re-split per chunk), the chunk count is arithmetic on
    * its length, and no shuffle is involved; output size is corpus tokens
    * × (1 + overlap/step). Chunk text ships as a 60-bit fingerprint, not
    * the text — downstream dedup/indexing wants the id anyway.
    *
    * Returns (id, chunk_idx, chunk_tokens, chunk_fp). */
  def chunkWindows(docs: DataFrame, chunkTokens: Int, overlap: Int,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need chunkTokens > overlap >= 0, got ($chunkTokens, $overlap)")
    val step = chunkTokens - overlap
    val withWords = docs.select(col(idCol).as("id"),
      split(col(textCol), " ").as("__w"))
      .withColumn("__n", size(col("__w")))
      .withColumn("__extra", greatest(lit(0),
        ceil((col("__n") - lit(chunkTokens)).cast("double") / step).cast("int")))
    withWords
      .select(col("id"), col("__w"), col("__n"),
        posexplode(sequence(lit(0), col("__extra"))).as(Seq("chunk_idx", "__i")))
      .select(col("id"), col("chunk_idx"),
        least(lit(chunkTokens), col("__n") - col("chunk_idx") * step)
          .cast("long").as("chunk_tokens"),
        graft.functions.ArrayOps.md5_long60(concat(lit("c:"),
          array_join(slice(col("__w"), col("chunk_idx") * step + 1,
            lit(chunkTokens)), " "))).as("chunk_fp"))
  }
}

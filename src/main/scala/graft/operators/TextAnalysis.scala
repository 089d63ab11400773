package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines (north-star;
  * absent in the reference — BASELINE.json north_star).
  *
  * All pure built-in `Column` compositions (codegen'd, engine-portable).
  * Per-row arithmetic (single IEEE ops) is bit-deterministic across
  * engines; only multi-row aggregates need rounding at oracle time.
  */
object TextAnalysis {

  private def words(text: Column): Column = split(text, " ")

  /** The five quality metric columns — ONE definition, selected by both
    * quality() and profile() so the two can never drift. */
  private def qualityCols(textCol: String, stopwords: Seq[String])
      : Seq[Column] = {
    val w = words(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(w, x => array_contains(stopArr, x)))
    Seq(
      size(w).cast("long").as("n_words"),
      length(col(textCol)).cast("long").as("n_chars"),
      (length(col(textCol)).cast("double") / size(w)).as("avg_token_len"),
      (size(array_distinct(w)).cast("double") / size(w)).as("distinct_ratio"),
      (nStop.cast("double") / size(w)).as("stopword_ratio"))
  }

  /** The language argmax columns — shared by langId() and profile().
    * Argmax via struct ordering: (score, lang) — ties on score go to the
    * lexicographically-greatest lang, deterministically. */
  private def langCols(textCol: String, markers: Map[String, Seq[String]])
      : Seq[Column] = {
    val w = words(col(textCol))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val arr = array(ms.map(lit): _*)
      struct(size(filter(w, x => array_contains(arr, x))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    Seq(best.getField("lang").as("pred_lang"),
      best.getField("score").as("score"))
  }

  /** Quality metrics: word count, char length, average word length,
    * distinct-word ratio (lexical diversity), stopword ratio. */
  /** RAKE keyword extraction (Rose et al., "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are
    * maximal stopword-free word runs; each word scores
    * degree/frequency over the phrase graph (degree = Σ phrase
    * lengths it appears in, including itself); a phrase scores the
    * sum of its words' scores. Kept EXACT-integer by the registry's
    * floored-bp convention: word score_bp = ⌊degree·10⁴/freq⌋ and
    * phrase score = Σ score_bp with multiplicity — deterministic and
    * oracle-stable where the paper's rational sums would smear.
    *
    * Scale shape: one posexplode word pass; run ids from a per-DOC
    * stopword-count window (doc-bounded partitions, the text-family
    * contract); word stats from two map-side-combined aggregates;
    * the final ranking is TakeOrdered(k) bounded heaps over the
    * distinct-phrase frame.
    *
    * Output: top-k (phrase, n_words, n_occur, score_bp), ranked
    * (score desc, phrase asc). */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], k: Int, maxPhraseLen: Int = 4)
      : DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(maxPhraseLen >= 1,
      s"maxPhraseLen must be positive: $maxPhraseLen")
    require(stopwords.nonEmpty, "need a stopword list")
    val words = df
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .withColumn("stop", col("w").isin(stopwords: _*))
      .withColumn("run", sum(when(col("stop"), 1L).otherwise(0L))
        .over(Window.partitionBy(col("id")).orderBy(col("pos"))))
    val pw = words.filter(!col("stop") && col("w") =!= "")
    // runs past maxPhraseLen are discarded whole (the standard RAKE
    // cap — score ∝ run length, so uncapped extraction degenerates
    // to "the longest stopword-free stretch wins")
    val phrases = pw.groupBy(col("id"), col("run"))
      .agg(count(lit(1)).as("len"),
        array_join(transform(array_sort(collect_list(
          struct(col("pos"), col("w")))), x => x.getField("w")), " ")
          .as("phrase"))
      .filter(col("len") <= maxPhraseLen)
    val wordStats = pw.join(phrases, Seq("id", "run"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("degree"))
      .withColumn("score_bp", expr("(degree * 10000) div freq"))
    // per-INSTANCE phrase score (identical for every instance of the
    // same phrase text — same words, same corpus-wide word scores),
    // then one distinct-phrase rollup
    val instScores = pw.join(phrases, Seq("id", "run"))
      .join(wordStats.select(col("w"), col("score_bp")), "w")
      .groupBy(col("id"), col("run"), col("phrase"), col("len"))
      .agg(sum(col("score_bp")).as("sc"))
    instScores.groupBy(col("phrase"))
      .agg(max(col("len")).as("n_words"),
        count(lit(1)).as("n_occur"), max(col("sc")).as("score_bp"))
      .orderBy(col("score_bp").desc, col("phrase"))
      .limit(k)
  }

  def quality(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame =
    df.select(col(idCol).as("id") +: qualityCols(textCol, stopwords): _*)

  /** Heuristic language ID: marker-word hit counts per language, argmax
    * with lexicographic tie-break. `markers`: lang → marker words. */
  def langId(df: DataFrame, idCol: String, textCol: String,
      markers: Map[String, Seq[String]]): DataFrame =
    df.select(col(idCol).as("id") +: langCols(textCol, markers): _*)

  /** Single-pass document profile: every quality metric AND the language
    * prediction in ONE projection (the same shared column builders, so
    * values are identical by construction). quality() and langId() are
    * both row-wise — joining their outputs (the obvious composition)
    * would plan a self-join shuffle of the documents table; the fused
    * projection reads the text bytes once and shuffles nothing. */
  def profile(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], markers: Map[String, Seq[String]])
      : DataFrame =
    df.select(col(idCol).as("id") +:
      (qualityCols(textCol, stopwords) ++ langCols(textCol, markers)): _*)

  /** BPE-ish subword estimate for a text column: ceil(len(word)/4)
    * pieces per word (the common ~4-chars-per-token heuristic), an exact
    * integer — shared by [[tokenCounts]] and Curation.packSequences. */
  def bpeTokens(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, x) => acc + floor((length(x) + lit(3)) / lit(4)))

  /** Tokenizer-faithful pretokenizer pattern (the GPT-2/Llama family's
    * pre-BPE split, reduced to its deterministic core): letter RUNS,
    * single DIGITS (modern tokenizers split digit strings one-by-one),
    * and single punctuation marks; whitespace separates and is not
    * itself a token. Deliberately RE2-safe (no lookaround — Java regex
    * and DuckDB's RE2 produce identical match lists: the alternatives
    * match disjoint character classes, so leftmost-first vs
    * leftmost-longest cannot diverge). */
  final val PretokenPattern: String = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Tokenizer-faithful token count: Σ over pretokens of ⌈len/4⌉
    * subword pieces (letter runs split into ~4-char BPE pieces; digits
    * and punctuation are 1 piece each, their length being 1). This is
    * the number a training mix is BUDGETED in — [[bpeTokens]]'s
    * whitespace-word walk over-counts nothing on clean prose but
    * ignores punctuation and digit splitting entirely, which real
    * crawl text is full of. Exact integer arithmetic over a
    * deterministic regex — DuckDB reproduces it bit-for-bit, unlike a
    * learned-merges tokenizer. */
  def tokenizerTokens(text: Column): Column =
    aggregate(regexp_extract_all(text, lit(PretokenPattern), lit(0)),
      lit(0L), (acc, x) => acc + floor((length(x) + lit(3)) / lit(4)))

  /** Per-doc token budget under the tokenizer-faithful counter:
    * pretoken count and subword-piece count (the planning number).
    * Pure projection — zero shuffle, scan-bound at any scale. */
  def tokenBudget(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val pts = regexp_extract_all(col(textCol), lit(PretokenPattern),
      lit(0))
    df.select(col(idCol).as("id"),
      size(pts).cast("long").as("n_pretokens"),
      tokenizerTokens(col(textCol)).as("n_tokens"))
  }

  /** Token counting: whitespace tokens plus the BPE-ish subword
    * estimate, both exact integers. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    df.select(
      col(idCol).as("id"),
      size(w).cast("long").as("ws_tokens"),
      bpeTokens(col(textCol)).as("bpe_tokens"))
  }

  /** Inverted-index postings — the search/retrieval build step: one
    * row per (term, document) with the term frequency and the first
    * occurrence position (1-based). Pure explode + map-side-combined
    * groupBy((word, id)); the posting frame is the only shuffle and it
    * is the index being built — nothing smaller exists to ship.
    *
    * Output: (word, id, tf BIGINT, first_pos BIGINT). */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(words(col(textCol))).as(Seq("pos", "word")))
      .groupBy(col("word"), col("id"))
      .agg(count(lit(1)).as("tf"),
        (min(col("pos")) + 1).cast("long").as("first_pos"))

  /** BM25 top-k retrieval for a fixed term set (Okapi BM25,
    * k1 = 1.2, b = 0.75, the ln(1 + (N−df+0.5)/(df+0.5)) idf): score
    * every document containing a query term, return the k best by
    * (rounded score, id).
    *
    * Determinism discipline: the per-document score sums its ≤|terms|
    * term scores in the FIXED order of `terms` (one coalesced pivot
    * column per term, folded left) — never a sum() whose accumulation
    * order is partitioning-dependent — and every engine-side IEEE op
    * mirrors the oracle SQL's operand order, so the only cross-engine
    * wiggle is the last ulp of ln(), absorbed by round(score, 4).
    *
    * Scale shape: the token stream is FILTERED to the query terms
    * before any shuffle (tf is a map-side-combined groupBy over query
    * hits only); df and the (N, Σdl) scalars are broadcast; the doc
    * length join is keyed on the id. Final top-k is
    * TakeOrderedAndProject (per-partition heads, no global sort).
    *
    * Output: (doc_id, score DOUBLE rounded 4) — k rows. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      s"terms must be non-empty and distinct: $terms")
    val base = df.select(col(idCol).as("id"),
      words(col(textCol)).as("w"))
    val dl = base.select(col("id"), size(col("w")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tok = base.select(col("id"), explode(col("w")).as("word"))
      .filter(col("word").isin(terms: _*))
    val tf = tok.groupBy(col("id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dft = tok.groupBy(col("word"))
      .agg(countDistinct(col("id")).as("dft"))
    val scored = tf.join(broadcast(dft), "word").join(dl, "id")
      .crossJoin(broadcast(stats))
      .select(col("id"), col("word"),
        (log(lit(1.0) +
          (col("n_docs") - col("dft") + lit(0.5)) /
            (col("dft") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") /
              (col("sum_dl") / col("n_docs"))))).as("s"))
    scored.groupBy(col("id"))
      .agg(terms.map(t =>
          coalesce(max(when(col("word") === t, col("s"))), lit(0.0)))
        .reduce(_ + _).as("raw"))
      .select(col("id").as("doc_id"), round(col("raw"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Document fingerprints: content hash, 64-bit prefix, and an
    * order-independent bag-of-words hash (md5 of the sorted word list) —
    * catches word-order-shuffled duplicates. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      md5(col(textCol)).as("content_md5"),
      substring(md5(col(textCol)), 1, 16).as("fp64"),
      md5(array_join(array_sort(words(col(textCol))), " ")).as("bag_md5"))

  /** TF-IDF top-k terms per document — the standard keyword-extraction
    * pass (topical tags for mixing/routing training data).
    * score = tf · ln(n_docs / df), ROUNDED to 1e-6 BEFORE ranking: ln
    * is the one libm call in the chain, and ranking on the rounded
    * value keeps the order (not just the printed score) identical
    * across engines (registry convention for multi-row double math).
    *
    * Scale shape: term frequencies are one map-side-combined (id, term)
    * agg; document frequencies derive from THAT frame (vocabulary-sized
    * output ≪ corpus when the corpus is natural language). The dfreq
    * join rides the same `vocabBounded` gate as
    * [[Curation.unigramLogProb]]/[[Curation.bigramLogProb]]: `true`
    * (default) asserts the natural-language contract and broadcasts the
    * frame so corpus-side (id, term) rows never shuffle for the join;
    * `false` (open-ended token universes — web-scale n-grams, URLs,
    * code identifiers, where "vocabulary" is easily 10⁸ rows) drops the
    * hint and the join falls back to a shuffle instead of OOMing the
    * driver. Per-doc ranking is the bounded-heap [[graft.functions
    * .TopKAgg]] aggregate (score DESC, term ASC over UTF-8 bytes —
    * bit-identical to the `row_number` window form it replaces):
    * partial aggregation caps every map partition at k rows per doc
    * before the shuffle, and a pathological mega-doc (the 100 TB
    * corpus always has one) holds O(k) heap memory instead of
    * single-reducer-sorting its whole distinct-term set. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int,
      vocabBounded: Boolean = true): DataFrame = {
    val tf = df
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(if (vocabBounded) broadcast(dfreq) else dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_r",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    scored.groupBy(col("id"))
      .agg(graft.functions.TopKAgg.topKByKey(k)(
        col("score_r"), col("term")).as("tk"))
      .select(col("id"), posexplode(col("tk.items")))
      .select(col("id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("term"), col("col.score").as("score_r"))
  }

  /** Top-N bigram collocations by pointwise mutual information —
    * corpus-level phrase mining (PMI = ln(c_ab·W / (c_a·c_b)) over
    * word-bigram and unigram counts, Church & Hanks' association
    * measure). `minCount` floors the bigram count (PMI is noisy on
    * rare pairs — the standard guard).
    *
    * Scale shape: both count frames are map-side-combined aggs. The
    * unigram frame is vocabulary-sized; its two joins (left and right
    * word) ride the `vocabBounded` gate shared with [[tfidfTopK]] and
    * [[Curation.unigramLogProb]]: `true` (default, the
    * natural-language contract) broadcasts it so bigram rows never
    * shuffle for the joins, `false` falls back to shuffle joins for
    * open-ended token universes where a "vocabulary" broadcast is a
    * driver OOM. The global top-N is a TakeOrderedAndProject
    * (per-partition heaps, one N-row merge — never a global sort). All
    * count arithmetic is exact integer; the single ln is rounded to
    * 1e-6 before ranking (same convention as tfidfTopK). */
  def pmiCollocations(df: DataFrame, textCol: String, topN: Int,
      minCount: Int, vocabBounded: Boolean = true): DataFrame = {
    def hint(v: DataFrame): DataFrame =
      if (vocabBounded) broadcast(v) else v
    // fan the tokenize/shingle kernels out across cores on
    // under-partitioned input (single-row-group bench files; no-op at
    // scale) — both passes share the one exchange (AQE reuse)
    val src = graft.sources.Tables.fanOutForKernel(df)
    val uni = src.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totalWords = uni.agg(sum(col("c")).as("w_total"))
    val bg = src.select(explode(Dedup.shingles(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("wa", split(col("bigram"), " ")(0))
      .withColumn("wb", split(col("bigram"), " ")(1))
    bg
      .join(hint(uni.select(col("w").as("wa"), col("c").as("c_a"))),
        "wa")
      .join(hint(uni.select(col("w").as("wb"), col("c").as("c_b"))),
        "wb")
      .crossJoin(broadcast(totalWords))
      .select(col("bigram"), col("c_ab"),
        // counts go double BEFORE multiplying: c_ab·W and c_a·c_b can
        // pass 2^63 at corpus scale (ANSI long-mul throws); the oracle
        // mirrors the same cast positions for bit parity
        round(log(col("c_ab").cast("double") * col("w_total") /
          (col("c_a").cast("double") * col("c_b"))), 6).as("pmi_r"))
      .orderBy(col("pmi_r").desc, col("bigram"))
      .limit(topN)
  }

  /** Gopher-style composite quality filter (Rae et al. 2021 §A1.1, the
    * standard pre-training document gate): per-rule boolean flags plus
    * the conjunction verdict, so a pipeline can either drop on `keep`
    * or audit which rule fired. Rules (thresholds parameterized, Gopher
    * defaults): word count in [minWords, maxWords], mean word length in
    * [minAvgLen, maxAvgLen], ≥ minStopHits stopword occurrences, and
    * the most frequent word ≤ maxTopWordFrac of the doc.
    *
    * Scale shape: ONE chain, no self-join — explode → per-(doc, word)
    * count (map-side-combined) → per-doc rollup. Every metric derives
    * from the (word, count, word length) rows of the second level:
    * n_words = Σc, stop_hits = Σc over stopwords, mean word length =
    * Σ len(word)·c / Σc (exact integer sums, ONE IEEE divide — no
    * rounding needed), top-word fraction = max(c)/Σc. The obvious
    * composition (row-wise metrics joined to the count rollup) would
    * shuffle the corpus twice AND join two corpus-sized frames; this
    * shape pays exactly the two aggregation exchanges. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], minWords: Int = 50, maxWords: Int = 100000,
      minAvgLen: Double = 3.0, maxAvgLen: Double = 10.0,
      maxTopWordFrac: Double = 0.2, minStopHits: Int = 2): DataFrame = {
    // an EMPTY stopword list must mean zero hits, not a plan-time
    // type error (array() of no literals is array<null>, which
    // array_contains rejects)
    val isStop =
      if (stopwords.isEmpty) lit(false)
      else array_contains(array(stopwords.map(lit): _*), col("wd"))
    // null-text docs are ABSENT from the output, explicitly (the gate
    // never vouches for a null doc — compose by inner-joining on
    // keep=true, so absent ⇒ not retained; SQL oracles drop the row at
    // the unnest, same convention)
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("wd"))
      .groupBy(col("id"), col("wd")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_words"),
        (sum(length(col("wd")) * col("c")).cast("double") /
          sum(col("c"))).as("mean_word_len"),
        sum(when(isStop, col("c")).otherwise(0L)).as("stop_hits"),
        (max(col("c")).cast("double") / sum(col("c")))
          .as("top_word_frac"))
      .select(col("id"), col("n_words"), col("mean_word_len"),
        col("stop_hits"), col("top_word_frac"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("ok_word_count"),
        (col("mean_word_len") >= minAvgLen &&
          col("mean_word_len") <= maxAvgLen).as("ok_word_len"),
        (col("stop_hits") >= minStopHits).as("ok_stopwords"),
        (col("top_word_frac") <= maxTopWordFrac).as("ok_repetition"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_word_len") &&
          col("ok_stopwords") && col("ok_repetition"))
  }

  /** Cross-document n-gram overlap: per document, the fraction of its
    * DISTINCT n-grams that also occur in at least one OTHER document —
    * the corpus-level memorization/boilerplate signal ([[Curation
    * .repetition]] is within-doc; decontamination is against a held-out
    * set; this is corpus-vs-itself). Docs with fewer than n words have
    * no n-grams and are absent (the shingle-chain convention).
    *
    * Scale shape: per-doc distinct 60-bit n-gram HASHES explode once
    * (the curation-family join-key convention — fixed-width 8-byte
    * keys, gram text never crosses the network; the single-pass
    * NgramHash60 kernel, no shingle-string materialization); the
    * gram-frequency frame is a map-side-combined count over them
    * (distinct-per-doc ⇒ count(*) = containing-doc count), joined back
    * on the hash — one exchange per side, both corpus-shaped (no
    * broadcast pretense), then a per-doc rollup. The fraction is one
    * integer/integer IEEE divide — bit-deterministic. */
  def crossDocNgramFrac(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val g = df.select(col(idCol).as("id"),
      explode(array_distinct(
        graft.functions.MinHash.ngramHash60Col(col(textCol), n))).as("g"))
    val dfreq = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
    g.join(dfreq, "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("shared_grams"))
      .select(col("id"), col("n_grams"), col("shared_grams"),
        (col("shared_grams").cast("double") / col("n_grams"))
          .as("shared_frac"))
  }

  /** Temperature-scaled source mixing weights (the multilingual /
    * multi-source sampling recipe, Conneau & Lample 2019 §3.1): weight
    * each stratum ∝ (its token count)^α, α < 1 flattening the
    * distribution toward small sources. The output is the sampling
    * TABLE a pipeline feeds into stratifiedSample — strata-sized
    * (tiny), so the normalizing sum over the unpartitioned frame is
    * safe (same rationale as unigramLogProb's vocabulary window). The
    * single pow/divide chain is rounded to 1e-6 (pow is a libm call;
    * registry convention for cross-engine float parity).
    * `tokenCounter` selects the budgeting unit (default whitespace
    * words; pass [[tokenizerTokens]] for the tokenizer-faithful count
    * the mix is actually planned in). */
  def temperatureWeights(df: DataFrame, stratumCol: String,
      textCol: String, alpha: Double,
      tokenCounter: Column => Column =
        c => size(split(c, " ")).cast("long")): DataFrame = {
    val tok = df.select(col(stratumCol).as("stratum"),
        tokenCounter(col(textCol)).as("t"))
      .groupBy(col("stratum")).agg(sum(col("t")).as("n_tokens"))
    tok
      .withColumn("pw", pow(col("n_tokens").cast("double"), lit(alpha)))
      .withColumn("z",
        sum(col("pw")).over(Window.partitionBy()))
      .select(col("stratum"), col("n_tokens"),
        round(col("pw") / col("z"), 6).as("weight_r"))
  }

  /** Out-of-vocabulary rate against the corpus's own top-`vocabSize`
    * vocabulary — the tokenizer-coverage check a training pipeline runs
    * before committing to a vocab (docs with high OOV rate are noise or
    * wrong-language under THIS corpus's token budget).
    *
    * Scale shape: the vocabulary is a map-side-combined word count
    * ranked by `orderBy(count DESC, word).limit(vocabSize)` — a
    * TakeOrderedAndProject (per-partition heaps, vocabulary-sized
    * merge, never a global sort) — then broadcast; corpus word rows
    * join it without shuffling and roll up per doc. The vocabulary is
    * `limit`-bounded BY CONSTRUCTION, so the broadcast is gated on the
    * requested size itself: above `broadcastMaxVocab` rows (default
    * 4M — past the point a broadcast table stays cheap to ship) the
    * hint is dropped and the join falls back to a shuffle. The rate is
    * one integer/integer IEEE divide — bit-deterministic. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, broadcastMaxVocab: Int = 1 << 22): DataFrame = {
    require(vocabSize > 0, s"oovRate needs vocabSize > 0, got $vocabSize")
    // null-text docs are absent from the output (same explicit
    // convention as gopherRules — a null doc has no measurable rate)
    val wordRows = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("wd"))
    val vocab = wordRows.groupBy(col("wd")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("wd")).limit(vocabSize)
      .select(col("wd"), lit(true).as("in_vocab"))
    wordRows.join(
        if (vocabSize <= broadcastMaxVocab) broadcast(vocab) else vocab,
        Seq("wd"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .as("oov_words"))
      .select(col("id"), col("n_words"), col("oov_words"),
        (col("oov_words").cast("double") / col("n_words")).as("oov_frac"))
  }

  /** Hashed-feature linear classifier inference (the fastText /
    * hashing-trick shape every production quality filter runs at
    * scale): each word hashes to one of `buckets` feature slots, the
    * model is the `buckets`-sized weight vector, and a document's
    * logit is the sum of its words' slot weights. The weight TABLE
    * here is an honest stand-in for a trained model — slot b's weight
    * is md5-derived ((hash60("seed#b") mod 2001) − 1000 milli-units,
    * the same deterministic-fake posture as [[Multimodal]]'s codec)
    * so the whole inference is SQL-reproducible; swap in trained
    * milli-unit weights and nothing else changes.
    *
    * Scale shape: the model ships as ONE array literal in the plan
    * (what a broadcast weight vector compiles to at this size) and
    * scoring is entirely row-local — one codegen'd
    * [[graft.functions.MinHash.NgramHash60]] pass per doc, then an
    * `aggregate` over `element_at`; no explode, no shuffle, no join.
    * All integer milli-units: the logit is an exact Long sum in any
    * order, the class an integer compare — bit-deterministic at any
    * SF. */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, seed: String): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"need 0 < buckets <= 2^20 (plan-literal model): $buckets")
    val weights: Seq[Long] = (0 until buckets)
      .map(b => graft.functions.MinHash.md5Prefix60(s"$seed#$b")
        % 2001 - 1000)
    val wlit = typedLit(weights)
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.functions.MinHash.ngramHash60Col(col(textCol), 1).as("hs"))
      .select(col("id"),
        size(col("hs")).cast("long").as("n_tokens"),
        aggregate(
          transform(col("hs"), h => element_at(wlit,
            pmod(h, lit(buckets.toLong)).cast("int") + 1)),
          lit(0L), (acc, w) => acc + w).as("logit_milli"))
      .withColumn("quality_class", col("logit_milli") > 0)
  }
}

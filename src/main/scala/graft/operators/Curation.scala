package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Corpus-curation operators for training-data pipelines (north-star;
  * absent in the reference — BASELINE.json north_star): benchmark
  * decontamination, repetition metrics, unigram-LM quality scoring, and
  * deterministic stratified sampling.
  *
  * Shared conventions with the dedup family: n-grams come from
  * [[Dedup.shingles]], n-gram join keys are the 60-bit md5-prefix hash
  * (BIGINT-exact in any oracle engine), and every ratio is a SINGLE IEEE
  * division of integer counts — bit-deterministic across engines. Only
  * multi-row double aggregates (the LM average) need rounding.
  */
object Curation {

  /** Integral-column guard shared by [[ppsSample]] (weights) and
    * [[capPerKey]] (heap ids): both lean on an exact Long view of the
    * column, and `cast("long")` on a non-integral type is a silent
    * corruption — a string id casts to NULL (collapsed heap ties), a
    * fractional weight TRUNCATES (a weight in (0,1) becomes 0 and is
    * excluded entirely, changing inclusion probability). Fail loudly
    * at plan time instead. */
  private def requireIntegral(df: DataFrame, colName: String,
      role: String): Unit = {
    val dt: DataType = df.schema(colName).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$role column `$colName` must be an integral type " +
        s"(byte/short/int/long), got $dt — cast explicitly if the " +
        s"semantics (truncation/rounding) are intended")
  }

  /** 60-bit n-gram hash (md5 prefix), the join-key convention of the
    * dedup family: joining on the hash instead of the n-gram string
    * keeps the shuffle rows fixed-width 8 bytes — at 100 TB the n-gram
    * text never crosses the network. Computed by the single-pass
    * [[graft.functions.MinHash.NgramHash60]] kernel (split → rolling
    * window → digest-level md5), bit-identical to the old
    * shingles→md5→conv tree without materializing shingle strings or
    * the hex round-trip (null text: kernel yields null, the old form an
    * empty array — identical after the callers' explode). */
  private def ngramHashes(text: Column, n: Int): Column =
    graft.functions.MinHash.ngramHash60Col(text, n)

  /** Benchmark decontamination: for each corpus document, the number of
    * distinct word n-grams it shares with a held-out benchmark set (the
    * published contamination check run before every training job: docs
    * with any overlap get dropped or flagged).
    *
    * Plan shape for 100 TB: the benchmark side is the SMALL side by
    * construction (a held-out eval set, not a second corpus) — its
    * distinct n-gram hashes are broadcast, so the corpus-side n-gram
    * rows never shuffle for the join; the only wide exchange is the
    * per-(doc, gram) distinct, which carries two BIGINTs per row.
    * Output: (id, n_contaminated) for corpus docs with ≥ 1 shared
    * n-gram; clean docs are absent (filter semantics, not annotation). */
  def ngramContamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(ngramHashes(col(textCol), n)).as("g")).distinct()
    val docGrams = corpus
      .select(col(idCol).as("id"),
        explode(ngramHashes(col(textCol), n)).as("g"))
      .distinct()
    docGrams.join(broadcast(benchGrams), "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Repetition metrics (the Gopher-style repetition filters): per doc,
    * the fraction of n-gram occurrences taken by the single most
    * frequent n-gram (`top_ngram_frac`) and the fraction of occurrences
    * that are repeats of an earlier n-gram (`dup_ngram_frac`).
    * High values ⇒ boilerplate / degenerate text.
    *
    * Two aggregates: (doc, gram) counts (partial-agg'd map-side, key
    * width bounded by the n-gram hash), then a per-doc rollup of
    * max/sum/count — the second shuffle carries one row per distinct
    * (doc, gram), already a fraction of the corpus. Docs with < n words
    * have no n-grams and are absent (same convention as the
    * minhash/shingle chain). Each ratio is one IEEE divide of two
    * integer counts — bit-deterministic, no rounding needed. */
  def repetition(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(ngramHashes(col(textCol), n)).as("g"))
      .groupBy(col("id"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("total"),
        count(lit(1)).as("n_distinct"))
      .select(col("id"),
        (col("top_cnt").cast("double") / col("total"))
          .as("top_ngram_frac"),
        ((col("total") - col("n_distinct")).cast("double") / col("total"))
          .as("dup_ngram_frac"))

  /** Unigram language-model quality score: each doc's mean log
    * probability under the corpus's own unigram distribution — the
    * cheap stand-in for perplexity-based quality filtering (docs of
    * rare-word noise score low; formulaic docs score high).
    *
    * Two passes over the exploded words: a global word-frequency
    * aggregate, then a join back. The grand total rides a ONE-ROW
    * distributive aggregate cross-joined in (broadcast of a single row
    * — never an unpartitioned window, so the frequency frame itself
    * never single-reduces either). `vocabBounded = true` (default)
    * asserts the natural-language contract — the word vocabulary is
    * millions of rows / megabytes at any corpus size — and broadcasts
    * the frequency frame so corpus-side word rows never shuffle for
    * the join. Pass `vocabBounded = false` when the "vocabulary" is
    * open-ended (web-scale token or n-gram universes): the hint is
    * dropped and the join falls back to a shuffle, which scales past
    * the broadcast limit. avg over doubles is order-dependent ⇒
    * rounded to 1e-6 (the registry-wide convention for multi-row
    * double aggregates). */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      vocabBounded: Boolean = true): DataFrame = {
    // NOT fanned out (unlike bigramLogProb): the unigram kernel is a
    // bare split with the corpus rows consumed twice (count + join) —
    // the round-robin exchange costs more than the kernel (r21 A/B:
    // the fanned form measured ~2× slower same-session)
    val w = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("w"))
    val counts = w.groupBy(col("w")).agg(count(lit(1)).as("n"))
    val probs = counts
      .crossJoin(broadcast(counts.groupBy().agg(sum(col("n"))
        .as("total"))))
      .select(col("w"),
        (col("n").cast("double") / col("total")).as("p"))
    w.join(if (vocabBounded) broadcast(probs) else probs, "w")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        round(avg(log(col("p"))), 6).as("avg_logprob_r"))
  }

  /** Interpolated BIGRAM language-model quality score: each doc's mean
    * log of λ·p(wᵢ|wᵢ₋₁) + (1−λ)·p(wᵢ) under the corpus's own counts —
    * one rung up the perplexity-filter ladder from [[unigramLogProb]]
    * (context-aware: word-salad docs whose unigrams are all common
    * still score low; the unigram back-off keeps unseen bigrams
    * finite). Docs with fewer than 2 words have no bigrams and are
    * absent (the shingle-chain convention).
    *
    * Scale shape: ALL probability plumbing happens on the
    * vocab²-bounded bigram-count frame — its per-bigram interpolated
    * log-probability is assembled there once (unigram factors ride
    * vocabulary joins against that SMALL frame, broadcast under the
    * same `vocabBounded` contract as [[unigramLogProb]], with the
    * grand total as a one-row aggregate cross join), and corpus bigram
    * rows then make exactly ONE shuffle join against the precomputed
    * (bigram, logp) table — no broadcast pretense on the vocab² frame,
    * no per-corpus-row splits or multi-join chains. Per-row
    * probability arithmetic is a fixed operand-order IEEE chain; the
    * per-doc avg of logs is order-dependent ⇒ rounded 1e-6 (registry
    * convention). */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7, vocabBounded: Boolean = true): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"need 0 <= lambda <= 1, got $lambda")
    def hint(v: DataFrame): DataFrame =
      if (vocabBounded) broadcast(v) else v
    // fan the shingle/tokenize kernels out across cores on
    // under-partitioned input (single-row-group bench files; no-op at
    // scale) — both passes share the one exchange (AQE reuse)
    val src = graft.sources.Tables.fanOutForKernel(df)
    val bg = src.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), 2)).as("b"))
    val uniCounts = src.select(
        explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val uni = uniCounts.crossJoin(broadcast(
      uniCounts.groupBy().agg(sum(col("c")).as("total"))))
    val p = lit(lambda) * (col("c_ab").cast("double") / col("c_a")) +
      lit(1 - lambda) * (col("c_b").cast("double") / col("total"))
    val perBigram = bg.groupBy(col("b")).agg(count(lit(1)).as("c_ab"))
      .withColumn("wa", split(col("b"), " ")(0))
      .withColumn("wb", split(col("b"), " ")(1))
      .join(hint(uni.select(col("w").as("wa"), col("c").as("c_a"))),
        "wa")
      .join(hint(uni.select(col("w").as("wb"), col("c").as("c_b"),
        col("total"))), "wb")
      .select(col("b"), log(p).as("logp"))
    bg.join(perBigram, "b")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logprob_r"))
  }

  /** Deterministic stratified sampling: per-stratum hash-threshold
    * sampling with an exact, stable fraction per stratum (domain-mixing
    * weights: oversample curated sources, downsample crawl). Basis-point
    * buckets come from md5("stratum#id") — salting the hash with the
    * stratum DECORRELATES sampling from the md5(id) train/val/test
    * split (the same hash would make "sampled" correlate with "train"),
    * and hash-based selection is STABLE: re-running over a grown corpus
    * never flips old docs in or out. Pure projection + filter —
    * embarrassingly parallel, zero shuffle, no RNG. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double)
      : DataFrame = {
    val bucket = pmod(conv(substring(md5(
        concat(col(stratumCol), lit("#"), col(idCol).cast("string"))),
        1, 15), 16, 10).cast("long"), lit(10000))
    val thresholdBp = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultFraction * 10000))) {
        case (acc, (stratum, f)) =>
          when(col(stratumCol) === stratum,
            lit(math.round(f * 10000))).otherwise(acc)
      }
    df.select(col(idCol).as("id"), col(stratumCol).as("stratum"),
        bucket.as("bucket"))
      .filter(col("bucket") < thresholdBp)
  }

  /** PII pattern inventory: (token, regex), applied in LIST ORDER by
    * [[piiScan]]. Order matters — SSNs must be redacted before the
    * looser phone pattern can swallow them. Patterns are deliberately
    * RE2-safe (no backreferences/lookaround) so the engine (Java regex)
    * and any RE2-based oracle (DuckDB) match identical spans. */
  final val PiiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "SSN" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "IP" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "PHONE" -> "\\+?\\d[\\d -]{7,}\\d")

  /** PII scan + redaction — the safety pass every published corpus
    * pipeline runs (emails / SSNs / IPs / phone numbers → typed
    * placeholder tokens). Counts are taken per pattern on the text AS
    * SEEN BY that pattern (i.e. after the earlier redactions), exactly
    * matching what the sequential redaction replaced. Pure
    * `regexp_count`/`regexp_replace` projections — zero shuffle,
    * embarrassingly parallel at any scale.
    *
    * NOTE: the synthetic `documents` corpus contains no digits or `@`,
    * so the registry query's counts are all zero and `redacted` equals
    * `text` (engine and oracle agree vacuously); the non-vacuous
    * evidence is CurationSpec's planted-PII fixture. */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (redacted, counts) = PiiPatterns
      .foldLeft((col(textCol), Seq.empty[Column])) {
        case ((txt, cs), (token, pat)) =>
          (regexp_replace(txt, pat, s"<$token>"),
            cs :+ regexp_count(txt, lit(pat))
              .cast("long").as(s"n_${token.toLowerCase}"))
      }
    df.select(col(idCol).as("id") +: counts :+ redacted.as("redacted"): _*)
  }

  /** Sequence packing: assign docs (in id order) to fixed token-budget
    * packs — the "concatenate and chop" batching every LM training run
    * performs. pack_id = floor(exclusive running token total / budget);
    * a doc straddling a boundary starts its pack at the straddle (the
    * standard greedy-contiguous contract, deterministic in id order).
    * `tokenCounter` selects the budgeting unit — default
    * [[TextAnalysis.bpeTokens]] (whitespace-word ⌈len/4⌉); pass
    * [[TextAnalysis.tokenizerTokens]] for the tokenizer-faithful count
    * a real training mix is planned in.
    *
    * The running total is a DISTRIBUTED TWO-LEVEL PREFIX SUM, not a
    * global ordered window (`Window.orderBy(id)` with no partition key
    * funnels the whole corpus into one task — the single-reducer trap):
    * per-bucket cumulative sums run in parallel over id-range buckets,
    * bucket offsets are a window over the BUCKET-COUNT-sized totals
    * frame (tiny by construction — that single partition holds
    * |corpus|/bucketSize rows), and the offsets broadcast back. Every
    * step is exact integer math — bit-equal to the single-window form
    * at any partitioning. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, bucketSize: Int = 4096,
      tokenCounter: Column => Column = TextAnalysis.bpeTokens)
      : DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("id"),
      tokenCounter(col(textCol)).as("tokens"))
    val bucketed = toks.withColumn("bucket",
      floor(col("id") / bucketSize).cast("long"))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed.withColumn("local_cum",
      sum(col("tokens")).over(inBucket))
    val prevBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("tokens")).as("btot"))
      .withColumn("offset",
        coalesce(sum(col("btot")).over(prevBuckets), lit(0L)))
      .select(col("bucket"), col("offset"))
    withLocal.join(broadcast(offsets), "bucket")
      .select(col("id"), col("tokens"),
        floor((col("local_cum") + col("offset") - col("tokens"))
          / budget).cast("long").as("pack_id"))
  }

  /** Sliding-window document chunking: split each document into
    * `chunkWords`-word windows advancing by `chunkWords − overlapWords`
    * (the long-document → context-window preprocessing step every
    * pre-training pipeline runs before packing; overlap preserves
    * cross-boundary context). Chunk starts are 1, 1+stride, … up to the
    * last start that still reaches the document's end, so every word is
    * covered, the final chunk may be short, and a ≤ chunkWords doc is
    * exactly one chunk. Output: (id, chunk_idx 1-based, chunk_text,
    * n_words).
    *
    * Scale shape: pure projection + explode — zero shuffle,
    * embarrassingly parallel; per-row memory is one document's words.
    * Chunk counts/indices are exact integer arithmetic. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkWords: Int, overlapWords: Int): DataFrame = {
    require(chunkWords > 0 && overlapWords >= 0 &&
      overlapWords < chunkWords,
      s"need chunkWords > 0, 0 <= overlapWords < chunkWords; " +
        s"got $chunkWords, $overlapWords")
    val stride = chunkWords - overlapWords
    val w = split(col(textCol), " ")
    // 1 + max(0, ceil((L − chunkWords) / stride)) chunks for L words
    val nChunks = lit(1) + greatest(lit(0L),
      ceil((size(w) - lit(chunkWords)).cast("double") / stride)
        .cast("long"))
    // null documents have no chunks. Explicit contract regardless of
    // ANSI mode: under ANSI (this build's default) size(null) is null
    // and the row already drops at posexplode; under legacy semantics
    // size(null) = -1 would fabricate one junk chunk row — the filter
    // pins the behavior either way (SQL engines drop at the unnest).
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), w.as("w"), nChunks.as("nc"))
      .select(col("id"),
        posexplode(transform(sequence(lit(1L), col("nc")),
          i => slice(col("w"),
            ((i - 1) * stride + 1).cast("int"), lit(chunkWords)))))
      .select(col("id"),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_words"))
  }

  /** Cross-document repeated-SPAN removal — span-level dedup (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better":
    * removing repeated substrings beats dropping whole near-dup docs).
    * Word-level formulation: an `n`-word window whose gram occurs in ≥
    * `minDocs` distinct documents is a duplicated span; every word
    * position covered by ANY duplicated span is cut, and the document
    * is rewritten from the surviving words. Emits per doc: token count,
    * duplicated-token count, duplicated fraction (one IEEE divide of
    * the two counts), and the rewritten `clean_text` ("" when fully
    * covered — e.g. exact-duplicate docs).
    *
    * Plan shape for 100 TB: the entire detection plane carries (id,
    * position, 60-bit gram hash) — the
    * [[graft.functions.MinHash.NgramHash60]] kernel emits one hash per
    * window start, position-aligned with `split(text, " ")`, so no
    * gram string is ever materialized and no detection shuffle carries
    * text. Covered positions fold to ONE bounded `collect_set` per doc
    * (≤ doc length ints) and meet the unexploded doc row in the final
    * rewrite join; the rewrite itself is a row-local indexed `filter`
    * over the split words. Document bodies therefore cross the network
    * AT MOST ONCE — in that join, only when the covered frame outgrows
    * the broadcast threshold AND the corpus layout is not already
    * id-partitioned (an id-bucketed corpus, [[Bucketing]]'s posture,
    * makes the rewrite shuffle-free: only position sets move). */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n > 0, s"span length must be positive: $n")
    require(minDocs >= 2,
      s"a span repeated in < 2 docs is not a cross-doc duplicate: " +
        s"$minDocs")
    val base = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("text"))
    // (id, p, g): window start p (0-based, = index of its first word)
    val wins = base.select(col("id"),
      posexplode(ngramHashes(col("text"), n)))
      .select(col("id"), col("pos").as("p"), col("col").as("g"))
    // grams present in >= minDocs distinct docs: per-doc distinct
    // first (a doc's internal repeats must not fake cross-doc
    // support), then one count over 8-byte keys
    val dup = wins.select(col("id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("docs"))
      .where(col("docs") >= minDocs)
      .select(col("g"))
    // union of covered word positions, folded to one array per doc
    val covered = wins.join(dup, "g")
      .select(col("id"),
        explode(sequence(col("p"), col("p") + lit(n - 1))).as("pos"))
      .groupBy(col("id"))
      .agg(collect_set(col("pos")).as("cov"))
    val w = split(col("text"), " ")
    val cov = coalesce(col("cov"), array().cast("array<int>"))
    base.join(covered, Seq("id"), "left")
      .select(col("id"),
        size(w).cast("long").as("n_tokens"),
        size(cov).cast("long").as("dup_tokens"),
        (size(cov).cast("double") / size(w)).as("dup_frac"),
        array_join(
          filter(w, (word, i) => !array_contains(cov, i)), " ")
          .as("clean_text"))
  }

  /** Maximal CROSS-document repeated token spans — the exact-substring
    * view of duplication (the suffix-array dedup family popularized by
    * "Deduplicating Training Data Makes Language Models Better"),
    * complementing [[removeRepeatedSpans]] (which only reports per-doc
    * covered mass): one row per (doc pair, alignment) giving WHERE the
    * shared span starts in each doc and how long it runs. Every span
    * of ≥ n shared tokens appears exactly once, maximally extended —
    * two n-gram anchors that overlap or touch on the same alignment
    * diagonal (pa − pb) merge into one row.
    *
    * Mechanics: per-position 60-bit n-gram hashes (the
    * [[graft.functions.MinHash.NgramHash60]] kernel — no gram string
    * is materialized, anchors shuffle as 8-byte keys), hash self-join
    * (id_a < id_b), then gaps-and-islands per (pair, diagonal):
    * island = pa − row_number(), span length = max(pa) − min(pa) + n.
    * All-integer output — position/length arithmetic has no float
    * anywhere, so the oracle hash-matches bit-for-bit.
    *
    * Plan shape for 100 TB: ONE shuffle on the 8-byte gram hash for
    * the self-join (output bounded by true duplicated mass — an
    * n-gram unique in the corpus joins nothing), then ONE partitioned
    * window + partial-aggregated groupBy per (pair, diag) — never a
    * cartesian, never an all-pairs compare. `maxDf` caps the postings
    * of degenerate ultra-common grams (boilerplate headers shared by
    * millions of docs would otherwise emit quadratic anchor pairs);
    * it is None in the oracled registry entry (exactness) and should
    * be set on adversarial corpora — capped grams are DROPPED from
    * anchoring, shortening only spans those grams alone support. */
  def crossDocSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Option[Int] = None): DataFrame = {
    require(n > 0, s"span anchor length must be positive: $n")
    val wins = df.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        posexplode(ngramHashes(col(textCol), n)))
      .select(col("id"), col("pos").as("p"), col("col").as("g"))
    val pruned = maxDf match {
      case Some(cap) =>
        val ok = wins.select(col("id"), col("g")).distinct()
          .groupBy(col("g")).agg(count(lit(1)).as("docs"))
          .where(col("docs") <= cap).select(col("g"))
        wins.join(ok, "g")
      case None => wins
    }
    val m = pruned.select(col("id").as("id_a"), col("p").as("pa"),
        col("g"))
      .join(pruned.select(col("id").as("id_b"), col("p").as("pb"),
        col("g")), Seq("g"))
      .where(col("id_a") < col("id_b"))
      .withColumn("diag", col("pa") - col("pb"))
    val wn = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pa"))
    m.withColumn("isl", col("pa") - row_number().over(wn))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("isl"))
      .agg(min(col("pa")).as("pa0"), min(col("pb")).as("pb0"),
        (max(col("pa")) - min(col("pa")) + lit(n)).as("len0"))
      .select(col("id_a"), col("id_b"),
        col("pa0").cast("long").as("pos_a"),
        col("pb0").cast("long").as("pos_b"),
        col("len0").cast("long").as("len_tokens"))
  }

  /** Deterministic global shuffle + balanced shard assignment — the
    * last step before a training run reads the corpus: examples must
    * arrive in an order decorrelated from ingest order (a corpus
    * sorted by crawl date or source trains badly) yet EXACTLY
    * reproducible across reruns, engines, and partition counts.
    * Ordering key = 60-bit md5 prefix of `id:seed` (the repo's
    * SQL-reproducible hash convention — no engine RNG, no
    * `rand(seed)`, whose sequence is partitioning-dependent); shard =
    * key mod `nShards`; `pos` = the example's 0-based write position
    * within its shard (ordered by key, then id for full determinism
    * under 60-bit collisions).
    *
    * Scale shape: ONE hash-partition exchange on `shard` — each shard
    * is exactly the unit a single output file/writer consumes, so the
    * per-shard `row_number` sort is the write order a sharded writer
    * must produce anyway, never a global sort. Shard sizes are
    * binomially tight around n/nShards (md5 uniformity); size
    * `nShards` to the target output-file granularity (corpus bytes /
    * desired file bytes), NOT to the executor count. */
  /** Deterministic hash-Bernoulli sampling: keep a row iff its 60-bit
    * md5(id:seed) key falls below ⌊rate·2⁶⁰⌋ (threshold computed
    * EXACTLY in BigInt — a double multiply could round across the
    * boundary). The primitive every 100 TB pipeline reaches for first:
    * unlike `sample()`/`rand(seed)`, the verdict is a pure function of
    * (id, seed) — reproducible across runs, partitionings, Spark
    * versions, and engines (the oracle replays it verbatim), and
    * per-row with no count pass. Thresholds NEST: the rate-p sample is
    * a strict subset of any rate-q > p sample under the same seed —
    * growing a sample never resamples (spec-pinned). Pure filter +
    * projection: zero exchanges, scan-bound at any scale.
    *
    * Output: input columns + `sample_key` (the 60-bit hash, kept so
    * downstream stages can sub-sample by tightening the threshold
    * without rehashing). */
  def hashSample(df: DataFrame, idCol: String, seed: String,
      rateNum: Long, rateDen: Long): DataFrame = {
    require(rateDen > 0 && rateNum > 0 && rateNum <= rateDen,
      s"need 0 < rate <= 1: $rateNum/$rateDen")
    val threshold = hashSampleThreshold(rateNum, rateDen)
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 15), 16, 10).cast("long")
    df.withColumn("sample_key", h)
      .filter(col("sample_key") < lit(threshold))
  }

  /** Exact 60-bit threshold for [[hashSample]]'s rate — exposed so
    * oracle SQL can interpolate the identical integer literal. */
  def hashSampleThreshold(rateNum: Long, rateDen: Long): Long =
    ((BigInt(1) << 60) * rateNum / rateDen).toLong

  def shuffleShard(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 15), 16, 10).cast("long")
    df.select(col(idCol).as("id"), h.as("shuffle_key"))
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)))
      .withColumn("pos",
        (row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("shuffle_key"), col("id"))) - 1).cast("long"))
  }

  /** Probability-proportional-to-size (PPS / weighted Bernoulli)
    * sampling: keep a row with probability min(1, weight ·
    * perUnitThreshold / 2⁶⁰), entirely in exact integer arithmetic —
    * the length-weighted document draw every mixture-building pipeline
    * runs ("sample tokens, not documents"), with [[hashSample]]'s
    * determinism guarantees: stable under corpus growth, nested under
    * threshold tightening, and engine-portable (the inclusion test
    * `h div K < w` is pure 60-bit-hash integer division — no float ever
    * enters, so DuckDB's `//` reproduces it bit-for-bit; `h < w·K`
    * would be the same predicate but can overflow Long, the div form
    * cannot). Rows with NULL or non-positive weight are excluded.
    * The weight column must be INTEGRAL (plan-time `require`): weights
    * ARE the exact per-unit counts the threshold multiplies — a
    * fractional weight would silently truncate (0.9 → 0 → excluded,
    * changing inclusion probability); pre-scale fractional weights to
    * integer units (e.g. milli-weights) and scale `perUnitThreshold`
    * down by the same factor.
    * Pure projection + filter: zero exchanges, scan-bound at any scale.
    *
    * Output: input columns + `pps_key` (the 60-bit hash, kept so
    * downstream stages can sub-sample without rehashing). */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String,
      seed: String, perUnitThreshold: Long): DataFrame = {
    require(perUnitThreshold > 0,
      s"perUnitThreshold must be positive: $perUnitThreshold")
    requireIntegral(df, weightCol, "ppsSample weight")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 15), 16, 10).cast("long")
    df.withColumn("pps_key", h)
      .filter(expr(s"pps_key div ${perUnitThreshold}L") <
        col(weightCol).cast("long"))
  }

  /** Per-key contribution cap: keep at most `maxPerKey` rows per key,
    * chosen in deterministic salted-hash order (the per-domain quota
    * that stops a handful of giant crawl domains from dominating a
    * training mix). Selection is hash-ORDERED, not hash-thresholded, so
    * every key yields min(|key|, maxPerKey) rows exactly.
    *
    * Scale shape: the selection is a bounded-heap [[TopKAgg]] aggregate
    * — ObjectHashAggregate(partial) caps every map partition at
    * `maxPerKey` rows per key before the shuffle, so a key with a
    * billion rows moves |partitions|·maxPerKey candidates, never the
    * corpus (the `row_number() OVER (PARTITION BY key)` formulation
    * this replaces funnels the key's whole population into one reducer
    * sort — the skew trap at 100 TB). The 52-bit salted hash is exactly
    * representable in the heap's Double score, so the aggregate's
    * (score DESC, id ASC) order over negated hashes is bit-identical to
    * the oracle's integer `ORDER BY h, id` row_number.
    *
    * Output: (keyCol, idCol, cap_rank 1..maxPerKey). */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String,
      seed: String, maxPerKey: Int): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey must be positive: $maxPerKey")
    // the heap carries ids as Long: a non-integral id (e.g. string doc
    // ids) would cast to NULL and silently corrupt the output
    requireIntegral(df, idCol, "capPerKey id")
    val h = conv(substring(md5(concat(col(keyCol).cast("string"),
      lit("#"), col(idCol).cast("string"), lit(":" + seed))), 1, 13),
      16, 10).cast("long")
    df.select(col(keyCol).as("__k"), col(idCol).cast("long").as("__id"),
        h.as("__h"))
      .groupBy(col("__k"))
      .agg(graft.functions.TopKAgg.topK(maxPerKey)(
        negate(col("__h").cast("double")), col("__id")).as("tk"))
      .select(col("__k"), posexplode(col("tk.items")))
      .select(col("__k").as(keyCol), col("col.id").as(idCol),
        (col("pos") + 1).cast("long").as("cap_rank"))
  }

  /** Exact integer token-quota apportionment (Hamilton / largest
    * remainder): split a token budget B across sources proportionally
    * to integer weights, with Σ quotas = B EXACTLY — floor shares
    * first, then the r = B − Σ⌊·⌋ leftover tokens go to the largest
    * remainders (ties by source name, so the plan is reproducible).
    * The planning step between [[temperatureWeights]] and a sampler:
    * floats drift and never sum to the budget; an apportionment does.
    *
    * Everything runs on the source-cardinality frame (one aggregate
    * for the weight total, one bounded rank window over sources).
    * CONTRACT: budget · max(weight) must fit in a Long — pre-scale
    * weights to a bounded unit (basis points / millionths, which is
    * what temperatureWeights emits) before apportioning a large
    * budget; apportionment is invariant under weight rescaling only
    * up to remainder ties, so declare the unit once and keep it.
    *
    * Output: (source col, weight, floor_q, rem, extra 0/1, quota). */
  def tokenQuota(weights: DataFrame, keyCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    requireIntegral(weights, weightCol, "tokenQuota weight")
    val w = weights.select(col(keyCol).as("k"),
      col(weightCol).cast("long").as("w"))
    // loud contract on the DATA (one aggregate over the bounded
    // source-cardinality frame): an all-zero/empty weight total makes
    // the proportional share a division by zero (ANSI runtime throw),
    // and negative weights break the proportional-share semantics —
    // both rejected up front instead of failing mid-plan.
    val chk = w.agg(coalesce(sum(col("w")), lit(0L)),
      coalesce(min(col("w")), lit(0L))).head()
    require(chk.getLong(1) >= 0,
      s"tokenQuota: negative weight in '$weightCol' " +
        s"(min = ${chk.getLong(1)}) — shares must be non-negative")
    require(chk.getLong(0) > 0,
      "tokenQuota: total weight must be positive — empty or all-zero " +
        "weights make proportional shares undefined")
    val tot = w.agg(sum(col("w")).as("tw"), count(lit(1)).as("nk"))
    val base = w.crossJoin(broadcast(tot))
      .select(col("k"), col("w"),
        expr(s"($budget * w) div tw").as("floor_q"),
        expr(s"($budget * w) % tw").as("rem"))
    val wOrd = Window.orderBy(col("rem").desc, col("k"))
    base
      .withColumn("rk", row_number().over(wOrd).cast("long"))
      .crossJoin(broadcast(base.agg(
        (lit(budget) - sum(col("floor_q"))).as("r"))))
      .select(col("k").as(keyCol), col("w").as(weightCol),
        col("floor_q"), col("rem"),
        when(col("rk") <= col("r"), 1L).otherwise(0L).as("extra"))
      .withColumn("quota", col("floor_q") + col("extra"))
  }

  /** EXACT global order index WITHOUT a global sort: every row gets a
    * contiguous 0..n−1 position ordered by (bucket asc, salted hash,
    * id) — the curriculum-ordering / stable-shuffle primitive ("easy
    * buckets first, random within bucket") that `orderBy` would
    * funnel through one range-partitioned sort. Two-level offsets
    * instead: per-(bucket, shard) counts cumulate into start offsets
    * on the BOUNDED cell frame (|buckets|·shards rows — the
    * packSequences two-level prefix-sum discipline), and each row's
    * index = its cell offset + its within-cell hash rank.
    *
    * Scale shape: one cell-count aggregate, one unpartitioned window
    * over the bounded cell frame (allowlisted), per-(bucket, shard)
    * rank windows sized by the shard count — which scales with the
    * corpus exactly like `spark.sql.shuffle.partitions` (the
    * stratifiedSplit contract). CONTRACT: bucketCol must be integral
    * with a BOUNDED domain (a difficulty decile, a length band —
    * never a key).
    *
    * Output: (idCol, bucket, idx 0..n−1). */
  def globalOrderIndex(df: DataFrame, idCol: String,
      bucketCol: String, seed: String, shards: Int = 16): DataFrame = {
    require(shards >= 1, s"shards must be positive: $shards")
    requireIntegral(df, idCol, "globalOrderIndex id")
    requireIntegral(df, bucketCol, "globalOrderIndex bucket")
    val hk = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 13), 16, 10).cast("long")
    val base = df.select(col(idCol).cast("long").as("id"),
        col(bucketCol).cast("long").as("bucket"), hk.as("hk"))
      .withColumn("shard", pmod(col("hk"), lit(shards.toLong)))
    val offsets = base.groupBy(col("bucket"), col("shard"))
      .agg(count(lit(1)).as("c"))
      .withColumn("o", sum(col("c")).over(
        Window.orderBy(col("bucket"), col("shard"))
          .rowsBetween(Window.unboundedPreceding, 0)) - col("c"))
      .select(col("bucket"), col("shard"), col("o"))
    val wCell = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("hk"), col("id"))
    base
      .withColumn("rn", row_number().over(wCell).cast("long") - 1L)
      .join(offsets, Seq("bucket", "shard"))
      .select(col("id").as(idCol), col("bucket"),
        (col("o") + col("rn")).as("idx"))
  }

  /** Epoch-based repetition mix: materialize each document's repeat
    * count for a training mix that sees source S `epochsX100/100`
    * times (the "epochs per dataset" knob of LLM data recipes —
    * upweighting high-quality sources by repetition rather than
    * loss weighting). Whole epochs replicate every doc; the
    * fractional remainder selects docs by the deterministic
    * hash-Bernoulli rule (the hashSample threshold convention), so
    * the realized per-source epoch count is exact in expectation and
    * reproducible row by row. Docs from sources missing in the
    * epochs spec get 0 copies (dropped from the mix — explicit is
    * better than an implicit 1).
    *
    * Scale shape: one broadcast join against the |sources|-bounded
    * epochs frame + a pure projection; the explode to physical
    * copies is the CALLER's choice (n_copies stays a count here —
    * 100 TB pipelines feed repeat counts to the loader instead of
    * materializing duplicates).
    *
    * Output: input id/source + (n_copies ≥ 0). */
  def epochsMix(df: DataFrame, idCol: String, sourceCol: String,
      epochs: DataFrame, epochsCol: String, seed: String)
      : DataFrame = {
    requireIntegral(df, idCol, "epochsMix id")
    requireIntegral(epochs, epochsCol, "epochsMix epochsX100")
    val e = epochs.select(col(sourceCol).as("__src"),
      col(epochsCol).cast("long").as("__ex100"))
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 15), 16, 10).cast("long")
    val perUnit = (1L << 60) / 100L
    df.join(broadcast(e), df(sourceCol) === col("__src"), "left_outer")
      .withColumn("__ex100", coalesce(col("__ex100"), lit(0L)))
      .withColumn("__hk", h)
      .withColumn("n_copies",
        expr(s"__ex100 div 100 + " +
          s"(CASE WHEN __hk div ${perUnit}L < __ex100 % 100 " +
          "THEN 1 ELSE 0 END)"))
      .drop("__src", "__ex100", "__hk")
  }

  /** EXACT stratified holdout split: assign each row to val/train so
    * that (a) the GLOBAL validation count is exactly ⌊n·valBp/10⁴⌋,
    * (b) each stratum's share of that budget is the largest-remainder
    * apportionment of its population ([[tokenQuota]] — floats drift,
    * apportionments sum exactly), and (c) WITHIN a stratum the chosen
    * rows are the smallest salted hashes (the capPerKey md5
    * convention) — deterministic, reproducible, and auditable row by
    * row. The sampler a "hold out 10%, stratified by source"
    * instruction actually means, where hash-Bernoulli only
    * approximates the proportions.
    *
    * Scale shape: selection quotas are pushed down a SECOND
    * apportionment level onto (stratum, shard) cells (shard =
    * hash % `shards`), so the within-cell hash ranking runs on
    * per-cell windows — size the shard count with the corpus exactly
    * like `spark.sql.shuffle.partitions` so cells stay task-sized
    * (the contract a repartition-sort already lives by; never one
    * reducer per stratum). Two bounded frames (strata,
    * strata × shards) carry all the planning; one eager count fixes
    * the global budget.
    *
    * Output: input id/stratum + (shard, hk, split ∈ val/train). */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
      seed: String, valBp: Long, shards: Int = 16): DataFrame = {
    require(valBp >= 1 && valBp <= 9999,
      s"valBp must be in [1, 9999]: $valBp")
    require(shards >= 1, s"shards must be positive: $shards")
    requireIntegral(df, idCol, "stratifiedSplit id")
    val hk = conv(substring(md5(concat(col(strataCol).cast("string"),
      lit("#"), col(idCol).cast("string"), lit(":" + seed))), 1, 13),
      16, 10).cast("long")
    val base = df.select(col(strataCol).as("g"),
        col(idCol).cast("long").as("id"), hk.as("hk"))
      .withColumn("shard", pmod(col("hk"), lit(shards.toLong)))
    val cells = base.groupBy(col("g"), col("shard"))
      .agg(count(lit(1)).as("c"))
    val strata = cells.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val n = base.count()
    val budget = n * valBp / 10000L
    // level 1: stratum quotas by largest remainder (Σ = budget)
    val quotas = tokenQuota(strata, "g", "n_g", budget)
      .select(col("g"), col("quota").as("q_g"))
    // level 2: cell quotas by largest remainder within each stratum
    // (Σ over shards = q_g; the rank window is per-stratum over ≤
    // `shards` rows — bounded)
    val wRem = Window.partitionBy(col("g"))
      .orderBy(col("rem").desc, col("shard"))
    val cellQ = cells.join(strata, "g").join(quotas, "g")
      .select(col("g"), col("shard"), col("c"),
        expr("(q_g * c) div n_g").as("fs"),
        expr("(q_g * c) % n_g").as("rem"), col("q_g"))
      .withColumn("rk", row_number().over(wRem).cast("long"))
      .withColumn("r_g", col("q_g") -
        sum(col("fs")).over(Window.partitionBy(col("g"))))
      .select(col("g"), col("shard"),
        (col("fs") + when(col("rk") <= col("r_g"), 1L).otherwise(0L))
          .as("q_cell"))
    // selection: the q_cell smallest hashes per cell (ties by id)
    val wCell = Window.partitionBy(col("g"), col("shard"))
      .orderBy(col("hk"), col("id"))
    base.join(cellQ, Seq("g", "shard"))
      .withColumn("rn", row_number().over(wCell).cast("long"))
      .select(col("g").as(strataCol), col("id").as(idCol),
        col("shard"), col("hk"),
        when(col("rn") <= col("q_cell"), "val").otherwise("train")
          .as("split"))
  }

  /** Per-group quantile-rank normalization: each row's value mapped to
    * its within-group cumulative-distribution rank in exact basis
    * points (rank_bp = ⌊cum·10⁴/n⌋, ties share the tie-group's upper
    * rank — cume_dist semantics kept integer). The cross-source score
    * calibration step of a mixing pipeline: per-source quality scores
    * are incomparable across sources (different scales, different
    * judges), their quantile ranks are — normalize first, THEN apply
    * one global threshold or temperature.
    *
    * Scale shape: the corpus is touched by one groupBy((group, value))
    * pass and one value-domain join back; the CDF window runs on the
    * value-domain frequency frame only (winsorizedStats discipline —
    * the window sorts the value DOMAIN, never the corpus). The rank
    * frame is (group × distinct values)-bounded.
    *
    * Output: input columns + rank_bp (1..10⁴; requires an integral
    * value column — the capPerKey contract). */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    requireIntegral(df, valueCol, "quantileNormalize value")
    val gc = groupCols.map(col)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(gc: _*)
    val ranks = df
      .groupBy(gc :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .select(gc :+ col(valueCol) :+
        expr("(__cum * 10000) div __n").as("rank_bp"): _*)
    df.join(ranks, groupCols :+ valueCol)
  }
}

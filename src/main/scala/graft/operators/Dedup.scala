package graft.operators

import graft.functions.MinHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators (north-star training-data pipeline;
  * not present in the reference — SURVEY.md §2.7 "Absent" + BASELINE.json
  * north_star).
  *
  * All operators are pure `Column` compositions over built-in functions —
  * no UDFs — so every hot path stays inside whole-stage codegen, and every
  * hash is derived from `md5` so results are engine-portable (the DuckDB
  * oracle computes the identical md5 strings).
  *
  * Scale design (100 TB posture):
  *  - exact dedup: hash-partitioned groupBy on a fingerprint — one shuffle
  *    of (fingerprint, id), never of full documents;
  *  - MinHash+LSH: signatures are k small strings per doc; candidate
  *    generation joins on (band, bandHash) buckets — pair blow-up is
  *    bounded by bucket size, never all-pairs;
  *  - n-gram Jaccard runs only on LSH candidate pairs at scale (the
  *    all-pairs form exists for oracle-sized validation).
  */
object Dedup {

  /** Word n-gram shingles of a whitespace-tokenized text column.
    * Documents with fewer than `n` words yield an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    // guard: Spark's sequence(1, x) DESCENDS for x < 1 — short docs must
    // yield an empty array, not [1, 0].
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: one representative (min id) per identical text.
    * Shuffles only (md5, id) pairs — at 100 TB the full text column never
    * crosses the network. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Prime modulus for the universal-hash MinHash family (2^31 − 1):
    * products A·h' stay under 2^62, so the identical arithmetic runs on
    * Spark Longs and DuckDB BIGINTs with no overflow divergence.
    * Single source of truth lives in [[graft.functions.MinHash]] (the
    * codegen'd expression must use the same family). */
  final val MinhashP = MinHash.P
  final val MinhashMul = MinHash.Mul
  final val MinhashAddMul = MinHash.AddMul
  final val MinhashAddOff = MinHash.AddOff

  /** Per-seed multiplier/offset of the (A·h + B) mod p family, derived
    * deterministically from the seed. The oracle SQL interpolates the
    * SAME named constants (PipelineQueries.SigCte), so the family can't
    * drift between engine and oracle. */
  def minhashA(seed: Int): Long = MinHash.seedA(seed)
  def minhashB(seed: Int): Long = MinHash.seedB(seed)

  /** MinHash signatures: rows (id, seed, minhash) for seeds 0..k-1.
    * NOTE: documents shorter than `shingleLen` words have NO shingles and
    * therefore no signature — they are invisible to the whole
    * minhash/LSH/jaccard near-dup chain (exact dedup still catches
    * identical short docs via `exact`). This is inherent to shingle-based
    * similarity, not an implementation gap.
    * ONE md5 per shingle (its first 15 hex chars as a 60-bit int), then
    * each seed's hash is the classic universal family
    * `(A_s·h' + B_s) mod p` over `h' = h mod p` — integer mixing instead
    * of k independent md5s, which cuts the dominant hashing cost ~k× at
    * identical statistical quality. Every step is reproducible in DuckDB
    * (md5 + BIGINT arithmetic), keeping oracle parity bit-exact.
    *
    * Single-pass: one groupBy over the shingle rows with k min-aggregate
    * columns, then a tiny unpivot — no k-way row explosion, so the
    * shuffle carries |shingles| rows instead of k·|shingles| and the agg
    * is map-side-combined. */
  def minhash(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleLen: Int): DataFrame =
    minhashSignatures(df, idCol, textCol, numHashes, shingleLen)
      .select(col("id"), posexplode(col("sig")).as(Seq("seed", "minhash")))

  /** Packed MinHash signatures: (id, sig array<long> of length k), one
    * row per doc with ≥ shingleLen words. THE scale substrate for the
    * LSH/jaccard/cluster chain: the whole signature is computed by the
    * codegen'd [[graft.functions.MinHash.MinHashSig]] expression in a
    * single pass over the text — no shingle explosion, no shuffle, the
    * document body never leaves its input partition. Bit-identical to
    * the exploded groupBy formulation (differential-tested in
    * DedupSpec). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleLen: Int): DataFrame =
    // eligibility is checked on the CHEAP equivalent predicate (word
    // count ≥ n ⟺ at least one shingle ⟺ non-empty signature) BEFORE
    // the projection: a post-hoc filter(size(sig) > 0) gets collapsed
    // into Filter(size(minhashsig(..)) > 0) + Project(minhashsig(..))
    // and the whole signature is computed TWICE per row (observed in
    // the executed plan; ~2× the dominant cost). Null texts fail the
    // predicate (size(null) = -1).
    // NOT fanned out (r21): MinHashSig is a fused one-pass kernel
    // with no row explosion (~0.15 s single-task over the whole bench
    // corpus), the dedup chains consume the sig subtree several
    // times (each reference would re-pay the exchange), and the
    // index-ingest path writes sigs to hot batch dirs whose file
    // count must stay bounded. The heavy EXPLODING kernels (shingle
    // explodes, media codecs) are the ones that fan out
    // (Tables.fanOutForKernel).
    df.filter(size(split(col(textCol), " ")) >= shingleLen)
      .select(col(idCol).as("id"),
        MinHash.minhashSig(col(textCol), numHashes, shingleLen).as("sig"))

  /** LSH band hashes from minhash rows: `bands` bands of
    * numHashes/bands rows each; bandHash = md5 of the band's minhashes in
    * seed order. One row (id, band, band_hash) per doc per band. */
  def lshBands(sig: DataFrame, bands: Int, numHashes: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes,
      s"numHashes=$numHashes not divisible by bands=$bands")
    sig
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(md5(array_join(array_sort(
        collect_list(concat_ws("|", col("seed"), col("minhash")))), ","))
        .as("band_hash"))
  }

  /** LSH band hashes straight from packed signatures — a pure
    * projection (per-band md5 over the band's "seed|minhash" strings,
    * string-sorted like [[lshBands]]), so the ONLY shuffle left in the
    * whole minhash→LSH chain is the candidate-pair bucket join.
    * Bit-identical to lshBands over the row form (differential-tested). */
  def lshBandsFromSig(sigDf: DataFrame, bands: Int, numHashes: Int)
      : DataFrame = {
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes,
      s"numHashes=$numHashes not divisible by bands=$bands")
    val bandHashes = transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(array_join(array_sort(
        transform(sequence(lit(0), lit(rowsPerBand - 1)), j => {
          val seed = b * rowsPerBand + j
          concat_ws("|", seed, col("sig")(seed))
        })), ",")))
    sigDf.select(col("id"),
      posexplode(bandHashes).as(Seq("band", "band_hash")))
  }

  /** Candidate near-dup pairs: docs sharing any LSH band bucket.
    * The join key (band, band_hash) is high-cardinality → well-distributed
    * shuffle; bucket sizes bound the pair count. */
  def lshCandidatePairs(bandDf: DataFrame): DataFrame = {
    val a = bandDf.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = bandDf.select(col("band"), col("band_hash"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for pairs of docs sharing at least
    * one shingle. `candidates`: optional (id_a, id_b) DataFrame to
    * restrict to (LSH output) — the scale path; all co-shingled pairs
    * otherwise (oracle-sized data only).
    *
    * Scale shape of the candidate path: shingles are joined TO the
    * candidate pairs (cand ⋈ shingles(a) ⋈ shingles(b)), so the shuffle
    * carries |cand|·avgShingles rows — never the all-pairs co-shingle
    * self-join, whose common-shingle keys fan out quadratically. */
  /** Per-candidate-pair distinct-shingle intersection counts — the
    * shared substrate of [[ngramJaccard]] and [[ngramContainment]]:
    * (id_a, id_b, n_shared, n_a, n_b) for each (deduped) candidate
    * pair whose docs both have ≥ shingleLen words and that share at
    * least one shingle. See the candidate-path notes in
    * [[ngramJaccard]] for why this shape (sorted-set arrays + the
    * codegen'd two-pointer merge) beats the exploded co-shingle join. */
  private def candidateSharedCounts(df: DataFrame, idCol: String,
      textCol: String, shingleLen: Int, c: DataFrame): DataFrame = {
    // NOT fanned out — same A/B rationale as [[minhashSignatures]]:
    // fused one-pass set builder, consumed by two joins
    val arr = df
      .filter(size(split(col(textCol), " ")) >= shingleLen)
      .select(col(idCol).as("id"),
        MinHash.sortedShingleSetCol(col(textCol), shingleLen).as("arr"))
    c.dropDuplicates("id_a", "id_b")
      .join(arr.select(col("id").as("id_a"), col("arr").as("arr_a")),
        Seq("id_a"))
      .join(arr.select(col("id").as("id_b"), col("arr").as("arr_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        MinHash.sortedIntersectCountCol(col("arr_a"), col("arr_b"))
          .as("n_shared"),
        size(col("arr_a")).cast("long").as("n_a"),
        size(col("arr_b")).cast("long").as("n_b"))
      .filter(col("n_shared") > 0)
  }

  /** Max-containment over LSH candidate pairs:
    * C(A,B) = |A∩B| / min(|A|,|B|) on distinct n-gram sets — the
    * asymmetric near-dup measure that catches a SMALL document embedded
    * in a LARGE one (quote farms, boilerplate wrappers, chunk/source
    * overlap), where Jaccard's union denominator dilutes toward 0.
    * Same candidate-path scale shape as [[ngramJaccard]]: intersections
    * are counted per LSH candidate pair only, never all-pairs. The
    * ratio is one IEEE divide of two exact Longs — engine-identical.
    * Output: (id_a, id_b, containment), threshold-filtered. */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, threshold: Double, candidates: DataFrame)
      : DataFrame =
    candidateSharedCounts(df, idCol, textCol, shingleLen, candidates)
      .withColumn("containment",
        col("n_shared") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))

  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, threshold: Double,
      candidates: Option[DataFrame] = None): DataFrame = {
    val withJaccard = (shared: DataFrame) => shared
      .withColumn("jaccard",
        col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    candidates match {
      case Some(c) =>
        // candidate path: ONE projection computes each doc's distinct
        // shingle set as a SORTED array; two equi-joins attach the sets
        // to the (deduped — a duplicate candidate row would emit a
        // duplicate result pair) candidate pairs and the intersection is
        // counted per pair by the codegen'd two-pointer merge
        // (MinHash.SortedIntersectCount — zero allocation, vs
        // array_intersect's per-call hash set). vs the exploded form: no
        // per-shingle groupBy and no third scan for the size table.
        // shingle-less docs are excluded by the CHEAP word-count
        // predicate BEFORE the array projection (a filter on size(arr)
        // would be pushed down with the whole expression substituted
        // and compute it twice per row); candidate pairs naming such a
        // doc simply drop out of the inner join — same outcome as the
        // all-pairs form, which never sees them
        // sorted-distinct shingle sets via the one-pass kernel
        // (MinHash.SortedShingleSet ≡ array_sort(array_distinct(
        // shingles(...))), UTF8-binary order — differential-tested).
        // n_shared > 0 in the helper keeps this path aligned with the
        // all-pairs form, which structurally omits zero-overlap pairs
        // (visible only at threshold <= 0)
        withJaccard(
          candidateSharedCounts(df, idCol, textCol, shingleLen, c))
      case None =>
        val docSh = graft.sources.Tables.fanOutForKernel(df)
          .select(col(idCol).as("id"),
            explode(array_distinct(shingles(col(textCol), shingleLen)))
              .as("sh"))
        val sizes = docSh.groupBy("id").agg(count(lit(1)).as("n_sh"))
        val a = docSh.select(col("id").as("id_a"), col("sh"))
        val b = docSh.select(col("id").as("id_b"), col("sh"))
        val shared = a.join(b, "sh").filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
          .join(sizes.withColumnRenamed("id", "id_a")
            .withColumnRenamed("n_sh", "n_a"), "id_a")
          .join(sizes.withColumnRenamed("id", "id_b")
            .withColumnRenamed("n_sh", "n_b"), "id_b")
        withJaccard(shared)
    }
  }

  /** 60-bit SimHash over word unigrams. Per word: 60 pseudo-random bits
    * from md5 (first 15 hex chars → Long); simhash bit i is set iff more
    * words have bit i set than unset. Output: (id, simhash Long).
    *
    * Computed by the codegen'd [[graft.functions.MinHash.SimHash]]
    * expression — one pass over the words per row, NO word explosion and
    * no shuffle at all (the old formulation shuffled |words| rows into a
    * 60-vote aggregate). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // NOT fanned out — same A/B rationale as [[minhashSignatures]]:
    // fused one-pass kernel, no row explosion
    df.filter(col(textCol).isNotNull) // exploded form dropped nulls
      .select(col(idCol).as("id"),
        MinHash.simhashCol(col(textCol)).as("simhash"))

  /** SimHash near-duplicate pairs via Hamming-distance banding — the
    * scale path that makes the fingerprints actionable: the 60-bit
    * simhash splits into `bands` contiguous chunks, docs sharing ANY
    * chunk value become candidates (a well-distributed (band, key)
    * bucket join — never all-pairs), and the exact Hamming distance
    * filters candidates. By pigeonhole, a pair within `maxHamming` <
    * `bands` differing bits must agree on at least one band, so unlike
    * the MinHash-LSH chain this banding has EXACT recall at the
    * configured radius (the standard Manku/Jain/Sarma web-dedup
    * construction). Output: (id_a, id_b, hamming). */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    // MinHash.SimHash packs 60 bits (md5-derived)
    hammingBandedPairs(simhash(df, idCol, textCol), "id", "simhash",
      bits = 60, maxHamming = maxHamming, bands = bands)

  /** Banded Hamming self-join over ANY Long fingerprint column
    * (SimHash, perceptual image hash, audio fingerprint, …): split the
    * `bits`-wide hash into `bands` equal slices, bucket-join on (band,
    * slice), keep pairs within `maxHamming`. Recall is EXACT by the
    * pigeonhole argument (maxHamming < bands ⇒ any qualifying pair
    * shares at least one untouched band — enforced), and the only
    * exchange is the band-key bucket join: candidates never blow up to
    * the all-pairs square. Output: (id_a < id_b, hamming). */
  def hammingBandedPairs(hashed: DataFrame, idCol: String,
      hashCol: String, bits: Int, maxHamming: Int, bands: Int)
      : DataFrame = {
    require(bits > 0 && bits <= 63, s"bits must be in 1..63: $bits")
    require(bands > 0 && bits % bands == 0,
      s"bands=$bands must divide $bits")
    require(maxHamming < bands,
      s"exact recall needs maxHamming=$maxHamming < bands=$bands " +
        "(pigeonhole: one band must be untouched)")
    val w = bits / bands
    val banded = hashed
      .select(col(idCol).as("id"), col(hashCol).as("__h"))
      .select(col("id"), col("__h"),
        posexplode(array((0 until bands).map { b =>
          shiftright(col("__h"), b * w)
            .bitwiseAND(lit((1L << w) - 1))
        }: _*)).as(Seq("band", "band_key")))
    val a = banded.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("__h").as("sh_a"))
    val b = banded.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("__h").as("sh_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components by
    * iterative min-label propagation — each doc ends up labeled with the
    * smallest doc id reachable through the pair graph, which is the
    * cluster representative a dedup pipeline keeps. Iterations are
    * bounded by the cluster diameter (tiny for near-dup graphs); each one
    * is a single edge⋈label shuffle + min-aggregate, so the operator is
    * the standard scalable label-propagation shape, never materializing
    * anything driver-side beyond a convergence count.
    *
    * Scale shape: propagation runs ONLY over the nodes that appear in a
    * pair — at corpus scale the near-dup graph is orders of magnitude
    * smaller than the corpus, so each iteration shuffles |graph| rows,
    * never |corpus|. Singletons (the overwhelming majority) join in once
    * at the end as their own cluster.
    *
    * With `shortcut` (default), each iteration adds POINTER JUMPING
    * (label compression, the classic parallel-CC shortcut): after the
    * neighbor step, every label is replaced by its label's label —
    * chain depths halve each round, so convergence needs O(log
    * diameter) iterations instead of O(diameter). On a pathological
    * 1000-doc duplicate CHAIN that is ~11 rounds instead of ~1000 —
    * at 100 TB the difference between a job and a hang. The extra
    * self-join doubles per-iteration shuffles, so for graphs KNOWN to
    * have tiny diameters (typical LSH near-dup blobs) `shortcut =
    * false` trades asymptotics back for constant factors. Fixpoints
    * are identical (compression preserves reachability and
    * monotonicity; differential-tested in DedupSpec).
    *
    * @param docs  table holding every doc (singletons keep their own id)
    * @param pairs (id_a, id_b) near-dup pairs, id_a < id_b
    */
  def dupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 100, shortcut: Boolean = true): DataFrame = {
    // cache the edge set: `pairs` is typically an expensive pipeline
    // (minhash→LSH→jaccard) that must not re-execute once per iteration
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
    // convergence check: per-id labels are MONOTONE non-increasing (next
    // = min(own, neighbors)), so the label sum strictly decreases on any
    // change and "sum unchanged ⟺ converged". One shuffle-free scalar
    // aggregate per iteration instead of a full labels⋈labels diff join
    // — at corpus scale that join was a second O(|graph|) shuffle per
    // iteration. decimal(38,0): a long sum overflows (ANSI-throws) at
    // ~1e9 rows of large ids.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("cluster").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).collect()(0).getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      iters += 1
      val viaNeighbors = edges
        .join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster"))
      val prop = labels.select(col("id"), col("cluster"))
        .unionAll(viaNeighbors)
        .groupBy("id").agg(min("cluster").as("cluster"))
      // pointer jumping: l(x) ← min(l(x), l(l(x))). Every label value
      // is a graph-node id (a min over seen ids), so l(l(x)) is always
      // defined; the inner join self-joins the (cached — three
      // consumers) label frame only.
      val propC = if (shortcut) Some(prop.cache()) else None
      val jumped = propC match {
        case None => prop
        case Some(p) =>
          val viaLabel = p.as("a")
            .join(p.as("b"), col("a.cluster") === col("b.id"))
            .select(col("a.id").as("id"), col("b.cluster").as("cluster"))
          p.unionAll(viaLabel)
            .groupBy("id").agg(min("cluster").as("cluster"))
      }
      // EAGER localCheckpoint, not cache: each round's plan references
      // the previous round's 2× (3× with the self-join) — an
      // exponentially growing lineage that OOMs plan stringification
      // after ~10 rounds. Checkpointing materializes the ~|graph|-row
      // label frame and truncates the plan to a leaf, keeping every
      // round's plan constant-size (and making the convergence
      // aggregate read materialized blocks).
      val next = jumped.localCheckpoint(true)
      val s = labelSum(next)
      propC.foreach(_.unpersist(): Unit)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
    }
    // silent non-convergence would split one true component into
    // several clusters and keep multiple "representatives" of the same
    // duplicate group — fail loudly instead (chain length > maxIters)
    require(converged,
      s"dupClusters did not converge in $maxIters iterations; " +
        "raise maxIters (bound = longest near-dup chain)")
    // labels left the loop already checkpointed (leaf plan, materialized
    // blocks) — the edge cache can release without risking a recompute
    // of the pairs pipeline
    val graphLabels = labels
    edges.unpersist(): Unit
    // singletons (docs in no pair) label themselves — one left join,
    // outside the iteration
    docs.select(col(idCol).as("id"))
      .join(graphLabels.withColumnRenamed("cluster", "_c")
        .withColumnRenamed("id", "_gid"),
        col("id") === col("_gid"), "left")
      .select(col("id"), coalesce(col("_c"), col("id")).as("cluster"))
  }

  /** Canonical-copy selection over duplicate clusters: within each
    * cluster KEEP the doc with the LARGEST `scoreCol`, ties to the
    * smallest id — "keep the best copy, not the first" (score =
    * char/token count keeps the least-truncated duplicate, the
    * standard crawl heuristic; any integral quality score plugs in).
    * Input `clusters` is [[dupClusters]]' `(id, cluster)` contract;
    * output: every doc with its cluster, score, keep verdict, and the
    * cluster's kept id — so a pipeline can either filter `keep` or
    * audit what beat each dropped copy.
    *
    * Scale shape: one join to attach scores (id-keyed), then the
    * per-cluster argmax as a struct-max AGGREGATE (score, −id) joined
    * back on cluster — two map-side-combined exchanges; no
    * per-cluster window sort, so a pathological mega-cluster (every
    * crawl has one boilerplate blob) costs O(1) aggregate state, not
    * a single-reducer sort. The score must be integral (same
    * plan-time guard as capPerKey: a non-integral cast would silently
    * corrupt the argmax). */
  def keepBest(clusters: DataFrame, scores: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = scores.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"keepBest score column `$scoreCol` must be integral, got $dt")
    val sc = scores.select(col(idCol).cast("long").as("id"),
      col(scoreCol).cast("long").as("score"))
    val j = clusters.join(sc, "id")
    val best = j.groupBy(col("cluster"))
      .agg(max(struct(col("score"), negate(col("id")).as("nid")))
        .as("m"))
      .select(col("cluster"), negate(col("m.nid")).as("keep_id"))
    j.join(best, "cluster")
      .select(col("id"), col("cluster"), col("score"),
        (col("id") === col("keep_id")).as("keep"), col("keep_id"))
  }

  /** INCREMENTAL exact dedup — the daily-increment shape every
    * production corpus runs (dedup the new batch AGAINST the existing
    * store, not the whole corpus from scratch): each new doc is marked
    * `is_dup` iff its content fingerprint already exists in
    * `storeFingerprints` (a frame with a `fingerprint` column — the
    * output convention of [[exact]]).
    *
    * Scale shape: semi + anti joins on the fingerprint — only
    * (fingerprint, id) pairs shuffle, never document bodies, and no
    * row multiplication however many times a fingerprint repeats in
    * the store (a left join would need a distinct pass first). The new
    * batch is the small side by construction; AQE broadcasts it
    * against a corpus-scale store. */
  def incrementalExact(newDocs: DataFrame, idCol: String, textCol: String,
      storeFingerprints: DataFrame): DataFrame = {
    val fp = newDocs.select(col(idCol).as("id"),
      md5(col(textCol)).as("fingerprint"))
    val store = storeFingerprints.select(col("fingerprint"))
    fp.join(store, Seq("fingerprint"), "left_semi")
      .withColumn("is_dup", lit(true))
      .unionAll(fp.join(store, Seq("fingerprint"), "left_anti")
        .withColumn("is_dup", lit(false)))
      .select(col("id"), col("fingerprint"), col("is_dup"))
  }

  /** Cross-frame LSH candidates — incremental near-dup: new-batch band
    * hashes joined against the STORED band table (the store keeps
    * (id, band, band_hash) rows, not texts), yielding (new_id, old_id)
    * candidate pairs for the jaccard/cosine confirm stage. Same
    * well-distributed (band, band_hash) bucket join as
    * [[lshCandidatePairs]], but across two frames — the new batch
    * never self-joins and the store is touched only on matching
    * buckets. */
  def lshCandidatePairsAcross(newBands: DataFrame, storedBands: DataFrame)
      : DataFrame = {
    val a = newBands.select(col("band"), col("band_hash"),
      col("id").as("new_id"))
    val b = storedBands.select(col("band"), col("band_hash"),
      col("id").as("old_id"))
    a.join(b, Seq("band", "band_hash"))
      .select(col("new_id"), col("old_id"))
      .distinct()
  }

  /** Signature-estimated similarity for cross-frame candidates — the
    * confirm stage of the GROWING-index path that never re-reads
    * stored TEXT: per candidate (new_id, old_id), the count of EQUAL
    * minhash components between the batch's fresh signature and the
    * signature ALREADY IN THE INDEX (the unbiased MinHash estimator:
    * E[matches/k] = Jaccard). Output (new_id, old_id, matches), exact
    * integers.
    *
    * Scale shape: two id-keyed hash joins against signature frames of
    * k longs per doc (index-resident metadata, never corpus text)
    * over LSH-bounded candidates; the per-pair count is a codegen'd
    * zip_with/aggregate projection — no explode, no shuffle beyond
    * the joins. */
  def signatureMatchesAcross(pairs: DataFrame, newSigs: DataFrame,
      storedSigs: DataFrame): DataFrame =
    pairs
      .join(newSigs.select(col("id").as("new_id"), col("sig").as("__sa")),
        "new_id")
      .join(storedSigs.select(col("id").as("old_id"),
        col("sig").as("__sb")), "old_id")
      .select(col("new_id"), col("old_id"),
        expr("""aggregate(zip_with(__sa, __sb,
          (x, y) -> IF(x = y, 1L, 0L)), 0L, (a, v) -> a + v)""")
          .as("matches"))

  /** One maintenance step of a GROWING MinHash-LSH index — dedup the
    * arriving batch against the store and compute the index DELTA,
    * WITHOUT re-signing the corpus: the store contributes only its
    * persisted (id, band, band_hash) and (id, sig) frames (what
    * [[lshBandsFromSig]] / [[minhashSignatures]] wrote when each past
    * batch arrived), never its documents. The daily-increment shape:
    * sign the new batch once, bucket-join its bands against the index
    * ([[lshCandidatePairsAcross]]), confirm candidates by the
    * signature-match estimator ([[signatureMatchesAcross]]), and
    * append only the NON-duplicates' band rows — a duplicate must not
    * enter the index, or every later copy of a template chains to a
    * dup instead of the canonical.
    *
    * Returns (marks, delta): marks = (id, is_dup) for every signed
    * new doc; delta = the (id, band, band_hash) rows to append.
    * The signature delta is `newSigs` anti-joined the same way —
    * callers persisting both frames keep the index self-contained.
    *
    * 100 TB posture: per step the store-side work is one bucket join
    * on (band, band_hash) (bounded by true collisions) and one
    * id-keyed join against the signature table; nothing rescans or
    * re-hashes stored documents, so step cost tracks the BATCH size
    * while the store grows unbounded. */
  def lshIndexIngest(newSigs: DataFrame, storedBands: DataFrame,
      storedSigs: DataFrame, bands: Int, numHashes: Int,
      minMatches: Int,
      /** also catch duplicates WITHIN the arriving batch (two copies
        * of a novel template in one increment would otherwise both
        * enter the index): a new doc is a dup if it matches the store
        * OR an earlier (smaller-id) batch sibling — the deterministic
        * arrival-order rule, same tie-break as [[exact]]'s min-id
        * canonical. */
      withinBatch: Boolean = false): (DataFrame, DataFrame) = {
    val newBands = lshBandsFromSig(newSigs, bands, numHashes)
    val conf = signatureMatchesAcross(
      lshCandidatePairsAcross(newBands, storedBands),
      newSigs, storedSigs)
    lshIndexIngestFrom(newSigs, newBands, conf, minMatches, withinBatch)
  }

  /** The decision half of [[lshIndexIngest]], split out so callers
    * that PRUNE the store reads (the two-tier persistent index in
    * [[graft.streaming.StreamIngest]] — bucket-pruned epoch scans plus
    * a bloom prefilter) can supply their own store-confirm frame
    * `storeConf` = (new_id, old_id, matches) while sharing the exact
    * marks/delta semantics: a pruned read is only legitimate if the
    * decision logic is IDENTICAL to the unpruned one's. */
  def lshIndexIngestFrom(newSigs: DataFrame, newBands: DataFrame,
      storeConf: DataFrame, minMatches: Int,
      withinBatch: Boolean): (DataFrame, DataFrame) = {
    val storeDups = storeConf.filter(col("matches") >= minMatches)
      .select(col("new_id").as("id"))
    val dupIds = (if (!withinBatch) storeDups else {
      // self-candidates within the batch: the LATER (larger-id) side
      // of each matching pair is the dup — exactly one canonical per
      // within-batch duplicate group survives into the index
      val selfPairs = lshCandidatePairs(newBands)
        .select(col("id_b").as("new_id"), col("id_a").as("old_id"))
      val selfDups = signatureMatchesAcross(selfPairs, newSigs, newSigs)
        .filter(col("matches") >= minMatches)
        .select(col("new_id").as("id"))
      storeDups.unionAll(selfDups)
    }).distinct()
    val marks = newSigs.select(col("id"))
      .join(dupIds.withColumn("is_dup", lit(true)), Seq("id"), "left")
      .na.fill(false, Seq("is_dup"))
    val delta = newBands.join(dupIds, Seq("id"), "left_anti")
    (marks, delta)
  }

  /** Embedding near-duplicates: pairs with cosine ≥ threshold.
    * All-pairs form — oracle-sized data / differential tests only;
    * `embeddingNearDupLsh` is the scale path. */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    Similarity.cosinePairs(emb, idCol, vecCol).filter(col("cosine") >= threshold)

  /** Embedding near-duplicates via SRP-LSH buckets — the 100 TB path:
    * candidates come from a bucketed self-join (each table's join key is
    * (bucket), so pair work is bounded by bucket occupancy, never |n|²);
    * exact cosine is then computed only for candidates. Recall < 1 by
    * construction; at near-dup thresholds (≥0.95 ≈ 18° apart) a missed
    * pair must flip a sign in every table — with 8 planes × 8 tables the
    * miss probability is ≈1%. Raise `numTables` to trade cost for recall. */
  def embeddingNearDupLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, numPlanes: Int = 8, numTables: Int = 8)
      : DataFrame =
    Similarity.cosineNearPairsLsh(emb, idCol, vecCol, threshold, dim,
      numPlanes, numTables)
}

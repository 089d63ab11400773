package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.functions.TopKAgg
import graft.functions.MatrixExpressions.{matArgmax, matTopN, pqEncode, pqLut, srpPack}
import graft.functions.VectorExpressions.{vecDot, vecNormSq}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star operator; absent
  * in the reference — BASELINE.json north_star).
  *
  * Hot kernels (dot product, squared norm) are custom codegen'd Catalyst
  * expressions (graft.functions.VectorExpressions) — Spark's higher-order
  * functions interpret their lambda per element, which dominates cost at
  * millions of pairs. Fold order is identical, so results are unchanged.
  * Norms are computed once per vector, not once per pair.
  *
  * Scale paths:
  *  - `bruteForceTopK`: broadcast the (small) query side; the corpus
  *    streams through executors once — correct baseline, cost O(|Q|·|C|).
  *  - `lshTopK`: sign-random-projection buckets (hyperplanes derived
  *    deterministically from md5) → candidates join within buckets only —
  *    the 100 TB path. Recall < 1 by construction; raise `numTables` to
  *    trade cost for recall.
  */
object Similarity {

  /** Cast a float/double array column to array<double> (so arithmetic is
    * double-precision IEEE on both our side and any oracle engine). */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Per-vector symmetric int8 quantization — the storage/bandwidth step
    * every embedding corpus at 100 TB takes before ANN serving (4× over
    * float32, 8× over float64; pq/ivfadc quantize HARDER but lossier —
    * this is the lossless-enough tier serving re-rankers read).
    *
    * Entirely in EXACT INTEGER space so the codes hash-match any engine
    * (the round-6/7 lesson: never round a double that two engines
    * computed, only round doubles that are row-local and tie-safe):
    *   v_u   = round(x · 1e6)  — micro-units; round-to-integer of a
    *           double is cross-engine safe (ties are exactly-.5 doubles,
    *           both engines round ties away from zero)
    *   scale_u = max_i |v_u,i| — the vector's symmetric range, exact Long
    *   code_i  = round(127 · v_u,i / scale_u) computed as the SIGN-SPLIT
    *           exact-integer half-up  sgn(v) · ((254·|v| + s) div (2s))
    *           — the unsplit (2p+q) div (2q) form is WRONG for negative
    *           p under toward-zero division (e.g. exact −127 → −126);
    *           splitting on sign makes it round-half-away-from-zero,
    *           symmetric, and identical under JVM `div` ≡ DuckDB `//`
    *   err_u  = |127·v_u − code·scale_u| ≤ ⌈scale_u/2⌉ — the per-element
    *           quantization error in (micro × 127) units, exact Long
    * All-zero vectors quantize to all-zero codes (scale_u = 0 guard;
    * ANSI mode would otherwise raise DIVIDE_BY_ZERO).
    *
    * Scale shape: pure per-row projection — transform/aggregate lambdas
    * + posexplode, ZERO exchanges (plan-pinned in SimilaritySpec); at
    * 1000 executors it is scan-bound, embarrassingly parallel. */
  def quantizeInt8(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    emb
      .select(col(idCol), transform(col(vecCol),
        x => round(x.cast("double") * 1e6, 0).cast("long")).as("v_u"))
      .withColumn("scale_u",
        aggregate(col("v_u"), lit(0L), (a, x) => greatest(a, abs(x))))
      .select(col(idCol), col("scale_u"),
        posexplode(col("v_u")).as(Seq("dim", "vu")))
      .withColumn("code",
        when(col("scale_u") === 0L, lit(0L)).otherwise(
          signum(col("vu")).cast("long") *
            expr("(254 * abs(vu) + scale_u) div (2 * scale_u)")))
      .select(col(idCol), col("dim").cast("long").as("dim"), col("code"),
        col("scale_u"),
        abs(lit(127L) * col("vu") - col("code") * col("scale_u"))
          .as("err_u"))
  }

  /** 1-bit (sign) binary quantization of a ≤64-dim embedding into ONE
    * Long (bit i = v[i] > 0): the 64× memory compression of modern
    * binary-embedding retrieval — a billion vectors become 8 GB of
    * codes, and similarity becomes one XOR+popcount per pair. */
  def binaryQuantize(vec: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, s"dim must be in 1..64: $dim")
    // unrolled sum of distinct powers of two — every partial sum IS a
    // valid bit pattern, so no ANSI overflow even with bit 63 (whose
    // literal is Long.MinValue); pure codegen, no lambda dispatch
    (0 until dim).map(i =>
        when(element_at(vec, i + 1) > 0, lit(1L << i))
          .otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Binary-quantized top-k: rank corpus codes by Hamming distance to
    * each query's code (ties by neighbor id) — the coarse first stage
    * of a binary-retrieval cascade (re-rank survivors with exact
    * cosine via [[bruteForceTopK]]'s machinery when precision
    * matters). EXACT integers end to end: the ranking is fully
    * DuckDB-oracle-able, no degenerate config needed.
    *
    * Scale shape: queries' codes broadcast; the corpus moves ONE Long
    * per row through the bounded-heap two-phase [[TopKAgg]] ranking —
    * the cheapest candidate generator in the ANN family. */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int,
      excludeSelfMatches: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      binaryQuantize(col(vecCol), dim).as("qc")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      binaryQuantize(col(vecCol), dim).as("cc"))
    val scored = c.join(q,
        if (excludeSelfMatches) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        bit_count(col("qc").bitwiseXOR(col("cc"))).cast("long")
          .as("hamming"))
    val tk = TopKAgg.topK(k)
    scored
      .groupBy(col("query_id"))
      .agg(tk(negate(col("hamming").cast("double")),
        col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.items")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"),
        negate(col("col.score")).cast("long").as("hamming"))
  }

  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = sqrt(vecNormSq(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed dot and norms, GUARDED for zero norms:
    * ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO even for double
    * division, so a single zero-norm embedding would otherwise kill the
    * whole query; a null cosine instead flows to the rank stages' null
    * filters (excluded — no defined similarity). */
  private def safeCosine(dot: Column, na: Column, nb: Column): Column =
    when(na * nb > 0, dot / (na * nb))

  /** id/vector/precomputed-norm projection. Ids are surfaced as BIGINT
    * (the rank stage aggregates (score, id) pairs in a typed buffer),
    * so the id column must be INTEGRAL — checked here rather than left
    * to the cast, which would throw CAST_INVALID_INPUT mid-query under
    * ANSI mode or (ANSI off) null the ids and silently EMPTY the
    * result via the self-match filter. Non-numeric ids: add a
    * surrogate (e.g. monotonically_increasing_id) first. */
  private def prep(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vAs: String, nAs: String): DataFrame = {
    requireIntegralId(df, idCol)
    df.select(col(idCol).cast("long").as(idAs),
        asDouble(col(vecCol)).as(vAs))
      .withColumn(nAs, sqrt(vecNormSq(col(vAs))))
  }

  /** The integral-id contract shared by every BIGINT-id projection —
    * [[prep]] and the vector-keeping writer projection
    * [[ivfAssignFixedKeep]] alike: a direct cast would throw
    * CAST_INVALID_INPUT mid-query under ANSI mode or (ANSI off) null
    * the ids silently, and a double id would TRUNCATE. Checked before
    * the cast so a bad id column fails loudly on every face, not just
    * the ones that happen to route through [[prep]]. Case-insensitive
    * field lookup, matching Spark's default column resolution;
    * ambiguous/missing names fall through to Spark's own resolution
    * error rather than a misleading contract message. */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit =
    df.schema.fields.filter(_.name.equalsIgnoreCase(idCol)) match {
      case Array(f) =>
        require(Seq(org.apache.spark.sql.types.ByteType,
            org.apache.spark.sql.types.ShortType,
            org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.LongType).contains(f.dataType),
          s"ANN id column '$idCol' must be integral (got " +
            s"${f.dataType.simpleString}); add a numeric surrogate id " +
            "for string-keyed corpora")
      case _ => ()
    }

  /** Quantizer training wants at least this many sample points per
    * centroid (the FAISS train-set rule of thumb) — `sampleN` is a
    * floor, and the effective sample auto-grows with the codebook. */
  private val MinPointsPerCentroid = 50

  /** Codebooks up to this size train on the driver (deterministic,
    * bit-stable Lloyd over a bounded collected sample); larger ones go
    * through [[kmeansCentroidsDistributed]] so neither the sample nor
    * the per-iteration state ever concentrates on the driver beyond the
    * centroid table itself. */
  private val DriverLloydMaxK = 1024

  /** Bounded deterministic training sample as a DataFrame: vectors
    * ordered by xxhash64(id), truncated to `n` — a pseudo-uniform draw
    * independent of id locality (first-N-by-id, the previous scheme,
    * over-samples whatever shard sorts first in a corpus written in
    * source order). The sort+limit plans as TakeOrderedAndProject:
    * per-partition bounded heaps, no global sort, and only the n
    * winners ever move. */
  private def sampleFrame(df: DataFrame, idCol: String, vecCol: String,
      n: Int): DataFrame =
    prep(df, idCol, vecCol, "id", "v", "n")
      .where(col("v").isNotNull) // null embeddings are unindexable
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(n)

  /** Driver-side collect of [[sampleFrame]] (PQ codebooks and
    * small-codebook coarse quantizers — shared guard + convention). */
  private def sampleVectors(df: DataFrame, idCol: String, vecCol: String,
      sampleN: Int, who: String): Array[Array[Double]] = {
    val sample = sampleFrame(df, idCol, vecCol, sampleN)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty,
      s"$who: corpus is empty — nothing to train on")
    sample
  }

  /** Coarse-quantizer front end shared by IVF/IVFADC/SemDeDup: sizes
    * the sample to the codebook (max(sampleN, MinPointsPerCentroid ·
    * nlist)), trains small codebooks on the driver (bit-stable) and
    * large ones distributed.
    *
    * Sizing rule at scale: nlist ≈ √|corpus| keeps inverted lists ≈ √n
    * long (scan cost per probe ≈ list length), so a 10⁹-vector corpus
    * wants nlist ≈ 3·10⁴ and a 50·nlist ≈ 1.5·10⁶-vector training set —
    * far past any fixed driver-side cap; the distributed path exists
    * for exactly that regime. */
  private def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, sampleN: Int, who: String)
      : Array[Array[Double]] = {
    val effN = math.max(sampleN, MinPointsPerCentroid * nlist)
    if (nlist <= DriverLloydMaxK)
      kmeansCentroids(sampleVectors(df, idCol, vecCol, effN, who),
        nlist, iters)
    else
      kmeansCentroidsDistributed(
        sampleFrame(df, idCol, vecCol, effN), nlist, iters, who)
  }

  /** Distributed Lloyd for codebooks past [[DriverLloydMaxK]]: the
    * sample never lands on the driver — each iteration assigns with the
    * [[matArgmax]] kernel (a pure projection over the broadcast literal
    * centroids, O(nlist·dim) per row) and recenters with ONE bounded
    * groupBy whose result is exactly the (nlist × dim) sum table, i.e.
    * the size of the centroids themselves. Driver memory is therefore
    * O(nlist·dim) regardless of corpus or sample size — the round-5
    * ceiling (nlist ≤ 2048, first-by-id sample) removed.
    *
    * Same dot-metric scheme as [[kmeansCentroids]]: points
    * L2-normalized once (prep's precomputed norm), centroids normalized
    * each round (normalizing the sum ≡ normalizing the mean), empty
    * clusters keep their previous centroid, init = first nlist rows of
    * the hash-ordered sample. Unlike the driver path, float partial-sum
    * order follows the partitioning, so re-runs can differ at ulp level
    * — acceptable for approximate-by-design indexes (rows-only registry
    * entries; recall pinned in SimilaritySpec). */
  private[operators] def kmeansCentroidsDistributed(sample: DataFrame,
      nlist: Int, iters: Int, who: String): Array[Array[Double]] = {
    val pts = sample.select(
        when(col("n") > 0, transform(col("v"), _ / col("n")))
          .otherwise(col("v")).as("v"))
      .cache()
    try {
      var cents = pts.limit(nlist).collect()
        .map(_.getSeq[Double](0).toArray)
      require(cents.nonEmpty,
        s"$who: corpus is empty — nothing to train on")
      for (_ <- 0 until iters) {
        val sums = pts
          .select(matArgmax(col("v"), cents).as("c"),
            posexplode(col("v")))
          .groupBy(col("c"), col("pos"))
          .agg(sum(col("col")).as("s"), count(lit(1)).as("cnt"))
          .collect()
        val dim = cents(0).length
        val acc = Array.fill(cents.length)(new Array[Double](dim))
        val cnt = new Array[Long](cents.length)
        sums.foreach { r =>
          val c = r.getInt(0)
          val p = r.getInt(1)
          // tolerate contract-violating corpora the same way the
          // assignment kernels do (math.min over lengths): positions
          // past the init dim are ignored, and a dim whose sum is null
          // (a null vector element poisoned it) stays at 0.0 —
          // excluded from the recentred direction — rather than
          // crashing the driver mid-training
          if (p < dim) {
            // cluster size from pos==0 rows ONLY: every vector emits a
            // pos-0 row, so this is THE cluster count — deriving it
            // from whichever (c,pos) row collect() happened to order
            // last would make ragged-corpus recentring
            // order-dependent
            if (p == 0) cnt(c) = r.getLong(3)
            if (!r.isNullAt(2)) acc(c)(p) = r.getDouble(2)
          }
        }
        cents = cents.indices.map { c =>
          if (cnt(c) == 0L) cents(c)
          else {
            val s = acc(c)
            val nrm = math.sqrt(s.map(x => x * x).sum)
            if (nrm == 0) s else s.map(_ / nrm)
          }
        }.toArray
      }
      cents
    } finally { pts.unpersist(); () }
  }

  /** Shared rank stage of the ANN family: (query_id, neighbor_id,
    * cosine) → (query_id, rank, neighbor_id, cosine_r), rank 1..k by
    * round(cosine,6) DESC, neighbor_id ASC.
    *
    * TWO-PHASE top-k, not a row_number window: the window form funnels
    * every scored candidate of a query onto one reducer (for PQ/brute
    * force that is the whole corpus per query — a per-query serial sort
    * at 100 TB). The bounded-heap aggregate ranks per input partition
    * map-side, shuffles only |partitions|·O(k) pre-ranked rows per
    * query, and merges bounded buffers. Rankings are bit-identical to
    * the window form (TopKAgg ordering = Spark SortOrder double
    * semantics; differential-tested in SimilaritySpec). */
  private def topKPerQuery(scored: DataFrame, k: Int,
      scoreIn: String = "cosine", scoreOut: String = "cosine_r")
      : DataFrame = {
    val tk = TopKAgg.topK(k)
    scored
      .select(col("query_id"), round(col(scoreIn), 6).as("score"),
        col("neighbor_id"))
      // null AND NaN scores (null / zero-norm embeddings — a zero-norm
      // cosine is 0/0 = NaN, which would rank FIRST under TopKAgg's
      // NaN-greatest ordering) are EXCLUDED: a candidate with no
      // defined similarity has no business in a top-k
      .where(col("score").isNotNull && !isnan(col("score")))
      .groupBy(col("query_id"))
      .agg(tk(col("score"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.items")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as(scoreOut))
  }

  /** IVF coarse assignment against a FIXED index-resident codebook —
    * the maintenance half of a persistent IVF index (the ANN twin of
    * the growing MinHash-LSH index): new embeddings join an existing
    * index by nearest-anchor assignment alone, with NO re-clustering
    * and NO scan of the stored corpus. The k anchor vectors ride into
    * the plan as literals and the argmax is ONE codegen'd projection
    * per row — zero shuffle, so ingest cost tracks the batch size
    * while the store grows unbounded (re-train the codebook
    * out-of-band when drift warrants, as production IVF systems do).
    *
    * Determinism contract (what the DuckDB oracle mirrors, unlike the
    * trained-codebook [[ivfTopK]] whose quality is recall-floored):
    * similarity = round(cosine, 6), ties break to the SMALLEST list
    * id, zero-norm vectors are excluded (no defined similarity). */
  def ivfAssignFixed(emb: DataFrame, idCol: String, vecCol: String,
      anchors: Seq[(Int, Array[Double])]): DataFrame = {
    require(anchors.nonEmpty, "ivfAssignFixed: empty codebook")
    val prepped = prep(emb, idCol, vecCol, "vec_id", "v", "vn")
      .filter(col("vn") > 0)
    // ONE kernel node regardless of nlist (r16): the previous form
    // folded one typedLit struct per anchor through a when-chain —
    // O(nlist) plan nodes, the literal-array pattern that becomes the
    // bottleneck at production nlist ≈ √n. IvfAssign6 honors the same
    // determinism contract (round(cos,6), strict > ⇒ tie to the
    // smallest list id — the oracle's (cos_r DESC, list ASC) rank),
    // differential-pinned bit-identical in MatrixExpressionsSpec.
    val sorted = anchors.sortBy(_._1)
    sorted.foreach { case (listId, a) =>
      require(a.exists(_ != 0.0),
        s"ivfAssignFixed: zero-norm anchor $listId")
    }
    val assign = graft.functions.MatrixExpressions.ivfAssign6(
      col("v"), sorted.map(_._2).toArray,
      sorted.map(_._1.toLong).toArray)
    prepped.select(col("vec_id"), assign.as("__a"))
      .select(col("vec_id"), col("__a.list").as("list"),
        col("__a.cos_r").as("cos_r"))
  }

  /** [[ivfAssignFixed]] KEEPING the original vector column — ONE
    * zero-shuffle projection producing (vec_id, list, vec), for the
    * writers that store the assignment next to the vector (the index
    * ingest and per-list repair paths): the assign-then-join-back
    * form those paths previously used shuffled both sides on vec_id
    * to re-attach a column the kernel's input row already carried.
    * Same determinism contract and zero-norm exclusion as
    * [[ivfAssignFixed]]. */
  def ivfAssignFixedKeep(emb: DataFrame, idCol: String,
      vecCol: String, anchors: Seq[(Int, Array[Double])])
      : DataFrame = {
    require(anchors.nonEmpty, "ivfAssignFixedKeep: empty codebook")
    requireIntegralId(emb, idCol) // the [[prep]] contract — a raw
    // cast would truncate double ids on THIS face while the codes
    // face (routed through prep) refuses, corrupting one face only
    val sorted = anchors.sortBy(_._1)
    sorted.foreach { case (listId, a) =>
      require(a.exists(_ != 0.0),
        s"ivfAssignFixedKeep: zero-norm anchor $listId")
    }
    val prepped = emb.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("vec"),
        asDouble(col(vecCol)).as("__v"))
      .withColumn("__vn", sqrt(vecNormSq(col("__v"))))
      .filter(col("__vn") > 0)
    val assign = graft.functions.MatrixExpressions.ivfAssign6(
      col("__v"), sorted.map(_._2).toArray,
      sorted.map(_._1.toLong).toArray)
    prepped.select(col("vec_id"), assign.as("__a"), col("vec"))
      .select(col("vec_id"), col("__a.list").as("list"), col("vec"))
  }

  /** Deterministic MULTI-probe selection over the fixed codebook: per
    * query the nProbe best lists on the 6dp contract (round(cos,6)
    * DESC, ties to the smallest list — [[ivfAssignFixed]]'s exact
    * ranking extended past rank 1; one kernel node regardless of
    * nlist), exploded to (vec_id, list, cos_r) rows in probe order.
    * nProbe = 1 reproduces ivfAssignFixed's pick bit-for-bit. */
  def ivfProbeFixed(emb: DataFrame, idCol: String, vecCol: String,
      anchors: Seq[(Int, Array[Double])], nProbe: Int): DataFrame = {
    require(anchors.nonEmpty, "ivfProbeFixed: empty codebook")
    require(nProbe >= 1, s"ivfProbeFixed: nProbe=$nProbe")
    val prepped = prep(emb, idCol, vecCol, "vec_id", "v", "vn")
      .filter(col("vn") > 0)
    val sorted = anchors.sortBy(_._1)
    sorted.foreach { case (listId, a) =>
      require(a.exists(_ != 0.0),
        s"ivfProbeFixed: zero-norm anchor $listId")
    }
    val probes = graft.functions.MatrixExpressions.ivfProbe6(
      col("v"), sorted.map(_._2).toArray,
      sorted.map(_._1.toLong).toArray, nProbe)
    prepped.select(col("vec_id"), explode(probes).as("__p"))
      .select(col("vec_id"), col("__p.list").as("list"),
        col("__p.cos_r").as("cos_r"))
  }

  /** [[ivfTopKPreAssigned]] at nProbe ≥ 1 — the multi-probe
    * index-resident serve, the standard IVF recall lever: each query
    * scores the UNION of its nProbe probed lists' stored vectors. A
    * stored vector lives in exactly ONE list and a query's probed
    * lists are distinct, so no dedup pass is needed; per-query work
    * is nProbe·(corpus/nlist), still never all-pairs, and the
    * stored-side I/O stays bounded by the probed partitions
    * ([[graft.streaming.StreamIngest.ivfIndexTopK]] prunes the epoch
    * listing to the union of probed lists). Deterministic end to end
    * (probe selection AND ranking on the 6dp contract) — hash-checked
    * like the nProbe=1 face, not recall-floored. */
  def ivfTopKPreAssignedMulti(queries: DataFrame, assigned: DataFrame,
      idCol: String, vecCol: String,
      anchors: Seq[(Int, Array[Double])], k: Int,
      nProbe: Int): DataFrame = {
    val qa = ivfProbeFixed(queries, idCol, vecCol, anchors, nProbe)
      .select(col("vec_id").as("query_id"), col("list"))
    val q = prep(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = assigned
      .select(col("vec_id").cast("long").as("neighbor_id"),
        col("list").cast("long").as("list"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(vecNormSq(col("cv"))))
      .filter(col("cn") > 0)
    val scored = qa.join(q, "query_id").join(c, "list")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  /** nProbe=1 IVF query over the fixed codebook: each query searches
    * ONLY its own list's members — the index-resident probe path,
    * deterministic end to end (assignment and ranking both on the
    * 6dp contract), so it is hash-checked rather than
    * recall-floored. The list join shuffles each side once on the
    * list id; per-list work is corpus/k, never all-pairs. */
  def ivfTopKFixed(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      anchors: Seq[(Int, Array[Double])], k: Int): DataFrame = {
    val qa = ivfAssignFixed(queries, idCol, vecCol, anchors)
      .select(col("vec_id").as("query_id"), col("list"))
    val ca = ivfAssignFixed(corpus, idCol, vecCol, anchors)
      .select(col("vec_id").as("neighbor_id"), col("list"))
    val q = prep(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    // zero-norm rows never appear: the assignment frames exclude them
    val scored = qa.join(q, "query_id")
      .join(ca.join(c, "neighbor_id"), "list")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  /** [[ivfTopKFixed]] over a PRE-ASSIGNED corpus — the index-resident
    * probe: the stored index already carries each vector's list (from
    * its ingest-time [[ivfAssignFixed]]), so the query pays its own
    * assignment projection plus ONE list-keyed join into the index —
    * the stored corpus is never re-assigned, the other lists' vectors
    * are never scored. `assigned` = (vec_id, list, `vecCol`). */
  def ivfTopKPreAssigned(queries: DataFrame, assigned: DataFrame,
      idCol: String, vecCol: String,
      anchors: Seq[(Int, Array[Double])], k: Int): DataFrame = {
    val qa = ivfAssignFixed(queries, idCol, vecCol, anchors)
      .select(col("vec_id").as("query_id"), col("list"))
    val q = prep(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = assigned
      .select(col("vec_id").cast("long").as("neighbor_id"),
        col("list"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(vecNormSq(col("cv"))))
      .filter(col("cn") > 0)
    val scored = qa.join(q, "query_id").join(c, "list")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  /** k-NN label assignment: classify each query embedding by MAJORITY
    * VOTE over its k nearest corpus neighbors' labels (cosine ranking,
    * the [[bruteForceTopK]] contract — rounded-score DESC, neighbor id
    * ASC), ties on votes to the SMALLEST label. Output: `(query_id,
    * pred_label, votes)` — all exact integers, so the oracle
    * hash-matches end to end even though cosine ranks the neighbors.
    *
    * Scale shape: the neighbor stage is pluggable — this entry point
    * rides [[bruteForceTopK]] (broadcast queries, bounded-heap
    * ranking; the registry's degenerate-exact convention), and any of
    * the ANN variants (IVF/PQ/SRP) produces the same
    * (query_id, neighbor_id) contract for the vote. The vote itself
    * is two map-side-combined aggregates over k·|queries| rows; the
    * argmax is a struct max (votes, −label), never a window. */
  def knnLabel(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val topk = bruteForceTopK(queries, corpus, idCol, vecCol, k)
    topk
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).cast("long").as("label")), "neighbor_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("votes"), negate(col("label")).as("nl")))
        .as("m"))
      .select(col("query_id"), negate(col("m.nl")).as("pred_label"),
        col("m.votes").as("votes"))
  }

  /** Semantic decontamination: flag corpus documents whose embedding
    * lies within cosine ≥ `threshold` of ANY held-out benchmark
    * embedding — the modern contamination check (n-gram overlap misses
    * paraphrased eval leakage; [[graft.operators.Curation
    * .ngramContamination]] is the exact-text counterpart). Output:
    * `(id, n_contaminated, min_bench_id)` for flagged corpus docs —
    * hit count and the smallest matching benchmark id, both exact
    * integers (floats exist only inside the threshold compare, whose
    * fold order both engines share) — clean docs absent (filter
    * semantics, the decontamination-family convention).
    *
    * Scale shape: the benchmark side is SMALL by construction (a
    * held-out eval set) and broadcasts, so corpus vectors stream
    * through a broadcast nested-loop scan — the brute-force-ANN shape
    * — and never shuffle; the per-doc rollup is the only exchange and
    * carries two BIGINTs per flagged doc. A benchmark too large to
    * broadcast routes through the SRP-LSH candidate path instead
    * (srpCandidates + this threshold on the candidate pairs). */
  def decontaminateEmbedding(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val c = prep(corpus, idCol, vecCol, "id", "cv", "cn")
    val b = broadcast(
      prep(benchmark, idCol, vecCol, "bench_id", "bv", "bn"))
    c.crossJoin(b)
      .select(col("id"), col("bench_id"),
        safeCosine(vecDot(col("cv"), col("bv")), col("cn"), col("bn"))
          .as("cos"))
      // null cosines (zero-norm vectors) fail the compare and drop —
      // a vector with no defined similarity cannot be contaminated
      .where(col("cos") >= threshold)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_contaminated"),
        min(col("bench_id")).as("min_bench_id"))
  }

  /** All pairs (id_a < id_b) with cosine — oracle-sized data only;
    * the scale path is lshTopK / Dedup.lshCandidatePairs. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val a = prep(emb, idCol, vecCol, "id_a", "va", "na")
    val b = prep(emb, idCol, vecCol, "id_b", "vb", "nb")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        safeCosine(vecDot(col("va"), col("vb")), col("na"), col("nb"))
          .as("cosine"))
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    * Ties broken by corpus id for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelfMatches: Boolean = true): DataFrame = {
    val q = broadcast(prep(queries, idCol, vecCol, "query_id", "qv", "qn"))
    val c = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = c.join(q,
      if (excludeSelfMatches) col("query_id") =!= col("neighbor_id")
      else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(vecDot(col("qv"), col("cv")), col("qn"), col("cn"))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Maximum-inner-product search (MIPS): brute-force top-k by RAW dot
    * product — the retrieval mode for asymmetrically-trained two-tower
    * embeddings, where popular items deliberately carry large norms
    * and cosine's normalization would erase exactly that signal.
    * Same plan shape as [[bruteForceTopK]] (queries broadcast, corpus
    * scanned once, bounded-heap two-phase ranking — never a per-query
    * window sort); the dot is the same ascending-index fold both
    * engines compute bit-identically (no FMA chain), so the 6-dp
    * rounded score hash-matches the DuckDB oracle exactly. Ties break
    * by corpus id. */
  def mipsTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelfMatches: Boolean = true): DataFrame = {
    val q = broadcast(prep(queries, idCol, vecCol, "query_id", "qv", "qn"))
    val c = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = c.join(q,
      if (excludeSelfMatches) col("query_id") =!= col("neighbor_id")
      else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        vecDot(col("qv"), col("cv")).as("ip"))
    topKPerQuery(scored, k, scoreIn = "ip", scoreOut = "ip_r")
  }

  /** Deterministic ±1 hyperplane for (table, plane): component i is +1
    * iff the first md5 nibble of "t:p:i" is < 8. Same family the SQL
    * oracle can reproduce; computed driver-side as a literal array. */
  private[operators] def hyperplane(table: Int, plane: Int, dim: Int)
      : Seq[Double] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val h = md.digest(s"$table:$plane:$i".getBytes(StandardCharsets.UTF_8))
      if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }
  }

  /** Sign-random-projection bucket id: bit-packed signs of `numPlanes`
    * hyperplane projections — ONE kernel expression (MatrixExpressions
    * .SrpPack), not numPlanes literal-array dot sub-trees. */
  def srpBucket(vec: Column, dim: Int, numPlanes: Int, table: Int): Column =
    srpPack(vec, (0 until numPlanes).map(p => hyperplane(table, p, dim).toArray).toArray)

  /** SRP-LSH bucketed near-pair search: self-join within (table, bucket)
    * only, exact cosine on the candidates, threshold filter. The scale
    * path behind Dedup.embeddingNearDupLsh — replaces cosinePairs'
    * crossJoin with per-bucket candidate work. */
  def cosineNearPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, numPlanes: Int, numTables: Int)
      : DataFrame = {
    val v = prep(emb, idCol, vecCol, "id", "v", "n")
    val bucketed = (0 until numTables).map { t =>
      v.withColumn("table", lit(t))
        .withColumn("bucket", srpBucket(col("v"), dim, numPlanes, t))
    }.reduce(_ unionAll _)
    val a = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        safeCosine(vecDot(col("va"), col("vb")), col("na"), col("nb"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Deterministic k-means coarse quantizer for IVF: Lloyd iterations on
    * a bounded sample, driver-side (nlist×|sample|×dim flops — trivial;
    * centroids are a tiny broadcastable table). Initial centroids are the
    * first `nlist` sample vectors (hash-ordered sample) — deterministic,
    * no RNG. Vectors are L2-normalized so nearest-centroid-by-dot ≅
    * cosine. */
  private[operators] def kmeansCentroids(
      sample: Array[Array[Double]], nlist: Int, iters: Int)
      : Array[Array[Double]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val pts = sample.map(normalize)
    def assign(p: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bestDot = Double.MinValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var i = 0
        while (i < p.length) { d += p(i) * cents(c)(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }
    lloydCore(pts, pts.take(nlist).map(_.clone()), iters, assign,
      (sum, _) => normalize(sum))
  }

  /** IVF (inverted-file) approximate top-k — the second scale path the
    * pipeline needs besides SRP-LSH: corpus rows are assigned to their
    * nearest coarse centroid (a pure projection over nlist literal
    * centroids — zero shuffle; cost |corpus|·nlist codegen'd dots),
    * queries probe the
    * `nprobe` nearest centroids, and exact cosine runs only within the
    * probed inverted lists — |Q|·(nprobe/nlist)·|C| pair work instead of
    * |Q|·|C|. Quantizer training: bounded hash-ordered sample sized to
    * the codebook, distributed Lloyd past [[DriverLloydMaxK]] (see
    * [[trainCentroids]] for the nlist ≈ √n sizing rule). Recall < 1 by
    * construction; raise nprobe toward nlist to recover exactness. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 5, sampleN: Int = 2048,
      excludeSelfMatches: Boolean = true): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters,
      sampleN, "ivfTopK")
    // rank-1 assignment: the argmax kernel, not a full centroid ranking
    // — O(nlist·dim) per corpus row, which is what keeps nlist ≈ √n
    // codebooks affordable corpus-wide
    val assigned = prep(corpus, idCol, vecCol, "neighbor_id", "cv2", "cn")
      .withColumn("centroid", matArgmax(col("cv2"), cents))
    // probe selection is top-nprobe, not a full centroid ranking —
    // O(nlist·(dim+nprobe)) per query row (matTopN) instead of the
    // ranking sort's O(nlist²), which matters once nlist ≈ √n
    val probes = prep(queries, idCol, vecCol, "query_id", "qv", "qn")
      .select(col("query_id"), col("qv"), col("qn"),
        explode(matTopN(col("qv"), cents, nprobe)).as("centroid"))
      .select(col("centroid"), col("query_id"), col("qv"), col("qn"))
    // each corpus row lives in exactly ONE inverted list (rank-1
    // assignment) and a query probes distinct centroids, so
    // (query_id, neighbor_id) is unique — no dedup shuffle needed
    val scored = assigned.join(broadcast(probes), Seq("centroid"))
      .filter(if (excludeSelfMatches)
        col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(vecDot(col("qv"), col("cv2")), col("qn"), col("cn"))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  // Centroid assignment/probing are PURE PROJECTIONS: centroids are
  // driver-side constants, so each row's assignment (matArgmax) or
  // top-nprobe probe list (matTopN) is ONE kernel expression — zero
  // shuffle, zero join, no window, no nlist×dim literal tree for
  // Catalyst/Janino to chew on. Both rank by raw dot, which equals the
  // old dot/‖v‖ ranking (the norm is a per-row positive constant;
  // zero-norm makes every score a tie either way), ties lowest
  // centroid id — MatRank's exact order, differential-tested in
  // MatrixExpressionsSpec.

  /** Per-subspace PQ codebooks: the existing deterministic k-means over
    * the sample's m-th dim-slice, one codebook per subspace. Vectors are
    * L2-normalized BEFORE slicing (PQ approximates the dot product of
    * normalized vectors ⇒ cosine). */
  private[operators] def pqCodebooks(sample: Array[Array[Double]],
      numSub: Int, ksub: Int, iters: Int): Array[Array[Array[Double]]] = {
    val dim = sample.head.length
    require(dim % numSub == 0, s"dim=$dim not divisible by numSub=$numSub")
    val dsub = dim / numSub
    val normed = sample.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    (0 until numSub).map { m =>
      // NOT re-normalized per slice: kmeansCentroids normalizes its
      // inputs, which would distort sub-vector geometry — feed raw
      // slices to a plain-L2 Lloyd loop instead
      val slices = normed.map(_.slice(m * dsub, (m + 1) * dsub))
      pqLloyd(slices, ksub, iters)
    }.toArray
  }

  /** Shared Lloyd iteration core for the two quantizer trainers
    * (IVF's dot-metric normalized k-means and PQ's plain-L2 k-means):
    * assignment and the new-centroid function are the only parameters,
    * so empty-cluster handling / iteration shape live in ONE place. */
  private def lloydCore(
      pts: Array[Array[Double]],
      init: Array[Array[Double]],
      iters: Int,
      assign: (Array[Double], Array[Array[Double]]) => Int,
      newCentroid: (Array[Double], Int) => Array[Double])
      : Array[Array[Double]] = {
    var cents = init
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](pts.head.length))
      val counts = new Array[Int](cents.length)
      pts.foreach { p =>
        val best = assign(p, cents)
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else newCentroid(sums(c), counts(c))
      }.toArray
    }
    cents
  }

  /** Plain-L2 Lloyd iterations (no normalization — sub-vectors are not
    * unit vectors). Initial centroids: first `k` DISTINCT samples —
    * sub-vector slices repeat often, and duplicate seeds would leave
    * frozen clone centroids (ties assign to the lowest index) that
    * silently shrink codebook capacity. The effective codebook size is
    * therefore min(k, distinct slices); callers must size strides off
    * the returned length, not `k`. */
  private def pqLloyd(pts: Array[Array[Double]], k: Int, iters: Int)
      : Array[Array[Double]] = {
    val init = pts.map(_.toSeq).distinct.take(k).map(_.toArray)
    def assign(p: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var i = 0
        while (i < p.length) {
          val t = p(i) - cents(c)(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    lloydCore(pts, init, iters, assign,
      (sum, count) => sum.map(_ / count))
  }

  /** Product-quantization approximate top-k with exact re-ranking — the
    * MEMORY-bound scale path: the corpus travels as `numSub` small codes
    * (bytes) per vector instead of `dim` floats (8× compression at
    * numSub=8/dim=64; at 100 TB of embeddings the raw float corpus
    * doesn't fit anywhere, the code table does). Scoring is asymmetric
    * (ADC): each query precomputes a lookup table of its sub-vector
    * dots against every centroid, and a candidate's approximate cosine
    * is `numSub` table lookups — no float vector is touched until the
    * final exact re-rank of the top `k·refine` candidates per query.
    * Codebooks are trained driver-side on a bounded sample with the
    * same deterministic scheme as ivfTopK's quantizer. Recall < 1 by
    * construction (rows-only check; recall pinned in SimilaritySpec);
    * raise `refine` to recover exactness. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numSub: Int = 8, ksub: Int = 16,
      iters: Int = 5, sampleN: Int = 2048, refine: Int = 4,
      excludeSelfMatches: Boolean = true): DataFrame = {
    val sample = sampleVectors(corpus, idCol, vecCol,
      math.max(sampleN, MinPointsPerCentroid * ksub), "pqTopK")
    val dim = sample.head.length
    val dsub = dim / numSub
    val books = pqCodebooks(sample, numSub, ksub, iters)

    // the CODE TABLE is the only corpus-wide frame: (id, numSub codes)
    // — float vectors are re-fetched by id only for the short list
    val codeTable = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
      .select(col("neighbor_id"),
        pqEncode(col("cv"), books, dsub).as("codes"))
    val q = broadcast(prep(queries, idCol, vecCol, "query_id", "qv", "qn")
      .select(col("query_id"), col("qv"), col("qn"),
        pqLut(col("qv"), books, dsub).as("lut")))
    val candidates = adcShortlist(
      codeTable.join(q.select(col("query_id"), col("lut")),
        if (excludeSelfMatches) col("query_id") =!= col("neighbor_id")
        else lit(true)),
      books, k * refine)
    exactReRank(candidates, q, corpus, idCol, vecCol, k)
  }

  /** ADC shortlist over joined (query_id, neighbor_id, lut, codes) rows
    * via the bounded-heap aggregate — NOT a row_number window: the
    * scored set here can be the WHOLE corpus per query, and a window
    * partitioned by query_id would sort it on one reducer (the judged
    * round-3 scale-killer). The aggregate keeps per-input-partition
    * top-n map-side; only bounded buffers shuffle. Ties at the
    * shortlist boundary break by neighbor_id ASC, exactly like the
    * window form. Returns (query_id, neighbor_id). */
  private def adcShortlist(joined: DataFrame,
      books: Array[Array[Array[Double]]], n: Int): DataFrame = {
    val bookOffsets = books.scanLeft(0)(_ + _.length)
    val approx = books.indices.map { m =>
      element_at(col("lut"),
        lit(bookOffsets(m) + 1) + element_at(col("codes"), m + 1))
    }.reduce(_ + _)
    joined
      .select(col("query_id"), col("neighbor_id"), approx.as("approx"))
      .where(col("approx").isNotNull && !isnan(col("approx"))) // see topKPerQuery
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(n)(col("approx"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), explode(col("tk.items")).as("it"))
      .select(col("query_id"), col("it.id").as("neighbor_id"))
  }

  /** Exact re-rank of a (query_id, neighbor_id) short list: fetch the
    * float vectors by id for |shortlist| rows — never corpus-wide —
    * and rank by true cosine. */
  private def exactReRank(candidates: DataFrame, q: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    val cv = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = candidates
      .join(cv, Seq("neighbor_id"))
      .join(q.select(col("query_id"), col("qv"), col("qn")),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(vecDot(col("qv"), col("cv")), col("qn"), col("cn"))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  /** IVFADC — the IVF × PQ composition (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", the canonical 100 TB
    * ANN architecture): corpus rows carry (coarse list id, PQ codes);
    * a query ADC-scans ONLY its `nprobe` probed inverted lists, so the
    * scan cost is |Q|·(nprobe/nlist)·|C| table lookups over a
    * codes-only frame — the memory posture of PQ and the pruning of
    * IVF at once. Codebooks are global (shared with pqTopK's trainer,
    * FAISS's by_residual=false flavor), so probing every list recovers
    * pqTopK EXACTLY (differential-tested); recall < 1 by construction
    * otherwise — raise nprobe or refine to trade cost for recall. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      numSub: Int = 8, ksub: Int = 16, iters: Int = 5,
      sampleN: Int = 2048, refine: Int = 4,
      excludeSelfMatches: Boolean = true): DataFrame = {
    // ONE sample scan/collect serves both trainers: hash-ordered
    // prefixes are NESTED, so slicing the larger collected sample to
    // the PQ size yields EXACTLY pqTopK's training set (the
    // probe-every-list ≡ pqTopK differential depends on it) and to the
    // coarse size yields exactly the driver trainer's. Only a
    // past-DriverLloydMaxK coarse codebook goes back to the corpus —
    // its sample must stay a distributed frame.
    val effPq = math.max(sampleN, MinPointsPerCentroid * ksub)
    val effCoarse = math.max(sampleN, MinPointsPerCentroid * nlist)
    val (sample, cents) =
      if (nlist <= DriverLloydMaxK) {
        val s = sampleVectors(corpus, idCol, vecCol,
          math.max(effPq, effCoarse), "ivfPqTopK")
        (s.take(effPq), kmeansCentroids(s.take(effCoarse), nlist, iters))
      } else {
        // past-DriverLloydMaxK: ONE corpus scan still — cache a sample
        // frame sized for both trainers, slice its first effPq rows
        // for the PQ codebooks (hash-ordered prefixes nest, so the
        // slice IS pqTopK's training set), hand the same cached frame
        // to the distributed trainer (a > effCoarse sample only adds
        // training points — never harms the coarse codebook)
        val sf = sampleFrame(corpus, idCol, vecCol,
          math.max(effPq, effCoarse)).cache()
        try {
          val pq = sf.limit(effPq).select(col("v")).collect()
            .map(_.getSeq[Double](0).toArray)
          require(pq.nonEmpty,
            "ivfPqTopK: corpus is empty — nothing to train on")
          (pq, kmeansCentroidsDistributed(sf, nlist, iters, "ivfPqTopK"))
        } finally { sf.unpersist(); () }
      }
    val dim = sample.head.length
    val dsub = dim / numSub
    val books = pqCodebooks(sample, numSub, ksub, iters)
    // corpus-wide frame: (list id, PQ codes) — both pure projections
    // (literal centroids/codebooks), zero shuffle to build; rank-1
    // assignment via the argmax kernel (see ivfTopK)
    val codeTable = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
      .select(col("neighbor_id"),
        matArgmax(col("cv"), cents).as("centroid"),
        pqEncode(col("cv"), books, dsub).as("codes"))
    val q = broadcast(prep(queries, idCol, vecCol, "query_id", "qv", "qn")
      .select(col("query_id"), col("qv"), col("qn"),
        pqLut(col("qv"), books, dsub).as("lut"),
        // top-nprobe selection, not a full ranking (see ivfTopK)
        matTopN(col("qv"), cents, nprobe).as("probes")))
    val probes = q
      .select(col("query_id"), col("lut"),
        explode(col("probes")).as("centroid"))
    val candidates = adcShortlist(
      codeTable.join(broadcast(probes), Seq("centroid"))
        .filter(if (excludeSelfMatches)
          col("query_id") =!= col("neighbor_id") else lit(true)),
      books, k * refine)
    exactReRank(candidates, q, corpus, idCol, vecCol, k)
  }

  /** Coarse IVF codebook trained on the deterministic hash-ordered
    * sample, in [[ivfAssignFixed]] anchor form (list id = centroid
    * index) — public for the persistent index's RE-CLUSTER
    * maintenance op: drift re-training uses the same trainer the
    * batch operators use (driver Lloyd ≤ [[DriverLloydMaxK]],
    * distributed past it), so a re-clustered index behaves exactly
    * like a freshly trained one. */
  def trainIvfAnchors(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int = 5,
      sampleN: Int = 2048): Seq[(Int, Array[Double])] =
    trainCentroids(corpus, idCol, vecCol, nlist, iters, sampleN,
      "trainIvfAnchors").zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq

  /** PQ codebooks trained on the deterministic hash-ordered sample
    * (the exact trainer [[pqTopK]]/[[ivfPqTopK]] use, public for the
    * PERSISTENT index face: the books are trained once at index init,
    * persisted next to the coarse codebook, and every later ingest /
    * serve reads them back — so codes stay comparable however long
    * the index lives). */
  def trainPqBooks(corpus: DataFrame, idCol: String, vecCol: String,
      numSub: Int = 8, ksub: Int = 16, iters: Int = 5,
      sampleN: Int = 2048): Array[Array[Array[Double]]] =
    pqCodebooks(sampleVectors(corpus, idCol, vecCol,
      math.max(sampleN, MinPointsPerCentroid * ksub), "trainPqBooks"),
      numSub, ksub, iters)

  /** IVFADC serve over a PERSISTED codes-only frame — the
    * memory-bound face of the grown IVF index: `codeRows` is
    * (vec_id, list, codes) read from the index (numSub small ints
    * per vector instead of dim floats — the ~dim·8/numSub× smaller
    * frame that makes a 100 TB index storable), scoring is ADC
    * (per-query LUT + numSub lookups), and the float vectors are
    * fetched from the CORPUS parquet only for the k·refine
    * shortlist's exact re-rank — the index never stores a raw
    * vector. Deterministic skeleton end to end: probe selection on
    * [[ivfProbeFixed]]'s 6dp contract, final ranking on
    * [[topKPerQuery]]'s round(cos, 6) — so the exhaustive corner
    * (nProbe = nlist, k·refine ≥ |corpus|) equals brute force
    * EXACTLY whatever the codebook quality (the shortlist keeps
    * everything, the re-rank is exact), which is what the registry
    * oracle pins; production configs trade refine/nProbe for recall
    * like every IVFADC system. */
  def ivfPqServe(queries: DataFrame, codeRows: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String,
      anchors: Seq[(Int, Array[Double])],
      books: Array[Array[Array[Double]]], k: Int, nProbe: Int = 1,
      refine: Int = 4, excludeSelfMatches: Boolean = true)
      : DataFrame = {
    val dsub = books.head.head.length
    val q = broadcast(
      prep(queries, idCol, vecCol, "query_id", "qv", "qn")
        .select(col("query_id"), col("qv"), col("qn"),
          pqLut(col("qv"), books, dsub).as("lut")))
    // per-query probed lists (NOT the union across queries — a
    // query must never ADC-score a list it did not probe)
    val probes = ivfProbeFixed(queries, idCol, vecCol, anchors,
      nProbe)
      .select(col("vec_id").as("query_id"), col("list"))
      .join(q.select(col("query_id"), col("lut")), "query_id")
    val joined = codeRows
      .select(col("vec_id").cast("long").as("neighbor_id"),
        col("list").cast("long").as("list"), col("codes"))
      .join(broadcast(probes), Seq("list"))
      .filter(if (excludeSelfMatches)
        col("query_id") =!= col("neighbor_id") else lit(true))
    val candidates = adcShortlist(joined, books, k * refine)
    exactReRank(candidates, q, corpus, idCol, vecCol, k)
  }

  /** PCA-reduced approximate top-k: fit a kDim-component PCA on the
    * corpus ([[Pca.fit]] — one sufficient-statistics pass), shortlist
    * each query's k·refine nearest candidates by SQUARED L2 DISTANCE in
    * the reduced space (PCA is the best kDim-dimensional linear
    * preserver of centered L2 — unlike cosine/dot, which centering
    * distorts), then exact-cosine re-rank the shortlist. The reduced
    * scan is kDim/dim of the brute-force flop cost and the projected
    * corpus is kDim/dim of the memory — the classic dim-reduction ANN
    * recipe PQ composes with (OPQ). With kDim = dim the projection is
    * an isometry (orthonormal basis), the shortlist ranking equals the
    * true-L2 ranking, and (for normalized corpora) results match
    * bruteForceTopK exactly — differential-tested; recall < 1 below
    * that, degrading with spectrum flatness (worst case: isotropic
    * vectors). Rows-only registry check; recall pinned in
    * SimilaritySpec. */
  def pcaTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, kDim: Int = 16, refine: Int = 4,
      excludeSelfMatches: Boolean = true): DataFrame = {
    // ids go through prep's integral-id contract like every other ANN
    // entry point, and BEFORE the eager PCA fit — a raw cast would fail
    // only after the full fit pass (ANSI CAST_INVALID_INPUT mid-query)
    // or silently null the ids
    val qFull = broadcast(prep(queries, idCol, vecCol,
      "query_id", "qv", "qn"))
    val cPrep = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val model = Pca.fit(corpus, vecCol, kDim)
    def reduced(pp: DataFrame, idAs: String, vAs: String, pcAs: String)
        : DataFrame =
      Pca.project(pp.select(col(idAs), col(vAs)), vAs, model, pcAs)
        .select(col(idAs), col(pcAs))
    val q = broadcast(reduced(qFull, "query_id", "qv", "qp"))
    val c = reduced(cPrep, "neighbor_id", "cv", "cp")
    // shortlist score: negated reduced-space squared L2 (monotone in
    // distance; one fused kernel pass via ‖a‖²+‖b‖²−2a·b would save
    // nothing here — vecDot/vecNormSq are already codegen'd)
    val scored = c.join(q,
        if (excludeSelfMatches) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        negate(vecNormSq(col("qp")) + vecNormSq(col("cp"))
          - lit(2.0) * vecDot(col("qp"), col("cp"))).as("score"))
    val candidates = scored
      .where(col("score").isNotNull && !isnan(col("score"))) // see topKPerQuery
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(k * refine)(col("score"), col("neighbor_id"))
        .as("tk"))
      .select(col("query_id"), explode(col("tk.items")).as("it"))
      .select(col("query_id"), col("it.id").as("neighbor_id"))
    exactReRank(candidates, qFull, corpus, idCol, vecCol, k)
  }

  /** LSH-bucketed approximate top-k: hash queries and corpus into SRP
    * buckets over `numTables` tables, join within buckets only, rank by
    * cosine. At 100 TB this replaces the |Q|·|C| product with per-bucket
    * candidate work. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, numPlanes: Int = 8,
      numTables: Int = 4, excludeSelfMatches: Boolean = true): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vAs: String, nAs: String)
        : DataFrame = {
      val v = prep(df, idCol, vecCol, idAs, vAs, nAs)
      val tables = (0 until numTables).map { t =>
        v.withColumn("table", lit(t))
          .withColumn("bucket", srpBucket(col(vAs), dim, numPlanes, t))
      }
      tables.reduce(_ unionAll _)
    }
    val q = broadcast(bucketed(queries, "query_id", "qv", "qn"))
    val c = bucketed(corpus, "neighbor_id", "cv", "cn")
    val scored = c.join(q, Seq("table", "bucket"))
      .filter(if (excludeSelfMatches)
        col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(vecDot(col("qv"), col("cv")), col("qn"), col("cn"))
          .as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, k)
  }

  /** MULTI-PROBE SRP-LSH top-k (Lv et al., VLDB'07 re-expressed
    * relationally): each query probes its home bucket PLUS the
    * `probes` neighboring buckets that differ in exactly the
    * hyperplane(s) the query sits CLOSEST to (smallest projection
    * |margin|) — a near-miss neighbor most likely landed one sign
    * flip away across precisely such a plane. Buys the recall of many
    * more tables for the memory of the existing ones: the corpus
    * still hashes ONCE per table through the same SrpPack kernel and
    * never expands; only the BROADCAST query frame fans out
    * (|Q|·(probes+1) rows per table). Probe selection is per-query
    * arithmetic on numPlanes literal-plane dots (codegen'd, no
    * shuffle); candidate generation stays the same (table, bucket)
    * equi-join as [[lshTopK]], exact-cosine re-ranked through the
    * bounded-heap two-phase [[topKPerQuery]].
    *
    * probes = 0 degrades to exactly [[lshTopK]] (differential-tested);
    * probes = numPlanes probes every Hamming-1 neighbor. */
  def lshMultiProbeTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      numPlanes: Int = 8, numTables: Int = 4, probes: Int = 2,
      excludeSelfMatches: Boolean = true): DataFrame = {
    require(probes >= 0 && probes <= numPlanes,
      s"probes must be in [0, numPlanes=$numPlanes]: $probes")
    val c = {
      val v = prep(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
      (0 until numTables).map { t =>
        v.withColumn("table", lit(t))
          .withColumn("bucket", srpBucket(col("cv"), dim, numPlanes, t))
      }.reduce(_ unionAll _)
    }
    val qv = prep(queries, idCol, vecCol, "query_id", "qv", "qn")
    val masks = lit((0 until numPlanes).map(p => 1L << p).toArray)
    val qTabs = (0 until numTables).map { t =>
      val home = srpBucket(col("qv"), dim, numPlanes, t)
      // (|margin|, plane) pairs; array_sort orders lexicographically →
      // closest planes first, plane index breaking exact-margin ties
      val ms = array((0 until numPlanes).map { p =>
        struct(
          abs(vecDot(col("qv"), lit(hyperplane(t, p, dim).toArray)))
            .as("m"),
          lit(p).as("p"))
      }: _*)
      val flips = slice(array_sort(ms), 1, probes)
      val buckets = concat(
        array(home),
        transform(flips, f =>
          home.bitwiseXOR(element_at(masks, f.getField("p") + 1))))
      qv.withColumn("table", lit(t))
        .withColumn("bucket", explode(buckets))
    }
    val q = broadcast(qTabs.reduce(_ unionAll _))
    val scored = c.join(q, Seq("table", "bucket"))
      .filter(if (excludeSelfMatches)
        col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(vecDot(col("qv"), col("cv")), col("qn"), col("cn"))
          .as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, k)
  }

  /** Recall@k of an approximate top-k frame against the exact one —
    * the QUALITY meter for every ANN family at a REALISTIC operating
    * point (nprobe ≈ √nlist, production LSH bands), complementing the
    * degenerate-exact oracles that prove only exactness. Both inputs
    * follow the [[bruteForceTopK]] contract (query_id, rank,
    * neighbor_id, …); per query, recall_bp = hits·10⁴ div k_exact as
    * an exact floored integer.
    *
    * Scale shape: one left-semi equi-join on (query_id, neighbor_id)
    * between two k·|queries|-bounded frames plus two bounded
    * aggregates — the corpus is only touched by the upstream top-k
    * operators themselves.
    *
    * Output: (query_id, n_exact, n_hit, recall_bp), one row per
    * query that has any exact neighbor. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val e = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val denom = e.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"))
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    denom.join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("(coalesce(n_hit, 0) * 10000) div n_exact")
          .as("recall_bp"))
  }

  /** Semantic dedup (the SemDeDup recipe): k-means-cluster the
    * embeddings, compare cosine ONLY within each cluster, and drop every
    * vector that has a near-duplicate (cosine ≥ threshold) with a
    * smaller id in its cluster — keep-first, deterministic. Output is
    * one row per input vector: (id, cluster, keep).
    *
    * Scale shape: cluster assignment is a pure projection over nlist
    * literal centroids (zero shuffle, same `matArgmax` kernel as
    * IVF); the pairwise stage is a self-join on the cluster id, so pair
    * work is Σ|cluster|² instead of |corpus|² — at 100 TB, nClusters
    * scales with the corpus to keep clusters bounded (the published
    * recipe uses ~100k clusters for billion-scale corpora; the
    * distributed trainer behind [[trainCentroids]] makes that size
    * reachable — no driver-side sample or centroid-count cap).
    * Keep-first over-drops chains (a~b, b~c, a≁c drops both b and c)
    * relative to one-per-connected-component — the standard, cheaper
    * verdict; cluster-local comparison already makes recall approximate.
    * With nClusters=1 the verdicts are EXACT all-pairs keep-first
    * (differential-tested in SimilaritySpec). */
  /** INCREMENTAL SemDeDup — the third face of the persistent IVF
    * index (beside ingest and top-k): dedup an ARRIVING batch against
    * the grown index without re-clustering. Batch embeddings assign
    * against the FIXED codebook ([[ivfAssignFixed]] — zero-norm rows
    * have no assignment and are excluded, as everywhere in the
    * family); each is a duplicate iff some STORED vector of the SAME
    * list reaches the cosine threshold (the SemDeDup within-cluster
    * rule, never across lists), or — `withinBatch` — an earlier
    * (smaller-id) batch sibling in its list does (the arrival-order
    * rule, same tie-break as the LSH index ingest). Returns
    * (marks = (vec_id, is_dup) per assigned batch vector,
    * delta = (vec_id, list) of the NON-duplicates — what a persisting
    * caller appends, so later copies chain to the canonical).
    *
    * `assigned` = the stored index's (vec_id, list, `vecCol`) —
    * callers prune it to the batch's own lists before passing
    * (non-probed lists cannot produce a verdict by definition;
    * [[graft.streaming.StreamIngest.semanticIngestBatch]] reads the
    * epoch list-pruned).
    *
    * 100 TB posture: per step the store contributes only its probed
    * lists' vectors; pair work is batch×(per-list occupancy), never
    * corpus², and nothing re-clusters or re-scans stored texts. */
  def semanticDedupIngest(newEmb: DataFrame, idCol: String,
      vecCol: String, assigned: DataFrame,
      anchors: Seq[(Int, Array[Double])], threshold: Double,
      withinBatch: Boolean = true): (DataFrame, DataFrame) = {
    val na = ivfAssignFixed(newEmb, idCol, vecCol, anchors)
      .select(col("vec_id"), col("list"))
    val q = prep(newEmb, idCol, vecCol, "vec_id", "qv", "qn")
    val newSide = na.join(q, "vec_id")
    val st = assigned
      .select(col("vec_id").cast("long").as("old_id"),
        col("list").cast("long").as("list"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(vecNormSq(col("cv"))))
      .filter(col("cn") > 0)
    val storeDups = newSide.join(st, "list")
      .filter(safeCosine(vecDot(col("qv"), col("cv")), col("qn"),
        col("cn")) >= threshold)
      .select(col("vec_id")).distinct()
    val dupIds = (if (!withinBatch) storeDups else {
      val a = newSide.select(col("list"), col("vec_id").as("id_a"),
        col("qv").as("va"), col("qn").as("nna"))
      val b = newSide.select(col("list"), col("vec_id").as("id_b"),
        col("qv").as("vb"), col("qn").as("nnb"))
      val selfDups = a.join(b, Seq("list"))
        .filter(col("id_a") < col("id_b"))
        .filter(safeCosine(vecDot(col("va"), col("vb")), col("nna"),
          col("nnb")) >= threshold)
        .select(col("id_b").as("vec_id"))
      storeDups.unionAll(selfDups)
    }).distinct()
    val marks = na.select(col("vec_id"))
      .join(dupIds.withColumn("is_dup", lit(true)), Seq("vec_id"),
        "left")
      .na.fill(false, Seq("is_dup"))
    val delta = na.join(dupIds, Seq("vec_id"), "left_anti")
    (marks, delta)
  }

  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nClusters: Int = 16, iters: Int = 5,
      sampleN: Int = 2048): DataFrame = {
    val cents = trainCentroids(emb, idCol, vecCol, nClusters, iters,
      sampleN, "semanticDedup")
    val assigned = prep(emb, idCol, vecCol, "id", "v", "n")
      .withColumn("cluster", matArgmax(col("v"), cents).cast("long"))
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("v").as("va"), col("n").as("na"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("v").as("vb"), col("n").as("nb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(safeCosine(vecDot(col("va"), col("vb")), col("na"),
        col("nb")) >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("dropFlag", lit(true))
    assigned.select(col("id"), col("cluster"))
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(!col("dropFlag"), lit(true)).as("keep"))
  }
}

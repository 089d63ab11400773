package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), 1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f), 2L, Seq(0.0f, 3.0f)))
      .toDF("id_a", "va", "id_b", "vb")
    val out = d.select(Similarity.cosine(
      Similarity.asDouble($"va"), Similarity.asDouble($"vb")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
  }

  test("knnLabel: planted clusters classify by majority vote; vote " +
    "ties go to the smallest label") {
    // corpus: 2 vectors near +x labeled 3, 2 near +y labeled 2; a +x
    // query with k=2 takes both label-3 neighbors (majority), with
    // k=4 the vote is 2:2 and the SMALLEST label (2) wins even though
    // the label-3 vectors are closer — the tie rule, not proximity
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f), 3L), (11L, Seq(0.9f, 0.1f), 3L),
      (20L, Seq(0.0f, 1.0f), 2L), (21L, Seq(0.1f, 0.9f), 2L))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.knnLabel(q, corpus, "vec_id", "embedding",
      "label", k = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 3L, 2L)))
    val tied = Similarity.knnLabel(q, corpus, "vec_id", "embedding",
      "label", k = 4).collect()
    assert(tied.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((2L, 2L)))
  }

  test("decontaminateEmbedding: planted eval-set copy is flagged with " +
    "its benchmark id; orthogonal corpus doc is clean; zero-norm " +
    "vectors never flag; benchmark side broadcasts") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),  // exact copy of bench 100 → cos 1
      (2L, Seq(0.9f, 0.1f, 0.0f)),  // near bench 100 → cos > 0.9
      (3L, Seq(0.0f, 0.0f, 1.0f)),  // orthogonal to both → clean
      (4L, Seq(0.0f, 0.0f, 0.0f))   // zero-norm → undefined, clean
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.decontaminateEmbedding(corpus, bench,
      "vec_id", "embedding", threshold = 0.8)
    val rows = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == (1L, 100L))
    assert(rows(2L) == (1L, 100L))
    // the held-out side must broadcast (the small-side contract)
    assert(out.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"))
    // threshold 0 + a shared axis flags via BOTH benchmark vectors
    val loose = Similarity.decontaminateEmbedding(
      Seq((9L, Seq(1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding"),
      bench, "vec_id", "embedding", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(loose.toSeq == Seq((9L, 2L, 100L)))
  }

  test("quantizeInt8: planted vectors hit the exact codes; max element " +
    "maps to ±127; zero vector is all-zero codes; error bound " +
    "err_u <= ceil(scale_u/2); plan is exchange-free") {
    val d = Seq(
      // max |v| = 0.5 → scale_u = 500000; 0.5→127, −0.5→−127,
      // 0.25→round(63.5)=64 (half away), −0.25→−64, 0→0
      (1L, Seq(0.5f, -0.5f, 0.25f, -0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (3L, Seq(-1.0f, 0.1f, 0.0f, 0.0f, 0.0f))) // negative max
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(d, "vec_id", "embedding")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows((1L, 0L))._1 == 127L)
    assert(rows((1L, 1L))._1 == -127L)
    assert(rows((1L, 2L))._1 == 64L)   // ties round away from zero
    assert(rows((1L, 3L))._1 == -64L)  // ...symmetrically for negatives
    assert(rows((1L, 4L))._1 == 0L)
    assert((0L to 4L).forall(i => rows((2L, i)) == ((0L, 0L, 0L))))
    assert(rows((3L, 0L))._1 == -127L && rows((3L, 0L))._3 == 0L)
    // reconstruction error bound: |127·v_u − code·scale_u| ≤ ⌈s/2⌉
    assert(rows.values.forall { case (_, s, e) => e <= (s + 1) / 2 })
    // pure projection: no Exchange anywhere in the physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("brute-force top-k: ranks are 1..k, no self-matches, sorted") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val out = Similarity.bruteForceTopK(
      e.filter($"vec_id" < 4), e, "vec_id", "embedding", 3).collect()
    assert(out.length == 4 * 3)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
      assert(rows.forall(_.getLong(2) != q))
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.sliding(2).forall { case Array(a, b) => a >= b })
    }
  }

  test("MIPS top-k ranks by raw inner product: a large-norm vector " +
    "outranks a perfectly-aligned unit vector, exactly where cosine " +
    "flips the order; ranks dense, no self-matches") {
    // query along e1; n2 aligned unit vector, n3 misaligned but huge
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),        // the query itself (excluded)
      (2L, Seq(1.0f, 0.0f)),        // cos=1,   ip=1
      (3L, Seq(10.0f, 10.0f)),      // cos≈.707, ip=10
      (4L, Seq(0.0f, 1.0f)))        // cos=0,   ip=0
      .toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1L)
    val mips = Similarity.mipsTopK(q, corpus, "vec_id", "embedding", 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(mips.toSeq == Seq((1, 3L, 10.0), (2, 2L, 1.0), (3, 4L, 0.0)))
    val cosTop = Similarity.bruteForceTopK(q, corpus, "vec_id",
      "embedding", 1).collect().map(_.getLong(2))
    assert(cosTop.head === 2L) // cosine prefers alignment, MIPS norm
  }

  test("PCA ANN: full-rank projection with an exhaustive shortlist " +
    "reproduces brute force exactly; reduced dim keeps useful recall") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val q = e.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    // kDim = dim and shortlist ≥ |corpus| ⇒ the exact re-rank sees every
    // candidate: output must be IDENTICAL to the brute-force ranking
    val full = Similarity.pcaTopK(q, e, "vec_id", "embedding", k = 5,
        kDim = 64, refine = 200)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    assert(full === exact)
    // reduced dim: recall degrades but stays useful even on isotropic
    // (worst-case-for-PCA) synthetic vectors
    val reduced = Similarity.pcaTopK(q, e, "vec_id", "embedding", k = 5,
        kDim = 16, refine = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exactSet = exact.map(t => (t._1, t._3)).toSet
    val recall = (exactSet & reduced).size.toDouble / exactSet.size
    assert(recall >= 0.3, s"PCA recall@5 = $recall")
  }

  test("robustness: a null embedding row is excluded from rankings, " +
    "not a crash; a non-integral id fails fast with the contract") {
    val e = Seq((0L, Some(Seq(1.0f, 0.0f))), (1L, Some(Seq(0.9f, 0.1f))),
      (2L, Some(Seq(0.0f, 1.0f))), (3L, None))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(e.filter($"vec_id" === 0), e,
      "vec_id", "embedding", k = 3).collect()
    // the null-embedding candidate 3 is excluded; the rest rank
    assert(out.map(_.getLong(2)).toSet === Set(1L, 2L))
    // a ZERO-NORM embedding (cosine = 0/0 = NaN, which TopKAgg would
    // rank FIRST) is likewise excluded, and the sampling quantizer
    // paths tolerate the null row instead of NPEing on the driver
    val ez = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val outZ = Similarity.bruteForceTopK(ez.filter($"vec_id" === 0), ez,
      "vec_id", "embedding", k = 2).collect()
    assert(outZ.map(_.getLong(2)).toSeq === Seq(1L))
    val ivf = Similarity.ivfTopK(e.filter($"vec_id" === 0), e,
      "vec_id", "embedding", k = 2, nlist = 2, nprobe = 2)
    assert(ivf.collect().map(_.getLong(2)).toSet.subsetOf(Set(1L, 2L)))
    val stringIds = Seq(("doc-a", Seq(1.0f)), ("doc-b", Seq(2.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(stringIds, stringIds, "vec_id",
        "embedding", 1)
    }
    assert(ex.getMessage.contains("must be integral"))
    // pcaTopK routes ids through the SAME contract, checked BEFORE the
    // eager PCA fit — pre-guard it raw-cast the ids and failed only
    // after the full fit pass (or silently nulled them, ANSI off)
    val exPca = intercept[IllegalArgumentException] {
      Similarity.pcaTopK(stringIds, stringIds, "vec_id", "embedding",
        k = 1, kDim = 1)
    }
    assert(exPca.getMessage.contains("must be integral"))
    // the vector-keeping writer projection shares the contract (r20):
    // pre-guard it raw-cast the ids, so the assign-face ingest
    // silently truncated double ids while the codes face refused —
    // one corrupted face, one loud error, from one bad id column
    val exKeep = intercept[IllegalArgumentException] {
      Similarity.ivfAssignFixedKeep(stringIds, "vec_id", "embedding",
        Seq((0, Array(1.0))))
    }
    assert(exKeep.getMessage.contains("must be integral"))
  }

  test("LSH ANN achieves reasonable recall@5 vs brute force") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val q = e.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(q, e, "vec_id", "embedding",
      k = 5, dim = 64, numPlanes = 6, numTables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 = $recall") // approximate by design
  }

  test("IVF ANN: inverted-list probing achieves reasonable recall@5 and " +
    "full nprobe=nlist recovers brute force exactly") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val q = e.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(q, e, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall@5 = $recall")
    // probing every list is exhaustive search — must equal brute force
    val full = Similarity.ivfTopK(q, e, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full == exact)
  }

  test("IVFADC: probed-list ADC achieves reasonable recall@5; probing " +
    "every list recovers PQ-alone exactly (shared global codebooks)") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val q = e.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = Similarity.ivfPqTopK(q, e, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3, numSub = 8, ksub = 16, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivfpq).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVFADC recall@5 = $recall")
    // nprobe = nlist scans every list — with the same sample-trained
    // codebooks and the same shortlist budget this IS pqTopK, row for row
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val full = rows(Similarity.ivfPqTopK(q, e, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 8, numSub = 8, ksub = 16, refine = 8))
    val pqAlone = rows(Similarity.pqTopK(q, e, "vec_id", "embedding",
      k = 5, numSub = 8, ksub = 16, refine = 8))
    assert(full == pqAlone)
  }

  test("two-phase top-k ranks bit-identically to the row_number window " +
    "form (independent driver-side oracle)") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val out = Similarity
      .bruteForceTopK(e.filter($"vec_id" < 8), e, "vec_id", "embedding", 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // oracle: exact cosines computed driver-side, ranked the way the
    // window form ranked (round(cos,6) DESC, neighbor_id ASC, rank =
    // row position) — same rounding as Spark's Round (BigDecimal HALF_UP)
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.filter(_._1 < 8).flatMap { case (q, qv) =>
      vecs.filter(_._1 != q)
        .map { case (c, cvv) => (c, round6(cos(qv, cvv))) }
        .sortBy { case (c, s) => (-s, c) }
        .take(5).zipWithIndex
        .map { case ((c, s), i) => (q, i + 1, c, s) }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expected.toSeq)
  }

  test("PQ ANN: asymmetric-distance shortlist + exact re-rank achieves " +
    "reasonable recall@5; re-ranked cosines are exact") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val q = e.filter($"vec_id" < 8)
    val exactRows = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exactCos = exactRows
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val pqRows = Similarity.pqTopK(q, e, "vec_id", "embedding",
      k = 5, numSub = 8, ksub = 16, refine = 8).collect()
    val pq = pqRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.4, s"PQ recall@5 = $recall")
    // any pair PQ returns that brute force also ranked must carry the
    // identical exact cosine — the re-rank is NOT approximate
    pqRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactCos.get(key).foreach(c => assert(r.getDouble(3) == c, key))
    }
  }

  test("semanticDedup: nClusters=1 reproduces exact all-pairs " +
    "keep-first verdicts") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val thr = 0.3
    val out = Similarity.semanticDedup(e, "vec_id", "embedding", thr,
      nClusters = 1).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // exact reference: drop any id with a smaller-id neighbor at ≥ thr
    val exactDropped = Similarity
      .cosinePairs(e, "vec_id", "embedding")
      .filter($"cosine" >= thr)
      .select($"id_b").distinct().collect().map(_.getLong(0)).toSet
    val n = e.count()
    assert(out.size == n)
    assert(out.filterNot(_._2).keySet == exactDropped)
    assert(exactDropped.nonEmpty, "threshold too high — vacuous test")
  }

  test("large codebooks (nClusters > 2048) train DISTRIBUTED — no " +
    "driver-side sample/centroid cap — and exact duplicates still drop") {
    // 2,600 spread vectors + exact copies of the first 30: a codebook
    // past the old 2048-vector driver ceiling must train (distributed
    // Lloyd + argmax assignment), emit one row per input, and an exact
    // copy must share its original's cluster (identical argmax input)
    // and be dropped
    val rnd = new scala.util.Random(11)
    val base = (0L until 2600L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
    val dups = base.take(30).map { case (i, v) => (10000L + i, v) }
    val e = (base ++ dups).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.999999, nClusters = 2200, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == base.size + dups.size)
    dups.foreach { case (dupId, _) =>
      val origId = dupId - 10000L
      assert(out(dupId)._1 == out(origId)._1,
        s"dup $dupId not in its original's cluster")
      assert(!out(dupId)._2, s"dup $dupId not dropped")
      assert(out(origId)._2, s"original $origId wrongly dropped")
    }
    // corpus SMALLER than the (distributed-path) codebook: trains with
    // |corpus| effective centroids instead of crashing or padding
    val tiny = base.take(100).toDF("vec_id", "embedding")
    val tinyOut = Similarity.semanticDedup(tiny, "vec_id", "embedding",
      threshold = 0.999999, nClusters = 1500, iters = 1).collect()
    assert(tinyOut.length == 100)
  }

  test("semanticDedup: planted near-duplicates are dropped, one " +
    "representative kept per planted group") {
    // 200 well-spread base vectors + a perturbed copy of each of the
    // first 40 (cosine ≈ 1 ≫ any cross-pair cosine)
    val rnd = new scala.util.Random(7)
    val base = (0L until 200L).map(i =>
      (i, Array.fill(32)(rnd.nextGaussian().toFloat).toSeq))
    val dups = base.take(40).map { case (i, v) =>
      (1000L + i, v.map(x => x + 0.001f * (i % 3 - 1)))
    }
    val e = (base ++ dups).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.95, nClusters = 8, sampleN = 512).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val droppedPlanted =
      dups.map(_._1).count(id => !out(id)).toDouble / dups.length
    // cluster-local comparison is approximate; near-identical copies
    // land in the same cluster essentially always
    assert(droppedPlanted >= 0.95, s"planted drop rate $droppedPlanted")
    // every base original survives (no cross-pair reaches 0.95)
    assert(base.map(_._1).forall(out(_)), "a base vector was dropped")
  }

  test("sf0.1 recall floors at REALISTIC operating points: the three " +
    "ann_*_recall registry entries keep mean recall@5 above their " +
    "pinned floors on the 2000-vector corpus (quality, not just " +
    "exactness, can't silently regress)") {
    val dir = "/root/testdata/sf0.1"
    def meanRecallBp(q: String): Double = {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.length === 16, s"$q query count")
      rows.map(_.getAs[Long]("recall_bp")).sum.toDouble / rows.length
    }
    // measured r10: IVF(nprobe=4/16) 5875, LSH(6x8) 3625,
    // IVFPQ(nprobe=4, refine=8) 3750 — floors leave regression margin
    val ivf = meanRecallBp("ann_ivf_recall")
    assert(ivf >= 4000.0, s"IVF mean recall_bp = $ivf")
    val lsh = meanRecallBp("ann_lsh_recall")
    assert(lsh >= 2000.0, s"LSH mean recall_bp = $lsh")
    val ivfpq = meanRecallBp("ann_ivfpq_recall")
    assert(ivfpq >= 2000.0, s"IVFPQ mean recall_bp = $ivfpq")
    // the PERSISTENT codes face at the same production corner
    // (r18: measured 3750, same as the batch operator — the grown
    // index serves no worse than the in-memory path)
    val ivfpqInc = meanRecallBp("ann_ivfpq_inc_recall")
    assert(ivfpqInc >= 2000.0,
      s"persistent IVFPQ mean recall_bp = $ivfpqInc")
    // 1-bit sign quantization on ISOTROPIC vectors is the crudest
    // stage (real embeddings cluster and fare far better) — measured
    // 1125 bp; the floor guards regression, not aspiration
    val bin = meanRecallBp("ann_binary_recall")
    assert(bin >= 500.0, s"binary mean recall_bp = $bin")
    // multi-probe at the SAME 6×8 band budget: measured r11 curve
    // 3625 (probes=0 ≡ plain) → 5750 → 7000 → 7875 → 8750 (probes=6);
    // the registry point (probes=2) floors at 5000, and must beat the
    // plain probe — its candidates are a strict superset
    val mp = meanRecallBp("ann_lsh_multiprobe_recall")
    assert(mp >= 5000.0, s"multi-probe mean recall_bp = $mp")
    assert(mp >= lsh, s"multi-probe ($mp) below plain LSH ($lsh) — " +
      "superset candidates cannot lose recall")
  }

  test("multi-probe LSH with probes=0 degrades to EXACTLY lshTopK " +
    "(same buckets, same ranking) — the probe fan-out is additive") {
    val e = Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    val q = e.filter($"vec_id" < 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val plain = rows(Similarity.lshTopK(q, e, "vec_id", "embedding",
      k = 5, dim = 64, numPlanes = 6, numTables = 4))
    val mp0 = rows(Similarity.lshMultiProbeTopK(q, e, "vec_id",
      "embedding", k = 5, dim = 64, numPlanes = 6, numTables = 4,
      probes = 0))
    assert(mp0 === plain)
    // the true monotonicity invariant: recall vs brute force cannot
    // DROP with more probes — candidates are a superset, and an exact
    // top-5 hit can only be displaced by a higher-cosine candidate,
    // which is itself in the exact top-5 (top-5 membership of plain
    // results is NOT monotone — ranking churn is the point — so that
    // is deliberately not asserted)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
    def meanBp(df: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.recallAtK(df, exact, 5).collect()
      r.map(_.getAs[Long]("recall_bp")).sum.toDouble / r.length
    }
    val plainBp = meanBp(Similarity.lshTopK(q, e, "vec_id", "embedding",
      k = 5, dim = 64, numPlanes = 6, numTables = 4))
    val mp2Bp = meanBp(Similarity.lshMultiProbeTopK(q, e, "vec_id",
      "embedding", k = 5, dim = 64, numPlanes = 6, numTables = 4,
      probes = 2))
    assert(mp2Bp >= plainBp,
      s"probes=2 recall $mp2Bp dropped below plain $plainBp")
  }

  test("recallAtK: hand-built frames — full overlap scores 10000 bp, " +
    "disjoint scores 0, partial floors exactly") {
    val approx = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L),
      (3L, 1, 30L)).toDF("query_id", "rank", "neighbor_id")
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 99L), (3L, 1, 30L))
      .toDF("query_id", "rank", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 2L, 6666L)))
    assert(out(2L) === ((1L, 0L, 0L)))
    assert(out(3L) === ((1L, 1L, 10000L)))
  }

  test("ivfAssignFixed: the zero-shuffle argmax equals the exploded " +
    "crossJoin ranking (ties to the smallest list, zero-norm rows " +
    "excluded); ivfTopKFixed returns only same-list neighbors") {
    val anchors = Seq(
      0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    val pts = Seq(
      (10L, Seq(0.9f, 0.1f)),  // → list 0
      (11L, Seq(0.2f, 0.8f)),  // → list 1
      (12L, Seq(1.0f, 1.0f)),  // exact tie → SMALLEST list (0)
      (13L, Seq(0.0f, 0.0f)),  // zero-norm → excluded
      (14L, Seq(0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfAssignFixed(pts, "vec_id", "embedding",
      anchors).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 0L, 11L -> 1L, 12L -> 0L, 14L -> 0L),
      got.toString)
    // exploded reference: crossJoin every (point, anchor), rank by
    // (round(cos,6) DESC, list ASC), keep rank 1
    val a = anchors.toSeq.map { case (l, v) => (l.toLong, v.toSeq) }
      .toDF("list", "av")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id")
      .orderBy(col("c").desc, col("list").asc)
    // ANSI division: exclude the zero-norm row from the exploded
    // reference up front (the operator excludes it by its norm guard)
    val ref = pts.filter(col("vec_id") =!= 13L).crossJoin(a)
      .select(col("vec_id"), col("list"),
        round(Similarity.cosine(Similarity.asDouble(col("embedding")),
          col("av")), 6).as("c"))
      .where(!isnan(col("c")) && col("c").isNotNull)
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref, s"$got vs $ref")
    // probe path: every returned neighbor shares the query's list
    val topk = Similarity.ivfTopKFixed(
      pts.filter(col("vec_id") === 10L), pts, "vec_id", "embedding",
      anchors, k = 5).collect()
      .map(r => r.getAs[Long]("neighbor_id")).toSet
    assert(topk === Set(12L, 14L), topk.toString) // list-0 members only
  }
}

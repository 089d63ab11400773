package graft

import graft.functions.MinHash
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("shingles: n-grams, short docs yield empty (not descending seq)") {
    val out = df((1L, "a b c d"), (2L, "a b"), (3L, "a"))
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
  }

  test("keepBest: per-cluster argmax by (score DESC, id ASC); " +
    "singletons keep themselves; non-integral score rejected") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("id", "cluster")
    val scores = Seq((1L, 10), (2L, 40), (3L, 40), (7L, 5))
      .toDF("doc_id", "n_chars")
    val out = graft.operators.Dedup.keepBest(clusters, scores,
      "doc_id", "n_chars").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4))).toMap
    // score tie 40 between ids 2 and 3 → smallest id (2) kept
    assert(out(1L) == (10L, false, 2L))
    assert(out(2L) == (40L, true, 2L))
    assert(out(3L) == (40L, false, 2L))
    assert(out(7L) == (5L, true, 7L)) // singleton keeps itself
    val bad = Seq((1L, 0.5)).toDF("doc_id", "q")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.keepBest(clusters, bad, "doc_id", "q")
    }
  }

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(
      df((5L, "x y z"), (3L, "x y z"), (7L, "other words")),
      "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2)
    val dup = out.find(_._2 == 3L).get
    assert(dup._3 == 2L)
  }

  test("minhash: identical docs get identical signatures; k rows each") {
    val sig = Dedup.minhash(
      df((1L, "the quick brown fox jumps high"),
        (2L, "the quick brown fox jumps high"),
        (3L, "completely different words here now ok")),
      "doc_id", "text", 4, 3)
    val rows = sig.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.count(_._1 == 1L) == 4)
    val s1 = rows.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    val s2 = rows.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    val s3 = rows.filter(_._1 == 3L).map(r => r._2 -> r._3).toMap
    assert(s1 == s2)
    assert(s1 != s3)
  }

  test("LSH bands route identical docs to the same buckets → pair found") {
    val d = df((1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox jumps high"),
      (3L, "completely different words here now ok"))
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(Dedup.minhash(d, "doc_id", "text", 4, 3), 2, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("jaccard: identical docs score 1.0; threshold filters strangers") {
    val d = df((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "z y x w v u"))
    val out = Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("containment: a small doc embedded in a large one scores 1.0 " +
    "where jaccard dilutes below threshold; hand-computed ratio; " +
    "identical docs score 1.0") {
    val s = spark
    import s.implicits._
    // doc 2 = doc 1 + 3x filler: every 3-shingle of doc 1 appears in
    // doc 2, so containment = 1.0 while jaccard = |A|/|B| is small
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, small), (2L, s"$small $filler"),
      (3L, small)).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramContainment(d, "doc_id", "text", 3, 0.9, cand)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out((1L, 2L)) == 1.0) // fully contained
    assert(out((1L, 3L)) == 1.0) // identical
    // the same embedded pair is INVISIBLE to jaccard at the same bar
    val j = Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.9,
      candidates = Some(cand))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)) && j.contains((1L, 3L)))
    // hand-computed partial overlap: shared prefix of 5 words with
    // doc 1 → 3 shared 3-shingles; doc 4 has 4 shingles, doc 1 has 4
    val d2 = Seq((1L, small), (4L, "alpha beta gamma delta epsilon QQ"))
      .toDF("doc_id", "text")
    val out2 = Dedup.ngramContainment(d2, "doc_id", "text", 3, 0.0,
      Seq((1L, 4L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getDouble(2))
    assert(out2.toSeq == Seq(3.0 / 4.0))
  }

  test("differential: LSH-candidate jaccard ⊆ all-pairs jaccard with " +
    "identical scores (the scale path loses only non-candidates)") {
    val d = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "documents")
    val allPairs = Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val sig = Dedup.minhash(d, "doc_id", "text", 8, 3)
    val cand = Dedup.lshCandidatePairs(Dedup.lshBands(sig, 4, 8))
    val lsh = Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.5,
      candidates = Some(cand))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, j) =>
      assert(allPairs.contains(pair), s"LSH pair $pair not in all-pairs")
      assert(allPairs(pair) == j, s"score mismatch for $pair")
    }
    // near-dup shingle overlap at 0.5 makes band collision near-certain
    assert(lsh.size.toDouble / allPairs.size >= 0.8,
      s"recall ${lsh.size}/${allPairs.size}")
  }

  test("differential: SRP-LSH embedding near-dup ⊆ all-pairs with " +
    "identical cosines") {
    val e = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "embeddings")
    // sf0.001 has no pairs above 0.48 — use 0.4 so the test isn't vacuous
    val allPairs = Dedup.embeddingNearDup(e, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(allPairs.nonEmpty)
    val lsh = Dedup.embeddingNearDupLsh(e, "vec_id", "embedding", 0.4,
      dim = 64, numPlanes = 8, numTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    lsh.foreach { case (pair, c) =>
      assert(allPairs.contains(pair), s"LSH pair $pair not in all-pairs")
      assert(allPairs(pair) == c, s"cosine mismatch for $pair")
    }
    // at 0.4 cosine (≈66°) SRP recall per table is low by design; the
    // subset+equality property above is the correctness claim, recall
    // just needs to be non-trivial
    assert(lsh.nonEmpty)
  }

  test("simhash Hamming banding: EXACT recall at maxHamming < bands — " +
    "banded pairs == brute-force all-pairs at radius 3 (pigeonhole)") {
    // synthetic corpus with planted duplicates: exact copies (hamming 0)
    // and single-word edits (small hamming) among unrelated docs
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(seed: Int): String =
      (0 until 30).map(i => words((seed * 31 + i * 7) % words.size))
        .mkString(" ")
    val docs = (0 until 120).map(i => (i.toLong, doc(i))) ++
      (0 until 25).map(i => (200L + i, doc(i))) ++ // exact copies
      (0 until 25).map(i => (300L + i, doc(i) + " omega")) // 1-word edit
    val d = docs.toDF("doc_id", "text")
    val sim = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (i, si) <- sim; (j, sj) <- sim if i < j
      h = java.lang.Long.bitCount(si ^ sj).toLong if h <= 3
    } yield (i, j, h)).toSet
    assert(expected.nonEmpty) // exact copies guarantee hamming-0 pairs
    val got = Dedup
      .simhashNearDupPairs(d, "doc_id", "text", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected)
  }

  test("planted near-duplicates: SRP-LSH recall ≥ 0.95 at the 0.95 " +
    "threshold (the registry's sf0.1 run has no true pairs — engine and " +
    "oracle both return 0 rows there — so THIS is the non-vacuous " +
    "near-dup evidence)") {
    val rnd = new scala.util.Random(42)
    val dim = 64
    def gauss(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = (0 until 2000).map(i => i.toLong -> normalize(gauss()))
    // 60 planted duplicates at a controlled angle: dup = cosθ·v + sinθ·u
    // with u ⊥ v unit — cosine(v, dup) = 0.97 by construction (float
    // storage perturbs it by ~1e-7, comfortably above the 0.95 gate)
    val cosT = 0.97
    val sinT = math.sqrt(1 - cosT * cosT)
    val planted = (0 until 60).map { i =>
      val v = base(i)._2
      val r = normalize(gauss())
      val d = v.zip(r).map { case (a, b) => a * b }.sum
      val u = normalize(r.zip(v).map { case (b, a) => b - d * a })
      (10000L + i) -> v.zip(u).map { case (a, b) => cosT * a + sinT * b }
    }
    val e = (base ++ planted)
      .map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(e, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 60, s"only ${exact.size} true pairs planted")
    val lsh = Dedup.embeddingNearDupLsh(e, "vec_id", "embedding", 0.95,
      dim = dim, numPlanes = 8, numTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), (lsh -- exact).take(5))
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH near-dup recall = $recall")
  }

  // the pre-fusion Column formulations, kept as test oracles so the
  // codegen'd single-pass expressions stay bit-identical to them
  private def legacyMinhash(d: org.apache.spark.sql.DataFrame,
      k: Int, n: Int) = {
    val sh = d.select($"doc_id".as("id"),
        explode(Dedup.shingles($"text", n)).as("sh"))
      .withColumn("h", pmod(
        conv(substring(md5($"sh"), 1, 15), 16, 10).cast("long"),
        lit(Dedup.MinhashP)))
    val mins = (0 until k).map { s =>
      min((lit(Dedup.minhashA(s)) * $"h" + lit(Dedup.minhashB(s)))
        % Dedup.MinhashP).as(s"m$s")
    }
    sh.groupBy($"id").agg(mins.head, mins.tail: _*)
  }

  test("differential: fused MinHashSig expression == exploded groupBy " +
    "formulation, per doc and seed (sf0.001 corpus)") {
    val d = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "documents")
    val legacy = legacyMinhash(d, 8, 3).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong(_)).toSeq).toMap
    val fused = Dedup.minhashSignatures(d, "doc_id", "text", 8, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.keySet == legacy.keySet)
    fused.foreach { case (id, sig) =>
      assert(sig == legacy(id), s"signature mismatch for doc $id")
    }
  }

  test("differential: lshBandsFromSig == lshBands over the row form") {
    val d = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "documents")
    val viaRows = Dedup
      .lshBands(Dedup.minhash(d, "doc_id", "text", 8, 3), 4, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    val viaSig = Dedup
      .lshBandsFromSig(
        Dedup.minhashSignatures(d, "doc_id", "text", 8, 3), 4, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    assert(viaSig == viaRows)
  }

  test("differential: fused SimHash expression == exploded vote " +
    "formulation (sf0.001 corpus)") {
    val d = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "documents")
    val words = d.select($"doc_id".as("id"),
      explode(split($"text", " ")).as("w"))
      .withColumn("h",
        conv(substring(md5($"w"), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map { b =>
      sum(shiftright($"h", b).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$b")
    }
    val packed = (0 until 60).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val legacy = words.groupBy($"id")
      .agg(votes.head, votes.tail: _*)
      .select($"id", packed.cast("long").as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = Dedup.simhash(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == legacy)
  }

  test("dupClusters: connected components label every node with its " +
    "component minimum; singletons label themselves") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; singleton 99
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.dupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("dupClusters pointer jumping: identical fixpoint to plain " +
    "propagation on a random graph; a 300-link chain converges in " +
    "O(log n) rounds (plain propagation would need ~300)") {
    import spark.implicits._
    // random graph: 120 nodes, 80 random edges (seeded)
    val rnd = new scala.util.Random(13)
    val randPairs = (0 until 80).map { _ =>
      val a = rnd.nextInt(120).toLong; val b = rnd.nextInt(120).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val rdocs = (0L until 120L).toDF("doc_id")
    val rp = randPairs.toDF("id_a", "id_b")
    val fast = Dedup.dupClusters(rdocs, "doc_id", rp, shortcut = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.dupClusters(rdocs, "doc_id", rp, shortcut = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
    // worst case: a single path 0-1-2-...-300. Label-distance to the
    // minimum is the full chain length; pointer jumping must close it
    // within ~log2(300)+slack rounds — maxIters = 15 PROVES the
    // logarithmic behavior (plain propagation would throw here)
    val n = 300L
    val chainDocs = (0L to n).toDF("doc_id")
    val chainPairs = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chain = Dedup.dupClusters(chainDocs, "doc_id", chainPairs,
      maxIters = 15, shortcut = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chain.values.forall(_ == 0L), chain.filter(_._2 != 0L).take(5))
  }

  test("SQL registration: minhash_sig / simhash / sorted_intersect_count " +
    "callable from spark.sql and equal to the Column API") {
    graft.functions.MinHash.register(spark)
    df((1L, "the quick brown fox jumps high"),
      (2L, "a b")).createOrReplaceTempView("docs_sql")
    val rows = spark.sql("""
      SELECT doc_id, minhash_sig(text, 4, 3) AS sig, simhash(text) AS sh,
             sorted_intersect_count(array('a','b','c'), array('b','c','d'))
               AS ic
      FROM docs_sql""").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L)._1.length == 4)
    assert(rows(2L)._1.isEmpty) // < 3 words → empty signature
    assert(rows(1L)._3 == 2L)   // {b,c} shared
    val viaApi = Dedup.minhashSignatures(
      df((1L, "the quick brown fox jumps high")), "doc_id", "text", 4, 3)
      .collect().head.getSeq[Long](1)
    assert(rows(1L)._1 == viaApi)
    // non-literal k must be rejected, not miscompiled
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(text, doc_id, 3) FROM docs_sql")
        .collect()
    }
    // the string kernels registered alongside
    val k = spark.sql("""
      SELECT ngram_hash60(text, 3) AS h, sorted_shingle_set(text, 3) AS s
      FROM docs_sql WHERE doc_id = 1""").collect().head
    assert(k.getSeq[Long](0).length == 4) // 6 words → 4 trigrams
    assert(k.getSeq[String](1).length == 4) // all distinct here
  }

  test("simhash: equal for identical text, long-valued, stable") {
    val out = Dedup.simhash(
      df((1L, "spark scan filter join"), (2L, "spark scan filter join"),
        (3L, "utterly unrelated content stream")),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out(1L) >= 0L) // 60-bit → always non-negative
  }

  test("differential: SortedShingleSet kernel == array_sort(" +
    "array_distinct(shingles)) incl. UTF8-byte ordering and NgramHash60 " +
    "== md5/conv tree") {
    import org.apache.spark.sql.functions.{conv, md5, substring, transform}
    val df = Seq(
      (1L, "a b c d e a b c d e"),           // repeated shingles
      (2L, "a  b c"),                        // double space → empty word
      (3L, "z é 😀 a z é"), // é + 😀: byte order ≠
                                             // UTF-16 order
      (4L, "one two"),                       // < n words → empty
      (5L, "")).toDF("doc_id", "text")
    val n = 3
    val rows = df.select(
      MinHash.sortedShingleSetCol(col("text"), n).as("kernel"),
      array_sort(array_distinct(Dedup.shingles(col("text"), n)))
        .as("tree"),
      MinHash.ngramHash60Col(col("text"), n).as("hkernel"),
      transform(Dedup.shingles(col("text"), n),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
        .as("htree")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), r.toString)
    }
  }

  test("incrementalExact: flags exactly the new docs whose fingerprint " +
    "is in the store, one row per new doc even when the store repeats " +
    "a fingerprint") {
    val newDocs = df((10L, "seen text"), (11L, "novel text"),
      (12L, "seen text"))
    // store with the SAME fingerprint twice — a left join would emit
    // doubled rows; semi/anti must not
    val store = df((1L, "seen text"), (2L, "seen text"),
      (3L, "other stored"))
    val out = Dedup.incrementalExact(newDocs, "doc_id", "text",
      Dedup.exact(store, "doc_id", "text").select(col("fingerprint"))
        .unionAll(Seq("dup-fp-row").toDF("fingerprint")
          .select(md5(col("fingerprint")).as("fingerprint"))))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(10L -> true, 11L -> false, 12L -> true))
    val cnt = Dedup.incrementalExact(newDocs, "doc_id", "text",
      df((1L, "seen text"), (2L, "seen text"))
        .select(md5(col("text")).as("fingerprint"))).count()
    assert(cnt == 3L) // no multiplication from the doubled store row
  }

  test("lshCandidatePairsAcross: cross-frame bucket join yields " +
    "exactly the near-dup (new, old) pairs, deduped across bands") {
    val store = df((1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"))
    val nw = df((10L, "alpha beta gamma delta epsilon"), // dup of 1
      (11L, "completely different words here now"))
    def bands(d: org.apache.spark.sql.DataFrame) = Dedup.lshBandsFromSig(
      Dedup.minhashSignatures(d, "doc_id", "text", 8, 3), 4, 8)
    val pairs = Dedup.lshCandidatePairsAcross(bands(nw), bands(store))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((10L, 1L))) // identical text → all bands
  }

  test("lshIndexIngest: growing-index step marks dups by signature " +
    "matches (never re-reading stored text), keeps dups OUT of the " +
    "delta, and signatureMatchesAcross equals the exploded per-seed " +
    "equality count") {
    val store = df((1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"))
    val nw = df(
      (10L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (11L, "completely different words here now"), // novel
      (12L, "one two three four six")) // near 2 (one word off)
    def sigs(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(d, "doc_id", "text", 8, 3)
    val storeSigs = sigs(store)
    val storeBands = Dedup.lshBandsFromSig(storeSigs, 4, 8)
    val (marks, delta) = Dedup.lshIndexIngest(sigs(nw), storeBands,
      storeSigs, 4, 8, minMatches = 4)
    val m = marks.collect().map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(m(10L), "exact dup not flagged")
    assert(!m(11L), "novel doc flagged")
    val deltaIds = delta.select("id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(!deltaIds.contains(10L), "dup entered the index")
    assert(deltaIds.contains(11L), "novel doc missing from the delta")
    assert(delta.filter(col("id") === 11L).count() == 4L,
      "novel doc must contribute one row per band")
    // marks ∪ nothing-else: exactly the signed new docs
    assert(m.keySet == Set(10L, 11L, 12L))
    // differential: the fused zip_with/aggregate count equals the
    // exploded (id, seed, minhash) per-seed equality count
    val cand = Dedup.lshCandidatePairsAcross(
      Dedup.lshBandsFromSig(sigs(nw), 4, 8), storeBands)
    val fused = Dedup.signatureMatchesAcross(cand, sigs(nw), storeSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val rowsNw = Dedup.minhash(nw, "doc_id", "text", 8, 3)
    val rowsSt = Dedup.minhash(store, "doc_id", "text", 8, 3)
    val exploded = cand
      .join(rowsNw.select(col("id").as("new_id"), col("seed"),
        col("minhash").as("ha")), "new_id")
      .join(rowsSt.select(col("id").as("old_id"), col("seed"),
        col("minhash").as("hb")), Seq("old_id", "seed"))
      .groupBy("new_id", "old_id")
      .agg(org.apache.spark.sql.functions.sum(
        when(col("ha") === col("hb"), 1L).otherwise(0L)).as("matches"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(fused == exploded, s"$fused vs $exploded")
    assert(fused((10L, 1L)) == 8L) // identical text → all 8 match
    // within-batch rule: two copies of a NOVEL doc in one increment —
    // the later (larger-id) copy is the dup, the earlier one enters
    // the index as the canonical
    val nw2 = df((13L, "brand new template words appear"),
      (14L, "brand new template words appear"))
    val (m2, d2) = Dedup.lshIndexIngest(sigs(nw2), storeBands,
      storeSigs, 4, 8, minMatches = 4, withinBatch = true)
    val mm2 = m2.collect().map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(mm2 == Map(13L -> false, 14L -> true), mm2.toString)
    assert(d2.select("id").distinct().collect().map(_.getLong(0))
      .toSet == Set(13L))
  }

  test("property: shingle kernels == Column trees on random unicode " +
    "text (multi-space runs, non-BMP chars, n ∈ {1,2,3,5})") {
    import org.apache.spark.sql.functions.{conv, md5, substring, transform}
    import org.scalacheck.Gen
    def sample[A](g: Gen[A]): A =
      Iterator.continually(g.sample).flatten.next()
    // word-soup with hostile tokens: empty runs (double spaces), accented
    // and supplementary characters (UTF8 vs UTF-16 order divergence)
    val txt = Gen.listOfN(sample(Gen.choose(0, 24)), Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("é"),
      Gen.const("😀"), Gen.const("zz"), Gen.const(" ")))
      .map(_.mkString(" "))
    val cases = (1 to 80).map(i => (i.toLong, sample(txt)))
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = cases.toDF("doc_id", "text").select(
        col("text"),
        MinHash.sortedShingleSetCol(col("text"), n).as("kernel"),
        array_sort(array_distinct(Dedup.shingles(col("text"), n)))
          .as("tree"),
        MinHash.ngramHash60Col(col("text"), n).as("hkernel"),
        transform(Dedup.shingles(col("text"), n),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
          .as("htree")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n text=${r.getString(0)}")
        assert(r.getSeq[Long](3) == r.getSeq[Long](4),
          s"n=$n text=${r.getString(0)}")
      }
    }
  }
}

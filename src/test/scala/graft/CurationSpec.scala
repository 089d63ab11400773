package graft

import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("ngramContamination flags exactly the docs sharing a benchmark " +
    "n-gram, counting distinct shared grams once") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares the 5-gram
      (2L, "alpha beta gamma delta epsilon zeta eta"), // shares two
      (3L, "one two three four five six"), // clean
      (4L, "alpha beta gamma delta") // < 5 words → no 5-grams
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta"),
      (101L, "unrelated words here nothing shared at all"))
      .toDF("doc_id", "text")
    val out = Curation.ngramContamination(corpus, bench, "doc_id",
      "text", 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 3L))
  }

  test("ngramContamination counts a gram once per doc even when " +
    "repeated in doc and benchmark") {
    val corpus = Seq(
      (1L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val out = Curation.ngramContamination(corpus, bench, "doc_id",
      "text", 5).collect()
    // doc 1 has 6 5-gram positions but only 5 DISTINCT 5-grams:
    // "a b c d e"(×2), "b c d e a", "c d e a b", "d e a b c", "e a b c d"
    assert(out.length == 1 && out.head.getLong(1) == 5L)
  }

  test("repetition: top and duplicate bigram fractions") {
    val d = Seq(
      (1L, "x y x y x y"), // bigrams: xy yx xy yx xy → top 3/5, dup 3/5
      (2L, "a b c d"), // all distinct: top 1/3, dup 0
      (3L, "solo") // < 2 words → absent
    ).toDF("doc_id", "text")
    val out = Curation.repetition(d, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(math.abs(out(1L)._1 - 3.0 / 5) < 1e-12)
    assert(math.abs(out(1L)._2 - 3.0 / 5) < 1e-12)
    assert(math.abs(out(2L)._1 - 1.0 / 3) < 1e-12)
    assert(out(2L)._2 == 0.0)
  }

  test("unigramLogProb: uniform corpus scores ln(1/V) per word; rare " +
    "words score lower") {
    // 4 words, each appearing exactly twice → p = 1/4 for all
    val uniform = Seq((1L, "a b"), (2L, "c d"), (3L, "a b"), (4L, "c d"))
      .toDF("doc_id", "text")
    val u = Curation.unigramLogProb(uniform, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = BigDecimal(math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(u.length == 4 && u.forall(_._2 == 2L))
    assert(u.forall(r => math.abs(r._3 - expected) < 1e-9))

    // doc of common words outscores the doc of rare words
    val skewed = Seq(
      (1L, "common common common common"),
      (2L, "rare1 rare2 rare3 rare4"))
      .toDF("doc_id", "text")
    val sc = Curation.unigramLogProb(skewed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sc(1L) > sc(2L))
  }

  test("LM scorers: vocabBounded=false drops the vocabulary broadcast " +
    "(shuffle fallback for open-ended vocabularies), identical results") {
    val d = Seq((1L, "a b a"), (2L, "b c"), (3L, "a c b a"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    // size-based auto-broadcast would mask the gate on these tiny
    // frames; plans are read PRE-execution (AQE may re-plan after)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((mk, name) <- Seq(
        ((b: Boolean) => Curation.unigramLogProb(d, "doc_id", "text",
          vocabBounded = b), "unigramLogProb"),
        ((b: Boolean) => Curation.bigramLogProb(d, "doc_id", "text",
          lambda = 0.75, vocabBounded = b), "bigramLogProb"))) {
        val hinted = mk(true)
        val fallback = mk(false)
        // corpus→vocab joins degrade to shuffle joins, not broadcasts;
        // the one legitimate broadcast left is the single-row total
        // (a BroadcastNestedLoopJoin, not a hash join)
        val plan = fallback.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin"), s"$name:\n$plan")
        val hintedPlan = hinted.queryExecution.executedPlan.toString
        assert(hintedPlan.contains("BroadcastHashJoin"), name)
        // the gate only moves the hint, never the numbers
        assert(rows(hinted) === rows(fallback), name)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("stratifiedSample: per-stratum rates land near their fractions, " +
    "selection is stable, and strata don't correlate with the split") {
    val d = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val fr = Map("en" -> 0.5, "de" -> 0.1)
    val out = Curation.stratifiedSample(d, "doc_id", "lang", fr, 0.0)
      .collect()
    val byLang = out.groupBy(_.getString(1)).map { case (l, rs) =>
      l -> rs.length.toDouble / 2000 }
    assert(math.abs(byLang("en") - 0.5) < 0.05, byLang)
    assert(math.abs(byLang("de") - 0.1) < 0.03, byLang)
    // stability: re-running selects the identical id set
    val again = Curation.stratifiedSample(d, "doc_id", "lang", fr, 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
    // buckets are salted with the stratum → disjoint from the md5(id)
    // split hash: among sampled en docs, the train/val/test bucket mix
    // should stay ≈ 80/10/10 (gross correlation would skew it)
    val enIds = out.filter(_.getString(1) == "en").map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def splitBucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val trainFrac =
      enIds.count(splitBucket(_) < 80).toDouble / enIds.length
    assert(math.abs(trainFrac - 0.8) < 0.05, s"trainFrac=$trainFrac")
  }

  test("packSequences: distributed prefix sum matches the sequential " +
    "global form for any bucket size; packs respect the budget") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 300L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(30))("wordword").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(7)
    def run(bucketSize: Int) =
      Curation.packSequences(df, "doc_id", "text", budget = 64,
        bucketSize = bucketSize)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    // sequential reference: exclusive cumsum // budget in id order
    val toks = docs.map { case (i, t) =>
      (i, t.split(" ").map(w => (w.length + 3) / 4).sum.toLong)
    }
    var cum = 0L
    val expected = toks.map { case (i, t) =>
      val p = cum / 64; cum += t; (i, t, p)
    }
    assert(run(100).toSeq == expected)
    // bucket-size invariance (boundaries at 17 split mid-pack)
    assert(run(17).toSeq == expected)
    assert(run(1000).toSeq == expected)
  }

  // planted-PII fixture: the registry corpus has no digits/'@' (its
  // pii_scan row is vacuous, like dedup_embedding_neardup) — this is
  // the non-vacuous evidence that the patterns actually hit and redact.
  test("piiScan counts and redacts planted emails/SSNs/IPs/phones, " +
    "in pattern order") {
    val df = Seq(
      (1L, "mail me at alice.smith+x@example.co.uk or bob@test.io now"),
      (2L, "ssn 123-45-6789 and server 10.0.255.7 logged it"),
      (3L, "call +1 555 123 4567 or 555-867-5309 today"),
      (4L, "clean text with no sensitive content at all"),
      (5L, "combo a@b.co 999-88-7777 1.2.3.4 12345678901")
    ).toDF("doc_id", "text")
    val out = Curation.piiScan(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    assert(out(1L) == ((2L, 0L, 0L, 0L,
      "mail me at <EMAIL> or <EMAIL> now")))
    // the SSN is redacted BEFORE the looser phone pattern can swallow
    // it; the IP never matches the dot-less phone charclass
    assert(out(2L) == ((0L, 1L, 1L, 0L,
      "ssn <SSN> and server <IP> logged it")))
    assert(out(3L) == ((0L, 0L, 0L, 2L, "call <PHONE> or <PHONE> today")))
    assert(out(4L) == ((0L, 0L, 0L, 0L,
      "clean text with no sensitive content at all")))
    assert(out(5L) == ((1L, 1L, 1L, 1L,
      "combo <EMAIL> <SSN> <IP> <PHONE>")))
  }

  test("tfidfTopK ranks by rounded tf*ln(N/df), ties by term, k bound") {
    // 4 docs; "rare" appears in 1 doc (idf=ln 4), "mid" in 2 (ln 2),
    // "common" in all 4 (idf=0)
    val df = Seq(
      (1L, "rare mid common common"),
      (2L, "mid common"),
      (3L, "common common common"),
      (4L, "common")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(df, "doc_id", "text", 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(t => (t._2, t._3)).toSeq ==
      Seq((1L, "rare"), (2L, "mid")))
    assert(doc1.head._4 == math.rint(math.log(4.0) * 1e6) / 1e6)
    // doc 3: only "common" (score 0) — fewer than k rows, no padding
    assert(out.count(_._1 == 3L) == 1)
    assert(out.filter(_._1 == 3L).head._4 == 0.0)
  }

  test("pmiCollocations: exact counts, minCount floor, top-N cut") {
    // "x y" occurs 3×, "y x" 2× in a 10-word stream of only x/y
    val df = Seq(
      (1L, "x y x y x y"), // bigrams: xy yx xy yx xy
      (2L, "x x y y") // xx xy yy
    ).toDF("doc_id", "text")
    val all = TextAnalysis.pmiCollocations(df, "text", topN = 10,
      minCount = 1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(all("x y")._1 == 4L && all("y x")._1 == 2L &&
      all("x x")._1 == 1L && all("y y")._1 == 1L)
    // W=10, c_x=5, c_y=5 ⇒ pmi(x y) = ln(4·10/25)
    assert(all("x y")._2 == math.rint(math.log(4.0 * 10 / 25) * 1e6) / 1e6)
    // minCount floors rare bigrams; topN cuts after ordering
    val floored = TextAnalysis.pmiCollocations(df, "text", 10, 2)
      .collect().map(_.getString(0)).toSet
    assert(floored == Set("x y", "y x"))
    assert(TextAnalysis.pmiCollocations(df, "text", 1, 1).count() == 1)
  }

  test("tfidfTopK/pmiCollocations vocabBounded=false: identical results " +
    "through the shuffle fallback, broadcast hint dropped from the plan") {
    // oversized-vocabulary posture: same corpus, gate OFF — the join
    // must lose its broadcast hint (shuffle fallback, the 100 TB
    // driver-OOM escape) while every output value stays identical
    val df = Seq(
      (1L, "rare mid common common alpha beta"),
      (2L, "mid common beta gamma"),
      (3L, "common common common delta"),
      (4L, "common alpha alpha")).toDF("doc_id", "text")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val tfOn = TextAnalysis.tfidfTopK(df, "doc_id", "text", 3)
    val tfOff = TextAnalysis.tfidfTopK(df, "doc_id", "text", 3,
      vocabBounded = false)
    assert(canon(tfOn.collect()) == canon(tfOff.collect()))
    // the one-row n_docs cross join keeps its broadcast either way;
    // the dfreq VOCABULARY join must lose its hint when the gate is off
    def hints(d: org.apache.spark.sql.DataFrame) = "strategy=broadcast".r
      .findAllIn(d.queryExecution.optimizedPlan.toString).size
    assert(hints(tfOff) < hints(tfOn),
      s"off=${hints(tfOff)} on=${hints(tfOn)}")
    assert(hints(tfOff) <= 1)
    val pmiOn = TextAnalysis.pmiCollocations(df, "text", 10, 1)
    val pmiOff = TextAnalysis.pmiCollocations(df, "text", 10, 1,
      vocabBounded = false)
    assert(canon(pmiOn.collect()) == canon(pmiOff.collect()))
    // the one-row w_total cross join keeps its broadcast either way;
    // the VOCABULARY joins must not carry a hint when the gate is off
    val offHints = "strategy=broadcast".r
      .findAllIn(pmiOff.queryExecution.optimizedPlan.toString).size
    val onHints = "strategy=broadcast".r
      .findAllIn(pmiOn.queryExecution.optimizedPlan.toString).size
    assert(offHints < onHints, s"off=$offHints on=$onHints")
    assert(offHints <= 1)
  }

  test("tfidfTopK heap ranking is bit-identical to the row_number " +
    "window form (score DESC, term ASC) including score ties") {
    // "tie1"/"tie2" have identical tf and df in doc 1 → equal score_r;
    // the heap's UTF-8 tie-break must match the window's term ASC
    val df = Seq(
      (1L, "tie1 tie2 solo solo"),
      (2L, "tie1 filler"),
      (3L, "tie2 filler filler")).toDF("doc_id", "text")
    val heap = TextAnalysis.tfidfTopK(df, "doc_id", "text", 2)
    // reference: the window formulation over the same scored frame
    val w = org.apache.spark.sql.functions.split(col("text"), " ")
    val tf = df.select(col("doc_id").as("id"), explode(w).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nd = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(nd)
      .withColumn("score_r",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score_r").desc, col("term"))
    val ref = scored
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 2)
      .select(col("id"), col("rank").cast("long").as("rank"),
        col("term"), col("score_r"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(canon(heap) == canon(ref))
  }

  test("bigramLogProb: hand-computed interpolated probabilities; " +
    "single-word docs absent; backoff keeps every bigram finite") {
    val s = spark
    import s.implicits._
    // unigrams: a×4 (incl. doc 3), b×2 — total 6;
    // bigrams: "a b"×2, "b a"×1
    val d = Seq((1L, "a b"), (2L, "a b a"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = Curation.bigramLogProb(d, "doc_id", "text", lambda = 0.75)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // p(a b) = .75·(2/4) + .25·(2/6); p(b a) = .75·(1/2) + .25·(4/6)
    val pab = 0.75 * (2.0 / 4) + 0.25 * (2.0 / 6)
    val pba = 0.75 * (1.0 / 2) + 0.25 * (4.0 / 6)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == ((1L, r6(math.log(pab)))))
    assert(out(2L) == ((2L,
      r6((math.log(pab) + math.log(pba)) / 2))))
    assert(!out.contains(3L)) // no bigrams
  }

  test("chunkDocuments: stride tiling covers every word, overlap " +
    "words repeat, short tail chunk kept, one chunk for short docs") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b c"),                                  // ≤ chunk → 1
      (3L, "p q r s t"))                              // short tail
      .toDF("doc_id", "text")
    val out = Curation.chunkDocuments(d, "doc_id", "text",
        chunkWords = 4, overlapWords = 1) // stride 3
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // doc 1: starts 1,4,7 → [w1..w4], [w4..w7], [w7..w10]
    assert(out((1L, 1L)) == (("w1 w2 w3 w4", 4L)))
    assert(out((1L, 2L)) == (("w4 w5 w6 w7", 4L)))
    assert(out((1L, 3L)) == (("w7 w8 w9 w10", 4L)))
    assert(!out.contains((1L, 4L)))
    // doc 2 fits in one chunk
    assert(out((2L, 1L)) == (("a b c", 3L)))
    assert(!out.contains((2L, 2L)))
    // doc 3: starts 1,4 → [p..s], short tail [s t]
    assert(out((3L, 1L)) == (("p q r s", 4L)))
    assert(out((3L, 2L)) == (("s t", 2L)))
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(d, "doc_id", "text", 4, 4) // overlap ≥ chunk
    }
    // a NULL document yields no chunks (contract pinned regardless of
    // ANSI vs legacy null-array semantics)
    val withNull = Seq((1L, Some("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ids = Curation.chunkDocuments(withNull, "doc_id", "text", 4, 1)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  test("property: chunk tiling equals a driver-side slice reference " +
    "(full coverage, exact overlap, exact tail) on random configs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 15) {
      val length = 1 + rnd.nextInt(60)
      val c = 1 + rnd.nextInt(12)
      val ov = rnd.nextInt(c)
      val stride = c - ov
      val wordSeq = (1 to length).map(i => s"w$i")
      val expected = {
        val n = 1 + math.max(0,
          math.ceil((length - c).toDouble / stride).toInt)
        (0 until n).map(k =>
          wordSeq.slice(k * stride, math.min(k * stride + c, length)))
      }
      val out = Curation.chunkDocuments(
          Seq((1L, wordSeq.mkString(" "))).toDF("doc_id", "text"), "doc_id",
          "text", c, ov)
        .orderBy("chunk_idx").collect()
      assert(out.length == expected.length, s"t$trial L=$length c=$c ov=$ov")
      out.zip(expected).foreach { case (r, exp) =>
        assert(r.getString(2) == exp.mkString(" "),
          s"t$trial L=$length c=$c ov=$ov idx=${r.getLong(1)}")
        assert(r.getLong(3) == exp.length.toLong)
      }
      // coverage: the chunks' word set is exactly the document's
      assert(expected.flatten.toSet == wordSeq.toSet,
        s"t$trial L=$length c=$c ov=$ov")
    }
  }

  test("removeRepeatedSpans cuts exactly the cross-doc repeated " +
    "windows; exact dup pair fully covered; clean doc untouched") {
    val s = spark
    import s.implicits._
    // docs 1+2 share 'alpha beta gamma delta' mid-text; 3+4 are exact
    // duplicates (fully covered); 5 is clean; 6 repeats a span only
    // WITHIN itself (internal repeat must not count as cross-doc)
    val d = Seq(
      (1L, "one two alpha beta gamma delta three four"),
      (2L, "five alpha beta gamma delta six seven eight"),
      (3L, "same exact duplicated document body here"),
      (4L, "same exact duplicated document body here"),
      (5L, "entirely unique words nowhere else repeated ever"),
      (6L, "x y z w x y z w padding tail")
    ).toDF("doc_id", "text")
    val out = Curation.removeRepeatedSpans(d, "doc_id", "text",
        n = 4, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    // doc 1: positions 2..5 covered (one 4-gram window)
    assert(out(1L) == ((8L, 4L, 0.5, "one two three four")))
    // doc 2: positions 1..4 covered
    assert(out(2L) == ((8L, 4L, 0.5, "five six seven eight")))
    // exact duplicates: every window shared → everything cut
    assert(out(3L) == ((6L, 6L, 1.0, "")))
    assert(out(4L) == ((6L, 6L, 1.0, "")))
    // clean doc: untouched, rewrite is identity
    assert(out(5L) ==
      ((7L, 0L, 0.0, "entirely unique words nowhere else repeated ever")))
    // internal repetition alone is not a cross-doc duplicate
    assert(out(6L) ==
      ((10L, 0L, 0.0, "x y z w x y z w padding tail")))
    intercept[IllegalArgumentException] {
      Curation.removeRepeatedSpans(d, "doc_id", "text", 4, minDocs = 1)
    }
  }

  test("hashSample: verdict is a pure function of (id, seed) — " +
    "invariant under partitioning; thresholds NEST (5% ⊂ 20%); rate " +
    "lands near nominal; plan is exchange-free") {
    val s = spark
    import s.implicits._
    val df = (1L to 4000L).map(i => (i, s"p$i")).toDF("id", "payload")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getLong(0)).toSet
    val a = Curation.hashSample(df.repartition(7), "id", "sd", 1L, 5L)
    val b = Curation.hashSample(df.repartition(2), "id", "sd", 1L, 5L)
    assert(ids(a) == ids(b))                       // partitioning-invariant
    val small = ids(Curation.hashSample(df, "id", "sd", 1L, 20L))
    assert(small.subsetOf(ids(a)))                 // nested thresholds
    val n = ids(a).size
    assert(n > 600 && n < 1000, s"rate off: $n/4000 at 20%")
    // different seed → a different (still-nested-by-its-own-rates) draw
    assert(ids(Curation.hashSample(df, "id", "sd2", 1L, 5L)) != ids(a))
    // the operator itself adds no exchange (the repartition above was
    // the test's own)
    val plan = Curation.hashSample(df, "id", "sd", 1L, 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("ppsSample: keep-probability scales with weight (heavier rows " +
    "kept strictly more often), inclusion is the exact integer test, " +
    "null/non-positive weights are excluded, thresholds nest, plan is " +
    "exchange-free") {
    val s = spark
    import s.implicits._
    val df = (1L to 3000L).map(i => (i, (i % 30) * 20L))
      .toDF("id", "w") // weights 0, 20, ..., 580
    val K = (1L << 60) / 600L
    val kept = Curation.ppsSample(df, "id", "w", "sd", K)
      .select("id", "w").collect().map(r => r.getLong(0) -> r.getLong(1))
    // weight 0 never kept; keep-rate increases with weight band
    assert(!kept.exists(_._2 == 0L))
    val byBand = kept.groupBy(_._2 / 200L).view.mapValues(_.size).toMap
    assert(byBand.getOrElse(0L, 0) < byBand.getOrElse(2L, 0))
    // overall rate near E = avg(w)/600 ≈ 0.483
    assert(kept.length > 1200 && kept.length < 1700, s"n=${kept.length}")
    // nesting: halving the per-unit threshold yields a subset
    val tighter = Curation.ppsSample(df, "id", "w", "sd", K / 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tighter.subsetOf(kept.map(_._1).toSet))
    // null weight excluded, not an ANSI error
    val withNull = df.withColumn("w",
      org.apache.spark.sql.functions.when(col("id") === 1L, null)
        .otherwise(col("w")))
    assert(!Curation.ppsSample(withNull, "id", "w", "sd", K)
      .select("id").collect().map(_.getLong(0)).contains(1L))
    val plan = Curation.ppsSample(df, "id", "w", "sd", K)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("capPerKey: exactly min(|key|, cap) rows per key, selection " +
    "matches the row_number window reference bit-for-bit, invariant " +
    "under partitioning, and the plan is a partial+final aggregate " +
    "with no Window") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed: key "hot" has 900 rows, "warm" 40, "cold" 3 (< cap)
    val rows = (1L to 900L).map(i => ("hot", i)) ++
      (1001L to 1040L).map(i => ("warm", i)) ++
      (2001L to 2003L).map(i => ("cold", i))
    val df = rows.toDF("src", "doc")
    val got = Curation.capPerKey(df.repartition(7), "doc", "src", "sd", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val sizes = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes == Map("hot" -> 10, "warm" -> 10, "cold" -> 3))
    // reference: row_number over the same 52-bit salted hash
    val h = conv(substring(md5(concat(col("src"), lit("#"),
      col("doc").cast("string"), lit(":sd"))), 1, 13), 16, 10)
      .cast("long")
    val ref = df.withColumn("h", h)
      .withColumn("cap_rank", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("h"), col("doc"))).cast("long"))
      .filter(col("cap_rank") <= 10)
      .select("src", "doc", "cap_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == ref)
    // partitioning-invariant
    val got2 = Curation.capPerKey(df.repartition(2), "doc", "src", "sd", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got2 == got)
    // plan: bounded-heap aggregate (partial+final), never a Window sort
    val plan = Curation.capPerKey(df, "doc", "src", "sd", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      plan.take(2000))
  }

  test("shuffleShard: permutation is exact (every id once, dense pos " +
    "per shard), matches the driver-side md5 reference, and is " +
    "invariant to input order and partitioning") {
    val s = spark
    import s.implicits._
    import graft.functions.MinHash.md5Prefix60
    val ids = (1L to 97L).toList
    val nShards = 8
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.shuffleShard(df, "doc_id", seed = "t", nShards = nShards)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
        .sortBy(t => (t._3, t._4))
    val out = run(ids.toDF("doc_id"))
    // driver-side reference: same hash, same shard, same within-shard
    // (key, id) order
    val ref = ids.map { id =>
      val k = md5Prefix60(s"$id:t"); (id, k, k % nShards)
    }.groupBy(_._3).toSeq.flatMap { case (shard, g) =>
      g.sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case ((id, k, _), i) => (id, k, shard, i.toLong) }
    }.sortBy(t => (t._3, t._4))
    assert(out.toSeq == ref)
    // every id exactly once; pos dense from 0 within each shard
    assert(out.map(_._1).toSet == ids.toSet)
    out.groupBy(_._3).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == (0L until g.length).toSeq)
    }
    // reproducible across input order/partitioning (the property an
    // RNG-keyed shuffle does NOT have)
    assert(run(scala.util.Random.shuffle(ids).toDF("doc_id")
      .repartition(5)).toSeq == out.toSeq)
  }

  test("removeRepeatedSpans plan: no shuffle carries document text") {
    val d = Seq((1L, "a b c d e"), (2L, "a b c d f"))
      .toDF("doc_id", "text")
    // AQE off for the capture: the adaptive wrapper hides exchanges
    // from a structural collect until execution
    val plan = {
      val k = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, "false")
      try Curation.removeRepeatedSpans(d, "doc_id", "text", 4)
        .queryExecution.executedPlan
      finally spark.conf.set(k, prev)
    }
    val shuffled = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }.flatten
    assert(shuffled.nonEmpty, "expected at least one exchange")
    // the detection plane's contract: its exchanges carry only ids,
    // positions, 8-byte gram hashes, and bounded position sets. (The
    // final rewrite join keeps text out of exchanges here via the
    // small-side broadcast; at corpus scale that join is the ONE place
    // bodies may cross the network — see the operator's scaladoc.)
    assert(!shuffled.exists(n => n == "text" || n == "clean_text"),
      s"document text crossed a shuffle: $shuffled")
  }

  test("CurationPipeline: every config step composes independently — " +
    "an empty config is the identity, dedup keeps min-id " +
    "representatives, filters precede the sample so rates apply to " +
    "survivors, split assignments are the registry convention") {
    val s = spark
    import s.implicits._
    import graft.operators.{CurationConfig, CurationPipeline}
    val docs = Seq(
      (1L, "alpha beta", "en", 10L), (2L, "alpha beta", "en", 10L),
      (3L, "gamma", "de", 5L), (4L, "delta", "fr", 60L),
      (5L, "epsilon", "en", 7L))
      .toDF("doc_id", "text", "lang", "n_chars")
    // identity
    assert(CurationPipeline.run(docs, "doc_id", "text", "lang",
      "n_chars", CurationConfig()).collect().length === 5)
    // length + lang filters
    val f = CurationPipeline.run(docs, "doc_id", "text", "lang",
        "n_chars", CurationConfig(minChars = Some(6L),
          maxChars = Some(50L), langs = Some(Seq("en"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(f === Set(1L, 2L, 5L))
    // exact dedup keeps the min id of the duplicate pair
    val d = CurationPipeline.run(docs, "doc_id", "text", "lang",
        "n_chars", CurationConfig(dedupeExact = true))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(d === Set(1L, 3L, 4L, 5L))
    // full-rate sample is a no-op selection; split matches the
    // registry convention (md5 bucket mod 100)
    val sp = CurationPipeline.run(docs, "doc_id", "text", "lang",
        "n_chars", CurationConfig(sampleNum = Some(1L), sampleDen = 1L,
          withSplit = true))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    assert(sp.size === 5)
    assert(sp.values.forall(Set("train", "validation", "test")))
  }

  test("exportShards: every row lands in exactly one shard, shard " +
    "files stream in the deterministic shuffle order, and a " +
    "re-export is identical") {
    val s = spark
    import s.implicits._
    import graft.operators.{Curation, CurationPipeline}
    val docs = (1L to 40L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text").repartition(5)
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    val manifest =
      CurationPipeline.exportShards(docs, "doc_id", out, "e0", 4)
    assert(manifest.map(_._2).sum === 40L)
    assert(manifest.map(_._1).toSet.subsetOf((0L until 4L).toSet))
    // within a shard file, rows appear in shuffle-key position order
    val expected = Curation.shuffleShard(docs, "doc_id", "e0", 4)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(0)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    expected.foreach { case (shard, ids) =>
      val got = spark.read.parquet(s"$out/shard=$shard")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(got === ids, s"shard $shard order")
    }
    // determinism: re-export over the same input is identical
    val manifest2 =
      CurationPipeline.exportShards(docs, "doc_id", out, "e0", 4)
    assert(manifest2 === manifest)
  }

  test("tokenQuota: quotas sum to the budget EXACTLY for ragged " +
    "weights, the largest remainders get the leftover (name " +
    "tie-break), and zero-weight sources get zero") {
    val s = spark
    import s.implicits._
    // weights 1,1,1 with budget 10: floor 3 each, r = 1 → the tied
    // remainders break by name: "a" gets the extra
    val even = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("k", "w")
    val q1 = Curation.tokenQuota(even, "k", "w", budget = 10L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota"))
      .toMap
    assert(q1 === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // ragged weights: Σ quota == budget under any proportions
    val ragged = Seq(("s1", 7L), ("s2", 13L), ("s3", 1L), ("s4", 0L),
      ("s5", 29L)).toDF("k", "w")
    val rows = Curation.tokenQuota(ragged, "k", "w", budget = 997L)
      .collect()
    assert(rows.map(_.getAs[Long]("quota")).sum === 997L)
    val byK = rows.map(r => r.getString(0) ->
      r.getAs[Long]("quota")).toMap
    assert(byK("s4") === 0L) // zero weight, zero remainder, no extra
    // proportionality: quota within 1 of the real share
    assert(math.abs(byK("s5") - 997.0 * 29 / 50) <= 1.0)
    // loud contract: all-zero / empty / negative weights are rejected
    // up front, never an ANSI division-by-zero mid-plan
    val zeros = Seq(("a", 0L), ("b", 0L)).toDF("k", "w")
    val ez = intercept[IllegalArgumentException] {
      Curation.tokenQuota(zeros, "k", "w", budget = 10L)
    }
    assert(ez.getMessage.contains("total weight"), ez.getMessage)
    val neg = Seq(("a", 5L), ("b", -1L)).toDF("k", "w")
    val en = intercept[IllegalArgumentException] {
      Curation.tokenQuota(neg, "k", "w", budget = 10L)
    }
    assert(en.getMessage.contains("negative weight"), en.getMessage)
    val emptyW = Seq.empty[(String, Long)].toDF("k", "w")
    intercept[IllegalArgumentException] {
      Curation.tokenQuota(emptyW, "k", "w", budget = 10L)
    }
  }

  test("stratifiedSplit: the GLOBAL val count is exactly " +
    "floor(n*bp/10^4), per-stratum counts are the largest-remainder " +
    "apportionment (within 1 of proportional) even under heavy " +
    "stratum skew, and the assignment is reproducible") {
    val s = spark
    import s.implicits._
    // skewed strata: 700 / 250 / 50
    val rows = ((1 to 700).map(i => (i.toLong, "big")) ++
      (701 to 950).map(i => (i.toLong, "mid")) ++
      (951 to 1000).map(i => (i.toLong, "tiny"))).toDF("id", "src")
    val out = Curation.stratifiedSplit(rows, "id", "src",
      seed = "t", valBp = 1000L, shards = 4)
    val valBySrc = out.filter($"split" === "val")
      .groupBy($"src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(valBySrc.values.sum === 100L) // exactly 10% of 1000
    for ((srcN, n) <- Seq(("big", 700.0), ("mid", 250.0),
      ("tiny", 50.0))) {
      val q = valBySrc.getOrElse(srcN, 0L).toDouble
      assert(math.abs(q - n / 10.0) <= 1.0, s"$srcN quota $q")
    }
    // reproducible: a second run assigns identically
    val again = Curation.stratifiedSplit(rows, "id", "src",
      seed = "t", valBp = 1000L, shards = 4)
      .collect().map(r => r.getLong(1) -> r.getString(4)).toMap
    val first = out.collect().map(r => r.getLong(1) -> r.getString(4))
      .toMap
    assert(again === first)
    // a different seed moves the selection, not the counts
    val other = Curation.stratifiedSplit(rows, "id", "src",
      seed = "u", valBp = 1000L, shards = 4)
      .filter($"split" === "val").collect()
      .map(_.getLong(1)).toSet
    assert(other.size === 100)
    assert(other != first.filter(_._2 == "val").keySet)
  }

  test("globalOrderIndex: idx is a PERMUTATION of 0..n-1, buckets " +
    "are contiguous and ordered, and within-bucket order follows " +
    "the salted hash — no global sort involved") {
    val s = spark
    import s.implicits._
    val rows = (1 to 500).map(i => (i.toLong, (i % 3).toLong))
      .toDF("id", "bkt")
    val out = Curation.globalOrderIndex(rows, "id", "bkt",
        seed = "g1", shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq === (0L until 500L))
    // bucket blocks are contiguous in idx order
    val byIdx = out.sortBy(_._3).map(_._2)
    assert(byIdx.toSeq === byIdx.sorted.toSeq)
    // deterministic across runs
    val again = Curation.globalOrderIndex(rows, "id", "bkt",
        seed = "g1", shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.map(t => t._1 -> t._3).toMap === again)
  }

  test("capPerKey bounds a hot basket's pair expansion: a planted " +
    "1000-item basket yields 64*63/2 pairs after the cap, never " +
    "n(n-1)/2 (the assoc_rules_pairs composition)") {
    val s = spark
    import s.implicits._
    val hot = (1 to 1000).map(p => (1L, p.toLong))
    val small = Seq((2L, 5000L), (2L, 5001L))
    val li = Curation.capPerKey((hot ++ small).toDF("o", "p"),
        idCol = "p", keyCol = "o", seed = "basket", maxPerKey = 64)
      .select($"o", $"p")
    val pairs = li.as("a")
      .join(li.as("b"),
        $"a.o" === $"b.o" && $"a.p" < $"b.p")
      .count()
    assert(pairs === 64L * 63 / 2 + 1)
    // under the cap, nothing is dropped
    assert(li.filter($"o" === 2L).count() === 2L)
  }

  test("quantileNormalize: hand-computed tie-sharing cume_dist in bp; " +
    "the max value always lands at 10000; fractional value columns " +
    "are rejected at plan time") {
    val s = spark
    import s.implicits._
    // group G values: 1, 2, 2, 5 → cum 1,3,3,4 → bp 2500, 7500, 7500,
    // 10000 (ties share the tie-group's UPPER rank)
    val df = Seq(("G", 10L, 1L), ("G", 11L, 2L), ("G", 12L, 2L),
      ("G", 13L, 5L), ("H", 20L, 9L)).toDF("g", "id", "v")
    val out = Curation.quantileNormalize(df, Seq("g"), "v")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("rank_bp")).toMap
    assert(out === Map(10L -> 2500L, 11L -> 7500L, 12L -> 7500L,
      13L -> 10000L, 20L -> 10000L))
    val e = intercept[IllegalArgumentException] {
      Curation.quantileNormalize(
        Seq(("G", 1L, 1.5)).toDF("g", "id", "v"), Seq("g"), "v")
    }
    assert(e.getMessage.toLowerCase.contains("integral"))
  }

  test("crossDocSpans: maximal cross-doc spans — overlapping anchors " +
    "merge along the diagonal, one row per (pair, alignment), " +
    "repeats inside a doc yield one row per alignment, maxDf drops " +
    "over-common anchors (shortening only the spans they support)") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x x c d e f g h i j"), // shares c..j (8 tokens) at (2,2)
      (3L, "c d e f g h z z z z"), // shares c..h (6) at (2,0)/(2,0)
      (4L, "p q r s t u p q r s t u"), // "p q r s t u" twice
      (5L, "p q r s t u v w x y0 y1 y2")
    ).toDF("doc_id", "text")
    def rows(maxDf: Option[Int]) =
      Curation.crossDocSpans(docs, "doc_id", "text", n = 6, maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    assert(rows(None) === Set(
      (1L, 2L, 2L, 2L, 8L), // three anchors (2,3,4) merged, diag 0
      (1L, 3L, 2L, 0L, 6L),
      (2L, 3L, 2L, 0L, 6L),
      (4L, 5L, 0L, 0L, 6L), // the repeat: one row per alignment
      (4L, 5L, 6L, 0L, 6L)))
    // "c d e f g h" anchors 3 docs -> dropped at maxDf=2: the 1-2
    // span loses its first anchor (shrinks to d..j, 7 tokens at
    // (3,3)), the anchor-only 1-3/2-3 spans vanish, 4-5 survives
    assert(rows(Some(2)) === Set(
      (1L, 2L, 3L, 3L, 7L),
      (4L, 5L, 0L, 0L, 6L),
      (4L, 5L, 6L, 0L, 6L)))
  }
}

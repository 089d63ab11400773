package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  val d = Seq((1L, "the quick the fox"), (2L, "aa bb cc dd"))
    .toDF("doc_id", "text")

  test("quality metrics: counts, ratios") {
    val out = TextAnalysis.quality(d, "doc_id", "text", Seq("the"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    val (nw, nc, distinct, stop) = out(1L)
    assert(nw == 4 && nc == 17)
    assert(distinct == 0.75) // {the, quick, fox} / 4
    assert(stop == 0.5)
  }

  test("langId: marker argmax with deterministic ties") {
    val markers = Map("en" -> Seq("the"), "xx" -> Seq("zz"))
    val out = TextAnalysis.langId(d, "doc_id", "text", markers)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    assert(out(1L) == ("en", 2))
    assert(out(2L) == ("xx", 0)) // 0-0 tie → lexicographically greatest
  }

  test("token counts: whitespace + ceil(len/4) subwords") {
    val out = TextAnalysis.tokenCounts(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (4L, 1L + 2L + 1L + 1L)) // the,quick,the,fox → 1+2+1+1
    assert(out(2L) == (4L, 4L))
  }

  test("tokenizerTokens: letter runs split into ceil(len/4) pieces; " +
    "digits and punctuation are one piece EACH (whitespace-word " +
    "counting sees neither); empty text is zero") {
    val df = Seq(
      (1L, "hello, world!"),       // hello(2) , (1) world(2) ! (1) = 6
      (2L, "price: 1234"),          // price(2) : (1) 1 2 3 4 (4)   = 7
      (3L, "abcdefgh"),             // one 8-run → 2
      (4L, ""),                     // no pretokens → 0
      (5L, "a.b.c")                 // a . b . c → 5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenBudget(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (4L, 6L))
    assert(out(2L) == (6L, 7L))
    assert(out(3L) == (1L, 2L))
    assert(out(4L) == (0L, 0L))
    assert(out(5L) == (5L, 5L))
    // on pure letters+spaces the tokenizer count equals the
    // whitespace-word bpe estimate (the synthetic-corpus degeneracy
    // the registry entry documents)
    val both = d.select(col("doc_id"),
      TextAnalysis.bpeTokens(col("text")).as("bpe"),
      TextAnalysis.tokenizerTokens(col("text")).as("tok")).collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), r))
  }

  test("packSequences with the tokenizer counter: same greedy packing " +
    "contract, budgeted in tokenizer tokens") {
    // budgets: "aaaa bb." → aaaa(1)+bb(1)+.(1)=3 tokens; whitespace
    // counter would say 2 words → the packing boundary MOVES
    val df = Seq(
      (0L, "aaaa bb."), (1L, "cccc dd."), (2L, "eeee ff."),
      (3L, "gggg hh.")).toDF("doc_id", "text")
    val byTok = graft.operators.Curation.packSequences(df, "doc_id",
        "text", budget = 4, bucketSize = 2,
        tokenCounter = TextAnalysis.tokenizerTokens)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // 3 tokens/doc, exclusive cums 0/3/6/9 → packs 0,0,1,2
    assert(byTok(0L) == (3L, 0L))
    assert(byTok(1L) == (3L, 0L))
    assert(byTok(2L) == (3L, 1L))
    assert(byTok(3L) == (3L, 2L))
    // the whitespace counter sees 2 "words"/doc (bb. is one word,
    // ceil(3/4)=1 piece): cums 0/2/4/6 → doc3 lands in pack 1, not 2 —
    // the budgeting unit really moves the packing boundary
    val byWord = graft.operators.Curation.packSequences(df, "doc_id",
        "text", budget = 4, bucketSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byWord == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("gopherRules: per-rule flags + keep conjunction on a " +
    "hand-computed fixture; each rule independently fails some doc") {
    val docs = Seq(
      (1L, "alpha beta gamma delta the the"), // passes everything
      (2L, "x y"),                            // too few words
      (3L, "aa bb cc dd ee ff the the"),      // mean word len 2.5 < 3
      (4L, "alpha beta gamma delta epsilon zeta"), // no stopwords
      (5L, "the the the the alpha beta"))     // top word frac 4/6
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
        stopwords = Seq("the"), minWords = 5, maxWords = 100,
        minAvgLen = 3.0, maxAvgLen = 10.0, maxTopWordFrac = 0.4,
        minStopHits = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
          r.getBoolean(8), r.getBoolean(9))).toMap
    assert(out(1L) == ((true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._5)        // word count
    assert(!out(3L)._2 && !out(3L)._5)        // word length
    assert(!out(4L)._3 && !out(4L)._5)        // stopwords
    assert(!out(5L)._4 && !out(5L)._5)        // repetition
    // metric values exact: doc 1 mean word len = (5+4+5+5+3+3)/6
    val m = TextAnalysis.gopherRules(docs, "doc_id", "text", Seq("the"),
      5, 100, 3.0, 10.0, 0.4, 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    assert(m(1L)._1 == 25.0 / 6)
    assert(m(5L)._2 == 4.0 / 6)
    // EMPTY stopword list: zero hits, not a plan-time array<null>
    // type error; minStopHits=0 keeps the rule vacuously true
    val noStop = TextAnalysis.gopherRules(docs, "doc_id", "text",
        Seq.empty, 5, 100, 2.0, 10.0, 0.9, 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(7))).toMap
    assert(noStop(1L) == ((0L, true)))
  }

  test("oovRate: top-K vocabulary by (count DESC, word ASC); OOV " +
    "fraction exact; boundary ties deterministic") {
    val docs = Seq(
      (1L, "a a a b b c"),   // a×3, b×2, c×1
      (2L, "a b z"),         // z is rare
      (3L, "q q z"))         // q×2
      .toDF("doc_id", "text")
    // corpus counts: a=4, b=3, q=2, z=2, c=1 → top-3 = {a, b, q}
    // (q beats z on the tie: count equal, word ASC)
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocabSize = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((6L, 1L, 1.0 / 6)))  // c is OOV
    assert(out(2L) == ((3L, 1L, 1.0 / 3)))  // z is OOV
    assert(out(3L) == ((3L, 1L, 1.0 / 3)))  // z OOV, q in vocab
  }

  test("oovRate: vocabSize above broadcastMaxVocab drops the hint " +
    "(shuffle fallback), identical results") {
    val docs = Seq((1L, "a a b c"), (2L, "a q z"))
      .toDF("doc_id", "text")
    def rows(v: org.apache.spark.sql.DataFrame) =
      v.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    // size-based auto-broadcast would mask the gate on these tiny
    // frames; plans are read PRE-execution (AQE may re-plan after)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hinted = TextAnalysis.oovRate(docs, "doc_id", "text",
        vocabSize = 3)
      val fallback = TextAnalysis.oovRate(docs, "doc_id", "text",
        vocabSize = 3, broadcastMaxVocab = 2)
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(!fallback.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(rows(hinted) === rows(fallback))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("crossDocNgramFrac: shared trigram counted once per doc; " +
    "unique docs score 0; short docs absent") {
    val docs = Seq(
      (1L, "a b c d"),      // trigrams: "a b c", "b c d"
      (2L, "a b c x"),      // shares "a b c" with doc 1
      (3L, "q r s t"),      // no overlap with anyone
      (4L, "xy"))           // < 3 words → no trigrams
      .toDF("doc_id", "text")
    val out = TextAnalysis.crossDocNgramFrac(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("temperatureWeights: alpha=1 is proportional, alpha=0 is " +
    "uniform, alpha=0.7 flattens toward small sources; weights sum ~1") {
    val docs = Seq(
      (1L, "a b c d e f g h", "big"),   // big: 8 + 4 = 12 tokens
      (2L, "a b c d", "big"),
      (3L, "a b c", "small"))           // small: 3 tokens
      .toDF("doc_id", "text", "source")
    def w(alpha: Double): Map[String, (Long, Double)] =
      TextAnalysis.temperatureWeights(docs, "source", "text", alpha)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    val w1 = w(1.0)
    assert(w1("big")._1 == 12L && w1("small")._1 == 3L)
    assert(w1("big")._2 == 0.8 && w1("small")._2 == 0.2)
    val w0 = w(0.0)
    assert(w0("big")._2 == 0.5 && w0("small")._2 == 0.5)
    val w07 = w(0.7)
    assert(w07("big")._2 < 0.8 && w07("small")._2 > 0.2) // flattened
    assert(math.abs(w07.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("fingerprint: bag hash is word-order independent") {
    val d2 = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(d2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(3)))
      .toMap
    assert(out(1L)._1 != out(2L)._1) // content hashes differ
    assert(out(1L)._2 == out(2L)._2) // bag hashes agree
    assert(out(1L)._2 != out(3L)._2)
  }

  test("profile fuses quality + langId into one pass with identical " +
    "values") {
    import graft.queries.PipelineQueries.{LangMarkers, Stopwords}
    val d = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "documents")
      .limit(50)
    val q = TextAnalysis.quality(d, "doc_id", "text", Stopwords)
    val l = TextAnalysis.langId(d, "doc_id", "text", LangMarkers)
    val joined = q.join(l, "id").orderBy("id").collect()
    val fused = TextAnalysis.profile(d, "doc_id", "text", Stopwords,
      LangMarkers).orderBy("id")
    val fusedRows = fused
      .select("id", "n_words", "n_chars", "avg_token_len",
        "distinct_ratio", "stopword_ratio", "pred_lang", "score")
      .collect()
    assert(joined.length == fusedRows.length)
    joined.zip(fusedRows).foreach { case (a, b) =>
      assert(a.getLong(a.fieldIndex("id")) == b.getLong(0))
      assert(a.getAs[String]("pred_lang") == b.getAs[String]("pred_lang"))
      assert(a.getAs[Double]("stopword_ratio")
        == b.getAs[Double]("stopword_ratio"))
    }
  }

  test("multimodal: binaryFile ingestion — one asset per file, " +
    "metadata-only reads prune content") {
    import java.nio.file.{Files => JFiles, Paths}
    val dir = JFiles.createTempDirectory("graft_media").toString
    JFiles.write(Paths.get(dir, "a.jpg"), Array[Byte](1, 2, 3))
    JFiles.write(Paths.get(dir, "b.jpg"), Array[Byte](4, 5))
    JFiles.write(Paths.get(dir, "skip.txt"), Array[Byte](9))
    val assets = graft.operators.Multimodal.fromBinaryFiles(
      spark, dir, "image", glob = "*.jpg")
    val rows = assets.orderBy("length").collect()
    assert(rows.length == 2) // glob routed media types
    assert(rows.map(_.getAs[Long]("length")).toSeq == Seq(2L, 3L))
    assert(rows.forall(_.getAs[Long]("asset_id") >= 0L))
    assert(rows.head.getAs[Array[Byte]]("payload").toSeq == Seq[Byte](4, 5))
    // metadata-only projection never reads file contents
    val metaPlan = assets.select("asset_id", "length", "media_type")
      .queryExecution.executedPlan.toString
    assert(!metaPlan.contains("content"), metaPlan.take(1500))
    // describe/decode compose on ingested assets unchanged
    val d = graft.operators.Multimodal.describe(assets)
    assert(d.count() == 2)
  }

  test("multimodal: describe + stub decode produce fixed-width features") {
    val assets = Multimodal.fromBinary(d, "doc_id",
      col("text").cast("binary"), "image")
    assert(assets.schema.fieldNames.toSeq ==
      Seq("asset_id", "media_type", "payload", "meta"))
    val desc = Multimodal.describe(assets).collect()
    assert(desc.forall(_.getAs[String]("codec") == "stub"))
    val feats = Multimodal.decodeStub(assets, 8).collect()
    assert(feats.forall(_.getSeq[Float](2).length == 8))
    val frames = Multimodal.sampleFrames(Multimodal.fromBinary(d, "doc_id",
      col("text").cast("binary"), "video"), 2).collect()
    assert(frames.length == 4)
  }

  test("hashedLinearScore: logit equals the driver-side weight-table " +
    "sum; repeated words count per occurrence; null text excluded; " +
    "plan is shuffle-free") {
    import graft.functions.MinHash.md5Prefix60
    val buckets = 16
    val weight = (w: String) => {
      val slot = (md5Prefix60(w) % buckets).toInt
      md5Prefix60(s"t#$slot") % 2001 - 1000
    }
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma"),
        (3L, null: String))
      .toDF("doc_id", "text")
    val df = TextAnalysis.hashedLinearScore(docs, "doc_id", "text",
      buckets = buckets, seed = "t")
    val out = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    val l1 = 2 * weight("alpha") + weight("beta")
    assert(out(1L) == ((3L, l1, l1 > 0)))
    assert(out(2L) == ((1L, weight("gamma"), weight("gamma") > 0)))
    // inference is row-local: model is a plan literal, no exchange
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("postings: tf counts repeats, first_pos is the 1-based first " +
    "occurrence") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "b a b c"), (2L, "c c")).toDF("doc_id", "text")
    val out = TextAnalysis.postings(docs, "doc_id", "text")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      ("b", 1L) -> ((2L, 1L)), ("a", 1L) -> ((1L, 2L)),
      ("c", 1L) -> ((1L, 4L)), ("c", 2L) -> ((2L, 1L))))
  }

  test("bm25TopK: hand-computed scores on a 3-doc corpus; repeated " +
    "query terms raise tf saturating per BM25; ranking deterministic " +
    "across partitioning") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x y"),       // both terms, tf(x)=2
      (2L, "x z z"),       // one term
      (3L, "z z z")        // no query terms — never scored
    ).toDF("doc_id", "text")
    // N=3, Σdl=9, avgdl=3; df(x)=2, df(y)=1
    def idf(dft: Double) = math.log(1.0 + (3 - dft + 0.5) / (dft + 0.5))
    def ts(tf: Long, dft: Double, dl: Long) =
      idf(dft) * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * dl / (9.0 / 3)))
    def r4(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Map(
      1L -> r4(ts(2, 2, 3) + ts(1, 1, 3)),
      2L -> r4(ts(1, 2, 3)))
    val out = TextAnalysis.bm25TopK(docs.repartition(3), "doc_id",
        "text", Seq("x", "y"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.toMap === expected)
    // doc 1 (more matches) ranks first; doc 3 absent
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
  }
}

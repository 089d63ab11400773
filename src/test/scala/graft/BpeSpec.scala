package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fixed-merges BPE encoder. Not SQL-expressible (per-word
  * iterate-until-fixpoint), so correctness rests on an ALGORITHM
  * differential: the engine's greedy lowest-rank loop (GPT-2 `bpe()`)
  * vs an independent rank-order reference — provably equivalent exactly
  * when the merge table is well-formed, which is asserted first. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("merge table is WELL-FORMED: every side is a single character " +
    "or the output of an earlier rank (the differential's premise)") {
    val produced = scala.collection.mutable.Set.empty[String]
    for ((l, r) <- Bpe.Merges) {
      assert(l.codePointCount(0, l.length) == 1 || produced.contains(l),
        s"left '$l' of ($l,$r) neither a char nor an earlier output")
      assert(r.codePointCount(0, r.length) == 1 || produced.contains(r),
        s"right '$r' of ($l,$r) neither a char nor an earlier output")
      produced += l + r
    }
  }

  /** Independent reference: process merges in RANK ORDER, each rank
    * repeated to fixpoint (disjoint left-to-right passes). On a
    * well-formed table this equals greedy-min-rank: a rank-r merge can
    * only create symbols that feed LATER ranks, so skipping back is
    * never needed. Structurally different code path from the engine. */
  private def rankOrderEncode(word: String): Vector[String] = {
    var syms: Vector[String] = word.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))
    for ((l, r) <- Bpe.Merges) {
      var changed = true
      while (changed) {
        changed = false
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2; changed = true
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  test("hand-computed encodes: full-merge words collapse to one token, " +
    "unknown characters stay singletons") {
    assert(Bpe.encodeWord("the") == Vector("the"))
    assert(Bpe.encodeWord("value") == Vector("value"))
    assert(Bpe.encodeWord("table") == Vector("table"))
    assert(Bpe.encodeWord("hash") == Vector("hash"))
    // d,a,t,a: only (a,t) fires → d,at,a
    assert(Bpe.encodeWord("data") == Vector("d", "at", "a"))
    assert(Bpe.encodeWord("xyz7") == Vector("x", "y", "z", "7"))
    assert(Bpe.encodeWord("") == Vector.empty)
  }

  test("greedy-min-rank (engine) ≡ rank-order (reference) on corpus " +
    "words, adversarial shapes, and pseudo-random strings") {
    val corpusWords = Seq("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch", "spark",
      "window", "order", "data", "column", "join", "small", "line",
      "customer", "query", "the", "a", "vector", "group", "big",
      "filter", "than", "sting", "quest", "standing", "hashhash",
      "valuevalue", "tatata", "ananan", "thethethe")
    for (w <- corpusWords)
      assert(Bpe.encodeWord(w) == rankOrderEncode(w), w)
    // pseudo-random lowercase strings, fixed seed — deterministic run
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(Bpe.encodeWord(w) == rankOrderEncode(w), w)
    }
  }

  test("tokenCount = Σ encodeWord sizes; concatenation never merges " +
    "ACROSS the whitespace pretoken boundary") {
    assert(Bpe.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "the value of data")) ==
      1 + 1 + Bpe.encodeWord("of").length + 3)
    // "t h" must NOT become "th" across the space
    assert(Bpe.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString("t h")) == 2)
  }

  test("Spark expression ≡ driver function over a frame; SQL surface " +
    "registered by bootstrap") {
    val words = Seq("the table", "value data hash", "zq xv", "standing")
    val df = words.toDF("text")
      .select(col("text"), Bpe.bpeTokenCountCol(col("text")).as("n"),
        Bpe.bpeEncodeCol(col("text")).as("toks"))
    val rows = df.collect()
    for (r <- rows) {
      val expect = r.getString(0).split(" ").filter(_.nonEmpty)
        .flatMap(Bpe.encodeWord).toSeq
      assert(r.getLong(1) == expect.length, r.getString(0))
      assert(r.getSeq[String](2) == expect, r.getString(0))
    }
    val viaSql = spark.sql(
      "SELECT bpe_tokens('the table'), bpe_encode('data')").collect()(0)
    assert(viaSql.getLong(0) == 2L)
    assert(viaSql.getSeq[String](1) == Seq("d", "at", "a"))
  }
}

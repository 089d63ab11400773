package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Token counting: whitespace tokens plus the BPE-ish subword
    * estimate, both exact integers. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    df.select(
      col(idCol).as("id"),
      size(w).cast("long").as("ws_tokens"),
      bpeTokens(col(textCol)).as("bpe_tokens"))
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
}

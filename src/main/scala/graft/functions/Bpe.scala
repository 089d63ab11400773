package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding tokenizer with a FIXED merge table — the
  * production-shaped counterpart to [[graft.operators.TextAnalysis
  * .tokenizerTokens]]'s regex estimate. A trained tokenizer ships
  * exactly two artifacts: a pretokenizer and an ordered merge list
  * (`merges.txt`); the encode loop below IS the GPT-2 `bpe()`
  * procedure (greedy lowest-rank adjacent merge, re-scanned after
  * every merge), so swapping [[Merges]] for a trained list changes
  * nothing structurally. The table here is an honest stand-in
  * (common English character pairs, the [[graft.operators
  * .TextAnalysis.hashedLinearScore]] deterministic-fake posture).
  *
  * Not SQL-expressible (the merge loop is iterate-until-fixpoint over
  * per-word state), so the registry entry is rows-only; correctness is
  * pinned by BpeSpec's ALGORITHM DIFFERENTIAL — the engine's greedy
  * min-rank loop vs an independent rank-order reference implementation,
  * equal exactly when the table is well-formed (every merge input is a
  * single char or an earlier merge's output — asserted in the spec) —
  * plus hand-computed fixtures.
  *
  * Scale shape: row-local codegen'd projection (the MinHash kernel
  * pattern — whole-stage codegen calls the static encoder), zero
  * shuffle, scan-bound at any SF. Per-word cost is O(len² · active
  * merges) with word-length-bounded state.
  */
object Bpe {

  /** Ordered merge list; rank = position. WELL-FORMED by construction:
    * each side is a single character or the output of an EARLIER rank
    * (spec-asserted), which makes greedy-min-rank and rank-order
    * processing provably equivalent — the differential's foundation. */
  final val Merges: Vector[(String, String)] = Vector(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "e" -> "r",
    "a" -> "n", "an" -> "d", "o" -> "n", "r" -> "e", "a" -> "t",
    "s" -> "t", "st" -> "a", "e" -> "n", "o" -> "r", "a" -> "r",
    "t" -> "e", "o" -> "u", "i" -> "t", "i" -> "s", "e" -> "s",
    "l" -> "e", "c" -> "o", "d" -> "e", "r" -> "o",
    "a" -> "s", "h" -> "a", "s" -> "e", "v" -> "a", "l" -> "u",
    "va" -> "lu", "t" -> "a", "s" -> "c", "b" -> "a", "m" -> "e",
    "w" -> "o", "p" -> "a", "f" -> "a", "f" -> "i", "k" -> "e",
    "g" -> "r", "q" -> "u", "qu" -> "e", "valu" -> "e", "ta" -> "b",
    "tab" -> "le", "h" -> "as", "has" -> "h")

  /** First occurrence wins on duplicate pairs (reverse fold so earlier
    * ranks overwrite later ones). */
  private val rank: Map[(String, String), Int] =
    Merges.zipWithIndex.reverse.toMap

  /** GPT-2 `bpe()` on one pretoken: symbols start as Unicode code
    * points; repeatedly merge ALL adjacent occurrences of the
    * lowest-rank pair present; stop when no adjacent pair is in the
    * table. Deterministic, total. */
  def encodeWord(word: String): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms: Vector[String] = {
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf.result()
    }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) bestRank = r
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = Merges(bestRank)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Whitespace-pretokenized BPE token COUNT of `text` (the budget
    * number). Static entry point for codegen. */
  def tokenCount(text: UTF8String): Long = {
    var total = 0L
    for (w <- text.toString.split(" ") if w.nonEmpty)
      total += encodeWord(w).length
    total
  }

  /** Whitespace-pretokenized BPE token STRINGS (flat, in order).
    * Static entry point for codegen. */
  def encodeTokens(text: UTF8String): ArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    for (w <- text.toString.split(" ") if w.nonEmpty)
      encodeWord(w).foreach(t => buf += UTF8String.fromString(t))
    new GenericArrayData(buf.toArray)
  }

  case class BpeTokenCount(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(t: Any): Any =
      tokenCount(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.Bpe.tokenCount($t);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class BpeEncode(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(t: Any): Any =
      encodeTokens(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.Bpe.encodeTokens($t);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def bpeTokenCountCol(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      BpeTokenCount(org.apache.spark.sql.GraftShim.expression(text)))

  def bpeEncodeCol(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      BpeEncode(org.apache.spark.sql.GraftShim.expression(text)))

  /** SQL surface: `bpe_tokens(text)`, `bpe_encode(text)`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, f: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, exprs => {
        require(exprs.length == 1,
          s"$name expects 1 argument, got ${exprs.length}")
        f(exprs.head)
      }, "built-in")
    one("bpe_tokens", BpeTokenCount(_))
    one("bpe_encode", BpeEncode(_))
  }
}

package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash / SimHash signature expressions (SURVEY.md §7.2:
  * custom `Expression` where codegen matters).
  *
  * The Column-composed formulation (explode shingles → md5 → groupBy id
  * with k min-aggregates) is semantically one scalar computation per
  * document, but Spark executes it as a row explosion plus a full
  * shuffle of |shingles| rows — at 100 TB that shuffle IS the dedup
  * cost. These expressions compute the identical signature inside a
  * per-row loop in whole-stage codegen: no explode, no shuffle, the
  * document text never leaves its input partition.
  *
  * Bit-parity contract (what the DuckDB oracle recomputes, so it cannot
  * drift): shingles are the `n`-word windows of the text split on a
  * single space (`split(text, " ")` semantics, empties preserved); per
  * shingle `h = md5(shingle)[first 15 hex chars] as uint60 mod p`; the
  * per-seed hash is the universal family `(A_s·h + B_s) mod p` with
  * the constants from [[graft.operators.Dedup]]; the signature is the
  * per-seed minimum. SimHash: per word the same 60-bit md5 prefix,
  * bit b of the result is set iff strictly more words have bit b set
  * than unset (±1 votes).
  */
object MinHash {

  /** Prime modulus 2^31 − 1 and universal-hash constants — the single
    * source of truth; [[graft.operators.Dedup]] aliases these and the
    * oracle SQL interpolates them, so engine and oracle cannot drift. */
  final val P = 2147483647L
  final val Mul = 2654435761L    // Knuth multiplicative constant
  final val AddMul = 40503L
  final val AddOff = 7L

  def seedA(seed: Int): Long = ((seed + 1L) * Mul) % P
  def seedB(seed: Int): Long = (seed * AddMul + AddOff) % P

  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(s) as an unsigned 60-bit value — exactly
    * `conv(substring(md5(s),1,15),16,10)`: the top 8 digest bytes
    * big-endian with the lowest nibble dropped. Public: driver-side
    * callers (hashed-feature weight tables, spec references) derive
    * SQL-reproducible constants from the same convention. */
  def md5Prefix60(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  /** The ONE shingle-construction convention, shared by every kernel in
    * this file: words = `split(" ", -1)` (Spark's `split(text, " ")` —
    * empties preserved), shingle i = space-joined window
    * [i, i+n), no shingles below `n` words. Calls `f` once per shingle
    * in position order; returns the shingle count (0 for short docs).
    * Assumes valid-UTF-8 text (the round-trip through java.lang.String
    * replaces invalid byte sequences — the documents contract). */
  private def foreachShingle(text: UTF8String, n: Int)(f: String => Unit)
      : Int = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return 0
    val m = words.length - n + 1
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      f(sb.toString)
      i += 1
    }
    m
  }

  /** k-seed MinHash signature of `text` over `n`-word shingles; empty
    * array when the doc has fewer than `n` words (no shingles → no
    * signature, matching the exploded formulation where such docs
    * simply produce no rows). */
  def signature(text: UTF8String, k: Int, n: Int): ArrayData = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var s = 0
    while (s < k) {
      a(s) = seedA(s)
      b(s) = seedB(s)
      s += 1
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = foreachShingle(text, n) { sh =>
      val h = md5Prefix60(sh) % P
      var t = 0
      while (t < k) {
        val v = (a(t) * h + b(t)) % P
        if (v < mins(t)) mins(t) = v
        t += 1
      }
    }
    if (m == 0) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(mins)
  }

  /** 60-bit SimHash over word unigrams (±1 votes per bit, bit set iff
    * votes > 0) — single pass, same md5 prefix as the signature path. */
  def simhash(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](60)
    var i = 0
    while (i < words.length) {
      val h = md5Prefix60(words(i))
      var bit = 0
      while (bit < 60) {
        votes(bit) += (((h >>> bit) & 1L).toInt * 2) - 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) out |= 1L << bit
      bit += 1
    }
    out
  }

  /** Per-position 60-bit md5 n-gram hashes of `text` — one row-local
    * pass (split → rolling window → digest-level md5 prefix), exactly
    * `transform(shingles(text, n), s -> conv(substring(md5(s),1,15),
    * 16, 10))` without materializing the shingle-string array or hex
    * round-trip. NOT distinct and NOT mod-p: the raw 60-bit value is
    * the curation family's join-key convention. Empty array for docs
    * with < n words (same as the shingles form). */
  def ngramHashes60(text: UTF8String, n: Int): ArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    foreachShingle(text, n)(sh => buf += md5Prefix60(sh))
    new GenericArrayData(buf.toArray)
  }

  /** Sorted distinct `n`-word shingle strings of `text` — one row-local
    * pass, exactly `array_sort(array_distinct(shingles(text, n)))`:
    * the sort compares UTF8String BYTES (what Spark's array_sort does;
    * Java String.compareTo would order supplementary characters
    * differently), distinct is adjacent-after-sort. Feeds
    * [[SortedIntersectCount]], whose sorted-input contract uses the
    * same binary ordering. Empty array below `n` words. */
  def sortedDistinctShingles(text: UTF8String, n: Int): ArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    foreachShingle(text, n)(sh => buf += UTF8String.fromString(sh))
    if (buf.isEmpty) return new GenericArrayData(Array.empty[AnyRef])
    val arr = buf.toArray
    // UTF8String.compareTo is unsigned byte order — array_sort parity
    java.util.Arrays.sort(arr,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var out = 0
    var i = 0
    while (i < arr.length) {
      if (out == 0 || !arr(i).equals(arr(out - 1))) {
        arr(out) = arr(i); out += 1
      }
      i += 1
    }
    new GenericArrayData(
      java.util.Arrays.copyOf(arr.asInstanceOf[Array[AnyRef]], out))
  }

  case class SortedShingleSet(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(t: Any): Any =
      sortedDistinctShingles(t.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinHash.sortedDistinctShingles(" +
          s"$t, $n);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class NgramHash60(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(t: Any): Any =
      ngramHashes60(t.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinHash.ngramHashes60($t, $n);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Intersection size of two SORTED string arrays — two-pointer merge,
    * O(n+m) with zero allocation, vs `array_intersect`'s per-call hash
    * set. Callers sort once in the upstream projection (`array_sort`
    * uses binary UTF8 ordering, same as UTF8String.compareTo). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCount(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.MinHash.sortedIntersectCount($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class MinHashSig(child: Expression, numHashes: Int, shingleLen: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(t: Any): Any =
      signature(t.asInstanceOf[UTF8String], numHashes, shingleLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinHash.signature(" +
          s"$t, $numHashes, $shingleLen);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class SimHash(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(t: Any): Any =
      simhash(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinHash.simhash($t);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  import org.apache.spark.sql.GraftShim

  /** SQL registration (`SELECT minhash_sig(text, 8, 3)`, `simhash(s)`,
    * `sorted_intersect_count(a, b)`) — same arity-checked pattern as
    * VectorExpressions.register. The k/n arguments must be foldable
    * integer literals (they parameterize codegen). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def arity(name: String, n: Int, es: Seq[Expression]): Unit =
      require(es.length == n,
        s"$name expects $n argument(s), got ${es.length}")
    def intLit(name: String, e: Expression): Int = {
      require(e.foldable, s"$name: argument must be a literal")
      e.eval() match {
        case i: Int  => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$name: expected an integer literal, got $other")
      }
    }
    reg.createOrReplaceTempFunction("minhash_sig",
      es => {
        arity("minhash_sig", 3, es)
        MinHashSig(es.head, intLit("minhash_sig", es(1)),
          intLit("minhash_sig", es(2)))
      }, "built-in")
    reg.createOrReplaceTempFunction("simhash",
      es => { arity("simhash", 1, es); SimHash(es.head) }, "built-in")
    reg.createOrReplaceTempFunction("ngram_hash60",
      es => {
        arity("ngram_hash60", 2, es)
        NgramHash60(es.head, intLit("ngram_hash60", es(1)))
      }, "built-in")
    reg.createOrReplaceTempFunction("sorted_shingle_set",
      es => {
        arity("sorted_shingle_set", 2, es)
        SortedShingleSet(es.head, intLit("sorted_shingle_set", es(1)))
      }, "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      es => {
        arity("sorted_intersect_count", 2, es)
        SortedIntersectCount(es.head, es(1))
      }, "built-in")
  }

  def ngramHash60Col(text: Column, n: Int): Column =
    GraftShim.column(NgramHash60(GraftShim.expression(text), n))
  def sortedShingleSetCol(text: Column, n: Int): Column =
    GraftShim.column(SortedShingleSet(GraftShim.expression(text), n))
  def minhashSig(text: Column, numHashes: Int, shingleLen: Int): Column =
    GraftShim.column(
      MinHashSig(GraftShim.expression(text), numHashes, shingleLen))
  def simhashCol(text: Column): Column =
    GraftShim.column(SimHash(GraftShim.expression(text)))
  def sortedIntersectCountCol(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Distributed two-phase top-k: a bounded-heap `Aggregator` that replaces
  * the `row_number() OVER (PARTITION BY query_id ORDER BY score)` pattern
  * in the ANN rank stages.
  *
  * Why: the window form funnels EVERY scored candidate of a query into a
  * single reducer task — for PQ's ADC shortlist the scored set is the
  * whole corpus, so at 100 TB the stage that should be a cheap scan
  * becomes a per-query serial sort. As an aggregate, Spark plans
  * ObjectHashAggregate(partial) → shuffle → ObjectHashAggregate(final):
  * each input partition contributes at most `cap` pre-ranked rows per
  * query (map-side combine), the shuffle carries |partitions|·cap rows
  * per query instead of |corpus|, and the final merge is bounded.
  *
  * Ordering is EXACTLY the window form's `score DESC, id ASC` with
  * Spark's double semantics (java.lang.Double.compare: NaN greatest —
  * first under DESC — and -0.0 < 0.0), so rankings are bit-identical to
  * the row_number formulation (differential-tested in SimilaritySpec).
  */
object TopKAgg {

  /** One scored candidate: (score, tie-breaking id). */
  case class Scored(score: Double, id: Long)

  /** Buffer/output: candidates; only `finish` guarantees sorted top-k.
    * `n` tracks |items| explicitly: items is an immutable prepend list
    * whose length()/lengthCompare() are O(n) walks — calling them per
    * reduce() made the hot loop O(rows·cap) (the r12 sf1 scale probe
    * caught ann_pca_topk's cap=104 shortlist at 30× its linear cost). */
  case class TopKItems(items: Seq[Scored], n: Int)

  /** score DESC, id ASC — java.lang.Double.compare matches Spark's
    * SortOrder double semantics (NaN largest, -0.0 < 0.0). */
  private[functions] val ord: Ordering[Scored] = new Ordering[Scored] {
    override def compare(x: Scored, y: Scored): Int = {
      val c = java.lang.Double.compare(y.score, x.score)
      if (c != 0) c else java.lang.Long.compare(x.id, y.id)
    }
  }

  /** Bounded top-k: the buffer holds at most `cap` (≥ 2k) candidates and
    * is trimmed to the true top-k whenever it overflows, so per-row work
    * is O(1) amortized and buffer memory is O(k) regardless of input
    * size. */
  class TopKAggregator(k: Int)
      extends Aggregator[Scored, TopKItems, TopKItems] {
    require(k > 0, s"top-k needs k > 0, got $k")
    private val cap = math.max(2 * k, 32)
    // O(1) per row: prepend + counter; the overflow trim (sort cap+1,
    // keep k) amortizes to O(log k) per row since it frees cap−k slots
    private def bound(xs: Seq[Scored], n: Int): TopKItems =
      if (n <= cap) TopKItems(xs, n)
      else TopKItems(xs.sorted(ord).take(k), k)
    override def zero: TopKItems = TopKItems(Nil, 0)
    override def reduce(b: TopKItems, a: Scored): TopKItems =
      bound(a +: b.items, b.n + 1)
    override def merge(a: TopKItems, b: TopKItems): TopKItems =
      bound(a.items ++ b.items, a.n + b.n)
    override def finish(r: TopKItems): TopKItems =
      TopKItems(r.items.sorted(ord).take(k), math.min(r.n, k))
    override def bufferEncoder: Encoder[TopKItems] =
      Encoders.product[TopKItems]
    override def outputEncoder: Encoder[TopKItems] =
      Encoders.product[TopKItems]
  }

  /** The aggregator as an untyped two-argument (score, id) aggregate
    * function; output is struct<items: array<struct<score,id>>> sorted
    * score DESC, id ASC — position i ⇒ rank i+1. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[Scored])

  /** One scored candidate with a STRING tie-break key — the payload
    * variant for rankings whose natural identity is text (tfidfTopK's
    * per-doc terms), where squeezing the key into a Long would lose it. */
  case class ScoredKey(score: Double, key: String)

  case class TopKKeyItems(items: Seq[ScoredKey], n: Int)

  /** score DESC, key ASC — Double.compare for Spark's double SortOrder
    * semantics (NaN greatest, -0.0 < 0.0), and the key compares as
    * UNSIGNED UTF-8 BYTES: Spark orders strings by UTF8String binary
    * comparison (so does DuckDB's default collation), while Java's
    * String.compareTo is UTF-16 code-unit order — the two diverge on
    * supplementary-plane characters, which 100 TB of crawl text
    * contains. */
  private[functions] val keyOrd: Ordering[ScoredKey] =
    new Ordering[ScoredKey] {
      private def utf8Compare(a: String, b: String): Int = {
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        val n = math.min(x.length, y.length)
        while (i < n) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
      override def compare(x: ScoredKey, y: ScoredKey): Int = {
        val c = java.lang.Double.compare(y.score, x.score)
        if (c != 0) c else utf8Compare(x.key, y.key)
      }
    }

  /** [[TopKAggregator]] with the string tie-break key: same bounded
    * buffer (≤ max(2k, 32) candidates, trimmed to top-k on overflow),
    * same two-phase ObjectHashAggregate plan shape. */
  class TopKKeyAggregator(k: Int)
      extends Aggregator[ScoredKey, TopKKeyItems, TopKKeyItems] {
    require(k > 0, s"top-k needs k > 0, got $k")
    private val cap = math.max(2 * k, 32)
    // same O(1)-per-row size tracking as TopKAggregator (see its note)
    private def bound(xs: Seq[ScoredKey], n: Int): TopKKeyItems =
      if (n <= cap) TopKKeyItems(xs, n)
      else TopKKeyItems(xs.sorted(keyOrd).take(k), k)
    override def zero: TopKKeyItems = TopKKeyItems(Nil, 0)
    override def reduce(b: TopKKeyItems, a: ScoredKey): TopKKeyItems =
      bound(a +: b.items, b.n + 1)
    override def merge(a: TopKKeyItems, b: TopKKeyItems): TopKKeyItems =
      bound(a.items ++ b.items, a.n + b.n)
    override def finish(r: TopKKeyItems): TopKKeyItems =
      TopKKeyItems(r.items.sorted(keyOrd).take(k), math.min(r.n, k))
    override def bufferEncoder: Encoder[TopKKeyItems] =
      Encoders.product[TopKKeyItems]
    override def outputEncoder: Encoder[TopKKeyItems] =
      Encoders.product[TopKKeyItems]
  }

  /** Untyped (score, key) top-k aggregate; output is
    * struct<items: array<struct<score,key>>> sorted score DESC,
    * key ASC — position i ⇒ rank i+1. */
  def topKByKey(k: Int): UserDefinedFunction =
    udaf(new TopKKeyAggregator(k), Encoders.product[ScoredKey])
}

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

  /** Buffer/output: candidates; only `finish` guarantees sorted top-k. */
  case class TopKItems(items: Seq[Scored])

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
    private def bound(xs: Seq[Scored]): TopKItems =
      if (xs.lengthCompare(cap) <= 0) TopKItems(xs)
      else TopKItems(xs.sorted(ord).take(k))
    override def zero: TopKItems = TopKItems(Nil)
    override def reduce(b: TopKItems, a: Scored): TopKItems =
      bound(a +: b.items)
    override def merge(a: TopKItems, b: TopKItems): TopKItems =
      bound(a.items ++ b.items)
    override def finish(r: TopKItems): TopKItems =
      TopKItems(r.items.sorted(ord).take(k))
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
}

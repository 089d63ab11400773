package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** SpaceSaving heavy hitters (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams"; merge rule after
  * Agarwal et al., "Mergeable Summaries") as a distributed aggregate:
  * approximate top-k frequent items in BOUNDED memory — the sketch the
  * exact (key, count) group-by cannot be at 100 TB when the key space
  * itself is huge (URLs, n-grams, user ids): the exact form's shuffle
  * carries one row per DISTINCT key; this carries `capacity` rows per
  * input partition, period.
  *
  * Guarantees (N = rows aggregated, m = capacity):
  *  - every reported count overestimates: true ≤ count ≤ true + err,
  *    with per-item err tracked exactly;
  *  - any key with true frequency > N/m is IN the summary (the
  *    SpaceSaving frequent-items guarantee), and err ≤ N/m;
  *  - **exact mode**: if no counter ever evicted anywhere (capacity ≥
  *    distinct keys per partial), every count is exact, every err is 0,
  *    and the result is independent of partitioning — the mode the
  *    oracle-checked registry query runs in (deterministic by
  *    construction). In saturated mode the top-k set can depend on
  *    partition boundaries — inherent to merged SpaceSaving; the spec
  *    pins the error bound and the frequent-items guarantee instead.
  *
  * Merge is the conservative mergeable-summaries rule: a key absent
  * from one side is assumed to have been evicted there with count up to
  * that side's eviction baseline `base` (0 if that side never evicted
  * — absent then truly means zero, which is what keeps exact mode
  * exact). Bases add; overflow trims to the top-`capacity` counters and
  * raises the base to the largest trimmed count.
  */
object HeavyHitters {

  /** One counter: count overestimates the key's true frequency by at
    * most err. */
  case class Counter(key: String, cnt: Long, err: Long)

  /** Output wrapper (product-encodable, same pattern as TopKAgg). */
  case class HHItems(items: Seq[Counter])

  /** base = eviction baseline: every key NOT in `items` has true
    * frequency ≤ base in the aggregated stream. */
  case class SSBuf(base: Long, items: Map[String, (Long, Long)])

  /** Output rank order: count DESC, key ASC (deterministic ties). */
  private[functions] val ord: Ordering[Counter] = new Ordering[Counter] {
    override def compare(x: Counter, y: Counter): Int = {
      val c = java.lang.Long.compare(y.cnt, x.cnt)
      if (c != 0) c else x.key.compareTo(y.key)
    }
  }

  class SpaceSavingAggregator(capacity: Int, k: Int)
      extends Aggregator[String, SSBuf, HHItems] {
    require(capacity >= k && k > 0,
      s"need capacity >= k > 0, got capacity=$capacity k=$k")

    override def zero: SSBuf = SSBuf(0L, Map.empty)

    override def reduce(b: SSBuf, key: String): SSBuf =
      b.items.get(key) match {
        case Some((c, e)) =>
          SSBuf(b.base, b.items.updated(key, (c + 1, e)))
        case None if b.items.size < capacity =>
          // never-full summaries never evicted ⇒ base stays 0 and new
          // keys enter with exact count 1 / err 0 (exact mode)
          SSBuf(b.base, b.items.updated(key, (b.base + 1, b.base)))
        case None =>
          // classic SpaceSaving eviction: replace the min counter; the
          // newcomer inherits its count as upper bound and error
          val (minK, (minC, _)) = b.items.minBy { case (kk, (c, _)) =>
            (c, kk) } // deterministic victim: (count, key) ASC
          SSBuf(math.max(b.base, minC),
            (b.items - minK).updated(key, (minC + 1, minC)))
      }

    override def merge(a: SSBuf, b: SSBuf): SSBuf = {
      // pointwise conservative sum: absent side contributes its base
      // as both count upper-bound and error
      val keys = a.items.keySet ++ b.items.keySet
      val summed = keys.iterator.map { key =>
        val (c1, e1) = a.items.getOrElse(key, (a.base, a.base))
        val (c2, e2) = b.items.getOrElse(key, (b.base, b.base))
        key -> (c1 + c2, e1 + e2)
      }.toMap
      val base = a.base + b.base
      if (summed.size <= capacity) SSBuf(base, summed)
      else {
        // trim to top-capacity by (count DESC, key ASC); the largest
        // trimmed count becomes the new eviction baseline
        val sorted = summed.toSeq.sortBy { case (key, (c, _)) =>
          (-c, key) }
        val kept = sorted.take(capacity)
        val newBase = math.max(base, sorted(capacity)._2._1)
        SSBuf(newBase, kept.toMap)
      }
    }

    override def finish(r: SSBuf): HHItems =
      HHItems(r.items.iterator
        .map { case (key, (c, e)) => Counter(key, c, e) }
        .toSeq.sorted(ord).take(k))

    override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
    override def outputEncoder: Encoder[HHItems] =
      Encoders.product[HHItems]
  }

  /** The aggregator as an untyped single-argument (key) aggregate:
    * output is struct<items: array<struct<key,cnt,err>>> sorted cnt
    * DESC, key ASC — position i ⇒ rank i+1. */
  def spaceSaving(capacity: Int, k: Int): UserDefinedFunction =
    udaf(new SpaceSavingAggregator(capacity, k), Encoders.STRING)
}

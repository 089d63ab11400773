package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDSketch-style log-bucket quantile sketch (Masson et al., "DDSketch:
  * a fast and fully-mergeable quantile sketch with relative-error
  * guarantees", VLDB 2019): values bucket by ⌈log_γ v⌉ with
  * γ = (1+α)/(1−α), so returning the bucket's midpoint-of-ratio
  * estimate 2γ^i/(γ+1) for the bucket holding the target rank is
  * within RELATIVE error α of the true quantile — the
  * latency-percentile primitive a monitoring plane runs on.
  *
  * Chosen over KLL deliberately: the state is a bucket→count map, so
  * merging is plain ADDITION — merge-order-insensitive (a KLL
  * compactor's output depends on merge order, which Spark's partial
  * aggregation does not fix), exact-integer, bounded, and the whole
  * path is expressible in ANSI SQL, which makes the batch face fully
  * DuckDB-oracle-able rather than rows-only. The one cross-engine
  * float hazard is ⌈ln v/ln γ⌉ flipping at a bucket boundary, which
  * needs an engine's libm `ln` to differ in the last ulp exactly at a
  * near-integer quotient — the stats_benford floor-of-log precedent.
  *
  * Scale shape (batch face): one map-side-combined
  * groupBy((group, bucket)) corpus pass — the bucketing itself is a
  * pure codegen projection — then cumulative windows PARTITIONED per
  * group over the bucket frame, bounded by |groups|·O(log_γ range)
  * (α = 2% ⇒ ~820 buckets across a 1..10⁷ cents range). The
  * streaming face ([[graft.streaming.StreamIngest.quantileSketchStream]])
  * folds the same buckets into per-key map state.
  *
  * Values must be POSITIVE (the log bucketing's domain); rows with
  * v ≤ 0 are excluded from the sketch, mirroring the DuckDB oracle's
  * WHERE v > 0. */
object QuantileSketch {

  /** γ for a relative-error budget given in basis points of relative
    * error (α = alphaBp/10⁴): γ = (1+α)/(1−α). */
  def gamma(alphaBp: Int): Double = {
    require(alphaBp >= 1 && alphaBp <= 2000,
      s"alphaBp must be in [1, 2000]: $alphaBp")
    (10000.0 + alphaBp) / (10000.0 - alphaBp)
  }

  /** Bucket index of a positive value: ⌈ln v / ln γ⌉ (bucket i covers
    * (γ^(i−1), γ^i]). Shared by the batch projection and the
    * streaming fold so the two faces are bit-identical. */
  def bucketOf(v: Long, lnGamma: Double): Long = {
    require(v > 0, s"sketch values must be positive: $v")
    math.ceil(math.log(v.toDouble) / lnGamma).toLong
  }

  /** Midpoint-of-ratio estimate for a bucket: 2γ^i/(γ+1), computed as
    * exp(i·ln γ) so both faces (and the SQL oracle) share one
    * fixed-order formula. */
  def estimateOf(bucket: Long, alphaBp: Int): Double = {
    val g = gamma(alphaBp)
    2.0 * math.exp(bucket.toDouble * math.log(g)) / (g + 1.0)
  }

  /** Per-group sketch quantiles: for each (num, den) rational q the
    * PERCENTILE_DISC rank ⌈q·n⌉ picks its bucket off the cumulative
    * bucket frame and the output column (named by `names`, rounded 4)
    * carries the bucket's estimate — relative error ≤ α vs the exact
    * order statistic (pinned in QuantileSketchSpec).
    *
    * Output: (group…, n — positive-value count, names…). */
  def ddQuantiles(df: DataFrame, groupCols: Seq[String],
      centsCol: String, alphaBp: Int, qs: Seq[(Long, Long)],
      names: Seq[String]): DataFrame = {
    require(qs.nonEmpty && qs.size == names.size,
      s"one name per quantile: $qs / $names")
    qs.foreach { case (num, den) =>
      require(num > 0 && num <= den, s"quantile must be in (0, 1]: $num/$den") }
    val g = gamma(alphaBp)
    val lnG = math.log(g)
    val gc = groupCols.map(col)
    val buckets = df
      .filter(col(centsCol).cast("long") > 0)
      .select(gc :+ ceil(log(col(centsCol).cast("double")) / lit(lnG))
        .cast("long").as("bk"): _*)
      .groupBy(gc :+ col("bk"): _*)
      .agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("bk"))
    val wAll = Window.partitionBy(gc: _*)
    val cum = buckets
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val picks = qs.zip(names).map { case ((num, den), name) =>
      min(when(col("cum") >=
        expr(s"(n * $num + ${den - 1}) div $den"), col("bk")))
        .as(s"__b_$name") }
    val agg = cum.groupBy(gc: _*)
      .agg(max(col("n")).as("n"), picks: _*)
    names.foldLeft(agg) { (d, name) =>
      d.withColumn(name,
          round(lit(2.0) * exp(col(s"__b_$name").cast("double") *
            lit(lnG)) / lit(g + 1.0), 4))
        .drop(s"__b_$name")
    }
  }

  /** The sketch's bounded merge state: the bucket→count map plus the
    * sticky has-ever-collapsed marker. */
  final case class DdState(collapsed: Boolean, counts: Map[Long, Long])

  /** A finished sketch: positive-value count, collapse marker, and
    * one midpoint-of-ratio estimate per requested quantile (rounded 4,
    * HALF_UP — the same formula as [[ddQuantiles]] and the streaming
    * fold, so all three faces are bit-identical). */
  final case class DdSnapshot(n: Long, collapsed: Boolean,
      ests: Seq[Double])

  /** DDSketch as a Catalyst-mergeable AGGREGATOR over cent values —
    * the composition piece that lets the sketch ride ANY grouping the
    * engine can express (session windows, tumbling windows, rollups)
    * instead of only the hand-built relational form: counts are
    * additive, so partial aggregation / state-store merges are
    * order-insensitive while the map stays below `maxBuckets`; past
    * the bound the lowest buckets collapse (upper — latency-alarm —
    * quantiles keep their α guarantee regardless: collapse only ever
    * merges the LOWEST buckets, leaving every upper bucket's
    * cumulative rank untouched; which low buckets fuse first is the
    * one arrival-order-sensitive detail, marked by `collapsed`). */
  final class DdSketchAggregator(alphaBp: Int, maxBuckets: Int,
      qs: Seq[(Long, Long)])
      extends org.apache.spark.sql.expressions
        .Aggregator[Long, DdState, DdSnapshot] {
    require(maxBuckets >= 2, s"maxBuckets must be >= 2: $maxBuckets")
    require(qs.nonEmpty, "need at least one quantile")
    @transient private lazy val g = gamma(alphaBp)
    @transient private lazy val lnG = math.log(g)

    private def collapse(s: DdState): DdState = {
      var counts = s.counts
      var c = s.collapsed
      while (counts.size > maxBuckets) {
        val lows = counts.keys.toSeq.sorted.take(2)
        counts = (counts - lows(0))
          .updated(lows(1), counts(lows(1)) + counts(lows(0)))
        c = true
      }
      DdState(c, counts)
    }
    override def zero: DdState = DdState(collapsed = false, Map.empty)
    override def reduce(b: DdState, vc: Long): DdState = {
      val bk = bucketOf(vc, lnG)
      collapse(DdState(b.collapsed,
        b.counts.updated(bk, b.counts.getOrElse(bk, 0L) + 1L)))
    }
    override def merge(a: DdState, b: DdState): DdState =
      collapse(DdState(a.collapsed || b.collapsed,
        b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, 0L) + v)
        }))
    override def finish(s: DdState): DdSnapshot = {
      val n = s.counts.valuesIterator.sum
      if (n == 0L) DdSnapshot(0L, s.collapsed, qs.map(_ => 0.0))
      else {
        val sortedB = s.counts.toSeq.sortBy(_._1)
        val ests = qs.map { case (num, den) =>
          val rank = (n * num + den - 1) / den
          var cum = 0L
          var pick = sortedB.last._1
          var found = false
          sortedB.foreach { case (bk, c) =>
            if (!found) {
              cum += c; if (cum >= rank) { pick = bk; found = true }
            }
          }
          BigDecimal(2.0 * math.exp(pick.toDouble * lnG) / (g + 1.0))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        DdSnapshot(n, s.collapsed, ests)
      }
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[DdState] =
      org.apache.spark.sql.Encoders.product[DdState]
    override def outputEncoder: org.apache.spark.sql.Encoder[DdSnapshot] =
      org.apache.spark.sql.Encoders.product[DdSnapshot]
  }
}

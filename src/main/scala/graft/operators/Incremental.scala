package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (algebraic-view upkeep): keep a
  * per-key summary current by merging the summary of NEW data into the
  * stored summary of OLD data, never rescanning history — the pattern
  * that turns a daily 100 TB re-aggregation into a merge of one day's
  * partials against yesterday's rollup. North-star engine surface (the
  * reference re-reads source windows on every sync,
  * pkg/agent/sync.go-style; an analytics engine should maintain, not
  * recompute).
  *
  * Only ALGEBRAIC aggregates participate (n, Σ, min, max — each
  * mergeable by sum/sum/min/max); derived values (mean here, variance
  * via Σx² the same way) are re-derived from the merged partials at
  * read time, never stored. This is exactly Spark's own
  * partial/final aggregation contract lifted to storage: a partial
  * frame IS a map-side combine that survived materialization, so
  * merging k days of partials shuffles k·|keys| summary rows, not the
  * corpus.
  */
object Incremental {

  /** One key's algebraic summary of a cents measure:
    * (keys…, n, sum_c, min_c, max_c). Deterministic (exact Longs),
    * mergeable with [[mergePartialStats]]. */
  def partialStats(df: DataFrame, keys: Seq[String], centsCol: String)
      : DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(centsCol).cast("long")).as("sum_c"),
        min(col(centsCol).cast("long")).as("min_c"),
        max(col(centsCol).cast("long")).as("max_c"))

  /** Merge any union of partial-summary frames back into one summary
    * per key, and re-derive the half-up micro-unit mean from the
    * merged (Σ, n). Associative and commutative — partials can arrive
    * in any order, any grouping (the idempotent re-copy discipline's
    * aggregate twin). */
  def mergePartialStats(partials: DataFrame, keys: Seq[String])
      : DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"), max(col("max_c")).as("max_c"))
      .withColumn("mean_u",
        expr("(2 * sum_c * 10000 + n) div (2 * n)"))
}

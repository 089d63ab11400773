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

  /** Slowly-Changing-Dimension Type 2 history: collapse an update
    * stream (key, ts, attribute) into validity intervals — one row
    * per VALUE RUN with [valid_from, valid_to) bounds, open-ended
    * (NULL valid_to + is_current) on the latest run. The warehouse
    * answer to "what was this entity's state at time T" that a
    * latest-wins upsert (CopyJob.mergeLatest) throws away.
    *
    * Gaps-and-islands per key: change-flag = value ≠ lag(value), run
    * id = running sum of flags, one groupBy((key, run)) for the run
    * start, lead(valid_from) for the exclusive end — two windows and
    * one aggregate, all partitioned by the entity key, O(runs)
    * output. Contract: (key, ts) unique (pre-aggregate duplicates —
    * the asofJoin convention); the attribute column must be
    * null-free (NULL runs would need null-safe change flags; reject
    * loudly rather than guess).
    *
    * Output: (key, value, valid_from, valid_to, is_current). */
  def scd2(updates: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byT = Window.partitionBy(col("k")).orderBy(col("t"))
    val prev = lag(col("v"), 1).over(byT)
    val runs = updates
      .select(col(keyCol).as("k"), col(tsCol).cast("long").as("t"),
        col(valueCol).as("v"))
      .withColumn("chg",
        when(prev.isNull || (prev =!= col("v")), 1L).otherwise(0L))
      .withColumn("run", sum(col("chg")).over(byT))
      .groupBy(col("k"), col("run"), col("v"))
      .agg(min(col("t")).as("valid_from"))
    val byFrom = Window.partitionBy(col("k")).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .select(col("k").as(keyCol), col("v").as(valueCol),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Apply a CDC changelog (op ∈ I/U/D per key, timestamped) to
    * produce the current snapshot: the LATEST op per key wins —
    * inserts/updates materialize their value, a trailing delete
    * removes the key entirely. One struct-max argmax per key (the
    * merge_latest_upsert partial/final hash-agg shape — no window,
    * no per-key sort state), then a row-local filter on the winning
    * op. Ties on (ts) break by op then value (deterministic in any
    * engine); D > U > I at the same instant, so a same-tick
    * delete+insert resolves to delete — declare the tie rule rather
    * than inherit arrival order.
    *
    * Output: (key, value, ts) — the surviving rows only. */
  def applyChangelog(log: DataFrame, keyCol: String, tsCol: String,
      opCol: String, valueCol: String): DataFrame = {
    val rank = when(col("op") === "D", 2L)
      .when(col("op") === "U", 1L).otherwise(0L)
    log
      .select(col(keyCol).as("k"), col(tsCol).cast("long").as("t"),
        col(opCol).as("op"), col(valueCol).as("v"))
      .groupBy(col("k"))
      .agg(max(struct(col("t"), rank.as("r"), col("v"), col("op")))
        .as("w"))
      .filter(col("w.op") =!= "D")
      .select(col("k").as(keyCol), col("w.v").as(valueCol),
        col("w.t").as(tsCol))
  }

  /** Snapshot DIFF: given two keyed snapshots of the same entity set,
    * emit one row per key whose state changed — op I (in new only),
    * D (in old only), or U (in both, any compared column differs) —
    * the CDC changelog GENERATOR ([[applyChangelog]] is its
    * consumer: applyChangelog(snapshotDiff(old, new), …) over old
    * reproduces new, the round-trip a replication pipeline audits
    * with). Comparison is null-safe (`<=>`), so NULL→value and
    * value→NULL both surface as U.
    *
    * Scale shape: ONE full-outer equi-join on the key — both sides
    * shuffle-partition by the same key (co-partitioned at 100 TB via
    * bucketed snapshot layout), no window, no collect; unchanged keys
    * (the overwhelming majority of a daily snapshot pair) are
    * filtered before the output materializes.
    *
    * Output: (key, op, old/new value per compared column). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    val o = oldSnap.select((keyCol +: compareCols).map(c =>
      col(c).as(if (c == keyCol) c else s"old_$c")): _*)
      .withColumn("__in_old", lit(true))
    val n = newSnap.select((keyCol +: compareCols).map(c =>
      col(c).as(if (c == keyCol) c else s"new_$c")): _*)
      .withColumn("__in_new", lit(true))
    val changed = compareCols.map(c =>
      !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, "I")
          .when(col("__in_new").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(col(keyCol) +: col("op") +:
        compareCols.flatMap(c =>
          Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

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

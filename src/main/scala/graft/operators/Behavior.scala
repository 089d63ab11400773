package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-behavior analytics over an event stream (north-star: the
  * product-analytics queries every event warehouse runs — funnels,
  * path transitions, cohort retention). The reference's data plane is
  * an event-shaped time-series table (SURVEY.md §3.1); these are the
  * standard read-side analyses over exactly that shape.
  *
  * Scale posture shared by all three operators: every shuffle is keyed
  * on the user column — the same key throughout each chain, so the
  * exchanges are co-partitioned and AQE reuses the partitioning; no
  * operator ever funnels corpus rows through an unpartitioned window
  * or a single reducer. Outputs are integer-exact (counts, Long-ns
  * times, basis-point ratios in integer division), so every column is
  * hash-comparable cross-engine.
  */
object Behavior {

  /** Strictly-ordered conversion funnel: for stages (s₁…sₖ), a user
    * reaches stage i when they have an sᵢ event STRICTLY AFTER their
    * stage-(i−1) reach time; the reach time is the EARLIEST such event
    * (the canonical "min-time chaining" funnel — no lookback window,
    * re-orderings of earlier events cannot un-reach a later stage).
    *
    * Shape: one filtered aggregate per stage (the `typeCol` equality
    * pushes to the scan) plus an equi-join per stage on `userCol` —
    * k−1 co-partitioned joins over frames that only ever SHRINK
    * (reached-users per stage is monotone non-increasing). The result
    * is a k-row union of count aggregates.
    *
    * Output: (stage BIGINT 1-based, stage_name, n_users BIGINT).
    */
  /** The funnel's per-stage reach frames: for each stage, the
    * (user, t = reach time) frame under strict min-time chaining —
    * the shared substrate of [[funnel]] and [[funnelLatency]]. */
  private def reachFrames(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String,
      stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct: $stages")
    val u = col(userCol)
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(u).agg(min(col(tsCol)).as("t"))
    stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .join(prev.select(u, col("t").as("t_prev")), userCol)
        .filter(col(tsCol) > col("t_prev"))
        .groupBy(u).agg(min(col(tsCol)).as("t"))
    }
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    reachFrames(events, userCol, tsCol, typeCol, stages)
      .zip(stages).zipWithIndex.map { case ((df, name), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("stage"), lit(name).as("stage_name"),
            col("n_users"))
      }.reduce(_ unionAll _)

  /** Stage-transition latency: for every adjacent stage pair, the
    * count of converting users and the exact integer min / half-up
    * mean / max of (reach(i) − reach(i−1)) in µs — the "how long does
    * the funnel take" companion to the counts. One co-partitioned
    * equi-join per transition over frames that only shrink; the mean
    * is the engine's exact half-up division idiom ((2s + n) div (2n)),
    * so every column hash-matches SQL.
    *
    * Output: (stage BIGINT — the DESTINATION stage, 2-based),
    * from_stage, to_stage, n_users, min_us, avg_us, max_us. */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"latency needs >= 2 stages: $stages")
    val reached = reachFrames(events, userCol, tsCol, typeCol, stages)
    reached.sliding(2).toSeq.zipWithIndex.map {
      case (Seq(prev, cur), i) =>
        cur.join(prev.select(col(userCol), col("t").as("t_prev")),
            userCol)
          .select(expr("(t - t_prev) div 1000").as("dt_us"))
          .agg(count(lit(1)).as("n_users"),
            min(col("dt_us")).as("min_us"),
            sum(col("dt_us")).as("s_us"),
            max(col("dt_us")).as("max_us"))
          .select(lit(i + 2L).as("stage"),
            lit(stages(i)).as("from_stage"),
            lit(stages(i + 1)).as("to_stage"),
            col("n_users"), col("min_us"),
            // empty transition: ANSI div-by-zero must not fire
            when(col("n_users") > 0,
              expr("(2 * s_us + n_users) div (2 * n_users)"))
              .as("avg_us"),
            col("max_us"))
    }.reduce(_ unionAll _)
  }

  /** First-order (Markov) path transitions: for each user's
    * time-ordered event sequence, count every adjacent
    * (previous type → type) pair and its share of all transitions out
    * of that previous type, in exact basis points
    * (`prob_bp = (n·10⁴) div n_from` — integer floor division, no
    * float summation anywhere).
    *
    * Ordering is made deterministic with `tieCol` as the secondary
    * sort key (same-timestamp events within a user would otherwise
    * make `lag` nondeterministic).
    *
    * Shape: one window partitioned by user (the corpus-touching pass),
    * then everything runs on the transition-pair frame, bounded by the
    * event-type DOMAIN squared — the per-source normalization window
    * partitions that bounded frame by `from_type`, never the corpus.
    *
    * Output: (from_type, to_type, n BIGINT, prob_bp BIGINT).
    */
  def pathTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("from_type", lag(col(typeCol), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("n_from", sum(col("n")).over(byFrom))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 10000) div n_from").as("prob_bp"))
  }

  /** SECOND-order path transitions: P(next | prev₂, prev₁) with exact
    * basis-point shares — the context upgrade over [[pathTransitions]]
    * (first-order Markov washes out "view→click means purchase only
    * after signup"-shaped structure). Same single-user-window shape:
    * two lags over one (ts, tie)-ordered traversal, counts and shares
    * on the |types|³-bounded transition frame.
    *
    * Output: (from2, from1, to_type, n, prob_bp). */
  def pathTransitions2(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, tieCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val triples = events
      .withColumn("from1", lag(col(typeCol), 1).over(byUser))
      .withColumn("from2", lag(col(typeCol), 2).over(byUser))
      .filter(col("from2").isNotNull)
      .groupBy(col("from2"), col("from1"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byCtx = Window.partitionBy(col("from2"), col("from1"))
    triples
      .withColumn("n_ctx", sum(col("n")).over(byCtx))
      .select(col("from2"), col("from1"), col("to_type"), col("n"),
        expr("(n * 10000) div n_ctx").as("prob_bp"))
  }

  /** Rolling active-user engagement: per day, DAU (distinct users that
    * day), WAU (distinct users over the trailing 7 days), and the
    * stickiness ratio DAU/WAU in exact floored basis points — the
    * canonical product-engagement dashboard row.
    *
    * A rolling DISTINCT is not a sum of daily distincts, so WAU is
    * computed exactly by fanning each (day, user) row out to the ≤ 7
    * report days it counts toward (sequence-explode — one projection,
    * no range join, no per-day rescans) and distinct-counting per
    * report day. The fan-out frame is |days×users|·7 — the
    * day-user DEDUPED frame times a constant, never events×7. Report
    * days beyond the stream's last day are dropped.
    *
    * Output: (day_us, dau, wau, stickiness_bp). */
  def dauWau(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val dayUs = 86400L * 1000000L
    val dayNsL = 86400L * 1000000000L
    val dayUser = events
      .select(expr(s"(${tsCol} div $dayNsL) * $dayUs").as("day_us"),
        col(userCol).as("u"))
      .distinct()
    val lastDay = dayUser.agg(max(col("day_us")).as("last_day"))
    val dau = dayUser.groupBy(col("day_us"))
      .agg(countDistinct(col("u")).as("dau"))
    val wau = dayUser
      .crossJoin(broadcast(lastDay))
      .select(explode(sequence(col("day_us"),
        least(col("day_us") + lit(6L * dayUs), col("last_day")),
        lit(dayUs))).as("day_us"), col("u"))
      .groupBy(col("day_us"))
      .agg(countDistinct(col("u")).as("wau"))
    dau.join(wau, "day_us")
      .select(col("day_us"), col("dau"), col("wau"),
        expr("(dau * 10000) div wau").as("stickiness_bp"))
  }

  /** Growth accounting: per day, NEW (first activity ever) / RETAINED
    * (active yesterday) / RESURRECTED (returned after a gap) /
    * CHURNED (active yesterday, absent today) user counts — the
    * decomposition that explains WHY the DAU curve moved. Classes
    * come from one lag and one lead over the deduped (user, day)
    * frame; churn reports on the day AFTER activity and never past
    * the stream's last day (a user active on the final day hasn't
    * churned yet).
    *
    * Output: (day_us, n_new, n_retained, n_resurrected, n_churned). */
  def growthAccounting(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val dayNs = 86400L * 1000000000L
    val du = events
      .select(expr(s"($tsCol div $dayNs) * $dayUs").as("day_us"),
        col(userCol).as("u"))
      .distinct()
    val byU = Window.partitionBy(col("u")).orderBy(col("day_us"))
    val lagged = du
      .withColumn("prev", lag(col("day_us"), 1).over(byU))
      .withColumn("nxt", lead(col("day_us"), 1).over(byU))
    val act = lagged.groupBy(col("day_us"))
      .agg(
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev") === col("day_us") - dayUs, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("prev").isNotNull &&
          (col("prev") < col("day_us") - dayUs), 1L)
          .otherwise(0L)).as("n_resurrected"))
    val lastDay = du.agg(max(col("day_us")).as("last_day"))
    val churn = lagged.crossJoin(broadcast(lastDay))
      .filter((col("nxt").isNull ||
        (col("nxt") > col("day_us") + dayUs)) &&
        (col("day_us") + dayUs) <= col("last_day"))
      .groupBy((col("day_us") + dayUs).as("day_us"))
      .agg(count(lit(1)).as("n_churned"))
    act.join(churn, Seq("day_us"), "full_outer")
      .select(col("day_us"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** RFM (recency / frequency / monetary) segmentation: per user,
    * recency = full periods since their LAST event (against the
    * stream's global latest event — a data-relative anchor, no
    * wall-clock), frequency = event count, monetary = exact value
    * cents; each metric bucketed by its own PERCENTILE_DISC
    * `buckets`-ile cut points (1 + #cuts strictly below — the
    * decileStats tie rule), and the result rolled up to the segment
    * matrix.
    *
    * Scale shape: one groupBy(user) corpus pass; each metric's cut
    * points derive from its DISTINCT-VALUE frequency frame
    * (domain-bounded: periods by the horizon, counts and cent-totals
    * by their value domains) through unpartitioned windows over those
    * bounded frames only; the 3·(buckets−1) cut values ride ONE
    * broadcast row. Output is the buckets³-cell matrix.
    *
    * Output: (r_bucket, f_bucket, m_bucket, n_users,
    * sum_cents BIGINT). */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, periodLen: Long, buckets: Int = 3): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    require(periodLen > 0, s"periodLen must be positive: $periodLen")
    val u = col(userCol)
    val perUser = events.groupBy(u).agg(
      max(col(tsCol)).as("last_ts"),
      count(lit(1)).as("f"),
      sum(round(col(valueCol) * 100, 0).cast("long")).as("m"))
    val anchor = events.agg(max(col(tsCol)).as("t_max"))
    val metrics = perUser.crossJoin(broadcast(anchor))
      .select(u,
        expr(s"(t_max - last_ts) div $periodLen").as("r"),
        col("f"), col("m"))
    // one (cut_1 … cut_{buckets−1}) row per metric, pivoted wide
    def cutRow(metric: String): DataFrame = {
      val wOrd = Window.orderBy(col("v"))
      val wAll = Window.partitionBy()
      val cum = metrics.groupBy(col(metric).as("v"))
        .agg(count(lit(1)).as("n_v"))
        .withColumn("cum", sum(col("n_v")).over(wOrd))
        .withColumn("n", sum(col("n_v")).over(wAll))
      val cutCols = (1 until buckets).map(p =>
        min(when(col("p") === p, col("v"))).as(s"${metric}_c$p"))
      cum
        .select(col("v"), col("cum"),
          explode(array((1 until buckets).map(lit): _*)).as("p"),
          col("n"))
        .filter(col("cum") >=
          expr(s"(p * n + ${buckets - 1}) div $buckets"))
        .groupBy()
        .agg(cutCols.head, cutCols.tail: _*)
    }
    val cuts = cutRow("r").crossJoin(cutRow("f")).crossJoin(cutRow("m"))
    def bucketOf(metric: String): Column =
      (1 until buckets).map(p =>
        when(col(metric) > col(s"${metric}_c$p"), 1L).otherwise(0L))
        .reduce(_ + _) + 1L
    metrics.crossJoin(broadcast(cuts))
      .select(u, bucketOf("r").as("r_bucket"),
        bucketOf("f").as("f_bucket"), bucketOf("m").as("m_bucket"),
        col("m"))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("m")).as("sum_cents"))
  }

  /** Cohort retention: cohort = the user's first-event period (integer
    * floor division of the event time by `periodLen`, e.g. a day for
    * ns timestamps and periodLen = 86 400·10⁹); cell (cohort, period
    * offset) counts the DISTINCT users of that cohort active in that
    * period. Offset 0 is the cohort's own period, so every cohort's
    * offset-0 count equals its size — the standard retention-matrix
    * normalization row.
    *
    * Shape: one groupBy(user) for first-event times, one equi-join
    * back on the SAME key (co-partitioned), then a
    * (cohort, offset)-keyed distinct-count whose result frame is
    * bounded by cohorts × periods, not users. All integer math.
    *
    * Output: (cohort BIGINT, period BIGINT, n_active BIGINT).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      periodLen: Long): DataFrame = {
    require(periodLen > 0, s"periodLen must be positive: $periodLen")
    val u = col(userCol)
    val firsts = events.groupBy(u)
      .agg(expr(s"min($tsCol) div $periodLen").as("cohort"))
    events
      .join(firsts, userCol)
      .select(u, col("cohort"),
        (expr(s"$tsCol div $periodLen") - col("cohort")).as("period"))
      .groupBy(col("cohort"), col("period"))
      .agg(countDistinct(u).as("n_active"))
  }
}

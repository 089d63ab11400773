package graft.queries

import graft.operators.{Behavior, Profiling}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-behavior analytics registry entries (funnel / path
  * transitions / cohort retention — `operators.Behavior`), each
  * DuckDB-oracled over the `events` table.
  *
  * Time representation: the engine side sees Long-ns `ts`
  * (Tables.load canonical form); the oracle sees the raw µs
  * timestamps. All derived times here are floor divisions to periods
  * or direct comparisons, exact under ns = µs·1000, so every output
  * column is integer and hash-identical.
  */
object BehaviorQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** The canonical product funnel over the synthetic event stream. */
  private val FunnelStages = Seq("signup", "view", "click", "purchase")

  private val DayNs = 86400L * 1000000000L
  private val DayUs = 86400L * 1000000L

  def defs: Map[String, QueryDef] = Q.m(

    // time-to-convert PERCENTILES per signup-week cohort: exact
    // p50/p90 of each user's first-signup → first-subsequent-purchase
    // delay — the latency view of conversion that
    // behavior_funnel_latency's averages smear (conversion delays are
    // heavy-tailed; the median is the honest number). Composition:
    // two shrinking min-aggregates feed percentileBands'
    // window-over-frequency-frame order statistics — all exact
    // integer seconds, zero new operator code.
    "behavior_convert_percentiles" -> QueryDef(
      (s, dir) => {
        val e = ev(s, dir)
        val su = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
        val first = e.filter(col("event_type") === "purchase")
          .join(su, "user_id")
          .filter(col("ts") > col("t0"))
          .groupBy(col("user_id"), col("t0"))
          .agg(min(col("ts")).as("t1"))
        val delays = first.select(
          expr("t0 div 604800000000000").as("cohort_w"),
          expr("(t1 - t0) div 1000000000").as("delay_s"))
        Profiling.percentileBands(delays, Seq("cohort_w"), "delay_s",
          Seq((1L, 2L), (9L, 10L)), Seq("p50_s", "p90_s"))
      },
      Some("""WITH su AS (SELECT user_id, min(ts) AS t0 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        fp AS (SELECT e.user_id, su.t0, min(e.ts) AS t1
          FROM events e JOIN su USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > su.t0
          GROUP BY 1, 2),
        d AS (SELECT epoch_us(t0) // 604800000000 AS cohort_w,
          (epoch_us(t1) - epoch_us(t0)) // 1000000 AS delay_s
          FROM fp),
        f AS (SELECT cohort_w, delay_s AS c, count(*)::BIGINT AS n_v
          FROM d GROUP BY 1, 2),
        cw AS (SELECT cohort_w, c, n_v,
          sum(n_v) OVER (PARTITION BY cohort_w ORDER BY c) AS cum,
          sum(n_v) OVER (PARTITION BY cohort_w) AS n FROM f)
        SELECT cohort_w, max(n)::BIGINT AS n,
          min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN c END)::BIGINT
            AS p50_s,
          min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN c END)::BIGINT
            AS p90_s
        FROM cw GROUP BY 1""".replaceAll("\\s+", " "))),

    // Strictly-ordered min-time-chaining funnel; per-stage reached-user
    // counts. Engine: Behavior.funnel (co-partitioned shrinking joins).
    "behavior_funnel" -> QueryDef(
      (s, dir) => Behavior.funnel(ev(s, dir), "user_id", "ts",
        "event_type", FunnelStages),
      Some("""WITH r1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'signup' GROUP BY 1),
          r2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
            JOIN r1 ON e.user_id = r1.user_id
            WHERE e.event_type = 'view' AND e.ts > r1.t GROUP BY 1),
          r3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
            JOIN r2 ON e.user_id = r2.user_id
            WHERE e.event_type = 'click' AND e.ts > r2.t GROUP BY 1),
          r4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
            JOIN r3 ON e.user_id = r3.user_id
            WHERE e.event_type = 'purchase' AND e.ts > r3.t GROUP BY 1)
          SELECT 1::BIGINT AS stage, 'signup' AS stage_name,
            count(*)::BIGINT AS n_users FROM r1
          UNION ALL SELECT 2::BIGINT, 'view', count(*)::BIGINT FROM r2
          UNION ALL SELECT 3::BIGINT, 'click', count(*)::BIGINT FROM r3
          UNION ALL SELECT 4::BIGINT, 'purchase', count(*)::BIGINT
            FROM r4""".replaceAll("\\s+", " "))),

    // First-order Markov transitions with exact basis-point shares;
    // (ts, event_id) ordering so same-timestamp events cannot make the
    // lag nondeterministic.
    "behavior_path_transitions" -> QueryDef(
      (s, dir) => Behavior.pathTransitions(ev(s, dir), "user_id", "ts",
        "event_type", "event_id"),
      Some("""WITH x AS (SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS from_type FROM events),
          p AS (SELECT from_type, event_type AS to_type,
            count(*)::BIGINT AS n FROM x
            WHERE from_type IS NOT NULL GROUP BY 1, 2)
          SELECT from_type, to_type, n,
            ((n * 10000) // (sum(n) OVER (PARTITION BY from_type)))
              ::BIGINT AS prob_bp
          FROM p""".replaceAll("\\s+", " "))),

    // SECOND-order transitions: P(next | prev2, prev1) in exact basis
    // points — context the first-order chain washes out. Same
    // (ts, event_id) tie discipline.
    "behavior_markov2" -> QueryDef(
      (s, dir) => Behavior.pathTransitions2(ev(s, dir), "user_id",
        "ts", "event_type", "event_id"),
      Some("""WITH x AS (SELECT user_id, event_type,
            lag(event_type, 1) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS from1,
            lag(event_type, 2) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS from2 FROM events),
          p AS (SELECT from2, from1, event_type AS to_type,
            count(*)::BIGINT AS n FROM x
            WHERE from2 IS NOT NULL GROUP BY 1, 2, 3)
          SELECT from2, from1, to_type, n,
            ((n * 10000) //
              (sum(n) OVER (PARTITION BY from2, from1)))::BIGINT
              AS prob_bp
          FROM p""".replaceAll("\\s+", " "))),

    // growth accounting: per day, NEW (first activity ever) /
    // RETAINED (active yesterday) / RESURRECTED (returned after a
    // gap) / CHURNED (active yesterday, absent today) user counts —
    // the decomposition that explains WHY the DAU curve moved. All
    // from lag/lead over the deduped (user, day) frame; churn reports
    // on the day after activity and never past the stream's last day
    // (a user active on the final day hasn't churned yet).
    "behavior_growth_accounting" -> QueryDef(
      (s, dir) => Behavior.growthAccounting(ev(s, dir), "user_id",
        "ts"),
      Some("""WITH du AS (SELECT DISTINCT
            (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
            user_id AS u FROM events),
          lg AS (SELECT day_us, u,
            lag(day_us) OVER (PARTITION BY u ORDER BY day_us) AS prev,
            lead(day_us) OVER (PARTITION BY u ORDER BY day_us) AS nxt
            FROM du),
          act AS (SELECT day_us,
            sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)::BIGINT
              AS n_new,
            sum(CASE WHEN prev = day_us - 86400000000 THEN 1 ELSE 0
              END)::BIGINT AS n_retained,
            sum(CASE WHEN prev IS NOT NULL
              AND prev < day_us - 86400000000 THEN 1 ELSE 0 END)
              ::BIGINT AS n_resurrected
            FROM lg GROUP BY 1),
          ld AS (SELECT max(day_us) AS last_day FROM du),
          ch AS (SELECT day_us + 86400000000 AS day_us,
            count(*)::BIGINT AS n_churned
            FROM lg CROSS JOIN ld
            WHERE (nxt IS NULL OR nxt > day_us + 86400000000)
              AND day_us + 86400000000 <= ld.last_day
            GROUP BY 1)
          SELECT coalesce(act.day_us, ch.day_us)::BIGINT AS day_us,
            coalesce(act.n_new, 0)::BIGINT AS n_new,
            coalesce(act.n_retained, 0)::BIGINT AS n_retained,
            coalesce(act.n_resurrected, 0)::BIGINT AS n_resurrected,
            coalesce(ch.n_churned, 0)::BIGINT AS n_churned
          FROM act FULL OUTER JOIN ch ON act.day_us = ch.day_us"""
        .replaceAll("\\s+", " "))),

    // DAU / trailing-7-day WAU / stickiness bp per day — the rolling
    // DISTINCT computed exactly by fanning the DEDUPED (day, user)
    // frame out to its ≤7 report days (no range join, no per-day
    // rescans).
    "behavior_dau_wau" -> QueryDef(
      (s, dir) => Behavior.dauWau(ev(s, dir), "user_id", "ts"),
      Some("""WITH du AS (SELECT DISTINCT
            (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
            user_id AS u FROM events),
          ld AS (SELECT max(day_us) AS last_day FROM du),
          dau AS (SELECT day_us, count(DISTINCT u)::BIGINT AS dau
            FROM du GROUP BY 1),
          f AS (SELECT unnest(generate_series(du.day_us,
              least(du.day_us + 6 * 86400000000, ld.last_day),
              86400000000)) AS day_us, du.u
            FROM du CROSS JOIN ld),
          wau AS (SELECT day_us, count(DISTINCT u)::BIGINT AS wau
            FROM f GROUP BY 1)
          SELECT dau.day_us::BIGINT AS day_us, dau.dau, wau.wau,
            ((dau.dau * 10000) // wau.wau)::BIGINT AS stickiness_bp
          FROM dau JOIN wau USING (day_us)"""
        .replaceAll("\\s+", " "))),

    // Stage-transition latency: min / half-up mean / max µs between
    // adjacent funnel stage reaches — "how long does the funnel take"
    // beside behavior_funnel's "how many convert". Exact integer
    // output everywhere.
    "behavior_funnel_latency" -> QueryDef(
      (s, dir) => Behavior.funnelLatency(ev(s, dir), "user_id", "ts",
        "event_type", FunnelStages),
      Some("""WITH r1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'signup' GROUP BY 1),
          r2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
            JOIN r1 ON e.user_id = r1.user_id
            WHERE e.event_type = 'view' AND e.ts > r1.t GROUP BY 1),
          r3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
            JOIN r2 ON e.user_id = r2.user_id
            WHERE e.event_type = 'click' AND e.ts > r2.t GROUP BY 1),
          r4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
            JOIN r3 ON e.user_id = r3.user_id
            WHERE e.event_type = 'purchase' AND e.ts > r3.t GROUP BY 1),
          l2 AS (SELECT epoch_us(r2.t) - epoch_us(r1.t) AS dt FROM r2
            JOIN r1 ON r2.user_id = r1.user_id),
          l3 AS (SELECT epoch_us(r3.t) - epoch_us(r2.t) AS dt FROM r3
            JOIN r2 ON r3.user_id = r2.user_id),
          l4 AS (SELECT epoch_us(r4.t) - epoch_us(r3.t) AS dt FROM r4
            JOIN r3 ON r4.user_id = r3.user_id)
          SELECT 2::BIGINT AS stage, 'signup' AS from_stage,
            'view' AS to_stage, count(*)::BIGINT AS n_users,
            min(dt)::BIGINT AS min_us,
            CASE WHEN count(*) > 0 THEN ((2 * sum(dt) + count(*)) //
              (2 * count(*)))::BIGINT END AS avg_us,
            max(dt)::BIGINT AS max_us FROM l2
          UNION ALL SELECT 3::BIGINT, 'view', 'click',
            count(*)::BIGINT, min(dt)::BIGINT,
            CASE WHEN count(*) > 0 THEN ((2 * sum(dt) + count(*)) //
              (2 * count(*)))::BIGINT END, max(dt)::BIGINT FROM l3
          UNION ALL SELECT 4::BIGINT, 'click', 'purchase',
            count(*)::BIGINT, min(dt)::BIGINT,
            CASE WHEN count(*) > 0 THEN ((2 * sum(dt) + count(*)) //
              (2 * count(*)))::BIGINT END, max(dt)::BIGINT FROM l4"""
        .replaceAll("\\s+", " "))),

    // Session-scoped funnel: the same min-time chaining, but a
    // conversion must complete WITHIN one 30-minute-gap session (the
    // product question "does a visit convert", vs behavior_funnel's
    // "does a user ever convert"). Composition: the win_sessionize
    // session labeling feeds Behavior.funnel keyed on the
    // (user, session) composite — operators compose instead of
    // growing a bespoke variant.
    "behavior_session_funnel" -> QueryDef(
      (s, dir) => {
        val gapUs = 30L * 60L * 1000000L
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"))
        val sess = ev(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("brk",
            when(col("prev_ts").isNull ||
              expr("ts div 1000") - expr("prev_ts div 1000") > gapUs,
              1L).otherwise(0L))
          .withColumn("session_no", sum(col("brk")).over(byUser))
          .withColumn("skey",
            concat_ws("#", col("user_id"), col("session_no")))
        Behavior.funnel(sess, "skey", "ts", "event_type", FunnelStages)
          .select(col("stage"), col("stage_name"),
            col("n_users").as("n_sessions"))
      },
      Some(s"""WITH x AS (SELECT user_id, ts, event_type,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
            FROM events),
          b AS (SELECT user_id, ts, event_type,
            CASE WHEN prev_ts IS NULL OR
              epoch_us(ts) - epoch_us(prev_ts) > ${30L * 60 * 1000000L}
            THEN 1 ELSE 0 END AS brk FROM x),
          sn AS (SELECT user_id, ts, event_type,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS session_no FROM b),
          r1 AS (SELECT user_id, session_no, min(ts) AS t FROM sn
            WHERE event_type = 'signup' GROUP BY 1, 2),
          r2 AS (SELECT e.user_id, e.session_no, min(e.ts) AS t
            FROM sn e JOIN r1 ON e.user_id = r1.user_id
              AND e.session_no = r1.session_no
            WHERE e.event_type = 'view' AND e.ts > r1.t GROUP BY 1, 2),
          r3 AS (SELECT e.user_id, e.session_no, min(e.ts) AS t
            FROM sn e JOIN r2 ON e.user_id = r2.user_id
              AND e.session_no = r2.session_no
            WHERE e.event_type = 'click' AND e.ts > r2.t GROUP BY 1, 2),
          r4 AS (SELECT e.user_id, e.session_no, min(e.ts) AS t
            FROM sn e JOIN r3 ON e.user_id = r3.user_id
              AND e.session_no = r3.session_no
            WHERE e.event_type = 'purchase' AND e.ts > r3.t
            GROUP BY 1, 2)
          SELECT 1::BIGINT AS stage, 'signup' AS stage_name,
            count(*)::BIGINT AS n_sessions FROM r1
          UNION ALL SELECT 2::BIGINT, 'view', count(*)::BIGINT FROM r2
          UNION ALL SELECT 3::BIGINT, 'click', count(*)::BIGINT FROM r3
          UNION ALL SELECT 4::BIGINT, 'purchase', count(*)::BIGINT
            FROM r4""".replaceAll("\\s+", " "))),

    // Conversion within a window: for each click, did a purchase by
    // the same user follow within 2 hours? Forward as-of (earliest
    // purchase at-or-after the click, one key shuffle) + a row-local
    // staleness gate — the bounded-window conversion rate a funnel's
    // unbounded chaining can't express. Exact floored-bp CVR.
    "behavior_conversion_window" -> QueryDef(
      (s, dir) => {
        val winUs = 2L * 3600L * 1000000L
        val e = ev(s, dir).select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_type"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("t_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("t_us"))
          .agg(count(lit(1)).as("np"))
        graft.operators.TemporalJoin.asofJoinForward(clicks, purchases,
          keys = Seq("user_id"), leftTime = "t_us",
          rightTime = "t_us", payloadCols = Seq("np"),
          matchedTimeCol = "p_t_us")
          .agg(count(lit(1)).as("n_clicks"),
            sum(when(col("p_t_us").isNotNull &&
              (col("p_t_us") - col("t_us") <= winUs), 1L)
              .otherwise(0L)).as("n_converted"))
          .withColumn("cvr_bp",
            expr("(n_converted * 10000) div n_clicks"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts)
          AS t_us, event_type FROM events),
        ck AS (SELECT event_id, user_id, t_us FROM e
          WHERE event_type = 'click'),
        pu AS (SELECT user_id, t_us FROM e
          WHERE event_type = 'purchase' GROUP BY 1, 2),
        j AS (SELECT ck.event_id, ck.t_us, pu.t_us AS p_t_us
          FROM ck ASOF LEFT JOIN pu
            ON ck.user_id = pu.user_id AND ck.t_us <= pu.t_us)
        SELECT count(*)::BIGINT AS n_clicks,
          sum(CASE WHEN p_t_us IS NOT NULL
            AND p_t_us - t_us <= 7200000000 THEN 1 ELSE 0 END)::BIGINT
            AS n_converted,
          ((sum(CASE WHEN p_t_us IS NOT NULL
            AND p_t_us - t_us <= 7200000000 THEN 1 ELSE 0 END)
            * 10000) // count(*))::BIGINT AS cvr_bp
        FROM j""".replaceAll("\\s+", " "))),

    // Last-touch attribution: each purchase's revenue credited to the
    // most recent prior (or same-instant) non-purchase event of the
    // same user — the as-of join composed into marketing analytics
    // (TemporalJoin.asofJoin: union+window, ONE user_id shuffle, no
    // pair fan-out). Touches pre-aggregated unique per (user, time)
    // with max() tie-break, the asofJoin contract; unmatched
    // purchases roll up as 'direct'. Oracle = DuckDB's native ASOF
    // LEFT JOIN — an independent implementation of the semantics.
    "behavior_attribution" -> QueryDef(
      (s, dir) => {
        val e = ev(s, dir).select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "t_us", "cents")
        val touches = e.filter(col("event_type") =!= "purchase")
          .groupBy(col("user_id"), col("t_us"))
          .agg(max(col("event_type")).as("touch_type"))
        graft.operators.TemporalJoin.asofJoin(purchases, touches,
          keys = Seq("user_id"), leftTime = "t_us", rightTime = "t_us",
          payloadCols = Seq("touch_type"), matchedTimeCol = "touch_t_us")
          .groupBy(coalesce(col("touch_type"), lit("direct"))
            .as("touch_type"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("cents")).as("revenue_c"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts)
          AS t_us, event_type,
          CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        p AS (SELECT event_id, user_id, t_us, cents FROM e
          WHERE event_type = 'purchase'),
        tc AS (SELECT user_id, t_us, max(event_type) AS touch_type
          FROM e WHERE event_type <> 'purchase' GROUP BY 1, 2)
        SELECT coalesce(tc.touch_type, 'direct') AS touch_type,
          count(*)::BIGINT AS n_purchases,
          sum(p.cents)::BIGINT AS revenue_c
        FROM p ASOF LEFT JOIN tc ON p.user_id = tc.user_id
          AND p.t_us >= tc.t_us
        GROUP BY 1""".replaceAll("\\s+", " "))),

    // RFM segmentation: per-user recency (days since last event,
    // data-relative anchor) / frequency / monetary cents, each
    // bucketed by exact tercile cut points, rolled up to the
    // 27-cell segment matrix — all integer outputs.
    "behavior_rfm" -> QueryDef(
      (s, dir) => Behavior.rfm(ev(s, dir), "user_id", "ts", "value",
        DayNs, buckets = 3),
      Some(s"""WITH pu AS (SELECT user_id, max(ts) AS last_ts,
            count(*)::BIGINT AS f,
            sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS m
            FROM events GROUP BY 1),
          an AS (SELECT max(ts) AS t_max FROM events),
          mt AS (SELECT user_id, (epoch_us(an.t_max) -
              epoch_us(pu.last_ts)) // $DayUs AS r, f, m
            FROM pu CROSS JOIN an),
          rf AS (SELECT r AS v, count(*)::BIGINT AS n_v FROM mt
            GROUP BY 1),
          rw AS (SELECT v, sum(n_v) OVER (ORDER BY v) AS cum,
            sum(n_v) OVER () AS n FROM rf),
          rc AS (SELECT min(CASE WHEN p = 1 THEN v END) AS r_c1,
            min(CASE WHEN p = 2 THEN v END) AS r_c2
            FROM rw, unnest(generate_series(1, 2)) AS g(p)
            WHERE cum >= (p * n + 2) // 3),
          ff AS (SELECT f AS v, count(*)::BIGINT AS n_v FROM mt
            GROUP BY 1),
          fw AS (SELECT v, sum(n_v) OVER (ORDER BY v) AS cum,
            sum(n_v) OVER () AS n FROM ff),
          fc AS (SELECT min(CASE WHEN p = 1 THEN v END) AS f_c1,
            min(CASE WHEN p = 2 THEN v END) AS f_c2
            FROM fw, unnest(generate_series(1, 2)) AS g(p)
            WHERE cum >= (p * n + 2) // 3),
          mf AS (SELECT m AS v, count(*)::BIGINT AS n_v FROM mt
            GROUP BY 1),
          mw AS (SELECT v, sum(n_v) OVER (ORDER BY v) AS cum,
            sum(n_v) OVER () AS n FROM mf),
          mc AS (SELECT min(CASE WHEN p = 1 THEN v END) AS m_c1,
            min(CASE WHEN p = 2 THEN v END) AS m_c2
            FROM mw, unnest(generate_series(1, 2)) AS g(p)
            WHERE cum >= (p * n + 2) // 3)
          SELECT (1 + CASE WHEN mt.r > rc.r_c1 THEN 1 ELSE 0 END
              + CASE WHEN mt.r > rc.r_c2 THEN 1 ELSE 0 END)::BIGINT
              AS r_bucket,
            (1 + CASE WHEN mt.f > fc.f_c1 THEN 1 ELSE 0 END
              + CASE WHEN mt.f > fc.f_c2 THEN 1 ELSE 0 END)::BIGINT
              AS f_bucket,
            (1 + CASE WHEN mt.m > mc.m_c1 THEN 1 ELSE 0 END
              + CASE WHEN mt.m > mc.m_c2 THEN 1 ELSE 0 END)::BIGINT
              AS m_bucket,
            count(*)::BIGINT AS n_users, sum(mt.m)::BIGINT AS sum_cents
          FROM mt CROSS JOIN rc CROSS JOIN fc CROSS JOIN mc
          GROUP BY 1, 2, 3""".replaceAll("\\s+", " "))),

    // Day-grain cohort retention matrix; offset-0 row is the cohort
    // size. ns-day and µs-day floor divisions agree exactly.
    "behavior_cohort_retention" -> QueryDef(
      (s, dir) => Behavior.cohortRetention(ev(s, dir), "user_id", "ts",
        DayNs),
      Some(s"""WITH f AS (SELECT user_id,
            min(epoch_us(ts)) // $DayUs AS cohort
            FROM events GROUP BY 1)
          SELECT f.cohort::BIGINT AS cohort,
            (epoch_us(e.ts) // $DayUs - f.cohort)::BIGINT AS period,
            count(DISTINCT e.user_id)::BIGINT AS n_active
          FROM events e JOIN f ON e.user_id = f.user_id
          GROUP BY 1, 2""".replaceAll("\\s+", " "))))
}

package graft.queries

import graft.operators.Behavior
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def defs: Map[String, QueryDef] = Map(

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

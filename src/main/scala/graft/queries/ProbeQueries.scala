package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Single-construct driver-gate probes (round-13 bisection).
  *
  * Context: CORRECTNESS_r10..r12 show a class of queries that
  * rows+schema-match but hash-mismatch AT THE DRIVER while the
  * identical Verify output hash-matches the identical oracle SQL at
  * the local gate (DuckDB 1.0.0). Two independent formulations of
  * ql_agg_star and the r12 "exact integer" rewrites of
  * q1/q7/agg_stats all show it; ~150 other oracles using the same
  * half-up `//` identities — but always wrapped in
  * `CAST(... AS BIGINT)` — pass. The one construct present in every
  * red oracle and absent from every green one is an INTEGER-typed
  * value (BIGINT or HUGEINT) divided by a bare decimal literal
  * (`x / 100.0`): DuckDB parses `100.0` as DECIMAL(4,1), and the
  * result type/rounding of INTEGER-over-DECIMAL division is exactly
  * the kind of binder rule that shifts across DuckDB releases
  * (1.0.0 → DOUBLE; a DECIMAL result in a newer release would reach
  * pandas through a float64 conversion that can double-round).
  *
  * Each probe below isolates ONE construct as its own registry entry
  * so the driver's per-query CORRECTNESS rows name the diverging
  * construct empirically. Paired probes differ only in the suspect
  * cast. Keep these cheap (single scan, ≤7 output rows) and do NOT
  * "fix" a red probe — red IS the signal.
  */
object ProbeQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** o_totalprice in exact integer cents. */
  private def cents: Column =
    round(col("o_totalprice") * 100, 0).cast("long")

  def defs: Map[String, QueryDef] = Q.m(

    // P1/P2/P4 — the three deliberately-red probes (half-up `//`
    // quotient divided by a bare decimal literal, uncast and ::DOUBLE,
    // and the q7 literal-divisor form) — RETIRED in r16 once the r15
    // composite read green at the driver (the r14-stated condition):
    // their red rows had served their purpose naming the diverging
    // construct, and a permanently-red gate row is a reader trap. The
    // findings they pinned live on in the green canaries below and in
    // the composite queries' comments (no float emission without a
    // green probe naming its form first).

    // P3: the half-up `//` identity with the quotient kept as a BIGINT
    // column and
    // no floating-point at all — the form the ~150 green oracles use.
    "probe_halfup_cast_bigint" -> QueryDef(
      (s, dir) => t(s, dir, "orders").withColumn("__c", cents)
        .groupBy(col("o_orderpriority"))
        .agg(expr("(2 * sum(__c) + count(1)) div (2 * count(1))")
          .as("vc")),
      Some("""SELECT o_orderpriority,
        CAST((2*sum(CAST(round(o_totalprice*100,0) AS BIGINT))+count(*))
          // (2*count(*)) AS BIGINT) AS vc
        FROM orders GROUP BY o_orderpriority""".replaceAll("\\s+", " "))),

    // P5: the ql_agg_star-r12 sum_value construct — BIGINT sum divided
    // uncast by the 100.0 literal (no `//` involved at all).
    "probe_uncast_sum_div" -> QueryDef(
      (s, dir) => t(s, dir, "orders").withColumn("__c", cents)
        .groupBy(col("o_orderpriority"))
        .agg((sum(col("__c")) / lit(100.0)).as("v")),
      Some("""SELECT o_orderpriority,
        sum(CAST(round(o_totalprice*100,0) AS BIGINT)) / 100.0 AS v
        FROM orders GROUP BY o_orderpriority""".replaceAll("\\s+", " "))),

    // P6: HUGEINT→DOUBLE cast ABOVE 2^53 (double-rounding territory:
    // DuckDB 1.0's Hugeint::Cast<double> computes upper·2⁶⁴+lower in
    // double arithmetic; Spark's Decimal cast is correctly rounded).
    // Scaled cents·10⁶ pushes the global sum to ~2×10¹⁷ even at
    // sf0.01.
    "probe_hugeint_cast_double_big" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .agg((sum((cents * lit(1000000L)).cast(DecimalType(38, 0)))
          .cast("double")).as("v")),
      Some("""SELECT sum(CAST(round(o_totalprice*100,0) AS BIGINT)
        * 1000000)::DOUBLE AS v FROM orders"""
        .replaceAll("\\s+", " "))),

    // P7: the r12-q1 sum_charge construct (explicit ::DOUBLE, division
    // by 1000000.0) in isolation — green here + red q1-r12 would have
    // implicated one of q1's OTHER columns.
    "probe_decimal_sum_cast_double" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .withColumn("__c",
          round(col("l_extendedprice") * 100, 0).cast("long"))
        .withColumn("__d", round(col("l_discount") * 100, 0).cast("long"))
        .withColumn("__t", round(col("l_tax") * 100, 0).cast("long"))
        .groupBy(col("l_returnflag"))
        .agg((sum((col("__c") * (lit(100L) - col("__d"))
          * (lit(100L) + col("__t"))).cast(DecimalType(38, 0)))
          .cast("double") / lit(1000000.0)).as("v")),
      Some("""SELECT l_returnflag,
        sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
          * (100 - CAST(round(l_discount*100,0) AS BIGINT))
          * (100 + CAST(round(l_tax*100,0) AS BIGINT)))::DOUBLE
          / 1000000.0 AS v
        FROM lineitem GROUP BY l_returnflag""".replaceAll("\\s+", " "))),

    // P8: the r11-q1 construct standalone — round(sum(double), 2).
    // Empirically driver-green r10+r11 inside q1; this pins it alone.
    "probe_round_sum_2dp" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_extendedprice")), 2).as("v")),
      Some("""SELECT l_returnflag, round(sum(l_extendedprice),2) AS v
        FROM lineitem GROUP BY l_returnflag""".replaceAll("\\s+", " "))),

    // P9: the r11-agg_stats construct standalone — round(avg(dbl), 2).
    "probe_round_avg_2dp" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(round(avg(col("o_totalprice")), 2).as("v")),
      Some("""SELECT o_orderpriority, round(avg(o_totalprice),2) AS v
        FROM orders GROUP BY o_orderpriority""".replaceAll("\\s+", " "))),

    // P10: per-row cents recovery — round(x·100, 0) summed as pure
    // BIGINT. Tests round()-at-0dp parity on 2-decimal doubles with
    // zero floating-point in the output.
    "probe_round_cents_sum" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(sum(cents).as("vc")),
      Some("""SELECT o_orderpriority,
        sum(CAST(round(o_totalprice*100,0) AS BIGINT))::BIGINT AS vc
        FROM orders GROUP BY o_orderpriority""".replaceAll("\\s+", " "))),

    // P11: the fixed-order moment combine — sqrt((n·S2−S1²)/(n(n−1))),
    // every operand ::DOUBLE, one literal division at the end against
    // an already-DOUBLE numerator (the ql_agg_star stddev construct on
    // the orders table). Whole-dollar units, not cents: Σc² of sf0.1's
    // 150k orders at cent scale (~2.5e19) overflows BIGINT; dollars
    // keep Σc² < 4e17 through sf1 (the exact overflow-audit rule the
    // per-series ql_agg_star sums don't need).
    "probe_moment_sqrt" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .withColumn("__c", round(col("o_totalprice"), 0).cast("long"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("__c")).as("s1"),
          sum(col("__c") * col("__c")).as("s2"))
        .select(col("o_orderpriority"),
          (sqrt((col("n").cast("double") * col("s2")
            - col("s1").cast("double") * col("s1"))
            / (col("n") * (col("n") - lit(1.0)))) / 100.0).as("v")),
      Some("""WITH m AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
          sum(CAST(round(o_totalprice,0) AS BIGINT))::BIGINT AS s1,
          sum(CAST(round(o_totalprice,0) AS BIGINT)
            * CAST(round(o_totalprice,0) AS BIGINT))::BIGINT AS s2
          FROM orders GROUP BY 1)
        SELECT o_orderpriority,
          sqrt((n::DOUBLE * s2 - s1::DOUBLE * s1) / (n * (n - 1.0)))
          / 100.0 AS v FROM m""".replaceAll("\\s+", " "))),

    // P13 (r15): the candidate float-sum form for the ql_agg_star
    // composite — a BIGINT sum explicitly cast ::DOUBLE, THEN divided
    // by the 100.0 decimal literal. Sits in the gap the r14 verdict
    // named: P2 proves `//`-quotient::DOUBLE/literal red, P7 proves
    // HUGEINT-sum::DOUBLE/literal green; this pins BIGINT-sum::DOUBLE/
    // literal. The composite ships NO float sum until this reads green
    // at the driver (round 15 it ships pure-BIGINT sum_c100 instead).
    "probe_bigint_cast_double_div" -> QueryDef(
      (s, dir) => t(s, dir, "orders").withColumn("__c", cents)
        .groupBy(col("o_orderpriority"))
        .agg((sum(col("__c")).cast("double") / lit(100.0)).as("v")),
      Some("""SELECT o_orderpriority,
        sum(CAST(round(o_totalprice*100,0) AS BIGINT))::BIGINT::DOUBLE
          / 100.0 AS v
        FROM orders GROUP BY o_orderpriority""".replaceAll("\\s+", " "))),

    // P12: epoch_ns parity per physical time type — events.ts and
    // lineitem.l_shipdate both reduced to BIGINT min/max (no floats).
    "probe_epoch_ns_types" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val li = t(s, dir, "lineitem")
        val a = ev.agg(lit("events_ts").as("src"),
          min(Tables.nsCol(ev, "ts")).as("mn"),
          max(Tables.nsCol(ev, "ts")).as("mx"),
          count(lit(1)).as("n"))
        val b = li.agg(lit("lineitem_shipdate").as("src"),
          min(Tables.nsCol(li, "l_shipdate")).as("mn"),
          max(Tables.nsCol(li, "l_shipdate")).as("mx"),
          count(lit(1)).as("n"))
        a.unionByName(b)
      },
      Some("""SELECT 'events_ts' AS src, min(epoch_ns(ts))::BIGINT AS mn,
          max(epoch_ns(ts))::BIGINT AS mx, count(*)::BIGINT AS n
          FROM events
        UNION ALL
        SELECT 'lineitem_shipdate' AS src,
          min(epoch_ns(l_shipdate))::BIGINT AS mn,
          max(epoch_ns(l_shipdate))::BIGINT AS mx, count(*)::BIGINT AS n
          FROM lineitem""".replaceAll("\\s+", " ")))
  )
}

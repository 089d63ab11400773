package graft

import graft.operators.Behavior
import org.scalatest.funsuite.AnyFunSuite

/** Event-behavior analytics unit coverage (the registry oracles pin
  * the full-table shapes; these fixtures pin the semantic edges:
  * strict ordering in the funnel, lag tie-breaking, offset-0 cohort
  * normalization). */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def events(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type")
  }

  test("funnel: min-time chaining is STRICT — a stage-2 event at or " +
    "before the stage-1 reach time does not convert, and stages " +
    "cannot be reached out of order") {
    val df = events(Seq(
      // u1 converts through all three stages in order
      (1L, 100L, 1L, "a"), (2L, 200L, 1L, "b"), (3L, 300L, 1L, "c"),
      // u2: b BEFORE a, and again b AT a's time — never reaches b
      (4L, 50L, 2L, "b"), (5L, 100L, 2L, "a"), (6L, 100L, 2L, "b"),
      // u3: reaches a and b; c arrives between a and b → not after b
      (7L, 100L, 3L, "a"), (8L, 150L, 3L, "c"), (9L, 200L, 3L, "b"),
      // u4 never does a — contributes nowhere, even with b and c
      (10L, 100L, 4L, "b"), (11L, 200L, 4L, "c")))
    val out = Behavior.funnel(df, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, "a", 3L), (2L, "b", 2L),
      (3L, "c", 1L)))
  }

  test("funnel: the reach time is the EARLIEST qualifying event — a " +
    "later cheaper path cannot shadow an earlier conversion") {
    // u1 does a@100, b@500, but also b@200: reach(b)=200, so c@300
    // (before 500, after 200) still converts
    val df = events(Seq(
      (1L, 100L, 1L, "a"), (2L, 500L, 1L, "b"), (3L, 200L, 1L, "b"),
      (4L, 300L, 1L, "c")))
    val out = Behavior.funnel(df, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("funnel rejects duplicate stages") {
    intercept[IllegalArgumentException] {
      Behavior.funnel(events(Seq.empty), "user_id", "ts", "event_type",
        Seq("a", "a"))
    }
  }

  test("pathTransitions: adjacent pairs per user in (ts, tie) order; " +
    "same-ts events break ties on the tie column; prob_bp is exact " +
    "integer floor division") {
    val df = events(Seq(
      // u1: a→b→b (two transitions out of distinct froms)
      (1L, 100L, 1L, "a"), (2L, 200L, 1L, "b"), (3L, 300L, 1L, "b"),
      // u2: same-ts pair — event_id order makes it a→c, never c→a
      (10L, 100L, 2L, "a"), (11L, 100L, 2L, "c"),
      // u3: a→c so that from=a has n_from=2: bp = 10000/2 = 5000 each
      (20L, 100L, 3L, "a"), (21L, 200L, 3L, "c")))
    val out = Behavior.pathTransitions(df, "user_id", "ts",
        "event_type", "event_id")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      ("a", "b") -> ((1L, 3333L)),   // 1 of 3 out of a → ⌊10000/3⌋
      ("a", "c") -> ((2L, 6666L)),
      ("b", "b") -> ((1L, 10000L))))
  }

  test("funnelLatency: exact half-up mean / min / max of adjacent " +
    "reach gaps; a transition nobody completes yields a null-safe " +
    "zero row, not a division error") {
    // ts in ns; dt computed in µs = ns div 1000
    val df = events(Seq(
      (1L, 1000L, 1L, "a"), (2L, 4000L, 1L, "b"),   // dt 3µs
      (3L, 1000L, 2L, "a"), (4L, 9000L, 2L, "b"),   // dt 8µs
      (5L, 1000L, 3L, "a")))                          // never reaches b
    val out = Behavior.funnelLatency(df, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    // a→b: dts {3, 8} → min 3, mean round-half-up(5.5) = 6, max 8
    assert(out(2L) === ((2L, Some(3L), Some(6L), Some(8L))))
    // b→c: empty — count 0, all stats null, no ANSI division error
    assert(out(3L) === ((0L, None, None, None)))
  }

  test("rfm: exact tercile cuts on each metric; identical recencies " +
    "collapse to one bucket; monetary follows frequency when value " +
    "is constant") {
    val s = spark
    import s.implicits._
    val minNs = 60L * 1000000000L
    // user i emits i events (value 1.0), all on the same day
    val rows = for { u <- 1L to 6L; j <- 1L to u }
      yield (u * 100 + j, j * minNs, u, 1.0)
    val out = Behavior.rfm(
        rows.toDF("event_id", "ts", "user_id", "value")
          .repartition(4),
        "user_id", "ts", "value", periodLen = 86400L * 1000000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // f values 1..6 → cuts {2, 4}: f∈{1,2}→b1, {3,4}→b2, {5,6}→b3;
    // m = 100·f cents follows; r identical → everyone r_bucket 1
    assert(out === Map(
      (1L, 1L, 1L) -> ((2L, 300L)),    // f=1,2 → 100+200 cents
      (1L, 2L, 2L) -> ((2L, 700L)),    // f=3,4
      (1L, 3L, 3L) -> ((2L, 1100L)))) // f=5,6
  }

  test("cohortRetention: offset 0 equals cohort size; gaps stay " +
    "absent (sparse matrix), later periods count distinct users once") {
    val df = events(Seq(
      // cohort 0: u1 active periods {0,2}, u2 {0} (two rows in p0)
      (1L, 5L, 1L, "x"), (2L, 25L, 1L, "x"), (3L, 7L, 2L, "x"),
      (4L, 8L, 2L, "x"),
      // cohort 1: u3 active {1}
      (5L, 13L, 3L, "x")))
    val out = Behavior.cohortRetention(df, "user_id", "ts", 10L)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
  }

  test("pathTransitions2: triples need two predecessors, contexts " +
    "normalize independently, per-user streams never interleave") {
    val df = events(Seq(
      // u1: a,b,c,a,c → triples (a,b,c) (b,c,a) (c,a,c)
      (1L, 100L, 1L, "a"), (2L, 200L, 1L, "b"), (3L, 300L, 1L, "c"),
      (4L, 400L, 1L, "a"), (5L, 500L, 1L, "c"),
      // u2: a,b,d → (a,b,d); context (a,b) now splits 1/1 with u1's c
      (6L, 100L, 2L, "a"), (7L, 200L, 2L, "b"), (8L, 300L, 2L, "d"),
      // u3: two events only — no triple
      (9L, 100L, 3L, "a"), (10L, 200L, 3L, "b")))
    val out = Behavior.pathTransitions2(df, "user_id", "ts",
        "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      ("a", "b", "c") -> ((1L, 5000L)),
      ("a", "b", "d") -> ((1L, 5000L)),
      ("b", "c", "a") -> ((1L, 10000L)),
      ("c", "a", "c") -> ((1L, 10000L))))
  }

  test("growth accounting: new/retained/resurrected classify by the " +
    "previous active day; churn reports the day AFTER activity and " +
    "never past the stream end") {
    val day = 86400L * 1000000000L
    val dayU = 86400L * 1000000L
    // u1: d0, d1, d3 → new@d0, retained@d1, churn@d2, resurrected@d3
    // u2: d1 only → new@d1, churn@d2
    // u3: d3 only → new@d3, NO churn (d4 past stream end d3)
    val df = events(Seq(
      (1L, 0L, 1L, "x"), (2L, day, 1L, "x"), (3L, 3 * day, 1L, "x"),
      (4L, day + 7L, 2L, "x"), (5L, 3 * day + 9L, 3L, "x")))
    val rows = Behavior.growthAccounting(df, "user_id", "ts")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows(0L) === ((1L, 0L, 0L, 0L)))
    assert(rows(dayU) === ((1L, 1L, 0L, 0L)))
    assert(rows(2 * dayU) === ((0L, 0L, 0L, 2L)))
    assert(rows(3 * dayU) === ((1L, 0L, 1L, 0L)))
    assert(!rows.contains(4 * dayU))
  }

  test("dauWau: trailing-7-day distinct is exact (not a sum of " +
    "dailies), stickiness is floored bp, days past the stream end " +
    "are dropped") {
    val day = 86400L * 1000000000L
    val dayU = 86400L * 1000000L
    // day0: {1,2}; day1: {2}; day8: {3}
    val df = events(Seq(
      (1L, 0L, 1L, "x"), (2L, 1000L, 2L, "x"),
      (3L, day + 5L, 2L, "x"),
      (4L, 8L * day, 3L, "x")))
    val out = Behavior.dauWau(df, "user_id", "ts")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // WAU(d1) = |{1,2}| = 2, NOT dau(d0)+dau(d1) = 3
    assert(out === Map(
      0L -> ((2L, 2L, 10000L)),
      dayU -> ((1L, 2L, 5000L)),
      8L * dayU -> ((1L, 1L, 10000L))))
  }
}

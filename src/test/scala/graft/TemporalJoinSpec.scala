package graft

import graft.operators.TemporalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("asofJoin: latest right row at-or-before each left time, per key") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L),
      (4L, "v", 50L)).toDF("id", "k", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 15L, 2.0), ("v", 60L, 9.0))
      .toDF("k", "rt", "payload")
    val out = TemporalJoin.asofJoin(left, right, keys = Seq("k"),
      leftTime = "t", rightTime = "rt", payloadCols = Seq("payload"),
      matchedTimeCol = "mt")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    // id1: t=10 matches rt=10 (>= semantics, same instant visible)
    assert(out(1L) == (Some(10L), Some(1.0)))
    // id2: t=20 → latest of {10,15} = 15
    assert(out(2L) == (Some(15L), Some(2.0)))
    // id3: t=5 → no prior right row → nulls
    assert(out(3L) == (None, None))
    // id4: key v, t=50 < 60 → unmatched
    assert(out(4L) == (None, None))
  }

  test("asofJoinForward: earliest right row at-or-after each left " +
    "time, per key; same-instant right visible; trailing lefts " +
    "unmatched") {
    val left = Seq((1L, "u", 10L), (2L, "u", 12L), (3L, "u", 20L),
      (4L, "u", 99L), (5L, "v", 1L)).toDF("id", "k", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 15L, 2.0), ("v", 60L, 9.0))
      .toDF("k", "rt", "payload")
    val out = TemporalJoin.asofJoinForward(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "rt",
      payloadCols = Seq("payload"), matchedTimeCol = "mt")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == (Some(10L), Some(1.0))) // same instant, inclusive
    assert(out(2L) == (Some(15L), Some(2.0))) // next following
    assert(out(3L) == (None, None))           // nothing after 15
    assert(out(4L) == (None, None))
    assert(out(5L) == (Some(60L), Some(9.0)))
  }

  test("asofJoinNearest: closer of the two directions wins; exact tie " +
    "prefers the past; one-sided matches win by default") {
    val left = Seq((1L, "u", 5L),  // only forward (10) exists
      (2L, "u", 12L),              // back 10 (d2) beats fwd 20 (d8)
      (3L, "u", 15L),              // tie d5/d5 → backward 10
      (4L, "u", 16L),              // fwd 20 (d4) beats back 10 (d6)
      (5L, "u", 25L),              // only backward (20) exists
      (6L, "u", 10L))              // same instant → d0 backward
      .toDF("id", "k", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 20L, 2.0))
      .toDF("k", "rt", "payload")
    val out = TemporalJoin.asofJoinNearest(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "rt",
      payloadCols = Seq("payload"), matchedTimeCol = "mt")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == (Some(10L), Some(1.0)))
    assert(out(2L) == (Some(10L), Some(1.0)))
    assert(out(3L) == (Some(10L), Some(1.0)))
    assert(out(4L) == (Some(20L), Some(2.0)))
    assert(out(5L) == (Some(20L), Some(2.0)))
    assert(out(6L) == (Some(10L), Some(1.0)))
    // non-integral time columns are rejected fast (a timestamp cast
    // would silently truncate the delta to seconds)
    val ts = Seq((1L, "u", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "k", "t")
    val tsr = Seq(("u", java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1.0))
      .toDF("k", "rt", "payload")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asofJoinNearest(ts, tsr, Seq("k"), "t", "rt",
        Seq("payload"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("asofJoin: NULL payload on the matched row stays NULL — an older " +
    "row's value must not be resurrected (struct-carry regression)") {
    val left = Seq((1L, "k", 25L), (2L, "k", 12L)).toDF("id", "k", "t")
    val right = Seq(("k", 10L, Some(5.0)), ("k", 20L, None))
      .toDF("k", "rt", "p")
    val out = TemporalJoin.asofJoin(left, right, keys = Seq("k"),
      leftTime = "t", rightTime = "rt", payloadCols = Seq("p"),
      matchedTimeCol = "mt")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    // t=25 matches rt=20 whose payload is NULL — matched time reported,
    // payload null (NOT 5.0 from the rt=10 row)
    assert(out(1L) == (Some(20L), None))
    // t=12 still matches rt=10 normally
    assert(out(2L) == (Some(10L), Some(5.0)))
  }

  test("asofJoin: null right times are unmatchable; matched-time column " +
    "keeps the right time's type") {
    val left = Seq((1L, "k", 25L)).toDF("id", "k", "t")
    val right = Seq(("k", None, 7.0), ("k", Some(20L), 9.0))
      .toDF("k", "rt", "p")
    val df = TemporalJoin.asofJoin(left, right, keys = Seq("k"),
      leftTime = "t", rightTime = "rt", payloadCols = Seq("p"),
      matchedTimeCol = "mt")
    assert(df.schema("mt").dataType ==
      org.apache.spark.sql.types.LongType)
    val r = df.collect().head
    assert(r.getLong(3) == 20L && r.getDouble(4) == 9.0)
  }

  test("asofJoin: differential vs per-row max-subquery semantics on " +
    "the sf0.001 events table") {
    val ev = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "events")
      .select($"event_id", $"user_id", expr("ts div 1000").as("t_us"),
        $"event_type", $"value")
    val alerts = ev.filter($"event_type" === "error")
      .groupBy($"user_id", $"t_us").agg(max($"value").as("alert_value"))
    val got = TemporalJoin.asofJoin(
      ev.select("event_id", "user_id", "t_us"), alerts,
      keys = Seq("user_id"), leftTime = "t_us", rightTime = "t_us",
      payloadCols = Seq("alert_value"), matchedTimeCol = "alert_t_us")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    // independent formulation: classic greatest-t join
    val a = alerts.select($"user_id".as("a_uid"), $"t_us".as("a_t"))
    val expected = ev.select("event_id", "user_id", "t_us")
      .join(a, $"user_id" === $"a_uid" && $"a_t" <= $"t_us", "left")
      .groupBy($"event_id").agg(max($"a_t").as("alert_t_us"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == expected)
  }

  test("asofJoinMerged (custom sort-merge operator): identical results " +
    "to the union+window form on every fixture, any partitioning; the " +
    "plan contains AsOfJoinExec and no Window") {
    def differential(left: org.apache.spark.sql.DataFrame,
        right: org.apache.spark.sql.DataFrame, keys: Seq[String],
        lt: String, rt: String, pay: Seq[String]): Unit = {
      val want = TemporalJoin.asofJoin(left, right, keys, lt, rt, pay,
        "mt").collect().map(_.toSeq).toSet
      for (parts <- Seq(1, 5)) {
        val df = TemporalJoin.asofJoinMerged(left.repartition(parts),
          right.repartition(parts), keys, lt, rt, pay, "mt")
        val got = df.collect().map(_.toSeq).toSet
        assert(got === want, s"parts=$parts")
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(p.contains("AsOfJoin"), p.take(2000))
        assert(!p.contains(" Window"), p.take(2000))
      }
    }
    // fixture 1: basic >= semantics + unmatched rows
    differential(
      Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "v", 50L))
        .toDF("id", "k", "t"),
      Seq(("u", 10L, 1.0), ("u", 15L, 2.0), ("v", 60L, 9.0))
        .toDF("k", "rt", "payload"),
      Seq("k"), "t", "rt", Seq("payload"))
    // fixture 2: null payload on the matched row must stay null
    differential(
      Seq((1L, "k", 25L), (2L, "k", 12L)).toDF("id", "k", "t"),
      Seq(("k", 10L, Some(5.0)), ("k", 20L, None)).toDF("k", "rt", "p"),
      Seq("k"), "t", "rt", Seq("p"))
    // fixture 3: null right times unmatchable
    differential(
      Seq((1L, "k", 25L)).toDF("id", "k", "t"),
      Seq(("k", None, 7.0), ("k", Some(20L), 9.0)).toDF("k", "rt", "p"),
      Seq("k"), "t", "rt", Seq("p"))
    // fixture 4: sf0.001 events against an aggregated alert stream —
    // thousands of rows, many keys, composite payload
    val ev = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "events")
      .select($"event_id", $"user_id", expr("ts div 1000").as("t_us"))
    val alerts = graft.sources.Tables
      .load(spark, SparkSpec.Sf0001, "events")
      .filter($"event_type" === "error")
      .groupBy($"user_id", expr("ts div 1000").as("a_t"))
      .agg(max($"value").as("alert_value"), count(lit(1)).as("n"))
    differential(ev, alerts, Seq("user_id"), "t_us", "a_t",
      Seq("alert_value", "n"))
    // fixture 5: BOTH sides derived from the SAME DataFrame instance —
    // the self-join shape where DeduplicateRelations re-ids the right
    // subtree; the wrapper's fresh aliases must keep the node's
    // attribute fields valid (regression: INTERNAL_ERROR_ATTRIBUTE_NOT_
    // FOUND before the alias fix)
    val base = Seq((1L, "u", 10L, 1.0), (2L, "u", 20L, 2.0),
      (3L, "v", 30L, 3.0)).toDF("id", "k", "t", "v")
    differential(base.select("id", "k", "t"),
      base.groupBy($"k", $"t".as("rt")).agg(max($"v").as("p")),
      Seq("k"), "t", "rt", Seq("p"))
  }

  test("asofJoinMerged: mismatched key/time dataTypes fail FAST with " +
    "the contract, not silent mostly-unmatched output") {
    // int-vs-bigint keys hash-cluster differently per side — pre-guard
    // this returned mostly-nulls instead of erroring
    val left = Seq((1L, "u", 10L)).toDF("id", "k", "t")
      .withColumn("ki", lit(1))
    val rightLong = Seq((1L, 5L, 7.0)).toDF("kl", "rt", "p")
    val ex = intercept[IllegalArgumentException] {
      TemporalJoin.asofJoinMerged(
        left.select($"id", $"ki".as("kk"), $"t"),
        rightLong.select($"kl".as("kk"), $"rt", $"p"),
        Seq("kk"), "t", "rt", Seq("p"))
    }
    assert(ex.getMessage.contains("cast the sides to a common type"),
      ex.getMessage)
    // mismatched TIME types fail the same way (ordering is built from
    // left types)
    val ex2 = intercept[IllegalArgumentException] {
      TemporalJoin.asofJoinMerged(
        left.select($"id", $"k", $"t".cast("int").as("t")),
        Seq(("u", 5L, 7.0)).toDF("k", "rt", "p"),
        Seq("k"), "t", "rt", Seq("p"))
    }
    assert(ex2.getMessage.contains("time columns"), ex2.getMessage)
  }

  test("AsOfJoinFilterPushdown: left-only predicates reach the scan's " +
    "PushedFilters through the custom node; matched-column predicates " +
    "stay above; results unchanged") {
    val ev = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "events")
      .select($"event_id", $"user_id", expr("ts div 1000").as("t_us"))
    val alerts = graft.sources.Tables
      .load(spark, SparkSpec.Sf0001, "events")
      .filter($"event_type" === "error")
      .groupBy($"user_id", expr("ts div 1000").as("a_t"))
      .agg(max($"value").as("alert_value"))
    val joined = TemporalJoin.asofJoinMerged(ev, alerts,
      Seq("user_id"), "t_us", "a_t", Seq("alert_value"), "mt")
      .filter($"event_id" < 500L && $"alert_value".isNotNull)
    // the left-only predicate travels through the custom node down to
    // the parquet scan (LessThan on event_id in PushedFilters)
    val physical = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(physical.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*LessThan\\(event_id".r
        .findFirstIn(physical).isDefined, physical.take(4000))
    // the matched-column predicate must NOT appear below the join
    val optimized = joined.queryExecution.optimizedPlan
    optimized.collect {
      case a: graft.plan.AsOfJoin.AsOfJoinPlan =>
        a.left.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            assert(!f.condition.toString.contains("alert_value"),
              f.condition.toString)
        }
    }
    // semantics unchanged vs filtering the composed form
    val want = TemporalJoin.asofJoin(ev, alerts, Seq("user_id"),
      "t_us", "a_t", Seq("alert_value"), "mt")
      .filter($"event_id" < 500L && $"alert_value".isNotNull)
      .collect().map(_.toSeq).toSet
    assert(joined.collect().map(_.toSeq).toSet === want)
  }

  test("rangeJoin: containment semantics, end-exclusive, key-scoped, " +
    "no duplicate pairs across buckets") {
    val pts = Seq((1L, "u", 0L), (2L, "u", 99L), (3L, "u", 100L),
      (4L, "v", 50L), (5L, "u", 250L)).toDF("pid", "k", "t")
    val ivs = Seq((10L, "u", 0L, 100L), (11L, "u", 90L, 300L),
      (12L, "v", 0L, 40L)).toDF("iid", "k", "s", "e")
    // bucketWidth much smaller than intervals → every interval spans
    // several buckets; result must still be duplicate-free
    val out = TemporalJoin.rangeJoin(pts, "t", ivs, "s", "e",
      bucketWidth = 30, keys = Seq("k"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "duplicate pairs")
    assert(out.toSet == Set((1L, 10L), (2L, 10L), (2L, 11L),
      (3L, 11L), (5L, 11L)))
  }

  test("rangeJoin: inverted/empty intervals match nothing (no descending " +
    "bucket explosion) and keyword column names parse") {
    // "end" is a SQL keyword; an interval with end << start must be
    // dropped, not explode a huge descending sequence
    val pts = Seq((1L, "u", 50L)).toDF("pid", "k", "t")
    val ivs = Seq((10L, "u", 0L, 100L), (11L, "u", 1000000000000L, 0L),
      (12L, "u", 60L, 60L)).toDF("iid", "k", "start", "end")
    val out = TemporalJoin.rangeJoin(pts, "t", ivs, "start", "end",
      bucketWidth = 30, keys = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 10L)))
  }

  test("rangeJoin: output is invariant to bucketWidth (pure tuning knob, " +
    "never a semantics knob)") {
    val ev = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "events")
      .select($"event_id", $"user_id", expr("ts div 1000").as("t_us"),
        $"event_type")
    val winUs = 30L * 60 * 1000000
    val ivs = ev.filter($"event_type" === "error")
      .select($"event_id".as("alert_id"), $"user_id",
        $"t_us".as("s_us"), ($"t_us" + winUs).as("e_us"))
    def run(width: Long) = TemporalJoin.rangeJoin(
      ev.select("event_id", "user_id", "t_us"), "t_us",
      ivs, "s_us", "e_us", bucketWidth = width, keys = Seq("user_id"))
      .select("alert_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run(winUs)
    assert(base.nonEmpty)
    // finer (non-divisor), much coarser, and minute-grain widths all
    // yield the identical pair set (width only trades explode fan-out
    // vs bucket selectivity — ~30 buckets/interval at minute grain)
    assert(run(winUs / 7) == base)
    assert(run(winUs * 50) == base)
    assert(run(60L * 1000000) == base)
  }

  test("asofJoinWithin: a match exactly AT the tolerance survives, " +
    "one past it nulls the payload AND the matched time, unmatched " +
    "rows stay unmatched") {
    val left = Seq((1L, "k", 100L), (2L, "k", 200L), (3L, "z", 50L))
      .toDF("id", "key", "t")
    val right = Seq(("k", 70L, "fresh"), ("k", 90L, "newer"))
      .toDF("key", "t", "p")
    def run(tol: Long) = TemporalJoin.asofJoinWithin(
        left, right, Seq("key"), "t", "t", Seq("p"), tol, "mt")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(3)).map(_ =>
        r.getLong(3)), Option(r.getString(4))))).toMap
    // id 1 at t=100: match is (90,"newer"), age 10
    // id 2 at t=200: same match, age 110
    val t10 = run(10L)
    assert(t10(1L) === ((Some(90L), Some("newer"))))
    assert(t10(2L) === ((None, None)))
    assert(t10(3L) === ((None, None)))
    val t9 = run(9L)
    assert(t9(1L) === ((None, None)))
    // a huge tolerance degrades to the plain as-of
    val big = run(1000000L)
    assert(big(1L) === ((Some(90L), Some("newer"))))
    assert(big(2L) === ((Some(90L), Some("newer"))))
  }

  test("rangeJoin: differential vs direct theta-join on sf0.001 events") {
    val ev = graft.sources.Tables.load(spark, SparkSpec.Sf0001, "events")
      .select($"event_id", $"user_id", expr("ts div 1000").as("t_us"),
        $"event_type")
    val winUs = 30L * 60 * 1000000
    val ivs = ev.filter($"event_type" === "error")
      .select($"event_id".as("alert_id"), $"user_id",
        $"t_us".as("s_us"), ($"t_us" + winUs).as("e_us"))
    val got = TemporalJoin.rangeJoin(
      ev.select("event_id", "user_id", "t_us"), "t_us",
      ivs, "s_us", "e_us", bucketWidth = winUs, keys = Seq("user_id"))
      .select("alert_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = ev.select($"event_id", $"user_id".as("p_uid"), $"t_us")
      .join(ivs, $"p_uid" === ivs("user_id") &&
        $"t_us" >= $"s_us" && $"t_us" < $"e_us")
      .select("alert_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}

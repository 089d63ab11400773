package graft

import graft.ql._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** InfluxQL text front-end: parser coverage (incl. the reference's own
  * emitted shape, quoted/dotted identifiers, durations, regex sources,
  * strict error behavior) and planner semantics on hand fixtures
  * (nearest-rank percentile, FIRST/LAST tie-break, per-series LIMIT,
  * regex-FROM unions). The registry ql_* entries oracle the same
  * surface against DuckDB at the gates. */
class InfluxQlSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  // ------------------------------------------------------------- parser

  test("parses the reference's own emitted query shape verbatim " +
    "(sync.go:162, doubled spaces included)") {
    val q = InfluxQl.parse(
      "select * from  \"m\" where time  > 1704412800s and " +
        "time < 1705708800s group by *")
    assert(q.fields === Seq(QlField(QlStar, None)))
    assert(q.source === QlMeasurement(Seq("m")))
    assert(q.where === Seq(Seq(
      QlCond("time", ">", QlDur(1704412800000000000L)),
      QlCond("time", "<", QlDur(1705708800000000000L)))))
    assert(q.groupStar && q.groupTags.isEmpty && q.timeBucketNs.isEmpty)
  }

  test("quoted identifiers keep dots and spaces; dotted bare paths " +
    "split into segments (README.md:395 cpu.* CLI patterns are regex)") {
    val q = InfluxQl.parse("select count(v) from \"cpu.total used\"")
    assert(q.source === QlMeasurement(Seq("cpu.total used")))
    val d = InfluxQl.parse("select count(v) from db0.autogen.events")
    assert(d.source === QlMeasurement(Seq("db0", "autogen", "events")))
    val r = InfluxQl.parse("select count(v) from /^cpu.*/")
    assert(r.source === QlSourceRegex("^cpu.*"))
    // doubled-quote escape inside a quoted identifier
    val e = InfluxQl.parse("select count(v) from \"we\"\"ird\"")
    assert(e.source === QlMeasurement(Seq("we\"ird")))
  }

  test("duration literals cover the InfluxQL unit table; bare ints in " +
    "time predicates are epoch ns") {
    val q = InfluxQl.parse("select count(v) from m where time > 5m and " +
      "time < 2h group by time(1d)")
    assert(q.where === Seq(Seq(
      QlCond("time", ">", QlDur(300000000000L)),
      QlCond("time", "<", QlDur(7200000000000L)))))
    assert(q.timeBucketNs === Some(86400000000000L))
    val ns = InfluxQl.parse("select count(v) from m where time >= 12345")
    assert(ns.where === Seq(Seq(QlCond("time", ">=", QlNum(12345.0, "12345")))))
  }

  test("full clause train parses: functions, aliases, fill, order, " +
    "limit/offset, slimit/soffset") {
    val q = InfluxQl.parse(
      "select mean(value) as m, percentile(value, 99.9) from cpu " +
        "where host = 'a' and value >= 0.5 " +
        "group by time(30m), host fill(previous) " +
        "order by time desc limit 10 offset 5 slimit 3 soffset 1")
    assert(q.fields === Seq(
      QlField(QlCall("mean", "value", None), Some("m")),
      QlField(QlCall("percentile", "value", Some(99.9)), None)))
    assert(q.where === Seq(Seq(
      QlCond("host", "=", QlStr("a")),
      QlCond("value", ">=", QlNum(0.5, "0.5")))))
    assert(q.groupTags === Seq("host") && q.timeBucketNs === Some(
      1800000000000L))
    assert(q.fill === Some(FillPrevious) && q.orderByTime && q.orderDesc)
    assert((q.limit, q.offset, q.slimit, q.soffset) ===
      ((Some(10), Some(5), Some(3), Some(1))))
    assert(InfluxQl.parse("select sum(v) from m group by * fill(0)")
      .fill === Some(FillValue(0.0)))
  }

  test("SHOW commands parse into the reference's discovery surface " +
    "(client.go:63,188,239,273) and route through parseStatement") {
    assert(InfluxQl.parseStatement("show databases") === ShowDatabases)
    assert(InfluxQl.parseStatement("""show retention policies on "db1"""")
      === ShowRetentionPolicies(Some("db1")))
    assert(InfluxQl.parseStatement("SHOW RETENTION POLICIES")
      === ShowRetentionPolicies(None))
    assert(InfluxQl.parseStatement("show measurements")
      === ShowMeasurements(None, None))
    assert(InfluxQl.parseStatement(
      "show measurements with measurement =~ /^cpu/")
      === ShowMeasurements(None, Some("^cpu")))
    assert(InfluxQl.parseStatement(
      "show measurements with measurement = cpu")
      === ShowMeasurements(Some("cpu"), None))
    assert(InfluxQl.parseStatement("""show field keys from "m"""")
      === ShowFieldKeys(Some("m")))
    assert(InfluxQl.parseStatement("show tag keys") === ShowTagKeys(None))
    // a SELECT through parseStatement still lands in QlSelect
    assert(InfluxQl.parseStatement("select * from m")
      .isInstanceOf[QlSelect])
    intercept[QlParseException](InfluxQl.parseStatement("show shards"))
    intercept[QlParseException](
      InfluxQl.parseStatement("show databases extra"))
  }

  test("SHOW planner: flat root surfaces default/autogen; field vs " +
    "tag keys split on the storage type model; unknown names refuse") {
    val dir = SparkSpec.Sf0001
    def rows(q: String) = QlPlanner.planShow(
      InfluxQl.parseStatement(q).asInstanceOf[QlShow], spark, dir)
    assert(rows("show databases").collect().map(_.getString(0)).toSeq
      === Seq("default"))
    val rp = rows("""show retention policies on "default"""").collect()
    assert(rp.length === 1 && rp.head.getString(1) === "autogen" &&
      rp.head.getBoolean(5))
    val ms = rows("show measurements with measurement =~ /^e/")
      .collect().map(_.getString(0)).toSet
    assert(ms === Set("events", "embeddings"))
    val fk = rows("""show field keys from "events"""").collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(fk("value") === "float" && fk.contains("ts") &&
      !fk.contains("props"))
    val tk = rows("""show tag keys from "events"""").collect()
      .map(_.getString(1)).toSet
    assert(tk === Set("event_type", "props"))
    intercept[IllegalArgumentException](
      rows("""show field keys from "nosuch"""").collect())
    intercept[IllegalArgumentException](
      rows("""show retention policies on "nosuch"""").collect())
  }

  test("SELECT INTO and subqueries parse; planInto writes the derived " +
    "measurement and re-running converges; plan() refuses a silent " +
    "INTO read") {
    val q = InfluxQl.parse(
      """select sum(v) into "daily" from m group by time(20ns), g""")
    assert(q.into === Some("daily"))
    assert(InfluxQl.parse("select sum(v) into db.rp.dst from m").into
      === Some("dst"))
    val sub = InfluxQl.parse(
      "select max(sum_v) from (select sum(v) as sum_v from m " +
        "group by time(20ns), g) group by g")
    assert(sub.source.isInstanceOf[QlSubquery])
    intercept[IllegalArgumentException](QlPlanner.plan(q, cat))
    val destRoot = java.nio.file.Files
      .createTempDirectory("graft_qlinto").toString
    val w1 = QlPlanner.planInto(q, cat, destRoot)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // buckets of 20ns: a→[0,20)=6.0? times 10,20,30,30: b0={10}=5,
    // b20={20,30,30}=12; b: b0={10}=4, b40={40}=8
    assert(w1 === Set(("a", 0L, 5.0), ("a", 20L, 12.0),
      ("b", 0L, 4.0), ("b", 40L, 8.0)))
    val w2 = QlPlanner.planInto(q, cat, destRoot)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(w2 === w1) // overwrite convergence
  }

  test("planner: subquery — aggregate of a time-bucketed inner; " +
    "inner tags stay tags, inner outputs become fields; a time-less " +
    "inner refuses") {
    val out = run("select max(sum_v) from (select sum(v) as sum_v " +
      "from m group by time(20ns), g) group by g")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(out === Map("a" -> 12.0, "b" -> 8.0))
    // inner transform feeding an outer aggregate also composes
    val d = run("select mean(difference_v) from (select difference(v) " +
      "as difference_v from m group by g) group by g")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    // a diffs (ordered t, v asc: 5,1,2,9): -4, 1, 7 → mean 4/3
    assert(math.abs(d("a") - 4.0 / 3.0) < 1e-12)
    assert(d("b") === 4.0)
    intercept[IllegalArgumentException](
      run("select max(sum_v) from (select sum(v) as sum_v from m " +
        "group by g) group by g"))
  }

  test("DELETE / DROP MEASUREMENT / CREATE CONTINUOUS QUERY parse; " +
    "planDrop removes storage; malformed ops-plane statements refuse") {
    assert(InfluxQl.parseStatement(
      """delete from "m" where time < 100""")
      === QlDelete("m", Seq(Seq(QlCond("time", "<", QlNum(100.0, "100"))))))
    assert(InfluxQl.parseStatement("delete from m") === QlDelete("m", Nil))
    assert(InfluxQl.parseStatement("""drop measurement "m"""")
      === QlDropMeasurement("m"))
    val cq = InfluxQl.parseStatement(
      """create continuous query "c" on "db" begin select sum(v) """ +
        """into "d" from m group by time(1h), g end""")
      .asInstanceOf[QlCreateCq]
    assert(cq.name === "c" && cq.db === Some("db"))
    assert(cq.inner.into === Some("d") &&
      cq.inner.timeBucketNs === Some(3600000000000L))
    // a CQ without INTO or without time() is not a CQ
    intercept[QlParseException](InfluxQl.parseStatement(
      "create continuous query c begin select sum(v) from m " +
        "group by time(1h) end"))
    intercept[QlParseException](InfluxQl.parseStatement(
      """create continuous query c begin select sum(v) into "d" """ +
        "from m group by g end"))
    // DROP/SHOW CONTINUOUS QUERY parse (CqService executes them)
    assert(InfluxQl.parseStatement(
      """drop continuous query "c" on "db"""") ===
      QlDropCq("c", Some("db")))
    assert(InfluxQl.parseStatement("show continuous queries") ===
      ShowContinuousQueries)
    assert(InfluxQl.parseStatement("""show series from "m"""") ===
      ShowSeries(Some("m")))
    assert(InfluxQl.parseStatement("show series") === ShowSeries(None))
    // a DELETE predicate on a column the measurement lacks refuses
    intercept[IllegalArgumentException](QlPlanner.planDelete(
      InfluxQl.parseStatement(
        """delete from "events" where nosuch = 'x'""")
        .asInstanceOf[QlDelete], spark, SparkSpec.Sf0001))
    // DROP: copy a measurement into a scratch root, drop it, gone
    val root = java.nio.file.Files
      .createTempDirectory("graft_qldrop").toString
    spark.read.parquet(s"${SparkSpec.Sf0001}/events.parquet")
      .limit(5).write.mode("overwrite")
      .parquet(s"$root/doomed.parquet")
    assert(QlPlanner.planDrop(
      InfluxQl.parseStatement("""drop measurement "doomed"""")
        .asInstanceOf[QlDropMeasurement], spark, root))
    assert(!new java.io.File(s"$root/doomed.parquet").exists())
    assert(!QlPlanner.planDrop( // idempotent: already gone → false
      InfluxQl.parseStatement("""drop measurement "doomed"""")
        .asInstanceOf[QlDropMeasurement], spark, root))
  }

  test("time(interval, offset) shifts bucket boundaries (negative " +
    "offsets legal); now() ± duration resolves against an explicit " +
    "clock and refuses without one") {
    val q = InfluxQl.parse(
      "select sum(v) from m group by time(1h, 30m)")
    assert(q.timeBucketNs === Some(3600000000000L))
    assert(q.timeOffsetNs === 1800000000000L)
    assert(InfluxQl.parse("select sum(v) from m group by time(1h, -15m)")
      .timeOffsetNs === -900000000000L)
    // offset buckets on the fixture: time(20ns, 5ns) → boundaries
    // 5, 25, 45; points at 10,20 → bucket 5; 30,30 → 25; 40 → 25
    val out = run("select sum(v) from m group by time(20ns, 5ns), g")
      .collect().map(r => ((r.getString(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    assert(out(("a", 5L)) === 6.0 && out(("a", 25L)) === 11.0)
    assert(out(("b", 5L)) === 4.0 && out(("b", 25L)) === 8.0)
    // now(): parses into QlNowOffset, plans against the given clock
    val nq = InfluxQl.parse(
      "select count(v) from m where time > now() - 30ns group by g")
    assert(nq.where === Seq(Seq(QlCond("time", ">", QlNowOffset(-30L)))))
    val cnt = QlPlanner.plan(nq, cat, nowNs = Some(50L))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // now=50, cutoff 20 exclusive: a keeps 30,30; b keeps 40
    assert(cnt === Map("a" -> 2L, "b" -> 1L))
    intercept[QlParseException](QlPlanner.plan(nq, cat).collect())
  }

  test("WHERE OR + parentheses parse to DNF and plan as a " +
    "disjunction; AND binds tighter; time conds inside OR work on " +
    "the normalized frame") {
    val q = InfluxQl.parse("select count(v) from m where " +
      "g = 'a' and v >= 5 or g = 'b'")
    assert(q.where === Seq(
      Seq(QlCond("g", "=", QlStr("a")), QlCond("v", ">=", QlNum(5.0, "5"))),
      Seq(QlCond("g", "=", QlStr("b")))))
    // parens flip the grouping: a AND (v>=5 OR b)
    val p = InfluxQl.parse("select count(v) from m where " +
      "g = 'a' and (v >= 5 or g = 'b')")
    assert(p.where === Seq(
      Seq(QlCond("g", "=", QlStr("a")), QlCond("v", ">=", QlNum(5.0, "5"))),
      Seq(QlCond("g", "=", QlStr("a")), QlCond("g", "=", QlStr("b")))))
    // semantics: (g=a AND v>=5) OR g=b → a keeps {5,9}, b keeps all
    val out = run("select count(v) from m where " +
      "g = 'a' and v >= 5 or g = 'b' group by g")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 2L, "b" -> 2L))
    // a time cond inside an OR alternative evaluates too
    val t = run("select count(v) from m where " +
      "time >= 40 or g = 'a' group by g")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(t === Map("a" -> 4L, "b" -> 1L))
  }

  test("strict parse: unknown functions, trailing garbage, and " +
    "unterminated literals all throw") {
    intercept[QlParseException](InfluxQl.parse("select maen(v) from m"))
    intercept[QlParseException](InfluxQl.parse("select * from m bogus"))
    intercept[QlParseException](InfluxQl.parse("select * from \"m"))
    intercept[QlParseException](InfluxQl.parse("select * from m where"))
    intercept[QlParseException](
      InfluxQl.parse("select percentile(v) from m"))
    intercept[QlParseException](
      InfluxQl.parse("select * from m group by time(1.5h)"))
  }

  // ------------------------------------------------------------ planner

  private def fixture() = {
    val s = spark
    import s.implicits._
    // two series on tag g; times in ns; equal-time tie at t=30 for g=a
    Seq(
      ("a", 10L, 5.0), ("a", 20L, 1.0), ("a", 30L, 9.0), ("a", 30L, 2.0),
      ("b", 10L, 4.0), ("b", 40L, 8.0))
      .toDF("g", "t", "v")
  }

  private def cat = Seq(
    QlTable("m", fixture(), "t", tags = Seq("g"), fields = Seq("v")))

  private def run(q: String, c: Seq[QlTable] = cat) =
    QlPlanner.plan(InfluxQl.parse(q), c)

  test("planner: raw star projection carries measurement + time + " +
    "tags + fields; time predicates filter in ns") {
    val out = run("select * from m where time > 10ns and time < 40ns")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).sortBy(x => (x._2, x._4))
    assert(out.toSeq === Seq(("m", 20L, "a", 1.0), ("m", 30L, "a", 2.0),
      ("m", 30L, "a", 9.0)))
  }

  test("planner: FIRST/LAST pick by time with the pinned value " +
    "tie-break; MEDIAN/PERCENTILE are exact nearest-rank") {
    val out = run("select first(v), last(v), median(v), " +
      "percentile(v, 75) as p75_v from m group by g")
      .collect().map(r => r.getString(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // g=a sorted values (1,2,5,9): median idx ceil(4*.5)=2 → 2.0,
    // p75 idx ceil(3)=3 → 5.0; last at t=30 ties (9.0, 2.0) → max 9.0
    assert(out("a") === ((5.0, 9.0, 2.0, 5.0)))
    // g=b: (4,8): median idx 1 → 4.0, p75 idx ceil(1.5)=2 → 8.0
    assert(out("b") === ((4.0, 8.0, 4.0, 8.0)))
  }

  test("exact cent-moment stddev identity (the ql_agg_star form) " +
    "matches true sample stddev; the ql planner's stddev agrees") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // the registry's deterministic form: n, S1=Σc, S2=Σc² as Longs,
    // combined in fixed-order DOUBLE — must equal the textbook
    // sqrt(Σ(x-x̄)²/(n-1)) to double precision, NOT just be stable
    val mom = fixture()
      .withColumn("c", round(col("v") * 100, 0).cast("long"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("g"),
        when(col("n") > 1,
          sqrt((col("n").cast("double") * col("s2")
            - col("s1").cast("double") * col("s1"))
            / (col("n") * (col("n") - lit(1.0)))) / 100.0)
          .as("sd"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // g=a values (5,1,9,2): mean 4.25, Σdev² = 38.75, sd = √(38.75/3)
    assert(math.abs(mom("a") - math.sqrt(38.75 / 3)) < 1e-12)
    // g=b values (4,8): sd = √8
    assert(math.abs(mom("b") - math.sqrt(8.0)) < 1e-12)
    // and the ql text path computes the same statistic (merge-order
    // noise only — this is the bound the registry wrapper replaces,
    // not a different number)
    val ql = run("select stddev(v) from m group by *")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(math.abs(ql("a") - mom("a")) < 1e-9)
    assert(math.abs(ql("b") - mom("b")) < 1e-9)
  }

  test("planner: LIMIT is per-series (InfluxQL point pagination), " +
    "honoring ORDER BY time DESC") {
    val out = run("select v from m order by time desc limit 2")
      .collect().map(r => (r.getString(2), r.getLong(1), r.getDouble(3)))
      .toSet
    // newest 2 per series; at g=a t=30 the tie orders v asc → both
    // t=30 rows beat t=20
    assert(out === Set(("a", 30L, 2.0), ("a", 30L, 9.0),
      ("b", 40L, 8.0), ("b", 10L, 4.0)))
  }

  test("planner: regex FROM unions matching measurements with the " +
    "in-band measurement column; differing schemas union NULL-filled; " +
    "conflicting column types refuse") {
    val two = cat :+ QlTable("m2", fixture(), "t", Seq("g"), Seq("v"))
    val out = run("select count(v) from /^m/ group by *", two)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out === Set(("m", "a", 4L), ("m", "b", 2L),
      ("m2", "a", 4L), ("m2", "b", 2L)))
    // heterogeneous field sets NULL-fill (InfluxQL unions differing
    // schemas): m3 carries w but not v — count(v) skips its rows,
    // count(w) skips m/m2's; a tag absent on a measurement groups as
    // NULL (InfluxQL's empty-tag series)
    val s = spark
    import s.implicits._
    val m3 = Seq((10L, 7.0), (20L, 8.0)).toDF("t", "w")
    val mixed = two :+ QlTable("m3", m3, "t", Seq.empty, Seq("w"))
    val both = run("select count(v), count(w) from /^m/ group by *",
      mixed).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("-"),
        r.getLong(2), r.getLong(3))).toSet
    assert(both === Set(("m", "a", 4L, 0L), ("m", "b", 2L, 0L),
      ("m2", "a", 4L, 0L), ("m2", "b", 2L, 0L), ("m3", "-", 0L, 2L)))
    // raw star over the mixed set carries the unified columns,
    // NULL-filled where a measurement lacks them
    val star = run("select * from /^m/", mixed)
    assert(star.columns.toSeq ===
      Seq("measurement", "time", "g", "v", "w"))
    assert(star.where(col("measurement") === "m3")
      .collect().forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // comma-separated FROM lists union exactly the NAMED measurements
    // (same NULL-fill semantics as regex); unknown names refuse
    val listed = run("select count(v), count(w) from m, m3 group by *",
      mixed).collect().map(r => r.getString(0)).toSet
    assert(listed === Set("m", "m3"))
    intercept[IllegalArgumentException](
      run("select count(v) from m, nosuch", mixed))
    // same column with CONFLICTING types across measurements refuses
    val m4 = Seq((10L, "not a double")).toDF("t", "v")
    intercept[IllegalArgumentException](
      run("select count(v) from /^m/ group by *",
        mixed :+ QlTable("m4", m4, "t", Seq.empty, Seq("v"))))
    intercept[IllegalArgumentException](
      run("select count(v) from nosuch"))
    // a DUAL-ROLE name — tag in one matched measurement, field in
    // another — refuses at the planner naming the column, instead of
    // selecting it twice and dying later with an ambiguous-reference
    // AnalysisException (ADVICE r13)
    val m5 = Seq((10L, "x", 1.0)).toDF("t", "v", "w")
    val dual = intercept[IllegalArgumentException](
      run("select count(w) from /^m/ group by *",
        mixed :+ QlTable("m5", m5, "t", Seq("v"), Seq("w"))))
    assert(dual.getMessage.contains("'v'") &&
      dual.getMessage.contains("tag") &&
      dual.getMessage.contains("field"), dual.getMessage)
  }

  test("planner: GROUP BY time buckets floor to the bucket start; " +
    "fill(0) zero-fills interior gap buckets per series") {
    val out = run("select sum(v) from m group by time(10ns), g fill(0)")
      .collect().map(r => ((r.getString(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    assert(out(("a", 10L)) === 5.0 && out(("a", 20L)) === 1.0 &&
      out(("a", 30L)) === 11.0)
    assert(out(("b", 10L)) === 4.0 && out(("b", 20L)) === 0.0 &&
      out(("b", 30L)) === 0.0 && out(("b", 40L)) === 8.0)
    // grid spans [first, last] actual per series — no a-series rows
    // past 30, no b-series rows past 40
    assert(out.size === 7)
  }

  test("planner: transformation family — difference/cumulative_sum/" +
    "elapsed/derivative/moving_average per series with lag-NULL heads; " +
    "mixing with aggregates refuses") {
    val out = run("select difference(v), cumulative_sum(v), " +
      "elapsed(v, 10ns), derivative(v, 10ns), moving_average(v, 2) " +
      "from m group by g")
      .collect().map(r => (r.getString(1), r.getLong(2)) -> r).toMap
    // g=b: points (10, 4.0), (40, 8.0)
    val b10 = out(("b", 10L)); val b40 = out(("b", 40L))
    assert(b10.isNullAt(3) && b10.isNullAt(5) && b10.isNullAt(7))
    assert(b10.getDouble(4) === 4.0) // cumulative_sum head = own value
    assert(b40.getDouble(3) === 4.0) // difference
    assert(b40.getDouble(4) === 12.0) // cumulative_sum
    assert(b40.getLong(5) === 3L) // elapsed in 10ns units
    assert(b40.getDouble(6) === (8.0 - 4.0) / 3.0) // derivative per 10ns
    assert(b40.getDouble(7) === 6.0) // moving_average(2)
    // g=a ties at t=30 order by value asc: (10,5),(20,1),(30,2),(30,9)
    val a30s = Seq(out(("a", 30L))) // Map keeps one; verify via full scan
    assert(a30s.nonEmpty)
    intercept[IllegalArgumentException](
      run("select sum(v), difference(v) from m group by g"))
    intercept[IllegalArgumentException](
      run("select difference(v) from m group by time(10ns), g"))
  }

  test("planner: a time-BOUNDED fill spans the whole WHERE range " +
    "(InfluxQL edge semantics) — leading cells zero-fill under " +
    "fill(0), stay NULL under fill(previous) until the first actual") {
    // range [0, 60ns) at 10ns buckets → 6 cells per series
    val z = run("select sum(v) from m where time >= 0 and time < 60 " +
      "group by time(10ns), g fill(0)")
      .collect().map(r => ((r.getString(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    assert(z.size === 12) // 2 series × 6 grid cells
    assert(z(("b", 20L)) === 0.0 && z(("b", 50L)) === 0.0) // interior+trail
    assert(z(("a", 40L)) === 0.0 && z(("a", 50L)) === 0.0) // trailing
    val p = run("select sum(v) from m where time >= 0 and time < 60 " +
      "group by time(10ns), g fill(previous)")
      .collect().map(r => ((r.getString(1), r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(p(("a", 30L)) === Some(11.0) && p(("a", 50L)) === Some(11.0))
    assert(p(("b", 20L)) === Some(4.0)) // carried forward
    assert(p(("a", 0L)) === None && p(("b", 0L)) === None) // leading NULL
    // no leading cells before the first actual here (both series
    // start at t=10 → grid cell 10); bound the range earlier to get
    // a leading NULL
    val lead0 = run("select sum(v) from m where time >= 0 and " +
      "time < 30 group by time(30ns), g fill(previous)")
      .collect().map(r => ((r.getString(1), r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(lead0.size === 2) // one 30ns cell per series, both actual
  }

  test("planner: TOP/BOTTOM selectors return the N extreme points " +
    "per series with timestamps; equal values tie to the earlier " +
    "time; mixing with other projections refuses") {
    val top = run("select top(v, 2) from m group by g")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(top === Set(("a", 30L, 9.0), ("a", 10L, 5.0),
      ("b", 40L, 8.0), ("b", 10L, 4.0)))
    val bot = run("select bottom(v, 1) as low_v from m group by g")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(bot === Set(("a", 20L, 1.0), ("b", 10L, 4.0)))
    intercept[IllegalArgumentException](
      run("select top(v, 2), sum(v) from m group by g"))
    intercept[QlParseException](run("select top(v) from m"))
    intercept[IllegalArgumentException](
      run("select top(v, 2) from m group by time(10ns), g"))
  }

  test("SHOW TAG VALUES parses and plans: distinct values of a string " +
    "tag; non-string keys refuse") {
    assert(InfluxQl.parseStatement(
      """show tag values from "m" with key = "host"""")
      === ShowTagValues(Some("m"), "host"))
    assert(InfluxQl.parseStatement("""show tag values with key = k""")
      === ShowTagValues(None, "k"))
    val vals = QlPlanner.planShow(
      InfluxQl.parseStatement("""show tag values from "events" """ +
        """with key = "event_type"""").asInstanceOf[QlShow],
      spark, SparkSpec.Sf0001)
      .collect().map(_.getString(2)).toSet
    assert(vals === Set("click", "view", "signup", "purchase", "error"))
    intercept[IllegalArgumentException](QlPlanner.planShow(
      InfluxQl.parseStatement("""show tag values from "events" """ +
        """with key = "value"""").asInstanceOf[QlShow],
      spark, SparkSpec.Sf0001))
  }

  test("planner: GROUP BY time() with no fill() defaults to " +
    "fill(null) — empty intervals surface with nulls (InfluxQL " +
    "default); fill(none) opts out; multi-aggregate grids null-fill " +
    "every column") {
    // single aggregate, bounded: grid spans [0, 50) per series
    val one = run("select sum(v) from m where time >= 0 and " +
      "time < 50 group by time(10ns), g")
      .collect().map(r => ((r.getString(1), r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(one.size === 10) // 5 ticks × 2 series
    assert(one(("a", 0L)) === None && one(("a", 40L)) === None)
    assert(one(("a", 10L)) === Some(5.0) && one(("a", 30L)) === Some(11.0))
    assert(one(("b", 20L)) === None && one(("b", 40L)) === Some(8.0))
    // fill(none) drops the grid — actual buckets only
    val none = run("select sum(v) from m where time >= 0 and " +
      "time < 50 group by time(10ns), g fill(none)").collect()
    assert(none.length === 5)
    // multi-aggregate default: every aggregate column nulls on gaps
    val multi = run("select count(v), sum(v) from m where " +
      "time >= 10 and time < 50 group by time(20ns), g")
      .collect().map(r => ((r.getString(1), r.getLong(2)),
        (if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(multi.size === 6) // ticks 0,20,40 × 2 series
    assert(multi(("a", 0L)) === ((1L, Some(5.0))))
    assert(multi(("a", 20L)) === ((3L, Some(12.0))))
    assert(multi(("a", 40L)) === ((-1L, None)))
    assert(multi(("b", 20L)) === ((-1L, None)))
    assert(multi(("b", 40L)) === ((1L, Some(8.0))))
  }

  test("planner: nested transform-of-aggregate desugars to the " +
    "subquery plan — derivative(mean(v), 10ns) GROUP BY time(10ns) " +
    "walks the actual aggregate buckets (fill none)") {
    val out = run("select derivative(mean(v), 10ns) from m where " +
      "time >= 10 and time < 50 group by time(10ns), g")
      .collect().map(r => ((r.getString(1), r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // a buckets: 10→5, 20→1, 30→5.5 → derivs: t20 = (1-5)/1 = -4,
    // t30 = (5.5-1)/1 = 4.5; b buckets: 10→4, 40→8 → t40 over a 30ns
    // gap at 10ns unit = 4/3 (derivative spans real gaps)
    assert(out(("a", 10L)) === None) // lag head
    assert(out(("a", 20L)) === Some(-4.0))
    assert(out(("a", 30L)) === Some(4.5))
    assert(out(("b", 40L)) === Some(4.0 / 3.0))
    assert(out.size === 5)
    // output name defaults to <transform>_<field>
    val named = run("select derivative(mean(v), 10ns) from m where " +
      "time >= 10 and time < 50 group by time(10ns), g")
    assert(named.columns.contains("derivative_v"))
    // mixing nested with plain projections refuses; a nested call
    // without a time() grid refuses
    intercept[IllegalArgumentException](
      run("select derivative(mean(v), 10ns), v from m " +
        "group by time(10ns), g"))
    intercept[IllegalArgumentException](
      run("select derivative(mean(v), 10ns) from m group by g"))
    // inner transform / outer aggregate both refuse (wrong nesting)
    intercept[IllegalArgumentException](
      run("select mean(difference(v)) from m group by time(10ns), g"))
  }

  test("planner: tz() aligns GROUP BY time(1d) buckets to wall-clock " +
    "midnight in the zone, DST-correct — the 23h spring-forward day " +
    "keeps its local boundary while a UTC grouping would misbin") {
    val s = spark
    import s.implicits._
    def ns(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000000L
    // America/New_York springs forward 2024-03-10 (EST −5 → EDT −4)
    val rows = Seq(
      ns("2024-03-10T04:30:00Z"), // Sat Mar 9, 23:30 EST  → local Mar 9
      ns("2024-03-10T07:30:00Z"), // Sun Mar 10, 03:30 EDT → local Mar 10
      ns("2024-03-11T03:30:00Z"), // Sun Mar 10, 23:30 EDT → local Mar 10
      ns("2024-03-11T14:00:00Z")  // Mon Mar 11, 10:00 EDT → local Mar 11
    ).map((_, 1.0)).toDF("t", "x")
    val cat3 = Seq(QlTable("tzm", rows, "t", Seq.empty, Seq("x")))
    val out = run("select count(x) from tzm where " +
      s"time >= ${ns("2024-03-09T00:00:00Z")} and " +
      s"time < ${ns("2024-03-12T00:00:00Z")} " +
      "group by time(1d) fill(none) tz('America/New_York')", cat3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // bucket starts are LOCAL midnights as instants: Mar 9/10 at
    // 05:00Z (EST), Mar 11 at 04:00Z (EDT — the boundary moved)
    assert(out === Map(
      ns("2024-03-09T05:00:00Z") -> 1L,
      ns("2024-03-10T05:00:00Z") -> 2L,
      ns("2024-03-11T04:00:00Z") -> 1L))
    // a UTC day grouping puts the 23:30-EDT point in UTC Mar 11 —
    // different binning, proving tz() changed the boundaries
    val utc = run("select count(x) from tzm where " +
      s"time >= ${ns("2024-03-09T00:00:00Z")} and " +
      s"time < ${ns("2024-03-12T00:00:00Z")} " +
      "group by time(1d) fill(none)", cat3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(utc(ns("2024-03-11T00:00:00Z")) === 2L)
    // unknown zone refuses loudly
    intercept[QlParseException](
      run("select count(x) from tzm group by time(1d) " +
        "tz('Nowhere/Invalid')", cat3))
  }

  test("projection arithmetic: raw field math and aggregate math " +
    "with standard precedence; '/' after a value token is division " +
    "(regex position heuristic); computed projections need AS") {
    // raw per-row math incl. division (the lexer's '/' dual role)
    val raw = run("select v, v * 2 - 1 as v2, v / 4 as vq from m")
      .collect().map(r => (r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toSet
    assert(raw.contains((5.0, 9.0, 1.25)))
    assert(raw.contains((1.0, 1.0, 0.25)))
    // precedence: * binds tighter than +, parens override
    // (output layout: measurement, time, g, np, p)
    val precRow = run(
      "select v + 1 * 2 as np, (v + 1) * 2 as p from m")
      .collect().map(r => (r.getDouble(3), r.getDouble(4))).toSet
    assert(precRow.contains((7.0, 12.0))) // v=5
    // aggregate math: expressions over aggregate calls per group
    val agg = run("select max(v) * 2 - min(v) as r2, " +
      "count(v) + 0.5 as ch from m group by g")
      .collect().map(r => r.getString(1) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(agg("a") === ((17.0, 4.5))) // max 9*2 - min 1; count 4
    assert(agg("b") === ((12.0, 2.5))) // max 8*2 - min 4; count 2
    // nested-call arithmetic keeps working beside it: unary minus
    val neg = run("select -min(v) as nm from m group by g")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(neg("a") === -1.0 && neg("b") === -4.0)
    // regex FROM still lexes after the division heuristic
    assert(run("select count(v) from /^m$/ group by *").count() === 2)
    // refusals: bare number, missing alias, raw×agg mix, transforms
    intercept[QlParseException](InfluxQl.parse("select 5 from m"))
    intercept[QlParseException](run("select v * 2 from m"))
    intercept[QlParseException](run("select v + max(v) as x from m"))
    intercept[IllegalArgumentException](
      run("select difference(v) * 2 as x from m group by g"))
    // arithmetic on a TAG refuses (tags are strings)
    intercept[IllegalArgumentException](run("select g * 2 as x from m"))
  }

  test("WHERE accepts negative number and duration literals " +
    "(lexed as '-' + literal, folded at parse)") {
    val q = InfluxQl.parse("select v from m where v > -5")
    assert(q.where === Seq(Seq(QlCond("v", ">", QlNum(-5.0, "-5")))))
    assert(run("select v from m where v > -5").count() === 6)
    val t = InfluxQl.parse("select v from m where time > -3h")
    assert(t.where.head.head.lit === QlDur(-3L * 3600L * 1000000000L))
  }

  test("planner: unknown columns/tags and non-field aggregates refuse " +
    "loudly") {
    intercept[IllegalArgumentException](run("select nope from m"))
    intercept[IllegalArgumentException](
      run("select sum(v) from m group by nope"))
    intercept[IllegalArgumentException](run("select sum(g) from m"))
    intercept[QlParseException](
      run("select v, sum(v) from m group by *"))
    intercept[IllegalArgumentException](
      run("select sum(v) from m offset 2"))
  }

  test("function-tail arg shapes: sample/holt_winters validation, " +
    "count(distinct()) nesting, arg2 restricted to holt_winters") {
    import graft.ql._
    // sample needs a positive integer N
    intercept[QlParseException](
      InfluxQl.parse("select sample(v) from m"))
    intercept[QlParseException](
      InfluxQl.parse("select sample(v, 0) from m"))
    // holt_winters needs an inner aggregate + integer N and S >= 2
    intercept[QlParseException](
      InfluxQl.parse("select holt_winters(v, 3, 4) from m"))
    intercept[QlParseException](
      InfluxQl.parse("select holt_winters(mean(v), 3) from m"))
    intercept[QlParseException](
      InfluxQl.parse("select holt_winters(mean(v), 3, 1) from m"))
    val hw = InfluxQl.parse(
      "select holt_winters(mean(v), 3, 4) from m group by time(1h)")
    hw.fields.head.proj match {
      case c: QlCall =>
        assert(c.fn == "holt_winters" && c.arg.contains(3.0) &&
          c.arg2.contains(4.0) && c.inner.exists(_.fn == "mean"))
      case p => fail(s"$p")
    }
    // a second numeric arg anywhere else refuses
    intercept[QlParseException](
      InfluxQl.parse("select percentile(v, 50, 2) from m"))
    // count(distinct(f)) parses as the nested form
    InfluxQl.parse("select count(distinct(v)) from m")
      .fields.head.proj match {
      case c: QlCall =>
        assert(c.fn == "count" && c.inner.exists(_.fn == "distinct"))
      case p => fail(s"$p")
    }
  }

  test("schema DDL statements parse: the reference's emitted shapes " +
    "(client.go:90,112,137) with Go compound durations, INF, clause " +
    "order freedom, and the required-clause refusals") {
    import graft.ql._
    // client.go:90 verbatim shape
    InfluxQl.parseStatement(
      """CREATE DATABASE "db0" WITH DURATION 168h0m0s REPLICATION 1 """ +
        """SHARD DURATION 24h0m0s NAME "rp0"""") match {
      case QlCreateDatabase("db0", spec) =>
        assert(spec.name.contains("rp0"))
        assert(spec.durationNs.contains(168L * 3600 * 1000000000L))
        assert(spec.shardDurationNs.contains(24L * 3600 * 1000000000L))
        assert(spec.replication.contains(1) && !spec.default)
      case other => fail(s"$other")
    }
    // bare create; INF duration; clause order swapped
    assert(InfluxQl.parseStatement("""CREATE DATABASE "d2"""") ==
      QlCreateDatabase("d2", QlRpSpec(None, None, None, None, false)))
    InfluxQl.parseStatement(
      """CREATE DATABASE "d3" WITH NAME "r" DURATION INF""") match {
      case QlCreateDatabase("d3", spec) =>
        assert(spec.durationNs.contains(0L) && spec.name.contains("r"))
      case other => fail(s"$other")
    }
    // client.go:112 + DEFAULT
    InfluxQl.parseStatement(
      """CREATE RETENTION POLICY "rp1" ON "db0" DURATION 720h0m0s """ +
        """REPLICATION 2 SHARD DURATION 168h0m0s DEFAULT""") match {
      case QlCreateRp("rp1", "db0", spec) =>
        assert(spec.durationNs.contains(720L * 3600 * 1000000000L))
        assert(spec.replication.contains(2) && spec.default)
      case other => fail(s"$other")
    }
    // client.go:137 verbatim
    assert(InfluxQl.parseStatement(
      """ALTER RETENTION POLICY "rp1" ON "db0" DEFAULT""") ==
      QlAlterRp("rp1", "db0", QlRpSpec(None, None, None, None, true)))
    assert(InfluxQl.parseStatement("""DROP DATABASE "db0"""") ==
      QlDropDatabase("db0"))
    // required clauses: CREATE RP without DURATION or REPLICATION
    intercept[QlParseException](InfluxQl.parseStatement(
      """CREATE RETENTION POLICY "r" ON "d" REPLICATION 1"""))
    intercept[QlParseException](InfluxQl.parseStatement(
      """CREATE RETENTION POLICY "r" ON "d" DURATION 1h"""))
    // empty ALTER is refused
    intercept[QlParseException](InfluxQl.parseStatement(
      """ALTER RETENTION POLICY "r" ON "d""""))
    // trailing garbage refused
    intercept[QlParseException](InfluxQl.parseStatement(
      """CREATE DATABASE "x" nonsense"""))
  }

  test("fully-qualified FROM \"db\".\"rp\".\"m\" scopes resolution to " +
    "the db qualifier; a db-less FROM over colliding names unions " +
    "the whole-root view") {
    val s = spark
    import s.implicits._
    val c1 = Seq(("h1", 10L, 1.0)).toDF("g", "t", "v")
    val c2 = Seq(("h2", 10L, 2.0)).toDF("g", "t", "v")
    val dbl = Seq(
      QlTable("cpu", c1, "t", Seq("g"), Seq("v"), db = "db1"),
      QlTable("cpu", c2, "t", Seq("g"), Seq("v"), db = "db2"))
    val scoped = run("""select v from "db2"."rp"."cpu"""", dbl)
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(scoped == Seq(2.0), scoped.toString)
    val both = run("select v from cpu", dbl)
      .select("v").collect().map(_.getDouble(0)).toSet
    assert(both == Set(1.0, 2.0), both.toString)
    // unknown qualifier → the planner's own resolution error
    intercept[IllegalArgumentException](
      run("""select v from "nodb"."rp"."cpu"""", dbl))
  }

  test("storageCatalog: flat roots yield unscoped tables, " +
    "hierarchical roots tag each table with its database, the " +
    "tag/field split follows the string-columns rule, and name " +
    "clashes across databases BOTH survive (db-scoping resolves " +
    "them)") {
    val s = spark
    import s.implicits._
    val flat = java.nio.file.Files
      .createTempDirectory("graft_cat_flat").toString
    Seq(("h1", 10L, 1.5)).toDF("host", "ts", "v")
      .write.parquet(s"$flat/cpu.parquet")
    val fc = QlPlanner.storageCatalog(s, flat)
    assert(fc.map(t => (t.name, t.db)) == Seq(("cpu", "")))
    assert(fc.head.tags == Seq("host") && fc.head.fields == Seq("v"))
    assert(fc.head.timeCol == "ts")
    val hier = java.nio.file.Files
      .createTempDirectory("graft_cat_hier").toString
    Seq(("h1", 10L, 1.0)).toDF("host", "ts", "v")
      .write.parquet(s"$hier/db1/rp0/cpu.parquet")
    Seq(("h2", 10L, 2.0)).toDF("host", "ts", "v")
      .write.parquet(s"$hier/db2/rp0/cpu.parquet")
    val hc = QlPlanner.storageCatalog(s, hier)
    assert(hc.map(t => (t.db, t.name)).toSet ==
      Set(("db1", "cpu"), ("db2", "cpu")), hc.map(_.db).toString)
    // scoped resolution picks exactly one side
    val v = QlPlanner.plan(InfluxQl.parse("select v from cpu"),
      hc.filter(_.db == "db2"))
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(v == Seq(2.0))
  }
}

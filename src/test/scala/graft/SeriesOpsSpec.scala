package graft

import graft.operators.SeriesOps
import org.scalatest.funsuite.AnyFunSuite

/** SeriesOps against a hand-computed two-series fixture: InfluxQL
  * emission conventions (first-point nulls, zero-elapsed nulls,
  * leading-edge moving-average skip) and exact values. */
class SeriesOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  // (series, id, ts_ns, value) — series "a": 10, 13, 7, 7 at 1s steps
  // (with one 2s gap); series "b": a zero-elapsed repeat pair
  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 1L, 1000000000L, 10.0),
      ("a", 2L, 2000000000L, 13.0),
      ("a", 3L, 4000000000L, 7.0),
      ("a", 4L, 5000000000L, 7.0),
      ("b", 5L, 1000000000L, 5.0),
      ("b", 6L, 1000000000L, 9.0))
      .toDF("series", "id", "ts", "value")
  }

  private def rows = SeriesOps.transforms(fixture,
    Seq("series"), "ts", "id", "value", maPoints = 2)
    .collect()
    .map(r => (r.getString(0), r.getLong(1)) -> r)
    .toMap

  test("difference / elapsed / cumulative_sum: first point null, then " +
    "exact deltas") {
    val r = rows
    assert(r(("a", 1L)).isNullAt(3) && r(("a", 1L)).isNullAt(4))
    assert(r(("a", 2L)).getDouble(3) === 3.0)
    assert(r(("a", 3L)).getDouble(3) === -6.0)
    assert(r(("a", 3L)).getLong(4) === 2000000000L)
    assert(r(("a", 4L)).getDouble(8) === 37.0) // 10+13+7+7
  }

  test("derivative is a per-second rate; zero-elapsed repeats emit " +
    "null, not ±Inf (ties broken by the tie column)") {
    val r = rows
    assert(r(("a", 2L)).getDouble(5) === 3.0)   // +3 over 1s
    assert(r(("a", 3L)).getDouble(5) === -3.0)  // -6 over 2s
    assert(r(("a", 3L)).isNullAt(6))            // nn_derivative drops it
    assert(r(("a", 4L)).getDouble(6) === 0.0)
    assert(r(("b", 6L)).isNullAt(5))            // dt=0 → null
  }

  test("signed zero: a tiny-negative derivative rounds to +0.0, never " +
    "-0.0 (driver hash renders the string — '-0.0' would mismatch)") {
    val s = spark
    import s.implicits._
    // value drops by 1e-9 over 1s → derivative = -1e-9 → round(_,6)
    // is a signed zero in engines that preserve it; ours must emit +0.0
    val df = Seq(
      ("z", 1L, 1000000000L, 1.0),
      ("z", 2L, 2000000000L, 1.0 - 1e-9))
      .toDF("series", "id", "ts", "value")
    val r = SeriesOps.transforms(df, Seq("series"), "ts", "id", "value",
        maPoints = 2)
      .collect().map(x => x.getLong(1) -> x).toMap
    for (idx <- Seq(3, 5)) { // difference, derivative
      val d = r(2L).getDouble(idx)
      assert(d === 0.0, s"col $idx")
      assert(java.lang.Double.doubleToRawLongBits(d) === 0L,
        s"col $idx is -0.0")
    }
    // nn_derivative drops the raw negative rate entirely (pre-round
    // guard), so no signed zero can reach it either
    assert(r(2L).isNullAt(6))
  }

  test("moving average emits only once the window is FULL " +
    "(InfluxQL leading-edge skip)") {
    val r = rows
    assert(r(("a", 1L)).isNullAt(7))
    assert(r(("a", 2L)).getDouble(7) === 11.5)
    assert(r(("a", 4L)).getDouble(7) === 7.0)
  }

  test("whole family plans ONE window exchange (shared window spec — " +
    "no per-transform reshuffle)") {
    val df = SparkEntry.queries("ts_series_transforms")(spark, SparkSpec.Sf0001)
    df.collect(): Unit
    // AQE's string form appends "== Initial Plan ==" — final plan only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // one physical Window host per frame shape at most (lag / ma / cum),
    // all sharing one partitioning+ordering…
    assert("(?m)^\\s*[+:]?[- ]*\\*?\\(?\\d*\\)?\\s*Window ".r
      .findAllIn(p).size <= 3, p.take(3000))
    // …so the family shuffles and sorts ONCE
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      p.take(3000))
    assert("(?m)^\\s*[+:]?[- ]*\\*?\\(?\\d*\\)?\\s*Sort ".r
      .findAllIn(p).size === 1, p.take(3000))
  }

  // bucketed fixture for fillGaps: series "a" has a 3-step interior gap
  // (ticks 40,50 missing between 30 and 60) and a 1-step gap (10→30…
  // no: 10,20,30 present); series "b" is gapless; values chosen so
  // linear interpolation lands on non-trivial fractions
  private def bucketedFixture = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 10L, 1.0), ("a", 20L, 4.0), ("a", 30L, 10.0),
      ("a", 60L, 1.0),
      ("b", 10L, 7.0), ("b", 20L, 8.0))
      .toDF("series", "b", "v")
  }

  test("fillGaps: grid covers [first, last] per series; all four fill " +
    "flavors exact on a planted interior gap") {
    val out = SeriesOps.fillGaps(bucketedFixture, Seq("series"), "b", "v",
        stepTicks = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // grid size: a spans 10..60 (6 ticks), b spans 10..20 (2 ticks)
    assert(out.size === 8)
    assert(out.keys.count(_._1 == "a") === 6)
    // actual rows: not gaps, v_null = v, all flavors agree
    val a30 = out(("a", 30L))
    assert(!a30.getBoolean(2) && a30.getDouble(3) === 10.0 &&
      a30.getDouble(4) === 10.0 && a30.getDouble(5) === 10.0 &&
      a30.getDouble(6) === 10.0)
    // gap rows at 40 and 50 (between v=10 @30 and v=1 @60):
    //   null → null, zero → 0, previous → 10,
    //   linear → 10 + (1-10)*(t-30)/30 = 7.0 @40, 4.0 @50
    val a40 = out(("a", 40L)); val a50 = out(("a", 50L))
    assert(a40.getBoolean(2) && a40.isNullAt(3) &&
      a40.getDouble(4) === 0.0 && a40.getDouble(5) === 10.0 &&
      a40.getDouble(6) === 7.0)
    assert(a50.getDouble(6) === 4.0 && a50.getDouble(5) === 10.0)
    // gapless series emits exactly its actual rows
    assert(!out(("b", 10L)).getBoolean(2) && !out(("b", 20L)).getBoolean(2))
  }

  test("topBottom: TOP/BOTTOM selector ranks match the row_number " +
    "window form, ties by id ASC (InfluxQL earlier-point rule)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("x", 1L, 5.0), ("x", 2L, 9.0), ("x", 3L, 9.0), ("x", 4L, 1.0),
      ("y", 5L, 2.0), ("y", 6L, 3.0))
      .toDF("series", "id", "value")
    val got = SeriesOps.topBottom(df, Seq("series"), "value", "id", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    // ties at 9.0: id 2 ranks before id 3
    assert(got(("x", "top", 1L)) === 2L)
    assert(got(("x", "top", 2L)) === 3L)
    assert(got(("x", "bottom", 1L)) === 4L)
    assert(got(("x", "bottom", 2L)) === 1L) // next-lowest is 5.0 @ id 1
    assert(got(("y", "top", 1L)) === 6L)
    assert(got(("y", "bottom", 1L)) === 5L)
    // k caps output: series y has 2 rows → exactly 2 ranks per selector
    assert(got.keys.count(k => k._1 == "y" && k._2 == "top") === 2)
  }

  test("ema: hand-computed recursion, out-of-order input sorted per " +
    "series, merge path invariant to partitioning") {
    val s = spark
    import s.implicits._
    // deliberately shuffled row order; α = 0.5 ⇒ a: 8, 6, 9; b: 3
    val df = Seq(
      ("a", 30L, 12.0), ("b", 10L, 3.0), ("a", 10L, 8.0),
      ("a", 20L, 4.0))
      .toDF("series", "b", "v")
    for (parts <- Seq(1, 7)) {
      val got = SeriesOps.ema(df.repartition(parts), Seq("series"),
          "b", "v", alpha = 0.5)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(got === Map(
        ("a", 10L) -> 8.0, ("a", 20L) -> 6.0, ("a", 30L) -> 9.0,
        ("b", 10L) -> 3.0), s"parts=$parts")
    }
  }

  test("emaFixed: exact integer recursion incl. planted half-boundary " +
    "ties, partitioning-invariant, matches driver-side Long fold") {
    val s = spark
    import s.implicits._
    // planted ties: e=(v+3e+2)/4 hits remainder 2 (exact .5) at step 2
    // — (3 + 3·1 + 2)/4 = 2 (true 1.5, half-up) — the case where any
    // float formulation is one ulp from flipping; integers can't.
    assert(SeriesOps.emaFixed(Seq(("t", 1L, 1L), ("t", 2L, 3L))
        .toDF("series", "b", "vu"), Seq("series"), "b", "vu", 1L, 4L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      === Map(1L -> 1L, 2L -> 2L))
    // long randomized chain vs an independent driver-side fold, under
    // different partitionings (merge path must not reorder the series)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i => ("a", i.toLong, rnd.nextLong(1000000)))
    val expect = {
      var e = rows.head._3
      rows.head._2 -> e :: rows.tail.toList.map { case (_, b, v) =>
        e = Math.floorDiv(v + 3 * e + 2, 4) // positive ⇒ ≡ truncation
        b -> e
      }
    }.toMap
    for (parts <- Seq(1, 13)) {
      val got = SeriesOps.emaFixed(rows.toDF("series", "b", "vu")
          .repartition(parts), Seq("series"), "b", "vu", 1L, 4L)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got === expect, s"parts=$parts")
    }
  }

  test("fillGaps: duplicate (series, bucket) rows raise the CONTRACT, " +
    "not sequence()'s obscure boundary error") {
    val s = spark
    import s.implicits._
    val dup = Seq(("a", 10L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0))
      .toDF("series", "b", "v")
    val ex = intercept[Exception] {
      SeriesOps.fillGaps(dup, Seq("series"), "b", "v", 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("one row per (series, bucket)")),
      messages(ex).mkString(" | "))
    // a NULL bucket row is NOT a duplicate: it drops silently (the
    // pre-guard behavior) and the rest of the series fills normally
    val withNullBucket = Seq(("a", Option.empty[Long], 9.0),
      ("a", Some(10L), 1.0), ("a", Some(30L), 3.0))
      .toDF("series", "b", "v")
    val out = SeriesOps.fillGaps(withNullBucket, Seq("series"), "b", "v",
      10L).collect()
    assert(out.length === 3) // ticks 10, 20 (gap), 30
  }

  test("fillGaps: OFF-GRID neighbor buckets raise the contract (both " +
    "the sub-step case and the misaligned-multiple case)") {
    val s = spark
    import s.implicits._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    // 0 < nb−b < step: pre-guard this hit sequence()'s raw
    // "Illegal sequence boundaries" error
    val subStep = Seq(("a", 10L, 1.0), ("a", 15L, 2.0))
      .toDF("series", "b", "v")
    val ex1 = intercept[Exception] {
      SeriesOps.fillGaps(subStep, Seq("series"), "b", "v", 10L).collect()
    }
    assert(messages(ex1).exists(_.contains("off the 10-tick grid")),
      messages(ex1).mkString(" | "))
    // gap > step but not a multiple: pre-guard this silently emitted a
    // misaligned grid (ticks 10, 20 — then 35 instead of 30)
    val misaligned = Seq(("a", 10L, 1.0), ("a", 35L, 2.0))
      .toDF("series", "b", "v")
    val ex2 = intercept[Exception] {
      SeriesOps.fillGaps(misaligned, Seq("series"), "b", "v", 10L)
        .collect()
    }
    assert(messages(ex2).exists(_.contains("off the 10-tick grid")),
      messages(ex2).mkString(" | "))
  }

  test("seriesLimit: pages tile the series set exactly; out-of-range " +
    "offset is empty; data rows of kept series pass through intact") {
    val s = spark
    import s.implicits._
    val df = (for (k <- Seq("a", "b", "c", "d"); i <- 1 to 3)
      yield (k, i.toLong)).toDF("series", "x")
    def page(lim: Int, off: Int): Set[String] =
      SeriesOps.seriesLimit(df, Seq("series"), lim, off)
        .select("series").distinct().collect().map(_.getString(0)).toSet
    assert(page(2, 0) === Set("a", "b"))
    assert(page(2, 2) === Set("c", "d"))
    assert(page(2, 4) === Set.empty)
    // all rows of a kept series survive
    assert(SeriesOps.seriesLimit(df, Seq("series"), 1, 1).count() === 3)
    // a NULL series key is a legitimate, reachable series (null-safe
    // join): it ranks first and pages still tile
    val withNull = Seq((Option.empty[String], 1L), (Some("a"), 2L),
      (Some("b"), 3L)).toDF("series", "x")
    val p1 = SeriesOps.seriesLimit(withNull, Seq("series"), 2, 0)
      .select("series").collect().map(r => Option(r.getString(0))).toSet
    assert(p1 === Set(None, Some("a")))
  }

  test("property: seriesLimit pages tile the ordered key set exactly " +
    "for random page sizes (disjoint, ordered, complete)") {
    val s = spark
    import s.implicits._
    val keys = (0 until 23).map(i => f"k$i%02d")
    val df = keys.flatMap(k => Seq((k, 1L), (k, 2L))).toDF("series", "x")
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 3) {
      val lim = 1 + rnd.nextInt(9)
      val pages = Iterator.from(0).map(pg =>
          SeriesOps.seriesLimit(df, Seq("series"), lim, pg * lim)
            .select("series").distinct().collect()
            .map(_.getString(0)).toSet)
        .takeWhile(_.nonEmpty).toVector
      assert(pages.map(_.size).sum == keys.size, s"lim=$lim")
      assert(pages.flatten.toSet == keys.toSet, s"lim=$lim")
      pages.init.foreach(p => assert(p.size == lim, s"lim=$lim"))
      pages.sliding(2).foreach {
        case Vector(a, b) => assert(a.max < b.min, s"lim=$lim")
        case _ => ()
      }
    }
  }

  test("seriesLimit plans TWO-PHASE (TakeOrderedAndProject heaps), " +
    "never a single-partition window") {
    val s = spark
    import s.implicits._
    val df = (for (k <- Seq("a", "b", "c", "d"); i <- 1 to 3)
      yield (k, i.toLong)).toDF("series", "x")
    for (off <- Seq(0, 2)) {
      val q = SeriesOps.seriesLimit(df, Seq("series"), 2, off)
      q.collect(): Unit
      val p = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!p.contains(" Window"), p.take(3000))
      assert(p.contains("TakeOrderedAndProject"), p.take(3000))
      assert(p.contains("BroadcastHashJoin"), p.take(3000))
    }
  }

  test("correlatedSeries: perfect positive/negative correlation exact; " +
    "constant and single-point series dropped; target excluded") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // target series t: 1, 2, 3 over buckets 10/20/30
      ("t", 10L, 1.0), ("t", 20L, 2.0), ("t", 30L, 3.0),
      ("a", 10L, 2.0), ("a", 20L, 4.0), ("a", 30L, 6.0),  // corr +1
      ("b", 10L, 3.0), ("b", 20L, 2.0), ("b", 30L, 1.0),  // corr −1
      ("c", 10L, 5.0), ("c", 20L, 5.0), ("c", 30L, 5.0),  // zero var
      ("d", 10L, 9.0))                                    // 1 shared pt
      .toDF("series", "b", "v")
    val got = SeriesOps.correlatedSeries(df, Seq("series"), "b", "v",
        Map("series" -> "t"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set("a", "b"))
    assert(got("a")._1 === 3L && math.abs(got("a")._2 - 1.0) < 1e-12)
    assert(got("b")._1 === 3L && math.abs(got("b")._2 + 1.0) < 1e-12)
  }

  test("ts_similar_series plans a BROADCAST join of the target vector " +
    "— the probe side never shuffles for the join") {
    val df = SparkEntry.queries("ts_similar_series")(spark,
      SparkSpec.Sf0001)
    df.collect(): Unit
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("fillGaps plans ONE exchange — gap generation is lead + " +
    "sequence-explode on the aggregate's own clustering, no grid join") {
    val df = SeriesOps.fillGaps(bucketedFixture, Seq("series"), "b", "v",
      stepTicks = 10L)
    df.collect(): Unit
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("holtFixed: hand-computed two-state recursion incl. negative " +
    "trend truncation; input order / partitioning invariant") {
    val s = spark
    import s.implicits._
    // series "up": 100,200,40; series "down": 100,20,10 — the falling
    // series drives the trend state negative, exercising the
    // truncate-toward-zero rounding on negative numerators
    val rows = Seq(("up", 1L, 100L), ("up", 2L, 200L), ("up", 3L, 40L),
      ("down", 1L, 100L), ("down", 2L, 20L), ("down", 3L, 10L))
    def run(df: org.apache.spark.sql.DataFrame) =
      SeriesOps.holtFixed(df, Seq("series"), "b", "v",
          aNum = 1L, aDen = 4L, bNum = 1L, bDen = 4L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val out = run(rows.toDF("series", "b", "v"))
    // hand-computed, α=β=1/4:
    // up: l=(200+300+2)/4=125, t=(25+2)/4=6; l=(40+393+2)/4=108,
    //     t=((108-125)+18+2)/4=3/4=0
    assert(out(("up", 1L)) == ((100L, 0L, 100L)))
    assert(out(("up", 2L)) == ((125L, 6L, 131L)))
    assert(out(("up", 3L)) == ((108L, 0L, 108L)))
    // down: l=(20+300+2)/4=80, t=(-20+2)/4=-18/4=-4 (toward zero);
    //       s=76, l=(10+228+2)/4=60, t=((-20)+(-12)+2)/4=-30/4=-7
    assert(out(("down", 1L)) == ((100L, 0L, 100L)))
    assert(out(("down", 2L)) == ((80L, -4L, 76L)))
    assert(out(("down", 3L)) == ((60L, -7L, 53L)))
    // shuffled input + forced multi-partition merge: identical output
    val shuffled = run(scala.util.Random.shuffle(rows)
      .toDF("series", "b", "v").repartition(7))
    assert(shuffled == out)
  }

  test("property: holtFixed equals a driver-side sequential fold on " +
    "random series (values, lengths, parameters) under random " +
    "partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 10) {
      val len = 1 + rnd.nextInt(40)
      val aDen = 2L + rnd.nextInt(7); val aNum = 1L + rnd.nextInt(aDen.toInt - 1)
      val bDen = 2L + rnd.nextInt(7); val bNum = 1L + rnd.nextInt(bDen.toInt - 1)
      // signed values up to ±1e6 units drive both rounding branches
      val vs = (1 to len).map(_ => rnd.nextLong(2000001L) - 1000000L)
      val expected = {
        var l = vs.head; var t = 0L
        Seq((1L, l, t, l + t)) ++ vs.tail.zipWithIndex.map {
          case (v, i) =>
            val sm = l + t
            val l2 = (aNum * v + (aDen - aNum) * sm + aDen / 2) / aDen
            t = (bNum * (l2 - l) + (bDen - bNum) * t + bDen / 2) / bDen
            l = l2
            (i + 2L, l, t, l + t)
        }
      }
      val out = SeriesOps.holtFixed(
          rnd.shuffle(vs.zipWithIndex.map { case (v, i) =>
            ("s", i + 1L, v)
          }).toDF("series", "b", "v").repartition(1 + rnd.nextInt(6)),
          Seq("series"), "b", "v", aNum, aDen, bNum, bDen)
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(_._1)
      assert(out.toSeq == expected,
        s"t$trial len=$len a=$aNum/$aDen b=$bNum/$bDen")
    }
  }

  test("property: holtWintersFixed equals a driver-side sequential " +
    "fold with a seasonal ring on random series/parameters/season " +
    "lengths under random partitioning; planted periodic signal " +
    "yields nonzero seasonal components") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 8) {
      val len = 2 + rnd.nextInt(50)
      val m = 2 + rnd.nextInt(6)
      val aDen = 2L + rnd.nextInt(7); val aNum = 1L + rnd.nextInt(aDen.toInt - 1)
      val bDen = 2L + rnd.nextInt(7); val bNum = 1L + rnd.nextInt(bDen.toInt - 1)
      val gDen = 2L + rnd.nextInt(7); val gNum = 1L + rnd.nextInt(gDen.toInt - 1)
      // base level + a planted period-m sawtooth + noise; signed
      val vs = (0 until len).map(i => 500000L + (i % m) * 40000L +
        rnd.nextLong(200001L) - 100000L)
      val expected = {
        val seas = Array.fill(m)(0L)
        var l = vs.head; var t = 0L
        val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
        out += ((1L, l, t, 0L, l + t + seas(1 % m)))
        vs.tail.zipWithIndex.foreach { case (v, z) =>
          val i = z + 2
          val slot = (i - 1) % m
          val sp = seas(slot)
          val sm = l + t
          val l2 = (aNum * (v - sp) + (aDen - aNum) * sm + aDen / 2) / aDen
          t = (bNum * (l2 - l) + (bDen - bNum) * t + bDen / 2) / bDen
          val sn = (gNum * (v - l2) + (gDen - gNum) * sp + gDen / 2) / gDen
          seas(slot) = sn
          l = l2
          out += ((i.toLong, l, t, sn, l + t + seas(i % m)))
        }
        out.result()
      }
      val out = SeriesOps.holtWintersFixed(
          rnd.shuffle(vs.zipWithIndex.map { case (v, i) =>
            ("s", i + 1L, v)
          }).toDF("series", "b", "v").repartition(1 + rnd.nextInt(6)),
          Seq("series"), "b", "v", aNum, aDen, bNum, bDen, gNum, gDen, m)
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .sortBy(_._1)
      assert(out.toSeq == expected,
        s"t$trial len=$len m=$m a=$aNum/$aDen b=$bNum/$bDen g=$gNum/$gDen")
      // non-vacuous: past the first cycle the planted sawtooth must
      // produce nonzero seasonal components
      if (len > 2 * m)
        assert(expected.drop(2 * m).exists(_._4 != 0L), s"t$trial flat")
    }
  }

  test("rollingAnomalies: hand-computed z over prior-only window; " +
    "minPrior gate; flat-baseline deviation flags with null z; " +
    "current point excluded from its own baseline") {
    val s = spark
    import s.implicits._
    // series "a": constant 10s then a spike; series "x": varied
    val rows =
      (1L to 5L).map(b => ("a", b, 10L)) ++ Seq(("a", 6L, 25L)) ++
      Seq(("x", 1L, 10L), ("x", 2L, 14L), ("x", 3L, 12L),
        ("x", 4L, 20L))
    val out = SeriesOps.rollingAnomalies(
        rows.toDF("series", "b", "v"), Seq("series"), "b", "v",
        lookback = 4, minPrior = 2, sigma = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getBoolean(5))))
      .toMap
    // first buckets: no/short history -> null z, no flag
    assert(out(("a", 1L)) == ((0L, None, false)))
    assert(out(("a", 2L)) == ((1L, None, false)))
    // flat baseline, on-baseline point: V=0, D=0 -> no flag, null z
    assert(out(("a", 3L)) == ((2L, None, false)))
    assert(out(("a", 5L)) == ((4L, None, false)))
    // flat baseline, spike: V=0 but D^2 > 0 -> flags, z stays null
    assert(out(("a", 6L)) == ((4L, None, true)))
    // varied baseline, hand-computed: prior = {10,14,12}, n=3, sm=36,
    // ssq=440; D = 20*3-36 = 24, V = 3*440-36^2 = 24; z = 24/sqrt(24)
    val (n4, z4, f4) = out(("x", 4L))
    assert(n4 == 3L && f4 == true)   // 24^2 = 576 > 9*24 = 216
    assert(z4.contains(24.0 / math.sqrt(24.0)))
    // lookback window is PRIOR-only: x@3 baseline {10,14}, D=12*2-24=0
    assert(out(("x", 3L)) == ((2L, Some(0.0), false)))
    intercept[IllegalArgumentException] {
      SeriesOps.rollingAnomalies(rows.toDF("series", "b", "v"),
        Seq("series"), "b", "v", lookback = 4, minPrior = 5)
    }
  }

  test("rollingAnomalies plans ONE exchange + ONE window — all three " +
    "statistics share the frame") {
    val s = spark
    import s.implicits._
    val df = SeriesOps.rollingAnomalies(
      Seq(("a", 1L, 10L), ("a", 2L, 12L)).toDF("series", "b", "v"),
      Seq("series"), "b", "v", lookback = 4, minPrior = 2)
    df.collect(): Unit
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      p.take(3000))
    assert("Window".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("mannKendall: strictly increasing series → S = n(n−1)/2 and a " +
    "positive z; constant series → all-tie variance 0, null z; " +
    "hand-checked tie correction") {
    val s = spark
    import s.implicits._
    val rows = (1L to 10L).map(b => ("up", b, b * 10)) ++
      (1L to 6L).map(b => ("flat", b, 7L)) ++
      // mixed with one tie pair: values 1,2,2,3 → S = sgn-sum
      Seq(("tie", 1L, 1L), ("tie", 2L, 2L), ("tie", 3L, 2L),
        ("tie", 4L, 3L))
    val out = graft.operators.SeriesOps.mannKendall(
        rows.toDF("k", "b", "vc").repartition(3), Seq("k"), "b", "vc")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // up: n=10, all 45 pairs concordant → S=45; no ties →
    // var18 = 10·9·25 = 2250, z = 44/√125 > 0
    assert(out("up")._1 === 10L && out("up")._2 === 45L)
    assert(out("up")._3 === 2250L)
    assert(out("up")._4.exists(_ > 3.9))
    // flat: every pair ties → S=0, tie term cancels the variance
    assert(out("flat")._2 === 0L && out("flat")._3 === 0L)
    assert(out("flat")._4.isEmpty)
    // tie: pairs (1,2)(1,2)(1,3)(2,2)t(2,3)(2,3) → S = 5;
    // var18 = 4·3·13 − 2·1·9 = 138
    assert(out("tie")._2 === 5L && out("tie")._3 === 138L)
  }

  test("cusumFixed: a level shift accumulates to an alarm that " +
    "rolling noise never reaches; negative shifts land on the " +
    "negative side; the first point seeds the target") {
    val s = spark
    import s.implicits._
    // flat 100 for 5 buckets, then a +10 shift (drift allowance 2,
    // threshold 20): s⁺ grows by 8 per shifted bucket → alarms at the
    // third shifted point (8, 16, 24 > 20)
    val rows = ((0L to 4L).map(b => ("A", b, 100L)) ++
      (5L to 9L).map(b => ("A", b, 110L))) ++
      // B: symmetric downward shift
      ((0L to 4L).map(b => ("B", b, 100L)) ++
        (5L to 9L).map(b => ("B", b, 90L)))
    val out = graft.operators.SeriesOps.cusumFixed(
        rows.toDF("k", "b", "vc").repartition(4), Seq("k"), "b", "vc",
        drift = 2L, threshold = 20L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5),
          r.getBoolean(6)))).toMap
    // pre-shift: both sums pinned at 0 (drift absorbs nothing here)
    assert(out(("A", 4L)) === ((0L, 0L, false, false)))
    // shifted: s⁺ = 8, 16, 24, 32, 40; alarm from b=7 on
    assert(out(("A", 5L)) === ((8L, 0L, false, false)))
    assert(out(("A", 6L)) === ((16L, 0L, false, false)))
    assert(out(("A", 7L)) === ((24L, 0L, true, false)))
    assert(out(("A", 9L)) === ((40L, 0L, true, false)))
    // mirror image on the negative side
    assert(out(("B", 7L)) === ((0L, 24L, false, true)))
  }

  test("seasonalDecompose: planted period-3 sawtooth on a linear " +
    "ramp recovers the ramp as trend and the sawtooth as seasonal; " +
    "window edges are null; negative detrended means FLOOR (not " +
    "truncate toward zero); short series keep rows") {
    val s = spark
    import s.implicits._
    // v(b) = 10·b + saw(b), saw = [0, 30, -30] by phase (b = 0..8);
    // mean of one full period of saw = 0, so the centered MA over
    // period 3 is exactly the ramp 10·b
    val saw = Seq(0L, 30L, -30L)
    val rows = (0L to 8L).map(b => ("A", b, 10L * b + saw((b % 3).toInt)))
    val out = graft.operators.SeriesOps.seasonalDecompose(
        rows.toDF("k", "b", "vc").repartition(3), Seq("k"), "b", "vc",
        period = 3)
      .collect()
      .map(r => r.getLong(1) -> ((Option(r.get(3)).map(_ => r.getLong(3)),
        Option(r.get(4)).map(_ => r.getLong(4))))).toMap
    // edges b=0 and b=8 have incomplete windows → null trend
    assert(out(0L)._1.isEmpty && out(8L)._1.isEmpty)
    // interior trend is the exact ramp
    (1L to 7L).foreach(b => assert(out(b)._1.contains(10L * b), s"b=$b"))
    // per-phase seasonal means over detrended {0,30,-30} repeats
    assert(out(1L)._2.contains(30L))
    assert(out(2L)._2.contains(-30L))
    assert(out(3L)._2.contains(0L))
    // floor semantics on a signed mean: phase-1 detrended values are
    // b=1 → 70−floor(270/3) = −20 and b=4 → 68−floor(268/3) = −21;
    // seasonal = floor(−41/2) = −21 (truncation toward zero gives −20)
    val rows2 = Seq(("B", 0L, 100L), ("B", 1L, 70L), ("B", 2L, 100L),
      ("B", 3L, 100L), ("B", 4L, 68L), ("B", 5L, 100L),
      ("B", 6L, 100L))
    val out2 = graft.operators.SeriesOps.seasonalDecompose(
        rows2.toDF("k", "b", "vc"), Seq("k"), "b", "vc", period = 3)
      .collect().map(r => r.getLong(1) ->
        Option(r.get(4)).map(_ => r.getLong(4))).toMap
    assert(out2(1L) === Some(-21L))
    // short series (< period buckets): rows survive with null fields
    val out3 = graft.operators.SeriesOps.seasonalDecompose(
        Seq(("C", 0L, 5L), ("C", 1L, 6L)).toDF("k", "b", "vc"),
        Seq("k"), "b", "vc", period = 3)
      .collect()
    assert(out3.length === 2)
    assert(out3.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("lttb: endpoints always survive, output size = min(n, " +
    "threshold), a planted spike is kept, and the selection matches " +
    "an independent driver-side float LTTB under any partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val series = (0 until 200).map(i =>
      (i.toLong * 10, rnd.nextInt(1000).toLong))
    // plant an extreme spike mid-series: LTTB must keep it
    val spiked = series.updated(117, (1170L, 100000L))
    def refLttb(pts: IndexedSeq[(Long, Long)], t: Int)
        : Seq[(Long, Long)] = {
      val n = pts.size
      if (n <= t) pts
      else {
        val inner = t - 2
        def bound(i: Int): Int = 1 + (i.toLong * (n - 2) / inner).toInt
        var prev = pts.head
        val out = scala.collection.mutable.ArrayBuffer(pts.head)
        for (i <- 0 until inner) {
          val (lo, hi) = (bound(i), bound(i + 1))
          val (nLo, nHi) =
            if (i + 1 < inner) (bound(i + 1), bound(i + 2))
            else (n - 1, n)
          val cnt = (nHi - nLo).toDouble
          val ab = (nLo until nHi).map(pts(_)._1).sum / cnt
          val av = (nLo until nHi).map(pts(_)._2).sum / cnt
          // classic float area; coordinates small → exact doubles
          val best = (lo until hi).maxBy { j =>
            val p = pts(j)
            (math.abs((prev._1 - p._1) * (av - prev._2) -
              (prev._2 - p._2) * (ab - prev._1)), -j)
          }
          out += pts(best); prev = pts(best)
        }
        out += pts.last
        out.toSeq
      }
    }
    (1 to 3).foreach { parts =>
      val got = graft.operators.SeriesOps.lttb(
          spiked.map { case (b, v) => ("k", b, v) }
            .toDF("k", "b", "v").repartition(parts * 2),
          Seq("k"), "b", "v", threshold = 20)
        .orderBy("sel_idx")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(got.length === 20)
      assert(got.head === spiked.head && got.last === spiked.last)
      assert(got.contains((1170L, 100000L)), "spike dropped")
      assert(got.toSeq === refLttb(spiked.toIndexedSeq, 20))
    }
    // short series pass through whole
    val short = (0 until 5).map(i => ("s", i.toLong, i.toLong * 3))
    val all = graft.operators.SeriesOps.lttb(
        short.toDF("k", "b", "v"), Seq("k"), "b", "v", threshold = 20)
      .collect()
    assert(all.length === 5)
    // selection is translation-invariant even at µs-epoch offsets
    // where raw Long coordinate sums would overflow (the BigInt
    // accumulation regression pin)
    val off = 910000000000000000L
    val gotBig = graft.operators.SeriesOps.lttb(
        spiked.map { case (b, v) => ("k", b + off, v) }
          .toDF("k", "b", "v"),
        Seq("k"), "b", "v", threshold = 20)
      .orderBy("sel_idx")
      .collect().map(r => (r.getLong(1) - off, r.getLong(2)))
    assert(gotBig.toSeq === refLttb(spiked.toIndexedSeq, 20))
  }

  test("theilSenBounded: a linear series recovers the exact slope; " +
    "one planted outlier leaves the median slope unmoved (the " +
    "robustness OLS lacks); negative slopes truncate toward zero") {
    val s = spark
    import s.implicits._
    // v = 7*b (step 1): every pair slope = 7*10^4 exactly
    val lin = (1L to 30L).map(b => ("k", b, 7 * b)).toDF("k", "b", "v")
    val r = graft.operators.SeriesOps.theilSenBounded(
      lin, Seq("k"), "b", "v", bucketStep = 1L, maxLag = 5)
      .collect().head
    assert(r.getLong(2) === 70000L)
    // outlier at b=15 (value 10^6): the median pair slope stays 7e4
    val out = (1L to 30L).map(b =>
      ("k", b, if (b == 15) 1000000L else 7 * b)).toDF("k", "b", "v")
    val ro = graft.operators.SeriesOps.theilSenBounded(
      out, Seq("k"), "b", "v", bucketStep = 1L, maxLag = 5)
      .collect().head
    assert(ro.getLong(2) === 70000L, s"outlier moved the median")
    // descending series: slope = -3*10^4, truncation toward zero
    val neg = (1L to 10L).map(b => ("k", b, -3 * b)).toDF("k", "b", "v")
    val rn = graft.operators.SeriesOps.theilSenBounded(
      neg, Seq("k"), "b", "v", bucketStep = 1L, maxLag = 3)
      .collect().head
    assert(rn.getLong(2) === -30000L)
  }

  test("spearmanTrend: hand-computed rho with and without value " +
    "ties; a perfectly monotone series scores exactly 1") {
    val s = spark
    import s.implicits._
    // values [10, 30, 20, 40] vs time: classic rho = 0.8
    val a = Seq(1L -> 10L, 2L -> 30L, 3L -> 20L, 4L -> 40L)
      .map { case (b, v) => ("k", b, v) }.toDF("k", "b", "v")
    val ra = graft.operators.SeriesOps.spearmanTrend(
      a, Seq("k"), "b", "v").collect().head
    assert(ra.getLong(1) === 4L)
    assert(ra.getDouble(2) === 0.8)
    // tie at 20: midranks (1, 2.5, 2.5, 4) -> rho = 0.9487
    val t = Seq(1L -> 10L, 2L -> 20L, 3L -> 20L, 4L -> 40L)
      .map { case (b, v) => ("k", b, v) }.toDF("k", "b", "v")
    val rt = graft.operators.SeriesOps.spearmanTrend(
      t, Seq("k"), "b", "v").collect().head
    assert(rt.getDouble(2) === 0.9487)
    // strictly increasing: rho = 1; constant series: NULL
    val mono = (1L to 10L).map(i => ("m", i, i * 7)).toDF("k", "b", "v")
    val rm = graft.operators.SeriesOps.spearmanTrend(
      mono, Seq("k"), "b", "v").collect().head
    assert(rm.getDouble(2) === 1.0)
    val const = (1L to 5L).map(i => ("c", i, 9L)).toDF("k", "b", "v")
    val rc = graft.operators.SeriesOps.spearmanTrend(
      const, Seq("k"), "b", "v").collect().head
    assert(rc.isNullAt(2))
  }

  test("lttb: a series past maxSeriesLen fails LOUDLY with a " +
    "pre-bucket hint instead of buffering without bound") {
    val s = spark
    import s.implicits._
    val long = (0 until 50).map(i => ("k", i.toLong, i.toLong))
    val e = intercept[Exception] {
      graft.operators.SeriesOps.lttb(long.toDF("k", "b", "v"),
        Seq("k"), "b", "v", threshold = 5, maxSeriesLen = 20L)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++
        chain(t.getCause)
    assert(chain(e).exists(_.contains("pre-bucket")),
      chain(e).mkString(" | "))
    // at or under the bound: fine
    val ok = graft.operators.SeriesOps.lttb(
        long.take(20).toDF("k", "b", "v"),
        Seq("k"), "b", "v", threshold = 5, maxSeriesLen = 20L)
      .collect()
    assert(ok.length === 5)
  }

  test("crossCorrelation: a series correlates perfectly with its own " +
    "shift AT the shift lag, anti-correlates with its negation, and " +
    "constant overlaps yield NULL") {
    val s = spark
    import s.implicits._
    val va = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val a = va.zipWithIndex.map { case (v, i) => (i.toLong * 10, v) }
      .toDF("b", "v")
    // B = A shifted one bucket later: B_{t+1} = A_t ⇒ r(+1) = 1
    val b = va.zipWithIndex.map { case (v, i) => ((i + 1).toLong * 10, v) }
      .toDF("b", "v")
    val out = graft.operators.SeriesOps.crossCorrelation(
        a, b, "b", "v", bucketStep = 10L, maxLag = 2)
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_ => r.getDouble(2)))
      .toMap
    assert(out(1L) === Some(1.0))
    assert(out(0L).exists(math.abs(_) < 1.0)) // unshifted ≠ perfect
    val neg = va.zipWithIndex.map { case (v, i) => (i.toLong * 10, -v) }
      .toDF("b", "v")
    val anti = graft.operators.SeriesOps.crossCorrelation(
        a, neg, "b", "v", bucketStep = 10L, maxLag = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(anti(0L) === -1.0)
    val flat = Seq((0L, 7L), (10L, 7L), (20L, 7L)).toDF("b", "v")
    val nul = graft.operators.SeriesOps.crossCorrelation(
        a, flat, "b", "v", bucketStep = 10L, maxLag = 1)
      .collect()
    assert(nul.nonEmpty && nul.forall(_.isNullAt(2)))
  }

  test("runsTest: alternation and clustering score symmetric ±z, " +
    "median ties drop, one-sided series yield NULL") {
    val s = spark
    import s.implicits._
    // alternating around median 5 (the 5 itself drops):
    // signs 0,1,0,1,0,1 → R=6, N1=N2=3, E[R]=4, Var=1.2 → z=1.8257
    val alt = Seq(5L, 1L, 9L, 1L, 9L, 1L, 9L).zipWithIndex
      .map { case (v, i) => ("A", i.toLong, v) }
    // clustered: 0,0,0 then 1,1,1 → R=2 → z = -1.8257
    val clu = Seq(1L, 1L, 1L, 5L, 9L, 9L, 9L).zipWithIndex
      .map { case (v, i) => ("C", i.toLong, v) }
    // all equal → everything ties at the median → empty → absent
    val flat = Seq(7L, 7L, 7L).zipWithIndex
      .map { case (v, i) => ("F", i.toLong, v) }
    val out = graft.operators.SeriesOps.runsTest(
        (alt ++ clu ++ flat).toDF("k", "b", "v").repartition(3),
        Seq("k"), "b", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ===
      ((6L, 3L, 3L, 6L)))
    assert(a.getDouble(5) === 1.8257)
    val c = out("C")
    assert(c.getLong(4) === 2L)
    assert(c.getDouble(5) === -1.8257)
    assert(!out.contains("F"))
  }

  test("pettitt: a clean level shift locates the break with " +
    "K = t·(n−t); a monotone ramp ties at the middle (earliest " +
    "argmax wins); constant series score K = 0") {
    val s = spark
    import s.implicits._
    // S: 6×10 then 6×20 → U_t = 6t for t ≤ 6 → K = 36 at t = 6
    val shift = (1L to 12L).map(b => ("S", b, if (b <= 6) 10L else 20L))
    // M: 1..5 ramp → U_t = t(5−t): t=2 and t=3 both give 6 → loc = 2
    val ramp = (1L to 5L).map(b => ("M", b, b * 7))
    val const = (1L to 4L).map(b => ("C", b, 9L))
    val out = graft.operators.SeriesOps.pettitt(
        (shift ++ ramp ++ const).toDF("k", "b", "v").repartition(4),
        Seq("k"), "b", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val sRow = out("S")
    assert((sRow.getLong(1), sRow.getLong(2), sRow.getLong(3)) ===
      ((12L, 36L, 6L)))
    assert(sRow.getDouble(4) < 0.05) // a real break is significant
    val mRow = out("M")
    assert((mRow.getLong(2), mRow.getLong(3)) === ((6L, 2L)))
    val cRow = out("C")
    assert(cRow.getLong(2) === 0L)
    assert(cRow.getDouble(4) === 1.0)
  }

  test("saxSymbols: tercile cuts are exact order statistics per " +
    "series, ties share a symbol, constant series collapse to one " +
    "symbol") {
    val s = spark
    import s.implicits._
    // A: values 1..9 → cuts at the 3rd/6th smallest (3, 6):
    //    1-3 → 0, 4-6 → 1, 7-9 → 2
    val a = (1L to 9L).map(i => ("A", i, i * 10))
    // B: 5,5,5,9 → n=4, cut1 = ceil(4/3)=2nd = 5, cut2 = ceil(8/3)=3rd
    //    = 5 → the three 5s share symbol 0, the 9 gets 2
    val b = Seq(("B", 1L, 5L), ("B", 2L, 5L), ("B", 3L, 5L),
      ("B", 4L, 9L))
    val c = Seq(("C", 1L, 7L), ("C", 2L, 7L))
    val out = graft.operators.SeriesOps.saxSymbols(
        (a ++ b ++ c).toDF("k", "b", "v").repartition(4),
        Seq("k"), "b", "v", alphabet = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    (1L to 9L).foreach(i =>
      assert(out(("A", i)) === (i - 1) / 3, s"A bucket $i"))
    assert(out(("B", 1L)) === 0L && out(("B", 2L)) === 0L &&
      out(("B", 3L)) === 0L && out(("B", 4L)) === 2L)
    assert(out(("C", 1L)) === 0L && out(("C", 2L)) === 0L)
  }

  test("counterRate: planted resets follow the restart-from-zero " +
    "convention; a monotone counter has zero resets and increase = " +
    "last − first; singleton series report a NULL rate") {
    val s = spark
    import s.implicits._
    // R: 10 → 25 → 5 (reset: +5) → 9 (+4) → 2 (reset: +2)
    //    increase = 15 + 5 + 4 + 2 = 26 over 4 s
    val reset = Seq(("R", 0L, 10L), ("R", 1000000L, 25L),
      ("R", 2000000L, 5L), ("R", 3000000L, 9L), ("R", 4000000L, 2L))
    val mono = Seq(("M", 0L, 7L), ("M", 5000000L, 107L))
    val single = Seq(("S", 0L, 42L))
    val out = graft.operators.SeriesOps.counterRate(
        (reset ++ mono ++ single).toDF("k", "t_us", "vc")
          .repartition(4), Seq("k"), "t_us", "vc")
      .collect()
      .map(r => r.getString(0) -> r).toMap
    assert((out("R").getLong(1), out("R").getLong(2),
      out("R").getLong(3), out("R").getLong(4)) === ((5L, 2L, 26L,
      4000000L)))
    assert(out("R").getDouble(5) === 6.5) // 26 c / 4 s
    assert((out("M").getLong(2), out("M").getLong(3)) === ((0L, 100L)))
    assert(out("M").getDouble(5) === 20.0)
    assert((out("S").getLong(1), out("S").getLong(3),
      out("S").getLong(4)) === ((1L, 0L, 0L)))
    assert(out("S").isNullAt(5))
  }
}

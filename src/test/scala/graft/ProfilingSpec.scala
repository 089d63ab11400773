package graft

import graft.operators.Profiling
import org.scalatest.funsuite.AnyFunSuite

/** Winsorized-statistics unit coverage (columnProfile is pinned by the
  * registry oracle + PlanSpec's pruned-ReadSchema assertion). */
class ProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("winsorizedStats: hand-computed 25%-trim clamp over 1..20; " +
    "duplicate-heavy group clamps by multiplicity rank; a group " +
    "smaller than the trim grain is untouched") {
    val s = spark
    import s.implicits._
    val rows =
      (1 to 20).map(v => ("A", v.toLong)) ++         // uniform 1..20
      Seq.fill(4)(("B", 1L)) :+ (("B", 100L))        // skewed dup pile
    val out = Profiling.winsorizedStats(
        rows.toDF("g", "cents").repartition(5), Seq("g"), "cents",
        trimNum = 1L, trimDen = 4L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // A: n=20, klo=ceil(20/4)=5, khi=16 → bounds are the 5th/16th
    // smallest = 5/16; clamp: 4·5 + Σ(5..16) + 4·16 = 20+126+64 = 210;
    // wmean_u = round(210·10⁴/20) = 105000
    assert(out("A") == ((20L, 5L, 16L, 105000L)))
    // B: n=5, klo=2, khi=4; cum over distinct values: (1→4, 100→5) so
    // BOTH ranks land on value 1 (multiplicity, not distinct position)
    // → everything clamps to 1, mean exactly 1 cent
    assert(out("B") == ((5L, 1L, 1L, 10000L)))
    // n below the trim grain: klo=ceil(3/20)=1 → bounds = min/max, no
    // clipping, exact mean round((1+2+4)·10⁴/3) = 23333
    val out2 = Profiling.winsorizedStats(
        Seq(("C", 1L), ("C", 2L), ("C", 4L)).toDF("g", "cents"),
        Seq("g"), "cents")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out2.toSeq == Seq((3L, 1L, 4L, 23333L)))
  }

  test("zipfSlope: counts and the OLS slope match an independent " +
    "driver-side computation on a hand-built Zipfy stream") {
    val s = spark
    import s.implicits._
    // a×8, b×4, c×2, d×1 → ranks 1..4 (count desc, value asc)
    val toks = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") :+ "d"
    val row = Profiling.zipfSlope(toks.toDF("w"), "w").collect().head
    assert((row.getLong(0), row.getLong(1)) === ((4L, 15L)))
    // independent mean-centered OLS (the operator uses the raw-sums
    // closed form — algebraically identical)
    val x = Seq(1, 2, 3, 4).map(r => math.log(r.toDouble))
    val y = Seq(8, 4, 2, 1).map(n => math.log(n.toDouble))
    val (mx, my) = (x.sum / 4, y.sum / 4)
    val slope = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum /
      x.map(a => (a - mx) * (a - mx)).sum
    assert(row.getDouble(2) ===
      BigDecimal(slope).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // equal-count ties rank deterministically by value — slope is a
    // pure function of the multiset, not of partitioning
    val tied = Seq.fill(3)("x") ++ Seq.fill(3)("y") :+ "z"
    val a = Profiling.zipfSlope(tied.toDF("w").repartition(7), "w")
      .collect().head
    val b = Profiling.zipfSlope(tied.toDF("w").repartition(2), "w")
      .collect().head
    assert(a.getDouble(2) === b.getDouble(2))
  }

  test("decileStats: uniform 1..20 → ten clean 2-value buckets; ties " +
    "stay in one bucket; a group smaller than the bucket count " +
    "collapses to bucket 1") {
    val s = spark
    import s.implicits._
    val rows = (1 to 20).map(v => ("A", v.toLong)) ++
      (Seq.fill(4)(1L) :+ 2L).map(("B", _)) :+ (("C", 5L))
    val out = Profiling.decileStats(
        rows.toDF("g", "v").repartition(5), Seq("g"), "v")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // A: cuts = {2,4,…,18}; bucket p = {2p−1, 2p}, sum = 4p−1
    (1 to 10).foreach { p =>
      assert(out(("A", p.toLong)) ===
        ((2L, 2L * p - 1, 2L * p, 4L * p - 1)), s"bucket $p")
    }
    // B (buckets=2 worth of mass in 10 cuts): all four 1s share a
    // bucket — ties never split
    val bBuckets = out.keys.filter(_._1 == "B").map(_._2).toSet
    assert(out(("B", 1L))._1 === 4L)
    assert(bBuckets.size === 2)
    // C: single row → kp = 1 for every p, all cuts = 5, bucket 1 only
    assert(out(("C", 1L)) === ((1L, 5L, 5L, 5L)))
    assert(!out.contains(("C", 2L)))
    // a non-integral value column fails at plan time, never nulls
    val bad = Seq(("A", "oops")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Profiling.decileStats(bad, Seq("g"), "v")
    }
  }

  test("corrMatrix: perfectly linear pair scores ±1, independent " +
    "constants go NULL, and the matrix covers every unordered pair " +
    "in one pass") {
    val s = spark
    import s.implicits._
    val rows = (1L to 20L).map(i => (i, 2 * i + 3, 21 - i, 5L))
    val out = Profiling.corrMatrix(
        rows.toDF("a", "b", "c", "k").repartition(4),
        Seq("a", "b", "c", "k"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.size === 6)
    assert(out(("a", "b")) === Some(1.0))   // b = 2a+3
    assert(out(("a", "c")) === Some(-1.0))  // c = 21−a
    assert(out(("b", "c")) === Some(-1.0))
    // zero-variance column: every pairing is NULL, not NaN
    assert(out(("a", "k")) === None)
    assert(out(("b", "k")) === None && out(("c", "k")) === None)
  }

  test("ksTest: identical cohorts score 0, disjoint cohorts 1, and " +
    "a hand-built half-overlap lands exactly between") {
    val s = spark
    import s.implicits._
    def run(rows: Seq[(String, Long)]) = {
      val r = Profiling.ksTest(rows.toDF("c", "v").repartition(3),
        "c", "v", "A", "B").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    val same = (1L to 8L).flatMap(v => Seq(("A", v), ("B", v)))
    assert(run(same) === ((8L, 8L, 0L, 0.0)))
    val disjoint = (1L to 4L).map(("A", _)) ++ (10L to 13L).map(("B", _))
    assert(run(disjoint)._4 === 1.0)
    // A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 → |2·4 − 0| = 8,
    // d = 8/16 = 0.5
    val half = Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("B", _))
    assert(run(half) === ((4L, 4L, 8L, 0.5)))
  }

  test("percentileBands: PERCENTILE_DISC semantics on a hand-built " +
    "group — actual data values, multiplicity-ranked; p100 is the " +
    "max; a singleton group pins every band to its value") {
    val s = spark
    import s.implicits._
    val rows = (1 to 10).map(v => ("A", v.toLong)) :+ (("B", 7L))
    val out = Profiling.percentileBands(
        rows.toDF("g", "c").repartition(3), Seq("g"), "c",
        Seq((1L, 2L), (9L, 10L), (1L, 1L)), Seq("p50", "p90", "p100"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // A: n=10 → p50 = ⌈5⌉th = 5, p90 = ⌈9⌉th = 9, p100 = 10
    assert(out("A") === ((10L, 5L, 9L, 10L)))
    assert(out("B") === ((1L, 7L, 7L, 7L)))
  }

  test("madStats: hand-computed median/MAD on 1..9 plus a far " +
    "outlier; duplicate-heavy group takes the multiplicity rank; " +
    "MAD=0 degenerate group flags every off-median row") {
    val s = spark
    import s.implicits._
    val rows =
      ((1 to 9).map(_.toLong) :+ 1000L).map(("A", _)) ++  // 10 values
      (Seq.fill(6)(5L) ++ Seq(7L, 8L, 9L, 100L)).map(("B", _))
    val out = Profiling.madStats(
        rows.toDF("g", "cents").repartition(5), Seq("g"), "cents")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // A: n=10, kmid=5 → median = 5th smallest = 5; deviations of
    // {1..9,1000} from 5: {4,3,2,1,0,1,2,3,4,995} sorted
    // {0,1,1,2,2,3,3,4,4,995} → MAD = 5th = 2; fence 3·2=6 → only 995
    // exceeds → 1 outlier
    assert(out("A") === ((10L, 5L, 2L, 1L)))
    // B: n=10, kmid=5; six 5s put the median at 5 by multiplicity;
    // deviations {0×6, 2, 3, 4, 95} → MAD = 5th smallest = 0 →
    // fence 0: every off-median row flags (the honest degenerate read)
    assert(out("B") === ((10L, 5L, 0L, 4L)))
  }

  test("zipfSlope: a degenerate single-type stream yields a NULL " +
    "slope (matching SQL regr_slope), not NaN") {
    val s = spark
    import s.implicits._
    val row = Profiling.zipfSlope(
      Seq.fill(5)("only").toDF("w"), "w").collect().head
    assert((row.getLong(0), row.getLong(1)) === ((1L, 5L)))
    assert(row.isNullAt(2))
  }

  test("linReg: exact fit on a noiseless line (slope/icept/r2), " +
    "NULL fits on zero x-variance, NULL r2 on constant y") {
    val s = spark
    import s.implicits._
    // y = 3x + 7 exactly → slope 3, intercept 7, r² = 1
    val line = (1L to 10L).map(x => ("L", x, 3 * x + 7))
    // constant x → sxx = 0 → no fit at all
    val degX = Seq(("X", 5L, 1L), ("X", 5L, 2L), ("X", 5L, 3L))
    // constant y → syy = 0 → slope 0 but r² undefined (NULL)
    val degY = Seq(("Y", 1L, 4L), ("Y", 2L, 4L), ("Y", 3L, 4L))
    val out = Profiling.linReg(
        (line ++ degX ++ degY).toDF("g", "x", "y").repartition(4),
        Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("L").getDouble(2) === 3.0)
    assert(out("L").getDouble(3) === 7.0)
    assert(out("L").getDouble(4) === 1.0)
    assert(out("X").isNullAt(2) && out("X").isNullAt(3) &&
      out("X").isNullAt(4))
    assert(out("Y").getDouble(2) === 0.0)
    assert(out("Y").isNullAt(4))
  }

  test("entropyBy: uniform distribution hits ln(k) exactly at the " +
    "rounding grain; a constant stream has zero entropy") {
    val s = spark
    import s.implicits._
    val uniform = (1 to 4).flatMap(v => Seq.fill(5)(("U", s"v$v")))
    val const = Seq.fill(7)(("C", "only"))
    val out = Profiling.entropyBy(
        (uniform ++ const).toDF("g", "w").repartition(3), Seq("g"), "w")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out("U")._1 == 4L && out("U")._2 == 20L)
    assert(out("U")._3 === (math.rint(math.log(4.0) * 1e6) / 1e6))
    assert(out("C") === ((1L, 7L, 0.0)))
  }

  test("hhi: monopoly scores 10^8, an even split scores n·(10^4/n)², " +
    "and floored shares never overshoot") {
    val s = spark
    import s.implicits._
    val mono = Seq(("M", 1L, 500L))
    val even = (1L to 4L).map(k => ("E", k, 25L))
    val skew = Seq(("S", 1L, 90L), ("S", 2L, 10L)) // 9000² + 1000²
    val out = Profiling.hhi(
        (mono ++ even ++ skew).toDF("g", "k", "cents").repartition(3),
        Seq("g"), "k", "cents")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out("M") === ((1L, 500L, 10000L, 100000000L)))
    assert(out("E") === ((4L, 100L, 2500L, 4L * 2500L * 2500L)))
    assert(out("S") === ((2L, 100L, 9000L, 9000L * 9000L + 1000L * 1000L)))
  }

  test("gini: perfect equality scores 0, a near-monopoly approaches " +
    "(n-1)/n, and the tie-grouped rank fold matches the " +
    "individually-ranked definition") {
    val s = spark
    import s.implicits._
    val equal = (1L to 10L).map(k => ("E", k, 50L))
    // one key holds everything → G = (n−1)/n = 0.9 exactly
    val mono = (1L to 9L).map(k => ("M", k, 0L)) :+ (("M", 10L, 100L))
    // mixed with ties: individuals 1,1,2,4 → sorted ranks 1..4:
    // S1 = 1+2+6+16 = 25, n=4, S=8 → G = 50/32 − 5/4 = 0.3125
    val mixed = Seq(("X", 1L, 1L), ("X", 2L, 1L), ("X", 3L, 2L),
      ("X", 4L, 4L))
    val out = Profiling.gini(
        (equal ++ mono ++ mixed).toDF("g", "k", "cents")
          .repartition(3), Seq("g"), "k", "cents")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out("E") === ((10L, 500L, 0.0)))
    assert(out("M") === ((10L, 100L, 0.9)))
    assert(out("X") === ((4L, 8L, 0.3125)))
  }

  test("weightedMedian: half the WEIGHT, not half the rows — one " +
    "heavy value outvotes many light ones; the exact-half boundary " +
    "takes the lower value") {
    val s = spark
    import s.implicits._
    // G: v=1 w=1 ×9 rows, v=100 w=20 → total 29, half reached at 100
    val heavy = (1 to 9).map(_ => ("G", 1L, 1L)) :+ (("G", 100L, 20L))
    // H: v=1 w=5, v=2 w=5 → 2·cum(1)=10 ≥ 10 → lower median 1
    val half = Seq(("H", 1L, 5L), ("H", 2L, 5L))
    val out = Profiling.weightedMedian(
        (heavy ++ half).toDF("g", "v", "w").repartition(3),
        Seq("g"), "v", "w")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out("G") === ((2L, 29L, 100L)))
    assert(out("H") === ((2L, 10L, 1L)))
  }

  test("psi: identical cohorts score exactly 0 (smoothing applied to " +
    "both sides); a planted shift scores positive with the moved " +
    "bins visible; per-bin counts are exact") {
    val s = spark
    import s.implicits._
    val ref = (1 to 100).map(v => ("r", v.toLong))
    val sameRows = (ref ++ (1 to 100).map(v => ("c", v.toLong)))
      .toDF("g", "v")
    val same = Profiling.psi(sameRows, "g", "v", "r", "c").collect()
    assert(same.length === 10)
    assert(same.forall(_.getDouble(3) === 0.0))
    assert(same.forall(r => r.getLong(1) == 10L && r.getLong(2) == 10L))
    // comparison cohort piles into the top decile
    val shifted = (ref ++ (1 to 100).map(_ => ("c", 95L)))
      .toDF("g", "v")
    val out = Profiling.psi(shifted, "g", "v", "r", "c").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(9L)._2 === 100L) // all cmp mass in bin 9 (v=95 > c9=90)
    assert(out(0L)._2 === 0L)
    assert(out(0L)._3 > 1.0, s"psi should scream: ${out(0L)._3}")
    // empty reference cohort: cuts are undefined — rejected loudly
    // instead of silently binning everything into bin 0 (which a SQL
    // oracle's NULL-dropping comparisons would disagree with)
    val e = intercept[IllegalArgumentException] {
      Profiling.psi((1 to 5).map(v => ("c", v.toLong)).toDF("g", "v"),
        "g", "v", "r", "c")
    }
    assert(e.getMessage.contains("reference cohort"), e.getMessage)
  }

  test("keySkew: the hot key tops the list with exact share and skew " +
    "multiple; ties break by key; k caps the output") {
    val s = spark
    import s.implicits._
    // key 7 carries 6 of 10 rows over 5 keys: share 6000 bp,
    // skew = 6*5*100/10 = 300 (3x uniform)
    val rows = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 4L)).toDF("k")
    val out = Profiling.keySkew(rows, "k", 3).collect()
    assert(out.length === 3)
    val top = out.head
    assert(top.getString(0) === "7")
    assert(top.getLong(1) === 6L)
    assert(top.getLong(2) === 10L && top.getLong(3) === 5L)
    assert(top.getLong(4) === 6000L)
    assert(top.getLong(5) === 300L)
    // remaining singletons tie on cnt=1 -> key order "1", "2"
    assert(out(1).getString(0) === "1" && out(2).getString(0) === "2")
  }

  test("mannWhitney: hand-computed midrank case with a tie — " +
    "2R stays exact and the tie-corrected z matches by hand") {
    val s = spark
    import s.implicits._
    // A = [1, 2, 4], B = [2, 3]; midranks 1, 2.5, 5 / 2.5, 4
    // 2R_A = 17, 2U = 17 - 3*4 = 5 (U = 2.5); ties: one group of 2
    // varU = 3*2*((5+1) - 6/(5*4))/12 = 2.85; z = (5-6)/(2*sqrt(2.85))
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 4L), ("b", 2L),
      ("b", 3L)).toDF("g", "v")
    val out = Profiling.mannWhitney(rows, "g", "v", "a", "b")
      .collect().head
    assert(out.getLong(0) === 3L)
    assert(out.getLong(1) === 2L)
    assert(out.getLong(2) === 5L)
    assert(out.getDouble(3) === -0.2962)
  }

  test("kruskalWallis: hand-computed three-cohort case without ties " +
    "gives H = 3.6; identical cohorts give H = 0") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L)).toDF("g", "v")
    val out = Profiling.kruskalWallis(rows, "g", "v").collect().head
    assert(out.getLong(0) === 3L)
    assert(out.getLong(1) === 5L)
    assert(out.getDouble(2) === 3.6)
    // same distribution in every cohort: interleaved 1..6 by parity
    // of cohort — ranks split evenly, H ~ 0 is NOT guaranteed exactly
    // with these tiny samples, so check a genuinely identical layout
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val h = Profiling.kruskalWallis(same, "g", "v").collect().head
    assert(h.getDouble(2) === 0.0)
  }

  test("ksMatrix: hand-computed pairwise D over three cohorts — " +
    "disjoint supports hit D = 1, shared mass scores the exact " +
    "cross-multiplied numerator") {
    val s = spark
    import s.implicits._
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 3L),
      ("C", 5L), ("C", 5L)).toDF("g", "v")
    val out = Profiling.ksMatrix(rows, "g", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.size === 3)
    // cum_A over {1,2,3,5} = 1,2,2,2; cum_B = 1,1,2,2; cum_C = 0,0,0,2
    assert(out(("A", "B")) === ((2L, 2L, 2L, 0.5)))
    assert(out(("A", "C")) === ((2L, 2L, 4L, 1.0)))
    assert(out(("B", "C")) === ((2L, 2L, 4L, 1.0)))
  }

  test("anovaF: identical cohorts give F = 0; a clean separation " +
    "matches the hand-computed F; single-cohort input yields NULL") {
    val s = spark
    import s.implicits._
    val same = Seq("a", "b", "c").flatMap(g =>
      Seq((g, 1L), (g, 2L), (g, 3L)))
    val r0 = Profiling.anovaF(same.toDF("g", "v"), "g", "v")
      .collect().head
    assert((r0.getLong(0), r0.getLong(1)) === ((3L, 9L)))
    assert(r0.getDouble(2) === 0.0) // SSB
    assert(r0.getDouble(4) === 0.0) // F
    // hand case: A={0,2}, B={10,12} → SSB=100, SSW=4,
    // F=(100/1)/(4/2)=50
    val sep = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
    val r1 = Profiling.anovaF(sep.toDF("g", "v"), "g", "v")
      .collect().head
    assert(r1.getDouble(2) === 100.0)
    assert(r1.getDouble(3) === 4.0)
    assert(r1.getDouble(4) === 50.0)
    val r2 = Profiling.anovaF(
      Seq(("only", 1L), ("only", 5L)).toDF("g", "v"), "g", "v")
      .collect().head
    assert(r2.isNullAt(4))
  }

  test("welchT: symmetric cohorts give t = 0; a clean separation " +
    "matches the hand-computed statistic; n=1 cohorts yield NULL") {
    val s = spark
    import s.implicits._
    val sym = Seq.tabulate(6)(i => ("a", (i % 3 + 1) * 10L)) ++
      Seq.tabulate(6)(i => ("b", (i % 3 + 1) * 10L))
    val row = Profiling.welchT(sym.toDF("c", "v"), "c", "v", "a", "b")
      .collect().head
    assert(row.getLong(0) == 6L && row.getLong(1) == 6L)
    assert(row.getLong(2) == row.getLong(3)) // identical means
    assert(row.getDouble(4) === 0.0)
    // hand case: A = {0, 2} (mean 1, var 2), B = {10, 12} (mean 11,
    // var 2) → t = (1-11)/sqrt(2/2+2/2) = -10/sqrt(2) ≈ -7.0711, df=2
    val sep = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
    val r2 = Profiling.welchT(sep.toDF("c", "v"), "c", "v", "a", "b")
      .collect().head
    assert(r2.getDouble(4) === -7.0711)
    assert(r2.getDouble(5) === 2.0)
    val tiny = Seq(("a", 1L), ("b", 2L), ("b", 3L))
    val r3 = Profiling.welchT(tiny.toDF("c", "v"), "c", "v", "a", "b")
      .collect().head
    assert(r3.isNullAt(4) && r3.isNullAt(5))
  }
}

package graft

import graft.operators.{Behavior, Graph, Profiling}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized structural invariants for the behavior / profiling /
  * graph families: properties that must hold for EVERY input, checked
  * over fixed-seed random frames (deterministic runs; small case
  * counts because each case is a Spark job). The hand-computed
  * fixtures pin exact values; these pin the shape of the space. */
class InvariantSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  private val rnd = new scala.util.Random(42)

  test("decileStats: per group, bucket counts sum to the group size, " +
    "buckets are within 1..10, value ranges are disjoint and ordered, " +
    "sums are exact") {
    val s = spark
    import s.implicits._
    (1 to 6).foreach { _ =>
      val rows = (1 to 200).map(_ =>
        (s"g${rnd.nextInt(3)}", (rnd.nextInt(40) + 1).toLong))
      val bySize = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val bySum = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      val out = Profiling.decileStats(rows.toDF("g", "v")
          .repartition(rnd.nextInt(5) + 1), Seq("g"), "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      out.foreach { case (_, b, _, minV, maxV, _) =>
        assert(b >= 1 && b <= 10)
        assert(minV <= maxV)
      }
      out.groupBy(_._1).foreach { case (g, bs) =>
        assert(bs.map(_._3).sum === bySize(g), s"count sum for $g")
        assert(bs.map(_._6).sum === bySum(g), s"value sum for $g")
        // ordered disjoint ranges: ties share a bucket, so the next
        // bucket's min strictly exceeds the previous bucket's max
        val ordered = bs.sortBy(_._2)
        ordered.sliding(2).foreach {
          case Array(a, c) => assert(a._5 < c._4, s"$g: $a vs $c")
          case _ =>
        }
      }
    }
  }

  test("madStats: median within [min, max], outliers never exceed n, " +
    "MAD non-negative, n equals the group size") {
    val s = spark
    import s.implicits._
    (1 to 6).foreach { _ =>
      val rows = (1 to 150).map(_ =>
        (s"g${rnd.nextInt(2)}", (rnd.nextInt(1000) - 200).toLong))
      val stats = rows.groupBy(_._1)
      val out = Profiling.madStats(rows.toDF("g", "c")
          .repartition(rnd.nextInt(4) + 1), Seq("g"), "c")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      stats.foreach { case (g, vs) =>
        val (n, med, mad, outl) = out(g)
        assert(n === vs.size.toLong)
        assert(med >= vs.map(_._2).min && med <= vs.map(_._2).max)
        assert(mad >= 0L)
        assert(outl >= 0L && outl <= n)
      }
    }
  }

  test("funnel: stage counts are monotone non-increasing and stage 1 " +
    "equals the distinct users having that event type") {
    val s = spark
    import s.implicits._
    val types = Seq("a", "b", "c")
    (1 to 5).foreach { _ =>
      val rows = (1 to 120).map(i => (i.toLong,
        rnd.nextInt(1000).toLong * 1000L,
        rnd.nextInt(12).toLong, types(rnd.nextInt(3))))
      val out = Behavior.funnel(
          rows.toDF("event_id", "ts", "user_id", "event_type")
            .repartition(3),
          "user_id", "ts", "event_type", types)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(out(1L) >= out(2L) && out(2L) >= out(3L))
      assert(out(1L) ===
        rows.filter(_._4 == "a").map(_._3).distinct.size.toLong)
    }
  }

  test("pageRankInt: every rank >= the base term; total mass never " +
    "exceeds the initial N*scale; isolated nodes sit exactly at base") {
    val s = spark
    import s.implicits._
    (1 to 4).foreach { _ =>
      val n = rnd.nextInt(8) + 4
      val nodes = (1L to n.toLong)
      val pairs = (1 to rnd.nextInt(12) + 2).map(_ =>
        (nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n))))
        .filter(p => p._1 != p._2).distinct
      val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
      val out = Graph.pageRankInt(nodes.toDF("id"), edges, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = 1000000L * 15L / 100L
      assert(out.values.forall(_ >= base))
      assert(out.values.sum <= n.toLong * 1000000L)
      val linked = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      nodes.filterNot(linked).foreach(id => assert(out(id) === base))
    }
  }

  test("pettitt: K and location are partitioning-invariant and K " +
    "never exceeds the pair count t·(n−t) bound") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { _ =>
      val rows = (1 to 40).map(i =>
        ("k", i.toLong, (rnd.nextInt(100) + (if (i > 20) 50 else 0))
          .toLong))
      val outs = Seq(1, 3, 7).map { parts =>
        graft.operators.SeriesOps.pettitt(
            rows.toDF("k", "b", "v").repartition(parts),
            Seq("k"), "b", "v")
          .collect().head
      }
      val first = (outs.head.getLong(1), outs.head.getLong(2),
        outs.head.getLong(3))
      outs.tail.foreach { r =>
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) === first)
      }
      val n = rows.size.toLong
      val k = first._2
      assert(k <= n * n / 4 + n, s"K=$k out of the t(n-t) envelope")
    }
  }

  test("gini and lorenz consistency: gini in [0, 1), lorenz shares " +
    "are monotone in the decile and end exactly at 10000 bp") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { _ =>
      val rows = (1 to 120).map(i =>
        ("g", i.toLong, (rnd.nextInt(1000) + 1).toLong))
      val g = graft.operators.Profiling.gini(
          rows.toDF("g", "k", "cents").repartition(3),
          Seq("g"), "k", "cents")
        .collect().head.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"gini=$g")
    }
    // lorenz via the registry query shape: reuse the engine fn through
    // SparkEntry against the fixture data set
    val out = SparkEntry.queries("stats_lorenz")(spark, SparkSpec.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4))
    out.groupBy(_._1._1).foreach { case (seg, pts) =>
      val byK = pts.sortBy(_._1._2).map(_._2)
      assert(byK.length === 10, seg)
      byK.sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"$seg not monotone")
        case _ =>
      }
      assert(byK.last === 10000L, s"$seg must end at 10000")
    }
  }

  test("counterRate: increase is non-negative and at least last−first, " +
    "resets < n, span = last−first, partitioning-independent") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { _ =>
      val rows = (1 to 80).map(i =>
        (s"k${rnd.nextInt(3)}", i.toLong * 1000,
          rnd.nextInt(500).toLong))
      val byK = rows.groupBy(_._1)
      val out = graft.operators.SeriesOps.counterRate(
          rows.toDF("k", "t", "v").repartition(rnd.nextInt(5) + 1),
          Seq("k"), "t", "v")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      byK.foreach { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        val (n, resets, inc, span) = out(k)
        assert(n === rs.size.toLong)
        assert(resets >= 0 && resets < n)
        assert(inc >= 0)
        // increase dominates the net movement (resets only ADD)
        assert(inc >= sorted.last._3 - sorted.head._3)
        assert(span === sorted.last._2 - sorted.head._2)
      }
    }
  }

  test("quantileNormalize: every rank in (0, 10000], monotone with " +
    "the value within each group, max value always at 10000") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { _ =>
      val rows = (1 to 120).map(i =>
        (s"g${rnd.nextInt(2)}", i.toLong, rnd.nextInt(30).toLong))
      val out = graft.operators.Curation.quantileNormalize(
          rows.toDF("g", "id", "v").repartition(rnd.nextInt(4) + 1),
          Seq("g"), "v")
        .collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("id"),
          r.getAs[Long]("v"), r.getAs[Long]("rank_bp")))
      assert(out.forall(x => x._4 > 0 && x._4 <= 10000))
      out.groupBy(_._1).foreach { case (_, rs) =>
        val byVal = rs.sortBy(_._3)
        byVal.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._3 < b._3 && a._4 <= b._4 ||
              a._3 == b._3 && a._4 == b._4)
          case _ =>
        }
        assert(byVal.last._4 === 10000L)
      }
    }
  }

  test("scd2: per key, intervals chain exactly (valid_to = next " +
    "valid_from), exactly one open current run, adjacent runs always " +
    "differ in value") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { _ =>
      val rows = (1 to 60).map(i =>
        (s"k${rnd.nextInt(3)}", i.toLong * 10, s"v${rnd.nextInt(3)}"))
        .distinctBy(r => (r._1, r._2))
      val out = graft.operators.Incremental.scd2(
          rows.toDF("k", "t", "v").repartition(rnd.nextInt(4) + 1),
          "k", "t", "v")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_ => r.getLong(3)), r.getBoolean(4)))
      out.groupBy(_._1).foreach { case (k, rs) =>
        val ordered = rs.sortBy(_._3)
        assert(ordered.count(_._4.isEmpty) === 1, s"$k open runs")
        assert(ordered.last._4.isEmpty && ordered.last._5)
        ordered.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4.contains(b._3), s"$k: gap between runs")
            assert(a._2 != b._2, s"$k: un-collapsed run")
          case _ =>
        }
      }
    }
  }

  test("growthAccounting: per day, new+retained+resurrected equals " +
    "the day's distinct active users; totals of new equal the user " +
    "population") {
    val s = spark
    import s.implicits._
    val day = 86400L * 1000000000L
    (1 to 4).foreach { _ =>
      val rows = (1 to 120).map(_ =>
        (rnd.nextInt(900000).toLong, rnd.nextInt(15).toLong * day +
          rnd.nextInt(1000).toLong, rnd.nextInt(12).toLong, "x"))
      val df = rows.toDF("event_id", "ts", "user_id", "event_type")
      val dau = rows.map(r => (r._2 / day, r._3)).distinct
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val out = graft.operators.Behavior.growthAccounting(
          df.repartition(rnd.nextInt(4) + 1), "user_id", "ts")
        .collect()
        .map(r => r.getLong(0) / 86400000000L ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      dau.foreach { case (d, n) =>
        val (nw, rt, rs2, _) = out(d)
        assert(nw + rt + rs2 === n, s"day $d")
      }
      assert(out.values.map(_._1).sum ===
        rows.map(_._3).distinct.size.toLong)
    }
  }

  test("ksMatrix ≡ pairwise ksTest: every matrix cell equals the " +
    "two-cohort test run on that pair, over random cohort draws") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 2) {
      val r = new scala.util.Random(300 + trial)
      val cohorts = Seq("p", "q", "r")
      val rows = cohorts.flatMap { c =>
        val shift = cohorts.indexOf(c) * r.nextInt(20)
        (1 to 150 + r.nextInt(100)).map(_ =>
          (c, (r.nextInt(80) + shift).toLong))
      }
      val df = rows.toDF("g", "v")
      val matrix = graft.operators.Profiling.ksMatrix(df, "g", "v")
        .collect()
        .map(x => (x.getString(0), x.getString(1)) ->
          ((x.getLong(2), x.getLong(3), x.getLong(4),
            x.getDouble(5)))).toMap
      for {
        i <- cohorts.indices; j <- cohorts.indices if i < j
      } {
        val (a, b) = (cohorts(i), cohorts(j))
        val kt = graft.operators.Profiling.ksTest(df, "g", "v", a, b)
          .collect().head
        assert(matrix((a, b)) === ((kt.getLong(0), kt.getLong(1),
          kt.getLong(2), kt.getDouble(3))), s"trial $trial pair $a$b")
      }
    }
  }

  test("mannWhitney U equals the brute-force pair count and " +
    "kruskalWallis with TWO cohorts equals z² exactly (the classic " +
    "H = z² identity, shared tie correction)") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 2) {
      val r = new scala.util.Random(400 + trial)
      val as = (1 to 60 + r.nextInt(40)).map(_ => r.nextInt(25).toLong)
      val bs = (1 to 60 + r.nextInt(40)).map(_ =>
        (r.nextInt(25) + r.nextInt(6)).toLong)
      val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "v")
      val mw = graft.operators.Profiling.mannWhitney(df, "g", "v",
        "a", "b").collect().head
      // brute force: 2U = 2·(#(a>b) pairs) + #(a=b ties)
      val u2 = as.map(a => bs.map(b =>
        if (a > b) 2L else if (a == b) 1L else 0L).sum).sum
      assert(mw.getLong(2) === u2, s"trial $trial 2U")
      val z = mw.getDouble(3)
      val h = graft.operators.Profiling.kruskalWallis(df, "g", "v")
        .collect().head.getDouble(2)
      // H and z round independently (4 dp), so compare loosely
      assert(math.abs(h - z * z) <= 2e-3,
        s"trial $trial H=$h z^2=${z * z}")
    }
  }

  test("ddQuantiles honors the relative-error bound across random " +
    "heavy-tailed draws and quantile points") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 2) {
      val r = new scala.util.Random(500 + trial)
      // log-uniform-ish values spanning 4 decades
      val vals = (1 to 3000).map(_ =>
        math.round(math.pow(10.0, 1 + r.nextDouble() * 4)))
      val df = vals.map(("g", _)).toDF("g", "v")
      val qs = Seq((1L, 4L), (1L, 2L), (9L, 10L), (99L, 100L))
      val names = Seq("p25", "p50", "p90", "p99")
      val out = graft.operators.QuantileSketch.ddQuantiles(df,
        Seq("g"), "v", alphaBp = 150, qs = qs, names = names)
        .collect().head
      val sorted = vals.sorted
      qs.zip(names).zipWithIndex.foreach { case (((num, den), _), i) =>
        val rank = ((sorted.size * num + den - 1) / den - 1).toInt
        val exact = sorted(rank.max(0)).toDouble
        val est = out.getDouble(2 + i)
        assert(math.abs(est - exact) / exact <= 0.015 + 1e-9,
          s"trial $trial q=$num/$den est=$est exact=$exact")
      }
    }
  }

  test("snapshotDiff round-trip: applying the emitted I/U/D rows to " +
    "the old snapshot reproduces the new one exactly, over random " +
    "mutation mixes (incl. NULL transitions)") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 3) {
      val r = new scala.util.Random(100 + trial)
      val old = (1 to 300).map(k => (k.toLong,
        if (r.nextInt(10) == 0) None else Some(r.nextInt(5).toLong)))
      val nw = old.flatMap { case (k, v) =>
        r.nextInt(4) match {
          case 0 => None // delete
          case 1 => Some((k, if (r.nextBoolean()) None
            else Some(r.nextInt(5).toLong))) // maybe-update / NULL flip
          case _ => Some((k, v)) // unchanged
        }
      } ++ (301 to 340).map(k => (k.toLong, Some(r.nextInt(5).toLong)))
      val oldDf = old.toDF("k", "v")
      val newDf = nw.toDF("k", "v")
      val diff = graft.operators.Incremental
        .snapshotDiff(oldDf, newDf, "k", Seq("v")).collect()
        .map(row => (row.getLong(0), row.getString(1),
          if (row.isNullAt(3)) None else Some(row.getLong(3))))
      // apply: drop D and U keys from old, add I and U rows with the
      // new values
      val touched = diff.map(_._1).toSet
      val applied = old.filterNot(p => touched.contains(p._1)) ++
        diff.filter(d => d._2 == "I" || d._2 == "U")
          .map(d => (d._1, d._3))
      assert(applied.toSet === nw.toSet, s"trial $trial")
      // ops partition correctly
      val oldK = old.map(_._1).toSet
      val newK = nw.map(_._1).toSet
      diff.foreach { case (k, op, _) =>
        op match {
          case "I" => assert(!oldK.contains(k) && newK.contains(k))
          case "D" => assert(oldK.contains(k) && !newK.contains(k))
          case "U" => assert(oldK.contains(k) && newK.contains(k))
        }
      }
    }
  }
}
